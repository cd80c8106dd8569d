"""Streaming x SPMD composition: bounded-slab ingestion with the numeric
stages on the mesh produces sv rows identical to the sequential
streaming pass (VERDICT r2 item 3)."""
import io

import numpy as np
import pytest

from tests.test_spmd_pipeline import make_mesh  # shared mesh builder

from seeksv_tpu.parallel.stream_spmd import (SpmdStreamStats,
                                             spmd_run_pipeline_streaming)
from seeksv_tpu.pipeline.stream import (StreamStats, run_pipeline_streaming,
                                        scan_bam)


@pytest.fixture(scope="module")
def example_dir():
    import pathlib
    return pathlib.Path("/root/reference/example")


@pytest.mark.parametrize("n_devices", [1, 2, 8])
@pytest.mark.parametrize("chunk_records", [977, 100_000])
def test_stream_spmd_sv_parity(example_dir, tmp_path, n_devices,
                               chunk_records):
    """Adversarial slab sizes x mesh sizes: byte-equal sv output vs the
    sequential streaming pipeline (itself byte-equal to the reference
    binary, tests/test_stream.py)."""
    mesh = make_mesh(n_devices)
    bam = str(example_dir / "cancer.sort.bam")
    fa = str(example_dir / "reference" / "example.fa")
    seq_prefix = str(tmp_path / "seq")
    run_pipeline_streaming(fa, bam, seq_prefix, chunk_records=chunk_records,
                           filtered_out=io.StringIO())
    spmd_prefix = str(tmp_path / f"spmd{n_devices}_{chunk_records}")
    spmd_run_pipeline_streaming(mesh, fa, bam, spmd_prefix,
                                chunk_records=chunk_records,
                                force_device_extend=True,
                                filtered_out=io.StringIO())
    got = open(spmd_prefix + ".sv", "rb").read()
    want = open(seq_prefix + ".sv", "rb").read()
    assert got == want
    assert want == open(example_dir / "cancer.sv", "rb").read()
    # getclip text outputs byte-equal too
    import gzip
    for suffix in (".clip.gz", ".clip.fq.gz"):
        a = gzip.open(spmd_prefix + suffix).read()
        b = gzip.open(seq_prefix + suffix).read()
        assert a == b, suffix


def test_spmd_stream_stats_match_host(example_dir):
    """Coverage / insert-size / LightBam from the mesh-resident streaming
    accumulator equal the host StreamStats, across slab boundaries."""
    mesh = make_mesh(8)
    bam = str(example_dir / "cancer.sort.bam")
    host = StreamStats(20, 5_000_000)
    dev = SpmdStreamStats(mesh, 20, 5_000_000)
    scan_bam(bam, 1000, [host, dev], prefetch=False)
    assert host.insert_size() == dev.insert_size()
    hc, dc = host.coverage(), dev.coverage()
    for t in hc:
        assert np.array_equal(hc[t], dc[t]), t
    hl, dl = host.light(), dev.light()
    for col in ("pos", "mpos", "mtid", "l_qseq", "flag", "mapq", "isize",
                "tid", "end", "hard"):
        assert np.array_equal(getattr(hl, col), getattr(dl, col)), col


def test_spmd_stream_stats_first_n_cap_mid_slab(example_dir):
    """The running cross-slab offset reproduces first-N truncation that
    lands mid-slab (ref cluster.cpp:25-56)."""
    mesh = make_mesh(2)
    bam = str(example_dir / "cancer.sort.bam")
    host = StreamStats(20, 137)
    dev = SpmdStreamStats(mesh, 20, 137)
    scan_bam(bam, 500, [host, dev], prefetch=False)
    assert host.insert_size() == dev.insert_size()


def test_junction_window_bounds_live_set(example_dir, tmp_path):
    """The getsv-phase junction build streams clip groups through
    bounded windows (VERDICT r3 #7 / r4 #9): the live decoded-group set
    never exceeds window_groups, and the windowed replay produces the
    IDENTICAL junction table to one unbounded pass."""
    from seeksv_tpu.parallel import spmd_pipeline as sp
    from seeksv_tpu.pipeline.driver import realign_clips
    from seeksv_tpu.pipeline.getclip import getclip

    bam = str(example_dir / "cancer.sort.bam")
    fa = str(example_dir / "reference" / "example.fa")
    prefix = str(tmp_path / "x")
    getclip(bam, prefix)
    realign_clips(fa, f"{prefix}.clip.fq.gz", f"{prefix}.clip.sam")
    mesh = make_mesh(1)

    seen = []
    orig = sp._gather_window

    def spy(mesh_, jmap, groups, rescue, rescue_events):
        seen.append(len(groups))
        return orig(mesh_, jmap, groups, rescue, rescue_events)

    sp._gather_window = spy
    try:
        W = 16
        jmap_w, _ = sp.spmd_build_junctions(
            mesh, f"{prefix}.clip.gz", f"{prefix}.clip.sam", 0, False,
            window_groups=W)
    finally:
        sp._gather_window = orig
    assert seen and max(seen) <= W and len(seen) > 2, seen
    jmap_u, _ = sp.spmd_build_junctions(
        mesh, f"{prefix}.clip.gz", f"{prefix}.clip.sam", 0, False,
        window_groups=1 << 30)
    ki = [(j, o.mh, o.up.support, o.down.support, o.up.seq, o.down.seq)
          for j, o in jmap_w.items]
    ku = [(j, o.mh, o.up.support, o.down.support, o.up.seq, o.down.seq)
          for j, o in jmap_u.items]
    assert ki == ku
