import io

import numpy as np
import pytest

from seeksv_tpu.align.engine import Aligner, align_fastq_to_sam
from seeksv_tpu.align.sw import extend_score, global_align
from seeksv_tpu.io.bam import read_sam_text


def test_global_align_simple():
    q = np.array([0, 1, 2, 3], np.uint8)
    s, cig = global_align(q, q)
    assert s == 4 and cig == [(4, "M")]
    t = np.array([0, 1, 1, 2, 3], np.uint8)
    s, cig = global_align(q, t)
    assert cig in ([(2, "M"), (1, "D"), (2, "M")], [(1, "M"), (1, "D"), (3, "M")])


def test_extend_clip_decision():
    # perfect continuation: to-end chosen
    q = np.array([0, 1, 2, 3] * 5, np.uint8)
    r = extend_score(q, q, h0=19)
    assert r.gscore == 19 + 20 and r.gtle == 20
    # query extends 4 bases past the target end: local best stops at the
    # target boundary
    r = extend_score(q, q[:16], h0=19)
    assert r.max_score == 19 + 16 and r.qle == 16 and r.tle == 16


@pytest.mark.parametrize("sample", ["cancer", "normal"])
def test_aligner_matches_bwa_on_example(tmp_path, example_dir, golden_dir, sample):
    """Field-level equivalence with bwa mem on the example clips: same
    mapped/unmapped set, and identical (pos, mapq, cigar, flag, NM) for
    every mapped read (AS may differ slightly; unused downstream)."""
    out = tmp_path / f"{sample}.sam"
    align_fastq_to_sam(str(example_dir / "reference/example.fa"),
                       str(golden_dir / f"{sample}.clip.fq.gz"), str(out))
    ours = read_sam_text(str(out))
    bwa = read_sam_text(str(golden_dir / f"{sample}.clip.sam"))
    assert ours.n == bwa.n
    for i in range(ours.n):
        assert ours.qnames[i] == bwa.qnames[i]
        assert (ours.flag[i] & 4) == (bwa.flag[i] & 4), ours.qnames[i]
        if not ours.flag[i] & 4:
            assert (int(ours.flag[i]), int(ours.tid[i]), int(ours.pos[i]),
                    int(ours.mapq[i]), list(ours.cigar(i))) == \
                   (int(bwa.flag[i]), int(bwa.tid[i]), int(bwa.pos[i]),
                    int(bwa.mapq[i]), list(bwa.cigar(i))), ours.qnames[i]


@pytest.mark.parametrize("sample", ["cancer", "normal"])
def test_self_contained_pipeline(tmp_path, example_dir, golden_dir, sample):
    """getclip -> in-framework aligner -> getsv reproduces the committed
    sv outputs with no external realigner."""
    from seeksv_tpu.pipeline.getclip import getclip
    from seeksv_tpu.pipeline.getsv import getsv
    prefix = str(tmp_path / sample)
    getclip(str(example_dir / f"{sample}.sort.bam"), prefix)
    sam = tmp_path / f"{sample}.clip.sam"
    align_fastq_to_sam(str(example_dir / "reference/example.fa"),
                       f"{prefix}.clip.fq.gz", str(sam))
    sv = tmp_path / f"{sample}.sv"
    getsv(str(sam), str(example_dir / f"{sample}.sort.bam"),
          f"{prefix}.clip.gz", str(sv), str(tmp_path / "r.fq"),
          filtered_out=io.StringIO())
    assert sv.read_bytes() == (example_dir / f"{sample}.sv").read_bytes()


def test_aligner_indel_cigar(tmp_path, example_dir):
    """Reads with small indels vs the reference produce I/D cigars."""
    from seeksv_tpu.io.fasta import read_fasta
    fa = read_fasta(str(example_dir / "reference/example.fa"))
    chr17 = fa["chr17"].tobytes()
    al = Aligner.from_fasta(str(example_dir / "reference/example.fa"))
    base = chr17[10_000:10_060]
    # 2bp deletion in the read relative to the reference
    read_del = base[:30] + base[32:]
    a = al.align(read_del)
    assert a.mapped and a.pos == 10_000
    assert any(op == "D" for _, op in a.cigar), a.cigar
    # 2bp insertion
    read_ins = base[:30] + b"GG" + base[30:]
    b = al.align(read_ins)
    assert b.mapped and b.pos == 10_000
    assert any(op == "I" for _, op in b.cigar), b.cigar


def test_batch_seeding_equivalence(example_dir):
    """Batched seeding (align.seed_batch) returns exactly the per-read
    _candidates output for every clip sequence of the example."""
    import gzip
    from seeksv_tpu.align.index import ENCODE
    from seeksv_tpu.align.seed_batch import batch_candidates
    al = Aligner.from_fasta(str(example_dir / "reference/example.fa"))
    seqs = []
    import pathlib
    with gzip.open(str(pathlib.Path(__file__).parent / "golden"
                       / "cancer.clip.fq.gz"), "rt") as f:
        while True:
            h = f.readline()
            if not h:
                break
            seqs.append(f.readline().strip().encode())
            f.readline()
            f.readline()
    reads = []
    for s in seqs:
        fwd = ENCODE[np.frombuffer(s, np.uint8)]
        rev = np.where(fwd[::-1] < 4, 3 - fwd[::-1], 4).astype(np.uint8)
        reads.extend([fwd, rev])
    batch = batch_candidates(al.idx, reads)
    for i, codes in enumerate(reads):
        assert batch[i] == al._candidates(codes), i
