import numpy as np

from seeksv_tpu.io.bam import read_bam_python, read_sam_text
from seeksv_tpu.io.fasta import read_fasta, read_fai


def test_bam_decode_counts(example_dir):
    r = read_bam_python(str(example_dir / "cancer.sort.bam"))
    assert r.n == 16730  # counted in SURVEY.md §6
    assert r.ref_names == ["chr17", "chrM"]
    assert r.ref_lens == [39950, 16571]
    assert len(r.qnames) == r.n
    assert r.seq_off[-1] == int(r.l_qseq.sum())


def test_bam_decode_normal(example_dir):
    r = read_bam_python(str(example_dir / "normal.sort.bam"))
    assert r.n == 16761


def test_sam_parse(golden_dir):
    r = read_sam_text(str(golden_dir / "cancer.clip.sam"))
    assert r.n > 0
    assert r.ref_names == ["chr17", "chrM"]
    # qname is the clipped sequence itself (join key of the pipeline)
    assert all(len(q) > 0 for q in r.qnames)


def test_fasta(example_dir):
    fa = read_fasta(str(example_dir / "reference/example.fa"))
    fai = read_fai(str(example_dir / "reference/example.fa.fai"))
    assert [(k, len(v)) for k, v in fa.items()] == fai


def test_ref_span():
    import io
    from seeksv_tpu.io.bam import cigar_str_to_ops
    from seeksv_tpu.ops.cigar import from_bam_ops
    ops = cigar_str_to_ops("10M2I15M1D20M")
    vec, l = from_bam_ops(ops)
    assert l == 46  # ref: clip_reads.cpp:308 doc comment
    assert vec == [(10, "M"), (2, "I"), (15, "M"), (1, "D"), (20, "M")]
