"""Semantics-mode coverage: the v1.2.3 source behaviors that differ from
the v1.2.0 parity oracle remain available and correct."""
import numpy as np

from seeksv_tpu.pipeline.getclip import BreakpointMap


def _u8(s):
    return np.frombuffer(s, np.uint8).copy()


def test_vote_merge_v123_semantics():
    """ChangeSeqAndQual (ref: clip_reads.cpp:57-108): per-base vote on
    strictly-greater quality, asymmetric extension rules (left `<=`
    replaces cigar on ties for RIGHT_CLIPPED, right `<` for LEFT_CLIPPED)."""
    m = BreakpointMap(vote=True)
    # left-clip entry: seq_left = clipped (end-anchored), seq_right = aligned
    m.insert(100, _u8(b"AAAAAAAAAA"), _u8(b"D" * 10),
             _u8(b"TTTTGGTTGG"), _u8(b"D" * 10), [(10, "M")], 0.85, True)
    # same lengths, 1 mismatch per side (0.9 >= 0.85) with higher quality
    # at the mismatching positions: vote overwrites exactly those
    m.insert(100, _u8(b"CAAAAAAAAA"), _u8(b"I" + b"D" * 9),
             _u8(b"TTTTGGTTGC"), _u8(b"D" * 9 + b"I"), [(10, "M")], 0.85, True)
    (e,) = m.by_pos[100]
    assert e.support == 2
    assert e.seq_left.tobytes() == b"CAAAAAAAAA"   # pos0 vote: I > D
    assert e.qual_left.tobytes() == b"IDDDDDDDDD"
    assert e.seq_right.tobytes() == b"TTTTGGTTGC"  # last-pos vote: I > D
    # longer incoming left side extends by prepending (overlap voted)
    m.insert(100, _u8(b"GGCAAAAAAAAA"), _u8(b"I" * 12),
             _u8(b"TTTTGGTTGG"), _u8(b"D" * 10), [(10, "M")], 0.85, True)
    (e,) = m.by_pos[100]
    assert e.support == 3
    assert e.seq_left.tobytes() == b"GGCAAAAAAAAA"
    assert e.qual_left.tobytes() == b"I" * 12


def test_replace_merge_v120_semantics():
    """The oracle binary's longest-wins merge: no voting, strict > per
    side, cigar follows the aligned side."""
    m = BreakpointMap()
    m.insert(100, _u8(b"AAAA"), _u8(b"IIII"), _u8(b"TTTTGG"), _u8(b"IIIIII"),
             [(6, "M")], 0.85, True)
    # equal lengths: nothing changes even with higher quality
    m.insert(100, _u8(b"AAAA"), _u8(b"JJJJ"), _u8(b"TTTTGG"), _u8(b"JJJJJJ"),
             [(6, "M")], 0.85, True)
    (e,) = m.by_pos[100]
    assert e.qual_left.tobytes() == b"IIII" and e.support == 2
    # strictly longer aligned side replaces seq+qual+cigar (LEFT_CLIPPED)
    m.insert(100, _u8(b"AAAA"), _u8(b"DDDD"), _u8(b"TTTTGGCC"),
             _u8(b"DDDDDDDD"), [(8, "M")], 0.85, True)
    (e,) = m.by_pos[100]
    assert e.seq_right.tobytes() == b"TTTTGGCC"
    assert e.cigar == [(8, "M")]
    assert e.seq_left.tobytes() == b"AAAA" and e.qual_left.tobytes() == b"IIII"


def test_svcompare_simu_mode(tmp_path):
    """simu-mode truth ingestion (inv/ldel/lins formats,
    ref: svcompare.cpp:124-273) + fuzzy compare."""
    from seeksv_tpu.pipeline.svcompare import compare
    sv_truth = tmp_path / "truth.sv_info"
    sv_truth.write_text("inv\t1000\t500\ta\ti\tp\n")
    cnv = tmp_path / "truth.cnv_info"
    cnv.write_text("ldel\t5000\t6000\ta\tp\n")
    target = tmp_path / "target.sv"
    target.write_text(
        "@header\n"
        # matches the ldel junction (4999+ -> 6001+) within 50bp
        "chr17\t4980\t+\t5\tchr17\t6020\t+\t6\t0\t9\tDEL\t"
        + "\t".join(["0"] * 8) + "\t10M\t10M\tAAAA\tTTTT\n"
        # unmatched call
        "chr17\t9000\t+\t5\tchr17\t9500\t+\t6\t0\t9\tDEL\t"
        + "\t".join(["0"] * 8) + "\t10M\t10M\tAAAA\tTTTT\n")
    out = tmp_path / "cmp.txt"
    compare("simu", str(sv_truth), str(target), str(out),
            cnv_file=str(cnv), chrom="chr17")
    tags = [l.split("\t")[0] for l in out.read_text().splitlines()]
    assert tags.count("target_share") == 1
    assert tags.count("target_only") == 1
    # inv truth contributes 2 junctions, ldel 1; only ldel matched
    assert tags.count("control_only") == 2
