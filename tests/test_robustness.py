"""Edge-case robustness: degenerate inputs must produce clean results or
clean errors (the reference's failure mode is cerr + exit(1),
SURVEY.md §5)."""
import gzip
import io

import numpy as np
import pytest

from seeksv_tpu.io.bam import read_bam, read_bam_python
from seeksv_tpu.io.bam_writer import BamWriter
from seeksv_tpu.pipeline.getclip import getclip
from seeksv_tpu.pipeline.getsv import getsv


def _empty_bam(path, refs=(("chrZ", 1000),)):
    w = BamWriter(str(path), [r[0] for r in refs], [r[1] for r in refs])
    w.close()


def test_empty_bam(tmp_path):
    bam = tmp_path / "empty.bam"
    _empty_bam(bam)
    r = read_bam(str(bam))
    assert r.n == 0 and r.ref_names == ["chrZ"]
    getclip(str(bam), str(tmp_path / "e"))
    assert gzip.open(str(tmp_path / "e.clip.gz"), "rb").read() == b""


def test_getsv_empty_inputs(tmp_path):
    bam = tmp_path / "empty.bam"
    _empty_bam(bam)
    clip_gz = tmp_path / "empty.clip.gz"
    with gzip.open(str(clip_gz), "wt"):
        pass
    sam = tmp_path / "empty.sam"
    sam.write_text("@HD\tVN:1.0\n@SQ\tSN:chrZ\tLN:1000\n")
    sv = tmp_path / "o.sv"
    getsv(str(sam), str(bam), str(clip_gz), str(sv),
          str(tmp_path / "o.fq"), filtered_out=io.StringIO())
    lines = sv.read_text().splitlines()
    assert len(lines) == 1 and lines[0].startswith("@left_chr")


def test_all_unmapped_bam(tmp_path):
    bam = tmp_path / "unm.bam"
    w = BamWriter(str(bam), ["chrZ"], [1000])
    for i in range(4):
        flag = 0x1 | 0x4 | 0x8 | (0x40 if i % 2 == 0 else 0x80)
        w.write_record(-1, -1, f"p{i // 2}".encode(), flag, 0, [],
                       b"ACGTACGTAC", b"IIIIIIIIII", -1, -1, 0)
    w.close()
    getclip(str(bam), str(tmp_path / "u"))
    fq1 = gzip.open(str(tmp_path / "u.unmapped_1.fq.gz"), "rt").read()
    fq2 = gzip.open(str(tmp_path / "u.unmapped_2.fq.gz"), "rt").read()
    assert fq1.count("@") == 2 and fq2.count("@") == 2


def test_truncated_bam_errors(tmp_path):
    src = "/root/reference/example/cancer.sort.bam"
    import os
    if not os.path.exists(src):
        pytest.skip("example unavailable")
    data = open(src, "rb").read()
    bad = tmp_path / "trunc.bam"
    bad.write_bytes(data[: len(data) // 2 + 13])  # mid-block cut
    with pytest.raises(Exception):
        read_bam_python(str(bad))


def test_bai_512mb_defect_signature():
    """bench_scale's characterized-defect grader matches exactly the
    PARITY.md §9 signature and nothing else."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "bench_scale", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "bench_scale.py"))
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)
    B = 1 << 29

    def row(pos, ab):
        f = ["chr17", str(pos), "+", "5", "chr17", str(pos + 100), "+",
             "6", "0", str(ab), "DEL"] + ["1"] * 12
        return "\t".join(f) + "\n"

    ours = [row(100, 7), row(B + 50, 9), row(B + 900, 3)]
    ref_ok = [row(100, 7), row(B + 50, 0), row(B + 900, 0)]
    assert bs.bai_512mb_defect(ours, ref_ok)
    # below-2^29 difference: NOT the defect
    ref_bad = [row(100, 0), row(B + 50, 0), row(B + 900, 0)]
    assert not bs.bai_512mb_defect(ours, ref_bad)
    # reference nonzero where ours differs: NOT the defect
    ref_bad2 = [row(100, 7), row(B + 50, 1), row(B + 900, 0)]
    assert not bs.bai_512mb_defect(ours, ref_bad2)
    # a non-col-10 difference: NOT the defect
    ref_bad3 = [row(100, 7), row(B + 51, 0), row(B + 900, 0)]
    assert not bs.bai_512mb_defect(ours, ref_bad3)
    # identical outputs: no defect to claim
    assert not bs.bai_512mb_defect(ours, list(ours))
