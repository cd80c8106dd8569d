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
