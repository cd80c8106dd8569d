"""Differential tests: run the reference's bundled v1.2.0 binary on crafted
inputs and assert our implementation produces equivalent outputs, covering
paths the example data does not exercise (-B resume, -F read-through,
XC low-quality clips / -s)."""
import gzip
import io
import os
import shutil
import stat
import subprocess

import pytest

from seeksv_tpu.pipeline.getclip import getclip
from seeksv_tpu.pipeline.getsv import getsv

BIN_SRC = "/root/reference/example/bin/seeksv"


@pytest.fixture(scope="module")
def ref_bin(tmp_path_factory):
    if not os.path.exists(BIN_SRC):
        pytest.skip("reference binary unavailable")
    d = tmp_path_factory.mktemp("bin")
    dst = str(d / "seeksv")
    shutil.copy(BIN_SRC, dst)
    os.chmod(dst, os.stat(dst).st_mode | stat.S_IXUSR)
    return dst


def _sam(path, reads, header=True):
    with open(path, "w") as f:
        if header:
            f.write("@HD\tVN:1.0\tSO:coordinate\n@SQ\tSN:chr17\tLN:39950\n")
        for (q, flag, pos, mapq, cig, seq, qual, *tags) in reads:
            f.write(f"{q}\t{flag}\tchr17\t{pos}\t{mapq}\t{cig}\t*\t0\t0\t"
                    f"{seq}\t{qual}" + ("\t" + "\t".join(tags) if tags else "")
                    + "\n")


def test_xc_tag_and_save_low_quality(tmp_path, ref_bin):
    """XC!=0 clips are dropped unless -s (ref: clip_reads.cpp:126-129)."""
    sam = tmp_path / "in.sam"
    _sam(str(sam), [
        ("r1", 0, 100, 60, "20S30M", "A" * 20 + "T" * 30, "I" * 50, "XC:i:30"),
        ("r2", 0, 200, 60, "20S30M", "C" * 20 + "T" * 30, "I" * 50),
    ])
    for extra in ([], ["-s"]):
        ref_pre = str(tmp_path / ("ref_s" if extra else "ref"))
        subprocess.run([ref_bin, "getclip", *extra, "-o", ref_pre, str(sam)],
                       check=True, capture_output=True)
        our_pre = str(tmp_path / ("our_s" if extra else "our"))
        getclip(str(sam), our_pre, save_low_quality=bool(extra))
        want = gzip.open(f"{ref_pre}.clip.gz", "rb").read()
        got = gzip.open(f"{our_pre}.clip.gz", "rb").read()
        assert got == want, f"-s={bool(extra)}"
    # sanity: without -s only r2 survives; with -s both do
    assert gzip.open(str(tmp_path / "ref.clip.gz"), "rt").read().count("\n") == 1
    assert gzip.open(str(tmp_path / "ref_s.clip.gz"), "rt").read().count("\n") == 2


def _getsv_binary(ref_bin, tmp_path, tag, clip_sam, bam, clip_gz, extra=()):
    sv = str(tmp_path / f"{tag}.ref.sv")
    cmd = [ref_bin, "getsv", *extra, clip_sam, bam, clip_gz, sv,
           str(tmp_path / f"{tag}.ref.fq")]
    # one retry: the ORACLE binary (not code under test) occasionally
    # dies to transient resource pressure on this small host
    for attempt in range(2):
        r = subprocess.run(cmd, capture_output=True)
        if r.returncode == 0:
            break
    else:
        raise subprocess.CalledProcessError(r.returncode, cmd,
                                            r.stdout, r.stderr)
    return sv


def test_resume_breakpoint_B(tmp_path, ref_bin, example_dir, golden_dir):
    """-B preloads a previous sv.txt (ref: getsv.cpp:1292-1323)."""
    bam = str(example_dir / "cancer.sort.bam")
    clip_sam = str(golden_dir / "cancer.clip.sam")
    clip_gz = str(golden_dir / "cancer.clip.gz")
    prior = str(example_dir / "normal.sv")
    ref_sv = _getsv_binary(ref_bin, tmp_path, "b", clip_sam, bam, clip_gz,
                           extra=("-B", prior))
    our_sv = str(tmp_path / "b.our.sv")
    getsv(clip_sam, bam, clip_gz, our_sv, str(tmp_path / "b.our.fq"),
          temp_breakpoint=prior, filtered_out=io.StringIO())
    assert open(our_sv).read() == open(ref_sv).read()


def test_readthrough_F(tmp_path, ref_bin, example_dir, golden_dir):
    """-F seeds junctions from read-through split reads
    (ref: process_bwasw.cpp:5-227)."""
    # craft a read whose halves map on both sides of the 495/700 deletion:
    # record A: 3'-clipped at 495; record B: 5'-clipped at 700 (same qname)
    from seeksv_tpu.io.fasta import read_fasta
    fa = read_fasta(str(example_dir / "reference/example.fa"))
    chr17 = fa["chr17"].tobytes().decode()
    left = chr17[445:495]    # 50bp ending at 495 (1-based)
    right = chr17[699:749]   # 50bp starting at 700
    whole = left + right
    rt = tmp_path / "rt.sam"
    _sam(str(rt), [
        ("rt1", 0, 446, 60, "50M50S", whole, "I" * 100),
        ("rt1", 0, 700, 60, "50S50M", whole, "I" * 100),
    ])
    bam = str(example_dir / "cancer.sort.bam")
    clip_sam = str(golden_dir / "cancer.clip.sam")
    clip_gz = str(golden_dir / "cancer.clip.gz")
    ref_sv = _getsv_binary(ref_bin, tmp_path, "f", clip_sam, bam, clip_gz,
                           extra=("-F", str(rt)))
    our_sv = str(tmp_path / "f.our.sv")
    getsv(clip_sam, bam, clip_gz, our_sv, str(tmp_path / "f.our.fq"),
          connect_bam=str(rt), filtered_out=io.StringIO())
    assert open(our_sv).read() == open(ref_sv).read()
