"""Native C++ decoder vs pure-python decoder: identical SoA contract."""
import numpy as np
import pytest

from seeksv_tpu.io import native
from seeksv_tpu.io.bam import read_bam_python


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_decoder_equivalence(example_dir):
    path = str(example_dir / "cancer.sort.bam")
    a = native.read_bam_native(path)
    b = read_bam_python(path)
    assert a.n == b.n
    assert a.ref_names == b.ref_names and a.ref_lens == b.ref_lens
    for f in ("flag", "tid", "pos", "mapq", "mtid", "mpos", "isize",
              "l_qseq", "cig", "cig_off", "seq", "qual", "seq_off", "xc"):
        assert (getattr(a, f) == getattr(b, f)).all(), f
    assert a.qnames == b.qnames  # LazyQnames == list


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_error_handling(tmp_path):
    bad = tmp_path / "bad.bam"
    bad.write_bytes(b"garbage data that is not bgzf")
    with pytest.raises(IOError):
        native.read_bam_native(str(bad))


def test_coverage_diff_matches_numpy():
    rng = np.random.default_rng(0)
    starts = rng.integers(0, 900, 500)
    ends = starts + rng.integers(1, 200, 500)
    w = np.ones(500, np.int32)
    got = native.coverage_diff(starts, ends, w, 1000)
    ref = np.zeros(1001, np.int32)
    np.add.at(ref, np.clip(starts, 0, 1000), w)
    np.add.at(ref, np.clip(ends, 0, 1000), -w)
    assert (got == ref).all()
