import gzip

import pytest

from seeksv_tpu.pipeline.getclip import getclip


def _gz(path):
    with gzip.open(path, "rb") as f:
        return f.read()


@pytest.mark.parametrize("sample", ["cancer", "normal"])
def test_getclip_parity(tmp_path, example_dir, golden_dir, sample):
    """Byte parity with the reference binary's outputs on the example BAMs."""
    prefix = str(tmp_path / sample)
    getclip(str(example_dir / f"{sample}.sort.bam"), prefix)
    for suffix in ("clip.gz", "clip.fq.gz", "unmapped_1.fq.gz", "unmapped_2.fq.gz"):
        got = _gz(f"{prefix}.{suffix}")
        want = _gz(str(golden_dir / f"{sample}.{suffix}"))
        assert got == want, f"{sample}.{suffix} differs"
