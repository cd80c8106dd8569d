import io

import pytest

from seeksv_tpu.pipeline.getsv import getsv
from seeksv_tpu.pipeline.somatic import somatic, somatic_filter


@pytest.mark.parametrize("sample", ["cancer", "normal"])
def test_getsv_parity(tmp_path, example_dir, golden_dir, sample):
    """cancer.sv / normal.sv byte parity (SURVEY.md §6 parity oracle)."""
    sv = tmp_path / f"{sample}.sv"
    filt = io.StringIO()
    getsv(str(golden_dir / f"{sample}.clip.sam"),
          str(example_dir / f"{sample}.sort.bam"),
          str(golden_dir / f"{sample}.clip.gz"),
          str(sv), str(tmp_path / f"{sample}.rescue.fq"), filtered_out=filt)
    assert sv.read_bytes() == (example_dir / f"{sample}.sv").read_bytes()
    # the reference run produces no filtered rows on the example set
    assert filt.getvalue() == ""
    assert (tmp_path / f"{sample}.rescue.fq").read_bytes() == b""


def test_somatic_parity(tmp_path, example_dir, golden_dir):
    temp = tmp_path / "cancer.somatic.temp.sv"
    final = tmp_path / "cancer.somatic.sv"
    somatic(str(example_dir / "normal.sort.bam"),
            str(golden_dir / "normal.clip.gz"),
            str(example_dir / "cancer.sv"), str(temp))
    assert temp.read_bytes() == (golden_dir / "cancer.somatic.temp.sv").read_bytes()
    somatic_filter(str(temp), str(final))
    assert final.read_bytes() == (example_dir / "cancer.somatic.sv").read_bytes()


def test_full_pipeline_cli(tmp_path, example_dir, golden_dir):
    """End-to-end via the CLI: getclip -> (bwa-fixture sam) -> getsv ->
    somatic -> somatic-filter, asserting every final artifact."""
    from seeksv_tpu.cli import main
    for s in ("cancer", "normal"):
        assert main(["getclip", "-o", str(tmp_path / s),
                     str(example_dir / f"{s}.sort.bam")]) == 0
        assert main(["getsv",
                     str(golden_dir / f"{s}.clip.sam"),
                     str(example_dir / f"{s}.sort.bam"),
                     str(tmp_path / f"{s}.clip.gz"),
                     str(tmp_path / f"{s}.sv"),
                     str(tmp_path / f"{s}.rescue.fq")]) == 0
        assert (tmp_path / f"{s}.sv").read_bytes() == \
            (example_dir / f"{s}.sv").read_bytes()
    assert main(["somatic",
                 str(example_dir / "normal.sort.bam"),
                 str(tmp_path / "normal.clip.gz"),
                 str(tmp_path / "cancer.sv"),
                 str(tmp_path / "cancer.somatic.temp.sv")]) == 0
    assert main(["somatic-filter", str(tmp_path / "cancer.somatic.temp.sv"),
                 str(tmp_path / "cancer.somatic.sv")]) == 0
    assert (tmp_path / "cancer.somatic.sv").read_bytes() == \
        (example_dir / "cancer.somatic.sv").read_bytes()
