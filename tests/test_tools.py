from seeksv_tpu.pipeline.svcompare import compare
from seeksv_tpu.pipeline.vcf import breakpoint_to_vcf


def test_vcf_emitter(tmp_path, example_dir):
    out = tmp_path / "cancer.vcf"
    breakpoint_to_vcf(str(example_dir / "cancer.sv"), None, str(out))
    lines = out.read_text().splitlines()
    recs = [l for l in lines if not l.startswith("#")]
    assert len(recs) == 6  # 3 junctions x 2 breakends
    f0 = recs[0].split("\t")
    # first cancer junction: chr17:495 + / chr17:700 +
    assert f0[0] == "chr17" and f0[1] == "495" and f0[2] == "bnd1_U"
    assert f0[4] == f"{f0[3]}]chr17:700]"
    assert "MATEID=bnd1_D" in f0[7] and "SVTYPE=BND" in f0[7]
    f1 = recs[1].split("\t")
    assert f1[4] == f"[chr17:495[{f1[3]}"


def test_svcompare_seeksv_self(tmp_path, example_dir):
    out = tmp_path / "cmp.txt"
    compare("seeksv", str(example_dir / "cancer.sv"),
            str(example_dir / "cancer.sv"), str(out))
    lines = [l.split("\t") for l in out.read_text().splitlines()]
    tags = [l[0] for l in lines]
    assert tags.count("control_share") == 3
    assert tags.count("target_share") == 3
    assert "control_only" not in tags and "target_only" not in tags


def test_svcompare_fuzzy_and_only(tmp_path, example_dir):
    # perturb one junction within 50bp, drop another -> share + only rows
    src = (example_dir / "cancer.sv").read_text().splitlines()
    rows = src[1:]
    f = rows[0].split("\t")
    f[1] = str(int(f[1]) + 10)
    mod = "\n".join([src[0], "\t".join(f), rows[1]]) + "\n"
    tgt = tmp_path / "target.sv"
    tgt.write_text(mod)
    out = tmp_path / "cmp.txt"
    compare("seeksv", str(example_dir / "cancer.sv"), str(tgt), str(out))
    tags = [l.split("\t")[0] for l in out.read_text().splitlines()]
    assert tags.count("target_share") == 2   # fuzzy hit + exact hit
    assert tags.count("control_only") == 1   # the dropped junction
