"""Multi-chip sharding tests on the virtual CPU mesh (SURVEY.md §4:
shard-count invariance of outputs)."""
import jax
import numpy as np
import pytest

from seeksv_tpu.parallel import make_mesh, make_example_batch, sharded_evidence_step


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_sharded_evidence_step_runs(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_devices)
    G = 1024
    step = sharded_evidence_step(mesh, G)
    batch = make_example_batch(mesh, G)
    out = step(batch)
    assert out["coverage"].shape == (G,)
    assert int(out["insert_mean"][0]) > 0


def test_shard_count_invariance():
    """The same inputs produce identical coverage / candidate reductions /
    insert-size model on a 1-device and an 8-device mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    G = 2048
    outs = {}
    for n in (1, 8):
        mesh = make_mesh(n)
        step = sharded_evidence_step(mesh, G)
        batch = make_example_batch(mesh, G, seed=42)
        outs[n] = {k: np.asarray(v) if not isinstance(v, dict) else
                   {k2: np.asarray(v2) for k2, v2 in v.items()}
                   for k, v in step(batch).items()}
    a, b = outs[1], outs[8]
    assert (a["coverage"] == b["coverage"]).all()
    assert int(a["insert_mean"][0]) == int(b["insert_mean"][0])
    assert int(a["insert_dev"][0]) == int(b["insert_dev"][0])
    # candidate keyed reduction: compare the (key -> support) maps
    def cand_map(o):
        k = o["cand_sorted_keys"]
        f = o["cand_first"].astype(bool)
        s = o["cand_support_sum"]
        return dict(zip(k[f].tolist(), s[f].tolist()))
    assert cand_map(a) == cand_map(b)
    for key in ("max_score", "qle", "tle", "gscore", "gtle"):
        assert (np.sort(a["sw"][key]) == np.sort(b["sw"][key])).all()


def test_sharded_getclip_identical(tmp_path):
    """Coordinate-sharded getclip reproduces the single-stream output
    byte-for-byte on the example BAM (SURVEY.md §4: shard-count invariance
    of the real pipeline, not just the kernels)."""
    import gzip
    import pathlib
    example = pathlib.Path("/root/reference/example")
    if not example.exists():
        pytest.skip("example data unavailable")
    from seeksv_tpu.parallel.sharded_getclip import getclip_sharded
    from seeksv_tpu.pipeline.getclip import getclip
    for n_shards in (2, 5):
        getclip(str(example / "cancer.sort.bam"), str(tmp_path / "ref"))
        getclip_sharded(str(example / "cancer.sort.bam"),
                        str(tmp_path / f"sh{n_shards}"), n_shards=n_shards)
        for suffix in ("clip.gz", "clip.fq.gz"):
            a = gzip.open(str(tmp_path / f"ref.{suffix}"), "rb").read()
            b = gzip.open(str(tmp_path / f"sh{n_shards}.{suffix}"), "rb").read()
            assert a == b, (n_shards, suffix)
