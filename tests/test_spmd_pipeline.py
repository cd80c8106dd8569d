"""The REAL pipeline on the mesh: value parity of parallel/spmd_pipeline.py
with the sequential host pass (and therefore with the reference binary)
across 1/2/8-device meshes, plus exactness of the partitioned
MergeJunction and the cross-shard first-N insert-size mask."""
import copy
import gzip
import io

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from seeksv_tpu.parallel.mesh import make_mesh
from seeksv_tpu.parallel.spmd_pipeline import (merge_junction_sharded,
                                               spmd_coverage_insert,
                                               spmd_run_pipeline)
from seeksv_tpu.pipeline.driver import run_pipeline
from seeksv_tpu.pipeline.getsv import calculate_insert_size, merge_junction
from seeksv_tpu.pipeline.junctions import JunctionMap, OtherInfo, SeqInfo


@pytest.fixture(scope="module")
def host_outputs(example_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("host")
    run_pipeline(str(example_dir / "reference" / "example.fa"),
                 str(example_dir / "cancer.sort.bam"), str(d / "cancer"))
    return d


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_spmd_pipeline_value_parity(example_dir, host_outputs, tmp_path,
                                    n_devices):
    """The sv rows (and getclip text) produced by the mesh run equal the
    sequential host run byte-for-byte, for every mesh size."""
    mesh = make_mesh(n_devices)
    assert mesh.size == n_devices
    prefix = str(tmp_path / "spmd")
    spmd_run_pipeline(mesh, str(example_dir / "reference" / "example.fa"),
                      str(example_dir / "cancer.sort.bam"), prefix,
                      force_device_extend=True)  # exercise the mesh kernels
    got_sv = open(prefix + ".sv", "rb").read()
    want_sv = open(host_outputs / "cancer.sv", "rb").read()
    assert got_sv == want_sv
    # and the host run itself matches the committed reference output
    assert want_sv == open(example_dir / "cancer.sv", "rb").read()
    for suffix in (".clip.gz", ".clip.fq.gz"):
        got = gzip.open(prefix + suffix, "rb").read()
        want = gzip.open(str(host_outputs / "cancer") + suffix, "rb").read()
        assert got == want, suffix


def _random_jmap(rng, n_clusters=40, search_length=50):
    """Junction maps with merge-adjacent clusters: microhomology-shifted
    views of the same event plus decoys, exercising the MergeJunction
    branches (skip/short, 0.85 gate, mh priority rules)."""
    jmap = JunctionMap()
    chrs = ["chr1", "chr2"]
    strands = [("+", "+"), ("+", "-"), ("-", "+")]
    base = 1000
    for _ in range(n_clusters):
        uc, dc = chrs[rng.integers(2)], chrs[rng.integers(2)]
        us, ds = strands[rng.integers(3)]
        # cluster start: sometimes adjacent to the previous one
        base += int(rng.integers(0, 3)) * int(rng.integers(20, 200))
        up0 = base
        dn0 = int(rng.integers(500, 5000))
        useq = bytes(rng.integers(65, 69, 40).astype(np.uint8))
        dseq = bytes(rng.integers(65, 69, 40).astype(np.uint8))
        n_entries = int(rng.integers(1, 4))
        for _e in range(n_entries):
            mh = int(rng.integers(0, min(search_length + 10, 39)))
            if us == "+":
                u = useq + dseq[:mh]
                d = dseq[mh:]
            else:
                u = useq[mh:] if mh < len(useq) else b"A"
                d = useq[len(useq) - mh:] + dseq if mh else dseq
            if rng.random() < 0.2:  # corrupt one side: fails the 0.85 gate
                u = bytes(rng.integers(65, 69, len(u)).astype(np.uint8))
            up = SeqInfo(u, [(len(u), "M")],
                         int(rng.integers(0, 2)) * int(rng.integers(0, 5)),
                         0, int(rng.integers(0, 6)), int(rng.integers(0, 3)))
            down = SeqInfo(d, [(len(d), "M")], 0, 0,
                           int(rng.integers(0, 6)), int(rng.integers(0, 3)))
            pre_mh = -1 if rng.random() < 0.6 else int(rng.integers(0, 10))
            jmap.insert((uc, up0 + mh, us, dc, dn0 + mh, ds),
                        OtherInfo(up, down, pre_mh, 0))
    return jmap


@pytest.mark.parametrize("seed", range(8))
def test_merge_junction_sharded_exact(seed):
    rng = np.random.default_rng(seed)
    jmap = _random_jmap(rng)
    ref = copy.deepcopy(jmap)
    merge_junction(ref, 50)
    nparts = merge_junction_sharded(jmap, 50)
    assert nparts >= 1
    assert len(jmap.items) == len(ref.items)
    for (ja, oa), (jb, ob) in zip(jmap.items, ref.items):
        assert ja == jb
        assert oa == ob


@pytest.mark.parametrize("n_pairs", [37, 1000])
def test_spmd_insert_size_first_n_cap(example_dir, n_pairs):
    """The cross-shard prefix-count mask reproduces the reference's
    'first N proper pairs' semantics exactly (ref cluster.cpp:25-56),
    including when the cap truncates mid-shard."""
    from seeksv_tpu.io.bam import read_bam
    recs = read_bam(str(example_dir / "cancer.sort.bam"))
    want = calculate_insert_size(recs, 20, n_pairs)
    mesh = make_mesh(8)
    _cov, mean, dev = spmd_coverage_insert(mesh, recs, 20, n_pairs)
    assert (mean, dev) == want


def test_spmd_insert_size_isize_overflow_spill(example_dir):
    """isize >= 65536 (outside the device histogram) spills to exact
    host-side values instead of raising — the mesh path keeps the host
    path's robustness (VERDICT r2 item 8)."""
    import copy

    from seeksv_tpu.io.bam import read_bam
    recs = read_bam(str(example_dir / "cancer.sort.bam"))
    recs = copy.copy(recs)
    isz = np.array(recs.isize, copy=True)
    # plant huge insert sizes on a few qualifying records
    from seeksv_tpu.io.bam import FDUP, FPAIRED, FPROPER_PAIR
    ok = ((recs.mapq >= 20) & ((recs.flag & FPAIRED) != 0)
          & ((recs.flag & FPROPER_PAIR) != 0)
          & ((recs.flag & FDUP) == 0) & (isz > 0))
    idx = np.nonzero(ok)[0][:5]
    isz[idx] = [70_000, 100_000, 66_000, 1 << 20, 65_536]
    recs.isize = isz
    want = calculate_insert_size(recs, 20, 5_000_000)
    mesh = make_mesh(8)
    _cov, mean, dev = spmd_coverage_insert(mesh, recs, 20, 5_000_000)
    assert (mean, dev) == want


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_spmd_discordant_sharded_equals_replicated(example_dir, n_devices):
    """Coordinate-sharded (halo'd) record sharding == the replicated form
    == the host counter, at every mesh size (VERDICT r2 item 5; ref
    window bound getsv.cpp:1032)."""
    import pathlib
    from seeksv_tpu.io.bam import read_bam
    from seeksv_tpu.pipeline.getsv import (DiscordantCounter, JunctionMap,
                                           calculate_insert_size,
                                           input_soft_info, merge_junction)
    from seeksv_tpu.parallel.spmd_pipeline import (
        spmd_discordant_counts, spmd_discordant_counts_sharded)
    golden = pathlib.Path(__file__).parent / "golden"
    recs = read_bam(str(example_dir / "cancer.sort.bam"))
    jmap = JunctionMap()
    input_soft_info(str(golden / "cancer.clip.gz"),
                    str(golden / "cancer.clip.sam"), jmap, [])
    merge_junction(jmap, 50)
    mean, dev = calculate_insert_size(recs, 20, 5_000_000)
    dc = DiscordantCounter(recs, 20, mean, dev, 4)
    junctions = [j for j, _ in jmap.items] + [
        ("chr17", 700, "-", "chr17", 495, "+"),
        ("chr17", 700, "+", "chr17", 900, "-"),
        ("chr17", 900, "+", "chr17", 700, "+"),
        ("chr17", 500, "+", "chrM", 500, "+"),
        ("chrM", 400, "+", "chr17", 600, "+"),
    ]
    host = np.asarray([dc.count(j) for j in junctions])
    mesh = make_mesh(n_devices)
    repl = spmd_discordant_counts(mesh, dc, junctions)
    shrd = spmd_discordant_counts_sharded(mesh, dc, junctions)
    assert np.array_equal(repl, host)
    assert np.array_equal(shrd, host)


def test_spmd_coverage_matches_host(example_dir):
    from seeksv_tpu.io.bam import read_bam
    from seeksv_tpu.pipeline.getsv import compute_coverage
    recs = read_bam(str(example_dir / "cancer.sort.bam"))
    want = compute_coverage(recs, 20)
    mesh = make_mesh(8)
    cov, _m, _d = spmd_coverage_insert(mesh, recs, 20, 5_000_000)
    for t in want:
        assert np.array_equal(cov[t], want[t]), t
