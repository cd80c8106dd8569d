"""Somatic subtraction on simulated tumor/normal pairs: germline events
shared by both samples must be subtracted; tumor-only events must survive.
Also covers inter-chromosomal (CTX) junctions via a two-chromosome donor."""
import numpy as np
import pytest

from seeksv_tpu.pipeline.driver import run_pipeline
from seeksv_tpu.utils.simulate import (Donor, Segment, build_donor,
                                       random_genome, simulate_reads,
                                       write_fasta)


def test_somatic_subtraction_simulated(tmp_path):
    rng = np.random.default_rng(13)
    G = 80_000
    ref = {"chrS": random_genome(rng, G)}
    germline = [(20_000, 21_000)]
    somatic_only = [(50_000, 52_000)]
    tumor_donor = build_donor(ref, deletions=germline + somatic_only)
    normal_donor = build_donor(ref, deletions=germline)
    d = str(tmp_path)
    write_fasta(f"{d}/ref.fa", ref)
    simulate_reads(tumor_donor, ["chrS"], [G], f"{d}/tumor.bam",
                   coverage=35, seed=8)
    simulate_reads(normal_donor, ["chrS"], [G], f"{d}/normal.bam",
                   coverage=35, seed=9)
    run_pipeline(f"{d}/ref.fa", f"{d}/tumor.bam", f"{d}/t",
                 normal_bam=f"{d}/normal.bam")
    calls = [l.split("\t") for l in open(f"{d}/t.sv") if not l.startswith("@")]
    called = {(int(f[1]), int(f[5])) for f in calls}
    assert (20_000, 21_001) in called and (50_000, 52_001) in called
    som = [l.split("\t") for l in open(f"{d}/t.somatic.sv")
           if not l.startswith("@")]
    som_called = {(int(f[1]), int(f[5])) for f in som}
    assert (50_000, 52_001) in som_called, "somatic DEL lost by subtraction"
    assert (20_000, 21_001) not in som_called, "germline DEL not subtracted"


def test_translocation_ctx(tmp_path):
    """A donor chromosome spliced from chrA and chrB produces a CTX
    junction at the fusion point."""
    rng = np.random.default_rng(17)
    GA, GB = 40_000, 40_000
    ref = {"chrA": random_genome(rng, GA), "chrB": random_genome(rng, GB)}
    fuseA, fuseB = 25_000, 10_000
    segs = [Segment("chrA", 0, fuseA, 1), Segment("chrB", fuseB, GB, 1)]
    parts = [ref["chrA"][0:fuseA], ref["chrB"][fuseB:GB]]
    bounds = np.asarray([0, fuseA, fuseA + (GB - fuseB)], np.int64)
    donor = Donor(segs, np.concatenate(parts), bounds,
                  [("CTX", "chrA", fuseA, "chrB", fuseB + 1)])
    d = str(tmp_path)
    write_fasta(f"{d}/ref.fa", ref)
    simulate_reads(donor, ["chrA", "chrB"], [GA, GB], f"{d}/sim.bam",
                   coverage=35, seed=10)
    run_pipeline(f"{d}/ref.fa", f"{d}/sim.bam", f"{d}/s")
    calls = [l.split("\t") for l in open(f"{d}/s.sv") if not l.startswith("@")]
    ctx = [f for f in calls if f[10] == "CTX"]
    assert ctx, f"no CTX called: {[(f[0], f[1], f[4], f[5], f[10]) for f in calls]}"
    f = ctx[0]
    assert f[0] == "chrA" and abs(int(f[1]) - fuseA) <= 1
    assert f[4] == "chrB" and abs(int(f[5]) - (fuseB + 1)) <= 1
