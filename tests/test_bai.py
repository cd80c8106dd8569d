"""BAI index reader/writer + region queries (the samtools index/view roles,
L0 completeness per SURVEY.md §7 phase 1)."""
import numpy as np
import pytest

from seeksv_tpu.io.bai import build_index, view_region
from seeksv_tpu.io.bam import read_bam_python


def _truth(recs, tid, beg0, end0):
    span = recs.ref_span(count_x=True)
    return {(recs.qnames[i].decode(), int(recs.flag[i]), int(recs.pos[i]))
            for i in range(recs.n)
            if recs.tid[i] == tid and recs.pos[i] < end0
            and recs.pos[i] + max(int(span[i]), 1) > beg0}


def test_view_with_samtools_index(example_dir):
    bam = str(example_dir / "cancer.sort.bam")
    recs = read_bam_python(bam)
    got = {(r["qname"], r["flag"], r["pos"])
           for r in view_region(bam, "chr17", 700, 800)}
    assert got == _truth(recs, 0, 699, 800)


def test_build_index_roundtrip(tmp_path, example_dir):
    """Our .bai over the reference BAM answers queries identically to the
    bundled samtools-made index."""
    bam = str(example_dir / "cancer.sort.bam")
    ours = build_index(bam, str(tmp_path / "cancer.bai"))
    for region in ((700, 800), (1, 200), (4900, 5200), (39000, 39950)):
        a = {(r["qname"], r["pos"]) for r in view_region(bam, "chr17", *region)}
        b = {(r["qname"], r["pos"])
             for r in view_region(bam, "chr17", *region, bai_path=ours)}
        assert a == b, region


def test_index_own_bam(tmp_path):
    from seeksv_tpu.utils.simulate import (build_donor, random_genome,
                                           simulate_reads)
    rng = np.random.default_rng(1)
    ref = {"chrS": random_genome(rng, 50_000)}
    donor = build_donor(ref, deletions=[(20_000, 21_000)])
    bam = str(tmp_path / "sim.bam")
    simulate_reads(donor, ["chrS"], [50_000], bam, coverage=20, seed=1)
    build_index(bam)
    recs = read_bam_python(bam)
    got = {(r["qname"], r["flag"], r["pos"])
           for r in view_region(bam, "chrS", 20_000, 20_500)}
    assert got == _truth(recs, 0, 19_999, 20_500)
