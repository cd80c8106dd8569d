"""End-to-end accuracy on synthetic data with known truth (the framework's
analog of the reference's simu_data workflow, SURVEY.md §4), including
virus-integration calling against a hybrid reference."""
import gzip
import io

import numpy as np
import pytest

from seeksv_tpu.align.engine import BatchAligner
from seeksv_tpu.io.bam import read_bam
from seeksv_tpu.pipeline.getclip import getclip
from seeksv_tpu.pipeline.getsv import getsv
from seeksv_tpu.utils.simulate import (build_donor, random_genome,
                                       simulate_reads, write_fasta)


def _run_pipeline(tmp_path, ref, donor, ref_names, ref_lens, seed=1,
                  coverage=35, **getsv_kw):
    d = str(tmp_path)
    n = simulate_reads(donor, ref_names, ref_lens, f"{d}/sim.bam",
                       coverage=coverage, seed=seed)
    write_fasta(f"{d}/ref.fa", ref)
    recs = read_bam(f"{d}/sim.bam")
    getclip(f"{d}/sim.bam", f"{d}/s", recs=recs)
    al = BatchAligner.from_fasta(f"{d}/ref.fa")
    seqs, quals = [], []
    with gzip.open(f"{d}/s.clip.fq.gz", "rt") as f:
        while True:
            h = f.readline()
            if not h:
                break
            seqs.append(f.readline().strip().encode())
            f.readline()
            quals.append(f.readline().strip())
    alns = al.batch_align(seqs)
    from seeksv_tpu.pipeline.driver import write_sam
    write_sam(al, seqs, quals, alns, f"{d}/s.clip.sam")
    getsv(f"{d}/s.clip.sam", f"{d}/sim.bam", f"{d}/s.clip.gz",
          f"{d}/s.sv", f"{d}/s.fq", recs=recs, filtered_out=io.StringIO(),
          **getsv_kw)
    calls = []
    for line in open(f"{d}/s.sv"):
        if line.startswith("@"):
            continue
        fl = line.split("\t")
        calls.append((fl[10], fl[0], int(fl[1]), fl[2],
                      fl[4], int(fl[5]), fl[6]))
    return calls, f"{d}/s.sv"


def test_simulated_del_inv_recall(tmp_path):
    rng = np.random.default_rng(3)
    G = 60_000
    ref = {"chrS": random_genome(rng, G)}
    dels = [(15_000, 16_000), (40_000, 42_000)]
    invs = [(25_000, 26_500)]
    donor = build_donor(ref, deletions=dels, inversions=invs)
    calls, _ = _run_pipeline(tmp_path, ref, donor, ["chrS"], [G])
    have = {(c[0], c[2], c[5]) for c in calls}
    for s, e in dels:
        assert ("DEL", s, e + 1) in have, f"missing DEL {s}-{e}"
    # inversion appears as its two breakend pairs
    s, e = invs[0]
    assert ("INV", s, e) in have or ("INV", s + 1, e + 1) in have


def test_virus_integration_hybrid_reference(tmp_path):
    """Virus-integration mode (ref README.md:79-81): align against a
    hybrid host+virus reference; the integration shows up as CTX junctions
    between the host chromosome and the virus contig."""
    rng = np.random.default_rng(11)
    GH, GV = 50_000, 3_000
    ref = {"chrH": random_genome(rng, GH), "virusX": random_genome(rng, GV)}
    # donor: chrH with a 800bp slice of virusX integrated at 20k
    virus_slice = ref["virusX"][1000:1800]
    donor = build_donor({"chrH": ref["chrH"]},
                        insertions=[(20_000, virus_slice)], chrom="chrH")
    # the simulator treats the insert as novel; clips realign to virusX
    calls, _ = _run_pipeline(tmp_path, ref, donor, ["chrH", "virusX"],
                             [GH, GV], seed=5)
    ctx = [c for c in calls if c[0] == "CTX"]
    assert ctx, f"no CTX integration junctions called: {calls}"
    # both host breakends should hit near position 20000 and virus coords
    host_sides = sorted(c[2] if c[1] == "chrH" else c[5] for c in ctx)
    assert any(abs(p - 20_000) <= 1 for p in host_sides), ctx
    virus_sides = [c[2] if c[1] == "virusX" else c[5] for c in ctx]
    assert any(1000 <= p <= 1801 for p in virus_sides), ctx


def test_simulated_novel_insertion_recall(tmp_path):
    """Novel-sequence insertions are recalled at exact truth coordinates
    as adjacent-breakend rows.  Reference-faithful caveats (both verified
    against the reference semantics):
      * the insert must be shorter than the soft clips, so the clip keeps
        a mappable flank past the novel sequence — longer novel inserts
        realign nowhere and produce no junction (500bp inserts yield zero
        calls; a 40bp insert with 62-69bp clips leaves a <30bp flank,
        under the bwa T=30 score floor -> unmapped: the physical limit of
        clip-realignment calling);
      * adjacent breakends (up_pos + 1 == down_pos) print as svtype
        "DEL" per clip_reads.cpp:572-581 (the "INS" label is reserved for
        up_pos > down_pos overlaps), and the default -l 50 min-distance
        filter drops them, so insertion calling requires -l 1."""
    rng = np.random.default_rng(7)
    G = 60_000
    ref = {"chrS": random_genome(rng, G)}
    ins = [(30_000, random_genome(rng, 30)),
           (45_000, random_genome(rng, 25))]
    donor = build_donor(ref, insertions=ins)
    calls, _ = _run_pipeline(tmp_path, ref, donor, ["chrS"], [G],
                             min_distance=1)
    have = {(c[0], c[2], c[5]) for c in calls}
    for p, _seq in ins:
        assert ("DEL", p, p + 1) in have, (p, sorted(have))
