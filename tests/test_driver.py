import io

import numpy as np
import pytest

from seeksv_tpu.pipeline.driver import run_pipeline
from seeksv_tpu.utils.simulate import (build_donor, random_genome,
                                       simulate_reads, write_fasta)


def test_run_pipeline_with_somatic(tmp_path, example_dir, golden_dir):
    """One-shot driver reproduces the committed outputs end-to-end,
    including somatic subtraction — the whole example workflow in one call."""
    run_pipeline(str(example_dir / "reference/example.fa"),
                 str(example_dir / "cancer.sort.bam"),
                 str(tmp_path / "cancer"),
                 normal_bam=str(example_dir / "normal.sort.bam"))
    assert (tmp_path / "cancer.sv").read_bytes() == \
        (example_dir / "cancer.sv").read_bytes()
    assert (tmp_path / "cancer.somatic.sv").read_bytes() == \
        (example_dir / "cancer.somatic.sv").read_bytes()


def test_rescue_fastq_virus_iteration(tmp_path):
    """--rescue keeps unmapped clips (the functional virus-iteration path
    the reference dead-codes): a novel 600bp insertion absent from the
    alignment reference surfaces its junction-crossing clips in the rescue
    fastq, and those sequences realign to the missing contig."""
    rng = np.random.default_rng(21)
    G = 40_000
    host = random_genome(rng, G)
    virus = random_genome(rng, 2_000)
    ref = {"chrH": host}
    donor = build_donor(ref, insertions=[(15_000, virus[500:1100])],
                        chrom="chrH")
    d = str(tmp_path)
    simulate_reads(donor, ["chrH"], [G], f"{d}/sim.bam", coverage=40, seed=4)
    write_fasta(f"{d}/host.fa", ref)   # host-only reference
    run_pipeline(f"{d}/host.fa", f"{d}/sim.bam", f"{d}/s", rescue=True)
    rescue = open(f"{d}/s.unmapped.clip.fq").read().splitlines()
    assert rescue, "rescue fastq empty with rescue=True"
    # the rescued clips are virus sequence: they must realign to the virus
    from seeksv_tpu.align.engine import Aligner
    write_fasta(f"{d}/virus.fa", {"virusX": virus})
    va = Aligner.from_fasta(f"{d}/virus.fa")
    seqs = [rescue[i + 1].encode() for i in range(0, len(rescue), 4)]
    mapped = sum(1 for s in seqs if len(s) >= 30 and va.align(s).mapped)
    eligible = sum(1 for s in seqs if len(s) >= 30)
    assert eligible > 0 and mapped == eligible
