"""Device seeding kernel vs the host batched seeder (itself proven equal
to the per-read path by test_align.py::test_batch_seeding_equivalence)."""
import gzip
import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from seeksv_tpu.align.engine import Aligner
from seeksv_tpu.align.index import ENCODE, KmerIndex
from seeksv_tpu.align.seed_batch import batch_candidates
from seeksv_tpu.ops.seed_device import DeviceSeeder


def _strand_expand(seqs):
    reads = []
    for s in seqs:
        fwd = ENCODE[np.frombuffer(s, np.uint8)]
        rev = np.where(fwd[::-1] < 4, 3 - fwd[::-1], 4).astype(np.uint8)
        reads.extend([fwd, rev])
    return reads


def test_device_seeding_example_clips(example_dir):
    al = Aligner.from_fasta(str(example_dir / "reference/example.fa"))
    seqs = []
    with gzip.open(str(pathlib.Path(__file__).parent / "golden"
                       / "cancer.clip.fq.gz"), "rt") as f:
        while True:
            h = f.readline()
            if not h:
                break
            seqs.append(f.readline().strip().encode())
            f.readline()
            f.readline()
    reads = _strand_expand(seqs)
    host = batch_candidates(al.idx, reads)
    dev = DeviceSeeder(al.idx).seed(reads)
    assert dev is not None
    assert dev == host


def test_device_seeding_random_repeats():
    """Repeat-heavy random genome: exercises multi-hit kmers, MAX_OCC
    drops, ambiguous bases and empty candidate sets."""
    rng = np.random.default_rng(11)
    unit = rng.integers(0, 4, 400).astype(np.uint8)
    genome = np.concatenate([
        rng.integers(0, 4, 3000).astype(np.uint8)] +
        [unit] * 30 + [rng.integers(0, 4, 3000).astype(np.uint8)])
    idx = KmerIndex.build(
        {"c1": np.array(list(b"ACGT"), np.uint8)[genome]}, k=19)
    reads = []
    for _ in range(120):
        ln = int(rng.integers(15, 120))
        st = int(rng.integers(0, len(genome) - ln))
        r = genome[st:st + ln].copy()
        mut = rng.random(ln) < 0.05
        r[mut] = rng.integers(0, 4, int(mut.sum()))
        r[rng.random(ln) < 0.02] = 4           # ambiguous
        reads.append(r)
    reads.append(np.full(60, 4, np.uint8))     # all-N read
    reads.append(unit[:50].copy())             # lands in the repeat
    host = batch_candidates(idx, reads)
    dev = DeviceSeeder(idx).seed(reads)
    assert dev is not None
    assert dev == host


def test_device_seeding_overflow_fallback():
    rng = np.random.default_rng(3)
    unit = rng.integers(0, 4, 100).astype(np.uint8)
    genome = np.concatenate([unit] * 80)
    idx = KmerIndex.build(
        {"c1": np.array(list(b"ACGT"), np.uint8)[genome]}, k=19)
    reads = [genome[:90].copy() for _ in range(64)]
    assert DeviceSeeder(idx).seed(reads, hit_cap=256) is None


def test_batch_aligner_device_seed_end_to_end(example_dir):
    """BatchAligner with the device seeding front-end produces identical
    alignments to the host-seeded path on all example clip sequences."""
    from seeksv_tpu.align.engine import BatchAligner
    host_al = BatchAligner.from_fasta(str(example_dir / "reference/example.fa"))
    dev_al = BatchAligner(host_al.idx, device_seed=True)
    seqs = []
    with gzip.open(str(pathlib.Path(__file__).parent / "golden"
                       / "cancer.clip.fq.gz"), "rt") as f:
        while True:
            h = f.readline()
            if not h:
                break
            seqs.append(f.readline().strip().encode())
            f.readline()
            f.readline()
    assert dev_al.batch_align(seqs) == host_al.batch_align(seqs)
