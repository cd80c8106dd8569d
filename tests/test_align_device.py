"""Fused device alignment front-end (ops.align_device) vs the host
BatchAligner window path — full Alignment-object equality, so every piece
(seed table, on-device window gather, both extension rounds, clip/extend
decisions) must agree bit-for-bit with the host formulation."""
import gzip
import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from seeksv_tpu.align.engine import BatchAligner
from seeksv_tpu.align.index import KmerIndex


def _example_clips():
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
    return seqs


def test_device_align_example_clips(example_dir):
    host = BatchAligner.from_fasta(str(example_dir / "reference/example.fa"))
    dev = BatchAligner(host.idx, device_align=True)
    seqs = _example_clips()
    assert dev.batch_align(seqs) == host.batch_align(seqs)


def test_device_align_random_genome():
    """Random genome with a repeat block, indels, mismatches, ambiguous
    bases, unmappable reads — the same adversarial surface as the device
    seeder test, but checked end-to-end at the Alignment level."""
    rng = np.random.default_rng(23)
    unit = rng.integers(0, 4, 300).astype(np.uint8)
    genome = np.concatenate(
        [rng.integers(0, 4, 5000).astype(np.uint8)] + [unit] * 10 +
        [rng.integers(0, 4, 5000).astype(np.uint8)])
    bases = np.array(list(b"ACGT"), np.uint8)
    idx = KmerIndex.build({"c1": bases[genome]}, k=19)
    host = BatchAligner(idx)
    dev = BatchAligner(idx, device_align=True)
    seqs = []
    for _ in range(150):
        ln = int(rng.integers(20, 160))
        st = int(rng.integers(0, len(genome) - ln))
        r = genome[st:st + ln].copy()
        mut = rng.random(ln) < 0.04
        r[mut] = rng.integers(0, 4, int(mut.sum()))
        r[rng.random(ln) < 0.01] = 4
        if rng.random() < 0.3:     # simulate an indel in the read
            cut = int(rng.integers(5, ln - 5))
            if rng.random() < 0.5:
                r = np.delete(r, slice(cut, min(cut + 3, ln - 1)))
            else:
                r = np.insert(r, cut, rng.integers(0, 4, 2).astype(np.uint8))
        seq = bytes(bases[np.where(r < 4, r, 0)])
        seq = bytes(c if r[i] < 4 else ord("N") for i, c in enumerate(seq))
        seqs.append(seq)
    seqs.append(b"N" * 40)                       # all-ambiguous
    seqs.append(bytes(bases[rng.integers(0, 4, 50)]))  # likely unmappable
    seqs.append(bytes(bases[unit[:60]]))         # repeat-block read
    assert dev.batch_align(seqs) == host.batch_align(seqs)


def test_device_align_overflow_falls_back():
    rng = np.random.default_rng(5)
    unit = rng.integers(0, 4, 100).astype(np.uint8)
    genome = np.concatenate([unit] * 80)
    bases = np.array(list(b"ACGT"), np.uint8)
    idx = KmerIndex.build({"c1": bases[genome]}, k=19)
    host = BatchAligner(idx)
    dev = BatchAligner(idx, device_align=True)
    dev._device_aligner()   # build, then shrink the cap to force overflow
    import seeksv_tpu.ops.align_device as ad
    orig = ad.DeviceAligner.align_jobs
    calls = {}

    def patched(self, reads, hit_cap=256, max_hit_cap=256):
        out = orig(self, reads, hit_cap=hit_cap, max_hit_cap=max_hit_cap)
        calls["overflowed"] = out is None
        return out

    ad.DeviceAligner.align_jobs = patched
    try:
        seqs = [bytes(bases[genome[:90]]) for _ in range(64)]
        assert dev.batch_align(seqs) == host.batch_align(seqs)
        assert calls["overflowed"]
    finally:
        ad.DeviceAligner.align_jobs = orig
