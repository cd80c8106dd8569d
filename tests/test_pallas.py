"""Pallas extension kernel vs the XLA scan kernel (interpret mode on CPU;
the real-TPU run is exercised by bench/graft paths)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from seeksv_tpu.ops.jax_kernels import sw_extend_batch
from seeksv_tpu.ops.pallas_sw import pallas_extend_batch


def test_pallas_matches_xla_kernel():
    rng = np.random.default_rng(5)
    B, LQ, LT = 128, 48, 96
    q = np.full((B, LQ), 4, np.int32)
    t = np.full((B, LT), 4, np.int32)
    qlen = rng.integers(0, LQ + 1, B).astype(np.int32)
    tlen = rng.integers(1, LT + 1, B).astype(np.int32)
    h0 = rng.integers(10, 40, B).astype(np.int32)
    for b in range(B):
        qc = rng.integers(0, 4, qlen[b])
        tc = rng.integers(0, 4, tlen[b])
        if b % 2 == 0 and tlen[b] >= qlen[b] and qlen[b] > 0:
            tc[:qlen[b]] = qc
            mut = rng.random(qlen[b]) < 0.12
            tc[:qlen[b]][mut] = rng.integers(0, 4, int(mut.sum()))
        q[b, :qlen[b]] = qc
        t[b, :tlen[b]] = tc
    ref = sw_extend_batch(jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t),
                          jnp.asarray(tlen), jnp.asarray(h0))
    got = pallas_extend_batch(jnp.asarray(q), jnp.asarray(qlen),
                              jnp.asarray(t), jnp.asarray(tlen),
                              jnp.asarray(h0), interpret=True)
    for k in ("max_score", "qle", "tle", "gscore", "gtle"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]),
                                      err_msg=k)


def test_pallas_resident_matches_xla_kernel():
    """Nibble-packed query upload + device-side reference-window gather
    (pallas_extend_batch_resident) vs the XLA kernel on the equivalent
    expanded windows — both directions (left windows walk backwards)."""
    from seeksv_tpu.ops.pallas_sw import (pack_nibbles,
                                          pallas_extend_batch_resident)
    rng = np.random.default_rng(11)
    G = 5_000
    genome = rng.integers(0, 4, G).astype(np.uint8)
    genome[rng.random(G) < 0.01] = 4          # ambiguous sprinkles
    gp = genome.copy()
    if len(gp) % 2:
        gp = np.concatenate([gp, np.full(1, 4, np.uint8)])
    refp = jnp.asarray((gp[0::2] | (gp[1::2] << 4)).astype(np.uint8))
    B, LQ, LT = 64, 40, 80
    q = np.full((B, LQ), 4, np.uint8)
    qlen = rng.integers(0, LQ + 1, B).astype(np.int32)
    tlen = rng.integers(1, LT + 1, B).astype(np.int32)
    h0 = rng.integers(10, 40, B).astype(np.int32)
    for reverse in (False, True):
        start = rng.integers(0, G, B).astype(np.int32)
        # a few windows running off the genome edge (read as ambiguous)
        start[:4] = [0, 1, G - 1, G - 2]
        t = np.full((B, LT), 4, np.int32)
        for b in range(B):
            q[b, :qlen[b]] = rng.integers(0, 4, qlen[b])
            for j in range(tlen[b]):
                i = start[b] - j if reverse else start[b] + j
                if 0 <= i < G:
                    t[b, j] = genome[i]
        ref = sw_extend_batch(jnp.asarray(q.astype(np.int32)),
                              jnp.asarray(qlen), jnp.asarray(t),
                              jnp.asarray(tlen), jnp.asarray(h0))
        got = pallas_extend_batch_resident(
            jnp.asarray(pack_nibbles(q)), jnp.asarray(qlen),
            jnp.asarray(start), jnp.asarray(tlen), jnp.asarray(h0),
            refp, G, LQ, LT, reverse, interpret=True)
        for k in ("max_score", "qle", "tle", "gscore", "gtle"):
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(ref[k]),
                err_msg=f"{k} reverse={reverse}")
