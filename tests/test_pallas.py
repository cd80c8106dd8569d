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
