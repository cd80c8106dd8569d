"""Pallas TPU kernel for batched anchored affine-gap extension.

The Mosaic/VMEM formulation of ops.jax_kernels.sw_extend_batch with the
TPU-natural transposed layout: jobs ride the 128-wide lane axis, query
positions ride sublanes, and the target scan walks rows of a [LT, BT]
VMEM block (dynamic sublane indexing is lane-aligned by construction —
dynamic lane slices are not lowerable on Mosaic).  The whole DP state
([LQ, BT] H/E planes + [1, BT] scalars) lives in registers/VMEM; HBM
traffic is one read of the inputs and an [8, BT] result write per tile.
The row-gap recurrence uses the exact prefix-max formulation (log-step
sublane shifts) — no per-cell loop, pure VPU.

Semantics identical to align.sw.extend_score / sw_extend_batch
(property-tested in tests/test_pallas.py including zdrop freeze and
first-occurrence argmax tie-breaks).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MATCH = 1
MISMATCH = 4
GAP_OPEN = 6
GAP_EXT = 1
AMBIG = -1
NEG_INF = -0x10000000  # plain int: jnp consts would be captured kernel consts
ZDROP = 100
BIG = 0x7FFFFFFF


def _extend_kernel(q_ref, qlen_ref, t_ref, tlen_ref, h0_ref, out_ref):
    LQ, BT = q_ref.shape
    LT = t_ref.shape[0]
    q = q_ref[:]                      # [LQ, BT] int32
    qlen = qlen_ref[:]                # [1, BT]
    tlen = tlen_ref[:]
    h0 = h0_ref[:]
    jidx = jax.lax.broadcasted_iota(jnp.int32, (LQ, BT), 0) + 1   # 1..LQ
    valid_q = jidx <= qlen
    row0 = h0 - GAP_OPEN - jidx * GAP_EXT
    h = jnp.where((row0 >= 0) & valid_q, row0, NEG_INF)           # [LQ, BT]
    h_first = h0                                                   # [1, BT]
    e = jnp.full((LQ, BT), NEG_INF, jnp.int32)
    e_first = jnp.full((1, BT), NEG_INF, jnp.int32)

    at_qlen = jidx == qlen
    qlen_zero = qlen == 0

    def _prefix_max(u):
        """Inclusive prefix max along sublanes via log-step shifts."""
        p = u
        shift = 1
        while shift < LQ:
            shifted = jnp.concatenate(
                [jnp.full((shift, BT), NEG_INF, jnp.int32), p[:-shift, :]],
                axis=0)
            p = jnp.maximum(p, shifted)
            shift *= 2
        return p

    def loop(i, carry):
        (h_first, h, e_first, e, best, qle, tle, gscore, gtle, dead) = carry
        # dead is carried as int32 (i1 vectors do not legalize in scf.for)
        active = (i < tlen) & (dead == 0)                          # [1, BT]
        tcol = t_ref[pl.ds(i, 1), :]                               # [1, BT]
        ambig = (q > 3) | (tcol > 3)
        sub = jnp.where(ambig, AMBIG,
                        jnp.where(q == tcol, MATCH, -MISMATCH))
        h_shift = jnp.concatenate([h_first, h[:-1, :]], axis=0)
        diag = h_shift + sub
        ecand = jnp.maximum(h - GAP_OPEN, e) - GAP_EXT
        g = jnp.maximum(diag, ecand)
        h0_col = h0 - GAP_OPEN - (i + 1) * GAP_EXT                 # [1, BT]
        u = g + jidx * GAP_EXT
        pref = _prefix_max(u)
        pref = jnp.concatenate(
            [jnp.full((1, BT), NEG_INF, jnp.int32), pref[:-1, :]], axis=0)
        f = pref - GAP_OPEN - jidx * GAP_EXT
        h_row = jnp.where(valid_q, jnp.maximum(g, f), NEG_INF)
        row_best = jnp.max(h_row, axis=0, keepdims=True)           # [1, BT]
        # first-occurrence argmax without lax.argmax (int argmax is not
        # lowerable on Mosaic): min sublane index attaining the max
        row_arg = jnp.min(jnp.where(h_row == row_best, jidx, BIG),
                          axis=0, keepdims=True)
        improved = active & (row_best > best)
        best2 = jnp.where(improved, row_best, best)
        qle2 = jnp.where(improved, row_arg, qle)
        tle2 = jnp.where(improved, i + 1, tle)
        h_at_qlen = jnp.where(
            qlen_zero, h0_col,
            jnp.max(jnp.where(at_qlen, h_row, NEG_INF), axis=0,
                    keepdims=True))
        gimp = active & (h_at_qlen > gscore)
        gscore2 = jnp.where(gimp, h_at_qlen, gscore)
        gtle2 = jnp.where(gimp, i + 1, gtle)
        dead2 = jnp.maximum(
            dead, jnp.where(active & (row_best < best2 - ZDROP), 1, 0))
        h_first2 = jnp.where(active, h0_col, h_first)
        h2 = jnp.where(active, h_row, h)
        e_first2 = jnp.where(active, NEG_INF, e_first)
        e2 = jnp.where(active, jnp.where(valid_q, ecand, NEG_INF), e)
        return (h_first2, h2, e_first2, e2, best2, qle2, tle2,
                gscore2, gtle2, dead2)

    zeros = jnp.zeros((1, BT), jnp.int32)
    init = (h_first, h, e_first, e, h0, zeros, zeros,
            jnp.full((1, BT), NEG_INF, jnp.int32), zeros, zeros)
    (h_first, h, e_first, e, best, qle, tle, gscore, gtle,
     dead) = jax.lax.fori_loop(0, LT, loop, init)
    out_ref[pl.ds(0, 1), :] = best
    out_ref[pl.ds(1, 1), :] = qle
    out_ref[pl.ds(2, 1), :] = tle
    out_ref[pl.ds(3, 1), :] = gscore
    out_ref[pl.ds(4, 1), :] = gtle
    out_ref[pl.ds(5, 1), :] = zeros
    out_ref[pl.ds(6, 1), :] = zeros
    out_ref[pl.ds(7, 1), :] = zeros


def _pallas_core(q, qlen, t, tlen, h0, interpret=False):
    """The shared pallas_call invocation (q/t already widened [B, L])."""
    B, LQ = q.shape
    LT = t.shape[1]
    BT = 128
    Bp = ((B + BT - 1) // BT) * BT
    pad = Bp - B

    def _pad(x, fill):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    qT = _pad(q.astype(jnp.int32), 4).T          # [LQ, Bp]
    tT = _pad(t.astype(jnp.int32), 4).T          # [LT, Bp]
    qlenp = _pad(qlen.astype(jnp.int32), 0)[None, :]
    tlenp = _pad(tlen.astype(jnp.int32), 0)[None, :]
    h0p = _pad(h0.astype(jnp.int32), 0)[None, :]
    grid = (Bp // BT,)
    out = pl.pallas_call(
        _extend_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((LQ, BT), lambda i: (0, i)),
            pl.BlockSpec((1, BT), lambda i: (0, i)),
            pl.BlockSpec((LT, BT), lambda i: (0, i)),
            pl.BlockSpec((1, BT), lambda i: (0, i)),
            pl.BlockSpec((1, BT), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((8, BT), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, Bp), jnp.int32),
        interpret=interpret,
    )(qT, qlenp, tT, tlenp, h0p)
    return {"max_score": out[0, :B], "qle": out[1, :B], "tle": out[2, :B],
            "gscore": out[3, :B], "gtle": out[4, :B]}


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_extend_batch(q, qlen, t, tlen, h0, interpret=False):
    """Batched extension via the Pallas kernel.  Shapes/returns as in
    sw_extend_batch; the batch is padded to a multiple of 128 lanes."""
    return _pallas_core(q, qlen, t, tlen, h0, interpret)


# ---- nibble-packed upload path -------------------------------------------
# On tunneled/PCIe-constrained hosts the host->device copy dominates the
# end-to-end extension rate (ROOFLINE.md §3: 18 MB/s bulk uploads cap the
# device at 2.4 Gcell/s vs its 80 device-only).  Codes are 0..4, so two
# fit per byte: queries upload nibble-packed (2x smaller), and target
# windows are not uploaded at all — they are gathered ON DEVICE from a
# nibble-packed HBM-resident copy of the reference (uploaded once per
# process and reused by every batch; the gather's [B, LT] intermediate
# lives in HBM only).

def pack_nibbles(a):
    """[B, L] uint8 codes (0..4) -> [B, ceil(L/2)] uint8, host side."""
    import numpy as np
    B, L = a.shape
    if L % 2:
        a = np.concatenate([a, np.full((B, 1), 4, np.uint8)], axis=1)
    return (a[:, 0::2] | (a[:, 1::2] << 4)).astype(np.uint8)


def _unpack_nibbles(p, L):
    """[B, ceil(L/2)] uint8 -> [B, L] int32 (device side)."""
    lo = (p & 0xF).astype(jnp.int32)
    hi = (p >> 4).astype(jnp.int32)
    B = p.shape[0]
    return jnp.stack([lo, hi], axis=2).reshape(B, -1)[:, :L]


def _gather_ref_windows(refp, n_codes, start, tlen, LT, reverse):
    """Gather [B, LT] target windows from the packed reference.
    start is the absolute genome index of the window's FIRST element in
    scan order; reverse=True walks backwards (left-extension windows are
    reversed reference slices).  Out-of-range / beyond-tlen positions
    read as 4 (ambiguous, never matches)."""
    B = start.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, LT), 1)
    idx = start[:, None] + (-iota if reverse else iota)
    valid = (iota < tlen[:, None]) & (idx >= 0) & (idx < n_codes)
    idx_c = jnp.clip(idx, 0, n_codes - 1)
    byte = refp[idx_c >> 1]
    nib = jnp.where((idx_c & 1) == 1, byte >> 4, byte & 0xF).astype(jnp.int32)
    return jnp.where(valid, nib, 4)


@functools.partial(jax.jit,
                   static_argnames=("LQ", "LT", "reverse", "interpret"))
def pallas_extend_batch_resident(q4, qlen, tstart, tlen, h0, refp, n_codes,
                                 LQ, LT, reverse, interpret=False):
    """Extension with nibble-packed query upload + device-resident
    reference targets.  Exact-equivalent to pallas_extend_batch on the
    corresponding unpacked inputs (tests/test_pallas.py)."""
    q = _unpack_nibbles(q4, LQ)
    t = _gather_ref_windows(refp, n_codes, tstart, tlen, LT, reverse)
    return _pallas_core(q, qlen, t, tlen, h0, interpret)
