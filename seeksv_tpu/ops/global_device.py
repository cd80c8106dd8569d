"""Device-side banded global alignment for the finalize stage.

The long-fragment realign bottleneck after the banded ladder landed is
the finalize stage itself: the winning candidates' global tracebacks
run on the host (csrc seeksv_sw_global ladder).  This module moves the
two cheap rungs (w = 16, 64) onto the TPU:

  rung 16  one banded DP pass for EVERY job computing terminal score +
           per-cell direction bits (5 bits/cell, packed 4 rows/word by
           the Mosaic kernel); the HOST applies the ladder's sound
           band-sufficiency bound to the scores.
  rung 64  the same pass at w=64, only for jobs rung 16's bound did
           not accept; acceptance precedence mirrors the host ladder's
           check order exactly (sound16, sound64, then the equal-
           adjacent-score heuristic emitting rung 16's traceback).
           Anything that would fall to rung 256 or full DP goes to the
           native host kernels unchanged.
  traceback  an on-device vectorized walk over the direction bits
           (masked: declined jobs walk zero steps) emits the op
           string, counts NM, and run-length-encodes on device; only
           (runs, nm, score) transfer back (RUNS_CAP runs/job;
           overflow -> host).

Direction bits reproduce the C++ traceback's VALUE comparisons
(sw_global_banded csrc: M if h==diag, else D-run while
E[i,j]==E[i,j-1]-ext, else I-run while F[i,j]==F[i-1,j]-ext), so the
emitted CIGAR/score/NM are bit-identical to the host ladder
(tests/test_global_device.py fuzzes equality).

Banded addressing: path constraint j - i in [dlo, dhi] with
dlo = min(0, n-m) - w, dhi = max(0, n-m) + w; band column
c = j - i - dlo keeps the diagonal move in the SAME column
(vertical: c+1, horizontal: c-1).  K is static per call; jobs whose
|n - m| exceeds K - 2w - 1 stay on the host.

Replaces the DP role the reference outsources to bwa's ksw
(reference README.md:30-31); no reference counterpart exists for the
device formulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

MATCH = 1
MISMATCH = 4
GAP_OPEN = 6
GAP_EXT = 1
AMBIG = -1
NEG_INF = -0x40000000          # csrc kNegInf: equality of deep negatives
RUNS_CAP = 64                  # cigar runs per job kept on device

# direction bit layout (one uint8 per in-band cell)
_DM = 1      # h == diag(H[i-1,j-1] + sub)
_DE = 2      # h == E[i,j]
_DF = 4      # h == F[i,j]
_ERUN = 8    # E[i,j] == E[i,j-1] - ext  (and j-1 >= 1, in band)
_FRUN = 16   # F[i,j] == F[i-1,j] - ext  (and i > 1, in band)


def _sub_scores(qcol, trow):
    """sub(q, t) per csrc sub_score: ambiguous (code > 3) -> AMBIG."""
    ambig = (qcol > 3) | (trow > 3)
    return jnp.where(ambig, AMBIG,
                     jnp.where(qcol == trow, MATCH, -MISMATCH))


def _row_init(dlo, n, K, K_real):
    """H row for i = 0: H[0,0] = 0; H[0,j] = -open - j*ext for
    1 <= j <= min(n, dhi); else NEG_INF.  F[0,*] = NEG_INF."""
    c = jnp.arange(K, dtype=jnp.int32)[None, :]
    j0 = dlo[:, None] + c
    h0 = jnp.where(
        j0 == 0, 0,
        jnp.where((j0 >= 1) & (j0 <= n[:, None]) & (c < K_real[:, None]),
                  -GAP_OPEN - j0 * GAP_EXT, NEG_INF)).astype(jnp.int32)
    f0 = jnp.full_like(h0, NEG_INF)
    return h0, f0


def _shift_left(x, fill=NEG_INF):
    """x[:, c] -> x[:, c+1] (band col of (i-1, j) seen from (i, j))."""
    return jnp.concatenate(
        [x[:, 1:], jnp.full((x.shape[0], 1), fill, x.dtype)], axis=1)


def _excl_prefix_max(u):
    """Exclusive running max along axis 1 (the m2 scan of the E
    recurrence: max over k < j of g_k + k*ext and the j=0 boundary)."""
    inc = jax.lax.associative_scan(jnp.maximum, u, axis=1)
    return jnp.concatenate(
        [jnp.full((u.shape[0], 1), NEG_INF, u.dtype), inc[:, :-1]], axis=1)


def _band_row(i, hprev, fprev, q_i, t2, dlo, n, K, K_real, want_dirs):
    """One DP row i (>= 1) over the band for all jobs.

    Returns (h, f, e, dirbits or None).  hprev/fprev are row i-1 with
    NEG_INF in every out-of-band/invalid cell, so the recurrences fail
    naturally at band edges (mirrors the C++ inb() guards)."""
    B, K_ = hprev.shape
    c = jnp.arange(K_, dtype=jnp.int32)[None, :]
    j = i + dlo[:, None] + c
    computed = (j >= 1) & (j <= n[:, None]) & (c < K_real[:, None])
    boundary_j0 = (j == 0) & (c < K_real[:, None])
    # target codes for (i, c): t[j-1] = t2[:, (i-1) + c]
    trow = jax.lax.dynamic_slice_in_dim(t2, i - 1, K_, axis=1)
    sub = _sub_scores(q_i[:, None], trow)
    diag = hprev + sub                                  # (i-1, j-1): same col
    hup = _shift_left(hprev)                            # (i-1, j): col c+1
    fup = _shift_left(fprev)
    f = jnp.maximum(hup - GAP_OPEN, fup) - GAP_EXT
    g = jnp.maximum(diag, f)
    bval = (-GAP_OPEN - i * GAP_EXT)
    # m2 scan input: g + j*ext on computed cells, the boundary value at
    # j = 0 (k = 0 contributes b + 0*ext)
    u = jnp.where(computed, g + j * GAP_EXT,
                  jnp.where(boundary_j0, bval, NEG_INF))
    m2 = _excl_prefix_max(u)
    e = m2 - GAP_OPEN - j * GAP_EXT
    h = jnp.maximum(g, e)
    h = jnp.where(computed, h, jnp.where(boundary_j0, bval, NEG_INF))
    f = jnp.where(computed, f, jnp.where(boundary_j0, bval, NEG_INF))
    e = jnp.where(computed, e, NEG_INF)
    dirs = None
    if want_dirs:
        dm = computed & (h == diag)
        de = computed & (h == e)
        df = (computed & (h == f)) | boundary_j0
        eprev = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF, e.dtype), e[:, :-1]], axis=1)
        erun = computed & (j - 1 >= 1) & (e == eprev - GAP_EXT)
        frun = (computed | boundary_j0) & (i > 1) & (f == fup - GAP_EXT)
        dirs = (dm * _DM + de * _DE + df * _DF + erun * _ERUN
                + frun * _FRUN).astype(jnp.uint8)
    return h, f, e, dirs


def _scan_band(q, qlen, t2, dlo, n, K, LQ, want_dirs):
    """Run rows 1..LQ; capture the terminal score H[m][n] at i == m
    (band col c_end = max(0, n-m) + w = n - m - dlo)."""
    B = q.shape[0]
    # dlo = min(0, n-m) - w  ->  w = min(0, n-m) - dlo; band extent
    # K_real = dhi - dlo + 1 = |n-m| + 2w + 1; terminal cell (m, n)
    # sits at band col c_end = n - m - dlo = max(0, n-m) + w.
    w = jnp.minimum(0, n - qlen) - dlo
    K_real = jnp.abs(n - qlen) + 2 * w + 1
    c_end = (n - qlen) - dlo
    h0, f0 = _row_init(dlo, n, K, K_real)
    q_t = q.T.astype(jnp.int32)                        # [LQ, B]
    score0 = jnp.where(qlen == 0, jnp.where(n == 0, 0, NEG_INF),
                       jnp.full((B,), NEG_INF, jnp.int32))

    def step(carry, xs):
        hprev, fprev, score = carry
        i, q_i = xs
        h, f, e, dirs = _band_row(i, hprev, fprev, q_i, t2, dlo, n,
                                  K, K_real, want_dirs)
        at_m = i == qlen
        sc_here = jnp.take_along_axis(h, c_end[:, None], axis=1)[:, 0]
        score = jnp.where(at_m, sc_here, score)
        ys = dirs if want_dirs else jnp.zeros((1,), jnp.uint8)
        return (h, f, score), ys

    iis = jnp.arange(1, LQ + 1, dtype=jnp.int32)
    (h, f, score), ys = jax.lax.scan(step, (h0, f0, score0), (iis, q_t))
    return score, (ys if want_dirs else None)


@functools.partial(jax.jit, static_argnames=("K", "LQ"))
def banded_direction(q, qlen, t2, dlo, n, K, LQ):
    """One banded DP pass: terminal scores + [LQ, B, K] direction bits
    (q [B, LQ] int8/int32 codes, t2 the dlo-shifted target panel from
    build_t2, dlo/n per job).  XLA-scan form — the oracle for the
    Mosaic kernel below and the CPU/test path."""
    return _scan_band(q, qlen, t2, dlo, n, K, LQ, want_dirs=True)


@functools.partial(jax.jit, static_argnames=("K", "LQ", "LT"))
def build_t2(t, tlen, dlo, K, LQ, LT):
    """Shift each target row by its dlo so the band row i reads the
    contiguous slice t2[:, i-1 : i-1+K]: t2[b, y] = t[b, y + dlo[b]]
    (out of range -> code 4, never matches)."""
    B = t.shape[0]
    y = jnp.arange(LQ + K, dtype=jnp.int32)[None, :]
    idx = y + dlo[:, None]
    valid = (idx >= 0) & (idx < tlen[:, None]) & (idx < LT)
    idx_c = jnp.clip(idx, 0, LT - 1)
    vals = jnp.take_along_axis(t.astype(jnp.int32), idx_c, axis=1)
    return jnp.where(valid, vals, 4)


@functools.partial(jax.jit, static_argnames=("K", "LQ", "T"))
def traceback_rle(dirs, q, t2, qlen, n, dlo, K, LQ, T):
    """Walk the direction bits from (m, n) to (0, 0) per job, emitting
    ops (0=M, 1=I, 2=D), then run-length-encode on device.  NM is NOT
    computed here (it needs a base compare per M column — the engine
    derives it from the runs on the host, io.native.nm_from_runs).

    Returns (runs_len [B, RUNS_CAP] int32, runs_op [B, RUNS_CAP] as
    0/1/2, n_runs [B] int32 — RUNS_CAP+1 on overflow).

    The walk reproduces csrc sw_global_banded's traceback exactly:
    H-mode checks dm, then de (entering a D-run continued while the
    cell's ERUN bit holds), then df (I-run via FRUN), then the
    value-escape fallbacks; rows i = 0 / cols j = 0 reduce to pure
    D / I runs (H[0,j] = E[0,j], H[i,0] = F[i,0])."""
    B = q.shape[0]

    def gather_dir(i, j):
        c = j - i - dlo
        cc = jnp.clip(c, 0, K - 1)
        row = jnp.clip(i - 1, 0, LQ - 1)
        d = dirs[row, jnp.arange(B), cc]
        ok = (i >= 1) & (c >= 0) & (c < K)
        return jnp.where(ok, d, 0).astype(jnp.int32)

    i0 = qlen.astype(jnp.int32)
    j0 = n.astype(jnp.int32)

    def step(carry, tt):
        i, j, mode, done = carry
        d = gather_dir(i, j)
        op, cnt, i2, j2, mode2, done2 = _walk_step(i, j, mode, done, d)
        return (i2, j2, mode2, done2), (op, cnt)

    init = (i0, j0, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32))
    _, (ops_rev, cnt_rev) = jax.lax.scan(
        step, init, jnp.arange(T, dtype=jnp.int32))
    return _rle_tail(ops_rev.T, cnt_rev.T, T)


def _walk_step(i, j, mode, done, d, m_extra=None):
    """One traceback step (C++ preference order; see traceback_rle).
    Returns (op 0/1/2 or 3=none, count, i', j', mode', done').
    m_extra: optional [B] int32 of ADDITIONAL consecutive M steps
    provable from already-gathered bits (multi-M consumption in the
    packed walk: the diagonal move keeps the band column fixed, so the
    next rows' dm bits live in the same packed word)."""
    at_end = (i == 0) & (j == 0)
    in_e = mode == 1
    in_f = mode == 2
    erun = (d & _ERUN) != 0
    frun = (d & _FRUN) != 0
    can_m = (i > 0) & (j > 0) & ((d & _DM) != 0)
    can_d = (j > 0) & ((d & _DE) != 0)
    can_f = (i > 0) & ((d & _DF) != 0)
    fb_m = (i > 0) & (j > 0)
    fb_d = j > 0
    h_op = jnp.where(
        can_m, 0,
        jnp.where(can_d, 2,
                  jnp.where(can_f, 1,
                            jnp.where(fb_m, 0, jnp.where(fb_d, 2, 1)))))
    op = jnp.where(in_e, 2, jnp.where(in_f, 1, h_op))
    op = jnp.where(at_end | (done != 0), 3, op)
    is_m = op == 0
    is_i = op == 1
    is_d = op == 2
    cnt = jnp.where(op == 3, 0, 1)
    if m_extra is not None:
        # extend a dm-chosen M by the provable extra steps (never past
        # i/j bounds — the caller's bits already encode in-band cells,
        # and the walk's own bound checks apply per consumed row)
        ext = jnp.where(is_m & (h_op == 0) & ~in_e & ~in_f,
                        jnp.minimum(m_extra,
                                    jnp.minimum(i - 1, j - 1)), 0)
        ext = jnp.maximum(ext, 0)
        cnt = cnt + ext
    di = jnp.where(is_m | is_i, cnt, 0)
    dj = jnp.where(is_m | is_d, cnt, 0)
    i2 = jnp.where(done != 0, i, i - di)
    j2 = jnp.where(done != 0, j, j - dj)
    # next mode: D entered/continued while the CURRENT cell's ERUN bit
    # holds; I via FRUN (C++ while conditions, checked before the final
    # decrement)
    enter_e = is_d & erun & ((in_e) | ((~in_e) & (~in_f)))
    enter_f = is_i & frun & ((in_f) | ((~in_e) & (~in_f)))
    mode2 = jnp.where(done != 0, mode,
                      jnp.where(enter_e, 1, jnp.where(enter_f, 2, 0)))
    done2 = jnp.maximum(done, at_end.astype(jnp.int32))
    return op.astype(jnp.uint8), cnt.astype(jnp.int32), i2, j2, mode2, done2


def _rle_tail(ops_rev, cnt_rev, T):
    """Reverse the per-step (op, count) emissions into forward order and
    run-length-encode (every pre-done step emits, so the emitted prefix
    is contiguous and reversal is a pure index flip)."""
    B = ops_rev.shape[0]
    emitted = cnt_rev > 0
    L = jnp.sum(emitted.astype(jnp.int32), axis=1)
    tt = jnp.arange(T, dtype=jnp.int32)[None, :]
    src = jnp.clip(L[:, None] - 1 - tt, 0, T - 1)
    ops_fwd = jnp.take_along_axis(ops_rev, src, axis=1)
    ops_fwd = jnp.where(tt < L[:, None], ops_fwd, 3)
    cnt_fwd = jnp.take_along_axis(cnt_rev, src, axis=1)
    cnt_fwd = jnp.where(tt < L[:, None], cnt_fwd, 0)
    prev = jnp.concatenate(
        [jnp.full((B, 1), 255, ops_fwd.dtype), ops_fwd[:, :-1]], axis=1)
    boundary = (ops_fwd != prev) & (tt < L[:, None])
    rid = jnp.cumsum(boundary.astype(jnp.int32), axis=1) - 1
    n_runs = jnp.where(L > 0, rid[:, -1] + 1, 0)
    over = n_runs > RUNS_CAP
    rid_c = jnp.clip(rid, 0, RUNS_CAP - 1)
    seg = jnp.arange(B, dtype=jnp.int32)[:, None] * RUNS_CAP + rid_c
    runs_len = jax.ops.segment_sum(
        cnt_fwd.reshape(-1), seg.reshape(-1),
        num_segments=B * RUNS_CAP).reshape(B, RUNS_CAP)
    runs_op = jax.ops.segment_max(
        jnp.where(cnt_fwd.reshape(-1) > 0,
                  ops_fwd.reshape(-1).astype(jnp.int32), -1),
        seg.reshape(-1), num_segments=B * RUNS_CAP).reshape(B, RUNS_CAP)
    n_runs = jnp.where(over, RUNS_CAP + 1, n_runs)
    return runs_len, runs_op, n_runs


# ---- Pallas TPU kernel ----------------------------------------------------
# The XLA-scan form above is the oracle (and the CPU/test path); it runs
# at ~0.6 Gcell/s on the chip — per-row dynamic slices and the prefix
# scan don't fuse.  The Mosaic form puts jobs on lanes (BT = 128), band
# columns on sublanes (K), loops rows with carried H/F planes in
# scratch, and packs 4 rows' direction bytes into one int32 word before
# the HBM write (direction volume = B*LQ*K bytes).  Grid is
# (job blocks, row chunks); scratch persists across the row chunks of a
# job block (TPU grids execute sequentially, last dim fastest).

_RC = 64          # DP rows per grid step (RC % 4 == 0; LQ % RC == 0)


def _banded_dir_kernel(q_ref, t2_ref, dlo_ref, m_ref, n_ref,
                       score_ref, dirs_ref, h_s, f_s, sc_s):
    K, BT = h_s.shape
    ir = pl.program_id(1)
    dlo = dlo_ref[:]                       # [1, BT]
    m = m_ref[:]
    n = n_ref[:]
    w = jnp.minimum(0, n - m) - dlo
    k_real = jnp.abs(n - m) + 2 * w + 1
    c_end = (n - m) - dlo
    ciota = jax.lax.broadcasted_iota(jnp.int32, (K, BT), 0)
    neg = jnp.full((K, BT), NEG_INF, jnp.int32)

    @pl.when(ir == 0)
    def _init():
        j0 = dlo + ciota
        h_s[:] = jnp.where(
            j0 == 0, 0,
            jnp.where((j0 >= 1) & (j0 <= n) & (ciota < k_real),
                      -GAP_OPEN - j0 * GAP_EXT, NEG_INF))
        f_s[:] = neg
        sc_s[:] = jnp.where((m == 0) & (n == 0), 0,
                            jnp.full((1, BT), NEG_INF, jnp.int32))

    def _shift_up(x):
        # x[c] -> x[c+1] along sublanes (band col of (i-1, j))
        return jnp.concatenate(
            [x[1:, :], jnp.full((1, BT), NEG_INF, jnp.int32)], axis=0)

    def _excl_pmax(u):
        p = u
        shift = 1
        while shift < K:
            p = jnp.maximum(p, jnp.concatenate(
                [jnp.full((shift, BT), NEG_INF, jnp.int32), p[:-shift, :]],
                axis=0))
            shift *= 2
        return jnp.concatenate(
            [jnp.full((1, BT), NEG_INF, jnp.int32), p[:-1, :]], axis=0)

    def group(g, _):
        # 4 DP rows per iteration, statically unrolled: their direction
        # bytes pack into one int32 word written once (no traced
        # conditionals, 4x fewer HBM stores)
        word = jnp.zeros((K, BT), jnp.int32)
        hprev = h_s[:]
        fprev = f_s[:]
        sc = sc_s[:]
        for lane in range(4):
            i = ir * _RC + g * 4 + lane + 1
            qi = q_ref[pl.ds(i - 1, 1), :]              # [1, BT]
            trow = t2_ref[pl.ds(i - 1, K), :]           # [K, BT]
            ambig = (qi > 3) | (trow > 3)
            sub = jnp.where(ambig, AMBIG,
                            jnp.where(trow == qi, MATCH, -MISMATCH))
            j = i + dlo + ciota
            computed = (j >= 1) & (j <= n) & (ciota < k_real)
            boundary_j0 = (j == 0) & (ciota < k_real)
            diag = hprev + sub
            hup = _shift_up(hprev)
            fup = _shift_up(fprev)
            f = jnp.maximum(hup - GAP_OPEN, fup) - GAP_EXT
            gmat = jnp.maximum(diag, f)
            bval = -GAP_OPEN - i * GAP_EXT
            u = jnp.where(computed, gmat + j * GAP_EXT,
                          jnp.where(boundary_j0, bval, NEG_INF))
            m2 = _excl_pmax(u)
            e = m2 - GAP_OPEN - j * GAP_EXT
            h = jnp.maximum(gmat, e)
            h = jnp.where(computed, h,
                          jnp.where(boundary_j0, bval, NEG_INF))
            fm = jnp.where(computed, f,
                           jnp.where(boundary_j0, bval, NEG_INF))
            em = jnp.where(computed, e, NEG_INF)
            dm = computed & (h == diag)
            de = computed & (h == em)
            df = (computed & (h == fm)) | boundary_j0
            eprev = jnp.concatenate(
                [jnp.full((1, BT), NEG_INF, jnp.int32), em[:-1, :]],
                axis=0)
            erun = computed & (j - 1 >= 1) & (em == eprev - GAP_EXT)
            frun = ((computed | boundary_j0) & (i > 1)
                    & (fm == fup - GAP_EXT))
            zero = jnp.zeros((K, BT), jnp.int32)
            dirb = (jnp.where(dm, _DM, zero)
                    | jnp.where(de, _DE, zero)
                    | jnp.where(df, _DF, zero)
                    | jnp.where(erun, _ERUN, zero)
                    | jnp.where(frun, _FRUN, zero))
            word = word | (dirb << (lane * 8))
            sc_here = jnp.max(jnp.where(ciota == c_end, h, NEG_INF),
                              axis=0, keepdims=True)
            sc = jnp.where(i == m, sc_here, sc)
            hprev = h
            fprev = fm
        dirs_ref[pl.ds(g * K, K), :] = word
        h_s[:] = hprev
        f_s[:] = fprev
        sc_s[:] = sc
        return 0

    jax.lax.fori_loop(0, _RC // 4, group, 0)
    score_ref[:] = sc_s[:]


@functools.partial(jax.jit, static_argnames=("K", "LQ", "interpret"))
def pallas_banded_direction(q, qlen, t2, dlo, n, K, LQ, interpret=False):
    """Mosaic banded DP: returns (score [B], dirsP [(LQ//4)*K, Bp]
    int32 packed direction words, Bp).  Word for DP row i, band col c
    is dirsP[((i-1)//4)*K + c, b], byte (i-1) % 4.  Equivalent to
    banded_direction after unpacking (tests/test_global_device.py)."""
    from jax.experimental.pallas import tpu as pltpu
    B = q.shape[0]
    BT = 128
    Bp = ((B + BT - 1) // BT) * BT
    pad = Bp - B

    def _pad(x, fill):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    qT = _pad(q.astype(jnp.int32), 4).T                    # [LQ, Bp]
    t2T = _pad(t2.astype(jnp.int32), 4).T                  # [LQ+K, Bp]
    dl = _pad(dlo.astype(jnp.int32), 0)[None, :]
    mm = _pad(qlen.astype(jnp.int32), 0)[None, :]
    nn = _pad(n.astype(jnp.int32), 0)[None, :]
    assert LQ % _RC == 0 and _RC % 4 == 0
    grid = (Bp // BT, LQ // _RC)
    score, dirs = pl.pallas_call(
        _banded_dir_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((LQ, BT), lambda b, r: (0, b)),
            pl.BlockSpec((LQ + K, BT), lambda b, r: (0, b)),
            pl.BlockSpec((1, BT), lambda b, r: (0, b)),
            pl.BlockSpec((1, BT), lambda b, r: (0, b)),
            pl.BlockSpec((1, BT), lambda b, r: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((1, BT), lambda b, r: (0, b)),
            pl.BlockSpec(((_RC // 4) * K, BT), lambda b, r: (r, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct(((LQ // 4) * K, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, BT), jnp.int32),
            pltpu.VMEM((K, BT), jnp.int32),
            pltpu.VMEM((1, BT), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(qT, t2T, dl, mm, nn)
    return score[0, :B], dirs, Bp


@functools.partial(jax.jit, static_argnames=("K", "LQ", "T"))
def traceback_rle_packed(dirsP, q, t2, qlen, n, dlo, K, LQ, T):
    """traceback_rle over the Mosaic kernel's packed direction words:
    one int32 gather per step, AND multi-M consumption — a diagonal
    (M) move keeps the band column fixed, so the next three rows' dm
    bits live in the already-gathered word (bytes b-1..b-3); an M step
    extends by every provable consecutive dm, cutting the
    latency-bound scan's step count ~3-4x in M-dominated walks.
    Identical runs to traceback_rle (C++ checks dm FIRST at every
    cell, so consecutive dm cells are exactly consecutive M ops).
    q/t2/qlen/n/dlo are the UNPADDED [B, ...] host-order arrays; the
    padded lanes of dirsP are simply never addressed."""
    B = q.shape[0]
    i0 = qlen.astype(jnp.int32)
    j0 = n.astype(jnp.int32)

    def step(carry, tt):
        i, j, mode, done = carry
        c = j - i - dlo
        cc = jnp.clip(c, 0, K - 1)
        g = jnp.clip((i - 1) >> 2, 0, LQ // 4 - 1) * K + cc
        word = dirsP[g, jnp.arange(B)]
        b = (i - 1) & 3
        ok = (i >= 1) & (c >= 0) & (c < K)
        d = jnp.where(ok, (word >> (b * 8)) & 0xFF, 0).astype(jnp.int32)

        def dm_at(l):
            sh = jnp.maximum(b - l, 0) * 8
            return (b >= l) & ((((word >> sh) & 0xFF) & _DM) != 0)

        e1 = dm_at(1)
        e2 = e1 & dm_at(2)
        e3 = e2 & dm_at(3)
        m_extra = jnp.where(ok, e1.astype(jnp.int32)
                            + e2.astype(jnp.int32)
                            + e3.astype(jnp.int32), 0)
        op, cnt, i2, j2, mode2, done2 = _walk_step(i, j, mode, done, d,
                                                   m_extra)
        return (i2, j2, mode2, done2), (op, cnt)

    init = (i0, j0, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32))
    _, (ops_rev, cnt_rev) = jax.lax.scan(
        step, init, jnp.arange(T, dtype=jnp.int32))
    return _rle_tail(ops_rev.T, cnt_rev.T, T)


# ---- host orchestration ---------------------------------------------------

_OPCHR = np.array(["M", "I", "D"])


class DeviceGlobalAligner:
    """Batched device finalize over the two cheap rungs; host decides
    acceptance from phase-A scores with the exact ladder rules and
    keeps everything else on the native path."""

    # static shape menu: (w, K) pairs; |n - m| must fit K - 2w - 1
    RUNGS = ((16, 128), (64, 256))
    LQ_BUCKETS = (512, 1024, 1536, 2048)

    def __init__(self, max_dir_bytes: int = 1 << 30):
        # per-chunk cap on the packed direction tensor in HBM; bigger
        # chunks amortize the traceback scan's per-step latency (the
        # dominant device cost — ~0.2 ms/step regardless of B)
        self.max_dir_bytes = max_dir_bytes

    @staticmethod
    def _bucket(v, menu):
        for b in menu:
            if v <= b:
                return b
        return None

    def eligible(self, m: int, n: int) -> bool:
        """Jobs the device rungs can take: the long-fragment regime the
        host ladder targets, diagonal offset small enough that EVERY
        rung's band fits its static K (a job accepted at rung 16 via
        the equal-score heuristic must not have its w=16 band
        truncated: |n-m| <= min over rungs of K - 2w - 1)."""
        if not (m > 256 and n > 256):
            return False
        if abs(n - m) > min(K - 2 * w - 1 for w, K in self.RUNGS):
            return False
        return (self._bucket(m, self.LQ_BUCKETS) is not None
                and self._bucket(n, self.LQ_BUCKETS) is not None)

    @staticmethod
    def _sound_ceiling(mn, ad, w):
        return (MATCH * (mn - (w + 1)) - 2 * GAP_OPEN
                - (ad + 2 * (w + 1)) * GAP_EXT)

    @staticmethod
    def _use_pallas() -> bool:
        import os
        if os.environ.get("SEEKSV_TPU_GLOBAL_DEVICE_XLA"):
            return False
        try:
            return jax.devices()[0].platform != "cpu"
        except Exception:
            return False

    def align_batch(self, qs, ts):
        """qs/ts: lists of np code arrays (the finalize sel jobs).
        Returns {job_index: (score, [(len, op), ...], nm)} for jobs
        completed on device; missing indices fall back to the host
        native path (ladder decision fell past rung 64, run overflow,
        or ineligible shapes).

        One DP pass per rung per chunk (score + direction bits
        together): rung 16 runs for every job, rung 64 only for jobs
        its sound bound did not accept; tracebacks run masked (declined
        jobs walk zero steps), so no per-rung job gathering is needed.
        The Mosaic kernel serves accelerator backends; the XLA-scan
        oracle serves CPU (tests/dryruns)."""
        idxs = [i for i, (q, t) in enumerate(zip(qs, ts))
                if self.eligible(len(q), len(t))]
        if not idxs:
            return {}
        ms = np.asarray([len(qs[i]) for i in idxs], np.int32)
        ns = np.asarray([len(ts[i]) for i in idxs], np.int32)
        LQ = self._bucket(int(ms.max()), self.LQ_BUCKETS)
        LT = self._bucket(int(ns.max()), self.LQ_BUCKETS)
        B = len(idxs)
        q = np.full((B, LQ), 4, np.uint8)
        t = np.full((B, LT), 4, np.uint8)
        for r, i in enumerate(idxs):
            q[r, :ms[r]] = qs[i]
            t[r, :ns[r]] = ts[i]
        out = {}
        # chunk so the packed direction tensor stays bounded in HBM
        chunk = max(128, self.max_dir_bytes // (LQ * self.RUNGS[-1][1]))
        for c0 in range(0, B, chunk):
            c1 = min(B, c0 + chunk)
            self._chunk(q[c0:c1], t[c0:c1], ms[c0:c1], ns[c0:c1],
                        idxs[c0:c1], LQ, LT, out)
        return out

    def _chunk(self, q, t, ms, ns, idxs, LQ, LT, out):
        use_pallas = self._use_pallas()
        qd = jax.device_put(q)
        td = jax.device_put(t)
        md = jax.device_put(ms)
        nd = jax.device_put(ns)
        mn = np.minimum(ms, ns)
        ad = np.abs(ns - ms)
        B = len(idxs)

        def run_dir(w, K):
            dlo = (np.minimum(0, ns - ms) - w).astype(np.int32)
            dl = jax.device_put(dlo)
            t2 = build_t2(td, nd, dl, K=K, LQ=LQ, LT=LT)
            if use_pallas:
                score, dirs, _ = pallas_banded_direction(
                    qd, md, t2, dl, nd, K=K, LQ=LQ)
            else:
                score, dirs = banded_direction(
                    qd, md, t2, dl, nd, K=K, LQ=LQ)
            return np.asarray(score), dirs, t2, dl

        accepted = []      # (out_index, row, score, cigar) pending NM

        def run_tb(dirs, t2, dl, accept, score_arr, K):
            mm = jax.device_put(np.where(accept, ms, 0).astype(np.int32))
            nnn = jax.device_put(np.where(accept, ns, 0).astype(np.int32))
            T = LQ + K
            if use_pallas:
                rl, ro, nr = traceback_rle_packed(
                    dirs, qd, t2, mm, nnn, dl, K=K, LQ=LQ, T=T)
            else:
                rl, ro, nr = traceback_rle(
                    dirs, qd, t2, mm, nnn, dl, K=K, LQ=LQ, T=T)
            rl = np.asarray(rl)
            ro = np.asarray(ro)
            nr = np.asarray(nr)
            for rr in np.nonzero(accept)[0]:
                k = int(nr[rr])
                if k == 0 or k > RUNS_CAP:
                    continue              # overflow -> host fallback
                cigar = [(int(rl[rr, x]), _OPCHR[int(ro[rr, x])])
                         for x in range(k)]
                accepted.append((idxs[rr], rr, int(score_arr[rr]), cigar))

        # rung 16 for every job; acceptance precedence mirrors the host
        # ladder's check order exactly (csrc seeksv_sw_global: per rung
        # the SOUND bound is tested before the equal-adjacent
        # heuristic): sound16, then sound64, then equal -> rung 16
        w16, K16 = self.RUNGS[0]
        w64, K64 = self.RUNGS[1]
        sc16, dirs16, t2_16, dl16 = run_dir(w16, K16)
        sound16 = sc16 >= self._sound_ceiling(mn, ad, w16)
        need64 = ~sound16
        sound64 = np.zeros(B, bool)
        equal = np.zeros(B, bool)
        if need64.any():
            sc64, dirs64, t2_64, dl64 = run_dir(w64, K64)
            sound64 = need64 & (sc64 >= self._sound_ceiling(mn, ad, w64))
            equal = need64 & ~sound64 & (sc16 == sc64)
        acc16 = sound16 | equal
        if acc16.any():
            run_tb(dirs16, t2_16, dl16, acc16, sc16, K16)
        if sound64.any():
            run_tb(dirs64, t2_64, dl64, sound64, sc64, K64)
        if accepted:
            # NM on the host from the runs (mismatches on M + indel
            # bases; the device walk no longer compares bases)
            from ..io import native
            a_q = [q[rr, :ms[rr]] for _oi, rr, _sc, _cg in accepted]
            a_t = [t[rr, :ns[rr]] for _oi, rr, _sc, _cg in accepted]
            a_runs = [cg for _oi, _rr, _sc, cg in accepted]
            if native.nm_from_runs_available():
                nms = native.nm_from_runs(a_q, a_t, a_runs)
            else:
                nms = []
                for qq, tt_, cg in zip(a_q, a_t, a_runs):
                    qi = ti = mm_ = 0
                    for ln, op_ in cg:
                        if op_ == "M":
                            mm_ += int(np.sum(qq[qi:qi + ln]
                                              != tt_[ti:ti + ln]))
                            qi += ln
                            ti += ln
                        elif op_ == "I":
                            mm_ += ln
                            qi += ln
                        else:
                            mm_ += ln
                            ti += ln
                    nms.append(mm_)
            for (oi, _rr, sc, cg), nmv in zip(accepted, nms):
                out[oi] = (sc, cg, int(nmv))
