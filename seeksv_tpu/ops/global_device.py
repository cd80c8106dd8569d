"""Device-side banded global alignment for the finalize stage.

The long-fragment realign bottleneck after the banded ladder landed is
the finalize stage itself: the winning candidates' global tracebacks
run on the host (csrc seeksv_sw_global ladder).  This module moves the
two cheap rungs (w = 16, 64) onto the TPU:

  phase A  banded scores for both rungs in one upload (no traceback
           state; lax.scan rows over a [B, K] band).
  decide   the HOST applies the ladder acceptance rules to the scores —
           identical logic to align.sw.global_align_np: sound
           band-sufficiency bound per rung, then the equal-adjacent-
           score heuristic; anything that would fall to rung 256 or
           full DP goes to the native host kernels unchanged.
  phase B  per accepted rung: banded DP again recording per-cell
           direction bits (5 bits/cell), then an on-device traceback
           walk (vectorized over jobs) that emits the op string, counts
           NM, and run-length-encodes on device; only (runs, nm, score)
           transfer back (RUNS_CAP runs/job; overflow -> host).

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
def banded_scores(q, qlen, t2, dlo, n, K, LQ):
    """Phase A: terminal banded scores only.  q [B, LQ] int8/int32 codes,
    t2 the dlo-shifted target panel (build_t2), dlo/n per job."""
    score, _ = _scan_band(q, qlen, t2, dlo, n, K, LQ, want_dirs=False)
    return score


@functools.partial(jax.jit, static_argnames=("K", "LQ"))
def banded_direction(q, qlen, t2, dlo, n, K, LQ):
    """Phase B forward pass: terminal scores + [LQ, B, K] direction
    bits."""
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
    ops (0=M, 1=I, 2=D), accumulating NM (mismatches on M + indel
    bases), then run-length-encode on device.

    Returns (runs_len [B, RUNS_CAP] int32, runs_op [B, RUNS_CAP] uint8
    as 0/1/2, n_runs [B] int32 — RUNS_CAP+1 on overflow, nm [B]).

    The walk reproduces csrc sw_global_banded's traceback exactly:
    H-mode checks dm, then de (entering a D-run continued while the
    cell's ERUN bit holds), then df (I-run via FRUN), then the
    value-escape fallbacks; rows i = 0 / cols j = 0 reduce to pure
    D / I runs (H[0,j] = E[0,j], H[i,0] = F[i,0])."""
    B = q.shape[0]
    i0 = qlen.astype(jnp.int32)
    j0 = n.astype(jnp.int32)

    def gather_dir(i, j):
        c = j - i - dlo
        cc = jnp.clip(c, 0, K - 1)
        row = jnp.clip(i - 1, 0, LQ - 1)
        d = dirs[row, jnp.arange(B), cc]
        ok = (i >= 1) & (c >= 0) & (c < K)
        return jnp.where(ok, d, 0).astype(jnp.int32)

    def step(carry, tt):
        i, j, mode, nm, done = carry
        d = gather_dir(i, j)
        qi = jnp.take_along_axis(
            q.astype(jnp.int32), jnp.clip(i - 1, 0, LQ - 1)[:, None],
            axis=1)[:, 0]
        # t[j-1] = t2[:, (j-1) - dlo] (y + dlo = j-1)
        tj = jnp.take_along_axis(
            t2, jnp.clip(j - 1 - dlo, 0, t2.shape[1] - 1)[:, None],
            axis=1)[:, 0]
        at_end = (i == 0) & (j == 0)
        # E/F-run continuation modes
        in_e = mode == 1
        in_f = mode == 2
        erun = (d & _ERUN) != 0
        frun = (d & _FRUN) != 0
        # H-mode branch selection (C++ preference order)
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
        nm2 = nm + jnp.where(
            done != 0, 0,
            jnp.where(is_m, (qi != tj).astype(jnp.int32),
                      jnp.where(is_m | (op == 3), 0, 1)))
        di = jnp.where(is_m | is_i, 1, 0)
        dj = jnp.where(is_m | is_d, 1, 0)
        i2 = jnp.where(done != 0, i, i - di)
        j2 = jnp.where(done != 0, j, j - dj)
        # next mode: D entered/continued while the CURRENT cell's ERUN
        # bit holds; I via FRUN (C++ while conditions, checked before
        # the final decrement)
        enter_e = is_d & erun & ((in_e) | ((~in_e) & (~in_f)))
        enter_f = is_i & frun & ((in_f) | ((~in_e) & (~in_f)))
        mode2 = jnp.where(done != 0, mode,
                          jnp.where(enter_e, 1, jnp.where(enter_f, 2, 0)))
        done2 = jnp.maximum(done, at_end.astype(jnp.int32))
        return (i2, j2, mode2, nm2, done2), op.astype(jnp.uint8)

    init = (i0, j0, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32))
    (i, j, mode, nm, done), ops_rev = jax.lax.scan(
        step, init, jnp.arange(T, dtype=jnp.int32))
    ops_rev = ops_rev.T                                   # [B, T]
    # path length per job, then flip to forward (left-to-right) order
    emitted = ops_rev != 3
    L = jnp.sum(emitted.astype(jnp.int32), axis=1)
    tt = jnp.arange(T, dtype=jnp.int32)[None, :]
    src = jnp.clip(L[:, None] - 1 - tt, 0, T - 1)
    ops_fwd = jnp.take_along_axis(ops_rev, src, axis=1)
    ops_fwd = jnp.where(tt < L[:, None], ops_fwd, 3)
    # run-length encode: run id = cumsum of boundaries
    prev = jnp.concatenate(
        [jnp.full((B, 1), 255, ops_fwd.dtype), ops_fwd[:, :-1]], axis=1)
    boundary = (ops_fwd != prev) & (tt < L[:, None])
    rid = jnp.cumsum(boundary.astype(jnp.int32), axis=1) - 1
    n_runs = jnp.where(L > 0, rid[:, -1] + 1, 0)
    over = n_runs > RUNS_CAP
    rid_c = jnp.clip(rid, 0, RUNS_CAP - 1)
    seg = jnp.arange(B, dtype=jnp.int32)[:, None] * RUNS_CAP + rid_c
    valid = (tt < L[:, None]).astype(jnp.int32)
    runs_len = jax.ops.segment_sum(
        valid.reshape(-1), seg.reshape(-1),
        num_segments=B * RUNS_CAP).reshape(B, RUNS_CAP)
    runs_op = jax.ops.segment_max(
        jnp.where(valid.reshape(-1) > 0, ops_fwd.reshape(-1).astype(
            jnp.int32), -1),
        seg.reshape(-1), num_segments=B * RUNS_CAP).reshape(B, RUNS_CAP)
    n_runs = jnp.where(over, RUNS_CAP + 1, n_runs)
    return runs_len, runs_op, n_runs, nm


# ---- host orchestration ---------------------------------------------------

_OPCHR = np.array(["M", "I", "D"])


class DeviceGlobalAligner:
    """Batched device finalize over the two cheap rungs; host decides
    acceptance from phase-A scores with the exact ladder rules and
    keeps everything else on the native path."""

    # static shape menu: (w, K) pairs; |n - m| must fit K - 2w - 1
    RUNGS = ((16, 128), (64, 256))
    LQ_BUCKETS = (512, 1024, 1536, 2048)

    def __init__(self, max_dir_bytes: int = 256 << 20):
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

    def align_batch(self, qs, ts):
        """qs/ts: lists of np code arrays (the finalize sel jobs).
        Returns {job_index: (score, [(len, op), ...], nm)} for jobs
        completed on device; missing indices fall back to the host
        native path (ladder decision fell past rung 64, run overflow,
        or ineligible shapes)."""
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
        qd = jax.device_put(q)
        td = jax.device_put(t)
        md = jax.device_put(ms)
        nd = jax.device_put(ns)
        # phase A: scores for both rungs
        scores = {}
        t2_cache = {}
        for w, K in self.RUNGS:
            dlo = np.minimum(0, ns - ms) - w
            dl = jax.device_put(dlo.astype(np.int32))
            t2 = build_t2(td, nd, dl, K=K, LQ=LQ, LT=LT)
            t2_cache[w] = (t2, dl)
            scores[w] = np.asarray(
                banded_scores(qd, md, t2, dl, nd, K=K, LQ=LQ))
        mn = np.minimum(ms, ns)
        ad = np.abs(ns - ms)
        sc16, sc64 = scores[16], scores[64]
        rung = np.zeros(B, np.int32)          # 0 = host fallback
        rung[np.asarray(sc64 >= self._sound_ceiling(mn, ad, 64))] = 64
        # heuristic equal-adjacent (16, 64) emits the SMALLER rung
        rung[np.asarray(sc16 == sc64)] = 16
        # sound accept at 16 wins over everything (checked first by the
        # host ladder)
        rung[np.asarray(sc16 >= self._sound_ceiling(mn, ad, 16))] = 16
        out = {}
        for w, K in self.RUNGS:
            rows = np.nonzero(rung == w)[0]
            if rows.size == 0:
                continue
            # chunk so the [LQ, B, K] direction tensor stays bounded
            chunk = max(1, self.max_dir_bytes // (LQ * K))
            t2, dl = t2_cache[w]
            for c0 in range(0, rows.size, chunk):
                rs = rows[c0:c0 + chunk]
                qs_d = qd[rs]
                t2_d = t2[rs]
                dl_d = dl[rs]
                md_d = md[rs]
                nd_d = nd[rs]
                score, dirs = banded_direction(
                    qs_d, md_d, t2_d, dl_d, nd_d, K=K, LQ=LQ)
                T = LQ + LT
                rl, ro, nr, nm = traceback_rle(
                    dirs, qs_d, t2_d, md_d, nd_d, dl_d, K=K, LQ=LQ, T=T)
                rl = np.asarray(rl)
                ro = np.asarray(ro)
                nr = np.asarray(nr)
                nm = np.asarray(nm)
                score = np.asarray(score)
                for rr, row in enumerate(rs):
                    k = int(nr[rr])
                    if k == 0 or k > RUNS_CAP:
                        continue          # overflow -> host fallback
                    cigar = [(int(rl[rr, x]), _OPCHR[int(ro[rr, x])])
                             for x in range(k)]
                    out[idxs[row]] = (int(score[rr]), cigar, int(nm[rr]))
        return out
