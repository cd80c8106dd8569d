"""On-device consensus building: the getclip per-breakpoint greedy merge as
a jittable lax.scan.

The oracle semantics (v1.2.0, see pipeline/getclip.py): reads at one
(side, chrom, pos) key probe existing consensus entries in insertion order;
the FIRST entry whose stored sides both match at >= threshold
(end-anchored left / begin-anchored right over min length) absorbs the
read (support+1, each side replaced if strictly longer); otherwise a new
entry is appended.

Device formulation: groups are padded to [G] reads x [S] slots and scanned
read-by-read (vmap over groups); the match-rate probes against all S slots
vectorize, and "first matching slot" is a min-index reduction.  Groups
exceeding S slots are reported via an overflow flag so the caller can fall
back to the host path (rare; slot counts are tiny in practice).

Exactness vs pipeline.getclip.BreakpointMap is asserted by
tests/test_consensus_scan.py on the example's real clip groups.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 0x7FFFFFFF


@functools.partial(jax.jit, static_argnames=("max_slots",))
def consensus_scan_groups(seq_l, len_l, qual_l, seq_r, len_r, qual_r,
                          n_reads, threshold_num, threshold_den,
                          max_slots: int = 16):
    """Args (one breakpoint-key group per row):
      seq_l/qual_l: [NG, G, LL] uint8 left parts, right-ALIGNED within LL
                    (end-anchored compare becomes a suffix compare)
      len_l:        [NG, G]
      seq_r/qual_r: [NG, G, LR] uint8 right parts, left-aligned
      len_r:        [NG, G]
      n_reads:      [NG] valid reads per group (reads in BAM order)
      threshold_num/den: rational threshold (e.g. 85/100) — integer compare
                    avoids float rounding differences: rate >= t  <=>
                    matches * den >= n * num

    Returns dict with per-slot state and metadata:
      slot_of_read [NG, G] (the entry each read merged into),
      support [NG, S], n_slots [NG], overflow [NG] bool,
      sl_len/sr_len [NG, S] and sl_seq/sr_seq [NG, S, L*] (final longest
      sides; quality follows the winning side wholesale),
      src_l/src_r [NG, S]: the read index (within the group) whose data
      currently owns each side — the host reconstructs quality (side
      replacement is wholesale) and the consensus CIGAR (follows the
      aligned side, ref clip_reads.cpp:69-75) from these without
      re-running the merge.
    """
    NG, G, LL = seq_l.shape
    LR = seq_r.shape[2]
    S = max_slots

    lidx = jnp.arange(LL)
    ridx = jnp.arange(LR)

    def one_group(sl, ll, ql, sr, lr, qr, n):
        def body(carry, g):
            (s_sl, s_ll, s_ql, s_sr, s_lr, s_qr, s_sup, n_slots,
             slot_of, overflow, s_srcl, s_srcr) = carry
            rl_seq = sl[g]            # [LL] right-aligned
            rl_len = ll[g]
            rr_seq = sr[g]            # [LR]
            rr_len = lr[g]
            active = g < n
            # end-anchored compare: both right-aligned => suffix overlap
            nmin_l = jnp.minimum(s_ll, rl_len)            # [S]
            in_l = lidx[None, :] >= (LL - nmin_l[:, None])
            m_l = jnp.sum((s_sl == rl_seq[None, :]) & in_l, axis=1)
            ok_l = m_l * threshold_den >= nmin_l * threshold_num
            ok_l &= nmin_l > 0                            # NaN semantics
            nmin_r = jnp.minimum(s_lr, rr_len)
            in_r = ridx[None, :] < nmin_r[:, None]
            m_r = jnp.sum((s_sr == rr_seq[None, :]) & in_r, axis=1)
            ok_r = m_r * threshold_den >= nmin_r * threshold_num
            ok_r &= nmin_r > 0
            slot_live = jnp.arange(S) < n_slots
            match = slot_live & ok_l & ok_r
            first = jnp.min(jnp.where(match, jnp.arange(S), BIG))
            has_match = first < BIG
            target = jnp.where(has_match, first,
                               jnp.minimum(n_slots, S - 1))
            new_overflow = overflow | (active & ~has_match & (n_slots >= S))
            do_write = active & (has_match | (n_slots < S))
            # longest-wins per side (strict >); new slots always take the read
            is_new = ~has_match
            take_l = is_new | (rl_len > s_ll[target])
            take_r = is_new | (rr_len > s_lr[target])
            upd = lambda arr, vec, take: arr.at[target].set(
                jnp.where(do_write & take, vec, arr[target]))
            s_sl2 = upd(s_sl, rl_seq, take_l)
            s_ql2 = upd(s_ql, ql[g], take_l)
            s_ll2 = s_ll.at[target].set(
                jnp.where(do_write & take_l, rl_len, s_ll[target]))
            s_sr2 = upd(s_sr, rr_seq, take_r)
            s_qr2 = upd(s_qr, qr[g], take_r)
            s_lr2 = s_lr.at[target].set(
                jnp.where(do_write & take_r, rr_len, s_lr[target]))
            s_sup2 = s_sup.at[target].add(
                jnp.where(do_write, 1, 0))
            n_slots2 = jnp.where(active & is_new & (n_slots < S),
                                 n_slots + 1, n_slots)
            slot_of2 = slot_of.at[g].set(jnp.where(do_write, target, -1))
            s_srcl2 = s_srcl.at[target].set(
                jnp.where(do_write & take_l, g, s_srcl[target]))
            s_srcr2 = s_srcr.at[target].set(
                jnp.where(do_write & take_r, g, s_srcr[target]))
            return (s_sl2, s_ll2, s_ql2, s_sr2, s_lr2, s_qr2, s_sup2,
                    n_slots2, slot_of2, new_overflow, s_srcl2, s_srcr2), None

        init = (jnp.zeros((S, LL), jnp.uint8), jnp.zeros(S, jnp.int32),
                jnp.zeros((S, LL), jnp.uint8),
                jnp.zeros((S, LR), jnp.uint8), jnp.zeros(S, jnp.int32),
                jnp.zeros((S, LR), jnp.uint8),
                jnp.zeros(S, jnp.int32), jnp.int32(0),
                jnp.full(G, -1, jnp.int32), jnp.bool_(False),
                jnp.full(S, -1, jnp.int32), jnp.full(S, -1, jnp.int32))
        (s_sl, s_ll, s_ql, s_sr, s_lr, s_qr, s_sup, n_slots, slot_of,
         overflow, s_srcl, s_srcr), _ = jax.lax.scan(
             body, init, jnp.arange(G, dtype=jnp.int32))
        return (s_sl, s_ll, s_sr, s_lr, s_sup, n_slots, slot_of, overflow,
                s_srcl, s_srcr)

    out = jax.vmap(one_group)(seq_l, len_l, qual_l, seq_r, len_r, qual_r,
                              n_reads)
    (s_sl, s_ll, s_sr, s_lr, s_sup, n_slots, slot_of, overflow,
     s_srcl, s_srcr) = out
    return {"sl_seq": s_sl, "sl_len": s_ll, "sr_seq": s_sr, "sr_len": s_lr,
            "support": s_sup, "n_slots": n_slots, "slot_of_read": slot_of,
            "overflow": overflow, "src_l": s_srcl, "src_r": s_srcr}
