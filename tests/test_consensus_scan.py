"""On-device consensus scan vs the host BreakpointMap on the real clip
groups of the example BAM (oracle semantics: longest-wins at 0.85)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from seeksv_tpu.io.bam import read_bam_python, FDUP, FMUNMAP, FUNMAP, OP_H, OP_S
from seeksv_tpu.ops.consensus_scan import consensus_scan_groups
from seeksv_tpu.pipeline.getclip import (BreakpointMap, _get_sclip_read,
                                         _map_len_no_x)


class RecordingMap(BreakpointMap):
    """BreakpointMap that also records the raw insert stream."""

    def __init__(self):
        super().__init__()
        self.stream = []

    def insert(self, pos, s_l, q_l, s_r, q_r, cigar, limit, left_clipped):
        self.stream.append((pos, s_l.copy(), s_r.copy()))
        super().insert(pos, s_l, q_l, s_r, q_r, cigar, limit, left_clipped)


def test_consensus_scan_matches_host(example_dir):
    recs = read_bam_python(str(example_dir / "cancer.sort.bam"))
    flag = recs.flag
    mapped = (flag & (FUNMAP | FMUNMAP)) == 0
    first_op = recs.first_op()
    last_op = recs.last_op()
    first_len = recs.first_len()
    last_len = recs.last_len()
    map_len = _map_len_no_x(recs)
    cand = (mapped & (first_op != OP_H) & (last_op != OP_H)
            & ((first_op == OP_S) | (last_op == OP_S))
            & (recs.mapq >= 20) & ((flag & FDUP) == 0))
    left = RecordingMap()
    right = RecordingMap()
    for i in np.nonzero(cand)[0]:
        _get_sclip_read(recs, int(i), left, right, 0.85, False, first_op,
                        last_op, first_len, last_len, map_len)

    for bmap in (left, right):
        # group the insert stream by key, preserving order
        groups = {}
        for pos, s_l, s_r in bmap.stream:
            groups.setdefault(pos, []).append((s_l, s_r))
        keys = sorted(groups)
        NG = len(keys)
        G = max(len(v) for v in groups.values())
        LL = max(len(s) for v in groups.values() for s, _ in v)
        LR = max(len(s) for v in groups.values() for _, s in v)
        seq_l = np.zeros((NG, G, LL), np.uint8)
        seq_r = np.zeros((NG, G, LR), np.uint8)
        len_l = np.zeros((NG, G), np.int32)
        len_r = np.zeros((NG, G), np.int32)
        n_reads = np.zeros(NG, np.int32)
        for gi, k in enumerate(keys):
            n_reads[gi] = len(groups[k])
            for ri, (s_l, s_r) in enumerate(groups[k]):
                seq_l[gi, ri, LL - len(s_l):] = s_l   # right-aligned
                len_l[gi, ri] = len(s_l)
                seq_r[gi, ri, :len(s_r)] = s_r
                len_r[gi, ri] = len(s_r)
        out = consensus_scan_groups(
            jnp.asarray(seq_l), jnp.asarray(len_l), jnp.asarray(seq_l),
            jnp.asarray(seq_r), jnp.asarray(len_r), jnp.asarray(seq_r),
            jnp.asarray(n_reads), 85, 100)
        assert not bool(np.asarray(out["overflow"]).any())
        for gi, k in enumerate(keys):
            host_entries = bmap.by_pos[k]
            ns = int(out["n_slots"][gi])
            assert ns == len(host_entries), (k, ns, len(host_entries))
            for si, e in enumerate(host_entries):
                assert int(out["support"][gi, si]) == e.support, (k, si)
                gl = int(out["sl_len"][gi, si])
                gr = int(out["sr_len"][gi, si])
                assert gl == len(e.seq_left) and gr == len(e.seq_right), (k, si)
                got_l = np.asarray(out["sl_seq"][gi, si])[LL - gl:]
                got_r = np.asarray(out["sr_seq"][gi, si])[:gr]
                assert (got_l == e.seq_left).all(), (k, si)
                assert (got_r == e.seq_right).all(), (k, si)
