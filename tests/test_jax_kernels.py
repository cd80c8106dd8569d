"""Property tests: JAX kernels vs numpy reference implementations
(SURVEY.md §4 test strategy: kernels vs a NumPy oracle)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from seeksv_tpu.align.sw import extend_score
from seeksv_tpu.ops.jax_kernels import (coverage_from_segments,
                                        match_rate_pairs_begin,
                                        match_rate_pairs_end, revcomp_batch,
                                        sw_extend_batch)
from seeksv_tpu.ops.matchrate import match_rate_begin, match_rate_end


def _rand_codes(rng, n, p_n=0.02):
    c = rng.integers(0, 4, n).astype(np.uint8)
    c[rng.random(n) < p_n] = 4
    return c


def test_sw_extend_batch_matches_numpy():
    rng = np.random.default_rng(0)
    B, LQ, LT = 32, 48, 96
    q = np.full((B, LQ), 4, np.int32)
    t = np.full((B, LT), 4, np.int32)
    qlen = rng.integers(1, LQ + 1, B).astype(np.int32)
    tlen = rng.integers(1, LT + 1, B).astype(np.int32)
    h0 = rng.integers(10, 40, B).astype(np.int32)
    for b in range(B):
        qc = _rand_codes(rng, qlen[b])
        # half the batch: target = query + noise (realistic extension)
        if b % 2 == 0 and tlen[b] >= qlen[b]:
            tc = _rand_codes(rng, tlen[b])
            tc[:qlen[b]] = qc
            mut = rng.random(qlen[b]) < 0.1
            tc[:qlen[b]][mut] = rng.integers(0, 4, int(mut.sum()))
        else:
            tc = _rand_codes(rng, tlen[b])
        q[b, :qlen[b]] = qc
        t[b, :tlen[b]] = tc
    out = sw_extend_batch(jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t),
                          jnp.asarray(tlen), jnp.asarray(h0))
    for b in range(B):
        ref = extend_score(q[b, :qlen[b]].astype(np.uint8),
                           t[b, :tlen[b]].astype(np.uint8), int(h0[b]))
        assert int(out["max_score"][b]) == ref.max_score, b
        assert int(out["qle"][b]) == ref.qle, b
        assert int(out["tle"][b]) == ref.tle, b
        got_g = int(out["gscore"][b])
        if ref.gscore > 0 or got_g > 0:
            assert got_g == ref.gscore, b
            assert int(out["gtle"][b]) == ref.gtle, b


def test_match_rate_kernels():
    rng = np.random.default_rng(1)
    N, L = 64, 80
    a = np.zeros((N, L), np.uint8)
    b = np.zeros((N, L), np.uint8)
    alen = rng.integers(1, L + 1, N).astype(np.int32)
    blen = rng.integers(1, L + 1, N).astype(np.int32)
    for i in range(N):
        a[i, :alen[i]] = rng.integers(65, 85, alen[i])
        b[i, :blen[i]] = rng.integers(65, 85, blen[i])
    mb, nb = match_rate_pairs_begin(jnp.asarray(a), jnp.asarray(alen),
                                    jnp.asarray(b), jnp.asarray(blen))
    me, ne = match_rate_pairs_end(jnp.asarray(a), jnp.asarray(alen),
                                  jnp.asarray(b), jnp.asarray(blen))
    for i in range(N):
        sa = a[i, :alen[i]].tobytes()
        sb = b[i, :blen[i]].tobytes()
        assert int(mb[i]) / int(nb[i]) == match_rate_begin(sa, sb)
        assert int(me[i]) / int(ne[i]) == match_rate_end(sa, sb)


def test_coverage_kernel():
    rng = np.random.default_rng(2)
    L = 500
    starts = rng.integers(0, L, 200).astype(np.int32)
    ends = (starts + rng.integers(1, 100, 200)).astype(np.int32)
    cov = np.asarray(coverage_from_segments(
        jnp.asarray(starts), jnp.asarray(ends), jnp.ones(200, jnp.int32), L))
    ref = np.zeros(L, np.int32)
    for s, e in zip(starts, ends):
        ref[s:min(e, L)] += 1
    assert (cov == ref).all()


def test_revcomp_batch():
    rng = np.random.default_rng(3)
    N, L = 16, 30
    seq = np.full((N, L), 0, np.int32)
    lens = rng.integers(1, L + 1, N).astype(np.int32)
    for i in range(N):
        seq[i, :lens[i]] = _rand_codes(rng, lens[i])
    out = np.asarray(revcomp_batch(jnp.asarray(seq), jnp.asarray(lens)))
    for i in range(N):
        fwd = seq[i, :lens[i]]
        rc = np.where(fwd[::-1] < 4, 3 - fwd[::-1], fwd[::-1])
        assert (out[i, :lens[i]] == rc).all()


def test_discordant_count_batch_matches_host(example_dir):
    """Device discordant counting == host DiscordantCounter on every
    junction of the example cancer run (plus synthetic INV/CTX cases)."""
    import io
    from seeksv_tpu.io.bam import read_bam_python
    from seeksv_tpu.ops.jax_kernels import discordant_count_batch
    from seeksv_tpu.pipeline.getsv import (DiscordantCounter, JunctionMap,
                                           calculate_insert_size,
                                           input_soft_info, merge_junction)
    import pathlib
    golden = pathlib.Path(__file__).parent / "golden"
    recs = read_bam_python(str(example_dir / "cancer.sort.bam"))
    jmap = JunctionMap()
    input_soft_info(str(golden / "cancer.clip.gz"),
                    str(golden / "cancer.clip.sam"), jmap, [])
    merge_junction(jmap, 50)
    mean, dev = calculate_insert_size(recs, 20, 5_000_000)
    dc = DiscordantCounter(recs, 20, mean, dev, 4)
    # synthetic extra junctions to exercise all 3 strand cases + tandem
    junctions = [j for j, _ in jmap.items] + [
        ("chr17", 700, "-", "chr17", 495, "+"),
        ("chr17", 700, "+", "chr17", 900, "-"),
        ("chr17", 900, "+", "chr17", 700, "+"),   # up > down: tandem loop
        ("chr17", 500, "+", "chrM", 500, "+"),    # cross-chrom
    ]
    host = [dc.count(j) for j in junctions]
    # device inputs
    name2tid = {n: i for i, n in enumerate(recs.ref_names)}
    lo, hi, beg_, up_, dn_, dtid, stid, code = [], [], [], [], [], [], [], []
    K = 5
    for (uc, up, us, dc_, dn, ds) in junctions:
        tid = name2tid[uc]
        tlo, thi = dc.tid_ranges.get(tid, (0, 0))
        if us == "+":
            end_w = up
            beg_w = end_w - dc.max_insert
        else:
            beg_w = up - 1 - K
            end_w = up - 1 + dc.max_insert
        if beg_w <= 0:
            beg_w = 1
        end_w = min(end_w, recs.ref_lens[tid])
        sub = recs.pos[tlo:thi]
        l = tlo + int(np.searchsorted(sub, beg_w - 1000))
        h = tlo + int(np.searchsorted(sub, end_w, "left")) if end_w > beg_w \
            else l
        lo.append(l)
        hi.append(h)
        beg_.append(beg_w)
        up_.append(up)
        dn_.append(dn)
        dtid.append(name2tid.get(dc_, -1))
        stid.append(tid == name2tid.get(dc_, -1))
        code.append(0 if (us, ds) == ("+", "+") else
                    1 if (us, ds) == ("-", "+") else 2)
    import jax.numpy as jnp
    end_arr = dc.end
    flag = recs.flag
    got = discordant_count_batch(
        jnp.asarray(recs.pos), jnp.asarray(end_arr),
        jnp.asarray(recs.l_qseq), jnp.asarray(recs.mpos),
        jnp.asarray(recs.mtid), jnp.asarray((flag & 0x10) == 0),
        jnp.asarray((flag & 0x20) == 0), jnp.asarray(dc.base_ok),
        jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(beg_),
        jnp.asarray(up_), jnp.asarray(dn_), jnp.asarray(dtid),
        jnp.asarray(stid), jnp.asarray(code),
        jnp.full(len(lo), dc.min_insert), jnp.full(len(lo), dc.max_insert))
    assert [int(x) for x in got] == host, (list(got), host)
