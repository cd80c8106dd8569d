"""Native C++ decoder vs pure-python decoder: identical SoA contract."""
import numpy as np
import pytest

from seeksv_tpu.io import native
from seeksv_tpu.io.bam import read_bam_python


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_decoder_equivalence(example_dir):
    path = str(example_dir / "cancer.sort.bam")
    a = native.read_bam_native(path)
    b = read_bam_python(path)
    assert a.n == b.n
    assert a.ref_names == b.ref_names and a.ref_lens == b.ref_lens
    for f in ("flag", "tid", "pos", "mapq", "mtid", "mpos", "isize",
              "l_qseq", "cig", "cig_off", "seq", "qual", "seq_off", "xc"):
        assert (getattr(a, f) == getattr(b, f)).all(), f
    assert a.qnames == b.qnames  # LazyQnames == list


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_error_handling(tmp_path):
    bad = tmp_path / "bad.bam"
    bad.write_bytes(b"garbage data that is not bgzf")
    with pytest.raises(IOError):
        native.read_bam_native(str(bad))


def test_coverage_diff_matches_numpy():
    rng = np.random.default_rng(0)
    starts = rng.integers(0, 900, 500)
    ends = starts + rng.integers(1, 200, 500)
    w = np.ones(500, np.int32)
    got = native.coverage_diff(starts, ends, w, 1000)
    ref = np.zeros(1001, np.int32)
    np.add.at(ref, np.clip(starts, 0, 1000), w)
    np.add.at(ref, np.clip(ends, 0, 1000), -w)
    assert (got == ref).all()


@pytest.mark.skipif(not native.sw_available(), reason="native lib not built")
def test_sw_extend_native_vs_numpy():
    from seeksv_tpu.align.sw import extend_batch_np
    rng = np.random.default_rng(7)
    B, LQ, LT = 64, 96, 160
    q = rng.integers(0, 5, (B, LQ)).astype(np.int32)
    t = rng.integers(0, 5, (B, LT)).astype(np.int32)
    # make some targets resemble queries so positive scores occur
    for b in range(0, B, 2):
        L = int(rng.integers(10, LQ))
        t[b, 5:5 + L] = q[b, :L]
    qlen = rng.integers(0, LQ + 1, B).astype(np.int32)
    tlen = rng.integers(0, LT + 1, B).astype(np.int32)
    h0 = rng.integers(0, 120, B).astype(np.int32)
    ref = extend_batch_np(q, qlen, t, tlen, h0)
    got = native.sw_extend_batch_native(q, qlen, t, tlen, h0)
    for k in ("max_score", "qle", "tle", "gscore", "gtle"):
        assert (got[k] == ref[k]).all(), k


@pytest.mark.skipif(not native.sw_available(), reason="native lib not built")
def test_sw_global_native_vs_numpy():
    from seeksv_tpu.align.sw import global_align_np
    rng = np.random.default_rng(11)
    for _ in range(60):
        m = int(rng.integers(1, 120))
        q = rng.integers(0, 5, m).astype(np.uint8)
        # target = mutated copy (indels + substitutions) to exercise runs
        tl = list(q)
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, max(1, len(tl))))
            r = rng.random()
            if r < 0.4 and tl:
                del tl[p]
            elif r < 0.7:
                tl.insert(p, int(rng.integers(0, 4)))
            elif tl:
                tl[p] = int(rng.integers(0, 4))
        if not tl:
            tl = [0]
        t = np.array(tl, np.uint8)
        ref_s, ref_c = global_align_np(q, t)
        got_s, got_c = native.sw_global_native(q, t)
        assert got_s == ref_s
        assert got_c == ref_c


@pytest.mark.skipif(not native.sw_global_batch_available(),
                    reason="native lib not built")
def test_sw_global_batch_vs_single():
    """Batched threaded traceback == per-pair global_align + _nm
    (incl. the degenerate empty-side rows the wrapper synthesizes)."""
    from seeksv_tpu.align.engine import Aligner
    from seeksv_tpu.align.sw import global_align
    rng = np.random.default_rng(12)
    qs, ts = [], []
    for _ in range(80):
        m = int(rng.integers(0, 100))
        n = int(rng.integers(0, 120)) if rng.random() < 0.2 else \
            max(0, m + int(rng.integers(-5, 6)))
        qs.append(rng.integers(0, 5, m).astype(np.uint8))
        ts.append(rng.integers(0, 5, n).astype(np.uint8))
    got = native.sw_global_batch_native(qs, ts)
    for q, t, (gs, gc, gnm) in zip(qs, ts, got):
        es, ec = global_align(q, t)
        enm = Aligner._nm(q.astype(np.int64), t.astype(np.int64), ec)
        assert gs == es
        assert gc == ec
        assert gnm == enm


@pytest.mark.skipif(not native.seed_batch_available(),
                    reason="native lib not built")
def test_seed_batch_native_vs_numpy():
    """Native batched seeding == the numpy batch_candidates (which is
    itself the exact vectorization of Aligner._candidates), including
    anchor tie-breaks, votes, MAX_OCC filtering, and ambiguous bases."""
    from seeksv_tpu.align.index import KmerIndex
    from seeksv_tpu.align import seed_batch as sb
    rng = np.random.default_rng(21)
    # small genome with planted repeats so MAX_OCC and vote ties trigger
    g = rng.integers(0, 4, 20_000).astype(np.uint8)
    unit = g[1000:1100].copy()
    for rep in range(40):
        p = 5000 + rep * 150
        g[p:p + 100] = unit
    seqs = {"c1": np.frombuffer(bytes(b"ACGT"[c] for c in g), np.uint8)}
    idx = KmerIndex.build(seqs, k=13)
    reads = []
    for _ in range(60):
        s = int(rng.integers(0, len(g) - 80))
        r = g[s:s + int(rng.integers(20, 80))].copy()
        m = rng.random(len(r)) < 0.05
        r[m] = (r[m] + 1) % 4
        amb = rng.random(len(r)) < 0.02
        r[amb] = 4  # ambiguous
        reads.append(r)
    reads.append(np.zeros(5, np.uint8))   # shorter than k
    reads.append(unit.copy())             # pure repeat read
    want = sb._batch_candidates_np(idx, reads)
    got = native.seed_batch_native(idx, reads, sb.MAX_OCC,
                                   sb.TOP_CANDIDATES)
    assert got == want


@pytest.mark.skipif(not native.discordant_base_ok_available(),
                    reason="native lib not built")
def test_discordant_base_ok_vs_numpy():
    rng = np.random.default_rng(31)
    n = 5000
    flag = rng.integers(0, 0xFFF, n).astype(np.int32)
    mapq = rng.integers(0, 61, n).astype(np.int32)
    isize = rng.integers(-1200, 1200, n).astype(np.int32)
    hard = (rng.random(n) < 0.1)
    for skip_hard in (True, False):
        for mn, mx in ((400, 600), (0, 0)):
            fwd = (flag & 0x10) == 0
            mfwd = (flag & 0x20) == 0
            conc = ((fwd & ~mfwd & (mn <= isize) & (isize <= mx))
                    | (~fwd & mfwd & (isize < 0)
                       & (mn <= -isize) & (-isize <= mx)))
            want = (mapq >= 20) & ((flag & (0x400 | 0x4 | 0x8)) == 0) & ~conc
            if skip_hard:
                want = want & ~hard
            got = native.discordant_base_ok(flag, mapq, isize,
                                            hard.astype(np.uint8), 20,
                                            mn, mx, skip_hard)
            assert np.array_equal(got, want)


def test_coverage_depth_matches_cumsum():
    rng = np.random.default_rng(3)
    starts = rng.integers(-50, 1100, 800)
    ends = starts + rng.integers(1, 300, 800)
    w = rng.integers(1, 4, 800).astype(np.int32)
    L = 1000
    got = native.coverage_depth(starts, ends, w, L)
    diff = np.zeros(L + 2, np.int32)
    np.add.at(diff, np.clip(starts, 0, L + 1), w)
    np.add.at(diff, np.clip(ends, 0, L + 1), -w)
    ref = np.cumsum(diff)[:L]
    assert (got == ref).all()


def test_global_align_ladder_long_pairs():
    """min(m,n) > 256 pairs run the banded ladder (rungs 16/64/256 ->
    full); native and numpy implement the identical spec, and for
    substitution-only pairs the result equals the full DP."""
    from seeksv_tpu.align.sw import global_align_np, _global_banded_np
    from seeksv_tpu.io import native
    if not native.sw_available():
        import pytest
        pytest.skip("native lib not built")
    rng = np.random.default_rng(7)
    for trial in range(8):
        m = int(rng.integers(300, 1200))
        q = rng.integers(0, 4, m).astype(np.int32)
        t = q.copy()
        # strain-divergence substitutions
        sites = rng.random(m) < 0.05
        t[sites] = (t[sites] + rng.integers(1, 4, int(sites.sum()))) % 4
        if trial % 2:
            # implant indels (may push past the first rungs)
            for _ in range(int(rng.integers(1, 4))):
                p = int(rng.integers(10, len(t) - 10))
                ln = int(rng.integers(1, 30))
                if rng.random() < 0.5:
                    t = np.concatenate(
                        [t[:p], rng.integers(0, 4, ln).astype(np.int32),
                         t[p:]])
                else:
                    t = np.concatenate([t[:p], t[p + ln:]])
        sc_n, cig_n = native.sw_global_native(q, t)
        sc_p, cig_p = global_align_np(q, t)
        assert sc_n == sc_p, (trial, sc_n, sc_p)
        assert cig_n == cig_p, (trial, cig_n[:5], cig_p[:5])
        if not trial % 2:
            # substitution-only: ladder must equal an ample single band
            sc_f, cig_f = _global_banded_np(q, t, 2048)
            assert (sc_n, cig_n) == (sc_f, cig_f)


def test_global_align_batch_matches_single_long():
    from seeksv_tpu.align.sw import global_align_np
    from seeksv_tpu.io import native
    if not native.sw_global_batch_available():
        import pytest
        pytest.skip("native lib not built")
    rng = np.random.default_rng(9)
    qs, ts = [], []
    for _ in range(6):
        m = int(rng.integers(280, 900))
        q = rng.integers(0, 4, m).astype(np.int32)
        t = q.copy()
        s = rng.random(m) < 0.04
        t[s] = (t[s] + rng.integers(1, 4, int(s.sum()))) % 4
        qs.append(q)
        ts.append(t)
    for (sc, cig, nm), q, t in zip(
            native.sw_global_batch_native(qs, ts), qs, ts):
        sc_p, cig_p = global_align_np(q, t)
        assert (sc, cig) == (sc_p, cig_p)
