import io

import numpy as np
import pytest

from seeksv_tpu.align.engine import Aligner, align_fastq_to_sam
from seeksv_tpu.align.sw import extend_score, global_align
from seeksv_tpu.io.bam import read_sam_text


def test_global_align_simple():
    q = np.array([0, 1, 2, 3], np.uint8)
    s, cig = global_align(q, q)
    assert s == 4 and cig == [(4, "M")]
    t = np.array([0, 1, 1, 2, 3], np.uint8)
    s, cig = global_align(q, t)
    assert cig in ([(2, "M"), (1, "D"), (2, "M")], [(1, "M"), (1, "D"), (3, "M")])


def test_extend_clip_decision():
    # perfect continuation: to-end chosen
    q = np.array([0, 1, 2, 3] * 5, np.uint8)
    r = extend_score(q, q, h0=19)
    assert r.gscore == 19 + 20 and r.gtle == 20
    # query extends 4 bases past the target end: local best stops at the
    # target boundary
    r = extend_score(q, q[:16], h0=19)
    assert r.max_score == 19 + 16 and r.qle == 16 and r.tle == 16


@pytest.mark.parametrize("sample", ["cancer", "normal"])
def test_aligner_matches_bwa_on_example(tmp_path, example_dir, golden_dir, sample):
    """Field-level equivalence with bwa mem on the example clips: same
    mapped/unmapped set, and identical (pos, mapq, cigar, flag, NM) for
    every mapped read (AS may differ slightly; unused downstream)."""
    out = tmp_path / f"{sample}.sam"
    align_fastq_to_sam(str(example_dir / "reference/example.fa"),
                       str(golden_dir / f"{sample}.clip.fq.gz"), str(out))
    ours = read_sam_text(str(out))
    bwa = read_sam_text(str(golden_dir / f"{sample}.clip.sam"))
    assert ours.n == bwa.n
    for i in range(ours.n):
        assert ours.qnames[i] == bwa.qnames[i]
        assert (ours.flag[i] & 4) == (bwa.flag[i] & 4), ours.qnames[i]
        if not ours.flag[i] & 4:
            assert (int(ours.flag[i]), int(ours.tid[i]), int(ours.pos[i]),
                    int(ours.mapq[i]), list(ours.cigar(i))) == \
                   (int(bwa.flag[i]), int(bwa.tid[i]), int(bwa.pos[i]),
                    int(bwa.mapq[i]), list(bwa.cigar(i))), ours.qnames[i]


@pytest.mark.parametrize("sample", ["cancer", "normal"])
def test_self_contained_pipeline(tmp_path, example_dir, golden_dir, sample):
    """getclip -> in-framework aligner -> getsv reproduces the committed
    sv outputs with no external realigner."""
    from seeksv_tpu.pipeline.getclip import getclip
    from seeksv_tpu.pipeline.getsv import getsv
    prefix = str(tmp_path / sample)
    getclip(str(example_dir / f"{sample}.sort.bam"), prefix)
    sam = tmp_path / f"{sample}.clip.sam"
    align_fastq_to_sam(str(example_dir / "reference/example.fa"),
                       f"{prefix}.clip.fq.gz", str(sam))
    sv = tmp_path / f"{sample}.sv"
    getsv(str(sam), str(example_dir / f"{sample}.sort.bam"),
          f"{prefix}.clip.gz", str(sv), str(tmp_path / "r.fq"),
          filtered_out=io.StringIO())
    assert sv.read_bytes() == (example_dir / f"{sample}.sv").read_bytes()


def test_aligner_indel_cigar(tmp_path, example_dir):
    """Reads with small indels vs the reference produce I/D cigars."""
    from seeksv_tpu.io.fasta import read_fasta
    fa = read_fasta(str(example_dir / "reference/example.fa"))
    chr17 = fa["chr17"].tobytes()
    al = Aligner.from_fasta(str(example_dir / "reference/example.fa"))
    base = chr17[10_000:10_060]
    # 2bp deletion in the read relative to the reference
    read_del = base[:30] + base[32:]
    a = al.align(read_del)
    assert a.mapped and a.pos == 10_000
    assert any(op == "D" for _, op in a.cigar), a.cigar
    # 2bp insertion
    read_ins = base[:30] + b"GG" + base[30:]
    b = al.align(read_ins)
    assert b.mapped and b.pos == 10_000
    assert any(op == "I" for _, op in b.cigar), b.cigar


def test_batch_seeding_equivalence(example_dir):
    """Batched seeding (align.seed_batch) returns exactly the per-read
    _candidates output for every clip sequence of the example."""
    import gzip
    from seeksv_tpu.align.index import ENCODE
    from seeksv_tpu.align.seed_batch import batch_candidates
    al = Aligner.from_fasta(str(example_dir / "reference/example.fa"))
    seqs = []
    import pathlib
    with gzip.open(str(pathlib.Path(__file__).parent / "golden"
                       / "cancer.clip.fq.gz"), "rt") as f:
        while True:
            h = f.readline()
            if not h:
                break
            seqs.append(f.readline().strip().encode())
            f.readline()
            f.readline()
    reads = []
    for s in seqs:
        fwd = ENCODE[np.frombuffer(s, np.uint8)]
        rev = np.where(fwd[::-1] < 4, 3 - fwd[::-1], 4).astype(np.uint8)
        reads.extend([fwd, rev])
    batch = batch_candidates(al.idx, reads)
    for i, codes in enumerate(reads):
        assert batch[i] == al._candidates(codes), i


def test_paired_end_alignment(tmp_path):
    """align_paired_fastq_to_sam: PE SAM with mate fields, FR proper-pair
    model, and correct positions (the bwa-PE role for the virus-mode
    unmapped_{1,2}.fq.gz, ref: README.md:79-81)."""
    import gzip

    import numpy as np

    from seeksv_tpu.align.engine import align_paired_fastq_to_sam
    from seeksv_tpu.utils.simulate import random_genome, write_fasta

    rng = np.random.default_rng(5)
    G, L, n_pairs = 60_000, 100, 250
    g = random_genome(rng, G)
    write_fasta(str(tmp_path / "ref.fa"), {"chrV": g})
    rc = bytes.maketrans(b"ACGT", b"TGCA")
    truth = []
    with gzip.open(tmp_path / "r1.fq.gz", "wt") as f1, \
            gzip.open(tmp_path / "r2.fq.gz", "wt") as f2:
        for i in range(n_pairs):
            frag = int(rng.normal(400, 30))
            s = int(rng.integers(0, G - frag - 1))
            r1 = g[s:s + L].tobytes().decode()
            r2f = g[s + frag - L:s + frag].tobytes()
            r2 = r2f.translate(rc)[::-1].decode()
            truth.append((s, s + frag - L, frag))
            f1.write(f"@p{i}/1\n{r1}\n+\n{'I' * L}\n")
            f2.write(f"@p{i}/2\n{r2}\n+\n{'I' * L}\n")
    out = str(tmp_path / "pe.sam")
    align_paired_fastq_to_sam(str(tmp_path / "ref.fa"),
                              str(tmp_path / "r1.fq.gz"),
                              str(tmp_path / "r2.fq.gz"), out)
    recs = {}
    for ln in open(out):
        if ln.startswith("@"):
            continue
        f = ln.rstrip("\n").split("\t")
        recs.setdefault(f[0].rsplit("/", 1)[0], []).append(f)
    assert len(recs) == n_pairs
    ok_pos = proper = 0
    for i, (s1, s2, frag) in enumerate(truth):
        pair = recs[f"p{i}"]
        assert len(pair) == 2
        r1 = next(f for f in pair if int(f[1]) & 0x40)
        r2 = next(f for f in pair if int(f[1]) & 0x80)
        fl1, fl2 = int(r1[1]), int(r2[1])
        assert fl1 & 0x1 and fl2 & 0x1
        if int(r1[3]) - 1 == s1 and int(r2[3]) - 1 == s2:
            ok_pos += 1
        if fl1 & 0x2:
            proper += 1
            # mate fields consistent
            assert r1[6] == "=" and r2[6] == "="
            assert int(r1[7]) == int(r2[3]) and int(r2[7]) == int(r1[3])
            assert int(r1[8]) == -int(r2[8]) != 0
            # FR orientation flags
            assert not fl1 & 0x10 and fl1 & 0x20
            assert fl2 & 0x10 and not fl2 & 0x20
    assert ok_pos >= 0.97 * n_pairs
    assert proper >= 0.95 * n_pairs


def test_v2_index_uint16_layout_at_scale():
    """Indexes with >= 2^21 kmers use the uint16 residual layout (the
    production path); lookup must equal brute-force searchsorted over
    the full hashes."""
    import numpy as np

    from seeksv_tpu.align.index import KmerIndex
    rng = np.random.default_rng(21)
    g = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 3_000_000)]
    idx = KmerIndex.build({"c": g}, k=19)
    assert idx.keys.dtype == np.uint16, idx.keys.dtype
    assert idx.positions.dtype == np.uint32
    # brute-force oracle on a sample of query kmers (some present, some
    # random-absent)
    n = len(g)
    h = np.zeros(n - 19 + 1, np.uint64)
    from seeksv_tpu.align.index import ENCODE
    codes = ENCODE[g]
    for j in range(19):
        h = (h << np.uint64(2)) | codes[j:n - 19 + 1 + j].astype(np.uint64)
    full_sorted = np.sort(h)
    qs = np.concatenate([h[rng.integers(0, len(h), 500)],
                         rng.integers(0, 1 << 38, 500).astype(np.uint64)])
    lo, hi = idx.lookup(qs)
    lo_b = np.searchsorted(full_sorted, qs, "left")
    hi_b = np.searchsorted(full_sorted, qs, "right")
    np.testing.assert_array_equal(hi - lo, hi_b - lo_b)
    # positions under each hit must hash back to the query kmer
    for q, a, b in zip(qs[:50], lo[:50], hi[:50]):
        for p in idx.positions[a:b]:
            got = 0
            for j in range(19):
                got = (got << 2) | int(codes[int(p) + j])
            assert got == int(q)


def test_native_index_build_matches_numpy():
    """csrc seeksv_index_build (radix-bucketed) vs the numpy builder:
    identical keys/positions/prefix arrays, including ambiguous-base
    exclusion and multi-chromosome boundaries."""
    import numpy as np

    from seeksv_tpu.align.index import ENCODE, KmerIndex
    from seeksv_tpu.io import native
    if not native.index_build_available():
        import pytest
        pytest.skip("native lib not built")
    rng = np.random.default_rng(8)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    seqs = {}
    for c in range(3):
        g = bases[rng.integers(0, 4, 2_200_000 if c == 0 else 5_000)]
        g[rng.random(len(g)) < 0.001] = ord("N")   # ambiguity sprinkles
        seqs[f"c{c}"] = g
    idx = KmerIndex.build(seqs, k=19)   # dispatches to native
    # numpy oracle with identical bits
    names = list(seqs)
    starts = np.zeros(len(names) + 1, np.int64)
    parts = []
    for i, n in enumerate(names):
        parts.append(ENCODE[seqs[n]])
        starts[i + 1] = starts[i] + len(parts[-1])
    ref = np.concatenate(parts)
    cap = int(np.maximum(np.diff(starts) - 19 + 1, 0).sum())
    bits = KmerIndex._bits(19, cap)
    keys, positions = KmerIndex._hash_all(ref, starts, 19)
    order = np.argsort(keys, kind="stable")
    kf = keys[order]
    ptab = KmerIndex.build_prefix_tab(kf, 19, bits)
    np.testing.assert_array_equal(np.asarray(idx.prefix_tab), ptab)
    np.testing.assert_array_equal(np.asarray(idx.keys),
                                  KmerIndex.pack_keys(kf, 19, bits))
    np.testing.assert_array_equal(np.asarray(idx.positions),
                                  positions[order].astype(np.uint32))
