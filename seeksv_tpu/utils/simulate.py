"""Synthetic dataset generation: donor genomes with implanted SVs and
paired-end reads with analytically derived alignments.

Serves the roles the reference covers with its committed example assets
and simu_data truth files (SURVEY.md §4): end-to-end accuracy testing
against known junctions, scale benchmarking, and virus-integration-mode
fixtures (a donor containing segments from an extra contig absent from
the alignment reference).

Reads are emitted as a coordinate-sorted BAM with bwa-like conventions:
full-length matches inside contiguous segments, soft-clips at junction
crossings (aligned side = longer side; unmapped when the longer side is
below the score threshold), FR proper-pair flags, sampling-based insert
sizes.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..io.bam_writer import BamWriter
from ..ops.matchrate import REVCOMP_TABLE

BASES = np.frombuffer(b"ACGT", np.uint8)


def random_genome(rng, length: int) -> np.ndarray:
    return BASES[rng.integers(0, 4, length)]


@dataclass
class Segment:
    """One piece of the donor: a reference slice or novel sequence."""
    chrom: Optional[str]      # None => novel insertion (unalignable)
    start: int = 0            # 0-based ref start (for + strand: left edge)
    end: int = 0
    strand: int = 1           # +1 / -1
    novel: Optional[np.ndarray] = None

    def length(self) -> int:
        return len(self.novel) if self.chrom is None else self.end - self.start


@dataclass
class Donor:
    segments: List[Segment]
    seq: np.ndarray
    seg_bounds: np.ndarray    # donor-space offsets [n_seg+1]
    truth: List[Tuple]        # junction truth tuples


def build_donor(ref: Dict[str, np.ndarray], deletions=(), inversions=(),
                insertions=(), translocation_to: Optional[str] = None,
                chrom: Optional[str] = None) -> Donor:
    """Compose a donor chromosome from one reference chromosome with
    implanted deletions / inversions / novel insertions.  Event tuples:
    deletions:  (start0, end0)   half-open ref interval removed
    inversions: (start0, end0)   interval reverse-complemented
    insertions: (pos0, seq)      novel sequence inserted before pos0
    """
    chrom = chrom or next(iter(ref))
    L = len(ref[chrom])
    events = ([("del", s, e, None) for s, e in deletions]
              + [("inv", s, e, None) for s, e in inversions]
              + [("ins", p, p, s) for p, s in insertions])
    events.sort(key=lambda t: t[1])
    segs: List[Segment] = []
    truth: List[Tuple] = []
    cur = 0
    for typ, s, e, payload in events:
        if s > cur:
            segs.append(Segment(chrom, cur, s, 1))
        if typ == "del":
            truth.append(("DEL", chrom, s, chrom, e + 1))  # 1-based breakends
        elif typ == "inv":
            segs.append(Segment(chrom, s, e, -1))
            truth.append(("INV", chrom, s, chrom, e))
        elif typ == "ins":
            segs.append(Segment(None, novel=np.asarray(payload, np.uint8)))
            truth.append(("INS", chrom, s, chrom, s + 1))
        cur = e
    if cur < L:
        segs.append(Segment(chrom, cur, L, 1))
    parts = []
    bounds = [0]
    for sg in segs:
        if sg.chrom is None:
            parts.append(sg.novel)
        elif sg.strand == 1:
            parts.append(ref[sg.chrom][sg.start:sg.end])
        else:
            parts.append(REVCOMP_TABLE[ref[sg.chrom][sg.start:sg.end][::-1]])
        bounds.append(bounds[-1] + sg.length())
    return Donor(segs, np.concatenate(parts), np.asarray(bounds, np.int64),
                 truth)


@dataclass
class _Aln:
    mapped: bool
    tid: int = -1
    pos: int = 0
    rev: bool = False
    cigar: List[Tuple[int, str]] = field(default_factory=list)


def _map_read(donor: Donor, name2tid: Dict[str, int], s: int, e: int,
              rev: bool, read_len: int, min_anchor: int = 30) -> _Aln:
    """Analytic alignment of donor interval [s, e) as bwa would report it."""
    bounds = donor.seg_bounds
    i0 = int(np.searchsorted(bounds, s, "right")) - 1
    i1 = int(np.searchsorted(bounds, e - 1, "right")) - 1
    # choose the segment with the largest overlap as the aligned anchor
    best_seg, best_len = -1, 0
    for i in range(i0, i1 + 1):
        sg = donor.segments[i]
        if sg.chrom is None:
            continue
        ov = min(e, int(bounds[i + 1])) - max(s, int(bounds[i]))
        if ov > best_len:
            best_seg, best_len = i, ov
    if best_seg < 0 or best_len < min_anchor:
        return _Aln(False)
    sg = donor.segments[best_seg]
    left_clip = max(0, int(bounds[best_seg]) - s)
    right_clip = max(0, e - int(bounds[best_seg + 1]))
    anchor = read_len - left_clip - right_clip
    off = max(s, int(bounds[best_seg])) - int(bounds[best_seg])
    if sg.strand == 1:
        pos = sg.start + off
        seg_rev = rev
        lcl, rcl = left_clip, right_clip
    else:
        pos = sg.end - off - anchor
        seg_rev = not rev
        lcl, rcl = right_clip, left_clip
    # the emitted record's clip sides are in REFERENCE orientation of the
    # stored sequence; when the record is reverse-strand, the stored seq
    # is the revcomp of the donor-forward read, and clip sides swap with
    # seg orientation only (handled above via lcl/rcl)
    cig: List[Tuple[int, str]] = []
    if lcl:
        cig.append((lcl, "S"))
    cig.append((anchor, "M"))
    if rcl:
        cig.append((rcl, "S"))
    return _Aln(True, name2tid[sg.chrom], pos, seg_rev, cig)


def simulate_reads(donor: Donor, ref_names: List[str], ref_lens: List[int],
                   out_bam: str, *, coverage: float = 30.0,
                   read_len: int = 100, insert_mean: int = 500,
                   insert_sd: int = 25, error_rate: float = 0.002,
                   seed: int = 0) -> int:
    """Paired-end simulation -> coordinate-sorted BAM.  Returns #records."""
    rng = np.random.default_rng(seed)
    name2tid = {n: i for i, n in enumerate(ref_names)}
    G = len(donor.seq)
    n_pairs = int(coverage * G / (2 * read_len))
    frag = np.maximum(rng.normal(insert_mean, insert_sd, n_pairs)
                      .astype(np.int64), 2 * read_len + 10)
    starts = rng.integers(0, np.maximum(G - frag, 1))
    max_isize = insert_mean + 4 * insert_sd

    records = []
    qual = "I" * read_len
    for k in range(n_pairs):
        s = int(starts[k])
        f = int(frag[k])
        r1_s, r1_e = s, s + read_len
        r2_s, r2_e = s + f - read_len, s + f
        if r2_e > G:
            continue
        seq1 = donor.seq[r1_s:r1_e].copy()
        seq2f = donor.seq[r2_s:r2_e]
        seq2 = REVCOMP_TABLE[seq2f[::-1]].copy()   # read2 sequenced reverse
        for sq in (seq1, seq2):
            errs = np.nonzero(rng.random(read_len) < error_rate)[0]
            if len(errs):
                sq[errs] = BASES[rng.integers(0, 4, len(errs))]
        a1 = _map_read(donor, name2tid, r1_s, r1_e, False, read_len)
        a2 = _map_read(donor, name2tid, r2_s, r2_e, True, read_len)
        qname = f"sim_{k}".encode()
        flag1 = 0x1 | 0x40
        flag2 = 0x1 | 0x80
        # stored sequence follows alignment strand convention
        st1 = seq1 if not (a1.mapped and a1.rev) else REVCOMP_TABLE[seq1[::-1]]
        st2 = seq2 if not (a2.mapped and a2.rev) else REVCOMP_TABLE[seq2[::-1]]
        # mate/pair fields
        isize1 = isize2 = 0
        proper = False
        if a1.mapped and a2.mapped and a1.tid == a2.tid:
            p1, p2 = a1.pos, a2.pos
            end2 = a2.pos + sum(l for l, o in a2.cigar if o == "M")
            end1 = a1.pos + sum(l for l, o in a1.cigar if o == "M")
            lo = min(p1, p2)
            hi = max(end1, end2)
            span = hi - lo
            if (not a1.rev) and a2.rev and p1 <= p2 and span <= max_isize:
                proper = True
            isize1 = span if p1 <= p2 else -span
            isize2 = -isize1
        if proper:
            flag1 |= 0x2
            flag2 |= 0x2
        if a1.mapped and a1.rev:
            flag1 |= 0x10
        if a2.mapped and a2.rev:
            flag2 |= 0x10
        if not a1.mapped:
            flag1 |= 0x4
            flag2 |= 0x8
        if not a2.mapped:
            flag2 |= 0x4
            flag1 |= 0x8
        if a2.mapped and a2.rev:
            flag1 |= 0x20
        if a1.mapped and a1.rev:
            flag2 |= 0x20
        t1 = a1.tid if a1.mapped else (a2.tid if a2.mapped else -1)
        p1 = a1.pos if a1.mapped else (a2.pos if a2.mapped else -1)
        t2 = a2.tid if a2.mapped else (a1.tid if a1.mapped else -1)
        p2 = a2.pos if a2.mapped else (a1.pos if a1.mapped else -1)
        records.append((t1, p1, qname, flag1, 60 if a1.mapped else 0,
                        a1.cigar if a1.mapped else [], st1.tobytes(),
                        t2, p2, isize1))
        records.append((t2, p2, qname, flag2, 60 if a2.mapped else 0,
                        a2.cigar if a2.mapped else [], st2.tobytes(),
                        t1, p1, isize2))

    records.sort(key=lambda r: (r[0] if r[0] >= 0 else 1 << 30, r[1]))
    w = BamWriter(out_bam, ref_names, ref_lens)
    qb = qual.encode()
    for (tid, pos, qname, flag, mapq, cig, seq, mtid, mpos, isize) in records:
        w.write_record(tid, pos, qname, flag, mapq, cig, seq, qb,
                       mtid, mpos, isize)
    w.close()
    return len(records)


def write_fasta(path: str, seqs: Dict[str, np.ndarray]) -> None:
    with open(path, "w") as f:
        for name, arr in seqs.items():
            f.write(f">{name}\n")
            s = arr.tobytes().decode()
            for i in range(0, len(s), 60):
                f.write(s[i:i + 60] + "\n")
