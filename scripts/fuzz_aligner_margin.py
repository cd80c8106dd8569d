"""Adversarial aligner-margin campaign: targets the search caps of the
in-framework realigner — TOP_CANDIDATES=8 (align/engine.py _candidates)
and MAX_OCC=500 (seed occurrence cap) — on genomes where those margins
actually bind: a repeat unit copied K times (K bracketing MAX_OCC) with
per-copy divergence, SV breakpoints placed so clipped sequences overlap
the repeat.

For each config it runs BOTH full pipelines (reference binaries:
getclip -> bwa mem -> getsv; ours: getclip -> aln -> getsv) and compares
  (a) sv.txt rows (exact text, then coordinate-call set),
  (b) per-clip realignment agreement vs bwa: mapped/unmapped class,
      uniq/repeat class (mapq==0 or secondary -> 'r', the class getsv
      consumes, getsv.cpp:43-47), position agreement, and the mapq
      histogram distance.

Output: one JSON line per config + a summary line; non-zero exit when any
config's sv calls mismatch.  Results are recorded in PARITY.md.

Usage: python scripts/fuzz_aligner_margin.py [--quick]
"""
import argparse
import json
import os
import shutil
import stat
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seeksv_tpu.io.bai import build_index
from seeksv_tpu.pipeline.driver import realign_clips
from seeksv_tpu.pipeline.getclip import getclip
from seeksv_tpu.pipeline.getsv import getsv
from seeksv_tpu.utils.simulate import (build_donor, random_genome,
                                       simulate_reads, write_fasta)

BIN_DIR = "/root/reference/example/bin"


def make_repeat_genome(rng, G, unit_len, copies, div):
    """Unique backbone with `copies` copies of one unit, each mutated at
    rate `div`, tiled through the middle of the genome."""
    g = random_genome(rng, G)
    unit = random_genome(rng, unit_len)
    gap = max(unit_len // 4, 50)
    span = copies * (unit_len + gap)
    start = (G - span) // 2
    if start < 10_000:
        raise ValueError("genome too small for repeat span")
    bases = np.frombuffer(b"ACGT", np.uint8)
    positions = []
    for k in range(copies):
        u = unit.copy()
        if div > 0:
            m = rng.random(unit_len) < div
            u[m] = bases[rng.integers(0, 4, int(m.sum()))]
        p = start + k * (unit_len + gap)
        g[p:p + unit_len] = u
        positions.append(p)
    return g, positions


def parse_sam_alignments(path):
    """qname(=clip seq) -> (mapped, chrom, pos, strand, mapq, secondary)
    for primary records; counts secondaries per name."""
    out = {}
    sec = {}
    with open(path) as f:
        for line in f:
            if line.startswith("@"):
                continue
            fl = line.rstrip("\n").split("\t")
            name, flag, chrom, pos, mapq = (fl[0], int(fl[1]), fl[2],
                                            int(fl[3]), int(fl[4]))
            if flag & 0x100:
                sec[name] = sec.get(name, 0) + 1
                continue
            out[name] = (not (flag & 0x4), chrom, pos,
                         "-" if flag & 0x10 else "+", mapq)
    return out, sec


def sv_calls(path):
    rows = []
    with open(path) as f:
        for ln in f:
            if not ln.startswith("@"):
                rows.append(tuple(ln.split("\t")[:9]))
    return sorted(rows)


def run_config(cfg, bin_dir):
    rng = np.random.default_rng(cfg["seed"])
    G = cfg["G"]
    g, rep_pos = make_repeat_genome(rng, G, cfg["unit"], cfg["copies"],
                                    cfg["div"])
    ref = {"chr17": g}
    # SVs: half with a breakend inside the repeat array, half unique
    dels = []
    margin = 8000
    rep_lo, rep_hi = rep_pos[0], rep_pos[-1] + cfg["unit"]
    for i in range(cfg["events"]):
        if i % 2 == 0 and len(rep_pos) > 4:
            # deletion starting in unique sequence, ending inside a repeat
            # copy: the 3' clip of the left breakend realigns into the
            # repeat (cap-sensitive)
            k = int(rng.integers(1, len(rep_pos) - 1))
            end = rep_pos[k] + int(rng.integers(0, cfg["unit"] // 2))
            beg = max(margin, rep_lo - int(rng.integers(2000, 6000)) - i * 31)
            if end - beg < 100 or end - beg > 60_000:
                continue
            dels.append((beg - i * 97, beg - i * 97 + min(
                end - beg, 50_000)))
        else:
            p = int(rng.integers(margin, max(rep_lo - 6000, margin + 1)))
            dels.append((p, p + int(rng.integers(200, 3000))))
    dels = sorted(set(dels))
    # drop overlapping events
    clean = []
    last_end = 0
    for b, e in dels:
        if b > last_end + 500:
            clean.append((b, e))
            last_end = e
    donor = build_donor(ref, deletions=clean, inversions=[])
    with tempfile.TemporaryDirectory() as d:
        simulate_reads(donor, ["chr17"], [G], f"{d}/sim.bam",
                       coverage=cfg["cov"], seed=cfg["seed"],
                       error_rate=0.002, read_len=100, insert_mean=500)
        build_index(f"{d}/sim.bam")
        write_fasta(f"{d}/ref.fa", ref)
        for b in ("seeksv", "bwa"):
            shutil.copy(os.path.join(BIN_DIR, b), f"{d}/{b}")
            os.chmod(f"{d}/{b}", os.stat(f"{d}/{b}").st_mode | stat.S_IXUSR)
        subprocess.run([f"{d}/bwa", "index", f"{d}/ref.fa"], check=True,
                       capture_output=True)
        # reference pipeline
        subprocess.run([f"{d}/seeksv", "getclip", "-o", f"{d}/ref_p",
                        f"{d}/sim.bam"], check=True, capture_output=True)
        with open(f"{d}/ref_p.clip.sam", "wb") as f:
            subprocess.run([f"{d}/bwa", "mem", f"{d}/ref.fa",
                            f"{d}/ref_p.clip.fq.gz"], check=True, stdout=f,
                           stderr=subprocess.DEVNULL)
        # the oracle binary fails transiently on some hosts (same retry
        # as tests/test_differential_fuzz.py); persistent failures are
        # an oracle crash on this config — skip it rather than abort
        for attempt in range(3):
            r = subprocess.run(
                [f"{d}/seeksv", "getsv", f"{d}/ref_p.clip.sam",
                 f"{d}/sim.bam", f"{d}/ref_p.clip.gz",
                 f"{d}/ref_p.sv", f"{d}/ref_p.r.fq"], capture_output=True)
            if r.returncode == 0:
                break
        else:
            return {"cfg": cfg, "skipped":
                    f"oracle getsv exit {r.returncode}: "
                    f"{r.stderr.decode(errors='replace')[-200:]}"}
        # our pipeline (getclip is byte-identical; reuse its outputs for a
        # controlled aligner comparison)
        import io as _io
        getclip(f"{d}/sim.bam", f"{d}/ours")
        realign_clips(f"{d}/ref.fa", f"{d}/ours.clip.fq.gz",
                      f"{d}/ours.clip.sam")
        getsv(f"{d}/ours.clip.sam", f"{d}/sim.bam", f"{d}/ours.clip.gz",
              f"{d}/ours.sv", f"{d}/ours.r.fq", filtered_out=_io.StringIO())

        with open(f"{d}/ref_p.sv") as a, open(f"{d}/ours.sv") as b:
            exact = a.read() == b.read()
        calls_ref = sv_calls(f"{d}/ref_p.sv")
        calls_ours = sv_calls(f"{d}/ours.sv")

        bwa_al, bwa_sec = parse_sam_alignments(f"{d}/ref_p.clip.sam")
        our_al, _ = parse_sam_alignments(f"{d}/ours.clip.sam")
        names = sorted(set(bwa_al) & set(our_al))
        n = len(names)
        class_agree = pos_agree = mapped_agree = 0
        mq_b = np.zeros(61, np.int64)
        mq_o = np.zeros(61, np.int64)
        for nm in names:
            mb, cb, pb, sb, qb = bwa_al[nm]
            mo, co, po, so, qo = our_al[nm]
            mq_b[min(qb, 60)] += 1
            mq_o[min(qo, 60)] += 1
            if mb == mo:
                mapped_agree += 1
            # the class getsv consumes: repeat iff mapq == 0 (we emit no
            # secondary records as primary-name duplicates)
            if (qb == 0) == (qo == 0) and mb == mo:
                class_agree += 1
            if mb and mo and cb == co and sb == so and abs(pb - po) <= 5:
                pos_agree += 1
        tv = float(np.abs(mq_b - mq_o).sum()) / max(2 * n, 1)
        return {
            **{k: cfg[k] for k in ("seed", "G", "unit", "copies", "div",
                                   "events", "cov")},
            "n_clips": n,
            "sv_exact": exact,
            "sv_calls_equal": calls_ref == calls_ours,
            "n_calls_ref": len(calls_ref), "n_calls_ours": len(calls_ours),
            "mapped_agree": round(mapped_agree / max(n, 1), 4),
            "class_agree": round(class_agree / max(n, 1), 4),
            "pos_agree": round(pos_agree / max(n, 1), 4),
            "mapq_tv_dist": round(tv, 4),
            "bwa_secondaries": sum(bwa_sec.values()),
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    configs = []
    # copies bracket MAX_OCC=500 (19-mer occurrences ~ copies when
    # div=0); div>0 stresses the top-8 candidate ranking instead
    for copies, div, seed in [(50, 0.0, 11), (50, 0.02, 12),
                              (400, 0.0, 13), (400, 0.005, 14),
                              (800, 0.0, 15), (800, 0.02, 16),
                              (1200, 0.005, 17)]:
        configs.append(dict(seed=seed, G=10_000_000, unit=500,
                            copies=copies, div=div, events=40, cov=30))
    if args.quick:
        configs = configs[:2]
    bad = 0
    results = []
    skipped = []
    for cfg in configs:
        r = run_config(cfg, BIN_DIR)
        print(json.dumps(r), flush=True)
        if "skipped" in r:
            skipped.append(r)
            continue
        results.append(r)
        if not r["sv_calls_equal"]:
            bad += 1
    print(json.dumps({
        "summary": "aligner-margin fuzz",
        "configs": len(results),
        "skipped_oracle_crash": len(skipped),
        "sv_exact": sum(r["sv_exact"] for r in results),
        "sv_calls_equal": sum(r["sv_calls_equal"] for r in results),
        "min_class_agree": min(r["class_agree"] for r in results),
        "min_pos_agree": min(r["pos_agree"] for r in results),
        "max_mapq_tv": max(r["mapq_tv_dist"] for r in results),
    }))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
