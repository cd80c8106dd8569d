"""Randomized differential campaign vs the reference binary.

Generates random SV datasets (mixed DEL/INV/nearby events, optional repeat
blocks and error rates), runs getclip+getsv through both the v1.2.0 binary
and this framework, and reports any output mismatch.  Used as an offline
soak test beyond the pinned seeds in tests/test_differential_fuzz.py.

Usage: python scripts/fuzz_differential.py [n_seeds] [start_seed]
"""
import gzip
import io
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

BIN = "/root/reference/example/bin/seeksv"


def run_seed(ref_bin, seed):
    rng = np.random.default_rng(seed)
    G = int(rng.integers(60_000, 150_000))
    g = random_genome(rng, G)
    if rng.random() < 0.4:  # repeat block
        src = int(rng.integers(0, G - 4000))
        dst = int(rng.integers(0, G - 4000))
        ln = int(rng.integers(500, 2000))
        g[dst:dst + ln] = g[src:src + ln]
    ref = {"chr17": g}
    n_ev = int(rng.integers(1, 6))
    margin = 6000
    slots = np.linspace(margin, G - margin - 5000, max(n_ev, 1))
    dels, invs = [], []
    for p in slots:
        ln = int(rng.integers(150, 4000))
        (dels if rng.random() < 0.6 else invs).append((int(p), int(p) + ln))
    donor = build_donor(ref, deletions=dels, inversions=invs)
    err = float(rng.choice([0.001, 0.002, 0.005, 0.01]))
    cov = int(rng.integers(15, 45))
    read_len = int(rng.choice([100, 100, 150, 250]))
    insert_mean = max(500, 3 * read_len)
    with tempfile.TemporaryDirectory() as d:
        simulate_reads(donor, ["chr17"], [G], f"{d}/sim.bam",
                       coverage=cov, seed=seed, error_rate=err,
                       read_len=read_len, insert_mean=insert_mean)
        build_index(f"{d}/sim.bam")
        write_fasta(f"{d}/ref.fa", ref)
        getclip(f"{d}/sim.bam", f"{d}/s")
        # getclip differential
        subprocess.run([ref_bin, "getclip", "-o", f"{d}/r", f"{d}/sim.bam"],
                       check=True, capture_output=True)
        for sfx in ("clip.gz", "clip.fq.gz"):
            a = gzip.open(f"{d}/s.{sfx}", "rb").read()
            b = gzip.open(f"{d}/r.{sfx}", "rb").read()
            if a != b:
                return f"getclip {sfx} mismatch"
        realign_clips(f"{d}/ref.fa", f"{d}/s.clip.fq.gz", f"{d}/s.clip.sam")
        getsv(f"{d}/s.clip.sam", f"{d}/sim.bam", f"{d}/s.clip.gz",
              f"{d}/ours.sv", f"{d}/o.fq", filtered_out=io.StringIO())
        r = subprocess.run(
            [ref_bin, "getsv", f"{d}/s.clip.sam", f"{d}/sim.bam",
             f"{d}/s.clip.gz", f"{d}/ref.sv", f"{d}/r.fq"],
            capture_output=True, text=True)
        if r.returncode != 0:
            return f"binary getsv failed: {r.stderr[-200:]}"
        if open(f"{d}/ours.sv").read() != open(f"{d}/ref.sv").read():
            return "getsv mismatch"
        # somatic differential vs a second (germline-only) sample
        if rng.random() < 0.5 and dels:
            germ = build_donor(ref, deletions=dels[:1])
            simulate_reads(germ, ["chr17"], [G], f"{d}/n.bam",
                           coverage=cov, seed=seed + 7, error_rate=err)
            build_index(f"{d}/n.bam")
            getclip(f"{d}/n.bam", f"{d}/n")
            from seeksv_tpu.pipeline.somatic import somatic
            somatic(f"{d}/n.bam", f"{d}/n.clip.gz", f"{d}/ours.sv",
                    f"{d}/ours.somatic.sv")
            r = subprocess.run(
                [ref_bin, "somatic", f"{d}/n.bam", f"{d}/n.clip.gz",
                 f"{d}/ours.sv", f"{d}/ref.somatic.sv"],
                capture_output=True, text=True)
            if r.returncode != 0:
                return f"binary somatic failed: {r.stderr[-200:]}"
            if (open(f"{d}/ours.somatic.sv").read()
                    != open(f"{d}/ref.somatic.sv").read()):
                return "somatic mismatch"
        # getclip threshold flag differential
        if rng.random() < 0.3:
            t = float(rng.choice([0.7, 0.9, 0.95]))
            getclip(f"{d}/sim.bam", f"{d}/st", threshold=t)
            subprocess.run([ref_bin, "getclip", "-t", str(t), "-o",
                            f"{d}/rt", f"{d}/sim.bam"],
                           check=True, capture_output=True)
            a = gzip.open(f"{d}/st.clip.gz", "rb").read()
            b = gzip.open(f"{d}/rt.clip.gz", "rb").read()
            if a != b:
                return f"getclip -t {t} mismatch"
    return None


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    d = tempfile.mkdtemp()
    ref_bin = os.path.join(d, "seeksv")
    shutil.copy(BIN, ref_bin)
    os.chmod(ref_bin, os.stat(ref_bin).st_mode | stat.S_IXUSR)
    bad = 0
    for seed in range(start, start + n):
        msg = run_seed(ref_bin, seed)
        status = msg or "OK"
        print(f"seed {seed}: {status}", flush=True)
        if msg:
            bad += 1
    print(f"{n - bad}/{n} seeds byte-identical")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
