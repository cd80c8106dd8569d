"""First-class scale benchmark: full-pipeline head-to-head vs the
reference binaries on a simulated dataset, with parity asserted.

Ours:      io.read_bam -> getclip -> in-framework realign -> getsv
Reference: bin/seeksv getclip -> bin/bwa mem -> bin/seeksv getsv
(the reference's own 3-step workflow, example/seeksv.sh:1-4)

The simulated dataset (genome, BAM, bwa index) is cached under
~/.cache/seeksv_tpu so repeated runs measure the pipelines, not the
simulator.  Prints one JSON line per metric.

Usage: python scripts/bench_scale.py [--genome-mb 10] [--coverage 30]
       [--read-len 100] [--seed 1] [--events 30] [--repeats]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIN_DIR = "/root/reference/example/bin"


def build_dataset(root, G, cov, read_len, seed, n_events, with_repeats,
                  virus_kb=0, virus_events=0, virus_div=0.04):
    from seeksv_tpu.io.bai import build_index
    from seeksv_tpu.utils.simulate import (build_donor, mutate,
                                           random_genome, simulate_reads,
                                           write_fasta)
    os.makedirs(root, exist_ok=True)
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return
    rng = np.random.default_rng(seed)
    g = random_genome(rng, G)
    if with_repeats:
        for _ in range(max(1, G // 2_000_000)):
            src = int(rng.integers(0, G - 20_000))
            dst = int(rng.integers(0, G - 20_000))
            ln = int(rng.integers(2_000, 15_000))
            g[dst:dst + ln] = g[src:src + ln]
    ref = {"chr17": g}
    margin = 50_000
    # one global slot array so del/inv intervals and virus insertion
    # points never overlap (build_donor requires disjoint sorted events)
    n_slots = max(n_events + virus_events, 1)
    slots = np.linspace(margin, G - margin - 10_000, n_slots)
    spacing = (G - 2 * margin - 10_000) / n_slots
    max_ev_len = int(min(5_000, max(spacing - 1_000, 300)))
    kinds = np.array(["sv"] * n_events + ["virus"] * virus_events)
    rng.shuffle(kinds)
    dels, invs, inss = [], [], []
    vtruth = []
    if virus_kb:
        virus = random_genome(rng, virus_kb * 1000)
        ref["virus"] = virus
        # the donor's integrated strain diverges from the reference
        # contig (mutate docstring; ROOFLINE.md §4 workload class)
        vmut = mutate(rng, virus, virus_div)
        # each integration takes a DISJOINT slice of the panel when it is
        # big enough (a multi-virus integration panel): overlapping draws
        # make two host sites share virus sequence, which is a genuinely
        # ambiguous call the two pipelines may resolve differently —
        # disjoint slices keep the byte-parity contract checkable
        vblock = 2_000
        if virus_kb * 1000 >= virus_events * vblock + vblock:
            vstarts = rng.permutation(virus_kb * 1000 // vblock - 1)[
                :virus_events] * vblock
        else:
            vstarts = None
        vi = 0
    for p, kind in zip(slots, kinds):
        if kind == "sv":
            ln = int(rng.integers(200, max_ev_len))
            (dels if rng.random() < 0.65
             else invs).append((int(p), int(p) + ln))
        else:
            vlen = int(rng.integers(500, 2_000))
            if vstarts is not None:
                voff = int(vstarts[vi])
                vi += 1
            else:
                voff = int(rng.integers(0, len(vmut) - vlen))
            inss.append((int(p), vmut[voff:voff + vlen]))
            # left junction: chr17:p -> virus:voff(+) ; right junction:
            # virus:voff+vlen -> chr17:p+1 (1-based breakends as sv.txt)
            vtruth.append({"type": "VINT", "up_chrom": "chr17", "up": int(p),
                           "down_chrom": "virus", "down": voff + 1,
                           "right_up": voff + vlen,
                           "right_down": int(p) + 1})
    donor = build_donor(ref, deletions=dels, inversions=invs,
                        insertions=inss)
    with open(os.path.join(root, "truth.json"), "w") as f:
        json.dump([{"type": t[0], "up_chrom": t[1], "up": int(t[2]),
                    "down_chrom": t[3], "down": int(t[4])}
                   for t in donor.truth if t[0] != "INS"] + vtruth, f)
    insert_mean = max(500, 3 * read_len)
    t0 = time.time()
    simulate_reads(donor, list(ref), [len(ref[c]) for c in ref],
                   os.path.join(root, "sim.bam"),
                   coverage=cov, seed=seed, error_rate=0.002,
                   read_len=read_len, insert_mean=insert_mean)
    build_index(os.path.join(root, "sim.bam"))
    write_fasta(os.path.join(root, "ref.fa"), ref)
    print(f"# simulated {G / 1e6:.0f}Mbp x {cov}x ({len(dels)} DEL, "
          f"{len(invs)} INV) in {time.time() - t0:.1f}s", file=sys.stderr)
    # executable copies of the reference binaries + bwa index
    for b in ("seeksv", "bwa"):
        dst = os.path.join(root, b)
        shutil.copy(os.path.join(BIN_DIR, b), dst)
        os.chmod(dst, os.stat(dst).st_mode | stat.S_IXUSR)
    subprocess.run([os.path.join(root, "bwa"), "index",
                    os.path.join(root, "ref.fa")],
                   check=True, capture_output=True)
    open(done, "w").close()


def run_ours(root, out_dir, stream=False, chunk_records=2_000_000,
             device_align=False, force_device=False, force_host=False):
    import io as _io

    from seeksv_tpu.io.bam import read_bam
    from seeksv_tpu.pipeline.driver import realign_clips
    from seeksv_tpu.pipeline.getclip import getclip
    from seeksv_tpu.pipeline.getsv import getsv
    bam = os.path.join(root, "sim.bam")
    prefix = os.path.join(out_dir, "ours")
    stages = {}
    t0 = time.time()
    if stream:
        from seeksv_tpu.pipeline.getclip import GetclipStream
        from seeksv_tpu.pipeline.stream import StreamStats, scan_bam
        gs = GetclipStream(prefix)
        stats = StreamStats(20, 5_000_000)
        scan_bam(bam, chunk_records, [gs, stats])
        gs.close()
        n = stats.n
        stages["getclip_stream"] = time.time() - t0
        recs, stats_arg = None, stats
    else:
        recs = read_bam(bam)
        stages["read_bam"] = time.time() - t0
        t = time.time()
        getclip(bam, prefix, recs=recs)
        stages["getclip"] = time.time() - t
        n = recs.n
        stats_arg = None
    t = time.time()
    aligner = realign_clips(os.path.join(root, "ref.fa"),
                            f"{prefix}.clip.fq.gz", f"{prefix}.clip.sam",
                            device_align=device_align,
                            force_device=force_device,
                            force_host=force_host)
    stages["realign"] = time.time() - t
    t = time.time()
    getsv(f"{prefix}.clip.sam", bam, f"{prefix}.clip.gz", f"{prefix}.sv",
          f"{prefix}.r.fq", filtered_out=_io.StringIO(), recs=recs,
          stats=stats_arg)
    stages["getsv"] = time.time() - t
    stages["total"] = time.time() - t0
    stages["aligner"] = {k: round(v, 3) for k, v in aligner.timings.items()}
    stages["dispatch"] = getattr(aligner, "last_dispatch", None)
    return n, stages


def run_reference(root, out_dir):
    bam = os.path.join(root, "sim.bam")
    prefix = os.path.join(out_dir, "ref")
    seeksv = os.path.join(root, "seeksv")
    bwa = os.path.join(root, "bwa")
    stages = {}
    t0 = time.time()
    subprocess.run([seeksv, "getclip", "-o", prefix, bam],
                   check=True, capture_output=True)
    stages["getclip"] = time.time() - t0
    t = time.time()
    with open(f"{prefix}.clip.sam", "wb") as f:
        subprocess.run([bwa, "mem", os.path.join(root, "ref.fa"),
                        f"{prefix}.clip.fq.gz"],
                       check=True, stdout=f, stderr=subprocess.DEVNULL)
    stages["bwa"] = time.time() - t
    t = time.time()
    subprocess.run([seeksv, "getsv", f"{prefix}.clip.sam", bam,
                    f"{prefix}.clip.gz", f"{prefix}.sv", f"{prefix}.r.fq"],
                   check=True, capture_output=True)
    stages["getsv"] = time.time() - t
    stages["total"] = time.time() - t0
    return stages


def sv_rows(path):
    with open(path) as f:
        return [ln for ln in f if not ln.startswith("@")]


def bai_512mb_defect(ours_rows, ref_rows) -> bool:
    """True when the two sv row lists differ EXACTLY by the reference's
    BAI 512Mbp ceiling (PARITY.md §9): same row count, every differing
    row differs only in column 10 (abnormal_read_pair_NO) with the
    reference side 0 and up_pos >= 2^29."""
    if len(ours_rows) != len(ref_rows):
        return False
    saw = False
    for a, b in zip(ours_rows, ref_rows):
        if a == b:
            continue
        fa, fb = a.split("\t"), b.split("\t")
        if len(fa) != len(fb):
            return False
        diffcols = [i for i in range(len(fa)) if fa[i] != fb[i]]
        if diffcols != [9] or fb[9] != "0" or int(fa[1]) < (1 << 29):
            return False
        saw = True
    return saw


def gz_sha(path):
    """sha256 of the DECOMPRESSED stream (gzip container bytes differ
    between writers; byte parity is defined on the payload)."""
    import gzip
    import hashlib
    h = hashlib.sha256()
    with gzip.open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def sv_recall(truth, rows):
    """(del_recall, virus_junction_recall) of an sv.txt row list against
    the embedded truth; +-50bp fuzzy match, the reference's own
    comparison window (svcompare.cpp:330 MergeNear) — microhomology
    shifts both breakends under the default -l 50 merge.  Virus
    integrations contribute two junctions each (host->virus and
    virus->host)."""
    calls = []
    for r in rows:
        fl = r.split("\t")
        calls.append((fl[0], int(fl[1]), fl[4], int(fl[5])))
    cu = np.asarray([c[1] for c in calls], np.int64)
    cd = np.asarray([c[3] for c in calls], np.int64)

    def hit(up_chrom, up, down_chrom, down):
        m = (np.abs(cu - up) <= 50) & (np.abs(cd - down) <= 50)
        return any(m[i] and calls[i][0] == up_chrom
                   and calls[i][2] == down_chrom
                   for i in np.nonzero(m)[0])

    dels = [t for t in truth if t["type"] == "DEL"]
    dr = round(sum(hit(t["up_chrom"], t["up"], t["down_chrom"], t["down"])
                   for t in dels) / max(len(dels), 1), 4)
    vints = [t for t in truth if t["type"] == "VINT"]
    vr = None
    if vints:
        vhit = 0
        for t in vints:
            vhit += hit(t["up_chrom"], t["up"], t["down_chrom"], t["down"])
            vhit += hit(t["down_chrom"], t["right_up"],
                        t["up_chrom"], t["right_down"])
        vr = round(vhit / (2 * len(vints)), 4)
    return dr, vr


def run_ab(args, root):
    """Three-arm A/B in ONE process/session (VERDICT r4 #1): per trial,
    back-to-back (a) calibrated-dispatch arm, (b) forced-host arm,
    (c) reference binaries — interleaved so host-load drift hits all
    arms equally; same jax platform pin for both our arms.  Emits one
    JSON row per our-arm, each carrying the shared session summary,
    per-arm sv parity vs the reference AND clip.gz/clip.fq.gz byte
    parity (sha256 of the decompressed streams — PARITY.md §8: clip
    parity holds even in the long-fragment oracle-defect regime)."""
    import resource
    import uuid

    arm_force = {"device": False, "forced_host": True}
    best = {k: None for k in arm_force}
    totals = {k: [] for k in arm_force}
    svs = {}
    clip_sha = {}
    n = None
    ref_stages = None
    ref_totals = []
    ref_sv = None
    ref_clip = None
    for t in range(max(1, args.trials)):
        for name, fh in arm_force.items():
            with tempfile.TemporaryDirectory() as d2:
                n, st = run_ours(root, d2, stream=args.stream,
                                 chunk_records=args.chunk_records,
                                 device_align=args.device_align,
                                 force_host=fh)
                totals[name].append(round(st["total"], 3))
                if best[name] is None or st["total"] < best[name]["total"]:
                    best[name] = st
                if t == 0:
                    p = os.path.join(d2, "ours")
                    svs[name] = sv_rows(f"{p}.sv")
                    clip_sha[name] = (gz_sha(f"{p}.clip.gz"),
                                      gz_sha(f"{p}.clip.fq.gz"))
        with tempfile.TemporaryDirectory() as dref:
            st = run_reference(root, dref)
            ref_totals.append(round(st["total"], 3))
            if ref_stages is None or st["total"] < ref_stages["total"]:
                ref_stages = st
            if t == 0:
                p = os.path.join(dref, "ref")
                ref_sv = sv_rows(f"{p}.sv")
                ref_clip = (gz_sha(f"{p}.clip.gz"),
                            gz_sha(f"{p}.clip.fq.gz"))
        print(f"# trial {t + 1}/{args.trials}: "
              f"device {totals['device'][-1]}s, "
              f"forced_host {totals['forced_host'][-1]}s, "
              f"reference {ref_totals[-1]}s", file=sys.stderr)

    truth = None
    tpath = os.path.join(root, "truth.json")
    if os.path.exists(tpath):
        with open(tpath) as f:
            truth = json.load(f)
    ref_truth_recall = ref_virus_recall = None
    if truth is not None:
        ref_truth_recall, ref_virus_recall = sv_recall(truth, ref_sv)
    calls = lambda rows: sorted(tuple(r.split("\t")[:8]) for r in rows)
    try:
        import jax
        platform = jax.devices()[0].platform
        device = str(jax.devices()[0])
    except Exception:
        platform = device = None
    session = uuid.uuid4().hex[:12]
    ab = {
        "session": session,
        "trial_order": "interleaved per trial: device, forced_host, "
                       "reference (one process, one platform pin)",
        "device_best_s": round(best["device"]["total"], 3),
        "forced_host_best_s": round(best["forced_host"]["total"], 3),
        "ref_best_s": round(ref_stages["total"], 3),
        "device_vs_forced_host": round(
            best["forced_host"]["total"] / best["device"]["total"], 4),
        "device_vs_reference": round(
            ref_stages["total"] / best["device"]["total"], 4),
        "arms_sv_identical": svs["device"] == svs["forced_host"],
    }
    ok = True
    for name in arm_force:
        st = dict(best[name])
        al = st.pop("aligner", {})
        dispatch = st.pop("dispatch", None)
        dev_s = (al.get("device_extend_s", 0.0)
                 + al.get("device_finalize_s", 0.0))
        host_s = al.get("host_extend_s", 0.0)
        exact = svs[name] == ref_sv
        calls_equal = calls(svs[name]) == calls(ref_sv)
        parity = ("exact" if exact
                  else ("calls-equal" if calls_equal else "MISMATCH"))
        if parity != "exact" and bai_512mb_defect(svs[name], ref_sv):
            parity = "ref-defect-bai-512mb"   # PARITY.md §9
        if parity == "MISMATCH" and args.expect_ref_defect:
            parity = "ref-defect-qname-truncation"
        clip_parity = "exact" if clip_sha[name] == ref_clip else "MISMATCH"
        tr = vr = None
        if truth is not None:
            tr, vr = sv_recall(truth, svs[name])
        rps = n / st["total"]
        ref_rps = n / ref_stages["total"]
        result = {
            "metric": "scale_full_pipeline_reads_per_s",
            "value": round(rps, 1), "unit": "reads/s", "n_records": n,
            "genome_mb": args.genome_mb, "coverage": args.coverage,
            "read_len": args.read_len, "stream": args.stream,
            "arm": name, "ab": ab,
            "parity": parity, "clip_parity": clip_parity,
            "truth_del_recall": tr, "virus_junction_recall": vr,
            "ref_truth_del_recall": ref_truth_recall,
            "ref_virus_junction_recall": ref_virus_recall,
            "virus": ({"kb": args.virus_kb, "events": args.virus_events,
                       "divergence": args.virus_divergence}
                      if args.virus_kb else None),
            "peak_rss_mb": round(resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss / 1024, 1),
            "ours_stages_s": {k: round(v, 3) for k, v in st.items()},
            "aligner_stages_s": al,
            "realign_device_fraction": round(
                dev_s / max(dev_s + host_s + al.get("seed_s", 0)
                            + al.get("finalize_s", 0), 1e-9), 4),
            "device_s_total": round(dev_s, 3),
            "device_fraction_total": round(
                dev_s / max(st["total"], 1e-9), 4),
            "jax_platform": platform, "jax_device": device,
            "force_device_extend": False,
            "force_host_extend": arm_force[name],
            "dispatch": dispatch,
            "trials": max(1, args.trials),
            "ours_totals_s": totals[name],
            "ours_stddev_s": round(float(np.std(totals[name])), 3),
            "vs_baseline": round(rps / ref_rps, 4),
            "ref_stages_s": {k: round(v, 3)
                             for k, v in ref_stages.items()},
            "ref_trials": max(1, args.trials),
            "ref_totals_s": ref_totals,
            "ref_stddev_s": round(float(np.std(ref_totals)), 3),
        }
        line = json.dumps(result)
        print(line)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")
        if clip_parity != "exact":
            ok = False
        if parity == "MISMATCH":
            ok = False
        if parity == "ref-defect-qname-truncation" and (
                (tr or 0) < 0.99 or (vr is not None and vr < 0.99)):
            ok = False
    if not ab["arms_sv_identical"]:
        ok = False
    sys.exit(0 if ok else 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=10)
    ap.add_argument("--coverage", type=int, default=30)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--events", type=int, default=30)
    ap.add_argument("--repeats", action="store_true",
                    help="copy repeat blocks into the genome")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--stream", action="store_true",
                    help="bounded-memory ingestion (pipeline.stream)")
    ap.add_argument("--chunk-records", type=int, default=2_000_000)
    ap.add_argument("--device-align", action="store_true",
                    help="force the fully device-resident realignment "
                         "front-end (ops.align_device)")
    ap.add_argument("--force-device-extend", action="store_true",
                    help="route the batched extension rounds to the "
                         "accelerator regardless of the calibrated "
                         "crossover (device-fraction artifact runs)")
    ap.add_argument("--force-host-extend", action="store_true",
                    help="pin the extension rounds to the host kernels "
                         "(the control arm of the device-win A/B; same "
                         "platform, dispatch overridden)")
    ap.add_argument("--virus-kb", type=int, default=0,
                    help="add a virus contig of this many kb to the "
                         "reference and integrate divergent segments of "
                         "it into the donor (--virus-events sites)")
    ap.add_argument("--virus-events", type=int, default=0)
    ap.add_argument("--virus-divergence", type=float, default=0.04,
                    help="strain divergence between the integrated virus "
                         "segments and the reference virus contig")
    ap.add_argument("--probe-retries", type=int, default=10,
                    help="accelerator responsiveness probe retries "
                         "(60s apart) before aborting a non---cpu-jax run")
    ap.add_argument("--expect-ref-defect", action="store_true",
                    help="long-fragment regime (clip consensi >254bp): "
                         "the v1.2.0 oracle desyncs on qname truncation; "
                         "record the defect and use truth recall as the "
                         "parity channel instead of failing")
    ap.add_argument("--skip-reference", action="store_true",
                    help="skip the reference-binary head-to-head (no "
                         "parity check; for RSS/device-fraction runs)")
    ap.add_argument("--ab", action="store_true",
                    help="three-arm A/B in one session: per trial run "
                         "device-dispatch, forced-host and reference "
                         "back-to-back (same platform pin); emits one "
                         "row per arm with a shared session summary and "
                         "clip.gz byte-parity per arm")
    ap.add_argument("--out", default=None,
                    help="append the JSON result line to this file")
    ap.add_argument("--cpu-jax", action="store_true",
                    help="pin jax to the CPU backend (e.g. when the "
                         "tunneled TPU is unreachable); the engine then "
                         "keeps all extension work on the native host "
                         "kernels")
    args = ap.parse_args()
    if args.cpu_jax:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        # the tunneled backend can wedge mid-session (bench.py's
        # _ensure_responsive_backend); probe it in a SUBPROCESS before
        # this process imports jax, retrying for a while — a device-run
        # artifact is useless pinned to cpu, so don't fall back silently
        import subprocess
        for attempt in range(args.probe_retries + 1):
            try:
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import numpy, jax, jax.numpy as jnp;"
                     "x = jnp.asarray(numpy.ones((1024, 1024),"
                     " numpy.float32)); numpy.asarray(x @ x)"],
                    timeout=60, capture_output=True)
                if r.returncode == 0:
                    break
            except subprocess.TimeoutExpired:
                pass
            if attempt == args.probe_retries:
                print("# accelerator probe failed repeatedly; aborting "
                      "(rerun with --cpu-jax for a host-path run)",
                      file=sys.stderr)
                sys.exit(2)
            print(f"# accelerator probe failed (attempt {attempt + 1}); "
                  "retrying in 60s", file=sys.stderr)
            time.sleep(60)
    G = int(args.genome_mb * 1e6)
    vtag = (f"-v{args.virus_kb}x{args.virus_events}"
            f"d{args.virus_divergence}" if args.virus_kb else "")
    key = (f"scale-G{G}-c{args.coverage}-l{args.read_len}-s{args.seed}"
           f"-e{args.events}{'-rep' if args.repeats else ''}{vtag}")
    root = os.path.join(os.path.expanduser("~"), ".cache", "seeksv_tpu", key)
    build_dataset(root, G, args.coverage, args.read_len, args.seed,
                  args.events, args.repeats, virus_kb=args.virus_kb,
                  virus_events=args.virus_events,
                  virus_div=args.virus_divergence)

    import resource

    # pre-build our k-mer index outside the timed region — the analogue
    # of the `bwa index` run that build_dataset gives the reference side
    # (one-time per reference; cached under ~/.cache/seeksv_tpu)
    from seeksv_tpu.align.engine import BatchAligner
    if not args.cpu_jax:
        # fresh-host readiness: a stale dispatch calibration (different
        # chip or upload plumbing) recalibrates itself before the timed
        # region (VERDICT r3 #9)
        BatchAligner.ensure_calibration(
            auto=True, log=lambda *a: print(*a, file=sys.stderr))
    t0 = time.time()
    BatchAligner.from_fasta(os.path.join(root, "ref.fa"))
    if time.time() - t0 > 5:
        print(f"# built k-mer index in {time.time() - t0:.0f}s "
              "(one-time, cached; excluded like bwa index)",
              file=sys.stderr)

    if args.ab:
        run_ab(args, root)   # exits

    with tempfile.TemporaryDirectory() as d:
        ref_stages = None
        ref_sv = None
        ref_totals = []
        if not args.skip_reference:
            # best-of-N for the reference too (same methodology as our
            # side; a one-shot baseline swung bwa 0.5-2.7s between runs,
            # ADVICE r2)
            for rt in range(max(1, args.trials)):
                with tempfile.TemporaryDirectory() as dref:
                    st = run_reference(root, dref)
                    ref_totals.append(round(st["total"], 3))
                    if ref_stages is None or st["total"] < ref_stages["total"]:
                        ref_stages = st
                    if rt == 0:
                        ref_sv = sv_rows(os.path.join(dref, "ref.sv"))
        n = None
        ours = None
        ours_totals = []
        for _ in range(max(1, args.trials)):  # best-of (page/jit warm)
            with tempfile.TemporaryDirectory() as d2:
                n, st = run_ours(root, d2, stream=args.stream,
                                 chunk_records=args.chunk_records,
                                 device_align=args.device_align,
                                 force_device=args.force_device_extend,
                                 force_host=args.force_host_extend)
                ours_totals.append(round(st["total"], 3))
                if ours is None or st["total"] < ours["total"]:
                    ours = st
                if _ == 0:
                    ours_sv = sv_rows(os.path.join(d2, "ours.sv"))
        # embedded-truth DEL recall (exact breakpoint coordinates; the
        # parity channel for --skip-reference runs)
        truth_recall = None
        virus_recall = None
        ref_truth_recall = None
        ref_virus_recall = None
        tpath = os.path.join(root, "truth.json")
        if os.path.exists(tpath):
            with open(tpath) as f:
                truth = json.load(f)
            truth_recall, virus_recall = sv_recall(truth, ours_sv)
            if ref_sv is not None:
                ref_truth_recall, ref_virus_recall = sv_recall(truth, ref_sv)
        if ref_sv is not None:
            exact = ours_sv == ref_sv
            # fall back to call-coordinate comparison if text differs (the
            # reference side realigns with bwa, ours with the in-framework
            # aligner; mapq ties can reorder columns without changing calls)
            calls = lambda rows: sorted(tuple(r.split("\t")[:8])
                                        for r in rows)
            calls_equal = calls(ours_sv) == calls(ref_sv)
            parity = ("exact" if exact
                      else ("calls-equal" if calls_equal else "MISMATCH"))
            if parity != "exact" and bai_512mb_defect(ours_sv, ref_sv):
                parity = "ref-defect-bai-512mb"   # PARITY.md §9
            if parity == "MISMATCH" and args.expect_ref_defect:
                # characterized oracle breakdown (PARITY.md §8): clip
                # consensi >254bp desync the v1.2.0 binary's co-iteration
                # (samtools-0.1.x qname truncation) — truth recall is the
                # parity channel in this regime, asserted below
                parity = "ref-defect-qname-truncation"
        else:
            exact = calls_equal = True
            parity = "unchecked"

    ours_rps = n / ours["total"]
    al = ours.pop("aligner", {})
    dispatch = ours.pop("dispatch", None)
    dev_s = (al.get("device_extend_s", 0.0)
             + al.get("device_finalize_s", 0.0))
    host_s = al.get("host_extend_s", 0.0)
    try:
        import jax
        platform = jax.devices()[0].platform
        device = str(jax.devices()[0])
    except Exception:
        platform = device = None
    result = {
        "metric": "scale_full_pipeline_reads_per_s",
        "value": round(ours_rps, 1), "unit": "reads/s",
        "n_records": n,
        "genome_mb": args.genome_mb, "coverage": args.coverage,
        "read_len": args.read_len, "stream": args.stream,
        "parity": parity, "truth_del_recall": truth_recall,
        "virus_junction_recall": virus_recall,
        "ref_truth_del_recall": ref_truth_recall,
        "ref_virus_junction_recall": ref_virus_recall,
        "virus": ({"kb": args.virus_kb, "events": args.virus_events,
                   "divergence": args.virus_divergence}
                  if args.virus_kb else None),
        "peak_rss_mb": round(resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1024, 1),
        "ours_stages_s": {k: round(v, 3) for k, v in ours.items()},
        "aligner_stages_s": al,
        "realign_device_fraction": round(
            dev_s / max(dev_s + host_s + al.get("seed_s", 0)
                        + al.get("finalize_s", 0), 1e-9), 4),
        # accelerator seconds as a fraction of TOTAL pipeline wall-clock
        # (the honest chip-contribution number VERDICT r2 asked for)
        "device_s_total": round(dev_s, 3),
        "device_fraction_total": round(dev_s / max(ours["total"], 1e-9), 4),
        "jax_platform": platform,
        "jax_device": device,
        "force_device_extend": args.force_device_extend,
        "force_host_extend": args.force_host_extend,
        "dispatch": dispatch,
        # per-trial wall clocks + spread (ADVICE r2 / VERDICT r3 weak #2:
        # best-of-N alone hid a 4x same-config swing)
        "trials": max(1, args.trials),
        "ours_totals_s": ours_totals,
        "ours_stddev_s": round(float(np.std(ours_totals)), 3),
    }
    if ref_stages is not None:
        ref_rps = n / ref_stages["total"]
        result["vs_baseline"] = round(ours_rps / ref_rps, 4)
        result["ref_stages_s"] = {k: round(v, 3)
                                  for k, v in ref_stages.items()}
        # both sides are best-of-N wall clocks (same trial count)
        result["ref_trials"] = max(1, args.trials)
        result["ref_totals_s"] = ref_totals
        result["ref_stddev_s"] = round(float(np.std(ref_totals)), 3)
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    if not (exact or calls_equal):
        if not args.expect_ref_defect:
            sys.exit(1)
        # defect regime: our output must still be RIGHT — full marks on
        # the embedded truth or the run fails
        if (truth_recall or 0) < 0.99 or (virus_recall is not None
                                          and virus_recall < 0.99):
            sys.exit(1)


if __name__ == "__main__":
    main()
