"""Micro-bench: partitioned MergeJunction executes >1 partition
concurrently (VERDICT r2 item 6).

Builds a large synthetic junction table (many independent partitions),
then runs:
  * the sequential pipeline.getsv.merge_junction,
  * parallel.spmd_pipeline.merge_junction_sharded at workers=1 and N,
with the per-partition replay instrumented to record (thread, start, end)
windows.  Prints one JSON line: wall clocks, partition count, and the
maximum number of partitions whose replay windows overlap in time.
Exactness is re-asserted against the sequential result.

Usage: python scripts/bench_merge.py [--junctions 40000] [--workers 4]
"""
import argparse
import copy
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seeksv_tpu.pipeline.getsv import JunctionMap, merge_junction  # noqa: E402
from seeksv_tpu.pipeline.junctions import OtherInfo, SeqInfo  # noqa: E402
from seeksv_tpu.parallel import spmd_pipeline as sp  # noqa: E402


def build_jmap(rng, n_clusters, per_cluster):
    jmap = JunctionMap()
    base = 1000
    for c in range(n_clusters):
        up0 = base + c * 500  # gaps > search_length split partitions
        dn0 = up0 + 3000
        seq = rng.integers(65, 69, 120).astype(np.uint8).tobytes()
        for r in range(per_cluster):
            mh = int(rng.integers(0, 30))
            u = seq[mh:60 + mh]
            d = seq[60 + mh:110 + mh]
            up = SeqInfo(u, [(len(u), "M")], 0, 0,
                         int(rng.integers(1, 6)), int(rng.integers(0, 3)))
            down = SeqInfo(d, [(len(d), "M")], 0, 0,
                           int(rng.integers(1, 6)), int(rng.integers(0, 3)))
            jmap.insert(("chr1", up0 + mh, "+", "chr1", dn0 + mh, "+"),
                        OtherInfo(up, down, -1, 0))
    return jmap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--junctions", type=int, default=40000)
    ap.add_argument("--per-cluster", type=int, default=8)
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n_clusters = max(1, args.junctions // args.per_cluster)
    jmap = build_jmap(rng, n_clusters, args.per_cluster)

    seq_ref = copy.deepcopy(jmap)
    t0 = time.perf_counter()
    merge_junction(seq_ref, 50)
    t_seq = time.perf_counter() - t0

    j1 = copy.deepcopy(jmap)
    t0 = time.perf_counter()
    sp.merge_junction_sharded(j1, 50, max_workers=1)
    t_w1 = time.perf_counter() - t0

    # instrument the replay to observe concurrency
    windows = []
    lock = threading.Lock()
    orig = sp._merge_partition_gated

    def instrumented(items, lo, hi, search_length, gates):
        s = time.perf_counter()
        out = orig(items, lo, hi, search_length, gates)
        e = time.perf_counter()
        with lock:
            windows.append((threading.get_ident(), s, e))
        return out

    sp._merge_partition_gated = instrumented
    try:
        jN = copy.deepcopy(jmap)
        t0 = time.perf_counter()
        nparts = sp.merge_junction_sharded(jN, 50, max_workers=args.workers)
        t_wN = time.perf_counter() - t0
    finally:
        sp._merge_partition_gated = orig

    # max simultaneous replay windows (sweep-line over start/end events)
    events = sorted([(s, 1) for _t, s, _e in windows]
                    + [(e, -1) for _t, _s, e in windows])
    cur = peak = 0
    for _x, d in events:
        cur += d
        peak = max(peak, cur)
    threads_used = len({t for t, _s, _e in windows})

    for a, b in ((seq_ref, j1), (seq_ref, jN)):
        assert len(a.items) == len(b.items)
        for (ja, oa), (jb, ob) in zip(a.items, b.items):
            assert ja == jb and oa == ob

    print(json.dumps({
        "metric": "merge_junction_partition_concurrency",
        "n_junctions": args.junctions, "n_partitions": nparts,
        "sequential_s": round(t_seq, 3),
        "sharded_1worker_s": round(t_w1, 3),
        f"sharded_{args.workers}worker_s": round(t_wN, 3),
        "max_concurrent_partitions": peak,
        "replay_threads_used": threads_used,
        "exact": True,
    }))


if __name__ == "__main__":
    main()
