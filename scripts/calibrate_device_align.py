"""Calibrate the fully device-resident realignment front-end
(ops/align_device.py, `run --device-align`) against the host front-end —
VERDICT r2 item 9: the mode was opt-in and never engaged in any
committed artifact; this measures when it wins so the engine can
auto-enable it.

Measured on the attached chip:
  1. index upload cost — the one-time HBM residency price (keys +
     positions + reference), measured directly for the example-scale
     index and via a controlled bulk-transfer bandwidth probe for the
     extrapolation to big references (1.6 GB at 100 Mbp);
  2. per-chunk alignment wall: DeviceAligner.align_jobs vs the host
     front-end (batch seeding + native extension) on identical read
     batches;
  3. the break-even chunk count: setup_s / (host_per_chunk -
     device_per_chunk) when the device wins per chunk, else "never".

Output: seeksv_tpu/align/device_align_calibration.json (committed
artifact; `--device-align auto` consults it).

Usage: python scripts/calibrate_device_align.py [--out PATH]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNKS = [256, 1024, 4096]
READ_LEN = 60


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "seeksv_tpu", "align", "device_align_calibration.json"))
    ap.add_argument("--bw-probe-mb", type=int, default=64)
    args = ap.parse_args()

    import jax

    platform = jax.devices()[0].platform
    dev = str(jax.devices()[0])

    from seeksv_tpu.align.engine import BatchAligner
    from seeksv_tpu.ops.align_device import DeviceAligner

    # reference index: the bundled example (small enough to upload
    # through a tunnel; per-chunk throughput is index-size independent —
    # seeding is a bounded binary search, extension windows are local)
    fa = "/root/reference/example/reference/example.fa"
    host_al = BatchAligner.from_fasta(fa)

    # 1a. measured upload: device_put of the index arrays + sync
    t0 = time.perf_counter()
    for a in (host_al.idx.keys, host_al.idx.positions, host_al.idx.ref):
        np.asarray(jax.device_put(np.asarray(a)))[:1]
    small_upload_s = time.perf_counter() - t0
    idx_bytes = int(host_al.idx.keys.nbytes + host_al.idx.positions.nbytes
                    + host_al.idx.ref.nbytes)

    # 1b. bulk bandwidth probe (sync via host read — block_until_ready is
    # a no-op on the tunneled platform, ROOFLINE.md)
    blob = np.ones((args.bw_probe_mb << 20) // 4, np.float32)
    t0 = time.perf_counter()
    x = jax.device_put(blob)
    np.asarray(x)[:1]
    bw_probe_s = time.perf_counter() - t0
    upload_mb_s = args.bw_probe_mb / bw_probe_s

    # 2. per-chunk wall: device front-end vs host front-end
    rng = np.random.default_rng(0)
    ref_codes = np.asarray(host_al.idx.ref)
    rows = []
    dev_al = DeviceAligner(host_al.idx)
    for B in CHUNKS:
        starts = rng.integers(0, len(ref_codes) - READ_LEN, B)
        reads = [np.asarray(ref_codes[s:s + READ_LEN], np.uint8).copy()
                 for s in starts]
        # sprinkle mismatches so extension does work
        for r in reads:
            m = rng.random(len(r)) < 0.02
            r[m] = (r[m] + 1) % 4
        seqs = [bytes(b"ACGT"[c] for c in r) for r in reads]

        t0 = time.perf_counter()
        dev_al.align_jobs([np.asarray(r) for r in reads])
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = dev_al.align_jobs([np.asarray(r) for r in reads])
        device_s = time.perf_counter() - t0

        host_al2 = BatchAligner.from_fasta(fa)
        t0 = time.perf_counter()
        host_al2.batch_align(seqs)
        host_s = time.perf_counter() - t0
        rows.append({"chunk_reads": B,
                     "device_s": round(device_s, 5),
                     "device_warmup_s": round(warm, 5),
                     "host_s": round(host_s, 5),
                     "device_wins_per_chunk": device_s < host_s,
                     "overflowed": out is None})
        print(json.dumps(rows[-1]), file=sys.stderr)

    # 3. break-even
    best = min(rows, key=lambda r: r["device_s"] / max(r["host_s"], 1e-9))
    if best["device_s"] < best["host_s"]:
        be_chunks = small_upload_s / (best["host_s"] - best["device_s"])
        break_even = {"chunks": round(be_chunks, 1),
                      "at_chunk_reads": best["chunk_reads"]}
    else:
        break_even = "never-at-measured-sizes"

    out = {
        "platform": platform, "device": dev,
        "index_bytes_example": idx_bytes,
        "index_upload_s_example": round(small_upload_s, 4),
        "bulk_upload_mb_s": round(upload_mb_s, 2),
        "upload_s_per_gb_extrapolated": round(1024 / upload_mb_s, 2),
        "rows": rows,
        "break_even": break_even,
        "note": ("per-chunk throughput is index-size independent; the "
                 "one-time upload for a 100 Mbp index (~1.7 GB) "
                 "extrapolates from bulk_upload_mb_s"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"break_even": break_even,
                      "bulk_upload_mb_s": out["bulk_upload_mb_s"],
                      "out": args.out}))


if __name__ == "__main__":
    main()
