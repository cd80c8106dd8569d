"""Benchmark: BAM reads/s/chip through the full getclip + realign + getsv
pipeline on the reference example data, with output parity asserted.

Baseline (BASELINE.md): the reference binaries do getclip (0.032 s) +
getsv (0.058 s) for 16,730 records on one CPU core ~= 1.86e5 reads/s
through the pipeline (realignment excluded there because bwa is a separate
process; it is INCLUDED in our timing, which is conservative in our favor's
opposite direction).

Prints exactly one JSON line.
"""
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EXAMPLE = "/root/reference/example"
BASELINE_READS_PER_S = 16730 / (0.032 + 0.058)


def run_pipeline(tmpdir: str):
    from seeksv_tpu.io.bam import read_bam
    from seeksv_tpu.pipeline.driver import realign_clips
    from seeksv_tpu.pipeline.getclip import getclip
    from seeksv_tpu.pipeline.getsv import getsv

    t0 = time.time()
    recs = read_bam(f"{EXAMPLE}/cancer.sort.bam")
    prefix = os.path.join(tmpdir, "cancer")
    getclip(f"{EXAMPLE}/cancer.sort.bam", prefix, recs=recs)
    sam_path = os.path.join(tmpdir, "cancer.clip.sam")
    realign_clips(f"{EXAMPLE}/reference/example.fa", f"{prefix}.clip.fq.gz",
                  sam_path)
    sv_path = os.path.join(tmpdir, "cancer.sv")
    getsv(sam_path, f"{EXAMPLE}/cancer.sort.bam", f"{prefix}.clip.gz",
          sv_path, os.path.join(tmpdir, "r.fq"), filtered_out=io.StringIO(),
          recs=recs)
    dt = time.time() - t0
    with open(sv_path, "rb") as f, open(f"{EXAMPLE}/cancer.sv", "rb") as g:
        assert f.read() == g.read(), "parity violation in bench run"
    return recs.n, dt


def _ensure_responsive_backend(timeout_s: float = 45.0) -> dict:
    """The tunneled TPU backend can wedge mid-session (a dispatch never
    returns; observed 2026-08-21: even a 1k matmul roundtrip hangs).  Probe
    the default backend in a SUBPROCESS with a hard timeout — the parent
    must not import jax first, or the wedged backend gets cached — and pin
    this process to the CPU backend when the probe fails, so the bench
    measures the host path instead of hanging forever.

    Returns provenance for the emitted JSON — {pinned_cpu, probe[,
    probe_error]} — so a host-path number is distinguishable from a chip
    number downstream (ADVICE r2)."""
    import subprocess
    if os.environ.get("JAX_PLATFORMS"):
        return {"pinned_cpu": os.environ["JAX_PLATFORMS"] == "cpu",
                "probe": "preset-env"}
    probe_error = None
    for attempt in range(2):  # one retry: first-touch backend init can
        try:                  # legitimately exceed the timeout once
            r = subprocess.run(
                [sys.executable, "-c",
                 # a bulk transfer, not a scalar ping: the wedge mode
                 # observed leaves the control path alive while MB-scale
                 # uploads hang
                 "import numpy, jax, jax.numpy as jnp;"
                 "x = jnp.asarray(numpy.ones((1024, 1024), numpy.float32));"
                 "numpy.asarray(x @ x)"],
                timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return {"pinned_cpu": False, "probe": "ok"}
            probe_error = (f"exit {r.returncode}: "
                           f"{r.stderr.decode(errors='replace')[-400:]}")
            break  # clean non-zero exit (import error, OOM) won't heal
        except subprocess.TimeoutExpired:
            probe_error = f"timeout >{timeout_s}s (attempt {attempt + 1})"
    print(f"# accelerator backend probe failed ({probe_error}); "
          f"pinning jax to cpu", file=sys.stderr)
    os.environ["JAX_PLATFORMS"] = "cpu"
    return {"pinned_cpu": True, "probe": "failed", "probe_error": probe_error}


def main():
    import tempfile

    backend_prov = _ensure_responsive_backend()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/seeksv_tpu_jax"))
    platform = device = None
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        platform = jax.devices()[0].platform
        device = str(jax.devices()[0])
    except Exception:
        pass

    with tempfile.TemporaryDirectory() as d:
        # warmup (jit compile, index + page cache)
        run_pipeline(d)
    best = None
    n = 0
    for _ in range(7):
        with tempfile.TemporaryDirectory() as d:
            n, dt = run_pipeline(d)
            best = dt if best is None else min(best, dt)
    value = n / best
    print(json.dumps({
        "metric": "bam_reads_per_s_chip_full_pipeline",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(value / BASELINE_READS_PER_S, 4),
        "jax_platform": platform,
        "jax_device": device,
        "backend_probe": backend_prov,
    }))


if __name__ == "__main__":
    main()
