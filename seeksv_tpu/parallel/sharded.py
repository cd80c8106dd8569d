"""SPMD evidence-extraction step over a (dp, gp) device mesh.

This is the multi-chip formulation of the framework's per-batch work
(SURVEY.md §2 parallelism call-out):

  * reads are data-parallel over dp (and extension jobs over the flattened
    dp x gp axis),
  * per-shard coverage contributions are psum-reduced over dp and emerge
    sharded over gp along the genome axis (sequence parallelism over
    coordinates),
  * per-shard candidate-breakpoint tables are all-gathered and reduced by
    key on every device (the keyed global reduction that replaces the
    reference's multimap accumulation),
  * the insert-size model is a psum'd histogram.

All collectives ride the mesh (ICI within a host row, DCN across hosts);
no point-to-point patterns are needed — every reduction is keyed/global.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.jax_kernels import sw_extend_batch


def _evidence_step(batch: Dict[str, jnp.ndarray], genome_len: int,
                   n_gp: int):
    """Per-shard body (runs under shard_map)."""
    # --- coverage: segment scatter-add, psum over dp, shard over gp ---
    starts = batch["seg_start"]
    ends = batch["seg_end"]
    w = batch["seg_weight"]
    diff = jnp.zeros(genome_len + 1, jnp.int32)
    diff = diff.at[jnp.clip(starts, 0, genome_len)].add(w)
    diff = diff.at[jnp.clip(ends, 0, genome_len)].add(-w)
    cov = jnp.cumsum(diff)[:genome_len]
    cov = jax.lax.psum(cov, "dp")
    block = genome_len // n_gp
    gp_idx = jax.lax.axis_index("gp")
    cov_local = jax.lax.dynamic_slice(cov, (gp_idx * block,), (block,))

    # --- insert-size histogram: psum over the whole mesh ---
    hist = jnp.zeros(2048, jnp.int32)
    isize = jnp.clip(batch["isize"], 0, 2047)
    hist = hist.at[isize].add(jnp.asarray(batch["isize_ok"], jnp.int32))
    # reads are sharded over dp and replicated over gp: reduce over dp only
    hist = jax.lax.psum(hist, "dp")
    n = jnp.maximum(hist.sum(), 1)
    vals = jnp.arange(2048, dtype=jnp.int64)
    mean = (hist.astype(jnp.int64) * vals).sum() // n
    var = (hist.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
           * (vals - mean).astype(jnp.float32) ** 2).sum() / n
    dev = jnp.sqrt(var).astype(jnp.int32)

    # --- batched SW extension (jobs sharded over dp x gp) ---
    sw = sw_extend_batch(batch["q"], batch["qlen"], batch["t"],
                         batch["tlen"], batch["h0"])

    # --- candidate junction table: all-gather + keyed reduction ---
    keys = batch["cand_key"]          # [C] int64 packed (side|tid|pos)
    support = batch["cand_support"]   # [C] int32
    # candidates are dp-sharded / gp-replicated: gather over dp only
    all_keys = jax.lax.all_gather(keys, "dp", tiled=True)
    all_sup = jax.lax.all_gather(support, "dp", tiled=True)
    order = jnp.argsort(all_keys)
    sk = all_keys[order]
    sv = all_sup[order]
    # segment-sum support into the first slot of each equal-key run
    first = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    seg_id = jnp.cumsum(first) - 1
    seg_sum = jnp.zeros_like(sv).at[seg_id].add(sv)
    return {
        "coverage": cov_local,
        "insert_mean": mean[None],
        "insert_dev": dev[None],
        "sw": sw,
        "cand_sorted_keys": sk,
        "cand_first": first,
        "cand_support_sum": seg_sum,
    }


def sharded_evidence_step(mesh: Mesh, genome_len: int):
    """Returns a jitted SPMD step function for the given mesh."""
    n_gp = mesh.shape["gp"]
    body = functools.partial(_evidence_step, genome_len=genome_len,
                             n_gp=n_gp)
    in_specs = ({
        "seg_start": P("dp"), "seg_end": P("dp"), "seg_weight": P("dp"),
        "isize": P("dp"), "isize_ok": P("dp"),
        "q": P(("dp", "gp")), "qlen": P(("dp", "gp")),
        "t": P(("dp", "gp")), "tlen": P(("dp", "gp")), "h0": P(("dp", "gp")),
        "cand_key": P("dp"), "cand_support": P("dp"),
    },)
    out_specs = {
        "coverage": P("gp"),
        "insert_mean": P(None), "insert_dev": P(None),
        "sw": {k: P(("dp", "gp")) for k in
               ("max_score", "qle", "tle", "gscore", "gtle")},
        "cand_sorted_keys": P(None), "cand_first": P(None),
        "cand_support_sum": P(None),
    }
    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return jax.jit(fn)


def make_example_batch(mesh: Mesh, genome_len: int, n_reads: int = 64,
                       n_jobs: int = 32, lq: int = 32, lt: int = 64,
                       seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Tiny sharded inputs for compile checks / dryrun."""
    rng = np.random.default_rng(seed)
    dp = mesh.shape["dp"]
    gp = mesh.shape["gp"]
    n_reads = max(n_reads, dp) // dp * dp
    n_jobs = max(n_jobs, dp * gp) // (dp * gp) * (dp * gp)
    starts = rng.integers(0, max(genome_len - 100, 1), n_reads).astype(np.int32)
    batch = {
        "seg_start": starts,
        "seg_end": (starts + rng.integers(50, 100, n_reads)).astype(np.int32),
        "seg_weight": np.ones(n_reads, np.int32),
        "isize": rng.integers(400, 600, n_reads).astype(np.int32),
        "isize_ok": np.ones(n_reads, bool),
        "q": rng.integers(0, 4, (n_jobs, lq)).astype(np.int32),
        "qlen": np.full(n_jobs, lq, np.int32),
        "t": rng.integers(0, 4, (n_jobs, lt)).astype(np.int32),
        "tlen": np.full(n_jobs, lt, np.int32),
        "h0": np.full(n_jobs, 19, np.int32),
        "cand_key": rng.integers(0, 1 << 20, n_reads).astype(np.int64),
        "cand_support": np.ones(n_reads, np.int32),
    }
    specs = {
        "seg_start": P("dp"), "seg_end": P("dp"), "seg_weight": P("dp"),
        "isize": P("dp"), "isize_ok": P("dp"),
        "q": P(("dp", "gp")), "qlen": P(("dp", "gp")),
        "t": P(("dp", "gp")), "tlen": P(("dp", "gp")), "h0": P(("dp", "gp")),
        "cand_key": P("dp"), "cand_support": P("dp"),
    }
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in batch.items()}
