"""Device mesh construction.

The reference is single-threaded (SURVEY.md §2 call-out: no parallelism of
any kind); scaling here is designed TPU-first as a 2D mesh:

  dp — data parallelism over reads (per-read clip extraction is
       embarrassingly parallel; the reference's per-chromosome flush
       proves the required independence, clip_reads.h:423-438)
  gp — genome-coordinate parallelism (coverage / junction tables sharded
       by position range with 50bp + max-insert-size halos; all merge steps
       interact only within those windows, SURVEY.md §5)
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if dp is None:
        # squarest dp x gp split
        dp = 1
        for d in range(int(np.sqrt(n)), 0, -1):
            if n % d == 0:
                dp = max(d, n // d)
                break
    gp = n // dp
    return Mesh(np.asarray(devs).reshape(dp, gp), ("dp", "gp"))
