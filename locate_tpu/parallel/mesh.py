"""Device mesh construction (SURVEY.md §3.2/§3.3).

The reference had no distributed layer (single-GPU eager PyTorch). The
rebuild's "communication backend" is declarative: a `jax.sharding.Mesh`
with a `data` axis (required: DP with psum grad reduction over ICI) and a
`model` axis slot (tensor-parallel channel sharding for later scale). XLA
compiles the collectives; there is no user-managed transport.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from locate_tpu.config import ParallelConfig


def make_mesh(cfg: ParallelConfig, devices=None) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices.

    `data_parallel == -1` consumes all devices not used by `model_parallel`.
    Device order follows `jax.devices()`, which already enumerates a TPU
    slice in ICI-neighbour order, so the data axis rides ICI rings.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    if n % mp:
        raise ValueError(f"{n} devices not divisible by model_parallel={mp}")
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(
            f"mesh {dp}x{mp} != {n} devices (data_parallel={cfg.data_parallel})"
        )
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def single_device_mesh(cfg: Optional[ParallelConfig] = None) -> Mesh:
    cfg = cfg or ParallelConfig()
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (cfg.data_axis, cfg.model_axis))
