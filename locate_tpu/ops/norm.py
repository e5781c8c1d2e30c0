"""Stateless normalizations.

The rebuild avoids batch norm entirely: running statistics are mutable state
that breaks the pure-functional jitted train step and forces cross-replica
syncs under data parallelism. Group/pixel norm are per-sample, so the DP
train step needs no extra collectives (SURVEY.md §6 "sanitizers", §3.2).
Statistics are computed in fp32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from locate_tpu.nn.core import Layer


def effective_groups(channels: int, groups: int) -> int:
    """The group count group_norm actually uses: clipped to `channels` and
    reduced to the nearest divisor (shared with the fused stage kernel)."""
    groups_ = min(groups, channels)
    while channels % groups_ != 0:
        groups_ -= 1
    return groups_


def group_norm(channels: int, groups: int = 8, eps: float = 1e-5,
               compute_dtype: Optional[jnp.dtype] = None) -> Layer:
    """GroupNorm over (H, W, C//G) per group, learned per-channel scale/bias."""
    groups_ = effective_groups(channels, groups)

    def init(key):
        return {
            "scale": jnp.ones((channels,), jnp.float32),
            "bias": jnp.zeros((channels,), jnp.float32),
        }

    def apply(params, x):
        cd = compute_dtype or x.dtype
        n, h, w, c = x.shape
        xf = x.astype(jnp.float32).reshape(n, h, w, groups_, c // groups_)
        mean = xf.mean(axis=(1, 2, 4), keepdims=True)
        var = xf.var(axis=(1, 2, 4), keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + eps)
        xf = xf.reshape(n, h, w, c)
        y = xf * params["scale"] + params["bias"]
        return y.astype(cd)

    return Layer(init=init, apply=apply)


def pixel_norm(eps: float = 1e-8, compute_dtype: Optional[jnp.dtype] = None) -> Layer:
    """Normalize each spatial location to unit RMS over channels
    (parameter-free; the classic GAN generator norm)."""

    def apply(params, x):
        cd = compute_dtype or x.dtype
        xf = x.astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf / jnp.sqrt(ms + eps)
        return y.astype(cd)

    return Layer(init=lambda key: (), apply=apply)


def make_norm(kind: str, channels: int, groups: int = 8,
              compute_dtype: Optional[jnp.dtype] = None) -> Layer:
    if kind == "group":
        return group_norm(channels, groups, compute_dtype=compute_dtype)
    if kind == "pixel":
        return pixel_norm(compute_dtype=compute_dtype)
    if kind == "none":
        from locate_tpu.nn.core import identity

        return identity()
    raise ValueError(f"unknown norm {kind!r}")
