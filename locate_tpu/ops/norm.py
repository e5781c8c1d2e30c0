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


def minibatch_stddev(x: jax.Array, group_size: int,
                     eps: float = 1e-8) -> jax.Array:
    """Minibatch standard deviation (ProGAN arXiv 1710.10196 §3 / StyleGAN2):
    per group of `group_size` consecutive batch examples, the stddev of every
    (spatial, channel) activation across the group, averaged into ONE scalar
    per group and broadcast back to its members. Returns (N, 1) float32.

    The one batch-coupled statistic this framework ships (every norm is
    per-sample by design — see module docstring): it hands the discriminator
    a direct measure of sample diversity, the classic mode-collapse
    counterweight. SURVEY.md's reference has no analogue (beyond-reference
    capability, PARITY.md).

    Sharding semantics: groups are consecutive GLOBAL batch indices. Under
    GSPMD the global program is the definition; under the explicit
    shard_map backend each replica sees a contiguous batch shard, so local
    computation equals the global one exactly when `group_size` divides the
    per-replica batch (validated by the trace-time check below — shapes are
    static). Groups never straddle replicas, so no collective is needed and
    DP == single-device holds bitwise in fp32.
    """
    n = x.shape[0]
    g = min(group_size, n)
    if n % g:
        raise ValueError(
            f"minibatch_stddev: batch {n} not divisible by group {g} "
            "(pick mbstd_group dividing the per-replica batch)"
        )
    y = x.astype(jnp.float32).reshape(n // g, g, -1)
    # Biased (1/g) variance, as in the ProGAN/StyleGAN implementations.
    sd = jnp.sqrt(y.var(axis=1) + eps)        # (n//g, H*W*C)
    s = sd.mean(axis=1)                       # (n//g,)
    return jnp.repeat(s, g)[:, None]          # (N, 1)


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
