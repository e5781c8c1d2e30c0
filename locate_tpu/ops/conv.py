"""Convolution & resampling layers.

All tensors are NHWC, weights HWIO — the layouts XLA:TPU tiles onto the MXU
without transposes. Compute runs in `compute_dtype` (bf16 on TPU) with fp32
MXU accumulation via `preferred_element_type`; params stay fp32.

Reference realization: factorized/inception-style convs + up/down-sampling
blocks (SURVEY.md §2 L2, §3 "Conv block factory"; provenance RECALL-med —
the reference mount was empty, see SURVEY.md §0).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from locate_tpu.nn.core import Layer
from locate_tpu.ops import initializers

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(
    in_ch: int,
    out_ch: int,
    kernel: Tuple[int, int] = (3, 3),
    stride: int = 1,
    padding: str = "SAME",
    use_bias: bool = True,
    weight_init=initializers.he_normal,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Layer:
    """Plain 2-D convolution layer."""

    def init(key):
        w = weight_init(key, (*kernel, in_ch, out_ch))
        params = {"w": w}
        if use_bias:
            params["b"] = jnp.zeros((out_ch,), jnp.float32)
        return params

    def apply(params, x):
        # bf16 in / bf16 out: the TPU MXU accumulates bf16 products in fp32
        # internally, so no explicit preferred_element_type is needed (and
        # a widened output dtype breaks conv's transpose rule under grad).
        cd = compute_dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(cd),
            params["w"].astype(cd),
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=_DIMSPEC,
        )
        if use_bias:
            y = y + params["b"].astype(cd)
        return y

    return Layer(init=init, apply=apply)


def factorized_conv2d(
    in_ch: int,
    out_ch: int,
    kernel_size: int = 3,
    use_bias: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Layer:
    """Factorized k*k conv as (1,k) then (k,1) — the reference's
    inception-style factorization (SURVEY.md §3, RECALL-med). Linear between
    the two halves; bias only on the second. Cuts the kernel FLOPs/params
    from k^2 to 2k while keeping the k*k receptive field.
    """
    row = conv2d(in_ch, out_ch, (1, kernel_size), use_bias=False, compute_dtype=compute_dtype)
    col = conv2d(out_ch, out_ch, (kernel_size, 1), use_bias=use_bias, compute_dtype=compute_dtype)

    def init(key):
        k1, k2 = jax.random.split(key)
        return {"row": row.init(k1), "col": col.init(k2)}

    def apply(params, x):
        return col.apply(params["col"], row.apply(params["row"], x))

    return Layer(init=init, apply=apply)


def dense(in_dim: int, out_dim: int, use_bias: bool = True,
          weight_init=initializers.he_normal,
          compute_dtype: Optional[jnp.dtype] = None) -> Layer:
    """Fully-connected layer on the trailing axis."""

    def init(key):
        w = weight_init(key, (in_dim, out_dim))
        params = {"w": w}
        if use_bias:
            params["b"] = jnp.zeros((out_dim,), jnp.float32)
        return params

    def apply(params, x):
        cd = compute_dtype or x.dtype
        y = jnp.dot(x.astype(cd), params["w"].astype(cd))
        if use_bias:
            y = y + params["b"].astype(cd)
        return y

    return Layer(init=init, apply=apply)


def upsample_nearest(factor: int = 2) -> Layer:
    """Nearest-neighbour 2x upsample via broadcast-reshape (no gather —
    lowers to a cheap layout change on TPU)."""

    def apply(params, x):
        n, h, w, c = x.shape
        x = jnp.broadcast_to(
            x[:, :, None, :, None, :], (n, h, factor, w, factor, c)
        )
        return x.reshape(n, h * factor, w * factor, c)

    return Layer(init=lambda key: (), apply=apply)


def downsample_avg(factor: int = 2) -> Layer:
    """Average-pool 2x downsample via reshape-mean (cheaper than
    reduce_window for exact factor-of-2 pooling)."""

    def apply(params, x):
        n, h, w, c = x.shape
        x = x.reshape(n, h // factor, factor, w // factor, factor, c)
        return x.mean(axis=(2, 4))

    return Layer(init=lambda key: (), apply=apply)


def global_avg_pool() -> Layer:
    def apply(params, x):
        return x.mean(axis=(1, 2))

    return Layer(init=lambda key: (), apply=apply)
