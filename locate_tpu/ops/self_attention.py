"""Full spatial self-attention block (`attention.kind="self"`).

The reference's namesake mechanism is *location-based* attention (linear in
H*W; ops/attention.py). Full O(N^2) token-token self-attention over the
spatial grid is the classic alternative for GANs — SAGAN (arXiv 1805.08318)
— and SURVEY.md §3.2/§6 documented it as the slot where blockwise/flash
tiling would enter if it were ever added. This module adds it as a config
option so the two attention families can be compared inside one framework.

Structure (SAGAN §3, with its standard refinements):

    q = conv1x1(x) : C -> dk        (dk = C / sa_qk_bottleneck; paper: C/8)
    k = conv1x1(x) : C -> dk
    v = conv1x1(x) : C -> dv        (dv = C / sa_v_bottleneck; paper v2: C/2)
    a = softmax_s(q_t . k_s * scale)            [scale = 1/sqrt(dk/heads)]
    o = conv1x1(a @ v) : dv -> C
    y = x + gamma * o               (gamma a zero-init scalar -> the block
                                     is the identity at init, same
                                     convention as the LocAtE block)

`scale`: SAGAN's paper used unscaled dot products; the 1/sqrt(d) scaling is
the modern default and is what we ship (`sa_scale=False` restores the
paper's form). Multi-head (`heads > 1`) splits dk/dv per head, standard
transformer-style.

All projections are 1x1 convs — pure per-location MXU matmuls. The
attention itself runs either as the XLA composition below (oracle +
fallback) or, under `use_pallas`, as the flash Pallas kernel
(ops/pallas/flash_attention.py) which never materializes the (T, T)
matrix — the gate here is MEMORY, not speed: XLA's composition allocates
O(T^2) score tensors (2 GB at 64^2/batch-64 bf16) while the kernel is
O(T), so the kernel is unconditionally used when use_pallas is on.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from locate_tpu.config import AttentionConfig
from locate_tpu.nn.core import Layer
from locate_tpu.ops.conv import conv2d


def _head_dims(channels: int, cfg: AttentionConfig) -> tuple[int, int]:
    """(dk, dv), each >= heads, rounded up to a multiple of 8*heads (full
    fp32 sublanes per head; large configs hit multiples of 128 naturally)."""
    unit = 8 * cfg.heads
    dk = max(unit, channels // cfg.sa_qk_bottleneck)
    dv = max(unit, channels // cfg.sa_v_bottleneck)
    dk = ((dk + unit - 1) // unit) * unit
    dv = ((dv + unit - 1) // unit) * unit
    return dk, dv


def _split_heads(x2d: jax.Array, heads: int) -> jax.Array:
    """(N, T, D) -> (N*heads, T, D/heads)."""
    if heads == 1:
        return x2d
    n, t, d = x2d.shape
    x = x2d.reshape(n, t, heads, d // heads)
    return x.transpose(0, 2, 1, 3).reshape(n * heads, t, d // heads)


def _merge_heads(x2d: jax.Array, heads: int) -> jax.Array:
    """(N*heads, T, Dh) -> (N, T, Dh*heads)."""
    if heads == 1:
        return x2d
    nh, t, dh = x2d.shape
    x = x2d.reshape(nh // heads, heads, t, dh)
    return x.transpose(0, 2, 1, 3).reshape(nh // heads, t, heads * dh)


def self_attention(
    channels: int,
    cfg: AttentionConfig,
    compute_dtype: Optional[jnp.dtype] = None,
    use_pallas: bool = False,
) -> Layer:
    """SAGAN-style self-attention block for (N, H, W, channels) maps."""
    dk, dv = _head_dims(channels, cfg)
    heads = cfg.heads
    to_q = conv2d(channels, dk, (1, 1), compute_dtype=compute_dtype)
    to_k = conv2d(channels, dk, (1, 1), compute_dtype=compute_dtype)
    to_v = conv2d(channels, dv, (1, 1), compute_dtype=compute_dtype)
    to_o = conv2d(dv, channels, (1, 1), compute_dtype=compute_dtype)
    scale = (dk // heads) ** -0.5 if cfg.sa_scale else 1.0

    def init(key):
        kq, kk, kv, ko = jax.random.split(key, 4)
        return {
            "q": to_q.init(kq),
            "k": to_k.init(kk),
            "v": to_v.init(kv),
            "o": to_o.init(ko),
            "gamma": jnp.zeros((), jnp.float32),
        }

    def attend(q2, k2, v2):
        if use_pallas:
            from locate_tpu.ops.pallas.flash_attention import flash_attention

            interpret = jax.default_backend() == "cpu"
            return flash_attention(q2, k2, v2, scale=scale,
                                   interpret=interpret)
        from locate_tpu.ops.pallas.flash_attention import attention_reference

        return attention_reference(q2, k2, v2, scale=scale)

    def apply(params, x):
        n, h, w, c = x.shape
        t = h * w
        cd = compute_dtype or x.dtype
        xc = x.astype(cd)
        q = _split_heads(to_q.apply(params["q"], xc).reshape(n, t, dk), heads)
        k = _split_heads(to_k.apply(params["k"], xc).reshape(n, t, dk), heads)
        v = _split_heads(to_v.apply(params["v"], xc).reshape(n, t, dv), heads)
        o2 = _merge_heads(attend(q, k, v), heads).reshape(n, h, w, dv)
        o = to_o.apply(params["o"], o2)
        return (
            x.astype(jnp.float32)
            + params["gamma"].astype(jnp.float32) * o.astype(jnp.float32)
        ).astype(x.dtype)

    return Layer(init=init, apply=apply)
