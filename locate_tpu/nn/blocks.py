"""Block factories: the reference's public block-building API (SURVEY.md §2
L2, BASELINE "block factories"), rebuilt as pure-functional layers.

Per-stage structure (SURVEY.md §4.2): [conv block(s) + LocAtE attention +
resample]. The `conv block + attention + norm + act` group is the fusion
unit for the Pallas kernels (BASELINE: "fused ... in a single pass");
here it is expressed in plain XLA, which is the always-available fallback
and the test oracle for every fused kernel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from locate_tpu.config import ModelConfig
from locate_tpu.nn.core import Layer, sequential
from locate_tpu.ops import initializers
from locate_tpu.ops.activations import make_act
from locate_tpu.ops.attention import locate_attention
from locate_tpu.ops.conv import (
    conv2d,
    downsample_avg,
    factorized_conv2d,
    upsample_nearest,
)
from locate_tpu.ops.norm import make_norm


def _conv(in_ch, out_ch, cfg: ModelConfig, compute_dtype):
    if cfg.factorized and cfg.kernel_size > 1:
        return factorized_conv2d(in_ch, out_ch, cfg.kernel_size, compute_dtype=compute_dtype)
    return conv2d(in_ch, out_ch, (cfg.kernel_size, cfg.kernel_size), compute_dtype=compute_dtype)


def conv_block(
    in_ch: int,
    out_ch: int,
    cfg: ModelConfig,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Layer:
    """Pre-activation residual conv block:

        y = conv(act(norm(x))) + skip(x)

    with a 1x1 skip projection when channel counts differ. Residual form
    keeps deep stacks (BASELINE config 3) trainable without batch norm.
    """
    main = sequential(
        make_norm(cfg.norm, in_ch, cfg.group_norm_groups, compute_dtype=compute_dtype),
        make_act(cfg.act, cfg.leaky_slope),
        _conv(in_ch, out_ch, cfg, compute_dtype),
    )
    skip = (
        None
        if in_ch == out_ch
        else conv2d(in_ch, out_ch, (1, 1), use_bias=False, compute_dtype=compute_dtype)
    )

    def init(key):
        k1, k2 = jax.random.split(key)
        params = {"main": main.init(k1)}
        if skip is not None:
            params["skip"] = skip.init(k2)
        return params

    def apply(params, x):
        y = main.apply(params["main"], x)
        s = x if skip is None else skip.apply(params["skip"], x)
        return (y + s) * jnp.asarray(0.7071067811865476, y.dtype)

    return Layer(init=init, apply=apply)


def generator_stage(
    in_ch: int,
    out_ch: int,
    resolution: int,
    cfg: ModelConfig,
    first: bool,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Layer:
    """One generator resolution stage: [upsample] + conv blocks + attention
    (SURVEY.md §4.2). `resolution` is the stage's output resolution."""
    layers = []
    if not first:
        layers.append(upsample_nearest(2))
    layers.append(conv_block(in_ch, out_ch, cfg, compute_dtype))
    for _ in range(cfg.blocks_per_stage - 1):
        layers.append(conv_block(out_ch, out_ch, cfg, compute_dtype))
    if cfg.attention_at(resolution):
        layers.append(
            locate_attention(
                out_ch, cfg.attention, cfg.act, cfg.leaky_slope, compute_dtype,
                use_pallas=cfg.use_pallas,
            )
        )
    return sequential(*layers)


def discriminator_stage(
    in_ch: int,
    out_ch: int,
    resolution: int,
    cfg: ModelConfig,
    last: bool,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Layer:
    """One discriminator stage, mirroring the generator downward
    (SURVEY.md §4.2): conv blocks + attention + [downsample]. `resolution`
    is the stage's input resolution."""
    layers = [conv_block(in_ch, out_ch, cfg, compute_dtype)]
    for _ in range(cfg.blocks_per_stage - 1):
        layers.append(conv_block(out_ch, out_ch, cfg, compute_dtype))
    if cfg.attention_at(resolution):
        layers.append(
            locate_attention(
                out_ch, cfg.attention, cfg.act, cfg.leaky_slope, compute_dtype,
                use_pallas=cfg.use_pallas,
            )
        )
    if not last:
        layers.append(downsample_avg(2))
    return sequential(*layers)


def to_rgb(in_ch: int, img_channels: int, compute_dtype=None) -> Layer:
    """Feature map -> image in [-1, 1] (SURVEY.md §4.2 "to-RGB conv + tanh")."""
    conv = conv2d(
        in_ch, img_channels, (1, 1),
        weight_init=lambda k, s: initializers.normal(k, s, stddev=0.02),
        compute_dtype=compute_dtype,
    )

    def apply(params, x):
        return jnp.tanh(conv.apply(params, x).astype(jnp.float32)).astype(
            compute_dtype or x.dtype
        )

    return Layer(init=conv.init, apply=apply)


def from_rgb(img_channels: int, out_ch: int, compute_dtype=None) -> Layer:
    return conv2d(img_channels, out_ch, (1, 1), compute_dtype=compute_dtype)
