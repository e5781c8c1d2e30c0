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
from locate_tpu.ops.self_attention import self_attention
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


# ---------------------------------------------------------------------------
# fused stage-group path (BASELINE: "conv + attention + norm + activation
# ... in a single pass"; ops/pallas/fused_stage.py)
# ---------------------------------------------------------------------------

# Measured never-slower gate (VERDICT r2 task 4; chained microbench table
# in docs/DESIGN.md): the stage-group kernel beats XLA only in the
# huge-spatial HBM-bound regime (1.33-1.40x at 512^2) and is parity-to-
# slightly-slower below (0.86-1.01 at 64^2-256^2, where XLA's conv is
# MXU-bound and already optimal). The per-flavor thresholds live in
# ops/pallas/gate_profile.json (VERDICT r3 #5 — data, not code; re-tune
# on real hardware with scripts/retune_gates.py). The checked-in default
# fuses every flavor only at >= 512^2 locations — exactly where BASELINE
# config 5 prescribes "fused attention-conv Pallas blocks"; below, the
# stage keeps XLA convs + the standalone fused attention kernel
# (1.2-1.5x, round 1). Setting FUSE_MIN_LOCATIONS to an int overrides
# the profile for EVERY flavor (tests pin the gate this way).
FUSE_MIN_LOCATIONS = None


def _fuse_threshold(flavor: str) -> int:
    if FUSE_MIN_LOCATIONS is not None:
        return FUSE_MIN_LOCATIONS
    from locate_tpu.ops.pallas import gate_profile

    return gate_profile.min_locations(flavor)


def stage_fusable(cfg: ModelConfig) -> bool:
    """Whether the Pallas stage-group kernel implements this config's conv
    block: factorized 3x3, group norm, one of the kernel's activations."""
    return (
        cfg.use_pallas
        and cfg.factorized
        and cfg.kernel_size == 3
        and cfg.norm == "group"
        and cfg.act in ("leaky_relu", "relu", "silu", "gelu")
    )


def _apply_fused_stage(cfg: ModelConfig, in_ch, out_ch, compute_dtype,
                       conv_params, attn_params, x, upsample=False,
                       downsample=False):
    """Unpack the (unfused-layout) params and call the fused kernel.
    `attn_params=None` -> conv block only. With `upsample`, `x` is the
    pre-upsample coarse tensor and the kernel fuses the nearest-2x in
    (the expanded tensor never exists in HBM); with `downsample` the
    discriminator stage's trailing 2x2 avg-pool fuses into the output
    write (the fine post-gate tensor never exists in HBM)."""
    import jax as _jax

    from locate_tpu.ops.attention import coord_features
    from locate_tpu.ops.norm import effective_groups
    from locate_tpu.ops.pallas.fused_stage import fused_stage

    norm_p, _, conv_p = conv_params["main"]
    cd = compute_dtype or x.dtype
    kw = dict(
        gn_scale=norm_p["scale"],
        gn_bias=norm_p["bias"],
        w_row=conv_p["row"]["w"],
        w_col=conv_p["col"]["w"],
        b_col=conv_p["col"]["b"],
        w_skip=conv_params["skip"]["w"] if in_ch != out_ch else None,
        groups=effective_groups(in_ch, cfg.group_norm_groups),
        act=cfg.act,
        leaky_slope=cfg.leaky_slope,
        interpret=_jax.default_backend() == "cpu",
        upsample=upsample,
        downsample=downsample,
    )
    if attn_params is not None:
        acfg = cfg.attention
        w1 = attn_params["to_hidden"]["w"][0, 0]       # (Co+P, Hd)
        w1x, w1p = w1[:out_ch], w1[out_ch:]
        _, h, w, _ = x.shape
        if upsample:
            h, w = 2 * h, 2 * w  # pos features live at the FINE resolution
        if acfg.pos_features:
            pos = coord_features(h, w, acfg.pos_features, jnp.float32)
            pos_proj = pos.reshape(h * w, acfg.pos_features) @ w1p.astype(
                jnp.float32
            )
        else:
            pos_proj = None
        kw.update(
            mode=acfg.mode,
            pos_proj=pos_proj,
            w1x=w1x,
            b1=attn_params["to_hidden"]["b"],
            w2=attn_params["to_logits"]["w"][0, 0],
            b2=attn_params["to_logits"]["b"],
            gate_max=acfg.gate_max,
        )
    return fused_stage(x.astype(cd), **kw)


def _maybe_fused_stage(layers, kinds, cfg: ModelConfig, compute_dtype) -> Layer:
    """Stage layer: same init/pytree as `sequential(*layers)` (the CLAUDE.md
    invariant — use_pallas changes apply paths only), but the apply runs
    each conv block — and the final conv-block+attention pair — through the
    fused stage kernel when the config and shape are eligible."""
    seq = sequential(*layers)
    if not stage_fusable(cfg):
        return seq

    def apply(params, x):
        i = 0
        while i < len(layers):
            kind = kinds[i]
            # at >= FUSE_MIN_LOCATIONS every flavor fuses: the
            # conv+attention PAIR (one kernel incl. the gate), bare conv
            # blocks (mode=None; round-3 hand-written backward tips it
            # to 1.21x fwd+bwd at 512^2, docs/DESIGN.md), and — round 3
            # — the generator's upsample+conv[+attn] stage head
            # (`upsample=True`: the 2x-expanded tensor, the largest in
            # the network, never exists in HBM). Below the gate
            # everything stays on XLA convs + standalone fused attention.
            up = kind[0] == "up" and i + 1 < len(layers) and kinds[i + 1][0] == "conv"
            if up:
                i += 1  # the candidate conv block; x stays coarse
                kind = kinds[i]
            hs, ws = x.shape[1], x.shape[2]
            if up:
                hs, ws = 2 * hs, 2 * ws  # fused output is at FINE res
            locs = hs * ws
            pair_ok = (
                kind[0] == "conv"
                and i + 1 < len(layers)
                and kinds[i + 1][0] == "attn"
                and cfg.attention.residual
            )
            if pair_ok:
                dn = (not up) and i + 2 < len(layers) and kinds[i + 2][0] == "down"
                flavor = "up_pair" if up else ("down_pair" if dn else "pair")
                pair_ok = locs >= _fuse_threshold(flavor)
            if pair_ok:
                _, cin, cout = kind
                x = _apply_fused_stage(
                    cfg, cin, cout, compute_dtype, params[i], params[i + 1],
                    x, upsample=up, downsample=dn,
                )
                i += 3 if dn else 2
            elif kind[0] == "conv" and locs >= _fuse_threshold(
                "up_conv" if up else (
                    "down_conv"
                    if (not up) and i + 1 < len(layers)
                    and kinds[i + 1][0] == "down"
                    else "conv"
                )
            ):
                _, cin, cout = kind
                dn = (not up) and i + 1 < len(layers) and kinds[i + 1][0] == "down"
                x = _apply_fused_stage(
                    cfg, cin, cout, compute_dtype, params[i], None, x,
                    upsample=up, downsample=dn,
                )
                i += 2 if dn else 1
            else:
                if up:
                    i -= 1  # not eligible: run the upsample layer itself
                x = layers[i].apply(params[i], x)
                i += 1
        return x

    return Layer(init=seq.init, apply=apply)


def _attention_layer(cfg: ModelConfig, out_ch: int, compute_dtype):
    """Attention block for a stage, by family (AttentionConfig.kind):
    "locate" (the reference's gate) or "self" (SAGAN, flash kernel under
    use_pallas). Returns (layer, kind_tag); the "sattn" tag keeps the
    fused-stage pairing logic (which implements only the locate gate) from
    claiming a self-attention block."""
    if cfg.attention.kind == "self":
        layer = self_attention(
            out_ch, cfg.attention, compute_dtype, use_pallas=cfg.use_pallas
        )
        return layer, ("sattn",)
    layer = locate_attention(
        out_ch, cfg.attention, cfg.act, cfg.leaky_slope, compute_dtype,
        use_pallas=cfg.use_pallas,
    )
    return layer, ("attn",)


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
    layers, kinds = [], []
    if not first:
        layers.append(upsample_nearest(2))
        kinds.append(("up",))  # fusable into the following conv block
    layers.append(conv_block(in_ch, out_ch, cfg, compute_dtype))
    kinds.append(("conv", in_ch, out_ch))
    for _ in range(cfg.blocks_per_stage - 1):
        layers.append(conv_block(out_ch, out_ch, cfg, compute_dtype))
        kinds.append(("conv", out_ch, out_ch))
    if cfg.attention_at(resolution):
        layer, tag = _attention_layer(cfg, out_ch, compute_dtype)
        layers.append(layer)
        kinds.append(tag)
    return _maybe_fused_stage(layers, kinds, cfg, compute_dtype)


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
    kinds = [("conv", in_ch, out_ch)]
    for _ in range(cfg.blocks_per_stage - 1):
        layers.append(conv_block(out_ch, out_ch, cfg, compute_dtype))
        kinds.append(("conv", out_ch, out_ch))
    if cfg.attention_at(resolution):
        layer, tag = _attention_layer(cfg, out_ch, compute_dtype)
        layers.append(layer)
        kinds.append(tag)
    if not last:
        layers.append(downsample_avg(2))
        kinds.append(("down",))  # fusable into the preceding conv/attn
    return _maybe_fused_stage(layers, kinds, cfg, compute_dtype)


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
