"""Generator constructor (SURVEY.md §2 L3, §4.2).

Latent z (+ optional class embedding, BASELINE config 4) -> dense to a
4x4xC seed -> repeated [upsample + conv block(s) + LocAtE attention] stages
-> to-RGB conv + tanh -> image in [-1, 1].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from locate_tpu.config import ModelConfig
from locate_tpu.nn.core import maybe_remat, sequential
from locate_tpu.nn.blocks import generator_stage, to_rgb
from locate_tpu.ops import initializers
from locate_tpu.ops.activations import make_act
from locate_tpu.ops.conv import conv2d, dense, upsample_nearest
from locate_tpu.ops.norm import make_norm


@dataclasses.dataclass(frozen=True)
class Generator:
    """Explicit-pytree generator: `init(key) -> params`,
    `apply(params, z[, labels]) -> images` (NHWC in [-1, 1]).

    Style-family extras (None/0 for the locate family): `apply_mixed`
    (per-layer style-mixing forward, models/style_generator.py) and
    `num_ws` (its styled-layer count — the crossover index space)."""

    config: ModelConfig
    init: Callable[[jax.Array], Any]
    apply: Callable[..., jax.Array]
    apply_mixed: Optional[Callable[..., jax.Array]] = None
    num_ws: int = 0

    def __call__(self, params, z, labels=None):
        return self.apply(params, z, labels)


def build_generator(
    cfg: ModelConfig, compute_dtype: Optional[jnp.dtype] = None
) -> Generator:
    """Dispatch on the generator family (`model.arch`): "locate" is the
    reference's conv+attention stack below; "style" is the mapping-network
    + modulated-conv family (models/style_generator.py). Single dispatch
    point — every builder (train step, export, PL twin) routes through
    here, so both families inherit the full subsystem surface."""
    if cfg.arch == "style":
        from locate_tpu.models.style_generator import build_style_generator

        return build_style_generator(cfg, compute_dtype)
    chans = cfg.stage_channels()
    resolutions = cfg.stage_resolutions()
    in_dim = cfg.latent_dim + (cfg.class_embed_dim if cfg.num_classes else 0)

    seed = dense(in_dim, 4 * 4 * chans[0], compute_dtype=compute_dtype)
    stages = [
        generator_stage(
            chans[max(i - 1, 0)],
            chans[i],
            resolutions[i],
            cfg,
            first=(i == 0),
            compute_dtype=compute_dtype,
        )
        for i in range(len(chans))
    ]
    if cfg.remat:
        stages = [maybe_remat(s) for s in stages]
    trunk = sequential(*stages)
    skip_rgb = cfg.g_rgb == "skip"

    def _rgb_head(ch):
        """Per-stage linear RGB head for the skip topology (StyleGAN2
        §4.1 / MSG-GAN): [norm + act + 1x1], NO tanh — contributions are
        summed across stages (tanh fires once, on the sum). Same op
        chain as the "last" head minus the nonlinearity, so a skip
        generator whose earlier heads are zero IS the "last" generator
        (pinned by tests/test_skip_rgb.py)."""
        return sequential(
            make_norm(cfg.norm, ch, cfg.group_norm_groups,
                      compute_dtype=compute_dtype),
            make_act(cfg.act, cfg.leaky_slope),
            conv2d(ch, cfg.img_channels, (1, 1),
                   weight_init=lambda k, s: initializers.normal(
                       k, s, stddev=0.02),
                   compute_dtype=compute_dtype),
        )

    if skip_rgb:
        rgb_heads = [_rgb_head(c) for c in chans]
        up2 = upsample_nearest(2)
    else:
        head = sequential(
            make_norm(cfg.norm, chans[-1], cfg.group_norm_groups, compute_dtype=compute_dtype),
            make_act(cfg.act, cfg.leaky_slope),
            to_rgb(chans[-1], cfg.img_channels, compute_dtype=compute_dtype),
        )

    def init(key):
        k_embed, k_seed, k_trunk, k_head = jax.random.split(key, 4)
        params = {
            "seed": seed.init(k_seed),
            "trunk": trunk.init(k_trunk),
        }
        if skip_rgb:
            hkeys = jax.random.split(k_head, len(rgb_heads))
            params["rgb"] = [h.init(k) for h, k in zip(rgb_heads, hkeys)]
        else:
            params["head"] = head.init(k_head)
        if cfg.num_classes:
            params["class_embed"] = initializers.normal(
                k_embed, (cfg.num_classes, cfg.class_embed_dim), stddev=0.02
            )
        return params

    def apply(params, z, labels=None):
        cd = compute_dtype or z.dtype
        z = z.astype(cd)
        if cfg.num_classes:
            if labels is None:
                raise ValueError("class-conditional generator needs labels")
            emb = params["class_embed"].astype(cd)[labels]
            z = jnp.concatenate([z, emb], axis=-1)
        x = seed.apply(params["seed"], z)
        x = x.reshape(z.shape[0], 4, 4, chans[0])
        if skip_rgb:
            # running image: each stage adds its linear RGB view to the
            # 2x-upsampled sum so far — every resolution gets a direct
            # gradient path from the output (StyleGAN2 §4.1). Accumulate
            # in fp32 (many small bf16 adds would lose the low bits).
            rgb = None
            for st, hd, p_st, p_hd in zip(stages, rgb_heads,
                                          params["trunk"], params["rgb"]):
                x = st.apply(p_st, x)
                y = hd.apply(p_hd, x).astype(jnp.float32)
                rgb = y if rgb is None else up2.apply((), rgb) + y
            return jnp.tanh(rgb).astype(cd)
        x = trunk.apply(params["trunk"], x)
        return head.apply(params["head"], x)

    return Generator(config=cfg, init=init, apply=apply)
