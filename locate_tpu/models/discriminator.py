"""Discriminator constructor (SURVEY.md §2 L3, §4.2).

Image (+ optional class) -> from-RGB -> repeated [conv block(s) + LocAtE
attention + downsample] stages mirroring the generator -> global pool ->
scalar logit. Class conditioning uses a projection head
(logit += <embed(y), features>), the standard conditional-GAN mechanism for
BASELINE config 4.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from locate_tpu.config import ModelConfig
from locate_tpu.nn.core import maybe_remat, sequential
from locate_tpu.nn.blocks import discriminator_stage, from_rgb
from locate_tpu.ops import initializers
from locate_tpu.ops.activations import make_act
from locate_tpu.ops.conv import dense, global_avg_pool
from locate_tpu.ops.norm import make_norm


@dataclasses.dataclass(frozen=True)
class Discriminator:
    """`init(key) -> params`, `apply(params, images[, labels]) -> logits (N,)`."""

    config: ModelConfig
    init: Callable[[jax.Array], Any]
    apply: Callable[..., jax.Array]

    def __call__(self, params, x, labels=None):
        return self.apply(params, x, labels)


def build_discriminator(
    cfg: ModelConfig, compute_dtype: Optional[jnp.dtype] = None
) -> Discriminator:
    chans = cfg.stage_channels()          # low-res -> high-res, as in G
    resolutions = cfg.stage_resolutions()
    n = len(chans)

    stem = from_rgb(cfg.img_channels, chans[n - 1], compute_dtype=compute_dtype)
    # Stages run high-res -> low-res; stage at resolutions[i] maps
    # chans[i] -> chans[max(i-1, 0)] and halves the resolution (except the
    # final 4x4 stage).
    stages = [
        discriminator_stage(
            chans[i],
            chans[max(i - 1, 0)],
            resolutions[i],
            cfg,
            last=(i == 0),
            compute_dtype=compute_dtype,
        )
        for i in range(n - 1, -1, -1)
    ]
    if cfg.remat:
        stages = [maybe_remat(s) for s in stages]
    trunk = sequential(*stages)
    neck = sequential(
        make_norm(cfg.norm, chans[0], cfg.group_norm_groups, compute_dtype=compute_dtype),
        make_act(cfg.act, cfg.leaky_slope),
        global_avg_pool(),
    )
    # Minibatch stddev (cfg.mbstd_group): the (N, 1) batch-diversity scalar
    # joins the pooled features at the logit head only — `feats` itself
    # stays per-sample so the projection head and the feature-matching /
    # return_features consumers keep per-example semantics.
    head = dense(chans[0] + (1 if cfg.mbstd_group else 0), 1,
                 compute_dtype=compute_dtype)

    def init(key):
        k_stem, k_trunk, k_neck, k_head, k_embed = jax.random.split(key, 5)
        params = {
            "stem": stem.init(k_stem),
            "trunk": trunk.init(k_trunk),
            "neck": neck.init(k_neck),
            "head": head.init(k_head),
        }
        if cfg.num_classes:
            # Zero-init projection: conditioning starts neutral.
            params["class_proj"] = initializers.zeros(
                k_embed, (cfg.num_classes, chans[0])
            )
        return params

    def apply(params, x, labels=None, return_features=False):
        if cfg.spectral_norm:
            # Stateless SN (ops/spectral.py): pure params transform, so the
            # fused Pallas stage path below consumes normalized weights
            # too, and XLA CSEs the repeated transform across the several
            # D applies inside one jitted train step.
            from locate_tpu.ops.spectral import spectral_normalize

            params = spectral_normalize(params, n_iters=cfg.sn_iters)
        cd = compute_dtype or x.dtype
        h = stem.apply(params["stem"], x.astype(cd))
        h = trunk.apply(params["trunk"], h)
        feats = neck.apply(params["neck"], h)  # (N, chans[0])
        head_in = feats
        if cfg.mbstd_group:
            from locate_tpu.ops.norm import minibatch_stddev

            # Stddev over the trunk's 4x4 output (the classic pre-head
            # placement), appended post-pool: the map is batch-constant
            # per group, so pooling it is the identity.
            mb = minibatch_stddev(h, cfg.mbstd_group)
            head_in = jnp.concatenate([feats, mb.astype(feats.dtype)], axis=-1)
        logit = head.apply(params["head"], head_in)[:, 0].astype(jnp.float32)
        if cfg.num_classes:
            if labels is None:
                raise ValueError("class-conditional discriminator needs labels")
            proj = params["class_proj"].astype(jnp.float32)[labels]
            logit = logit + jnp.sum(proj * feats.astype(jnp.float32), axis=-1)
        if return_features:
            # pooled pre-head features (N, chans[0]) — the feature-matching
            # loss target (arXiv 1606.03498 §3.1) and a cheap built-in
            # perceptual embedding
            return logit, feats
        return logit

    return Discriminator(config=cfg, init=init, apply=apply)
