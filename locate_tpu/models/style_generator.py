"""Style-based generator family (`model.arch="style"`).

Beyond-reference capability (the reference's only family is the plain
conv+attention stack, SURVEY.md §4.2): a StyleGAN2-flavored generator
(arXiv 1912.04958 §2) — mapping network z -> w, learned constant input,
and weight-(de)modulated synthesis convolutions — exposed through the SAME
`Generator` contract (`init(key) -> params`, `apply(params, z[, labels])`)
so every downstream subsystem (train step, EMA, checkpointing, export,
sampling, projection, path-length reg) works unchanged. The discriminator
is shared between families.

TPU-first formulation of modulated conv: instead of materializing
per-sample weights (N, k, k, Cin, Cout) and running a grouped conv (the
paper's implementation — hostile to the MXU and to XLA's conv tiling), we
use the mathematically IDENTICAL input-scale / output-demodulate form:

    conv(x * s, W) == conv(x, W * s)          (s scales input channels)
    demod_o = rsqrt(sum_{k,k,i} (W_{kki,o} s_i)^2 + eps)   (per sample)

so the conv itself is ONE ordinary batched NHWC/HWIO convolution with a
shared weight — XLA tiles it onto the MXU exactly like any other conv and
fuses the two elementwise scales into its input/output. The equality with
the per-sample-weight form is pinned by a literal PyTorch grouped-conv twin
(tests/test_style.py).

Deliberate v1 simplifications (documented, not silent):
  * one w per sample shared by all layers (no per-layer style mixing);
  * no per-pixel noise injection — `apply` stays a pure function of
    (params, z, labels), which the whole framework's determinism story
    (bitwise resume, DP==single-device trajectory tests) relies on.
Each would be an additive change (extra apply kwargs), none removes
capability elsewhere. W-space truncation IS provided for sampling
(`apply_truncated` / `w_average`; CLI `sample --truncation-psi`).
Rationale: docs/DESIGN.md "Style family".
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from locate_tpu.config import ModelConfig
from locate_tpu.models.generator import Generator
from locate_tpu.nn.blocks import _attention_layer
from locate_tpu.ops import initializers
from locate_tpu.ops.activations import make_act

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# equalized-LR primitives (StyleGAN signature: N(0,1) init, the He/lr scale
# applied at runtime so Adam's per-parameter step size is uniform)
# ---------------------------------------------------------------------------


def eq_dense_init(key, in_dim, out_dim, lr_mul=1.0, bias_init=0.0):
    kw, _ = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (in_dim, out_dim), jnp.float32) / lr_mul,
        "b": jnp.full((out_dim,), float(bias_init), jnp.float32),
    }


def eq_dense_apply(params, x, lr_mul=1.0):
    in_dim = params["w"].shape[0]
    scale = lr_mul / float(np.sqrt(in_dim))
    return x @ (params["w"] * scale).astype(x.dtype) + (
        params["b"] * lr_mul
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# modulated convolution
# ---------------------------------------------------------------------------


def modulated_conv2d(params, x, wlat, demodulate=True, eps=1e-8):
    """One styled conv: NHWC `x`, per-sample style from latent `wlat`.

    params: {"affine": {w, b}, "w": (k, k, Cin, Cout), "b": (Cout,)}.
    The affine's bias initializes to 1 so styles start at identity.
    Style/demod math runs in fp32 (tiny next to the conv); the conv runs in
    x.dtype (bf16 on TPU) like every other conv in the framework.
    """
    cd = x.dtype
    kh, kw, cin, cout = params["w"].shape
    he = 1.0 / float(np.sqrt(kh * kw * cin))
    s = eq_dense_apply(params["affine"], wlat.astype(jnp.float32))  # (N, Cin)
    y = jax.lax.conv_general_dilated(
        x * s.astype(cd)[:, None, None, :],
        (params["w"] * he).astype(cd),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_DIMSPEC,
    )
    if demodulate:
        wmat = (params["w"].astype(jnp.float32) * he) ** 2
        wsq = wmat.sum(axis=(0, 1))  # (Cin, Cout)
        d = jax.lax.rsqrt((s**2) @ wsq + eps)  # (N, Cout)
        y = y * d.astype(cd)[:, None, None, :]
    return y + params["b"].astype(cd)


def modulated_conv2d_init(key, w_dim, cin, cout, kernel, w_std=1.0):
    """`w_std` scales the N(0,1) equalized init — 1.0 everywhere except the
    tanh to-RGB head, which must start near-linear (saturated tanh at init
    kills early gradients; mirrors nn/blocks.to_rgb's 0.02-stddev init)."""
    ka, kw_ = jax.random.split(key)
    return {
        "affine": eq_dense_init(ka, w_dim, cin, bias_init=1.0),
        "w": w_std
        * jax.random.normal(kw_, (kernel, kernel, cin, cout), jnp.float32),
        "b": jnp.zeros((cout,), jnp.float32),
    }


# ---------------------------------------------------------------------------
# mapping network
# ---------------------------------------------------------------------------


def mapping_apply(params, z, cfg: ModelConfig, act_fn, labels=None):
    """pixel-norm(z) [++ pixel-norm(embed(label))] -> L x [dense + act] -> w.

    Runs in fp32 throughout — the mapping is a few tiny matmuls and w
    conditions every synthesis layer, so full precision is free insurance.
    """
    lr_mul = cfg.style.mapping_lr_mul
    x = z.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + 1e-8)
    if cfg.num_classes:
        if labels is None:
            raise ValueError("class-conditional generator needs labels")
        e = params["class_embed"][labels].astype(jnp.float32)
        e = e * jax.lax.rsqrt(jnp.mean(e**2, axis=-1, keepdims=True) + 1e-8)
        x = jnp.concatenate([x, e], axis=-1)
    for layer in params["layers"]:
        x = act_fn(eq_dense_apply(layer, x, lr_mul=lr_mul))
    return x


# ---------------------------------------------------------------------------
# the generator
# ---------------------------------------------------------------------------


def make_style_fns(
    cfg: ModelConfig, compute_dtype: Optional[jnp.dtype] = None
) -> dict:
    """The family's building blocks as separate pure functions:
    {"init", "mapping" (params, z, labels) -> w, "synthesis"
    (params, w) -> images}. `build_style_generator` composes them into
    the standard contract; w-space tools (truncation) use them directly."""
    scfg = cfg.style
    w_dim = scfg.w_dim or cfg.latent_dim
    chans = cfg.stage_channels()
    resolutions = cfg.stage_resolutions()
    act = make_act(cfg.act, cfg.leaky_slope)
    # Variance-preserving gain after the activation (StyleGAN2 convention;
    # leaky_relu(0.2) halves E[x^2] for zero-mean inputs).
    gain = float(np.sqrt(2.0))
    act_fn = lambda x: act.apply((), x) * jnp.asarray(gain, x.dtype)
    map_in = cfg.latent_dim + (cfg.class_embed_dim if cfg.num_classes else 0)

    # Attention layers reuse the shared block factories (both families can
    # interleave LocAtE / self attention — AttentionConfig decides).
    attn_layers = {
        i: _attention_layer(cfg, chans[i], compute_dtype)[0]
        for i in range(len(chans))
        if cfg.attention_at(resolutions[i])
    }

    def init(key):
        keys = jax.random.split(key, 6)
        dims = [map_in] + [w_dim] * scfg.mapping_layers
        mkeys = jax.random.split(keys[0], scfg.mapping_layers)
        mapping = {
            "layers": [
                eq_dense_init(mkeys[i], dims[i], dims[i + 1],
                              lr_mul=scfg.mapping_lr_mul)
                for i in range(scfg.mapping_layers)
            ]
        }
        if cfg.num_classes:
            mapping["class_embed"] = initializers.normal(
                keys[1], (cfg.num_classes, cfg.class_embed_dim), stddev=0.02
            )
        stages = []
        skeys = jax.random.split(keys[2], len(chans))
        for i in range(len(chans)):
            cin = chans[max(i - 1, 0)]
            cout = chans[i]
            bkeys = jax.random.split(skeys[i], cfg.blocks_per_stage + 1)
            convs = [
                modulated_conv2d_init(
                    bkeys[j],
                    w_dim,
                    cin if j == 0 else cout,
                    cout,
                    cfg.kernel_size,
                )
                for j in range(cfg.blocks_per_stage)
            ]
            stage = {"convs": convs}
            if i in attn_layers:
                stage["attn"] = attn_layers[i].init(bkeys[-1])
            stages.append(stage)
        return {
            "mapping": mapping,
            "const": jax.random.normal(keys[3], (4, 4, chans[0]), jnp.float32),
            "stages": stages,
            "rgb": modulated_conv2d_init(keys[4], w_dim, chans[-1],
                                         cfg.img_channels, 1, w_std=0.05),
        }

    def stage_apply(stage_params, x, wlat, i):
        if i > 0:
            n, h, w, c = x.shape
            x = jnp.broadcast_to(
                x[:, :, None, :, None, :], (n, h, 2, w, 2, c)
            ).reshape(n, 2 * h, 2 * w, c)
        for conv_p in stage_params["convs"]:
            x = act_fn(modulated_conv2d(conv_p, x, wlat,
                                        demodulate=scfg.demodulate))
        if i in attn_layers:
            x = attn_layers[i].apply(stage_params["attn"], x)
        return x

    def mapping(params, z, labels=None):
        return mapping_apply(params["mapping"], z, cfg, act_fn, labels)

    def synthesis(params, wlat, dtype=None):
        cd = compute_dtype or dtype or jnp.float32
        n = wlat.shape[0]
        x = jnp.broadcast_to(
            params["const"].astype(cd)[None], (n, 4, 4, chans[0])
        )
        body = stage_apply
        if cfg.remat:
            body = jax.checkpoint(stage_apply, static_argnums=(3,))
        for i, sp in enumerate(params["stages"]):
            x = body(sp, x, wlat, i)
        # Styled to-RGB (1x1, no demod — StyleGAN2 §B) + the framework's
        # tanh range contract ([-1, 1], fp32 tail like nn/blocks.to_rgb).
        y = modulated_conv2d(params["rgb"], x, wlat, demodulate=False)
        return jnp.tanh(y.astype(jnp.float32)).astype(cd)

    return {"init": init, "mapping": mapping, "synthesis": synthesis}


def build_style_generator(
    cfg: ModelConfig, compute_dtype: Optional[jnp.dtype] = None
) -> Generator:
    """Style-family generator under the standard `Generator` contract."""
    fns = make_style_fns(cfg, compute_dtype)

    def apply(params, z, labels=None):
        wlat = fns["mapping"](params, z, labels)
        return fns["synthesis"](params, wlat, dtype=z.dtype)

    return Generator(config=cfg, init=fns["init"], apply=apply)


def w_average(
    cfg: ModelConfig,
    params,
    key: jax.Array,
    n: int = 4096,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Estimate the mapping's mean w over `n` latent draws (the truncation
    center; StyleGAN tracks a running mean during training — estimating it
    at sample time is equivalent for a fixed checkpoint and keeps the
    train state family-agnostic). The mapping is a tiny MLP: 4096 draws
    cost ~nothing next to one synthesis pass."""
    fns = make_style_fns(cfg, compute_dtype)
    z = jax.random.normal(key, (n, cfg.latent_dim), jnp.float32)
    labels = None
    if cfg.num_classes:
        labels = jax.random.randint(
            jax.random.fold_in(key, 1), (n,), 0, cfg.num_classes
        )
    return jnp.mean(fns["mapping"](params, z, labels), axis=0)


def apply_truncated(
    cfg: ModelConfig,
    params,
    z: jax.Array,
    labels=None,
    *,
    psi: float = 0.7,
    w_avg: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """W-SPACE truncation (StyleGAN arXiv 1812.04948 §3.1, the family's
    native quality/diversity knob): w' = w_avg + psi * (w - w_avg).
    psi=1 is the untruncated distribution; psi=0 collapses to the mean
    image. Pass a precomputed `w_avg` (e.g. from `w_average`) or a `key`
    to estimate it on the fly."""
    if w_avg is None:
        if key is None:
            raise ValueError("apply_truncated needs w_avg or a key")
        w_avg = w_average(cfg, params, key, compute_dtype=compute_dtype)
    fns = make_style_fns(cfg, compute_dtype)
    wlat = fns["mapping"](params, z, labels)
    wlat = w_avg + psi * (wlat - w_avg)
    return fns["synthesis"](params, wlat, dtype=z.dtype)
