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

Training-time stochasticity (round-3 additions, both OFF by default so the
plain family keeps its pure `apply`):
  * per-layer STYLE MIXING (`style.mixing_prob`, StyleGAN arXiv 1812.04948
    §3.1): `apply_mixed(params, z1, z2, cut, labels)` runs synthesis with
    per-layer w — layers below each sample's crossover `cut` take w(z1),
    the rest w(z2). The train step draws z2/cut with the latent
    global-draw discipline (mesh-invariant); sampling/eval keep the
    single-w apply.
  * per-layer NOISE INJECTION (`style.noise`, StyleGAN §3.2): each
    synthesis conv adds `noise_strength * noise` before its activation
    (strength a learned scalar, init 0 — the enabled model starts exactly
    at the disabled one). "const" uses a fixed per-layer plane (pure
    apply preserved); "random" draws fresh per-sample noise when the
    caller passes `noise_rng` (the train step) and falls back to the
    const plane otherwise (StyleGAN's noise_mode="const" eval
    convention).
W-space truncation is provided for sampling (`apply_truncated` /
`w_average`; CLI `sample --truncation-psi`).
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


def modulated_conv2d_init(key, w_dim, cin, cout, kernel, w_std=1.0,
                          noise=False):
    """`w_std` scales the N(0,1) equalized init — 1.0 everywhere except the
    tanh to-RGB head, which must start near-linear (saturated tanh at init
    kills early gradients; mirrors nn/blocks.to_rgb's 0.02-stddev init).
    `noise` adds the learned noise-injection strength scalar (init 0:
    identity at init; no extra key draws, so enabling noise never shifts
    the other parameters' init streams)."""
    ka, kw_ = jax.random.split(key)
    p = {
        "affine": eq_dense_init(ka, w_dim, cin, bias_init=1.0),
        "w": w_std
        * jax.random.normal(kw_, (kernel, kernel, cin, cout), jnp.float32),
        "b": jnp.zeros((cout,), jnp.float32),
    }
    if noise:
        p["noise_strength"] = jnp.zeros((), jnp.float32)
    return p


def _const_noise_plane(li: int, h: int, w: int) -> jax.Array:
    """The fixed per-layer noise plane for "const" mode (and the eval-time
    fallback of "random" mode): a function of the layer index only — a
    compile-time constant under jit, identical across calls/hosts/meshes.
    Built lazily so importing the module never initializes a backend."""
    key = jax.random.fold_in(jax.random.PRNGKey(0x4E4F4953), li)
    return jax.random.normal(key, (h, w, 1), jnp.float32)


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
    (params, w [, noise_rng]) -> images, "num_ws"}. `build_style_generator`
    composes them into the standard contract; w-space tools (truncation)
    use them directly. `synthesis` takes w as (N, D) — one style for all
    layers — or (N, num_ws, D) — per-layer styles, the style-mixing form
    (layer order: stage-major conv order, to-RGB last)."""
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

    # Styled-layer count and order (the style-mixing index space).
    # g_rgb="last" (default): stage-major conv order, ONE to-RGB last.
    # g_rgb="skip" (StyleGAN2's actual default config, §4.1): every stage
    # ends with its OWN styled to-RGB whose contribution is summed with
    # the 2x-upsampled running image; layer order is network-depth order
    # — stage i's convs then stage i's to-RGB — so a mixing crossover
    # splits the to-RGBs consistently with the convs around them.
    noise_on = scfg.noise != "none"
    skip_rgb = cfg.g_rgb == "skip"
    bps = cfg.blocks_per_stage
    if skip_rgb:
        num_ws = len(chans) * (bps + 1)

        def li_conv(i, j):
            return i * (bps + 1) + j

        def li_rgb(i):
            return i * (bps + 1) + bps
    else:
        num_ws = len(chans) * bps + 1

        def li_conv(i, j):
            return i * bps + j

        def li_rgb(i):
            return num_ws - 1

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
                    noise=noise_on,
                )
                for j in range(cfg.blocks_per_stage)
            ]
            stage = {"convs": convs}
            if i in attn_layers:
                stage["attn"] = attn_layers[i].init(bkeys[-1])
            stages.append(stage)
        if skip_rgb:
            rkeys = jax.random.split(keys[4], len(chans))
            rgb = [
                modulated_conv2d_init(rkeys[i], w_dim, chans[i],
                                      cfg.img_channels, 1, w_std=0.05)
                for i in range(len(chans))
            ]
        else:
            rgb = modulated_conv2d_init(keys[4], w_dim, chans[-1],
                                        cfg.img_channels, 1, w_std=0.05)
        return {
            "mapping": mapping,
            "const": jax.random.normal(keys[3], (4, 4, chans[0]), jnp.float32),
            "stages": stages,
            "rgb": rgb,
        }

    def w_at(wlat, li):
        """The style for global layer index `li`: (N, D) wlat is shared by
        all layers; (N, num_ws, D) is the per-layer (mixed) form."""
        return wlat if wlat.ndim == 2 else wlat[:, li]

    def stage_apply(stage_params, x, wlat, kn, i):
        """One synthesis stage. `kn`: per-stage noise key (None for const/
        no-noise — static, part of the traced signature)."""
        if i > 0:
            n, h, w, c = x.shape
            x = jnp.broadcast_to(
                x[:, :, None, :, None, :], (n, h, 2, w, 2, c)
            ).reshape(n, 2 * h, 2 * w, c)
        for j, conv_p in enumerate(stage_params["convs"]):
            li = li_conv(i, j)
            y = modulated_conv2d(conv_p, x, w_at(wlat, li),
                                 demodulate=scfg.demodulate)
            if noise_on:
                n_, h_, w_, _ = y.shape
                if kn is not None:  # "random": fresh per-sample planes
                    nz = jax.random.normal(
                        jax.random.fold_in(kn, j), (n_, h_, w_, 1),
                        jnp.float32,
                    )
                else:  # "const" (and "random"'s eval fallback)
                    nz = _const_noise_plane(li, h_, w_)[None]
                y = y + (conv_p["noise_strength"] * nz).astype(y.dtype)
            x = act_fn(y)
        if i in attn_layers:
            x = attn_layers[i].apply(stage_params["attn"], x)
        return x

    def mapping(params, z, labels=None):
        return mapping_apply(params["mapping"], z, cfg, act_fn, labels)

    def synthesis(params, wlat, dtype=None, noise_rng=None):
        cd = compute_dtype or dtype or jnp.float32
        n = wlat.shape[0]
        x = jnp.broadcast_to(
            params["const"].astype(cd)[None], (n, 4, 4, chans[0])
        )
        rand_noise = scfg.noise == "random" and noise_rng is not None
        body = stage_apply
        if cfg.remat:
            body = jax.checkpoint(stage_apply, static_argnums=(4,))
        rgb = None
        for i, sp in enumerate(params["stages"]):
            kn = jax.random.fold_in(noise_rng, i) if rand_noise else None
            x = body(sp, x, wlat, kn, i)
            if skip_rgb:
                # per-stage styled to-RGB summed with the upsampled
                # running image (StyleGAN2 §4.1 skip config); accumulate
                # in fp32 — many small bf16 adds would lose the low bits.
                y = modulated_conv2d(params["rgb"][i], x,
                                     w_at(wlat, li_rgb(i)),
                                     demodulate=False).astype(jnp.float32)
                if rgb is None:
                    rgb = y
                else:
                    n_, h_, w_, c_ = rgb.shape
                    rgb = jnp.broadcast_to(
                        rgb[:, :, None, :, None, :], (n_, h_, 2, w_, 2, c_)
                    ).reshape(n_, 2 * h_, 2 * w_, c_) + y
        if skip_rgb:
            return jnp.tanh(rgb).astype(cd)
        # Styled to-RGB (1x1, no demod — StyleGAN2 §B; no noise, also §B)
        # + the framework's tanh range contract ([-1, 1], fp32 tail like
        # nn/blocks.to_rgb).
        y = modulated_conv2d(params["rgb"], x, w_at(wlat, num_ws - 1),
                             demodulate=False)
        return jnp.tanh(y.astype(jnp.float32)).astype(cd)

    return {"init": init, "mapping": mapping, "synthesis": synthesis,
            "num_ws": num_ws}


def build_style_generator(
    cfg: ModelConfig, compute_dtype: Optional[jnp.dtype] = None
) -> Generator:
    """Style-family generator under the standard `Generator` contract,
    plus the family's training-time extensions:

      apply(params, z, labels=None, *, noise_rng=None)
        — noise_rng only matters for style.noise="random" (fresh noise);
          without it the const plane is used, keeping sampling/eval/export
          deterministic.
      apply_mixed(params, z1, z2, cut, labels=None, *, noise_rng=None)
        — style-mixing forward: `cut` is (N,) int32 in [0, num_ws]; layer
          l takes w(z1) if l < cut_i else w(z2) (cut == num_ws: pure z1).
    """
    fns = make_style_fns(cfg, compute_dtype)
    num_ws = fns["num_ws"]

    def apply(params, z, labels=None, *, noise_rng=None):
        wlat = fns["mapping"](params, z, labels)
        return fns["synthesis"](params, wlat, dtype=z.dtype,
                                noise_rng=noise_rng)

    def apply_mixed(params, z1, z2, cut, labels=None, *, noise_rng=None):
        w1 = fns["mapping"](params, z1, labels)
        w2 = fns["mapping"](params, z2, labels)
        take1 = (jnp.arange(num_ws)[None, :] < cut[:, None])[..., None]
        ws = jnp.where(take1, w1[:, None, :], w2[:, None, :])
        return fns["synthesis"](params, ws, dtype=z1.dtype,
                                noise_rng=noise_rng)

    return Generator(config=cfg, init=fns["init"], apply=apply,
                     apply_mixed=apply_mixed, num_ws=num_ws)


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
