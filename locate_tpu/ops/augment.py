"""On-device discriminator augmentation (StyleGAN2-ADA style; arXiv
2006.06676 "Training Generative Adversarial Networks with Limited Data").

Beyond-reference capability (the reference trains un-augmented; SURVEY.md
§1): D only ever sees `aug(x)` for both real and fake images, which
prevents D from memorizing a small dataset, and the augmentation
probability `p` can be adapted online from D's overfitting signal
(objectives in train/step.py).

TPU-first constraints shape the design:

  * everything runs INSIDE the jitted train step on (N,H,W,C) batches —
    no host-side per-image work, no dynamic shapes;
  * every op is branchless: each sample draws "apply?" ~ Bernoulli(p) per
    augmentation and blends with `where`, so the compiled program is
    identical for every p (p is a traced scalar — adapting it never
    recompiles);
  * every op is differentiable in x (gather, multiply, add, where), so
    the G step back-propagates through `D(aug(G(z)))` as ADA requires;
  * geometric ops (flip + integer wrap-around translation) compose into
    ONE gather instead of separate image-sized shuffles.

Ops (each applied independently with probability p, per sample):
  x-flip; 90° rotation (k uniform in {1,2,3}; square images — ADA's full
  pixel-blitting group); integer translation up to ±H/8 (wrap-around);
  brightness (x + b, b~N(0,0.2)); contrast about the per-sample mean
  (c = 2^N(0,0.5)); saturation about the per-pixel luma (RGB only,
  s = 2^N(0,1)); cutout (H/2 × W/2 box of zeros = mid-gray).

The opt-in "affine" category completes ADA's GENERAL GEOMETRIC group
(arXiv 2006.06676 App. B): isotropic scaling (2^N(0,0.2)), arbitrary
rotation (U(-π,π)), anisotropic scaling (2^N(0,0.2), area-preserving),
and fractional translation (N(0,0.125)·size) — composed into ONE
per-sample inverse affine and resolved by a single bilinear gather with
reflection padding (`affine_warp`). Documented deviation from ADA: plain
bilinear resampling instead of the paper's wavelet-filtered
(anti-aliased) resampling — the geometry matches, high-frequency
aliasing does not. Off the default `ops` so existing trajectories are
unchanged; enable via train.augment_ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CATEGORIES = ("geom", "affine", "color", "noise", "cutout")


def augment_pipeline(
    key: jax.Array, x: jax.Array, p,
    ops: tuple = ("geom", "color", "cutout"),
) -> jax.Array:
    """Apply the augmentation stack to a batch.

    `p` may be a Python float or a traced scalar (ADA adapts it without
    recompiling). p == 0 is the identity in value (the program still
    contains the blended ops); callers disable augmentation structurally
    by not calling this at all. `ops` selects op CATEGORIES (static —
    changes the compiled program), mirroring ADA's category switches:
    "geom" (flip/rot90/translate), "affine" (scale/rotate/aniso/frac-
    translate — see module docstring), "color" (brightness/contrast/
    saturation), "cutout". Key splits are fixed per op regardless of the
    subset (the affine keys fold off a disjoint stream), so a category's
    draws don't shift when another is toggled.
    """
    p = jnp.asarray(p, jnp.float32)
    ks = jax.random.split(key, 14)
    if "geom" in ops:
        x = _blit(ks, p, x)
    if "affine" in ops:
        x = _affine(jax.random.fold_in(key, 0xAFF1), p, x)
    if "color" in ops:
        x = _color(ks, p, x)
    if "noise" in ops:
        x = _noise(jax.random.fold_in(key, 0x4E6F69), p, x)
    if "cutout" in ops:
        x = _cutout(ks, p, x)
    return x


def affine_warp(x, scale, theta, aniso, tx, ty):
    """Per-sample affine resampling about the image center: the FORWARD
    model is p_out = R(theta) @ diag(scale*aniso, scale/aniso) @ p_src +
    (tx, ty) (pixels); each output pixel bilinearly samples the inverse-
    mapped source location, reflection-padded. All parameters are (N,)
    fp32; identity is (1, 0, 1, 0, 0) — and exact (the lerp weights
    collapse to the corner sample). Differentiable in `x` (the lerp is
    linear in the gathered values)."""
    n, h, w, _ = x.shape
    dtype = x.dtype
    sx = (scale * aniso)[:, None, None]
    sy = (scale / aniso)[:, None, None]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :] - cx
    px = xx - tx[:, None, None]
    py = yy - ty[:, None, None]
    cos = jnp.cos(theta)[:, None, None]
    sin = jnp.sin(theta)[:, None, None]
    # R(-theta) then the inverse scales
    src_x = (cos * px + sin * py) / sx + cx
    src_y = (-sin * px + cos * py) / sy + cy
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = (src_x - x0)[..., None]
    fy = (src_y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def ref(i, size):  # reflect-101-style: period 2*size-2 triangle wave
        if size == 1:
            return jnp.zeros_like(i)
        m = 2 * size - 2
        i = jnp.mod(i, m)
        return jnp.where(i >= size, m - i, i)

    bidx = jnp.arange(n)[:, None, None]

    def g(yi, xi):
        return x[bidx, ref(yi, h), ref(xi, w)].astype(jnp.float32)

    out = (
        g(y0, x0) * (1 - fy) * (1 - fx)
        + g(y0, x0 + 1) * (1 - fy) * fx
        + g(y0 + 1, x0) * fy * (1 - fx)
        + g(y0 + 1, x0 + 1) * fy * fx
    )
    return out.astype(dtype)


def _affine(key, p, x):
    n = x.shape[0]
    h, w = x.shape[1], x.shape[2]
    ks = jax.random.split(key, 9)
    one = jnp.ones((n,), jnp.float32)
    iso = jnp.where(
        jax.random.bernoulli(ks[0], p, (n,)),
        jnp.exp2(jax.random.normal(ks[1], (n,), jnp.float32) * 0.2), one,
    )
    theta = jnp.where(
        jax.random.bernoulli(ks[2], p, (n,)),
        jax.random.uniform(ks[3], (n,), jnp.float32, -jnp.pi, jnp.pi), 0.0,
    )
    aniso = jnp.where(
        jax.random.bernoulli(ks[4], p, (n,)),
        jnp.exp2(jax.random.normal(ks[5], (n,), jnp.float32) * 0.2), one,
    )
    t_on = jax.random.bernoulli(ks[6], p, (n,))
    tx = jnp.where(
        t_on, jax.random.normal(ks[7], (n,), jnp.float32) * 0.125 * w, 0.0
    )
    ty = jnp.where(
        t_on, jax.random.normal(ks[8], (n,), jnp.float32) * 0.125 * h, 0.0
    )
    return affine_warp(x, iso, theta, aniso, tx, ty)


def _blit(ks, p, x):
    n, h, w, _ = x.shape
    # ---- geometric: flip + rot90 + integer translation as ONE gather --
    # (ADA's pixel-blitting group). The dihedral part makes the source
    # index grids non-separable, so they are full (n, h, w) int32 maps —
    # a few MB at 128^2, amortized into the single gather.
    flip = jax.random.bernoulli(ks[0], p, (n,))
    t_apply = jax.random.bernoulli(ks[1], p, (n,))
    max_ty, max_tx = max(h // 8, 1), max(w // 8, 1)
    ty = jnp.where(
        t_apply, jax.random.randint(ks[2], (n,), -max_ty, max_ty + 1), 0
    )
    tx = jnp.where(
        t_apply, jax.random.randint(ks[3], (n,), -max_tx, max_tx + 1), 0
    )
    gy = (jnp.arange(h)[None, :, None] - ty[:, None, None]) % h  # (n,h,1)
    gx = (jnp.arange(w)[None, None, :] - tx[:, None, None]) % w  # (n,1,w)
    gx = jnp.where(flip[:, None, None], w - 1 - gx, gx)
    gy = jnp.broadcast_to(gy, (n, h, w))
    gx = jnp.broadcast_to(gx, (n, h, w))
    if h == w:  # rotations need square images (all presets are square)
        r_apply = jax.random.bernoulli(ks[12], p, (n,))
        rk = jnp.where(
            r_apply, jax.random.randint(ks[13], (n,), 1, 4), 0
        )[:, None, None]
        sy = jnp.select(
            [rk == 1, rk == 2, rk == 3],
            [gx, h - 1 - gy, w - 1 - gx], gy,
        )
        sx = jnp.select(
            [rk == 1, rk == 2, rk == 3],
            [h - 1 - gy, w - 1 - gx, gy], gx,
        )
        gy, gx = sy, sx
    return x[jnp.arange(n)[:, None, None], gy, gx]


def _color(ks, p, x):
    n, _, _, c = x.shape
    dtype = x.dtype

    # ---- color --------------------------------------------------------
    def blend(apply, aug):
        return jnp.where(apply[:, None, None, None], aug, x)

    b_apply = jax.random.bernoulli(ks[4], p, (n,))
    b = jax.random.normal(ks[5], (n, 1, 1, 1), jnp.float32) * 0.2
    x = blend(b_apply, x + b.astype(dtype))

    c_apply = jax.random.bernoulli(ks[6], p, (n,))
    cfac = jnp.exp2(
        jax.random.normal(ks[7], (n, 1, 1, 1), jnp.float32) * 0.5
    ).astype(dtype)
    # f32 accumulation: a bf16 reduction over H*W*C elements loses the
    # mean to rounding
    mean = x.astype(jnp.float32).mean(axis=(1, 2, 3), keepdims=True).astype(dtype)
    x = blend(c_apply, (x - mean) * cfac + mean)

    if c == 3:
        s_apply = jax.random.bernoulli(ks[8], p, (n,))
        sfac = jnp.exp2(
            jax.random.normal(ks[9], (n, 1, 1, 1), jnp.float32)
        ).astype(dtype)
        luma = (
            x * jnp.asarray([0.299, 0.587, 0.114], dtype)
        ).sum(-1, keepdims=True)
        x = blend(s_apply, (x - luma) * sfac + luma)
    return x


def _noise(key, p, x):
    """ADA's image-space corruption category (arXiv 2006.06676 App. B
    "noise"): additive per-pixel Gaussian noise whose per-sample std is
    half-normal, sigma = |N(0,1)| * 0.1 (images in [-1, 1]). Keys fold
    off a disjoint stream (like "affine"), so enabling this category
    never shifts the other categories' draws. Differentiable in x
    trivially (identity gradient on the image path)."""
    n = x.shape[0]
    k_a, k_s, k_n = jax.random.split(key, 3)
    apply = jax.random.bernoulli(k_a, p, (n,))
    sigma = jnp.abs(jax.random.normal(k_s, (n, 1, 1, 1), jnp.float32)) * 0.1
    noise = jax.random.normal(k_n, x.shape, jnp.float32) * sigma
    return jnp.where(apply[:, None, None, None], x + noise.astype(x.dtype),
                     x)


def _cutout(ks, p, x):
    n, h, w, _ = x.shape
    dtype = x.dtype
    # ---- cutout -------------------------------------------------------
    cut_apply = jax.random.bernoulli(ks[10], p, (n,))
    k_cy, k_cx = jax.random.split(ks[11])
    cy = jax.random.randint(k_cy, (n,), 0, h)
    cx = jax.random.randint(k_cx, (n,), 0, w)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    keep = (
        (jnp.abs(yy - cy[:, None, None]) >= h // 4)
        | (jnp.abs(xx - cx[:, None, None]) >= w // 4)
    )
    keep = keep | ~cut_apply[:, None, None]
    return x * keep[..., None].astype(dtype)
