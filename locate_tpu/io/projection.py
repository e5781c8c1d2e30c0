"""Latent-space projection (GAN inversion): find z such that G(z) matches a
target image. The standard editing/debugging companion to a trained GAN
(projector in StyleGAN2, arXiv 1912.04958 appendix D — re-designed here
without external perceptual networks, which this offline environment
cannot vendor).

TPU-first shape: the WHOLE optimization — `steps` Adam updates on z, each
a generator forward+backward — compiles to ONE `lax.scan` dispatch, so
inversion of a batch of images is a single device program (no per-step
host round trips).

Loss: multi-scale MSE pyramid (full res + 2x + 4x downsampled) — the
coarse scales give the long-range signal an external perceptual net would
otherwise provide — plus an optional Gaussian-prior pull on z
(`prior_weight * mean(z^2)`) that keeps the recovered latent on-shell so
the (EMA) generator stays in-distribution around it.

For the style family the projector also works in the intermediate spaces
(`space="w"` / `"w+"`): optimize w (or per-layer w+) directly, initialized
at `w_average` with the prior pulling back toward it — the StyleGAN2
projector convention, which is what makes REAL images (not on the
generator's z-manifold) invertible in practice.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from locate_tpu.models.gan import GAN
from locate_tpu.ops.conv import downsample_avg


def _pyramid_mse(a: jax.Array, b: jax.Array, levels: int = 3) -> jax.Array:
    down = downsample_avg(2)
    loss = jnp.mean((a - b) ** 2)
    for _ in range(levels - 1):
        if a.shape[1] <= 4:
            break
        a = down.apply((), a)
        b = down.apply((), b)
        loss = loss + jnp.mean((a - b) ** 2)
    return loss


def project(
    gan: GAN,
    g_params,
    targets: np.ndarray,
    *,
    labels=None,
    steps: int = 400,
    lr: float = 0.05,
    prior_weight: float = 1e-3,
    init: str = "random",
    space: str = "z",
    key: Optional[jax.Array] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Invert `targets` (fp32 NHWC in [-1, 1]) through the generator.

    `space` selects the latent space being optimized:
      * "z"  — the input latent (any family): (N, latent_dim).
      * "w"  — style family only (StyleGAN2 projector, arXiv 1912.04958
        App. D): one intermediate latent per image, (N, w_dim), initialized
        at `w_average` and pulled back toward it by `prior_weight` — the
        mapping network is bypassed, which is what makes real (non-GAN)
        images invertible in practice.
      * "w+" — per-layer styles (N, num_ws, w_dim) (arXiv 1904.03189):
        the editing-grade extended space; strictly more expressive, less
        regularized.

    Returns (latents, loss_history) as host arrays. Labels are required
    for class-conditional models (they condition, they are not optimized;
    in w spaces they enter the (bypassed) mapping only through w_avg).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if space not in ("z", "w", "w+"):
        raise ValueError(f"space must be z/w/w+, got {space!r}")
    n = targets.shape[0]
    x = jnp.asarray(targets, jnp.float32)
    if labels is not None:
        labels = jnp.asarray(labels)
    if space == "z":
        if init == "zero":
            z0 = jnp.zeros((n, gan.config.latent_dim), jnp.float32)
        else:
            z0 = gan.sample_latents(key, n)

        def fwd(v):
            return gan.generator.apply(g_params, v, labels)

        def prior(v):
            return jnp.mean(v * v)
    else:
        if gan.config.arch != "style":
            raise ValueError(
                f"space={space!r} projection needs model.arch='style' "
                f"(got {gan.config.arch!r})"
            )
        from locate_tpu.models.style_generator import (
            make_style_fns, w_average,
        )

        fns = make_style_fns(gan.config)
        w_avg = w_average(gan.config, g_params, jax.random.fold_in(key, 1))
        if space == "w":
            z0 = jnp.broadcast_to(w_avg[None], (n, w_avg.shape[0]))
        else:
            z0 = jnp.broadcast_to(
                w_avg[None, None], (n, fns["num_ws"], w_avg.shape[0])
            )
        z0 = jnp.asarray(z0, jnp.float32)

        def fwd(v):
            return fns["synthesis"](g_params, v, dtype=jnp.float32)

        def prior(v):
            return jnp.mean((v - w_avg) ** 2)

    opt = optax.adam(lr)

    def loss_fn(z):
        img = fwd(z).astype(jnp.float32)
        rec = _pyramid_mse(img, x)
        return rec + prior_weight * prior(z), rec

    @jax.jit
    def run(z0):
        def body(carry, _):
            z, opt_state = carry
            (total, rec), grads = jax.value_and_grad(loss_fn, has_aux=True)(z)
            updates, opt_state = opt.update(grads, opt_state, z)
            z = optax.apply_updates(z, updates)
            return (z, opt_state), total

        (z, _), hist = jax.lax.scan(
            body, (z0, opt.init(z0)), None, length=steps
        )
        return z, hist

    z, hist = run(z0)
    return np.asarray(z), np.asarray(hist)


def reconstruction_grid(
    gan: GAN, g_params, targets: np.ndarray, z: np.ndarray, labels=None,
    space: str = "z",
) -> np.ndarray:
    """Interleaved [target | reconstruction] rows as uint8 NHWC, for the
    CLI's --recon output. `space` must match the `project` call that
    produced `z` (w/w+ resynthesize through the style synthesis alone)."""
    from locate_tpu.io.sampling import to_uint8

    if space == "z":
        rec = gan.generator.apply(
            g_params, jnp.asarray(z),
            None if labels is None else jnp.asarray(labels),
        )
    else:
        from locate_tpu.models.style_generator import make_style_fns

        rec = make_style_fns(gan.config)["synthesis"](
            g_params, jnp.asarray(z, jnp.float32), dtype=jnp.float32
        )
    rec = np.asarray(jax.device_get(rec), np.float32)
    pairs = np.stack([np.asarray(targets, np.float32), rec], axis=1)
    return to_uint8(pairs.reshape((-1,) + rec.shape[1:]))
