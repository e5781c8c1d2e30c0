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
    key: Optional[jax.Array] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Invert `targets` (fp32 NHWC in [-1, 1]) through the generator.

    Returns (z, loss_history): z of shape (N, latent_dim) and the
    per-step total loss (host arrays). Labels are required for
    class-conditional models (they condition, they are not optimized).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n = targets.shape[0]
    x = jnp.asarray(targets, jnp.float32)
    if labels is not None:
        labels = jnp.asarray(labels)
    if init == "zero":
        z0 = jnp.zeros((n, gan.config.latent_dim), jnp.float32)
    else:
        z0 = gan.sample_latents(key, n)
    opt = optax.adam(lr)

    def loss_fn(z):
        img = gan.generator.apply(g_params, z, labels).astype(jnp.float32)
        rec = _pyramid_mse(img, x)
        return rec + prior_weight * jnp.mean(z * z), rec

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
    gan: GAN, g_params, targets: np.ndarray, z: np.ndarray, labels=None
) -> np.ndarray:
    """Interleaved [target | reconstruction] rows as uint8 NHWC, for the
    CLI's --recon output."""
    from locate_tpu.io.sampling import to_uint8

    rec = gan.generator.apply(
        g_params, jnp.asarray(z),
        None if labels is None else jnp.asarray(labels),
    )
    rec = np.asarray(jax.device_get(rec), np.float32)
    pairs = np.stack([np.asarray(targets, np.float32), rec], axis=1)
    return to_uint8(pairs.reshape((-1,) + rec.shape[1:]))
