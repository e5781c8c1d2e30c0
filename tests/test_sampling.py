"""Sampling utilities: truncation trick, slerp interpolation, grids."""

import numpy as np
import jax
import jax.numpy as jnp

from locate_tpu.io.sampling import (
    interpolation_grid,
    slerp,
    tile_grid,
    to_uint8,
)
from locate_tpu.models.gan import build_gan


def test_truncation_bounds(tiny_config):
    gan = build_gan(tiny_config)
    z = gan.sample_latents(jax.random.PRNGKey(0), 256, truncation=0.5)
    assert float(jnp.abs(z.astype(jnp.float32)).max()) <= 0.5 + 1e-5
    z_full = gan.sample_latents(jax.random.PRNGKey(0), 256)
    assert float(jnp.abs(z_full.astype(jnp.float32)).max()) > 0.5


def test_slerp_endpoints_and_norm():
    a = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    b = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    np.testing.assert_allclose(np.asarray(slerp(a, b, jnp.zeros(4))), np.asarray(a), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(slerp(a, b, jnp.ones(4))), np.asarray(b), rtol=1e-5, atol=1e-5)
    # midpoint of equal-norm vectors keeps (roughly) the norm — the reason
    # to slerp rather than lerp in a Gaussian latent space
    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    mid = slerp(an, bn, jnp.full(4, 0.5))
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(mid, axis=-1)), 1.0, rtol=1e-3
    )


def test_interpolation_grid(tiny_config):
    gan = build_gan(tiny_config)
    params = gan.init(jax.random.PRNGKey(0))
    imgs = interpolation_grid(gan, params["generator"], jax.random.PRNGKey(1), rows=2, cols=4)
    assert imgs.shape == (8, 16, 16, 3) and imgs.dtype == np.uint8
    # neighbouring interpolation steps are closer than the row endpoints
    row = imgs[:4].astype(np.int32)
    step_d = np.abs(row[0] - row[1]).mean()
    end_d = np.abs(row[0] - row[3]).mean()
    assert step_d <= end_d + 1e-6


def test_tile_grid_shapes():
    imgs = to_uint8(np.zeros((6, 8, 8, 3), np.float32))
    grid = tile_grid(imgs, cols=3)
    assert grid.shape == (16, 24, 3)
