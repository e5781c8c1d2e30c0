"""GAN inversion (io/projection.py): projecting G(z*) targets back into
latent space must recover a reconstruction far below the initial loss,
in one compiled scan, for unconditional and class-conditional models."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from locate_tpu.io.projection import project, reconstruction_grid
from locate_tpu.models.gan import build_gan


def _gan(tiny_config, **model_kw):
    cfg = tiny_config
    if model_kw:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **model_kw)
        )
    gan = build_gan(cfg)
    params = gan.init(jax.random.PRNGKey(0))["generator"]
    return gan, params


def test_project_recovers_generated_images(tiny_config):
    gan, params = _gan(tiny_config)
    z_true = gan.sample_latents(jax.random.PRNGKey(7), 4)
    targets = np.asarray(
        gan.generator.apply(params, z_true), np.float32
    )
    z, hist = project(
        gan, params, targets, steps=300, lr=0.1,
        key=jax.random.PRNGKey(1),
    )
    assert z.shape == (4, tiny_config.model.latent_dim)
    assert hist.shape == (300,)
    assert np.isfinite(hist).all()
    # the optimization must actually work: big loss drop, small final MSE
    assert hist[-1] < hist[0] * 0.2, (hist[0], hist[-1])
    rec = np.asarray(gan.generator.apply(params, jnp.asarray(z)), np.float32)
    mse = float(np.mean((rec - targets) ** 2))
    assert mse < 0.02, mse


def test_project_conditional_and_grid(tiny_config):
    gan, params = _gan(tiny_config, num_classes=3, class_embed_dim=6)
    labels = np.asarray([0, 1, 2], np.int32)
    z_true = gan.sample_latents(jax.random.PRNGKey(3), 3)
    targets = np.asarray(
        gan.generator.apply(params, z_true, jnp.asarray(labels)), np.float32
    )
    z, hist = project(
        gan, params, targets, labels=labels, steps=200, lr=0.1,
        key=jax.random.PRNGKey(1),
    )
    assert hist[-1] < hist[0] * 0.5
    grid = reconstruction_grid(gan, params, targets, z, labels)
    assert grid.shape == (6, 16, 16, 3) and grid.dtype == np.uint8


def test_project_w_space_style_family(tiny_config):
    """StyleGAN2-projector convention: optimizing w directly (mapping
    bypassed, w_avg init + pull) recovers style-generated targets; "w+"
    returns per-layer styles and reconstructs through synthesis alone."""
    import pytest

    gan, params = _gan(tiny_config, arch="style")
    z_true = gan.sample_latents(jax.random.PRNGKey(5), 3)
    targets = np.asarray(gan.generator.apply(params, z_true), np.float32)
    w, hist = project(
        gan, params, targets, steps=250, lr=0.05, space="w",
        key=jax.random.PRNGKey(1),
    )
    w_dim = tiny_config.model.style.w_dim or tiny_config.model.latent_dim
    assert w.shape == (3, w_dim)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0] * 0.3, (hist[0], hist[-1])
    grid = reconstruction_grid(gan, params, targets, w, space="w")
    assert grid.dtype == np.uint8 and grid.shape[0] == 6

    wp, hist_p = project(
        gan, params, targets, steps=120, lr=0.05, space="w+",
        key=jax.random.PRNGKey(1),
    )
    assert wp.shape == (3, gan.generator.num_ws, w_dim)
    assert hist_p[-1] < hist_p[0] * 0.5

    # w spaces are style-family-only; the locate family must refuse loudly
    gan_l, params_l = _gan(tiny_config)
    with pytest.raises(ValueError, match="style"):
        project(gan_l, params_l, targets, steps=1, space="w")
    with pytest.raises(ValueError, match="space"):
        project(gan, params, targets, steps=1, space="bogus")


def test_project_zero_init_and_prior(tiny_config):
    gan, params = _gan(tiny_config)
    targets = np.asarray(
        gan.generator.apply(params, gan.sample_latents(jax.random.PRNGKey(2), 2)),
        np.float32,
    )
    z, hist = project(
        gan, params, targets, steps=60, lr=0.1, init="zero",
        prior_weight=0.1, key=jax.random.PRNGKey(1),
    )
    # strong prior keeps z near the shell: mean-square per-dim stays O(1)
    assert float(np.mean(z**2)) < 4.0
    assert np.isfinite(hist).all()
