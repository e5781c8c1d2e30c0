"""Model constructor tests: shapes, output ranges, class conditioning, and
jit invariance (SURVEY.md §5 item 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locate_tpu.config import AttentionConfig, ModelConfig
from locate_tpu.models.discriminator import build_discriminator
from locate_tpu.models.generator import build_generator


def tiny_model(resolution=16, num_classes=0):
    return ModelConfig(
        resolution=resolution,
        base_channels=32,
        max_channels=32,
        min_channels=16,
        latent_dim=16,
        num_classes=num_classes,
        class_embed_dim=8,
        attention=AttentionConfig(pos_features=4, bottleneck=2),
    )


@pytest.mark.parametrize("resolution", [16, 32])
def test_generator_shapes(resolution):
    cfg = tiny_model(resolution)
    g = build_generator(cfg)
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.latent_dim))
    img = g.apply(params, z)
    assert img.shape == (3, resolution, resolution, 3)
    assert float(img.min()) >= -1.0 and float(img.max()) <= 1.0


def test_discriminator_shapes():
    cfg = tiny_model(16)
    d = build_discriminator(cfg)
    params = d.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 16, 3))
    logits = d.apply(params, x)
    assert logits.shape == (3,)
    assert logits.dtype == jnp.float32


def test_conditional_models():
    cfg = tiny_model(16, num_classes=4)
    g = build_generator(cfg)
    d = build_discriminator(cfg)
    gp = g.init(jax.random.PRNGKey(0))
    dp = d.init(jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), (4, cfg.latent_dim))
    labels = jnp.arange(4)
    img = g.apply(gp, z, labels)
    logits = d.apply(dp, img, labels)
    assert img.shape == (4, 16, 16, 3) and logits.shape == (4,)
    # different labels must change the generated image
    img2 = g.apply(gp, z, (labels + 1) % 4)
    assert float(jnp.abs(img - img2).max()) > 1e-4
    # missing labels raise
    with pytest.raises(ValueError):
        g.apply(gp, z)
    with pytest.raises(ValueError):
        d.apply(dp, img)


def test_jit_matches_eager():
    cfg = tiny_model(16)
    g = build_generator(cfg)
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
    eager = g.apply(params, z)
    jitted = jax.jit(g.apply)(params, z)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-5)


def test_attention_stages_subset():
    """attention_stages as an explicit tuple of resolutions."""
    import dataclasses

    cfg_all = tiny_model(16)
    cfg_none = dataclasses.replace(cfg_all, attention_stages=())
    g_all = build_generator(cfg_all)
    g_none = build_generator(cfg_none)
    p_all = g_all.init(jax.random.PRNGKey(0))
    p_none = g_none.init(jax.random.PRNGKey(0))
    n_all = sum(x.size for x in jax.tree.leaves(p_all))
    n_none = sum(x.size for x in jax.tree.leaves(p_none))
    assert n_all > n_none  # attention blocks add parameters
