"""Balanced consistency regularization (train.bcr_gamma, bCR — arXiv
2002.04724 §3): D penalized for scoring an image and an augmented view
differently, added to the D loss only."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locate_tpu.config import TrainConfig
from locate_tpu.models.gan import build_gan
from locate_tpu.parallel.mesh import make_mesh, single_device_mesh
from locate_tpu.parallel.sharding import (
    make_sharded_train_step,
    place_train_state,
)
from locate_tpu.train.state import create_train_state


def _cfg(tiny_config, **train_kw):
    return dataclasses.replace(
        tiny_config, train=dataclasses.replace(tiny_config.train, **train_kw)
    )


def _run(cfg, mesh, n_steps=2):
    gan = build_gan(cfg)
    with mesh:
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        jit_for, sh_for, b_shard = make_sharded_train_step(cfg, gan, mesh)
        state = place_train_state(state, sh_for(state))
        step = jit_for(state)
        img = jax.random.uniform(
            jax.random.PRNGKey(1),
            (cfg.train.global_batch, cfg.model.resolution,
             cfg.model.resolution, 3),
            minval=-1.0, maxval=1.0,
        )
        batch = jax.device_put(
            {"image": img,
             "label": jnp.zeros((cfg.train.global_batch,), jnp.int32)},
            {"image": b_shard, "label": b_shard},
        )
        hist = []
        for _ in range(n_steps):
            state, metrics = step(state, batch)
            hist.append({k: float(v) for k, v in metrics.items()})
    return hist


def test_config_validation():
    with pytest.raises(ValueError):
        TrainConfig(bcr_gamma=-1.0)
    with pytest.raises(ValueError):
        TrainConfig(bcr_p=1.5)
    with pytest.raises(ValueError):
        TrainConfig(bcr_ops="geom,affinely")
    TrainConfig(bcr_gamma=10.0, bcr_p=0.5, bcr_ops="geom,color")


def test_bcr_p_zero_is_identity(tiny_config):
    """With bcr_p=0 every augmentation blends to the identity in VALUE, so
    the bcr term is ~0 and the trajectory matches bcr-off. Not bitwise:
    D(x) and D(T(x)) are separate subgraphs XLA may fuse differently, so
    bitwise-equal inputs still give fp32-epsilon logit diffs (measured
    ~1e-7 on the squared term); the bcr keys fold off the main stream
    without advancing it, so everything else lines up to that epsilon."""
    h_off = _run(tiny_config, single_device_mesh(tiny_config.parallel))
    h_on = _run(_cfg(tiny_config, bcr_gamma=10.0, bcr_p=0.0),
                single_device_mesh(tiny_config.parallel))
    for a, b in zip(h_off, h_on):
        assert b["bcr"] < 1e-5
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-4,
                                       err_msg=k)


def test_bcr_active_and_deterministic(tiny_config):
    """With real augmentations the consistency penalty is positive and the
    whole step stays deterministic."""
    cfg = _cfg(tiny_config, bcr_gamma=10.0, bcr_p=0.9, bcr_ops="geom,color")
    h = _run(cfg, single_device_mesh(cfg.parallel))
    assert h[0]["bcr"] > 0.0
    assert all(np.isfinite(list(m.values())).all() for m in h)
    h2 = _run(cfg, single_device_mesh(cfg.parallel))
    for a, b in zip(h, h2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_bcr_dp_matches_single_device(tiny_config):
    """GSPMD keeps the bCR-augmented program DP == single-device (one key,
    global-batch draws — the same property ADA's pipeline is pinned to)."""
    cfg = _cfg(tiny_config, bcr_gamma=5.0, bcr_p=0.7)
    h1 = _run(cfg, single_device_mesh(cfg.parallel))
    h8 = _run(cfg, make_mesh(cfg.parallel))
    for a, b in zip(h1, h8):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=5e-4,
                                       err_msg=k)


def test_bcr_composes_with_ada(tiny_config):
    """ADA (D's inputs augmented, p adapted) + bCR (consistency on top)
    run together: both metrics present, finite."""
    cfg = _cfg(tiny_config, bcr_gamma=5.0, bcr_p=0.7,
               augment_p=0.3, ada_target=0.6)
    h = _run(cfg, single_device_mesh(cfg.parallel))
    assert "bcr" in h[0] and "augment_p" in h[0]
    assert all(np.isfinite(list(m.values())).all() for m in h)
