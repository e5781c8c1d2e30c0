"""Orthogonal regularization on G (train.ortho_gamma — BigGAN, arXiv
1809.11096 §3): off-diagonal ||W^T W o (1-I)||_F^2 summed over G's
weight matrices, added to the G loss every step."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locate_tpu.config import TrainConfig
from locate_tpu.models.gan import build_gan
from locate_tpu.objectives.losses import orthogonal_penalty
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
        TrainConfig(ortho_gamma=-1e-4)
    TrainConfig(ortho_gamma=1e-4)


def test_orthogonal_penalty_torch_golden():
    """Value AND grads of orthogonal_penalty on a mixed pytree (4-D HWIO
    conv kernel + 2-D dense + skipped 1-D bias) vs a literal torch
    transcription of BigGAN's off-diagonal form."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    params = {
        "conv": {"kernel": rng.normal(size=(3, 3, 4, 5)).astype(np.float32),
                 "bias": rng.normal(size=(5,)).astype(np.float32)},
        "dense": {"kernel": rng.normal(size=(6, 4)).astype(np.float32)},
    }

    tw = {k: torch.tensor(v, requires_grad=(v.ndim >= 2))
          for k, v in [("ck", params["conv"]["kernel"]),
                       ("cb", params["conv"]["bias"]),
                       ("dk", params["dense"]["kernel"])]}
    ref = torch.zeros(())
    for t in (tw["ck"], tw["dk"]):
        w = t.reshape(-1, t.shape[-1])
        gram = w.T @ w
        gram = gram - torch.diag(torch.diagonal(gram))
        ref = ref + gram.pow(2).sum()
    ref.backward()

    jparams = jax.tree.map(jnp.asarray, params)
    val, grads = jax.value_and_grad(orthogonal_penalty)(jparams)
    np.testing.assert_allclose(float(val), float(ref.detach()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads["conv"]["kernel"]),
                               tw["ck"].grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads["dense"]["kernel"]),
                               tw["dk"].grad.numpy(), rtol=1e-4, atol=1e-4)
    # 1-D leaves are skipped: zero gradient
    np.testing.assert_array_equal(np.asarray(grads["conv"]["bias"]),
                                  np.zeros(5, np.float32))


def test_ortho_excludes_const_and_class_embed():
    """Non-weight >=2-D leaves (style const input, class-embedding tables)
    are excluded by pytree key — BigGAN's recipe regularizes weight
    matrices only and blacklists the shared embedding."""
    rng = np.random.default_rng(2)
    w = rng.normal(size=(6, 4)).astype(np.float32)
    base = {"dense": {"kernel": jnp.asarray(w)}}
    withx = {
        "dense": {"kernel": jnp.asarray(w)},
        "const": jnp.asarray(rng.normal(size=(4, 4, 3)).astype(np.float32)),
        "class_embed": jnp.asarray(
            rng.normal(size=(10, 8)).astype(np.float32)),
    }
    np.testing.assert_allclose(float(orthogonal_penalty(withx)),
                               float(orthogonal_penalty(base)), rtol=1e-6)
    grads = jax.grad(orthogonal_penalty)(withx)
    np.testing.assert_array_equal(np.asarray(grads["const"]), 0.0)
    np.testing.assert_array_equal(np.asarray(grads["class_embed"]), 0.0)


def test_ortho_orthogonal_weights_are_zero_penalty():
    """An exactly-orthogonal matrix (columns orthonormal) has zero
    off-diagonal gram — the penalty's fixed point."""
    q, _ = np.linalg.qr(np.random.default_rng(1).normal(size=(8, 4)))
    val = orthogonal_penalty({"w": jnp.asarray(q.astype(np.float32))})
    assert float(val) < 1e-10


def test_ortho_active_and_deterministic(tiny_config):
    cfg = _cfg(tiny_config, ortho_gamma=1e-4)
    h = _run(cfg, single_device_mesh(cfg.parallel))
    assert h[0]["ortho"] > 0.0
    assert all(np.isfinite(list(m.values())).all() for m in h)
    h2 = _run(cfg, single_device_mesh(cfg.parallel))
    for a, b in zip(h, h2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_ortho_dp_matches_single_device(tiny_config):
    """Params are replicated, so the term is replica-identical and the
    regularized program stays DP == single-device."""
    cfg = _cfg(tiny_config, ortho_gamma=1e-4)
    h1 = _run(cfg, single_device_mesh(cfg.parallel))
    h8 = _run(cfg, make_mesh(cfg.parallel))
    for a, b in zip(h1, h8):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=5e-4,
                                       err_msg=k)


def test_ortho_composes_with_pl(tiny_config):
    """ortho shares g_reg with path-length reg — both terms present and
    finite when enabled together."""
    cfg = _cfg(tiny_config, ortho_gamma=1e-4, pl_gamma=2.0, pl_interval=2)
    h = _run(cfg, single_device_mesh(cfg.parallel), n_steps=2)
    assert "ortho" in h[0] and "pl" in h[0]
    assert all(np.isfinite(list(m.values())).all() for m in h)
