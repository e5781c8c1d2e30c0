"""Relativistic average losses (train.loss=ragan/rahinge, arXiv 1807.00734)
and top-k generator training (train.topk_fraction, arXiv 2002.06224):
torch-golden loss values, trajectory sanity, and mesh equality (the two
features couple samples through batch statistics — exactly the kind of
term that silently diverges across DP backends without the gmean /
global-threshold discipline in train/step.py)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locate_tpu.config import TrainConfig
from locate_tpu.models.gan import build_gan
from locate_tpu.objectives.losses import (
    d_ragan_loss,
    d_rahinge_loss,
    g_per_sample,
    g_ragan_loss,
    g_rahinge_loss,
    get_losses,
)
from locate_tpu.parallel.mesh import make_mesh, single_device_mesh
from locate_tpu.parallel.sharding import (
    make_sharded_train_step,
    make_shardmap_train_step,
    place_train_state,
)
from locate_tpu.train.state import create_train_state


# ---------------------------------------------------------------------------
# golden numerics (independent torch implementation of the paper formulas)
# ---------------------------------------------------------------------------


def _torch_ragan(real, fake):
    import torch
    import torch.nn.functional as F

    r, f = torch.tensor(real), torch.tensor(fake)
    d = (
        F.softplus(-(r - f.mean())).mean() + F.softplus(f - r.mean()).mean()
    )
    g = (
        F.softplus(-(f - r.mean())).mean() + F.softplus(r - f.mean()).mean()
    )
    return float(g), float(d)


def _torch_rahinge(real, fake):
    import torch

    r, f = torch.tensor(real), torch.tensor(fake)
    d = (
        torch.relu(1.0 - (r - f.mean())).mean()
        + torch.relu(1.0 + (f - r.mean())).mean()
    )
    g = (
        torch.relu(1.0 - (f - r.mean())).mean()
        + torch.relu(1.0 + (r - f.mean())).mean()
    )
    return float(g), float(d)


@pytest.mark.parametrize(
    "ours_g,ours_d,golden",
    [
        (g_ragan_loss, d_ragan_loss, _torch_ragan),
        (g_rahinge_loss, d_rahinge_loss, _torch_rahinge),
    ],
    ids=["ragan", "rahinge"],
)
def test_relativistic_torch_golden(ours_g, ours_d, golden):
    rng = np.random.RandomState(0)
    real = rng.randn(32).astype(np.float32) * 2.0 + 0.5
    fake = rng.randn(32).astype(np.float32) * 1.5 - 0.3
    ref_g, ref_d = golden(real, fake)
    np.testing.assert_allclose(
        float(ours_g(jnp.asarray(fake), jnp.asarray(real))), ref_g, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(ours_d(jnp.asarray(real), jnp.asarray(fake))), ref_d, rtol=1e-6
    )


def test_relativistic_direction():
    """D winning (reals above average fake and vice versa) must give a low
    D loss and a high G loss; and the pair is registered in get_losses."""
    g_fn, d_fn = get_losses("ragan")
    real = jnp.full((8,), 10.0)
    fake = jnp.full((8,), -10.0)
    assert float(d_fn(real, fake)) < 1e-3
    assert float(g_fn(fake, real)) > 10.0


def test_g_per_sample_matches_scalar():
    """The per-sample decomposition's mean must equal the scalar G loss for
    every decomposable family (the invariant top-k masking relies on)."""
    fake = jnp.asarray(np.random.RandomState(1).randn(16).astype(np.float32))
    for kind in ("nonsat", "hinge", "wgan", "lsgan"):
        g_fn, _ = get_losses(kind)
        np.testing.assert_allclose(
            float(jnp.mean(g_per_sample(kind)(fake))), float(g_fn(fake)),
            rtol=1e-6,
        )
    with pytest.raises(ValueError):
        g_per_sample("ragan")


def test_config_validation():
    with pytest.raises(ValueError):
        TrainConfig(topk_fraction=0.0)
    with pytest.raises(ValueError):
        TrainConfig(topk_fraction=0.5, loss="ragan")
    TrainConfig(topk_fraction=0.5, loss="hinge")  # fine


# ---------------------------------------------------------------------------
# train-step integration
# ---------------------------------------------------------------------------


def _cfg(tiny_config, **train_kw):
    return dataclasses.replace(
        tiny_config, train=dataclasses.replace(tiny_config.train, **train_kw)
    )


def _run(cfg, mesh, maker=make_sharded_train_step, n_steps=2):
    gan = build_gan(cfg)
    with mesh:
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        jit_for, sh_for, b_shard = maker(cfg, gan, mesh)
        state = place_train_state(state, sh_for(state))
        step = jit_for(state)
        img = jax.random.uniform(
            jax.random.PRNGKey(1),
            (cfg.train.global_batch, cfg.model.resolution,
             cfg.model.resolution, 3),
            minval=-1.0, maxval=1.0,
        )
        batch = jax.device_put(
            {"image": img, "label": jnp.zeros(
                (cfg.train.global_batch,), jnp.int32)},
            {"image": b_shard, "label": b_shard},
        )
        hist = []
        for _ in range(n_steps):
            state, metrics = step(state, batch)
            hist.append({k: float(v) for k, v in metrics.items()})
    return hist


@pytest.mark.parametrize("loss", ["ragan", "rahinge"])
def test_relativistic_dp_matches_single_device(tiny_config, loss):
    """GSPMD 8-device == single-device trajectory with a relativistic loss:
    the batch-mean coupling must be a GLOBAL mean under sharding."""
    cfg = _cfg(tiny_config, loss=loss)
    h1 = _run(cfg, single_device_mesh(cfg.parallel))
    h8 = _run(cfg, make_mesh(cfg.parallel))
    for a, b in zip(h1, h8):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=5e-4,
                                       err_msg=k)
    assert all(np.isfinite(list(h.values())).all() for h in h8)


def test_relativistic_shardmap_finite_and_deterministic(tiny_config):
    """shard_map backend with ragan: runs, finite, deterministic (the
    pmean'd gmean path inside value_and_grad inside shard_map)."""
    cfg = _cfg(tiny_config, loss="ragan")
    mesh = make_mesh(cfg.parallel)
    h = _run(cfg, mesh, maker=make_shardmap_train_step)
    h2 = _run(cfg, mesh, maker=make_shardmap_train_step)
    assert all(np.isfinite(list(m.values())).all() for m in h)
    for a, b in zip(h, h2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_topk_full_fraction_is_identity(tiny_config):
    """topk_fraction=1.0 must be the exact baseline trajectory (the knob
    defaults on without changing anything)."""
    h_base = _run(tiny_config, single_device_mesh(tiny_config.parallel))
    h_topk = _run(_cfg(tiny_config, topk_fraction=1.0),
                  single_device_mesh(tiny_config.parallel))
    for a, b in zip(h_base, h_topk):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_topk_selects_easiest_samples(tiny_config):
    """At an identical state (same rng, same D update), the top-k G loss
    is the mean over the samples D scores HIGHEST — for the monotone
    nonsat loss that is necessarily <= the full-batch mean."""
    h_full = _run(tiny_config, single_device_mesh(tiny_config.parallel),
                  n_steps=1)
    h_topk = _run(_cfg(tiny_config, topk_fraction=0.5),
                  single_device_mesh(tiny_config.parallel), n_steps=1)
    # identical D step (top-k only touches the G loss)
    np.testing.assert_allclose(h_full[0]["d_loss"], h_topk[0]["d_loss"],
                               rtol=1e-6)
    assert h_topk[0]["g_loss"] <= h_full[0]["g_loss"] + 1e-7


def test_topk_dp_matches_single_device(tiny_config):
    """Top-k's threshold must come from the GLOBAL batch: 8-device GSPMD
    == single device, and the shard_map backend (all_gather + psum-count
    path) == the same GSPMD program on identical real data."""
    cfg = _cfg(tiny_config, topk_fraction=0.5)
    h1 = _run(cfg, single_device_mesh(cfg.parallel))
    h8 = _run(cfg, make_mesh(cfg.parallel))
    for a, b in zip(h1, h8):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=5e-4,
                                       err_msg=k)
    hsm = _run(cfg, make_mesh(cfg.parallel), maker=make_shardmap_train_step)
    assert all(np.isfinite(list(m.values())).all() for m in hsm)
    # different latent stream (backend convention) but same real batch:
    # step-1 real statistics agree exactly, losses loosely
    np.testing.assert_allclose(h8[0]["real_logits"], hsm[0]["real_logits"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(h8[0]["d_loss"], hsm[0]["d_loss"], rtol=0.05)
