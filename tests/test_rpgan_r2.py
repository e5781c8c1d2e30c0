"""The R3GAN modern recipe (arXiv 2501.05441): relativistic pairing loss
(train.loss=rpgan, RSGAN arXiv 1807.00734 §3) + R1/R2 zero-centered
gradient penalties. Torch-golden values, exact R2 wiring (reproduced fake
batch), lazy schedule, and DP equality."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locate_tpu.config import TrainConfig
from locate_tpu.models.gan import build_gan
from locate_tpu.objectives.losses import (
    d_rpgan_loss,
    g_rpgan_loss,
    get_losses,
    r1_penalty,
)
from locate_tpu.parallel.mesh import make_mesh, single_device_mesh
from locate_tpu.parallel.sharding import (
    make_sharded_train_step,
    make_shardmap_train_step,
    place_train_state,
)
from locate_tpu.train.state import create_train_state


# ---------------------------------------------------------------------------
# golden numerics
# ---------------------------------------------------------------------------


def test_rpgan_torch_golden():
    """Paired relativistic loss vs a literal torch implementation of
    RSGAN (arXiv 1807.00734 §3): per-sample D(real_i) - D(fake_i)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    real = rng.randn(32).astype(np.float32) * 2.0 + 0.5
    fake = rng.randn(32).astype(np.float32) * 1.5 - 0.3
    r, f = torch.tensor(real), torch.tensor(fake)
    ref_d = float(F.softplus(-(r - f)).mean())
    ref_g = float(F.softplus(-(f - r)).mean())
    np.testing.assert_allclose(
        float(d_rpgan_loss(jnp.asarray(real), jnp.asarray(fake))), ref_d,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(g_rpgan_loss(jnp.asarray(fake), jnp.asarray(real))), ref_g,
        rtol=1e-6,
    )


def test_rpgan_direction_and_registration():
    """D winning every PAIR -> low D loss / high G loss; registered in
    get_losses with the relativistic signature."""
    g_fn, d_fn = get_losses("rpgan")
    real = jnp.full((8,), 10.0)
    fake = jnp.full((8,), -10.0)
    assert float(d_fn(real, fake)) < 1e-3
    assert float(g_fn(fake, real)) > 10.0


def test_rpgan_is_pairwise_not_average():
    """The pairing loss must depend on WHICH real each fake is paired
    with — permuting the reals changes it (it would not change ragan)."""
    rng = np.random.RandomState(1)
    real = jnp.asarray(rng.randn(16).astype(np.float32))
    fake = jnp.asarray(rng.randn(16).astype(np.float32))
    perm = jnp.asarray(rng.permutation(16))
    a = float(d_rpgan_loss(real, fake))
    b = float(d_rpgan_loss(real[perm], fake))
    assert abs(a - b) > 1e-4


def test_config_validation():
    with pytest.raises(ValueError):
        TrainConfig(r2_gamma=-0.1)
    with pytest.raises(ValueError):
        TrainConfig(topk_fraction=0.5, loss="rpgan")
    TrainConfig(loss="rpgan", r1_gamma=0.1, r2_gamma=0.1)  # the recipe


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
    return hist, state, gan


def test_r2_metric_matches_direct_penalty(tiny_config):
    """Exact wiring check: at step 0 (the lazy penalty fires) the reported
    r2 metric must equal r1_penalty evaluated at the step's OWN fake batch
    (reproduced here from the same rng stream) times gamma*interval."""
    gamma, interval = 0.3, 16
    cfg = _cfg(tiny_config, r2_gamma=gamma, r1_interval=interval)
    gan = build_gan(cfg)
    state0 = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    # reproduce the alternating step's D-side fake batch (no aug, no
    # conditioning in tiny_config): rng splits to (k_ema, k_zd, ...)
    n = cfg.train.global_batch
    _, k_zd, _, _, _ = jax.random.split(state0.rng, 5)
    z_d = gan.sample_latents(k_zd, n)
    fake_d = gan.generator.apply(state0.g_params, z_d, None)
    expect = float(
        r1_penalty(gan.discriminator.apply, state0.d_params, fake_d)
    ) * gamma * interval
    hist, _, _ = _run(cfg, single_device_mesh(cfg.parallel), n_steps=1)
    np.testing.assert_allclose(hist[0]["r2"], expect, rtol=1e-5)


def test_r2_lazy_schedule(tiny_config):
    """r1_interval=2: R2 fires (positive) on step 0, is exactly 0 on
    step 1, and fires again on step 2."""
    cfg = _cfg(tiny_config, r2_gamma=0.5, r1_interval=2)
    hist, _, _ = _run(cfg, single_device_mesh(cfg.parallel), n_steps=3)
    assert hist[0]["r2"] > 0.0
    assert hist[1]["r2"] == 0.0
    assert hist[2]["r2"] > 0.0


def test_r2_zero_is_structural_noop(tiny_config):
    """r2_gamma=0 must leave the baseline trajectory bit-identical (no
    extra ops, no metric key)."""
    h_base, _, _ = _run(tiny_config, single_device_mesh(tiny_config.parallel))
    h_zero, _, _ = _run(_cfg(tiny_config, r2_gamma=0.0),
                        single_device_mesh(tiny_config.parallel))
    assert "r2" not in h_base[0]
    for a, b in zip(h_base, h_zero):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_r3gan_recipe_dp_matches_single_device(tiny_config):
    """The full modern recipe (rpgan + R1 + R2, every-step for coverage):
    GSPMD 8-device == single-device trajectory, all metrics finite."""
    cfg = _cfg(tiny_config, loss="rpgan", r1_gamma=0.1, r2_gamma=0.1,
               r1_interval=1)
    h1, _, _ = _run(cfg, single_device_mesh(cfg.parallel))
    h8, _, _ = _run(cfg, make_mesh(cfg.parallel))
    for a, b in zip(h1, h8):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=5e-4,
                                       err_msg=k)
    assert all(np.isfinite(list(h.values())).all() for h in h8)


def test_r3gan_recipe_shardmap_finite(tiny_config):
    """shard_map backend with the recipe: runs, finite, deterministic
    (R2's grad-of-grad inside value_and_grad inside shard_map)."""
    cfg = _cfg(tiny_config, loss="rpgan", r1_gamma=0.1, r2_gamma=0.1,
               r1_interval=1)
    mesh = make_mesh(cfg.parallel)
    h, _, _ = _run(cfg, mesh, maker=make_shardmap_train_step)
    h2, _, _ = _run(cfg, mesh, maker=make_shardmap_train_step)
    assert all(np.isfinite(list(m.values())).all() for m in h)
    for a, b in zip(h, h2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
