"""Non-saturating loss golden tests vs torch (SURVEY.md §5 item 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from locate_tpu.objectives.ema import ema_init, ema_update
from locate_tpu.objectives.losses import d_nonsat_loss, g_nonsat_loss, r1_penalty


def test_g_loss_matches_torch():
    logits = np.random.RandomState(0).randn(16).astype(np.float32) * 3
    ours = float(g_nonsat_loss(jnp.asarray(logits)))
    ref = float(F.softplus(-torch.from_numpy(logits)).mean())
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_d_loss_matches_torch():
    rs = np.random.RandomState(1)
    real = rs.randn(16).astype(np.float32)
    fake = rs.randn(16).astype(np.float32)
    ours = float(d_nonsat_loss(jnp.asarray(real), jnp.asarray(fake)))
    ref = float(
        F.softplus(-torch.from_numpy(real)).mean()
        + F.softplus(torch.from_numpy(fake)).mean()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_loss_direction():
    """Confident-correct D -> low loss; confident-wrong -> high loss."""
    good = float(d_nonsat_loss(jnp.full((4,), 10.0), jnp.full((4,), -10.0)))
    bad = float(d_nonsat_loss(jnp.full((4,), -10.0), jnp.full((4,), 10.0)))
    assert good < 1e-3 < bad
    assert float(g_nonsat_loss(jnp.full((4,), 10.0))) < 1e-3


def test_lsgan_losses_match_torch():
    from locate_tpu.objectives.losses import d_lsgan_loss, g_lsgan_loss

    rs = np.random.RandomState(2)
    real = rs.randn(16).astype(np.float32) * 2
    fake = rs.randn(16).astype(np.float32) * 2
    tr, tf = torch.from_numpy(real), torch.from_numpy(fake)
    ref_d = float(
        0.5 * F.mse_loss(tr, torch.ones_like(tr))
        + 0.5 * F.mse_loss(tf, torch.zeros_like(tf))
    )
    ref_g = float(0.5 * F.mse_loss(tf, torch.ones_like(tf)))
    np.testing.assert_allclose(
        float(d_lsgan_loss(jnp.asarray(real), jnp.asarray(fake))), ref_d,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(g_lsgan_loss(jnp.asarray(fake))), ref_g, rtol=1e-6
    )


def test_lsgan_direction_and_registry():
    from locate_tpu.objectives.losses import get_losses

    g_fn, d_fn = get_losses("lsgan")
    good = float(d_fn(jnp.ones((4,)), jnp.zeros((4,))))
    bad = float(d_fn(jnp.zeros((4,)), jnp.ones((4,))))
    assert good < 1e-6 < bad
    assert float(g_fn(jnp.ones((4,)))) < 1e-6 < float(g_fn(jnp.zeros((4,))))


def test_r1_penalty_quadratic():
    """For D(x) = <w, x>, R1 = 0.5 * ||w||^2 regardless of x."""
    w = jnp.asarray(np.random.RandomState(0).randn(4, 4, 3).astype(np.float32))

    def d_apply(params, x, labels=None):
        return jnp.sum(x * params, axis=(1, 2, 3))

    x = jnp.ones((2, 4, 4, 3), jnp.float32)
    pen = float(r1_penalty(d_apply, w, x))
    np.testing.assert_allclose(pen, 0.5 * float(jnp.sum(w**2)), rtol=1e-5)


def test_ema_update_converges():
    params = {"w": jnp.zeros((3,))}
    ema = ema_init(params)
    target = {"w": jnp.ones((3,))}
    for _ in range(200):
        ema = ema_update(ema, target, 0.9)
    np.testing.assert_allclose(np.asarray(ema["w"]), 1.0, atol=1e-6)


def test_ema_identity_at_decay_one():
    ema = {"w": jnp.zeros((3,))}
    out = ema_update(ema, {"w": jnp.ones((3,))}, 1.0)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0)


def test_logit_penalty_golden(tiny_config):
    """Drift penalty (ProGAN): d_loss gains exactly lp*E[D(real)^2]."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from locate_tpu.models.gan import build_gan
    from locate_tpu.train.state import create_train_state
    from locate_tpu.train.step import make_train_step

    def one_step(lp):
        cfg = dataclasses.replace(
            tiny_config,
            train=dataclasses.replace(tiny_config.train, logit_penalty=lp),
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
        _, m = step(state, batch)
        return {k: float(v) for k, v in m.items()}

    m0 = one_step(0.0)
    m1 = one_step(1e-2)
    assert "drift" not in m0 and m1["drift"] > 0.0
    # same params/batch/latents: the d_loss delta IS the drift term
    np.testing.assert_allclose(
        m1["d_loss"] - m0["d_loss"], m1["drift"], rtol=1e-4
    )
