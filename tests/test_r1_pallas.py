"""R1 (grad-of-grad) must work with use_pallas: the penalty runs through
an XLA-path discriminator twin because the Pallas custom_vjp is
first-order only (found by driving r1_gamma + use_pallas on the chip)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from locate_tpu.models.gan import build_gan
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_train_step


def test_r1_with_pallas(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        use_pallas=True,
        train=dataclasses.replace(tiny_config.train, r1_gamma=0.5, r1_interval=1),
    )
    gan = build_gan(cfg)
    assert gan.config.use_pallas
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = {
        "image": jax.random.uniform(
            jax.random.PRNGKey(1), (cfg.train.global_batch, 16, 16, 3),
            minval=-1.0, maxval=1.0,
        ),
        "label": jnp.zeros((cfg.train.global_batch,), jnp.int32),
    }
    state, metrics = step(state, batch)
    assert float(metrics["r1"]) > 0.0
    assert all(bool(jnp.isfinite(v)) for v in metrics.values())

    # the penalty value must match the pure-XLA model's penalty exactly
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    gan_x = build_gan(cfg_x)
    state_x = create_train_state(cfg_x, gan_x, jax.random.PRNGKey(0))
    step_x = jax.jit(make_train_step(cfg_x, gan_x))
    _, metrics_x = step_x(state_x, batch)
    np.testing.assert_allclose(
        float(metrics["r1"]), float(metrics_x["r1"]), rtol=1e-4
    )


def test_pl_and_gp_with_pallas(tiny_config):
    """Path-length reg (grad-of-grad through G) and WGAN-GP (through D)
    must also run under use_pallas via their XLA twins, and match the
    pure-XLA model's penalty values."""
    cfg = dataclasses.replace(
        tiny_config,
        use_pallas=True,
        train=dataclasses.replace(
            tiny_config.train, pl_gamma=2.0, pl_interval=1, gp_gamma=1.0
        ),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = {
        "image": jax.random.uniform(
            jax.random.PRNGKey(1), (cfg.train.global_batch, 16, 16, 3),
            minval=-1.0, maxval=1.0,
        ),
        "label": jnp.zeros((cfg.train.global_batch,), jnp.int32),
    }
    state, metrics = step(state, batch)
    assert float(metrics["pl"]) > 0.0 and float(metrics["gp"]) > 0.0
    assert all(bool(jnp.isfinite(v)) for v in metrics.values())

    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    gan_x = build_gan(cfg_x)
    state_x = create_train_state(cfg_x, gan_x, jax.random.PRNGKey(0))
    step_x = jax.jit(make_train_step(cfg_x, gan_x))
    _, metrics_x = step_x(state_x, batch)
    for k in ("pl", "gp", "pl_mean"):
        np.testing.assert_allclose(
            float(metrics[k]), float(metrics_x[k]), rtol=1e-4, err_msg=k
        )
