"""Sanitizer & metrics tests (SURVEY.md §6): non-finite gradients skip the
update instead of poisoning params; MetricsLogger formats/flags correctly."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from locate_tpu.models.gan import build_gan
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_train_step
from locate_tpu.utils.metrics import MetricsLogger


def test_nonfinite_batch_skips_update(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(tiny_config.train, max_nonfinite_skips=5),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    nan_batch = {
        "image": jnp.full((cfg.train.global_batch, 16, 16, 3), jnp.nan),
        "label": jnp.zeros((cfg.train.global_batch,), jnp.int32),
    }
    before_d = jax.tree.leaves(state.d_params)[0].copy()
    state, metrics = step(state, nan_batch)
    after_d = jax.tree.leaves(state.d_params)[0]
    # update skipped: discriminator params unchanged despite the NaN batch
    np.testing.assert_array_equal(np.asarray(before_d), np.asarray(after_d))
    # and the step still counts + a good batch afterwards trains normally
    good = {
        "image": jax.random.uniform(
            jax.random.PRNGKey(1), (cfg.train.global_batch, 16, 16, 3),
            minval=-1.0, maxval=1.0,
        ),
        "label": jnp.zeros((cfg.train.global_batch,), jnp.int32),
    }
    state, metrics = step(state, good)
    assert np.isfinite(float(metrics["d_loss"]))
    after2 = jax.tree.leaves(state.d_params)[0]
    assert float(jnp.abs(after2 - after_d).max()) > 0


def test_metrics_logger_stdout(capsys):
    logger = MetricsLogger(None)
    logger.log_scalars(5, {"a": 1.0, "b": float("nan")})
    out = capsys.readouterr().out
    assert "step 5" in out and "a=1" in out and "NONFINITE=['b']" in out
    logger.log_images(5, "x", np.zeros((2, 4, 4, 3), np.uint8))  # no-op
    logger.flush()
