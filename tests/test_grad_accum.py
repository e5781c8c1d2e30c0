"""Gradient-accumulation tests (optax.MultiSteps wrapper)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from locate_tpu.models.gan import build_gan
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_train_step


def test_params_move_only_every_k(tiny_config):
    cfg = dataclasses.replace(
        tiny_config, train=dataclasses.replace(tiny_config.train, grad_accum=2)
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
    p0 = jax.tree.leaves(state.d_params)[0].copy()
    state, _ = step(state, batch)  # micro-step 1: accumulate only
    p1 = jax.tree.leaves(state.d_params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    state, _ = step(state, batch)  # micro-step 2: apply
    p2 = jax.tree.leaves(state.d_params)[0]
    assert float(jnp.abs(p2 - p1).max()) > 0


def test_eval_hook_runs(tiny_config, tmp_path):
    from locate_tpu.train.loop import train

    cfg = dataclasses.replace(
        tiny_config,
        workdir=str(tmp_path / "run"),
        train=dataclasses.replace(
            tiny_config.train,
            eval_every=2, eval_samples=8, log_every=2,
            sample_every=0, checkpoint_every=0,
        ),
    )
    scores = []
    train(cfg, total_steps=2, hooks={"on_eval": lambda s, r: scores.append(r)})
    assert scores and np.isfinite(scores[0]["fid"])


def test_ema_moves_only_on_emit(tiny_config):
    """Under grad_accum the EMA must not decay on accumulation
    micro-steps (params unchanged there)."""
    cfg = dataclasses.replace(
        tiny_config, train=dataclasses.replace(tiny_config.train, grad_accum=2)
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
    ema0 = jax.tree.leaves(state.ema_params)[0].copy()
    state, _ = step(state, batch)  # micro-step: no emit
    ema1 = jax.tree.leaves(state.ema_params)[0]
    np.testing.assert_array_equal(np.asarray(ema0), np.asarray(ema1))
    state, _ = step(state, batch)  # emit
    ema2 = jax.tree.leaves(state.ema_params)[0]
    assert float(jnp.abs(ema2 - ema1).max()) > 0


def test_schedule_counts_optimizer_updates(tiny_config):
    from locate_tpu.objectives.optim import make_schedule

    tcfg = dataclasses.replace(
        tiny_config.train, grad_accum=4, lr_schedule="cosine", total_steps=100
    )
    sched = make_schedule(1.0, tcfg)
    # horizon is total_steps // grad_accum = 25 optimizer updates
    assert float(sched(25)) < 1e-6
    assert float(sched(12)) > 0.1
