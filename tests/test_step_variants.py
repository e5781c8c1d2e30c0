"""Step-variant tests: fused simultaneous step, hinge loss, LR schedules."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from locate_tpu.models.gan import build_gan
from locate_tpu.objectives.losses import d_hinge_loss, g_hinge_loss
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_train_step


def make_batch(cfg, key):
    img = jax.random.uniform(
        key, (cfg.train.global_batch, cfg.model.resolution, cfg.model.resolution, 3),
        minval=-1.0, maxval=1.0,
    )
    return {"image": img, "label": jnp.zeros((cfg.train.global_batch,), jnp.int32)}


def run_steps(cfg, n=6):
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    hist = []
    for _ in range(n):
        state, m = step(state, batch)
        hist.append({k: float(v) for k, v in m.items()})
    return state, hist


def test_fused_step_trains(tiny_config):
    cfg = dataclasses.replace(
        tiny_config, train=dataclasses.replace(tiny_config.train, fused_step=True)
    )
    state, hist = run_steps(cfg)
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    assert hist[-1]["real_logits"] > hist[-1]["fake_logits"]
    assert int(state.step) == 6


def test_hinge_loss_golden():
    rs = np.random.RandomState(0)
    real = rs.randn(16).astype(np.float32)
    fake = rs.randn(16).astype(np.float32)
    ours_d = float(d_hinge_loss(jnp.asarray(real), jnp.asarray(fake)))
    ref_d = float(
        F.relu(1 - torch.from_numpy(real)).mean()
        + F.relu(1 + torch.from_numpy(fake)).mean()
    )
    np.testing.assert_allclose(ours_d, ref_d, rtol=1e-6)
    np.testing.assert_allclose(
        float(g_hinge_loss(jnp.asarray(fake))), float(-fake.mean()), rtol=1e-6
    )


def test_hinge_step_trains(tiny_config):
    cfg = dataclasses.replace(
        tiny_config, train=dataclasses.replace(tiny_config.train, loss="hinge")
    )
    _, hist = run_steps(cfg)
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    assert hist[-1]["real_logits"] > hist[-1]["fake_logits"]


def test_warmup_cosine_schedule(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train,
            lr_schedule="linear_warmup_cosine",
            warmup_steps=2,
            total_steps=10,
        ),
    )
    _, hist = run_steps(cfg, n=3)
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    # step 1 runs at warmup lr (tiny) -> params barely move vs default
    from locate_tpu.objectives.optim import make_schedule

    sched = make_schedule(cfg.train.g_opt.lr, cfg.train)
    assert float(sched(0)) < float(sched(2))
    assert float(sched(9)) < float(sched(2))
