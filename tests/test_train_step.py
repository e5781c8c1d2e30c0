"""Train-step tests (SURVEY.md §5 items 3-4): loss trajectories finite and
moving the right way, jit==eager, determinism, EMA and conditional paths."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from locate_tpu.models.gan import build_gan
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_train_step


def make_batch(cfg, key):
    img = jax.random.uniform(
        key, (cfg.train.global_batch, cfg.model.resolution, cfg.model.resolution, 3),
        minval=-1.0, maxval=1.0,
    )
    labels = jnp.zeros((cfg.train.global_batch,), jnp.int32)
    return {"image": img, "label": labels}


def test_step_runs_and_counts(tiny_config):
    cfg = tiny_config
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    state, metrics = step(state, batch)
    assert int(state.step) == 1
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), f"{k} not finite"


def test_d_learns_on_fixed_data(tiny_config):
    """A few steps on a fixed batch: D should separate real from fake
    (real logits rise above fake logits) and all numerics stay finite."""
    cfg = tiny_config
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    history = []
    for _ in range(8):
        state, metrics = step(state, batch)
        history.append({k: float(v) for k, v in metrics.items()})
    assert all(np.isfinite(list(h.values())).all() for h in history)
    final = history[-1]
    assert final["real_logits"] > final["fake_logits"]
    # D loss should drop from its step-1 value
    assert final["d_loss"] < history[0]["d_loss"]


def test_deterministic(tiny_config):
    cfg = tiny_config
    gan = build_gan(cfg)
    step = jax.jit(make_train_step(cfg, gan))
    batch = make_batch(cfg, jax.random.PRNGKey(1))

    def run():
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        for _ in range(2):
            state, metrics = step(state, batch)
        return jax.device_get(metrics)

    m1, m2 = run(), run()
    for k in m1:
        np.testing.assert_array_equal(m1[k], m2[k], err_msg=k)


def test_ema_tracks_generator(tiny_config):
    cfg = tiny_config
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    ema_before = jax.tree.leaves(state.ema_params)[0].copy()
    state, _ = step(state, batch)
    ema_after = jax.tree.leaves(state.ema_params)[0]
    # EMA moved, but less than the raw params
    raw_after = jax.tree.leaves(state.g_params)[0]
    assert float(jnp.abs(ema_after - ema_before).max()) > 0
    assert float(jnp.abs(ema_after - ema_before).max()) <= float(
        jnp.abs(raw_after.astype(jnp.float32) - ema_before).max()
    ) + 1e-9


def test_ema_rampup(tiny_config):
    """train.ema_rampup (StyleGAN2-ADA): at step 0 the effective decay is
    ~0 — the shadow lands ON the updated generator — and the effective
    half-life grows linearly until it reaches the configured decay's."""
    import math

    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, ema_decay=0.99, ema_rampup=0.05
        ),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    state, _ = step(state, batch)
    # step 0: half-life = 0.05 steps -> decay 2^-20: shadow == new params
    for e, p in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(state.g_params)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(p),
                                   rtol=1e-5, atol=1e-6)
    # far past the ramp (step >= hl_target/rampup) the decay must equal
    # the configured one: pin via the update identity on a synthetic state
    hl_target = math.log(0.5) / math.log(cfg.train.ema_decay)
    far = int(hl_target / cfg.train.ema_rampup) + 10
    state_far = dataclasses.replace(
        state, step=jnp.asarray(far, jnp.int32),
        ema_params=jax.tree.map(jnp.zeros_like, state.ema_params),
    )
    out, _ = step(state_far, batch)
    # zero shadow -> new_ema = (1-d) * g_params, d = ema_decay exactly
    got = jax.tree.leaves(out.ema_params)[0]
    want = (1.0 - cfg.train.ema_decay) * jax.tree.leaves(out.g_params)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)


def test_conditional_step(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        model=dataclasses.replace(tiny_config.model, num_classes=4, class_embed_dim=8),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    batch["label"] = jnp.arange(cfg.train.global_batch, dtype=jnp.int32) % 4
    state, metrics = step(state, batch)
    assert all(bool(jnp.isfinite(v)) for v in metrics.values())


def test_r1_branch(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(tiny_config.train, r1_gamma=1.0, r1_interval=2),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    state, m0 = step(state, batch)  # step 0: R1 active (0 % 2 == 0)
    state, m1 = step(state, batch)  # step 1: lazy-off
    assert float(m0["r1"]) > 0.0
    assert float(m1["r1"]) == 0.0


def test_uint8_batch_normalized(tiny_config):
    """uint8 batches are normalized on device to [-1,1]."""
    cfg = tiny_config
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = {
        "image": jnp.zeros(
            (cfg.train.global_batch, 16, 16, 3), jnp.uint8
        ),
        "label": jnp.zeros((cfg.train.global_batch,), jnp.int32),
    }
    _, metrics = step(state, batch)
    assert bool(jnp.isfinite(metrics["d_loss"]))
