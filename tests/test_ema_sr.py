"""bf16 stochastic-rounding EMA (TrainConfig.ema_dtype="bfloat16"):
unbiasedness of the rounding itself, long-horizon tracking where
deterministic bf16 provably stalls, and in-step integration."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from locate_tpu.models.gan import build_gan
from locate_tpu.objectives.ema import ema_update, stochastic_round_bf16
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_train_step


def test_stochastic_round_unbiased():
    """E[round(x)] == x: average over many keys lands between the bf16
    neighbors, far closer to x than either neighbor alone."""
    x = jnp.asarray(np.float32(0.7519531))  # between two bf16 grid points
    rounds = jax.vmap(
        lambda k: stochastic_round_bf16(jnp.full((64,), x), k).astype(jnp.float32)
    )(jax.random.split(jax.random.PRNGKey(0), 256))
    lo = float(jnp.asarray(x).astype(jnp.bfloat16))  # nearest-down/up neighbors
    mean = float(rounds.mean())
    np.testing.assert_allclose(mean, float(x), rtol=2e-4)
    # every individual draw is a valid bf16 value equal to a grid neighbor
    uniq = np.unique(np.asarray(rounds))
    assert len(uniq) == 2 and uniq[0] <= float(x) <= uniq[1]
    assert abs(uniq[0] - lo) < 1e-6 or abs(uniq[1] - lo) < 1e-6


def test_sr_ema_tracks_where_bf16_stalls():
    """decay=0.999 toward target 1.0 from 0: the per-step increment is
    ~0.001*(1-e), below half a bf16 ulp almost immediately, so plain
    nearest-rounded bf16 accumulation stalls near zero; stochastic
    rounding must track the fp32 trajectory in expectation."""
    decay, steps = 0.999, 3000
    target = {"w": jnp.ones((32,), jnp.float32)}

    def run(dtype, stochastic):
        ema = {"w": jnp.zeros((32,), dtype)}

        def body(carry, k):
            e = carry
            if stochastic:
                e = ema_update(e, target, decay, sr_key=k)
            else:  # deterministic bf16: fp32 math, nearest-round store
                e = jax.tree.map(
                    lambda a, p: (
                        a.astype(jnp.float32) * decay
                        + p * (1.0 - decay)
                    ).astype(dtype),
                    e, target,
                )
            return e, None
        keys = jax.random.split(jax.random.PRNGKey(1), steps)
        ema, _ = jax.lax.scan(body, ema, keys)
        return float(ema["w"].astype(jnp.float32).mean())

    truth = 1.0 - decay**steps  # ~0.9502
    f32 = run(jnp.float32, stochastic=False)
    det_bf16 = run(jnp.bfloat16, stochastic=False)
    sr_bf16 = run(jnp.bfloat16, stochastic=True)
    np.testing.assert_allclose(f32, truth, rtol=1e-3)
    assert det_bf16 < 0.5 * truth, f"expected stall, got {det_bf16}"
    np.testing.assert_allclose(sr_bf16, truth, rtol=0.05)


def test_bf16_ema_in_train_step(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(tiny_config.train, ema_dtype="bfloat16"),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    assert all(
        l.dtype == jnp.bfloat16 for l in jax.tree.leaves(state.ema_params)
    )
    step = jax.jit(make_train_step(cfg, gan))
    batch = {
        "image": jax.random.uniform(
            jax.random.PRNGKey(1), (8, 16, 16, 3), minval=-1.0, maxval=1.0
        ),
        "label": jnp.zeros((8,), jnp.int32),
    }
    for _ in range(3):
        state, metrics = step(state, batch)
    leaves = jax.tree.leaves(state.ema_params)
    assert all(l.dtype == jnp.bfloat16 for l in leaves)
    assert all(np.isfinite(np.asarray(l, np.float32)).all() for l in leaves)
    # the shadow moved off its init (params changed and EMA tracks them)
    init_ema = jax.tree.leaves(
        create_train_state(cfg, gan, jax.random.PRNGKey(0)).ema_params
    )
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves, init_ema)
    )
    assert moved
