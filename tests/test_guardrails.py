"""Divergence guardrails for FINITE blow-ups (VERDICT r4 #2): the r4
flagship run applied finite-but-exploded updates (|g| up to 3.3e17) for
hours because apply_if_finite only skips NaN/Inf, and optax.global_norm's
metric itself overflowed to inf. Pins:

* safe_global_norm — overflow-proof (scaled sum-of-squares, f32),
  agrees with optax.global_norm in the normal range, finite where optax
  overflows, non-finite iff the tree is;
* skip_if_too_large — over-limit updates are skipped (params AND Adam
  moments untouched), counted (total + consecutive streak), distinct
  from non-finite skips;
* train-step integration — metrics carry d/g_grad_limit_count/_streak,
  a generous limit changes nothing, grad_accum state access works;
* loop integration — the abort fires on a persistent over-limit streak.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from locate_tpu.models.gan import build_gan
from locate_tpu.objectives.optim import (
    guard_stats,
    make_optimizers,
    safe_global_norm,
    skip_if_too_large,
)
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_train_step


# ---------------------------------------------------------------------------
# safe_global_norm
# ---------------------------------------------------------------------------


def test_safe_norm_matches_optax_in_normal_range():
    tree = {
        "a": jnp.linspace(-2.0, 3.0, 37).reshape(37, 1),
        "b": {"c": jnp.full((4, 4), 0.5), "d": jnp.zeros((3,))},
    }
    np.testing.assert_allclose(
        float(safe_global_norm(tree)), float(optax.global_norm(tree)),
        rtol=1e-6,
    )


def test_safe_norm_survives_overflow_scale():
    """Leaves at 1e25: squaring overflows f32 (optax -> inf); the scaled
    form stays exact."""
    tree = {"w": jnp.full((64,), 1e25, jnp.float32),
            "b": jnp.zeros((8,), jnp.float32)}
    assert not np.isfinite(float(optax.global_norm(tree)))  # the r4 failure
    got = float(safe_global_norm(tree))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, 1e25 * np.sqrt(64.0), rtol=1e-6)


def test_safe_norm_bf16_and_empty_and_zero():
    assert float(safe_global_norm({"x": jnp.zeros((5,), jnp.bfloat16)})) == 0.0
    assert float(safe_global_norm({})) == 0.0
    # huge bf16 grads (squaring overflows even f64's comfort zone for
    # optax's f32 path) stay finite as long as the NORM fits f32
    b = jnp.full((16,), 1.0e37, jnp.bfloat16)
    got = float(safe_global_norm({"x": b}))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, float(b[0]) * 4.0, rtol=1e-2)


@pytest.mark.parametrize("bad", [jnp.nan, jnp.inf])
def test_safe_norm_propagates_nonfinite(bad):
    tree = {"a": jnp.ones((4,)), "b": jnp.array([1.0, bad, 2.0])}
    assert not np.isfinite(float(safe_global_norm(tree)))


# ---------------------------------------------------------------------------
# skip_if_too_large (unit, around a bare Adam)
# ---------------------------------------------------------------------------


def _params():
    return {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}


def test_skip_if_too_large_applies_and_skips():
    opt = skip_if_too_large(optax.adam(1e-1), limit=10.0)
    params = _params()
    state = opt.init(params)

    small = jax.tree.map(jnp.ones_like, params)
    upd, state = opt.update(small, state, params)
    assert any(float(jnp.abs(u).max()) > 0 for u in jax.tree.leaves(upd))
    assert int(state.toolarge_count) == 0 and int(state.toolarge_streak) == 0

    inner_before = state.inner_state
    huge = jax.tree.map(lambda p: jnp.full_like(p, 1e6), params)
    upd, state = opt.update(huge, state, params)
    # skipped: zero updates, Adam moments untouched by the exploded grad
    assert all(float(jnp.abs(u).max()) == 0 for u in jax.tree.leaves(upd))
    for a, b in zip(jax.tree.leaves(inner_before),
                    jax.tree.leaves(state.inner_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state.toolarge_count) == 1 and int(state.toolarge_streak) == 1
    assert float(state.grad_norm) == pytest.approx(1e6 * np.sqrt(6.0), rel=1e-5)

    upd, state = opt.update(huge, state, params)
    assert int(state.toolarge_count) == 2 and int(state.toolarge_streak) == 2

    upd, state = opt.update(small, state, params)  # streak resets, count stays
    assert int(state.toolarge_count) == 2 and int(state.toolarge_streak) == 0


def test_nonfinite_goes_to_nonfinite_guard_not_limit():
    """NaN grads must tick apply_if_finite's counter, NOT the limit's —
    the two events stay distinguishable in metrics."""
    inner = optax.apply_if_finite(optax.adam(1e-1),
                                  max_consecutive_errors=10**9)
    opt = skip_if_too_large(inner, limit=10.0)
    params = _params()
    state = opt.init(params)
    nan_grads = jax.tree.map(lambda p: jnp.full_like(p, jnp.nan), params)
    upd, state = opt.update(nan_grads, state, params)
    assert int(state.toolarge_count) == 0
    assert int(state.inner_state.notfinite_count) == 1
    assert all(float(jnp.abs(u).max()) == 0 for u in jax.tree.leaves(upd))


def test_guard_stats_reads_nesting(tiny_config):
    """guard_stats must track make_optimizers' wrapper nesting for every
    combination of grad_accum x grad_norm_limit x max_nonfinite_skips."""
    for accum in (1, 2):
        for lim in (0.0, 5.0):
            tcfg = dataclasses.replace(
                tiny_config.train, grad_accum=accum, grad_norm_limit=lim,
                max_nonfinite_skips=3,
            )
            g_opt, _ = make_optimizers(tcfg)
            params = _params()
            st = g_opt.init(params)
            stats = guard_stats(st, tcfg)
            assert "nonfinite_streak" in stats
            assert ("grad_limit_count" in stats) == (lim > 0)
            g = jax.tree.map(lambda p: jnp.full_like(p, 100.0), params)
            for _ in range(accum):  # one full optimizer emit
                _, st = g_opt.update(g, st, params)
            stats = guard_stats(st, tcfg)
            if lim > 0:
                assert int(stats["grad_limit_count"]) == 1
            assert int(stats["nonfinite_streak"]) == 0


# ---------------------------------------------------------------------------
# train-step integration
# ---------------------------------------------------------------------------


def _batch(cfg, key=0):
    return {
        "image": jax.random.uniform(
            jax.random.PRNGKey(key), (cfg.train.global_batch, 16, 16, 3),
            minval=-1.0, maxval=1.0,
        ),
        "label": jnp.zeros((cfg.train.global_batch,), jnp.int32),
    }


def _with_limit(tiny_config, limit, **kw):
    return dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, grad_norm_limit=limit,
            max_nonfinite_skips=5, **kw,
        ),
    )


def test_step_tiny_limit_skips_and_reports(tiny_config):
    cfg = _with_limit(tiny_config, 1e-8)
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    before = jax.tree.map(lambda x: x.copy(), (state.g_params, state.d_params))
    state, metrics = step(state, _batch(cfg))
    for bl, al in zip(jax.tree.leaves(before),
                      jax.tree.leaves((state.g_params, state.d_params))):
        np.testing.assert_array_equal(np.asarray(bl), np.asarray(al))
    assert int(metrics["d_grad_limit_streak"]) == 1
    assert int(metrics["g_grad_limit_streak"]) == 1
    assert int(metrics["d_grad_limit_count"]) == 1
    assert int(metrics["d_nonfinite_streak"]) == 0
    # the norm METRIC stays readable even though the update was skipped
    assert np.isfinite(float(metrics["d_grad_norm"]))
    state, metrics = step(state, _batch(cfg, 1))
    assert int(metrics["d_grad_limit_streak"]) == 2


def test_step_generous_limit_is_identity(tiny_config):
    """grad_norm_limit far above the healthy envelope must not change the
    trajectory at all (the wrapper's where-selects are pure pass-through)."""
    cfg_off = _with_limit(tiny_config, 0.0)
    cfg_on = _with_limit(tiny_config, 1e9)
    out = []
    for cfg in (cfg_off, cfg_on):
        gan = build_gan(cfg)
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, gan))
        for i in range(3):
            state, metrics = step(state, _batch(cfg, i))
        out.append((state.g_params, float(metrics["d_loss"])))
    for a, b in zip(jax.tree.leaves(out[0][0]), jax.tree.leaves(out[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    assert out[0][1] == pytest.approx(out[1][1], rel=1e-5)


def test_multi_step_scan_reports_last_streak(tiny_config):
    """Under steps_per_call>1 the guard counters are running state: the
    window must report the LAST step's value (k after one k-step call
    with everything skipped), not the window mean."""
    from locate_tpu.train.step import make_multi_step

    cfg = _with_limit(tiny_config, 1e-8)
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    k = 2
    step = jax.jit(make_multi_step(make_train_step(cfg, gan), k))
    b = _batch(cfg)
    batches = {kk: jnp.stack([v] * k) for kk, v in b.items()}
    state, metrics = step(state, batches)
    assert int(metrics["d_grad_limit_streak"]) == k
    assert int(metrics["d_grad_limit_count"]) == k
    state, metrics = step(state, batches)
    assert int(metrics["d_grad_limit_streak"]) == 2 * k


def test_loop_aborts_on_limit_streak(tiny_config, tmp_path):
    from locate_tpu.train.loop import train

    cfg = dataclasses.replace(
        tiny_config,
        workdir=str(tmp_path / "run"),
        train=dataclasses.replace(
            tiny_config.train, grad_norm_limit=1e-8, max_nonfinite_skips=3,
            log_every=1, sample_every=0, checkpoint_every=0,
        ),
    )
    with pytest.raises(RuntimeError, match="grad_norm_limit"):
        train(cfg, total_steps=10)


def test_loop_warns_on_limit_events(tiny_config, tmp_path, capsys):
    from locate_tpu.train.loop import train

    cfg = dataclasses.replace(
        tiny_config,
        workdir=str(tmp_path / "run"),
        train=dataclasses.replace(
            tiny_config.train, grad_norm_limit=1e-8, max_nonfinite_skips=200,
            log_every=2, sample_every=0, checkpoint_every=0,
        ),
    )
    train(cfg, total_steps=4)
    out = capsys.readouterr().out
    assert "WARNING" in out and "grad" in out and "skipped" in out


def test_shipped_presets_carry_the_guard_recipe():
    """Pin the r5 recipe as shipped (docs/QUALITY_r5.md §4-5): every
    preset carries the finite-blow-up guard backstop, and the 128^2
    flagship ships the sweep-validated arm-e recipe — r1_gamma=1.0 +
    grad_norm_limit=1e6 + gate_max=16. A silent revert of any of these
    re-opens the r4 collapse mode (the per-net clip ladder remains an
    opt-in knob; see the preset docstring's tuning notes)."""
    from locate_tpu.config import PRESETS, get_config

    for name in PRESETS:
        cfg = get_config(name)
        assert cfg.train.grad_norm_limit > 0, name
        assert cfg.train.max_nonfinite_skips > 0, name
        assert cfg.model.attention.gate_max == 16.0, name

    flagship = get_config("lsun_bedroom_128")
    assert flagship.train.r1_gamma == 1.0
    assert flagship.train.r1_interval == 16
    assert flagship.train.grad_norm_limit == 1e6
