"""Discriminator augmentation (ops/augment.py) + ADA controller: identity
at p=0, determinism, differentiability (the G step backprops through
aug(G(z))), controller movement, pytree stability, and DP equality of the
augmented program."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from locate_tpu.config import ParallelConfig
from locate_tpu.models.gan import build_gan
from locate_tpu.ops.augment import augment_pipeline
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_train_step


def _imgs(key, n=4, hw=16, c=3):
    return jax.random.uniform(key, (n, hw, hw, c), minval=-1.0, maxval=1.0)


def test_identity_at_p0():
    x = _imgs(jax.random.PRNGKey(0))
    y = augment_pipeline(jax.random.PRNGKey(1), x, 0.0)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_deterministic_and_changes_at_p1():
    x = _imgs(jax.random.PRNGKey(0))
    y1 = augment_pipeline(jax.random.PRNGKey(1), x, 1.0)
    y2 = augment_pipeline(jax.random.PRNGKey(1), x, 1.0)
    y3 = augment_pipeline(jax.random.PRNGKey(2), x, 1.0)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert not np.array_equal(np.asarray(y1), np.asarray(y3))
    assert not np.array_equal(np.asarray(y1), np.asarray(x))
    assert y1.shape == x.shape and y1.dtype == x.dtype
    assert np.isfinite(np.asarray(y1)).all()
    # cutout at p=1 zeroes an (h/2, w/2) region per sample
    zeros = (np.asarray(y1) == 0.0).all(-1).sum(axis=(1, 2))
    assert (zeros >= (16 // 4) * (16 // 4)).all()


def test_geometry_preserves_pixel_multiset():
    """With only geometric ops active (flip+translate are the ops that
    move pixels; color/cutout change values), the per-sample pixel
    multiset must be preserved. Isolate geometry by checking a key where
    color/cutout happened not to apply is unnecessary — instead verify on
    a constant image that geometry+cutout can only produce the constant
    or 0, never new values."""
    x = jnp.full((3, 16, 16, 3), 0.5, jnp.float32)
    y = np.asarray(augment_pipeline(jax.random.PRNGKey(5), x, 1.0))
    # brightness/contrast/saturation act per-sample uniformly on a
    # constant image -> each sample holds at most 2 distinct values
    # (transformed constant, cutout zero)
    for i in range(3):
        assert len(np.unique(y[i].round(5))) <= 2


def test_blit_group_membership():
    """ops=("geom",) at p=1: every output sample must be EXACTLY some
    element of the pixel-blitting group (x-flip x rot90 x wrap-around
    translation) applied to its input — enumerated exhaustively at 8x8.
    Catches any indexing bug in the fused gather (a clamp instead of a
    wrap, a transposed rotation, an off-by-one) that multiset tests
    cannot see."""
    h = 8
    x = np.arange(4 * h * h * 1, dtype=np.float32).reshape(4, h, h, 1)
    y = np.asarray(
        augment_pipeline(jax.random.PRNGKey(7), jnp.asarray(x), 1.0,
                         ops=("geom",))
    )
    max_t = h // 8  # translation range used by the pipeline

    def candidates(img):
        for flip in (False, True):
            a = img[:, ::-1] if flip else img
            for ty in range(-max_t, max_t + 1):
                b = np.roll(a, ty, axis=0)
                for tx in range(-max_t, max_t + 1):
                    c = np.roll(b, tx, axis=1)
                    for k in range(4):
                        yield np.rot90(c, k)

    for i in range(4):
        assert any(
            np.array_equal(y[i], cand) for cand in candidates(x[i])
        ), f"sample {i} is not a blit-group element"


def test_rot90_actually_fires():
    """At p=1 with many samples, some output must differ from every
    flip+translate-only candidate (i.e. rotation by 90/270 occurred) —
    pins that the rotation branch is live, not dead code."""
    h = 8
    n = 16
    x = np.arange(n * h * h, dtype=np.float32).reshape(n, h, h, 1)
    y = np.asarray(
        augment_pipeline(jax.random.PRNGKey(3), jnp.asarray(x), 1.0,
                         ops=("geom",))
    )
    max_t = h // 8

    def no_rot_candidates(img):
        for flip in (False, True):
            a = img[:, ::-1] if flip else img
            for ty in range(-max_t, max_t + 1):
                for tx in range(-max_t, max_t + 1):
                    yield np.roll(np.roll(a, ty, 0), tx, 1)
                    # 180 = flip-x + flip-y, reachable without axis swap:
                    yield np.roll(np.roll(a[::-1, ::-1], ty, 0), tx, 1)

    rotated = [
        not any(np.array_equal(y[i], c) for c in no_rot_candidates(x[i]))
        for i in range(n)
    ]
    assert any(rotated), "no sample shows a 90/270 rotation at p=1"


def test_noise_category():
    """ADA's additive-noise corruption ("noise", opt-in): p=0 identity,
    p=1 additive (pixel deltas are per-sample-scaled Gaussian — the image
    structure survives, unlike cutout/geom), disjoint key stream (other
    categories' outputs unchanged by toggling it), differentiable with
    identity gradient on the image path."""
    x = _imgs(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    y0 = augment_pipeline(k, x, 0.0, ops=("noise",))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y0))
    y1 = augment_pipeline(k, x, 1.0, ops=("noise",))
    d = np.asarray(y1 - x)
    assert (np.abs(d) > 0).mean() > 0.99  # dense perturbation
    assert np.abs(d).mean() < 0.5         # small (sigma ~ |N|*0.1)
    # per-sample sigma differs (half-normal draw per sample)
    stds = d.reshape(d.shape[0], -1).std(axis=1)
    assert stds.std() > 1e-3
    # toggling "noise" must not shift the other categories' draws
    a = augment_pipeline(k, x, 1.0, ops=("geom", "color", "cutout"))
    b = augment_pipeline(k, x, 1.0, ops=("geom", "color", "noise", "cutout"))
    # subtracting the same geom/color/cutout output isolates the noise
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    # additive => gradient of sum(aug(x)) w.r.t. x is exactly ones
    g = jax.grad(lambda im: jnp.sum(augment_pipeline(k, im, 1.0,
                                                     ops=("noise",))))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0, rtol=1e-6)


def test_ops_subset_identity():
    """Disabled categories are structurally absent: geom-only output of a
    constant image is the image itself (geometry permutes equal pixels),
    and color-only preserves the pixel ordering (no gather)."""
    x = jnp.full((2, 8, 8, 3), 0.5, jnp.float32)
    y = augment_pipeline(jax.random.PRNGKey(0), x, 1.0, ops=("geom",))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_differentiable():
    x = _imgs(jax.random.PRNGKey(0))

    def f(x):
        return augment_pipeline(jax.random.PRNGKey(1), x, 1.0).sum()

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_traced_p_no_recompile():
    """p is a traced scalar: one compilation serves every p."""
    x = _imgs(jax.random.PRNGKey(0))
    calls = {"n": 0}

    @jax.jit
    def run(x, p):
        calls["n"] += 1  # traces count, not executions
        return augment_pipeline(jax.random.PRNGKey(1), x, p)

    a = run(x, jnp.asarray(0.2))
    b = run(x, jnp.asarray(0.9))
    assert calls["n"] == 1
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_ada_controller_moves_p(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, augment_p=0.5, ada_target=0.6,
            ada_speed_kimg=1,  # fast: delta = 8/(1*1000) = 8e-3/step
        ),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    assert float(state.ada_p) == 0.5
    step = jax.jit(make_train_step(cfg, gan))
    batch = {"image": _imgs(jax.random.PRNGKey(1), n=8), "label": jnp.zeros((8,), jnp.int32)}
    for _ in range(3):
        state, metrics = step(state, batch)
    delta = 8 / (1 * 1000)
    moved = float(state.ada_p) - 0.5
    # each step moves p by exactly +-delta (sign of r - target)
    assert abs(moved) <= 3 * delta + 1e-7
    steps_worth = moved / delta
    np.testing.assert_allclose(steps_worth, round(steps_worth), atol=1e-4)
    assert "augment_p" in metrics and "ada_r" in metrics
    assert 0.0 <= float(metrics["augment_p"]) <= 1.0


def test_pytree_stable_when_disabled(tiny_config):
    gan = build_gan(tiny_config)
    s_off = create_train_state(tiny_config, gan, jax.random.PRNGKey(0))
    assert s_off.ada_p is None
    cfg_on = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(tiny_config.train, augment_p=0.3),
    )
    s_on = create_train_state(cfg_on, build_gan(cfg_on), jax.random.PRNGKey(0))
    assert float(s_on.ada_p) == np.float32(0.3)
    # off-state has exactly one fewer leaf (the scalar p)
    assert len(jax.tree.leaves(s_on)) == len(jax.tree.leaves(s_off)) + 1


def test_augmented_dp_matches_single_device(tiny_config):
    """The augmented program under GSPMD DP must equal the single-device
    trajectory (partitionable threefry makes the per-sample draws
    layout-invariant) — guards the SPMD-partitioner class of bug for the
    augmentation path."""
    from locate_tpu.parallel.mesh import make_mesh, single_device_mesh
    from locate_tpu.parallel.sharding import (
        make_sharded_train_step,
        place_train_state,
    )

    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, augment_p=0.7, ada_target=0.6
        ),
    )
    gan = build_gan(cfg)
    batch_host = {
        "image": _imgs(jax.random.PRNGKey(1), n=8),
        "label": jnp.zeros((8,), jnp.int32),
    }

    def run(mesh):
        with mesh:
            jit_for, sh_for, b_shard = make_sharded_train_step(cfg, gan, mesh)
            state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
            state = place_train_state(state, sh_for(state))
            step = jit_for(state)
            batch = jax.device_put(batch_host, {"image": b_shard, "label": b_shard})
            hist = []
            for _ in range(2):
                state, m = step(state, batch)
                hist.append({k: float(v) for k, v in m.items()})
            return hist

    h1 = run(single_device_mesh(cfg.parallel))
    h8 = run(make_mesh(cfg.parallel))
    for a, b in zip(h1, h8):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=5e-4, err_msg=k)


def test_augment_p_is_last_metric_under_scan(tiny_config):
    """With steps_per_call, the logged augment_p must be the window's LAST
    value (== state.ada_p), not the mean — it is controller state."""
    from locate_tpu.train.step import make_multi_step

    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, augment_p=0.5, ada_target=0.6,
            ada_speed_kimg=1,
        ),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    multi = jax.jit(make_multi_step(make_train_step(cfg, gan), 2))
    batch = {
        "image": _imgs(jax.random.PRNGKey(1), n=8),
        "label": jnp.zeros((8,), jnp.int32),
    }
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), batch)
    state, metrics = multi(state, stacked)
    np.testing.assert_allclose(
        float(metrics["augment_p"]), float(state.ada_p), rtol=0, atol=0
    )
