"""LeCam regularization (train.lecam_gamma — arXiv 2104.03310): D loss
gains relu-clipped penalties pulling real logits toward the fake-mean EMA
tracker and fake logits toward the real-mean one; the two trackers live in
TrainState.lecam and update every optimizer step from the pmean'd
batch-mean logits."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locate_tpu.config import TrainConfig
from locate_tpu.models.gan import build_gan
from locate_tpu.objectives.losses import lecam_penalty
from locate_tpu.parallel.mesh import make_mesh, single_device_mesh
from locate_tpu.parallel.sharding import (
    make_sharded_train_step,
    place_train_state,
)
from locate_tpu.train.state import create_train_state


def _cfg(tiny_config, **train_kw):
    return dataclasses.replace(
        tiny_config, train=dataclasses.replace(tiny_config.train, **train_kw)
    )


def _run(cfg, mesh, n_steps=3):
    """Train n_steps on a fixed batch; return (metric history, final state)."""
    gan = build_gan(cfg)
    with mesh:
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        jit_for, sh_for, b_shard = make_sharded_train_step(cfg, gan, mesh)
        state = place_train_state(state, sh_for(state))
        step = jit_for(state)
        img = jax.random.uniform(
            jax.random.PRNGKey(1),
            (cfg.train.global_batch, cfg.model.resolution,
             cfg.model.resolution, 3),
            minval=-1.0, maxval=1.0,
        )
        batch = jax.device_put(
            {"image": img,
             "label": jnp.zeros((cfg.train.global_batch,), jnp.int32)},
            {"image": b_shard, "label": b_shard},
        )
        hist = []
        for _ in range(n_steps):
            state, metrics = step(state, batch)
            hist.append({k: float(v) for k, v in metrics.items()})
        state = jax.device_get(state)
    return hist, state


def test_config_validation():
    with pytest.raises(ValueError):
        TrainConfig(lecam_gamma=-0.1)
    with pytest.raises(ValueError):
        TrainConfig(lecam_decay=1.0)
    TrainConfig(lecam_gamma=0.3, lecam_decay=0.99)


def test_lecam_penalty_torch_golden():
    """lecam_penalty == the official-implementation form
    mean(relu(real - ema_f)^2) + mean(relu(ema_r - fake)^2), value AND
    gradients w.r.t. both logit vectors (torch autograd as the oracle)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    r = rng.normal(size=(16,)).astype(np.float32)
    f = rng.normal(size=(16,)).astype(np.float32)
    ema_r, ema_f = 0.37, -0.21

    tr = torch.tensor(r, requires_grad=True)
    tf = torch.tensor(f, requires_grad=True)
    ref = (torch.relu(tr - ema_f).pow(2).mean()
           + torch.relu(torch.tensor(ema_r) - tf).pow(2).mean())
    ref.backward()

    val, grads = jax.value_and_grad(
        lambda rr, ff: lecam_penalty(rr, ff, jnp.float32(ema_r),
                                     jnp.float32(ema_f)),
        argnums=(0, 1),
    )(jnp.asarray(r), jnp.asarray(f))
    np.testing.assert_allclose(float(val), float(ref.detach()), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grads[0]), tr.grad.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads[1]), tf.grad.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_lecam_tracker_chain(tiny_config):
    """state.lecam after k steps equals the hand-computed EMA chain over
    the logged per-step batch-mean logits (decay applied every step,
    trackers start at 0)."""
    decay = 0.9
    cfg = _cfg(tiny_config, lecam_gamma=0.1, lecam_decay=decay)
    hist, state = _run(cfg, single_device_mesh(cfg.parallel), n_steps=3)
    ema = np.zeros(2, np.float64)
    for m in hist:
        ema = decay * ema + (1 - decay) * np.array(
            [m["real_logits"], m["fake_logits"]]
        )
    np.testing.assert_allclose(np.asarray(state.lecam), ema,
                               rtol=1e-4, atol=1e-6)
    assert all(np.isfinite(list(m.values())).all() for m in hist)
    assert "lecam" in hist[0]


def test_lecam_trackers_skip_nonfinite_batches(tiny_config):
    """A NaN batch (non-finite logits) must not poison the trackers:
    the update is gated on isfinite, mirroring apply_if_finite's
    protection of the params (ADVICE r3)."""
    cfg = _cfg(tiny_config, lecam_gamma=0.1, lecam_decay=0.9)
    gan = build_gan(cfg)
    mesh = single_device_mesh(cfg.parallel)
    with mesh:
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        jit_for, sh_for, b_shard = make_sharded_train_step(cfg, gan, mesh)
        state = place_train_state(state, sh_for(state))
        step = jit_for(state)
        shape = (cfg.train.global_batch, cfg.model.resolution,
                 cfg.model.resolution, 3)
        lab = jnp.zeros((cfg.train.global_batch,), jnp.int32)
        good = jax.device_put(
            {"image": jax.random.uniform(jax.random.PRNGKey(1), shape,
                                         minval=-1.0, maxval=1.0),
             "label": lab},
            {"image": b_shard, "label": b_shard},
        )
        bad = jax.device_put(
            {"image": jnp.full(shape, jnp.nan, jnp.float32), "label": lab},
            {"image": b_shard, "label": b_shard},
        )
        state, _ = step(state, good)
        after_good = np.asarray(jax.device_get(state.lecam))
        assert np.isfinite(after_good).all()
        state, _ = step(state, bad)
        after_bad = np.asarray(jax.device_get(state.lecam))
        np.testing.assert_array_equal(after_bad, after_good)
        # and training recovers: the next finite batch moves them again
        state, m = step(state, good)
        assert np.isfinite(np.asarray(jax.device_get(state.lecam))).all()


def test_lecam_dp_matches_single_device(tiny_config):
    """Trackers update from pmean'd means and the penalty is a global-batch
    mean, so the LeCam program stays DP == single-device."""
    cfg = _cfg(tiny_config, lecam_gamma=0.3)
    h1, s1 = _run(cfg, single_device_mesh(cfg.parallel))
    h8, s8 = _run(cfg, make_mesh(cfg.parallel))
    for a, b in zip(h1, h8):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=5e-4,
                                       err_msg=k)
    np.testing.assert_allclose(np.asarray(s1.lecam), np.asarray(s8.lecam),
                               rtol=5e-4, atol=5e-5)


def test_lecam_disabled_keeps_pytree(tiny_config):
    """lecam_gamma=0 leaves TrainState.lecam None — existing checkpoints
    and pinned trajectories see no structure change."""
    gan = build_gan(tiny_config)
    s = create_train_state(tiny_config, gan, jax.random.PRNGKey(0))
    assert s.lecam is None


def test_restore_backfills_lecam_enabled_on_resume(tiny_config, tmp_path):
    """Enable LeCam on a run checkpointed without it: the trackers backfill
    from the template's zeros (the official init; they re-warm in
    ~1/(1-decay) steps)."""
    from locate_tpu.io.checkpoint import CheckpointManager

    gan = build_gan(tiny_config)
    s0 = create_train_state(tiny_config, gan, jax.random.PRNGKey(0))
    assert s0.lecam is None
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=1, async_save=False)
    mgr.save(s0, step=2)
    mgr.close()

    cfg_lc = _cfg(tiny_config, lecam_gamma=0.3)
    tmpl = create_train_state(cfg_lc, build_gan(cfg_lc), jax.random.PRNGKey(0))
    mgr2 = CheckpointManager(str(tmp_path / "ck"), keep=1, async_save=False)
    restored = mgr2.restore(tmpl)
    mgr2.close()
    assert restored.lecam is not None
    np.testing.assert_array_equal(np.asarray(restored.lecam), np.zeros(2))
