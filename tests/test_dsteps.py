"""Critic ratio (train.d_steps — WGAN n_critic, arXiv 1701.07875 Alg. 1):
the scanned multi-critic step against a hand-rolled reference chain built
from the same public primitives (no scan), training behavior, composition
with steps_per_call, DP equality, the loop's d_steps-aware data accounting
(fresh-vs-resume trajectory identity), and config validation."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from locate_tpu.config import TrainConfig
from locate_tpu.models.gan import build_gan
from locate_tpu.objectives.ema import ema_update
from locate_tpu.objectives.losses import get_losses
from locate_tpu.objectives.optim import make_optimizers
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_multi_step, make_train_step


def _cfg(tiny_config, **train_kw):
    return dataclasses.replace(
        tiny_config, train=dataclasses.replace(tiny_config.train, **train_kw)
    )


def _stacked_batch(cfg, key, c):
    n = cfg.train.global_batch
    img = jax.random.uniform(
        key, (c, n, cfg.model.resolution, cfg.model.resolution, 3),
        minval=-1.0, maxval=1.0,
    )
    return {"image": img, "label": jnp.zeros((c, n), jnp.int32)}


def _assert_trees_close(got, want, name, rtol=5e-5, atol=5e-6):
    """Param-tree equality, skipping the attention gate's `to_logits.b`:
    a softmax over locations is invariant to a uniform logit shift, so
    that bias is structurally gradient-free — Adam amplifies its
    float-noise gradients to lr-sized steps whose direction depends on
    compilation (scan vs unrolled), in ANY two differently-compiled but
    semantically identical programs. Every O(1)-gradient leaf must agree
    to reassociation noise (~1e-5); a semantic error (wrong key family,
    wrong update order) shows as lr-sized diffs across whole leaves."""
    flat_w = {jax.tree_util.keystr(p): l
              for p, l in jax.tree_util.tree_leaves_with_path(want)}
    checked = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(got):
        key = jax.tree_util.keystr(path)
        if "to_logits" in key and key.endswith("['b']"):
            continue
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_w[key]), rtol=rtol, atol=atol,
            err_msg=f"{name}:{key}",
        )
        checked += 1
    assert checked >= 10


def test_dsteps_matches_reference_chain(tiny_config):
    """One d_steps=2 call == the documented semantics composed by hand:
    critic i trains on real batch i + fresh latents from the
    fold_in(rng, i) family at the CURRENT critic params, then one G update
    through the twice-updated D, then EMA."""
    cfg = _cfg(tiny_config, d_steps=2)
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    # Randomize the zero-init gate leaves: their true gradients are
    # noise-level, and Adam normalizes noise to full lr-sized steps —
    # which amplifies scan-vs-unrolled float reassociation into false
    # mismatches (every O(1)-gradient leaf agrees to 1e-8 regardless).
    from test_model_parity_torch import randomize_zero_init

    state = dataclasses.replace(
        state,
        g_params=randomize_zero_init(state.g_params, jax.random.PRNGKey(7)),
        d_params=randomize_zero_init(state.d_params, jax.random.PRNGKey(8)),
    )
    state = dataclasses.replace(
        state, ema_params=jax.tree.map(jnp.copy, state.g_params)
    )
    batch = _stacked_batch(cfg, jax.random.PRNGKey(1), 2)
    step = jax.jit(make_train_step(cfg, gan))
    new_state, metrics = step(state, batch)

    # --- hand-rolled chain (same primitives, no scan) ---
    g_opt, d_opt = make_optimizers(cfg.train)
    g_loss_of, d_loss_of = get_losses(cfg.train.loss)
    rng = state.rng
    real_all = batch["image"].astype(jnp.float32)
    n = cfg.train.global_batch
    k_ema, k_zg, k_lg = jax.random.split(rng, 3)
    d_params, d_opt_state = state.d_params, state.d_opt_state
    for i in range(2):
        ri = jax.random.fold_in(rng, i)
        z = gan.sample_latents(jax.random.fold_in(ri, 1), n)
        fake = gan.generator.apply(state.g_params, z, None)
        real_i = real_all[i]

        def d_loss_fn(p):
            return d_loss_of(
                gan.discriminator.apply(p, real_i, None),
                gan.discriminator.apply(p, fake, None),
            )

        grads = jax.grad(d_loss_fn)(d_params)
        upd, d_opt_state = d_opt.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, upd)

    z_g = gan.sample_latents(k_zg, n)

    def g_loss_fn(p):
        return g_loss_of(
            gan.discriminator.apply(d_params, gan.generator.apply(p, z_g, None))
        )

    g_grads = jax.grad(g_loss_fn)(state.g_params)
    g_upd, _ = g_opt.update(g_grads, state.g_opt_state, state.g_params)
    g_params = optax.apply_updates(state.g_params, g_upd)
    ema_params = ema_update(state.ema_params, g_params, cfg.train.ema_decay)

    for got, want, name in (
        (new_state.d_params, d_params, "d_params"),
        (new_state.g_params, g_params, "g_params"),
        (new_state.ema_params, ema_params, "ema_params"),
    ):
        _assert_trees_close(got, want, name)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["d_loss"]))


def test_dsteps_trains_and_differs(tiny_config):
    runs = {}
    for c in (1, 2):
        cfg = _cfg(tiny_config, d_steps=c)
        gan = build_gan(cfg)
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, gan))
        for s in range(3):
            b = _stacked_batch(cfg, jax.random.fold_in(jax.random.PRNGKey(1), s), c)
            if c == 1:
                b = {k: v[0] for k, v in b.items()}
            state, m = step(state, b)
        runs[c] = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in runs[c].values()), runs[c]
        assert int(state.step) == 3
    assert runs[2]["d_loss"] != runs[1]["d_loss"]


def test_dsteps_composes_with_steps_per_call(tiny_config):
    """k=2 dispatches x c=2 critics: the (k, c, n, ...) scan-of-scan equals
    two sequential c-stacked calls on the same stream."""
    from test_model_parity_torch import randomize_zero_init

    cfg = _cfg(tiny_config, d_steps=2, steps_per_call=2, log_every=2,
               sample_every=0, checkpoint_every=0)
    gan = build_gan(cfg)
    b1 = _stacked_batch(cfg, jax.random.PRNGKey(11), 2)
    b2 = _stacked_batch(cfg, jax.random.PRNGKey(12), 2)

    def init_state():
        # randomize zero-init gate leaves (see the reference-chain test:
        # Adam amplifies their noise-level grads to lr-sized mismatches)
        s = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        s = dataclasses.replace(
            s,
            g_params=randomize_zero_init(s.g_params, jax.random.PRNGKey(7)),
            d_params=randomize_zero_init(s.d_params, jax.random.PRNGKey(8)),
        )
        return dataclasses.replace(
            s, ema_params=jax.tree.map(jnp.copy, s.g_params)
        )

    single = jax.jit(make_train_step(cfg, gan))
    state_a = init_state()
    state_a, _ = single(state_a, b1)
    state_a, _ = single(state_a, b2)

    multi = jax.jit(make_multi_step(make_train_step(cfg, gan), 2))
    stacked = jax.tree.map(lambda x, y: jnp.stack([x, y]), b1, b2)
    state_b = init_state()
    state_b, _ = multi(state_b, stacked)

    _assert_trees_close(state_a.g_params, state_b.g_params, "g_params")
    _assert_trees_close(state_a.d_params, state_b.d_params, "d_params")
    assert int(state_b.step) == 2


def test_dsteps_dp_matches_single_device(tiny_config):
    from locate_tpu.config import ParallelConfig
    from locate_tpu.parallel.mesh import make_mesh, single_device_mesh
    from locate_tpu.parallel.sharding import (
        make_sharded_train_step,
        place_train_state,
    )

    def run(mesh):
        cfg = dataclasses.replace(
            _cfg(tiny_config, d_steps=2),
            parallel=ParallelConfig(data_parallel=mesh.shape["data"]),
        )
        gan = build_gan(cfg)
        with mesh:
            state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
            jit_for, sh_for, b_shard = make_sharded_train_step(cfg, gan, mesh)
            state = place_train_state(state, sh_for(state))
            step = jit_for(state)
            batch = jax.device_put(
                _stacked_batch(cfg, jax.random.PRNGKey(1), 2),
                {"image": b_shard, "label": b_shard},
            )
            hist = []
            for _ in range(2):
                state, m = step(state, batch)
                hist.append({k: float(v) for k, v in m.items()})
        return hist

    pc = ParallelConfig()
    h8 = run(make_mesh(pc))
    h1 = run(single_device_mesh(pc))
    for a, b in zip(h1, h8):
        np.testing.assert_allclose(a["d_loss"], b["d_loss"], rtol=5e-3)
        np.testing.assert_allclose(a["g_loss"], b["g_loss"], rtol=5e-3)


def test_dsteps_loop_resume_stream(tiny_config, tmp_path):
    """The loop feeds d_steps fresh batches per optimizer step and the
    resume fast-forward skips d_steps x per_host examples per step: a
    2+2-step resumed run must equal a straight 4-step run bitwise."""
    from locate_tpu.train.loop import train

    def cfg_for(workdir):
        c = _cfg(tiny_config, d_steps=2, log_every=2, sample_every=0,
                 checkpoint_every=2, eval_every=0)
        return dataclasses.replace(c, workdir=str(workdir))

    cfg_a = cfg_for(tmp_path / "a")
    state_a = train(cfg_a, total_steps=4, resume=False)

    cfg_b = cfg_for(tmp_path / "b")
    train(cfg_b, total_steps=2, resume=False)
    state_b = train(cfg_b, total_steps=4)  # resumes from step 2

    assert int(state_a.step) == int(state_b.step) == 4
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)
        ),
        state_a.g_params, state_b.g_params,
    )


def test_dsteps_config_validation():
    with pytest.raises(ValueError, match="d_steps"):
        TrainConfig(d_steps=0)
    with pytest.raises(ValueError, match="alternating"):
        TrainConfig(d_steps=5, fused_step=True)
    TrainConfig(d_steps=5, loss="wgan")  # the classic pairing validates
