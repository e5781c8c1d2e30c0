"""Minibatch stddev (ops/norm.py:minibatch_stddev, model.mbstd_group —
ProGAN arXiv 1710.10196 §3): the op against a numpy oracle, the full
discriminator golden vs the torch twin (fwd + grad), pytree gating, a
training trajectory, and DP == single-device (the one batch-coupled
statistic in the framework — its replica-locality contract is the thing
to pin)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from locate_tpu.config import AttentionConfig, ModelConfig
from locate_tpu.models.discriminator import build_discriminator
from locate_tpu.ops.norm import minibatch_stddev

import torch_twin as tw


def test_minibatch_stddev_oracle():
    x = np.random.RandomState(0).randn(8, 4, 4, 6).astype(np.float32)
    out = np.asarray(minibatch_stddev(jnp.asarray(x), 4))
    assert out.shape == (8, 1)
    ref = []
    for gi in range(2):
        grp = x[gi * 4:(gi + 1) * 4].reshape(4, -1)
        sd = np.sqrt(grp.var(axis=0) + 1e-8)  # biased, as shipped
        ref.append(sd.mean())
    np.testing.assert_allclose(out[:4, 0], ref[0], rtol=1e-6)
    np.testing.assert_allclose(out[4:, 0], ref[1], rtol=1e-6)
    # identical examples inside a group -> stddev collapses to ~sqrt(eps)
    const = jnp.broadcast_to(jnp.asarray(x[:1]), x.shape)
    np.testing.assert_allclose(
        np.asarray(minibatch_stddev(const, 4)), np.sqrt(1e-8), rtol=1e-3
    )


def test_minibatch_stddev_group_locality():
    """Each group's scalar depends only on that group's members — the
    property that makes per-replica computation exact under DP."""
    x = np.random.RandomState(1).randn(8, 2, 2, 3).astype(np.float32)
    full = np.asarray(minibatch_stddev(jnp.asarray(x), 2))
    for s in range(4):
        part = np.asarray(minibatch_stddev(jnp.asarray(x[2 * s:2 * s + 2]), 2))
        np.testing.assert_array_equal(full[2 * s:2 * s + 2], part)
    with pytest.raises(ValueError):
        minibatch_stddev(jnp.asarray(x[:6]), 4)  # 6 % 4 != 0


def _mb_cfg(**kw):
    base = dict(
        resolution=16,
        base_channels=32,
        max_channels=32,
        min_channels=16,
        latent_dim=12,
        mbstd_group=4,
        attention=AttentionConfig(pos_features=4, bottleneck=2),
    )
    base.update(kw)
    return ModelConfig(**base)


def test_head_width_gated_by_flag():
    """use-path rule (CLAUDE.md): mbstd_group is a *model* field so it MAY
    change the pytree — but only the head's fan-in, and only when on."""
    p_off = build_discriminator(_mb_cfg(mbstd_group=0)).init(jax.random.PRNGKey(0))
    p_on = build_discriminator(_mb_cfg()).init(jax.random.PRNGKey(0))
    assert p_off["head"]["w"].shape == (32, 1)
    assert p_on["head"]["w"].shape == (33, 1)
    # everything else structurally identical
    off_paths = {jax.tree_util.keystr(p): l.shape
                 for p, l in jax.tree_util.tree_leaves_with_path(p_off)}
    on_paths = {jax.tree_util.keystr(p): l.shape
                for p, l in jax.tree_util.tree_leaves_with_path(p_on)}
    assert set(off_paths) == set(on_paths)
    diff = [k for k in off_paths if off_paths[k] != on_paths[k]]
    assert diff == ["['head']['w']"]


def test_discriminator_mbstd_golden_torch():
    cfg = _mb_cfg()
    disc = build_discriminator(cfg)
    params = disc.init(jax.random.PRNGKey(0))
    from test_model_parity_torch import randomize_zero_init

    params = randomize_zero_init(params, jax.random.PRNGKey(7))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3), jnp.float32)

    def loss(p):
        # sum of squares so the grad couples examples through the shared
        # mbstd statistic (a plain sum would zero the cross terms)
        return jnp.sum(disc.apply(p, x) ** 2)

    val, grads = jax.value_and_grad(loss)(params)

    tp = tw.to_torch_params(jax.tree.map(np.asarray, params))
    logit_t = tw.discriminator_forward(tp, cfg, tw.t(np.asarray(x)))
    loss_t = (logit_t ** 2).sum()
    loss_t.backward()
    np.testing.assert_allclose(float(val), float(loss_t.detach()), rtol=5e-4)
    flat_t = {jax.tree_util.keystr(p): l
              for p, l in jax.tree_util.tree_leaves_with_path(tp)}
    checked = 0
    for path, gj in jax.tree_util.tree_leaves_with_path(grads):
        gt = flat_t[jax.tree_util.keystr(path)].grad
        if gt is None:
            continue
        np.testing.assert_allclose(
            np.asarray(gj), gt.numpy(), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )
        checked += 1
    assert checked >= 10


def test_train_step_mbstd_trajectory(tiny_config):
    from locate_tpu.models.gan import build_gan
    from locate_tpu.train.state import create_train_state
    from locate_tpu.train.step import make_train_step

    runs = {}
    for group in (0, 4):
        cfg = dataclasses.replace(
            tiny_config,
            model=dataclasses.replace(tiny_config.model, mbstd_group=group),
        )
        gan = build_gan(cfg)
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, gan))
        batch = {
            "image": jax.random.randint(
                jax.random.PRNGKey(1), (8, 16, 16, 3), 0, 256, jnp.uint8
            ),
            "label": jnp.zeros((8,), jnp.int32),
        }
        for _ in range(3):
            state, metrics = step(state, batch)
        runs[group] = {k: float(v) for k, v in metrics.items()}
        assert all(np.isfinite(v) for v in runs[group].values()), runs[group]
    assert runs[4]["d_loss"] != runs[0]["d_loss"]


def test_mbstd_dp_matches_single_device(tiny_config):
    """Groups of 2 on a batch of 8 over 4-way DP (2 examples/replica):
    groups never straddle replicas, so the GSPMD program must equal the
    single-device trajectory despite the batch-coupled statistic."""
    from locate_tpu.config import ParallelConfig
    from locate_tpu.parallel.mesh import make_mesh, single_device_mesh
    from test_parallel import run_steps

    cfg = dataclasses.replace(
        tiny_config,
        model=dataclasses.replace(tiny_config.model, mbstd_group=2),
        parallel=ParallelConfig(data_parallel=4, model_parallel=2),
    )
    _, hist = run_steps(cfg, make_mesh(cfg.parallel), n_steps=2)
    _, hist1 = run_steps(cfg, single_device_mesh(cfg.parallel), n_steps=2)
    for a, b in zip(hist1, hist):
        np.testing.assert_allclose(a["d_loss"], b["d_loss"], rtol=5e-3)
        np.testing.assert_allclose(a["g_loss"], b["g_loss"], rtol=5e-3)


def test_mbstd_shardmap_matches_gspmd(tiny_config):
    """The explicit shard_map backend computes mbstd on each replica's
    LOCAL shard; with the group (2 here, on 8 replicas x batch 2) dividing
    the per-replica batch that is exactly the global math. The two backends
    sample different latent streams (test_parallel's protocol), so the pin
    is the step-1 REAL-data statistic — which is where mbstd enters D."""
    from locate_tpu.config import ParallelConfig
    from locate_tpu.models.gan import build_gan
    from locate_tpu.parallel.mesh import make_mesh
    from locate_tpu.parallel.sharding import (
        make_sharded_train_step,
        make_shardmap_train_step,
        place_train_state,
    )
    from locate_tpu.train.state import create_train_state
    from test_parallel import make_batch

    cfg = dataclasses.replace(
        tiny_config,
        model=dataclasses.replace(tiny_config.model, mbstd_group=2),
        train=dataclasses.replace(tiny_config.train, global_batch=16),
        parallel=ParallelConfig(data_parallel=8),
    )
    gan = build_gan(cfg)
    mesh = make_mesh(cfg.parallel)

    def run(maker):
        with mesh:
            state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
            jit_for, sh_for, b_shard = maker(cfg, gan, mesh)
            state = place_train_state(state, sh_for(state))
            step = jit_for(state)
            batch = jax.device_put(
                make_batch(cfg, jax.random.PRNGKey(1)),
                {"image": b_shard, "label": b_shard},
            )
            _, metrics = step(state, batch)
            return {k: float(v) for k, v in metrics.items()}
    m_g = run(make_sharded_train_step)
    m_s = run(make_shardmap_train_step)
    np.testing.assert_allclose(
        m_g["real_logits"], m_s["real_logits"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(m_g["d_loss"], m_s["d_loss"], rtol=0.05)
    assert all(np.isfinite(v) for v in m_s.values())
