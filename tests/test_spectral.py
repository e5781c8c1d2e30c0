"""Spectral normalization (ops/spectral.py, SN-GAN arXiv 1802.05957):
sigma accuracy vs exact SVD, the stop-gradient semantics (d sigma/dW =
u v^T, pinned against a torch-autograd twin), tree targeting, and the
full discriminator with model.spectral_norm=True — forward and gradients
golden vs the torch twin, plus a short training trajectory."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from locate_tpu.config import AttentionConfig, ModelConfig
from locate_tpu.models.discriminator import build_discriminator
from locate_tpu.ops.spectral import spectral_normalize, spectral_sigma

import torch_twin as tw


def _v0(cols: int) -> np.ndarray:
    """The deterministic start vector spectral_sigma uses (bridged to the
    jax-free torch twin by the tests)."""
    v = jax.random.normal(jax.random.PRNGKey(0), (cols,), jnp.float32)
    return np.asarray(v)


@pytest.mark.parametrize(
    "shape", [(64, 32), (3, 3, 16, 24), (1, 1, 48, 8), (512, 1)]
)
def test_sigma_approaches_svd(shape):
    w = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), shape, jnp.float32)
    )
    exact = np.linalg.svd(w.reshape(-1, shape[-1]), compute_uv=False)[0]
    sigma = float(spectral_sigma(jnp.asarray(w), n_iters=50))
    # Rayleigh-quotient bound: power iteration approaches sigma from below.
    assert sigma <= exact * (1 + 1e-5)
    assert sigma >= exact * 0.99
    # The shipped default (9 iters) is within a few % even on random
    # matrices (the worst case — trained weights have larger gaps).
    sigma9 = float(spectral_sigma(jnp.asarray(w), n_iters=9))
    assert sigma9 >= exact * 0.90


def test_sigma_gradient_matches_torch_twin():
    """sigma = u^T W v with u, v detached => d sigma/dW = u v^T. Pin the
    JAX gradient against torch autograd running the IDENTICAL fresh-start
    power iteration."""
    w = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (3, 3, 8, 12), jnp.float32)
    )
    g_jax = jax.grad(lambda w: spectral_sigma(w, n_iters=7))(jnp.asarray(w))

    wt = torch.from_numpy(w.copy()).requires_grad_(True)
    m = wt.reshape(-1, 12)
    vec = torch.from_numpy(_v0(12))
    vec = vec / vec.norm()
    for _ in range(7):
        u = m.detach() @ vec
        u = u / (u.norm() + 1e-12)
        vec = m.detach().T @ u
        vec = vec / (vec.norm() + 1e-12)
    u = m.detach() @ vec
    u = u / (u.norm() + 1e-12)
    sigma = u @ (m @ vec)
    sigma.backward()
    np.testing.assert_allclose(
        np.asarray(g_jax), wt.grad.numpy(), rtol=1e-5, atol=1e-6
    )
    # the twin helper's normalized weight agrees: w_sn = w / sigma
    out = tw.spectral_normalize_torch(
        {"w": torch.from_numpy(w.copy())},
        lambda c: torch.from_numpy(_v0(c)), n_iters=7,
    )
    np.testing.assert_allclose(
        out["w"].numpy(), w / float(sigma), rtol=1e-6, atol=0
    )


def test_normalize_tree_targets_only_w():
    params = {
        "stem": {"w": jnp.ones((1, 1, 4, 8)), "b": jnp.full((8,), 3.0)},
        "norm": {"scale": jnp.full((8,), 2.0), "bias": jnp.zeros((8,))},
        "class_proj": jnp.full((5, 8), 4.0),
        "head": {"w": jnp.eye(8), "b": jnp.zeros((8,))},
    }
    out = spectral_normalize(params, n_iters=30)
    # non-"w" leaves bitwise untouched
    assert np.array_equal(out["stem"]["b"], params["stem"]["b"])
    assert np.array_equal(out["norm"]["scale"], params["norm"]["scale"])
    assert np.array_equal(out["class_proj"], params["class_proj"])
    # every normalized "w" has top singular value ~1
    for leaf in (out["stem"]["w"], out["head"]["w"]):
        m = np.asarray(leaf).reshape(-1, leaf.shape[-1])
        top = np.linalg.svd(m, compute_uv=False)[0]
        assert abs(top - 1.0) < 0.05


def _sn_cfg(**kw):
    base = dict(
        resolution=16,
        base_channels=32,
        max_channels=32,
        min_channels=16,
        latent_dim=12,
        spectral_norm=True,
        attention=AttentionConfig(pos_features=4, bottleneck=2),
    )
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.parametrize("num_classes", [0, 3])
def test_discriminator_sn_golden_torch(num_classes):
    cfg = _sn_cfg(num_classes=num_classes, class_embed_dim=6)
    disc = build_discriminator(cfg)
    params = disc.init(jax.random.PRNGKey(0))
    from test_model_parity_torch import randomize_zero_init

    params = randomize_zero_init(params, jax.random.PRNGKey(7))
    x = jax.random.normal(
        jax.random.PRNGKey(1), (4, 16, 16, 3), jnp.float32
    )
    y = np.asarray(jnp.arange(4) % 3) if num_classes else None

    def loss(p):
        return jnp.sum(disc.apply(p, x, None if y is None else jnp.asarray(y)))

    val, grads = jax.value_and_grad(loss)(params)

    tp = tw.to_torch_params(jax.tree.map(np.asarray, params))
    tp_sn = tw.spectral_normalize_torch(
        tp, lambda c: torch.from_numpy(_v0(c)), n_iters=cfg.sn_iters
    )
    logit_t = tw.discriminator_forward(
        tp_sn, cfg, tw.t(np.asarray(x)),
        None if y is None else torch.from_numpy(np.asarray(y))
    )
    loss_t = logit_t.sum()
    loss_t.backward()
    np.testing.assert_allclose(
        float(val), float(loss_t), rtol=5e-4, atol=5e-4
    )
    # gradients through W/sigma must match (stop-gradient semantics pinned)
    flat_j = jax.tree_util.tree_leaves_with_path(grads)
    flat_t = {jax.tree_util.keystr(p): l
              for p, l in jax.tree_util.tree_leaves_with_path(tp)}
    checked = 0
    for path, gj in flat_j:
        gt = flat_t[jax.tree_util.keystr(path)].grad
        if gt is None:
            continue
        np.testing.assert_allclose(
            np.asarray(gj), gt.numpy(), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )
        checked += 1
    assert checked >= 10


def test_train_step_sn_trajectory(tiny_config):
    """model.spectral_norm=True trains: finite metrics, trajectory differs
    from the unconstrained discriminator, D logits stay bounded-ish."""
    from locate_tpu.models.gan import build_gan
    from locate_tpu.train.state import create_train_state
    from locate_tpu.train.step import make_train_step

    runs = {}
    for sn in (False, True):
        cfg = dataclasses.replace(
            tiny_config,
            model=dataclasses.replace(tiny_config.model, spectral_norm=sn),
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
        runs[sn] = {k: float(v) for k, v in metrics.items()}
        assert all(np.isfinite(v) for v in runs[sn].values()), runs[sn]
    assert runs[True]["d_loss"] != runs[False]["d_loss"]


def test_sn_dp_tp_matches_single_device(tiny_config):
    """SN is a pure function of the (replicated or channel-sharded)
    params, so the normalized program must shard transparently: 4x2 DPxTP
    trajectory == single device."""
    from locate_tpu.config import ParallelConfig
    from locate_tpu.parallel.mesh import make_mesh, single_device_mesh
    from test_parallel import run_steps

    cfg = dataclasses.replace(
        tiny_config,
        model=dataclasses.replace(tiny_config.model, spectral_norm=True),
        parallel=ParallelConfig(data_parallel=4, model_parallel=2),
    )
    _, hist = run_steps(cfg, make_mesh(cfg.parallel), n_steps=2)
    _, hist1 = run_steps(cfg, single_device_mesh(cfg.parallel), n_steps=2)
    for a, b in zip(hist1, hist):
        np.testing.assert_allclose(a["d_loss"], b["d_loss"], rtol=5e-3)
        np.testing.assert_allclose(a["g_loss"], b["g_loss"], rtol=5e-3)


def test_pl_reg_shardmap_matches_gspmd(tiny_config):
    """Path-length reg under the explicit shard_map backend: the penalty's
    cross-replica mean (pmean) sits OUTSIDE the lax.cond by design — this
    pins that the program compiles, runs, keeps pl_mean replica-identical,
    and agrees with the GSPMD global program on the data-identical step-1
    statistics."""
    from locate_tpu.parallel.mesh import make_mesh
    from locate_tpu.parallel.sharding import (
        make_shardmap_train_step,
        make_sharded_train_step,
        place_train_state,
    )
    from locate_tpu.train.state import create_train_state
    from locate_tpu.models.gan import build_gan
    from test_parallel import make_batch

    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, pl_gamma=2.0, pl_interval=1
        ),
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
            state, metrics = step(state, batch)
            return state, {k: float(v) for k, v in metrics.items()}

    s_sm, sm = run(make_shardmap_train_step)
    _, gs = run(make_sharded_train_step)
    assert np.isfinite(list(sm.values())).all()
    assert sm["pl"] > 0.0
    # real-data statistics are latent-stream-free => exact-ish agreement
    np.testing.assert_allclose(gs["real_logits"], sm["real_logits"],
                               rtol=1e-4, atol=1e-5)
    # pl_mean replicated identically across all 8 devices
    shards = [np.asarray(s.data) for s in s_sm.pl_mean.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_sn_with_r1_grad_of_grad(tiny_config):
    """The shipped presets pair SN-style controls with lazy R1 (grad-of-
    grad through D). sigma's power iteration sits under stop_gradient, so
    the loop must never be differentiated — this pins that an R1-firing
    step compiles and yields finite metrics with spectral_norm=True."""
    from locate_tpu.models.gan import build_gan
    from locate_tpu.train.state import create_train_state
    from locate_tpu.train.step import make_train_step

    cfg = dataclasses.replace(
        tiny_config,
        model=dataclasses.replace(tiny_config.model, spectral_norm=True),
        train=dataclasses.replace(
            tiny_config.train, r1_gamma=0.1, r1_interval=2
        ),
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
    for _ in range(4):  # interval 2 -> R1 fires twice
        state, metrics = step(state, batch)
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert vals.get("r1", 0.0) >= 0.0
