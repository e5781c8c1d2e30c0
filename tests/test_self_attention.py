"""Self-attention family (attention.kind="self", SAGAN arXiv 1805.08318):
torch-golden block parity, flash-kernel-vs-oracle equivalence (SURVEY.md §5
items 1-2), and end-to-end integration in the GAN step."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from locate_tpu.config import AttentionConfig, ModelConfig
from locate_tpu.ops.pallas.flash_attention import (
    attention_reference,
    flash_attention,
)
from locate_tpu.ops.self_attention import _head_dims, self_attention

TOL = dict(rtol=2e-5, atol=2e-5)


def _qkv(b=2, t=256, dh=32, dv=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(ks[0], (b, t, dh), jnp.float32),
        jax.random.normal(ks[1], (b, t, dh), jnp.float32),
        jax.random.normal(ks[2], (b, t, dv), jnp.float32),
    )


def test_oracle_matches_torch_sdpa():
    q, k, v = _qkv()
    scale = 1.0 / np.sqrt(q.shape[-1])
    ours = attention_reference(q, k, v, scale=scale)
    tq, tk, tv = (torch.from_numpy(np.asarray(a).copy()) for a in (q, k, v))
    ref = torch.nn.functional.scaled_dot_product_attention(
        tq, tk, tv, scale=scale
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), **TOL)


@pytest.mark.parametrize("t,blocks", [(256, (64, 64)), (1024, (256, 128))])
def test_flash_forward_matches_oracle(t, blocks):
    q, k, v = _qkv(t=t)
    scale = 1.0 / np.sqrt(q.shape[-1])
    o = flash_attention(q, k, v, scale=scale, block_q=blocks[0],
                        block_kv=blocks[1], interpret=True)
    ref = attention_reference(q, k, v, scale=scale)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), **TOL)


def test_flash_grad_matches_oracle():
    q, k, v = _qkv(b=1, t=256, dh=16, dv=32)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def loss(fn):
        return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v)))

    g_ref = jax.grad(
        loss(lambda *a: attention_reference(*a, scale=scale)), argnums=(0, 1, 2)
    )(q, k, v)
    g_ker = jax.grad(
        loss(lambda *a: flash_attention(*a, scale=scale, block_q=64,
                                        block_kv=64, interpret=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **TOL)


def test_flash_bf16_interpret():
    """bf16 operands through the kernel's cast discipline (interpret mode;
    the real-backend spot check is part of the TPU drive)."""
    q, k, v = _qkv(t=256)
    q, k, v = (a.astype(jnp.bfloat16) for a in (q, k, v))
    scale = 1.0 / np.sqrt(q.shape[-1])
    o = flash_attention(q, k, v, scale=scale, block_q=64, block_kv=64,
                        interpret=True)
    ref = attention_reference(q, k, v, scale=scale)
    assert o.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


@pytest.mark.parametrize("heads", [1, 2])
def test_block_matches_torch_twin(heads):
    """The full block (q/k/v/o convs + gamma residual) vs the torch twin,
    forward and input gradient."""
    from tests import torch_twin as tw

    cfg = ModelConfig(
        resolution=16,
        attention=AttentionConfig(kind="self", heads=heads,
                                  sa_qk_bottleneck=4, sa_v_bottleneck=2),
    )
    c = 32
    layer = self_attention(c, cfg.attention)
    params = layer.init(jax.random.PRNGKey(0))
    # gamma=0 at init -> identity; give it a value so the test sees the
    # attention path.
    params["gamma"] = jnp.asarray(0.7, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, c), jnp.float32)

    ours, our_gx = jax.value_and_grad(
        lambda xx: jnp.sum(jnp.sin(layer.apply(params, xx)))
    )(x)

    tp = tw.to_torch_params(params)
    xt = tw.t(x)
    xt.requires_grad_(True)
    yt = tw.self_attention(tp, xt, cfg)
    lt_ = torch.sin(yt).sum()
    lt_.backward()
    np.testing.assert_allclose(float(ours), float(lt_.detach()), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(our_gx), xt.grad.numpy(), rtol=2e-4, atol=2e-5
    )


def test_block_identity_at_init():
    cfg = AttentionConfig(kind="self")
    layer = self_attention(32, cfg)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32), jnp.float32)
    np.testing.assert_allclose(np.asarray(layer.apply(params, x)),
                               np.asarray(x))


def test_head_dims_rounding():
    cfg = AttentionConfig(kind="self", heads=2, sa_qk_bottleneck=8,
                          sa_v_bottleneck=2)
    dk, dv = _head_dims(24, cfg)  # 24/8=3 -> rounds up to 16 (8*heads)
    assert dk % (8 * 2) == 0 and dv % (8 * 2) == 0
    assert dk >= 16 and dv >= 16


def test_gan_trains_with_self_attention(tiny_config):
    """One jitted alternating step on a self-attention G/D: finite losses,
    params move, and the use_pallas pytree invariant holds (same structure
    with the flash kernel on)."""
    from locate_tpu.models.gan import build_gan
    from locate_tpu.train.state import create_train_state
    from locate_tpu.train.step import make_train_step

    cfg = dataclasses.replace(
        tiny_config,
        model=dataclasses.replace(
            tiny_config.model,
            attention=AttentionConfig(kind="self", sa_qk_bottleneck=4),
        ),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))

    gan_p = build_gan(dataclasses.replace(cfg, use_pallas=True))
    state_p = create_train_state(cfg, gan_p, jax.random.PRNGKey(0))
    assert jax.tree.structure(state.g_params) == jax.tree.structure(
        state_p.g_params
    )

    step = jax.jit(make_train_step(cfg, gan))
    batch = {
        "image": jax.random.uniform(
            jax.random.PRNGKey(1), (8, 16, 16, 3), minval=-1.0, maxval=1.0
        ),
        "label": jnp.zeros((8,), jnp.int32),
    }
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.g_params,
        new_state.g_params,
    )
    assert max(jax.tree.leaves(moved)) > 0.0


def test_gan_self_attention_pallas_step(tiny_config):
    """The flash-kernel path through a whole train step (interpret mode on
    CPU): trajectory matches the XLA path at fp32."""
    from locate_tpu.models.gan import build_gan
    from locate_tpu.train.state import create_train_state
    from locate_tpu.train.step import make_train_step

    def one(use_pallas):
        cfg = dataclasses.replace(
            tiny_config,
            use_pallas=use_pallas,
            model=dataclasses.replace(
                tiny_config.model,
                attention=AttentionConfig(kind="self", sa_qk_bottleneck=4),
            ),
        )
        gan = build_gan(cfg)
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, gan))
        batch = {
            "image": jax.random.uniform(
                jax.random.PRNGKey(1), (8, 16, 16, 3), minval=-1.0, maxval=1.0
            ),
            "label": jnp.zeros((8,), jnp.int32),
        }
        new_state, metrics = step(state, batch)
        return new_state, metrics

    s_x, m_x = one(False)
    s_p, m_p = one(True)
    np.testing.assert_allclose(float(m_x["d_loss"]), float(m_p["d_loss"]),
                               rtol=1e-4)
    chex_diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s_x.g_params, s_p.g_params
    )
    assert max(jax.tree.leaves(chex_diff)) < 1e-4
