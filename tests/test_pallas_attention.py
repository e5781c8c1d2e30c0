"""Kernel-equivalence tests (SURVEY.md §5 item 2): the fused Pallas
attention vs its pure-XLA composition — same inputs -> allclose, forward
and gradients — in interpret mode on CPU. Real-TPU equivalence is covered
by the benchmark/verify drives."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locate_tpu.config import AttentionConfig
from locate_tpu.ops.attention import coord_features, locate_attention
from locate_tpu.ops.pallas.fused_attention import (
    fused_locate_attention,
    locate_attention_xla_core,
)

TOL = dict(rtol=2e-5, atol=2e-5)


def make_inputs(n=2, h=8, w=8, c=16, hd=8, cout=None, seed=0):
    cout = c if cout is None else cout
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (n, h, w, c), jnp.float32)
    pos_proj = jax.random.normal(ks[1], (h * w, hd), jnp.float32) * 0.3
    w1x = jax.random.normal(ks[2], (c, hd), jnp.float32) * 0.2
    b1 = jax.random.normal(ks[3], (hd,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[4], (hd, cout), jnp.float32) * 0.2
    b2 = jax.random.normal(ks[5], (cout,), jnp.float32) * 0.1
    return x, pos_proj, w1x, b1, w2, b2


@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
def test_forward_matches_oracle(mode):
    x, pos_proj, w1x, b1, w2, b2 = make_inputs()
    n, h, w, c = x.shape
    fused = fused_locate_attention(
        x, pos_proj, w1x, b1, w2, b2, mode=mode, interpret=True
    )
    oracle = locate_attention_xla_core(
        x.reshape(n, h * w, c), pos_proj, w1x, b1, w2, b2,
        mode=mode, act="leaky_relu", leaky_slope=0.2, hw_scale=float(h * w),
    ).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle), **TOL)


@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
def test_grad_matches_oracle(mode):
    x, pos_proj, w1x, b1, w2, b2 = make_inputs(n=1, h=4, w=4, c=8, hd=8)
    n, h, w, c = x.shape

    def loss_fused(x, w1x, b1, w2, b2):
        y = fused_locate_attention(
            x, pos_proj, w1x, b1, w2, b2, mode=mode, interpret=True
        )
        return jnp.sum(y * jnp.cos(y))

    def loss_oracle(x, w1x, b1, w2, b2):
        y = locate_attention_xla_core(
            x.reshape(n, h * w, c), pos_proj, w1x, b1, w2, b2,
            mode=mode, act="leaky_relu", leaky_slope=0.2, hw_scale=float(h * w),
        ).reshape(x.shape)
        return jnp.sum(y * jnp.cos(y))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1x, b1, w2, b2)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(x, w1x, b1, w2, b2)
    for gf, go in zip(g_fused, g_oracle):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(go), rtol=1e-4, atol=1e-4)


def test_multi_tile_softmax():
    """HW large enough to force multiple spatial tiles: the two-phase
    running-softmax must match the oracle exactly."""
    x, pos_proj, w1x, b1, w2, b2 = make_inputs(n=2, h=32, w=32, c=8, hd=8, seed=3)
    n, h, w, c = x.shape
    fused = fused_locate_attention(
        x, pos_proj, w1x, b1, w2, b2, mode="softmax", interpret=True
    )
    oracle = locate_attention_xla_core(
        x.reshape(n, h * w, c), pos_proj, w1x, b1, w2, b2,
        mode="softmax", act="leaky_relu", leaky_slope=0.2, hw_scale=float(h * w),
    ).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
def test_grad_multi_tile_multi_batch(mode):
    """Exercises the backward's accumulation machinery: multiple spatial
    tiles (s=2) AND multiple batch elements, comparing EVERY gradient
    including dpos_proj (the per-tile flush) against the oracle."""
    x, pos_proj, w1x, b1, w2, b2 = make_inputs(n=3, h=32, w=32, c=8, hd=8, seed=11)
    n, h, w, c = x.shape

    def loss_fused(x, pos_proj, w1x, b1, w2, b2):
        y = fused_locate_attention(
            x, pos_proj, w1x, b1, w2, b2, mode=mode, interpret=True
        )
        return jnp.sum(jnp.sin(y))

    def loss_oracle(x, pos_proj, w1x, b1, w2, b2):
        y = locate_attention_xla_core(
            x.reshape(n, h * w, c), pos_proj, w1x, b1, w2, b2,
            mode=mode, act="leaky_relu", leaky_slope=0.2, hw_scale=float(h * w),
        )
        return jnp.sum(jnp.sin(y))

    args = (x, pos_proj, w1x, b1, w2, b2)
    gf = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    go = jax.grad(loss_oracle, argnums=tuple(range(6)))(*args)
    names = ("x", "pos_proj", "w1x", "b1", "w2", "b2")
    for nm, a, b in zip(names, gf, go):
        if mode == "softmax" and nm == "b2":
            continue  # analytically zero (shift invariance); pure noise
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=nm
        )


@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
def test_relu_grad_matches_oracle_at_zero(mode):
    """relu subgradient at exactly 0 must match jax.nn.relu's (grad 0)."""
    c, hd = 8, 8
    x = jnp.zeros((1, 4, 4, c), jnp.float32)  # u == 0 everywhere
    pos_proj = jnp.zeros((16, hd), jnp.float32)
    w1x = jnp.ones((c, hd), jnp.float32) * 0.1
    b1 = jnp.zeros((hd,))
    w2 = jnp.ones((hd, c), jnp.float32) * 0.1
    b2 = jnp.zeros((c,))

    def lf(b1):
        y = fused_locate_attention(
            x, pos_proj, w1x, b1, w2, b2, mode=mode, act="relu", interpret=True
        )
        return jnp.sum(y)

    def lo(b1):
        y = locate_attention_xla_core(
            x.reshape(1, 16, c), pos_proj, w1x, b1, w2, b2,
            mode=mode, act="relu", leaky_slope=0.2, hw_scale=16.0,
        )
        return jnp.sum(y)

    np.testing.assert_allclose(
        np.asarray(jax.grad(lf)(b1)), np.asarray(jax.grad(lo)(b1)),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
def test_broadcast_gate_cout1(mode):
    """per_channel=False (gate broadcasts over channels): fwd and grads
    match the oracle — dL/dg must sum over channels in the backward."""
    x, pos_proj, w1x, b1, _, _ = make_inputs(n=2, h=8, w=8, c=16, hd=8)
    w2 = jax.random.normal(jax.random.PRNGKey(7), (8, 1), jnp.float32) * 0.2
    b2 = jnp.zeros((1,))
    n, h, w, c = x.shape

    def lf(x, w1x, b1, w2, b2):
        y = fused_locate_attention(x, pos_proj, w1x, b1, w2, b2, mode=mode, interpret=True)
        return jnp.sum(jnp.cos(y))

    def lo(x, w1x, b1, w2, b2):
        y = locate_attention_xla_core(
            x.reshape(n, h * w, c), pos_proj, w1x, b1, w2, b2,
            mode=mode, act="leaky_relu", leaky_slope=0.2, hw_scale=float(h * w),
        )
        return jnp.sum(jnp.cos(y))

    np.testing.assert_allclose(float(lf(x, w1x, b1, w2, b2)),
                               float(lo(x, w1x, b1, w2, b2)), rtol=1e-5)
    gf = jax.grad(lf, argnums=(0, 1, 2, 3))(x, w1x, b1, w2, b2)
    go = jax.grad(lo, argnums=(0, 1, 2, 3))(x, w1x, b1, w2, b2)
    for a, b in zip(gf, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
def test_layer_pallas_matches_layer_xla(mode):
    """Full layer: use_pallas=True (interpret on CPU) == use_pallas=False."""
    cfg = AttentionConfig(mode=mode, per_channel=True, pos_features=4, bottleneck=2)
    lx = locate_attention(8, cfg, use_pallas=False)
    lp = locate_attention(8, cfg, use_pallas=True)
    params = lx.init(jax.random.PRNGKey(0))
    # randomize zero-init logits so the comparison is non-trivial
    params["to_logits"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(9), params["to_logits"]["w"].shape) * 0.3
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8), jnp.float32)
    yx = lx.apply(params, x)
    yp = lp.apply(params, x)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx), rtol=1e-4, atol=1e-4)


def test_bf16_path():
    x, pos_proj, w1x, b1, w2, b2 = make_inputs()
    xb = x.astype(jnp.bfloat16)
    y = fused_locate_attention(
        xb, pos_proj, w1x, b1, w2, b2, mode="softmax", interpret=True
    )
    assert y.dtype == jnp.bfloat16
    n, h, w, c = x.shape
    oracle = locate_attention_xla_core(
        xb.reshape(n, h * w, c), pos_proj, w1x, b1, w2, b2,
        mode="softmax", act="leaky_relu", leaky_slope=0.2, hw_scale=float(h * w),
    ).reshape(x.shape)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(oracle, np.float32), rtol=2e-2, atol=2e-2
    )
