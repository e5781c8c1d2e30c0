"""gate_max clamp parity (ADVICE r4 medium #1): the hand-written clamp
subgradient in the Pallas backward (masked dg in the softmax-csum /
sigmoid bwd bodies, ghat in dx) vs jax.grad of the XLA oracle, in
interpret mode, with a gate_max SMALL enough that random inputs actually
saturate the clamp — the default gate_max=0 compiles the clamp and mask
out statically, so the production (gate_max>0) backward code was
otherwise untested. Covers both modes, per_channel True/False, and the
fused stage kernels' gate path. Real-TPU bf16 coverage: the gate_max
arms in scripts/bf16_kernel_sweep.py."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from locate_tpu.config import AttentionConfig
from locate_tpu.nn import blocks
from locate_tpu.nn.blocks import discriminator_stage, generator_stage
from locate_tpu.ops.pallas.fused_attention import (
    fused_locate_attention,
    locate_attention_xla_core,
)

GATE_MAX = 1.5  # sigmoid gate spans (0, 2); softmax*HW spans [0, HW]


def make_inputs(n=2, h=8, w=8, c=16, hd=8, cout=None, seed=0):
    """Like test_pallas_attention.make_inputs but with 3x hotter gate-MLP
    weights so a solid fraction of gates exceed GATE_MAX."""
    cout = c if cout is None else cout
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (n, h, w, c), jnp.float32)
    pos_proj = jax.random.normal(ks[1], (h * w, hd), jnp.float32) * 0.5
    w1x = jax.random.normal(ks[2], (c, hd), jnp.float32) * 0.6
    b1 = jax.random.normal(ks[3], (hd,), jnp.float32) * 0.3
    w2 = jax.random.normal(ks[4], (hd, cout), jnp.float32) * 0.6
    b2 = jax.random.normal(ks[5], (cout,), jnp.float32) * 0.3
    return x, pos_proj, w1x, b1, w2, b2


def _assert_clamp_active(x, pos_proj, w1x, b1, w2, b2, mode):
    """Guard against a vacuous test: the clamped oracle must differ from
    the unclamped one (i.e. some gates really exceed GATE_MAX)."""
    n, h, w, c = x.shape
    x2d = x.reshape(n, h * w, c)
    kw = dict(mode=mode, act="leaky_relu", leaky_slope=0.2,
              hw_scale=float(h * w))
    off = locate_attention_xla_core(x2d, pos_proj, w1x, b1, w2, b2, **kw)
    on = locate_attention_xla_core(
        x2d, pos_proj, w1x, b1, w2, b2, gate_max=GATE_MAX, **kw
    )
    frac = float(jnp.mean(jnp.abs(off - on) > 1e-6))
    assert frac > 0.02, f"clamp never engaged (diff frac {frac}) — vacuous"


@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
@pytest.mark.parametrize("per_channel", [True, False])
def test_gate_max_fwd_and_grads_match_oracle(mode, per_channel):
    cout = None if per_channel else 1
    x, pos_proj, w1x, b1, w2, b2 = make_inputs(cout=cout, seed=5)
    _assert_clamp_active(x, pos_proj, w1x, b1, w2, b2, mode)
    n, h, w, c = x.shape

    def lf(x, pos_proj, w1x, b1, w2, b2):
        y = fused_locate_attention(
            x, pos_proj, w1x, b1, w2, b2, mode=mode, gate_max=GATE_MAX,
            interpret=True,
        )
        return jnp.sum(y * jnp.cos(y))

    def lo(x, pos_proj, w1x, b1, w2, b2):
        y = locate_attention_xla_core(
            x.reshape(n, h * w, c), pos_proj, w1x, b1, w2, b2,
            mode=mode, act="leaky_relu", leaky_slope=0.2,
            hw_scale=float(h * w), gate_max=GATE_MAX,
        ).reshape(x.shape)
        return jnp.sum(y * jnp.cos(y))

    args = (x, pos_proj, w1x, b1, w2, b2)
    np.testing.assert_allclose(float(lf(*args)), float(lo(*args)), rtol=1e-5)
    gf = jax.grad(lf, argnums=tuple(range(6)))(*args)
    go = jax.grad(lo, argnums=tuple(range(6)))(*args)
    for nm, a, b in zip(("x", "pos_proj", "w1x", "b1", "w2", "b2"), gf, go):
        if mode == "softmax" and nm == "b2":
            continue  # analytically zero under softmax's shift invariance
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=nm
        )


@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
def test_gate_max_multi_tile_grads(mode):
    """HW big enough for multiple spatial tiles: the clamp mask must
    compose with the two-phase running-softmax/csum accumulation."""
    x, pos_proj, w1x, b1, w2, b2 = make_inputs(n=2, h=32, w=32, c=8, hd=8,
                                               seed=13)
    _assert_clamp_active(x, pos_proj, w1x, b1, w2, b2, mode)
    n, h, w, c = x.shape

    def lf(x, w2):
        y = fused_locate_attention(
            x, pos_proj, w1x, b1, w2, b2, mode=mode, gate_max=GATE_MAX,
            interpret=True,
        )
        return jnp.sum(jnp.sin(y))

    def lo(x, w2):
        y = locate_attention_xla_core(
            x.reshape(n, h * w, c), pos_proj, w1x, b1, w2, b2,
            mode=mode, act="leaky_relu", leaky_slope=0.2,
            hw_scale=float(h * w), gate_max=GATE_MAX,
        )
        return jnp.sum(jnp.sin(y))

    gf = jax.grad(lf, argnums=(0, 1))(x, w2)
    go = jax.grad(lo, argnums=(0, 1))(x, w2)
    for nm, a, b in zip(("x", "w2"), gf, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=nm
        )


def _stage_cfg(mode):
    from locate_tpu.config import ModelConfig

    return ModelConfig(
        resolution=16, base_channels=32, max_channels=32, min_channels=16,
        attention=AttentionConfig(pos_features=4, bottleneck=2, mode=mode,
                                  gate_max=GATE_MAX),
        use_pallas=True,
    )


@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
@pytest.mark.parametrize("family", ["disc", "gen"])
def test_gate_max_fused_stage_grads(mode, family, monkeypatch):
    """The fused STAGE kernels (conv + gate in one pass) with an active
    clamp: fwd + grads wrt x and every param leaf vs the unfused layer."""
    monkeypatch.setattr(blocks, "FUSE_MIN_LOCATIONS", 0)
    cfg = _stage_cfg(mode)
    if family == "disc":
        fused = discriminator_stage(32, 32, 32, cfg, last=False)
        oracle = discriminator_stage(
            32, 32, 32, dataclasses.replace(cfg, use_pallas=False), last=False
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 32))
    else:
        fused = generator_stage(16, 32, 32, cfg, first=False)
        oracle = generator_stage(
            16, 32, 32, dataclasses.replace(cfg, use_pallas=False), first=False
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16))
    params = oracle.init(jax.random.PRNGKey(0))
    # Hot logits so the gate saturates GATE_MAX (zero-init gate is 1).
    params = jax.tree.map(
        lambda p: p + 0.25 * jnp.sin(
            jnp.arange(p.size, dtype=jnp.float32)
        ).reshape(p.shape),
        params,
    )
    yf, yo = fused.apply(params, x), oracle.apply(params, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yo),
                               rtol=3e-5, atol=3e-5)
    # Non-vacuous: the same params without the clamp give a different map.
    cfg_off = dataclasses.replace(
        cfg, attention=dataclasses.replace(cfg.attention, gate_max=0.0),
        use_pallas=False,
    )
    if family == "disc":
        unclamped = discriminator_stage(32, 32, 32, cfg_off, last=False)
    else:
        unclamped = generator_stage(16, 32, 32, cfg_off, first=False)
    y_un = unclamped.apply(params, x)
    assert float(jnp.mean(jnp.abs(y_un - yo) > 1e-6)) > 0.02, "clamp inactive"

    def loss(layer, params, x):
        return jnp.sum(jnp.tanh(layer.apply(params, x)))

    gf = jax.grad(loss, argnums=(1, 2))(fused, params, x)
    go = jax.grad(loss, argnums=(1, 2))(oracle, params, x)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_o, _ = jax.tree_util.tree_flatten_with_path(go)
    for (pf, a), (_, b) in zip(flat_f, flat_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(pf),
        )
