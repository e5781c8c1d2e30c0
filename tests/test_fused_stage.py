"""Fused stage-group kernel vs the XLA layer composition (SURVEY.md §5
item 2; BASELINE's "conv + attention + norm + activation in a single
pass"). use_pallas must not change init/pytree structure (CLAUDE.md), so
the same params drive both paths; interpret mode runs the identical kernel
logic on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from locate_tpu.config import AttentionConfig, ModelConfig
from locate_tpu.nn import blocks
from locate_tpu.nn.blocks import (
    discriminator_stage,
    generator_stage,
    stage_fusable,
)


@pytest.fixture(autouse=True)
def _force_fusion(monkeypatch):
    """The production never-slower gate fuses only at >= 512^2 locations
    (docs/DESIGN.md table); tests drop it so the kernel runs at test sizes.
    test_gate_respects_threshold restores the default to pin the gate."""
    monkeypatch.setattr(blocks, "FUSE_MIN_LOCATIONS", 0)


def _model_cfg(mode="sigmoid", **kw):
    base = dict(
        resolution=16,
        base_channels=32,
        max_channels=32,
        min_channels=16,
        attention=AttentionConfig(pos_features=4, bottleneck=2, mode=mode),
        use_pallas=True,
    )
    base.update(kw)
    return ModelConfig(**base)


def _pair(cfg, build, *args):
    """(fused_layer, oracle_layer) with identical params."""
    fused = build(*args, cfg, True)
    oracle = build(
        *args, dataclasses.replace(cfg, use_pallas=False), True
    )
    return fused, oracle


def _gen_pair(cfg, in_ch, out_ch, res):
    f = generator_stage(in_ch, out_ch, res, cfg, first=False)
    o = generator_stage(
        in_ch, out_ch, res, dataclasses.replace(cfg, use_pallas=False),
        first=False,
    )
    return f, o


def _disc_pair(cfg, in_ch, out_ch, res):
    f = discriminator_stage(in_ch, out_ch, res, cfg, last=False)
    o = discriminator_stage(
        in_ch, out_ch, res, dataclasses.replace(cfg, use_pallas=False),
        last=False,
    )
    return f, o


@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
@pytest.mark.parametrize("skip_proj", [False, True])
def test_fused_stage_forward_matches_oracle(mode, skip_proj):
    cfg = _model_cfg(mode)
    in_ch, out_ch = (16, 32) if skip_proj else (32, 32)
    fused, oracle = _disc_pair(cfg, in_ch, out_ch, 32)
    params = oracle.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, in_ch), jnp.float32)
    # attention logits are zero-init -> nudge them so the gate is non-trivial
    params = jax.tree.map(
        lambda p: p + 0.01 * jnp.sin(jnp.arange(p.size, dtype=jnp.float32)).reshape(p.shape),
        params,
    )
    got = fused.apply(params, x)
    want = oracle.apply(params, x)
    assert got.shape == want.shape == (2, 16, 16, out_ch)  # stage downsamples
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_stage_generator_multiblock_and_upsample():
    """blocks_per_stage=2: the upsample fuses INTO the first conv block
    (round 3, `upsample=True` — the 2x-expanded tensor never exists in
    HBM), the second conv block fuses with the attention."""
    cfg = _model_cfg("sigmoid", blocks_per_stage=2)
    fused, oracle = _gen_pair(cfg, 16, 32, 32)
    params = oracle.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda p: p + 0.01, params)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16), jnp.float32)
    got = fused.apply(params, x)
    want = oracle.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
def test_fused_stage_upsample_triple_grads(mode):
    """The full generator stage head — upsample + conv block + attention —
    as ONE fused kernel call (blocks_per_stage=1): fwd and grads wrt x and
    every param leaf vs the unfused composition."""
    cfg = _model_cfg(mode)
    fused, oracle = _gen_pair(cfg, 16, 32, 32)
    params = oracle.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda p: p + 0.02, params)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16), jnp.float32)

    def loss(layer):
        def f(p, xx):
            y = layer.apply(p, xx)
            return jnp.sum(jnp.sin(y.astype(jnp.float32)))
        return f

    got = fused.apply(params, x)
    want = oracle.apply(params, x)
    assert got.shape == (2, 32, 32, 32)  # stage upsamples 16 -> 32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    (gp_f, gx_f) = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    (gp_o, gx_o) = jax.grad(loss(oracle), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_o),
                               rtol=5e-5, atol=5e-5)
    for (kf, lf), (ko, lo) in zip(
        jax.tree_util.tree_leaves_with_path(gp_f),
        jax.tree_util.tree_leaves_with_path(gp_o),
    ):
        if mode == "softmax" and "to_logits" in str(kf) and lf.ndim == 1:
            continue  # db2 analytically zero under softmax shift invariance
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lo), rtol=5e-5, atol=5e-5,
            err_msg=str(kf),
        )


def test_fused_stage_upsample_identity_skip():
    """upsample=True with C == Co (identity skip): the skip path is
    up(x) itself, expanded in VMEM."""
    from locate_tpu.ops.pallas.fused_stage import fused_stage, stage_oracle

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    n, hc, wc, c = 2, 8, 8, 32
    x = jax.random.normal(ks[0], (n, hc, wc, c), jnp.float32)
    ops = dict(
        x=x,
        gn_scale=1.0 + 0.1 * jax.random.normal(ks[1], (c,)),
        gn_bias=0.1 * jax.random.normal(ks[2], (c,)),
        w_row=0.1 * jax.random.normal(ks[3], (1, 3, c, c)),
        w_col=0.1 * jax.random.normal(ks[4], (3, 1, c, c)),
        b_col=0.1 * jax.random.normal(ks[5], (c,)),
    )

    def fused_fn(o):
        return fused_stage(o["x"], o["gn_scale"], o["gn_bias"], o["w_row"],
                           o["w_col"], o["b_col"], None, groups=4,
                           mode=None, interpret=True, upsample=True)

    def oracle_fn(o):
        return stage_oracle(o, h=2 * hc, w=2 * wc, groups=4, eps=1e-5,
                            act="leaky_relu", leaky_slope=0.2, mode=None,
                            upsample=True)

    np.testing.assert_allclose(np.asarray(fused_fn(ops)),
                               np.asarray(oracle_fn(ops)),
                               rtol=2e-5, atol=2e-5)

    def run(fn):
        return jax.grad(lambda o: jnp.sum(jnp.sin(fn(o))))(ops)

    got, want = run(fused_fn), run(oracle_fn)
    for k in ops:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=5e-5, atol=5e-5, err_msg=k)


@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
@pytest.mark.parametrize("skip_proj", [False, True])
def test_fused_stage_grads_match_oracle(mode, skip_proj):
    """Gradients wrt x AND every param leaf. Round 3: the backward is the
    HAND-WRITTEN kernel chain (attention-bwd on the recomputed pre-gate
    output + conv-block bwd + XLA GroupNorm epilogue) — this test is its
    oracle gate, covering both the 1x1-projection and identity skip."""
    cfg = _model_cfg(mode)
    in_ch = 16 if skip_proj else 32
    fused, oracle = _disc_pair(cfg, in_ch, 32, 32)
    params = oracle.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda p: p + 0.02, params)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, in_ch),
                          jnp.float32)

    def loss(layer):
        def f(p, xx):
            y = layer.apply(p, xx)
            return jnp.sum(jnp.sin(y.astype(jnp.float32)))
        return f

    (gp_f, gx_f) = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    (gp_o, gx_o) = jax.grad(loss(oracle), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_o),
                               rtol=5e-5, atol=5e-5)
    for (kf, lf), (ko, lo) in zip(
        jax.tree_util.tree_leaves_with_path(gp_f),
        jax.tree_util.tree_leaves_with_path(gp_o),
    ):
        if mode == "softmax" and "to_logits" in str(kf) and lf.ndim == 1:
            continue  # db2 is analytically zero (softmax shift
            # invariance); both sides are pure cancellation noise
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lo), rtol=5e-5, atol=5e-5,
            err_msg=str(kf),
        )


def test_fused_stage_conv_only_grads_match_oracle():
    """mode=None (conv block only, no gate): the public fused_stage API's
    bare-conv path, fwd + hand-written bwd vs the oracle, plus the
    oracle_bwd=True escape hatch staying bit-compatible in structure."""
    from locate_tpu.ops.pallas.fused_stage import fused_stage, stage_oracle

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    n, h, w, c, co = 2, 16, 16, 16, 32
    x = jax.random.normal(ks[0], (n, h, w, c), jnp.float32)
    ops = dict(
        x=x,
        gn_scale=1.0 + 0.1 * jax.random.normal(ks[1], (c,)),
        gn_bias=0.1 * jax.random.normal(ks[2], (c,)),
        w_row=0.1 * jax.random.normal(ks[3], (1, 3, c, co)),
        w_col=0.1 * jax.random.normal(ks[4], (3, 1, co, co)),
        b_col=0.1 * jax.random.normal(ks[5], (co,)),
        w_skip=0.1 * jax.random.normal(ks[6], (1, 1, c, co)),
    )

    def run(fn):
        def loss(o):
            return jnp.sum(jnp.sin(fn(o)))
        return jax.grad(loss)(ops)

    kw = dict(groups=4, act="leaky_relu", mode=None, interpret=True)

    def fused_fn(o):
        return fused_stage(
            o["x"], o["gn_scale"], o["gn_bias"], o["w_row"], o["w_col"],
            o["b_col"], o["w_skip"], **kw,
        )

    def oracle_fn(o):
        return stage_oracle(o, h=h, w=w, groups=4, eps=1e-5,
                            act="leaky_relu", leaky_slope=0.2, mode=None)

    got = run(fused_fn)
    want = run(oracle_fn)
    for k in ops:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=5e-5, atol=5e-5,
            err_msg=k,
        )

    def fused_oracle_bwd(o):
        return fused_stage(
            o["x"], o["gn_scale"], o["gn_bias"], o["w_row"], o["w_col"],
            o["b_col"], o["w_skip"], oracle_bwd=True, **kw,
        )

    via_escape = run(fused_oracle_bwd)
    for k in ops:
        # same math as the oracle run, modulo jit/fusion reduction order
        np.testing.assert_allclose(
            np.asarray(via_escape[k]), np.asarray(want[k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_fused_stage_gradgrad_r1_style():
    """R1-style grad-of-grad works through the fused stage (the backward is
    the XLA oracle, which is fully differentiable)."""
    cfg = _model_cfg("sigmoid")
    fused, oracle = _disc_pair(cfg, 16, 16, 32)
    params = oracle.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 16), jnp.float32)

    def pen(layer):
        def f(xx):
            g = jax.grad(lambda v: jnp.sum(layer.apply(params, v) ** 2))(xx)
            return jnp.sum(g * g)
        return f

    got = jax.grad(pen(fused))(x)
    want = jax.grad(pen(oracle))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_gate_respects_threshold(monkeypatch):
    """Below FUSE_MIN_LOCATIONS the stage runs the plain XLA path — with
    the production default (512^2) a small input is BITWISE equal to the
    oracle because the very same layers execute."""
    monkeypatch.setattr(blocks, "FUSE_MIN_LOCATIONS", 512 * 512)
    cfg = _model_cfg("sigmoid")
    res = 16
    fused, oracle = _disc_pair(cfg, 16, 16, res)
    params = oracle.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, res, res, 16), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(fused.apply(params, x)),
        np.asarray(oracle.apply(params, x)),
    )


def test_fused_stage_wide_channels_branch():
    """C >= 128 takes the per-tap (3-matmul) kernel branch; C < 128 takes
    the lane-concat K=3C branch (covered by the other tests) — pin the wide
    branch too."""
    cfg = _model_cfg("sigmoid", base_channels=128, max_channels=128,
                     min_channels=128)
    fused, oracle = _disc_pair(cfg, 128, 128, 16)
    params = oracle.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda p: p + 0.01, params)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 128), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, x)),
        np.asarray(oracle.apply(params, x)),
        rtol=2e-5, atol=2e-5,
    )


def test_stage_fusable_gates():
    assert stage_fusable(_model_cfg())
    assert not stage_fusable(_model_cfg(use_pallas=False))
    assert not stage_fusable(_model_cfg(norm="pixel"))
    assert not stage_fusable(_model_cfg(factorized=False))
    assert not stage_fusable(_model_cfg(kernel_size=5))


def test_fused_stage_conv_only_mode():
    """fused_stage(mode=None) — the conv block alone (public kernel API,
    not wired into stages after the profitability measurements) — still
    matches its oracle."""
    from locate_tpu.ops.pallas.fused_stage import fused_stage, stage_oracle

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    c, co, res = 16, 32, 16
    x = jax.random.normal(ks[0], (2, res, res, c), jnp.float32)
    ops = {
        "x": x,
        "gn_scale": 1.0 + 0.1 * jax.random.normal(ks[1], (c,)),
        "gn_bias": 0.1 * jax.random.normal(ks[2], (c,)),
        "w_row": jax.random.normal(ks[3], (1, 3, c, co)) * 0.1,
        "w_col": jax.random.normal(ks[4], (3, 1, co, co)) * 0.1,
        "b_col": 0.1 * jax.random.normal(ks[5], (co,)),
        "w_skip": jax.random.normal(ks[6], (1, 1, c, co)) * 0.1,
    }
    got = fused_stage(
        x, ops["gn_scale"], ops["gn_bias"], ops["w_row"], ops["w_col"],
        ops["b_col"], ops["w_skip"], groups=4, interpret=True,
    )
    want = stage_oracle(ops, h=res, w=res, groups=4, eps=1e-5,
                        act="leaky_relu", leaky_slope=0.2, mode=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_stage_downsample_conv_only():
    """fused_stage(downsample=True, mode=None): the discriminator-stage
    tail for a bare conv block — 2x2 avg-pool fused into the output
    write — fwd + grads vs the oracle."""
    from locate_tpu.ops.pallas.fused_stage import fused_stage, stage_oracle

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    n, res, c, co = 2, 16, 16, 32
    x = jax.random.normal(ks[0], (n, res, res, c), jnp.float32)
    ops = dict(
        x=x,
        gn_scale=1.0 + 0.1 * jax.random.normal(ks[1], (c,)),
        gn_bias=0.1 * jax.random.normal(ks[2], (c,)),
        w_row=0.1 * jax.random.normal(ks[3], (1, 3, c, co)),
        w_col=0.1 * jax.random.normal(ks[4], (3, 1, co, co)),
        b_col=0.1 * jax.random.normal(ks[5], (co,)),
        w_skip=0.1 * jax.random.normal(ks[6], (1, 1, c, co)),
    )

    def fused_fn(o):
        return fused_stage(o["x"], o["gn_scale"], o["gn_bias"], o["w_row"],
                           o["w_col"], o["b_col"], o["w_skip"], groups=4,
                           mode=None, interpret=True, downsample=True)

    def oracle_fn(o):
        return stage_oracle(o, h=res, w=res, groups=4, eps=1e-5,
                            act="leaky_relu", leaky_slope=0.2, mode=None,
                            downsample=True)

    got, want = fused_fn(ops), oracle_fn(ops)
    assert got.shape == (n, res // 2, res // 2, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def run(fn):
        return jax.grad(lambda o: jnp.sum(jnp.sin(fn(o))))(ops)

    gf, go = run(fused_fn), run(oracle_fn)
    for k in ops:
        np.testing.assert_allclose(np.asarray(gf[k]), np.asarray(go[k]),
                                   rtol=5e-5, atol=5e-5, err_msg=k)


@pytest.mark.parametrize("resample", ["upsample", "downsample"])
def test_fused_stage_resample_bf16_interpret(resample):
    """The resample paths run their expand/pool in f32 with casts placed
    to match the oracle bitwise (Mosaic cannot sublane-reshape bf16) —
    run the bf16 dtype through interpret mode to pin the cast placement
    logic; the real-backend Mosaic check lives in
    scripts/bench_fused_upsample.py."""
    from locate_tpu.ops.pallas.fused_stage import fused_stage, stage_oracle

    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    up = resample == "upsample"
    c = 32
    hin = 8 if up else 16
    h = 16  # oracle's fine dims
    x = jax.random.normal(ks[0], (2, hin, hin, c), jnp.float32).astype(
        jnp.bfloat16)
    ops = dict(
        x=x,
        gn_scale=1.0 + 0.1 * jax.random.normal(ks[1], (c,)),
        gn_bias=0.1 * jax.random.normal(ks[2], (c,)),
        w_row=0.1 * jax.random.normal(ks[3], (1, 3, c, c)),
        w_col=0.1 * jax.random.normal(ks[4], (3, 1, c, c)),
        b_col=0.1 * jax.random.normal(ks[5], (c,)),
        pos_proj=0.1 * jax.random.normal(ks[6], (h * h, 8)),
        w1x=0.1 * jax.random.normal(ks[7], (c, 8)),
        b1=jnp.zeros((8,)),
        w2=0.05 * jax.random.normal(ks[0], (8, c)),
        b2=jnp.zeros((c,)),
    )
    kw = dict(groups=4, act="leaky_relu", mode="softmax", interpret=True,
              upsample=up, downsample=not up)
    got = fused_stage(ops["x"], ops["gn_scale"], ops["gn_bias"],
                      ops["w_row"], ops["w_col"], ops["b_col"], None,
                      pos_proj=ops["pos_proj"], w1x=ops["w1x"], b1=ops["b1"],
                      w2=ops["w2"], b2=ops["b2"], **kw)
    want = stage_oracle(ops, h=h, w=h, groups=4, eps=1e-5, act="leaky_relu",
                        leaky_slope=0.2, mode="softmax", upsample=up,
                        downsample=not up)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_pytree_structure_unchanged():
    """use_pallas flips apply paths only — init structure is identical
    (checkpoints and the R1 twin depend on this)."""
    cfg = _model_cfg("softmax")
    fused, oracle = _gen_pair(cfg, 16, 32, 32)
    tf = jax.tree_util.tree_structure(fused.init(jax.random.PRNGKey(0)))
    to = jax.tree_util.tree_structure(oracle.init(jax.random.PRNGKey(0)))
    assert tf == to


def test_pick_rows_budget_env(monkeypatch):
    """LOCATE_TPU_VMEM_BUDGET steers the rows-per-tile choice (tuning
    knob for gate re-measurement runs)."""
    from locate_tpu.ops.pallas.fused_stage import _pick_rows

    base = _pick_rows(256, 256, 64, 64, 16)
    monkeypatch.setenv("LOCATE_TPU_VMEM_BUDGET", str(64 * 1024 * 1024))
    big = _pick_rows(256, 256, 64, 64, 16)
    monkeypatch.setenv("LOCATE_TPU_VMEM_BUDGET", str(256 * 1024))
    small = _pick_rows(256, 256, 64, 64, 16)
    assert small <= base <= big
    assert small < big
    assert 256 % small == 0 and 256 % big == 0


def test_gate_profile_defaults_and_override(monkeypatch, tmp_path):
    """Gates are data (VERDICT r3 #5): the checked-in profile carries every
    flavor at the round-3 measured 512^2 threshold + the 4 MiB VMEM budget;
    per-flavor profiles and the all-flavor FUSE_MIN_LOCATIONS override both
    route through blocks._fuse_threshold."""
    import json

    from locate_tpu.ops.pallas import gate_profile

    prof = gate_profile.load()
    for fl in gate_profile.FLAVORS:
        assert prof["min_locations"][fl] == 512 * 512
    assert gate_profile.vmem_budget() == 4 * 1024 * 1024

    # the autouse _force_fusion fixture sets FUSE_MIN_LOCATIONS=0: the
    # int override wins over the profile for every flavor
    assert blocks._fuse_threshold("pair") == 0
    assert blocks._fuse_threshold("up_conv") == 0

    # per-flavor profile via LOCATE_TPU_GATE_PROFILE, active only when the
    # override is None (production default)
    monkeypatch.setattr(blocks, "FUSE_MIN_LOCATIONS", None)
    custom = dict(prof)
    custom["min_locations"] = dict(prof["min_locations"], pair=64,
                                   down_pair=16)
    p = tmp_path / "prof.json"
    p.write_text(json.dumps(custom))
    monkeypatch.setenv("LOCATE_TPU_GATE_PROFILE", str(p))
    try:
        assert blocks._fuse_threshold("pair") == 64
        assert blocks._fuse_threshold("down_pair") == 16
        assert blocks._fuse_threshold("conv") == 512 * 512
    finally:
        monkeypatch.delenv("LOCATE_TPU_GATE_PROFILE")
        gate_profile.reload()


def test_gate_profile_dispatches_per_flavor(monkeypatch, tmp_path):
    """A profile that opens ONLY the down_pair flavor makes the
    discriminator stage take the fused path at small sizes (bf16 numerics
    differ from the oracle beyond bitwise) while a generator stage
    (up_pair flavor, still at 512^2) stays on the bitwise-identical XLA
    path."""
    import json

    from locate_tpu.ops.pallas import gate_profile

    monkeypatch.setattr(blocks, "FUSE_MIN_LOCATIONS", None)
    prof = dict(gate_profile.load())
    prof["min_locations"] = dict(prof["min_locations"], down_pair=1)
    p = tmp_path / "prof.json"
    p.write_text(json.dumps(prof))
    monkeypatch.setenv("LOCATE_TPU_GATE_PROFILE", str(p))
    try:
        cfg = _model_cfg("sigmoid")
        res = 16
        fused, oracle = _disc_pair(cfg, 16, 16, res)
        params = oracle.init(jax.random.PRNGKey(0))
        params = jax.tree.map(lambda q: q + 0.01, params)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, res, res, 16),
                              jnp.float32)
        got = fused.apply(params, x)
        want = oracle.apply(params, x)
        # fused (interpret-mode kernel) matches to tolerance but NOT
        # bitwise — proof the kernel actually dispatched for down_pair
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-5, atol=5e-5)
        assert np.asarray(got).tobytes() != np.asarray(want).tobytes()

        gfused, goracle = _gen_pair(cfg, 16, 16, res)
        gp = goracle.init(jax.random.PRNGKey(0))
        gx = jax.random.normal(jax.random.PRNGKey(2), (2, res // 2, res // 2, 16),
                               jnp.float32)
        # up_pair still gated at 512^2: bitwise equal = XLA path ran
        np.testing.assert_array_equal(
            np.asarray(gfused.apply(gp, gx)),
            np.asarray(goracle.apply(gp, gx)),
        )
    finally:
        monkeypatch.delenv("LOCATE_TPU_GATE_PROFILE")
        gate_profile.reload()
