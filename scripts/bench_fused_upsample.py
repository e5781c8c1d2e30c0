"""Real-TPU spot check + fwd/bwd microbench of the RESAMPLE-fused stage
heads (round 3): `fused_stage(upsample=True)` computes the generator's
`upsample_nearest(2) -> conv block [-> gate]` in one kernel — the
2x-expanded tensor (the largest in the network) never exists in HBM, and
norm/act/skip run at coarse resolution. `fused_stage(downsample=True)` is
the discriminator mirror: the stage's trailing 2x2 avg-pool happens in
VMEM before the output write.

Implementations per (shape, mode), chained value_and_grad like
scripts/bench_fused_bwd.py. Upsample group:

    up_fused — fused_stage(upsample=True) on the coarse tensor
    fused    — XLA nearest-2x, then fused_stage on the FINE tensor
               (the round-2 wiring this replaces at the >=512^2 tier)
    xla      — pure XLA composition (stage_oracle(upsample=True))

Downsample group (--down): dn_fused / dn_fine (fused stage + XLA pool) /
dn_xla, same pattern.

Also asserts bf16 numerics vs the oracle on the real backend first (the
CLAUDE.md real-TPU spot check; bf16-only bugs are invisible to the fp32
interpret suite).

    python scripts/bench_fused_upsample.py [iters] [--down]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from locate_tpu.ops.pallas.fused_stage import (
    _up2x,
    fused_stage,
    stage_oracle,
)


def make_ops(key, n, res_fine, c, mode, dtype=jnp.bfloat16, coarse=True):
    ks = jax.random.split(key, 12)
    hd = max(8, c // 4)
    rc = res_fine // 2 if coarse else res_fine
    ops = dict(
        x=jax.random.normal(ks[0], (n, rc, rc, c), dtype),
        gn_scale=1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32),
        gn_bias=0.1 * jax.random.normal(ks[2], (c,), jnp.float32),
        w_row=0.1 * jax.random.normal(ks[3], (1, 3, c, c), jnp.float32),
        w_col=0.1 * jax.random.normal(ks[4], (3, 1, c, c), jnp.float32),
        b_col=0.1 * jax.random.normal(ks[5], (c,), jnp.float32),
    )
    if mode is not None:
        ops.update(
            pos_proj=0.1 * jax.random.normal(
                ks[6], (res_fine * res_fine, hd), jnp.float32),
            w1x=0.1 * jax.random.normal(ks[7], (c, hd), jnp.float32),
            b1=0.1 * jax.random.normal(ks[8], (hd,), jnp.float32),
            w2=0.05 * jax.random.normal(ks[9], (hd, c), jnp.float32),
            b2=0.02 * jax.random.normal(ks[10], (c,), jnp.float32),
        )
    return ops


def stage_fn(impl, mode, res_fine):
    kw = dict(groups=8, act="leaky_relu", mode=mode)

    def gate_kw(o):
        if mode is None:
            return {}
        return dict(pos_proj=o["pos_proj"], w1x=o["w1x"], b1=o["b1"],
                    w2=o["w2"], b2=o["b2"])

    if impl == "xla":
        def f(o):
            return stage_oracle(o, h=res_fine, w=res_fine, groups=8,
                                eps=1e-5, act="leaky_relu", leaky_slope=0.2,
                                mode=mode, upsample=True)
        return f
    if impl == "up_fused":
        def f(o):
            return fused_stage(
                o["x"], o["gn_scale"], o["gn_bias"], o["w_row"], o["w_col"],
                o["b_col"], None, **gate_kw(o), upsample=True, **kw)
        return f
    if impl == "fused":  # XLA upsample feeding the fine fused stage
        def f(o):
            return fused_stage(
                _up2x(o["x"]), o["gn_scale"], o["gn_bias"], o["w_row"],
                o["w_col"], o["b_col"], None, **gate_kw(o), **kw)
        return f
    if impl == "dn_xla":
        def f(o):
            return stage_oracle(o, h=res_fine, w=res_fine, groups=8,
                                eps=1e-5, act="leaky_relu", leaky_slope=0.2,
                                mode=mode, downsample=True)
        return f
    if impl == "dn_fused":
        def f(o):
            return fused_stage(
                o["x"], o["gn_scale"], o["gn_bias"], o["w_row"], o["w_col"],
                o["b_col"], None, **gate_kw(o), downsample=True, **kw)
        return f
    assert impl == "dn_fine"  # fine fused stage + XLA avg-pool (old wiring)

    def f(o):
        y = fused_stage(
            o["x"], o["gn_scale"], o["gn_bias"], o["w_row"], o["w_col"],
            o["b_col"], None, **gate_kw(o), **kw)
        n_, hh, ww, cc = y.shape
        p = y.reshape(n_, hh // 2, 2, ww // 2, 2, cc)
        return p.mean(axis=(2, 4))
    return f


def timed_grad(fn, ops, iters):
    @jax.jit
    def step(o):
        val, g = jax.value_and_grad(
            lambda oo: jnp.sum(fn(oo).astype(jnp.float32)))(o)
        new_x = o["x"] * jnp.asarray(0.9, o["x"].dtype) + g["x"].astype(
            o["x"].dtype) * jnp.asarray(0.1, o["x"].dtype)
        return new_x, val

    x, val = step(ops)
    x, val = step(dict(ops, x=x))
    jax.block_until_ready(val)
    best = float("inf")
    for _ in range(3):
        xi = x
        t0 = time.perf_counter()
        for _ in range(iters):
            xi, val = step(dict(ops, x=xi))
        jax.block_until_ready(val)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def spot_check(down=False):
    """bf16 fused vs oracle on the real backend, fwd + grad-wrt-x."""
    fi, oi = ("dn_fused", "dn_xla") if down else ("up_fused", "xla")
    for mode in ("softmax", "sigmoid", None):
        ops = make_ops(jax.random.PRNGKey(7), 1, 64, 64, mode,
                       coarse=not down)
        f = stage_fn(fi, mode, 64)
        o = stage_fn(oi, mode, 64)
        got, want = np.asarray(f(ops), np.float32), np.asarray(
            o(ops), np.float32)
        scale = max(1e-3, float(np.abs(want).max()))
        err = float(np.abs(got - want).max()) / scale
        gf = jax.grad(lambda oo: jnp.sum(f(oo).astype(jnp.float32)))(ops)
        go = jax.grad(lambda oo: jnp.sum(o(oo).astype(jnp.float32)))(ops)
        gerr = float(np.abs(np.asarray(gf["x"], np.float32)
                            - np.asarray(go["x"], np.float32)).max()) / max(
            1e-3, float(np.abs(np.asarray(go["x"], np.float32)).max()))
        print(json.dumps({"spot_check": ("down_" if down else "up_")
                          + (mode or "conv_only"),
                          "rel_err_fwd": round(err, 5),
                          "rel_err_dx": round(gerr, 5)}), flush=True)
        assert err < 0.05 and gerr < 0.05, (mode, err, gerr)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 12
    down = "--down" in sys.argv
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "iters": iters, "group": "down" if down else "up"}),
          flush=True)
    spot_check(down)
    impls = ("dn_fused", "dn_fine", "dn_xla") if down else \
        ("up_fused", "fused", "xla")
    # the ffhq_512 top stage exactly: coarse 256^2 x 64ch -> fine 512^2
    shapes = [(2, 512, 64), (4, 512, 64), (8, 256, 128)]
    for n, res, c in shapes:
        for mode in ("softmax", None):
            ops = make_ops(jax.random.PRNGKey(0), n, res, c, mode,
                           coarse=not down)
            row = {"mode": mode or "conv_only", "shape": f"{n}x{res}^2x{c}"}
            for impl in impls:
                try:
                    t = timed_grad(stage_fn(impl, mode, res), ops, iters)
                    row[impl + "_ms"] = round(t * 1e3, 3)
                except Exception as e:
                    row[impl + "_err"] = repr(e)[:160]
            fu, fi, xl = (i + "_ms" for i in impls)
            if fu in row and xl in row:
                row["speedup_vs_xla"] = round(row[xl] / row[fu], 3)
            if fu in row and fi in row:
                row["speedup_vs_fine_fused"] = round(row[fi] / row[fu], 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
