"""Real-TPU fwd+BWD microbench of the fused stage (VERDICT r2 task 4):
the train step is ~2/3 backward, so the round-2 fused-forward win at
512^2 was diluted by the oracle (jax.vjp) backward. Round 3 hand-wrote
the backward kernels; this measures, per shape and mode, the chained
value_and_grad cost of

    pallas   — Pallas forward + hand-written Pallas backward
    pal_ovjp — Pallas forward + XLA-oracle backward (round-2 behavior)
    xla      — pure XLA composition (stage_oracle) both ways

Chained through a data dependency (x_{i+1} = stage(x_i)) so dispatch
latency amortizes. One JSON line per (shape, mode).

    python scripts/bench_fused_bwd.py [iters]
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from locate_tpu.ops.pallas.fused_stage import fused_stage, stage_oracle


def make_ops(key, n, res, c, mode, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 12)
    hd = max(8, c // 4)
    ops = dict(
        x=jax.random.normal(ks[0], (n, res, res, c), dtype),
        gn_scale=1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32),
        gn_bias=0.1 * jax.random.normal(ks[2], (c,), jnp.float32),
        w_row=0.1 * jax.random.normal(ks[3], (1, 3, c, c), jnp.float32),
        w_col=0.1 * jax.random.normal(ks[4], (3, 1, c, c), jnp.float32),
        b_col=0.1 * jax.random.normal(ks[5], (c,), jnp.float32),
    )
    if mode is not None:
        ops.update(
            pos_proj=0.1 * jax.random.normal(ks[6], (res * res, hd),
                                             jnp.float32),
            w1x=0.1 * jax.random.normal(ks[7], (c, hd), jnp.float32),
            b1=0.1 * jax.random.normal(ks[8], (hd,), jnp.float32),
            w2=0.05 * jax.random.normal(ks[9], (hd, c), jnp.float32),
            b2=0.02 * jax.random.normal(ks[10], (c,), jnp.float32),
        )
    return ops


def stage_fn(impl, mode):
    kw = dict(groups=8, act="leaky_relu", mode=mode)

    def conv_args(o):
        return (o["x"], o["gn_scale"], o["gn_bias"], o["w_row"], o["w_col"],
                o["b_col"], None)

    def gate_kw(o):
        if mode is None:
            return {}
        return dict(pos_proj=o["pos_proj"], w1x=o["w1x"], b1=o["b1"],
                    w2=o["w2"], b2=o["b2"])

    if impl == "xla":
        def f(o):
            return stage_oracle(o, h=o["x"].shape[1], w=o["x"].shape[2],
                                groups=8, eps=1e-5, act="leaky_relu",
                                leaky_slope=0.2, mode=mode)
        return f
    oracle_bwd = impl == "pal_ovjp"

    def f(o):
        return fused_stage(*conv_args(o), **gate_kw(o),
                           oracle_bwd=oracle_bwd, **kw)
    return f


def timed_grad(fn, ops, iters):
    # ONE fwd+bwd per jit (compiling an N-deep chained grad of
    # kernel-laden stages took >10 min over the remote-compile tunnel);
    # chain the calls on the host instead — the next x depends on this
    # call's gradient, so the dispatches cannot overlap-cheat.
    @jax.jit
    def step(o):
        val, g = jax.value_and_grad(
            lambda oo: jnp.sum(fn(oo).astype(jnp.float32)))(o)
        new_x = o["x"] * jnp.asarray(0.9, o["x"].dtype) + g["x"].astype(
            o["x"].dtype) * jnp.asarray(0.1, o["x"].dtype)
        return new_x, val

    x, val = step(ops)         # compile + warm
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
    return best, None


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "iters": iters}), flush=True)
    # 512^2 first (the tier where the fused forward pays — the decision
    # shape), then the lower tiers to re-check the gate with bwd fused
    shapes = [(2, 512, 64), (8, 256, 128), (16, 128, 64), (16, 64, 128)]
    for n, res, c in shapes:
        for mode in ("softmax", "sigmoid", None):
            ops = make_ops(jax.random.PRNGKey(0), n, res, c, mode)
            row = {"mode": mode or "conv_only", "shape": f"{n}x{res}x{res}x{c}"}
            for impl in ("pallas", "pal_ovjp", "xla"):
                try:
                    t, _ = timed_grad(stage_fn(impl, mode), ops, iters)
                    row[impl + "_ms"] = round(t * 1e3, 3)
                except Exception as e:
                    row[impl + "_err"] = repr(e)[:160]
            if "pallas_ms" in row and "xla_ms" in row:
                row["speedup_vs_xla"] = round(row["xla_ms"] / row["pallas_ms"], 3)
            if "pallas_ms" in row and "pal_ovjp_ms" in row:
                row["speedup_vs_oraclebwd"] = round(
                    row["pal_ovjp_ms"] / row["pallas_ms"], 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
