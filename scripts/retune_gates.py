"""Turnkey re-tune of the fused-kernel dispatch gates (VERDICT r3 #5).

Measures, on the CURRENT backend, chained fwd+bwd wall time of the Pallas
fused stage vs the pure-XLA composition for every stage flavor
(pair / conv / up_pair / up_conv / down_pair / down_conv) over the
resolution ladder, derives per-flavor never-slower thresholds, and
rewrites `locate_tpu/ops/pallas/gate_profile.json` in place (--write) or
prints the would-be table (default, dry run).

    python scripts/retune_gates.py                # measure + print
    python scripts/retune_gates.py --write        # measure + rewrite profile
    python scripts/retune_gates.py --iters 20 --margin 0.02

Threshold rule (never-slower, monotone-in-locations assumption that the
round-2/3 tables support): for each flavor take the LARGEST resolution
where fused loses to XLA by more than --margin and set
min_locations = (2 * that_res)^2; if fused wins everywhere measured, the
smallest measured resolution's location count; if it loses everywhere,
2 * the largest (i.e. never fuse at practical sizes).

The pair flavors are measured in BOTH gate modes (softmax and sigmoid)
and take the more conservative threshold — the gate must never slow
either mode down. Runs in the production numerics (bf16 activations,
f32 params).

NOTE (docs/DESIGN.md "Measured lessons"): the tunneled emulator's
absolute timing is bimodal across sessions; ratios within one run are
the signal. On the emulator this script is a smoke test of the harness —
the committed defaults stay until someone runs --write on real hardware.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:  # harness smoke: force CPU before backend init
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from locate_tpu.ops.pallas import gate_profile
from locate_tpu.ops.pallas.fused_stage import fused_stage, stage_oracle

# (res, channels, batch) ladder: the flagship configs' stage shapes.
# `res` is always the FINE resolution (upsample flavors feed res/2 in).
LADDER = [(64, 128, 16), (128, 64, 16), (256, 64, 8), (512, 64, 2)]


def make_ops(key, n, res, c, mode, upsample, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 12)
    hd = max(8, c // 4)
    xres = res // 2 if upsample else res
    ops = dict(
        x=jax.random.normal(ks[0], (n, xres, xres, c), dtype),
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


def stage_fn(impl, mode, res, upsample, downsample, interpret):
    kw = dict(groups=8, act="leaky_relu", mode=mode,
              upsample=upsample, downsample=downsample)

    def gate_kw(o):
        if mode is None:
            return {}
        return dict(pos_proj=o["pos_proj"], w1x=o["w1x"], b1=o["b1"],
                    w2=o["w2"], b2=o["b2"])

    if impl == "xla":
        def f(o):
            return stage_oracle(o, h=res, w=res, groups=8, eps=1e-5,
                                act="leaky_relu", leaky_slope=0.2,
                                mode=mode, upsample=upsample,
                                downsample=downsample)
        return f

    def f(o):
        return fused_stage(o["x"], o["gn_scale"], o["gn_bias"], o["w_row"],
                           o["w_col"], o["b_col"], None, **gate_kw(o),
                           interpret=interpret, **kw)
    return f


def timed_grad(fn, ops, iters, reps):
    """One fwd+bwd per jit, chained on the host through the gradient (the
    next x depends on this call's grad, so dispatches can't overlap-cheat;
    same discipline as scripts/bench_fused_bwd.py)."""
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
    for _ in range(reps):
        xi = x
        t0 = time.perf_counter()
        for _ in range(iters):
            xi, val = step(dict(ops, x=xi))
        jax.block_until_ready(val)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="rewrite gate_profile.json with the new table")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--margin", type=float, default=0.02,
                    help="fused must beat XLA by this fraction to count "
                         "as a win (absorbs run-to-run noise)")
    ap.add_argument("--out", type=str, default="",
                    help="write to this path instead of the package profile")
    ap.add_argument("--ladder", type=str, default="",
                    help="override the shape ladder: res:ch:n,res:ch:n,... "
                         "(smoke tests use a tiny one)")
    args = ap.parse_args()

    global LADDER
    if args.ladder:
        LADDER = [tuple(int(v) for v in s.split(":"))
                  for s in args.ladder.split(",")]

    platform = jax.devices()[0].platform
    interpret = platform == "cpu"
    device = jax.devices()[0].device_kind
    print(f"retune_gates: backend={platform} device={device} "
          f"iters={args.iters} margin={args.margin}", flush=True)
    if interpret:
        print("WARNING: CPU/interpret backend — harness smoke only, "
              "timings are meaningless for gating", flush=True)

    # flavor -> (mode list, upsample, downsample)
    flavor_specs = {
        "pair": (["softmax", "sigmoid"], False, False),
        "conv": ([None], False, False),
        "up_pair": (["softmax", "sigmoid"], True, False),
        "up_conv": ([None], True, False),
        "down_pair": (["softmax", "sigmoid"], False, True),
        "down_conv": ([None], False, True),
    }

    table = []  # measurement audit rows
    new_min = {}
    for flavor, (modes, up, down) in flavor_specs.items():
        worst_losing_res = 0  # largest res where ANY mode loses
        best_winning_res = None
        for res, c, n in LADDER:
            for mode in modes:
                ops = make_ops(jax.random.PRNGKey(0), n, res, c, mode, up)
                row = {"flavor": flavor, "mode": mode or "conv_only",
                       "res": res, "channels": c, "batch": n}
                try:
                    tf = timed_grad(
                        stage_fn("pallas", mode, res, up, down, interpret),
                        ops, args.iters, args.reps)
                    tx = timed_grad(
                        stage_fn("xla", mode, res, up, down, interpret),
                        ops, args.iters, args.reps)
                    row["fused_ms"] = round(tf * 1e3, 3)
                    row["xla_ms"] = round(tx * 1e3, 3)
                    row["speedup"] = round(tx / tf, 3)
                    win = tx / tf >= 1.0 + args.margin
                    row["win"] = bool(win)
                    if not win:
                        worst_losing_res = max(worst_losing_res, res)
                    elif best_winning_res is None or res < best_winning_res:
                        best_winning_res = res
                except Exception as e:  # e.g. OOM / tunnel 500 at big shapes
                    row["error"] = repr(e)[:160]
                print(json.dumps(row), flush=True)
                table.append(row)
        if worst_losing_res == 0 and best_winning_res is not None:
            thr = best_winning_res * best_winning_res
        elif worst_losing_res >= LADDER[-1][0]:
            thr = (2 * LADDER[-1][0]) ** 2  # loses everywhere: never fuse
        else:
            thr = (2 * worst_losing_res) ** 2
        new_min[flavor] = int(thr)
        print(f"-> {flavor}: min_locations={thr} "
              f"({int(thr ** 0.5)}^2)", flush=True)

    prof = dict(gate_profile.load())
    prof["min_locations"] = new_min
    prof["meta"] = {
        "source": "scripts/retune_gates.py",
        "backend": platform,
        "device": device,
        "iters": args.iters,
        "margin": args.margin,
        "measurements": table,
    }
    target = args.out or gate_profile.profile_path()
    if args.write or args.out:
        with open(target, "w") as fh:
            json.dump(prof, fh, indent=1)
        gate_profile.reload()
        print(f"wrote {target}")
    else:
        print("dry run (pass --write to rewrite "
              f"{gate_profile.profile_path()}); derived table:")
        print(json.dumps(new_min, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
