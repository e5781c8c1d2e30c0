"""Real-TPU microbench + bf16 spot check: fused stage kernel vs the XLA
layer path (VERDICT r2 task 1 'measure each stage on the real chip').

Chained forward calls (data dependency through the stage) at the
shape ladder of the primary 128^2 bench config and the 512^2 config.
Prints one JSON line per shape. Run on the TPU backend:

    python scripts/bench_fused_stage.py [mode]
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from locate_tpu.config import AttentionConfig, ModelConfig
from locate_tpu.nn.blocks import generator_stage


def stage_pair(res, ch, mode):
    cfg = ModelConfig(
        resolution=max(res, 8),
        base_channels=ch,
        max_channels=ch,
        min_channels=ch,
        attention=AttentionConfig(mode="sigmoid" if mode == "none" else mode),
        attention_stages=() if mode == "none" else "all",
        use_pallas=True,
    )
    fused = generator_stage(ch, ch, res, cfg, first=True, compute_dtype=jnp.bfloat16)
    oracle = generator_stage(
        ch, ch, res, dataclasses.replace(cfg, use_pallas=False), first=True,
        compute_dtype=jnp.bfloat16,
    )
    return fused, oracle


def timed(apply_fn, params, x, iters=30):
    @jax.jit
    def chain(p, x0):
        y = x0
        for _ in range(iters):
            y = apply_fn(p, y * jnp.asarray(0.999, y.dtype) + x0 * jnp.asarray(0.001, y.dtype))
        return y

    y = chain(params, x)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = chain(params, x)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "softmax"
    print(json.dumps({"device": jax.devices()[0].device_kind, "mode": mode}))
    # (res, channels, batch): the 128^2 primary config's stage ladder plus
    # the 512^2 top stage
    shapes = [(128, 64, 16), (64, 128, 16), (32, 256, 16), (16, 512, 16),
              (256, 64, 8), (256, 128, 8), (512, 64, 2)]
    # optional filter: "shapes=res:ch:n,res:ch:n" limits the ladder (gate
    # tuning runs re-measure only the disputed shapes)
    for a in sys.argv[2:]:
        if a.startswith("shapes="):
            shapes = [tuple(int(v) for v in s.split(":"))
                      for s in a.split("=", 1)[1].split(",")]
    for res, ch, n in shapes:
        fused, oracle = stage_pair(res, ch, mode)
        params = oracle.init(jax.random.PRNGKey(0))
        params = jax.tree.map(lambda p: p + 0.01, params)
        x = jax.random.normal(jax.random.PRNGKey(1), (n, res, res, ch), jnp.bfloat16)

        # bf16 spot check (fused vs oracle on the real chip)
        yf = np.asarray(fused.apply(params, x), np.float32)
        yo = np.asarray(oracle.apply(params, x), np.float32)
        scale = max(1e-6, float(np.abs(yo).max()))
        max_rel = float(np.abs(yf - yo).max() / scale)

        tf = timed(fused.apply, params, x)
        to = timed(oracle.apply, params, x)
        print(json.dumps({
            "shape": f"{n}x{res}x{res}x{ch}",
            "fused_ms": round(tf * 1e3, 3),
            "xla_ms": round(to * 1e3, 3),
            "speedup": round(to / tf, 3),
            "bf16_max_rel_err": round(max_rel, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
