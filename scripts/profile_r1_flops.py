"""Second R1 diagnostic (VERDICT r2 task 2): is the ~70x-plain R1 step a
FLOPs problem (XLA compiles a bloated grad-of-grad graph -> fixable) or a
hardware/emulator problem (normal FLOPs executed slowly)?

  * compiled cost analysis FLOPs for plain vs r1_every vs r1 variants
  * WINDOWED async timing (dispatch k steps, sync once) so the tunnel's
    per-call latency (~250 ms when syncing every step) cancels out

Usage: python scripts/profile_r1_flops.py [batch] [res] [window]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")


def build(preset, overrides, batch, res):
    import jax
    import numpy as np

    from locate_tpu.config import get_config
    from locate_tpu.models.gan import build_gan
    from locate_tpu.parallel.mesh import single_device_mesh
    from locate_tpu.parallel.sharding import make_step_for, place_train_state
    from locate_tpu.train.state import create_train_state

    ov = {
        "train.global_batch": str(batch),
        "train.compute_dtype": "bfloat16",
        "data.resolution": str(res),
        "model.resolution": str(res),
        "train.max_nonfinite_skips": "0",
        **overrides,
    }
    cfg = get_config(preset, ov)
    cfg = dataclasses.replace(
        cfg, parallel=dataclasses.replace(cfg.parallel, data_parallel=1)
    )
    gan = build_gan(cfg)
    mesh = single_device_mesh(cfg.parallel)
    ctx = mesh.__enter__()
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    jit_step_for, shardings_for, b_shard = make_step_for(cfg, gan, mesh)
    state = place_train_state(state, shardings_for(state))
    step = jit_step_for(state)
    rng = np.random.default_rng(0)
    host = {
        "image": rng.integers(0, 256, (batch, res, res, 3), dtype=np.uint8),
        "label": np.zeros((batch,), np.int32),
    }
    dev = {k: jax.device_put(v, b_shard) for k, v in host.items()}
    return mesh, state, step, dev


def cost(step, state, dev):
    compiled = step.lower(state, dev).compile()
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return {
            "flops": float(c.get("flops", 0.0)),
            "bytes": float(c.get("bytes accessed", 0.0)),
        }
    except Exception as e:
        return {"error": repr(e)[:120]}


def main():
    import jax

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    window = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    variants = [
        ("plain", {"train.r1_gamma": "0.0"}),
        ("r1_every", {"train.r1_interval": "1", "train.log_every": "1",
                      "train.sample_every": "0", "train.checkpoint_every": "0",
                      "train.eval_every": "0"}),
        ("r1_every_subset", {"train.r1_interval": "1", "train.log_every": "1",
                             "train.sample_every": "0",
                             "train.checkpoint_every": "0",
                             "train.eval_every": "0",
                             "train.r1_batch_fraction": "0.25"}),
    ]
    for name, ov in variants:
        try:
            mesh, state, step, dev = build("lsun_bedroom_128", ov, batch, res)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:250]}),
                  flush=True)
            continue
        out = {"variant": name, "batch": batch, "res": res, **cost(step, state, dev)}
        # windowed async timing: dispatch `window` steps, block once
        state2, metrics = step(state, dev)  # warm / first exec
        for _ in range(3):
            state2, metrics = step(state2, dev)
        jax.block_until_ready(metrics)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = state2
            for _ in range(window):
                s, metrics = step(s, dev)
            jax.block_until_ready(metrics)
            best = min(best, time.perf_counter() - t0)
        out["window_steps"] = window
        out["window_s"] = round(best, 3)
        out["per_step_ms"] = round(best / window * 1e3, 2)
        out["images_per_sec"] = round(window * batch / best, 1)
        print(json.dumps(out), flush=True)
        mesh.__exit__(None, None, None)


if __name__ == "__main__":
    main()
