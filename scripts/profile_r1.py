"""Profile the lazy-R1 step cost on the current chip (VERDICT r2 task 2).

STATUS.md §9b's arithmetic put one R1-firing step at ~780x a plain step
(R1-on e2e 280 img/s vs R1-off 14k at 128^2, interval 16) — far beyond
the ~5-10x a grad-of-grad + remat should cost. This script isolates the
cost per hypothesis by timing INDIVIDUAL dispatches (block_until_ready
per step) of the single jitted train step at the preset's real shape:

  plain        r1_gamma=0 (the benched program)
  r1_cond      shipped config: lazy R1 via lax.cond, interval 16
  r1_every     r1_interval=1 (the cond is compiled out by step.py)
  r1_xla       r1_cond but use_pallas=false (no XLA-twin rebuild for the
               penalty path: d_apply_r1 IS the model's discriminator)
  r1_noremat   r1_cond without jax.checkpoint on the penalty's D apply
               (train.r1_remat=false; watch for OOM at batch >= 64)

Output: one JSON line per variant with per-step timing percentiles and
the firing-step vs non-firing-step means, then a summary ratio table.

Usage:  python scripts/profile_r1.py [batch] [res] [steps]
        (defaults: 64 128 33)
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")


def run_variant(name: str, overrides: dict, batch: int, res: int,
                n_steps: int) -> dict:
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
    cfg = get_config("lsun_bedroom_128", ov)
    cfg = dataclasses.replace(
        cfg, parallel=dataclasses.replace(cfg.parallel, data_parallel=1)
    )
    gan = build_gan(cfg)
    mesh = single_device_mesh(cfg.parallel)
    with mesh:
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        jit_step_for, shardings_for, b_shard = make_step_for(cfg, gan, mesh)
        state = place_train_state(state, shardings_for(state))
        step = jit_step_for(state)
        rng = np.random.default_rng(0)
        host = {
            "image": rng.integers(0, 256, (batch, res, res, 3), dtype=np.uint8),
            "label": np.zeros((batch,), np.int32),
        }
        dev_batch = {k: jax.device_put(v, b_shard) for k, v in host.items()}

        t_compile = time.perf_counter()
        state, metrics = step(state, dev_batch)  # compile (includes step 0: R1 fires)
        jax.block_until_ready(metrics)
        t_compile = time.perf_counter() - t_compile

        # warmup a full interval so the device is ramped before timing
        for _ in range(4):
            state, metrics = step(state, dev_batch)
        jax.block_until_ready(metrics)

        interval = cfg.train.r1_interval if cfg.train.r1_gamma > 0 else 0
        times, fired = [], []
        for _ in range(n_steps):
            s = int(state.step)
            t0 = time.perf_counter()
            state, metrics = step(state, dev_batch)
            jax.block_until_ready(metrics)
            times.append(time.perf_counter() - t0)
            fired.append(bool(interval and s % interval == 0))
    times = np.asarray(times)
    fired = np.asarray(fired)
    out = {
        "variant": name,
        "batch": batch,
        "res": res,
        "compile_plus_first_step_s": round(t_compile, 2),
        "median_ms": round(float(np.median(times)) * 1e3, 3),
        "p10_ms": round(float(np.percentile(times, 10)) * 1e3, 3),
        "p90_ms": round(float(np.percentile(times, 90)) * 1e3, 3),
    }
    if fired.any():
        out["r1_step_mean_ms"] = round(float(times[fired].mean()) * 1e3, 3)
        out["plain_step_mean_ms"] = round(float(times[~fired].mean()) * 1e3, 3)
        out["r1_over_plain"] = round(
            float(times[fired].mean() / times[~fired].mean()), 2
        )
        window = interval
        eff = batch * window / (
            times[fired].mean() + (window - 1) * times[~fired].mean()
        )
        out["window_images_per_sec"] = round(float(eff), 1)
    else:
        out["images_per_sec"] = round(batch / float(np.median(times)), 1)
    print(json.dumps(out), flush=True)
    return out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 33

    variants = [
        ("plain", {"train.r1_gamma": "0.0"}),
        ("r1_cond", {}),
        ("r1_every", {"train.r1_interval": "1", "train.log_every": "1",
                      "train.sample_every": "0", "train.checkpoint_every": "0",
                      "train.eval_every": "0"}),
        ("r1_xla", {"use_pallas": "false"}),
        ("r1_noremat", {"train.r1_remat": "false"}),
    ]
    results = {}
    for name, ov in variants:
        try:
            results[name] = run_variant(name, ov, batch, res, n_steps)
        except Exception as e:  # OOM etc: record and continue
            print(json.dumps({"variant": name, "error": repr(e)[:300]}),
                  flush=True)
    if "plain" in results:
        base = results["plain"]["median_ms"]
        summary = {
            n: round(r.get("r1_step_mean_ms", r["median_ms"]) / base, 2)
            for n, r in results.items()
        }
        print(json.dumps({"summary_r1_step_over_plain_step": summary}),
              flush=True)


if __name__ == "__main__":
    main()
