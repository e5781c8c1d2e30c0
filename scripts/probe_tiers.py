"""Exercise BASELINE config-ladder tiers 4-5 on the real single chip
(VERDICT r2 task 3): max feasible batch, throughput, R1-on memory check,
and — at 512^2 — the fused-stage gate measured inside the real model
apply rather than the standalone microbench.

For each (preset, batch) it builds the full train step (bf16, single
device), runs it, and reports img/s or OOM; then repeats the best batch
with the shipped R1 defaults; for ffhq_512 it also times generator
forward + train step with use_pallas on vs off so the FUSE_MIN_LOCATIONS
gate decision is backed by an in-model measurement.

Usage: python scripts/probe_tiers.py ffhq_256 128,64,32,16 [steps]
       python scripts/probe_tiers.py ffhq_512 16,8,4,2 [steps]
Each result prints as one JSON line (consumed into docs/STATUS.md).
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")


def try_step(preset: str, batch: int, steps: int, overrides: dict,
             label: str) -> dict:
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
        "train.max_nonfinite_skips": "0",
        **overrides,
    }
    # steps_per_call support: cadences must be multiples of k, and the
    # fed batch carries a leading [k] scan axis
    k = int(ov.get("train.steps_per_call", "1"))
    if k > 1:
        ov.setdefault("train.log_every", str(100 * k))
        ov.setdefault("train.sample_every", str(2000 * k))
        ov.setdefault("train.checkpoint_every", str(2000 * k))
        ov.setdefault("train.total_steps", str(100_000 * k))
    cfg = get_config(preset, ov)
    res = cfg.model.resolution
    cfg = dataclasses.replace(
        cfg, parallel=dataclasses.replace(cfg.parallel, data_parallel=1)
    )
    out = {"preset": preset, "label": label, "batch": batch, "res": res}
    t_all = time.perf_counter()
    try:
        gan = build_gan(cfg)
        mesh = single_device_mesh(cfg.parallel)
        with mesh:
            state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
            jit_step_for, shardings_for, b_shard = make_step_for(cfg, gan, mesh)
            state = place_train_state(state, shardings_for(state))
            step = jit_step_for(state)
            rng = np.random.default_rng(0)
            shape = ((batch, res, res, 3) if k == 1
                     else (k, batch, res, res, 3))
            host = {
                "image": rng.integers(0, 256, shape, dtype=np.uint8),
                "label": np.zeros(shape[:-3], np.int32),
            }
            dev = {kk: jax.device_put(v, b_shard) for kk, v in host.items()}
            t0 = time.perf_counter()
            state, metrics = step(state, dev)
            jax.block_until_ready(metrics)
            out["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
            for _ in range(3):  # warm
                state, metrics = step(state, dev)
            jax.block_until_ready(metrics)
            calls = max(1, steps // k)
            t0 = time.perf_counter()
            for _ in range(calls):
                state, metrics = step(state, dev)
            jax.block_until_ready(metrics)
            dt = time.perf_counter() - t0
            out["steps_per_call"] = k
            out["images_per_sec"] = round(calls * k * batch / dt, 1)
            out["sec_per_step"] = round(dt / (calls * k), 4)
            out["ok"] = True
    except Exception as e:
        msg = repr(e)
        out["ok"] = False
        out["error"] = (
            "OOM" if ("RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg)
            else msg[:300]
        )
    out["total_s"] = round(time.perf_counter() - t_all, 1)
    print(json.dumps(out), flush=True)
    return out


def time_g_forward(preset: str, batch: int, use_pallas: bool,
                   steps: int) -> dict:
    """Generator forward (sampling/serving path) with the fused stage
    gate active (use_pallas) vs pure XLA, inside the REAL model."""
    import jax
    from locate_tpu.config import get_config
    from locate_tpu.models.gan import build_gan

    cfg = get_config(preset, {
        "train.global_batch": str(batch),
        "train.compute_dtype": "bfloat16",
        "use_pallas": "true" if use_pallas else "false",
    })
    gan = build_gan(cfg)
    params = gan.init(jax.random.PRNGKey(0))["generator"]
    z = gan.sample_latents(jax.random.PRNGKey(1), batch)
    fwd = jax.jit(lambda p, z: gan.generator.apply(p, z))
    out = {"preset": preset, "label": f"g_forward_pallas={use_pallas}",
           "batch": batch}
    try:
        y = fwd(params, z)
        jax.block_until_ready(y)
        for _ in range(3):
            y = fwd(params, z)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(steps):
            y = fwd(params, z)
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0
        out["images_per_sec"] = round(steps * batch / dt, 1)
        out["sec_per_batch"] = round(dt / steps, 4)
        out["ok"] = True
    except Exception as e:
        out["ok"] = False
        out["error"] = repr(e)[:300]
    print(json.dumps(out), flush=True)
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "scan512":
        # Full TRAIN STEP fused-vs-XLA at the 512^2 tier with scan
        # amortization (train.steps_per_call) lifting the per-dispatch
        # latency floor that made single-call A/B unmeasurable (STATUS
        # round-3 table: all batches sat on the ~3 ms dispatch floor).
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        spc = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        steps = int(sys.argv[4]) if len(sys.argv) > 4 else 32
        base_ov = {"train.r1_gamma": "0.0",
                   "train.steps_per_call": str(spc)}
        try_step("ffhq_512", batch, steps,
                 {**base_ov, "use_pallas": "true"}, f"scan{spc}_fused")
        try_step("ffhq_512", batch, steps,
                 {**base_ov, "use_pallas": "false"}, f"scan{spc}_xla")
        return

    preset = sys.argv[1] if len(sys.argv) > 1 else "ffhq_256"
    batches = [int(b) for b in
               (sys.argv[2] if len(sys.argv) > 2 else "64,32").split(",")]
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    best = None
    for b in batches:
        r = try_step(preset, b, steps, {"train.r1_gamma": "0.0"}, "plain")
        if r["ok"] and best is None:
            best = b
    if best is not None:
        # shipped defaults: lazy R1 (memory probe: grad-of-grad + remat)
        try_step(preset, best, max(steps, 17), {}, "r1_default")
        if preset == "ffhq_512":
            # fused-stage gate inside the real model (>=512^2 locations)
            time_g_forward(preset, best, True, steps)
            time_g_forward(preset, best, False, steps)
            try_step(preset, best, steps,
                     {"train.r1_gamma": "0.0", "use_pallas": "false"},
                     "plain_xla")


if __name__ == "__main__":
    main()
