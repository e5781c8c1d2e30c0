"""Benchmark: images/sec/chip at the 128x128 GAN train step (the primary
metric, BASELINE.json:2), run on whatever single chip jax provides (the
driver runs this on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` divides by an ESTIMATED PyTorch-reference A100 throughput for
this workload (BASELINE.md "Open items": the reference published no numbers
and this offline environment has no GPU, so the denominator is an
engineering estimate to be replaced by a measured value when the driver can
run the reference on an A100). Estimate: a ~25M-param 128x128 conv+attention
GAN pair in eager PyTorch on A100 trains at roughly 1.5-2.5k images/sec;
we use 2000. The BASELINE target is vs_baseline >= 5.0 on a v5p chip.
"""

from __future__ import annotations

import json
import sys
import time

A100_TORCH_IMAGES_PER_SEC_EST = 2000.0


def main() -> None:
    import jax

    import dataclasses

    from locate_tpu.config import get_config
    from locate_tpu.models.gan import build_gan
    from locate_tpu.parallel.mesh import single_device_mesh
    from locate_tpu.parallel.sharding import make_step_for, place_train_state
    from locate_tpu.train.state import create_train_state

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    use_pallas = "xla" not in sys.argv[3:]
    fused = "fused" in sys.argv[3:]
    cfg = get_config(
        "lsun_bedroom_128",
        {
            "train.global_batch": str(batch),
            "train.compute_dtype": "bfloat16",
            "use_pallas": "true" if use_pallas else "false",
            "train.fused_step": "true" if fused else "false",
        },
    )
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

        import numpy as np

        rng = np.random.default_rng(0)
        host = {
            "image": rng.integers(
                0, 256, (batch, 128, 128, 3), dtype=np.uint8
            ),
            "label": np.zeros((batch,), np.int32),
        }
        dev_batch = {
            "image": jax.device_put(host["image"], b_shard),
            "label": jax.device_put(host["label"], b_shard),
        }

        # compile + warmup (the tunneled emulated chip also ramps up over
        # the first ~10 steps)
        for _ in range(10):
            state, metrics = step(state, dev_batch)
        jax.block_until_ready(metrics)

        # best of 3 windows: robust to transient device-throughput dips
        best_dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                state, metrics = step(state, dev_batch)
            jax.block_until_ready(metrics)
            best_dt = min(best_dt, time.perf_counter() - t0)

    images_per_sec = steps * batch / best_dt
    print(
        json.dumps(
            {
                "metric": "images/sec/chip @ 128x128 GAN train step (bf16, batch %d)"
                % batch,
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(
                    images_per_sec / A100_TORCH_IMAGES_PER_SEC_EST, 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
