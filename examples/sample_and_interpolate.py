"""Sampling example: load the latest checkpoint (or an exported .npz) and
write a sample grid + a slerp interpolation sheet.

    python examples/sample_and_interpolate.py [preset] [out_dir]
"""

import os
import sys

import jax

import locate_tpu as lt
from locate_tpu.io.sampling import interpolation_grid, save_image_grid


def main() -> None:
    preset = sys.argv[1] if len(sys.argv) > 1 else "cifar10_32"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "samples_out"
    cfg = lt.get_config(preset)
    gan = lt.build_gan(cfg)
    state = lt.create_train_state(cfg, gan, jax.random.PRNGKey(0))
    mgr = lt.CheckpointManager(os.path.join(cfg.workdir, "checkpoints"))
    state = mgr.restore(state)
    g_params = state.ema_params if state.ema_params is not None else state.g_params

    key = jax.random.PRNGKey(0)
    grid = lt.generate_samples(gan, g_params, key, 64, truncation=0.7)
    save_image_grid(grid, os.path.join(out_dir, "samples.png"))
    sheet = interpolation_grid(gan, g_params, key, rows=4, cols=8)
    save_image_grid(sheet, os.path.join(out_dir, "interpolation.png"), cols=8)
    print(f"wrote {out_dir}/samples.png and {out_dir}/interpolation.png "
          f"(step {int(state.step)})")
    mgr.close()


if __name__ == "__main__":
    main()
