"""Long-horizon flagship quality run (VERDICT r3 #1).

Trains the SHIPPED `lsun_bedroom_128` preset (defaults: bf16 compute,
lazy R1 gamma=0.1, EMA 0.999, batch 64) for --steps steps on a
--images-strong synthetic-texture JPEG corpus, recording rFID/rKID and
SWD every --eval-every steps plus sample grids, through the public CLI.
The metrics.jsonl it produces is the input to scripts/quality_trend.py,
which renders the committed artifact (docs/QUALITY_r4.md).

Phases are resumable: the corpus and pack are skipped when present, and
`train` resumes from the latest checkpoint (the framework's normal
resume path), so a killed run continues with

    nohup python scripts/quality_run.py >> /root/qr4/driver.log 2>&1 &

Run on the REAL TPU backend (no --cpu): this is the quality-evidence
artifact for the primary-metric config (BASELINE.json:2/5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(phase: str, t0: float, **kv):
    rec = {"phase": phase, "wall_s": round(time.perf_counter() - t0, 2)}
    rec.update(kv)
    print(json.dumps(rec), flush=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/root/qr4")
    p.add_argument("--images", type=int, default=10000)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--steps", type=int, default=25000)
    p.add_argument("--eval-every", type=int, default=1000)
    p.add_argument("--eval-samples", type=int, default=1024)
    p.add_argument("--sample-every", type=int, default=2500)
    p.add_argument("--checkpoint-every", type=int, default=2500)
    p.add_argument("--batch", type=int, default=0,
                   help="0 = preset default (64)")
    p.add_argument("--steps-per-call", type=int, default=0,
                   help="0 = preset default (1). Over the tunneled chip "
                   "each dispatch costs ~225 ms RPC regardless of compute, "
                   "so k>1 amortizes it (trajectory is scan==loop, pinned "
                   "by tests/test_step_variants.py). Must divide every "
                   "cadence; resume requires the checkpoint step % k == 0.")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--override", action="append", default=[],
                   help="extra config override(s), key=value — layered "
                   "after the preset so a recipe sweep reuses this "
                   "script's corpus/pack/run phases")
    p.add_argument("--workdir", default="",
                   help="training workdir (default <root>/run); sweep arms "
                   "share the corpus+pack but train in their own workdir")
    p.add_argument("--fresh", action="store_true",
                   help="delete an existing workdir first (sweep arms)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from locate_tpu import cli
    from locate_tpu.data.datasets import SyntheticImages

    root = args.root
    img_dir = os.path.join(root, "jpegs")
    pack_dir = os.path.join(root, "packed")
    workdir = args.workdir or os.path.join(root, "run")
    os.makedirs(root, exist_ok=True)
    if args.fresh and os.path.isdir(workdir):
        import shutil

        shutil.rmtree(workdir)

    # 1. JPEG corpus (synthetic textures play the dataset camera; the
    # real-dataset path is identical from `pack` onward).
    done_marker = os.path.join(img_dir, f"done_{args.images}")
    if not os.path.exists(done_marker):
        os.makedirs(img_dir, exist_ok=True)
        t0 = time.perf_counter()
        src = SyntheticImages(args.res, 3, length=args.images)
        for i in range(args.images):
            path = os.path.join(img_dir, f"img_{i:06d}.jpg")
            if os.path.exists(path):
                continue
            img, _ = src.example(i)
            Image.fromarray(img).save(path, quality=92)
        open(done_marker, "w").close()
        log("write_jpegs", t0, count=args.images)

    # 2. pack via the native loader
    if not os.path.exists(os.path.join(pack_dir, "meta.json")):
        t0 = time.perf_counter()
        rc = cli.main([
            "pack", "lsun_bedroom_128", "data.dataset=folder",
            f"data.path={img_dir}", f"data.resolution={args.res}",
            f"model.resolution={args.res}", "--out", pack_dir,
        ])
        if rc != 0:
            return rc
        log("pack", t0)

    # 3. the long run, SHIPPED preset defaults + eval cadence
    overrides = [
        "lsun_bedroom_128", "data.dataset=packed", f"data.path={pack_dir}",
        f"data.resolution={args.res}", f"model.resolution={args.res}",
        f"workdir={workdir}",
        f"train.total_steps={args.steps}",
        f"train.eval_every={args.eval_every}",
        f"train.eval_samples={args.eval_samples}",
        "train.eval_swd=true",
        f"train.sample_every={args.sample_every}",
        f"train.checkpoint_every={args.checkpoint_every}",
        # log cadence must be a multiple of steps_per_call (the loop only
        # observes state at dispatch boundaries)
        f"train.log_every={max(1, args.steps_per_call) * max(1, 100 // max(1, args.steps_per_call))}",
    ]
    if args.batch:
        overrides.append(f"train.global_batch={args.batch}")
    if args.steps_per_call:
        overrides.append(f"train.steps_per_call={args.steps_per_call}")
    overrides.extend(args.override)
    t0 = time.perf_counter()
    rc = cli.main(["train", *overrides])
    log("train", t0, rc=rc, steps=args.steps)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
