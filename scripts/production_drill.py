"""Full production-path drill (VERDICT r2 task 5): the entire user
journey through the PUBLIC CLI, end to end, on generated real files —

    JPEG folder -> `pack` (native C++ decode) -> `train` from packed
    shards -> `eval` rFID -> `sample` grid -> `export` artifact

Each phase is timed and asserted; one JSON line per phase, one summary
line at the end. Defaults exercise the primary-metric 128^2 tier; tests
run it tiny (see tests/test_production_drill.py).

Usage:
    python scripts/production_drill.py [--res 128] [--images 5000]
        [--steps 64] [--batch 32] [--root /tmp/ltpu_drill] [--cpu]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")


def log(phase: str, t0: float, **kv):
    rec = {"phase": phase, "seconds": round(time.perf_counter() - t0, 2), **kv}
    print(json.dumps(rec), flush=True)
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--images", type=int, default=5000)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--root", default="/tmp/ltpu_drill")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (tests)")
    p.add_argument("--channels", default=None,
                   help="model channel override (smaller = faster drill)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from locate_tpu import cli
    from locate_tpu.data.datasets import SyntheticImages

    root = args.root
    if os.path.exists(root):
        shutil.rmtree(root)
    img_dir = os.path.join(root, "jpegs")
    pack_dir = os.path.join(root, "packed")
    workdir = os.path.join(root, "run")
    os.makedirs(img_dir)

    # 1. real JPEG files on disk (the synthetic renderer plays the camera)
    t0 = time.perf_counter()
    src = SyntheticImages(args.res, 3, length=args.images)
    for i in range(args.images):
        img, _ = src.example(i)
        Image.fromarray(img).save(
            os.path.join(img_dir, f"img_{i:06d}.jpg"), quality=92
        )
    log("write_jpegs", t0, count=args.images,
        images_per_sec=round(args.images / (time.perf_counter() - t0), 1))

    # 2. pack (folder -> pre-decoded uint8 memmap shards, native decoder)
    from locate_tpu.data import native

    t0 = time.perf_counter()
    rc = cli.main([
        "pack", "lsun_bedroom_128", "data.dataset=folder",
        f"data.path={img_dir}", f"data.resolution={args.res}",
        f"model.resolution={args.res}", "--out", pack_dir,
    ])
    assert rc == 0 and os.path.exists(os.path.join(pack_dir, "meta.json"))
    log("pack", t0, native_loader=native.available(),
        images_per_sec=round(args.images / (time.perf_counter() - t0), 1))

    # 3. train from the packed shards
    ch = []
    if args.channels:
        ch = [f"model.base_channels={args.channels}",
              f"model.max_channels={args.channels}"]
    common = [
        "lsun_bedroom_128", "data.dataset=packed", f"data.path={pack_dir}",
        f"data.resolution={args.res}", f"model.resolution={args.res}",
        f"train.global_batch={args.batch}", f"workdir={workdir}",
        *ch,
    ]
    t0 = time.perf_counter()
    rc = cli.main([
        "train", *common,
        f"train.total_steps={args.steps}",
        f"train.log_every={max(1, args.steps // 4)}",
        f"train.sample_every={args.steps}",
        f"train.checkpoint_every={args.steps}",
        "train.eval_every=0",
    ])
    assert rc == 0
    dt = time.perf_counter() - t0
    ckpts = os.listdir(os.path.join(workdir, "checkpoints"))
    assert ckpts, "no checkpoint written"
    metrics_path = os.path.join(workdir, "metrics.jsonl")
    with open(metrics_path) as f:
        last = json.loads(f.readlines()[-1])
    for k in ("d_loss", "g_loss"):
        assert last[k] is not None, f"{k} is non-finite at end of training"
    log("train", t0, steps=args.steps,
        images_per_sec=round(args.steps * args.batch / dt, 1),
        final_d_loss=last["d_loss"], final_g_loss=last["g_loss"])

    # 4. offline eval (rFID with the built-in extractor)
    t0 = time.perf_counter()
    rc = cli.main(["eval", *common, "--samples", "256"])
    assert rc == 0
    log("eval", t0)

    # 5. sample grid from the EMA generator
    t0 = time.perf_counter()
    out_png = os.path.join(root, "drill_samples.png")
    rc = cli.main(["sample", *common, "--count", "16", "--out", out_png])
    assert rc == 0 and os.path.getsize(out_png) > 0
    log("sample", t0, path=out_png)

    # 6. export the serving artifact
    t0 = time.perf_counter()
    out_npz = os.path.join(root, "export", "gen")
    rc = cli.main(["export", *common, "--out", out_npz])
    assert rc == 0
    exported = glob.glob(out_npz + "*")
    assert exported, "export produced no artifact"
    log("export", t0, files=[os.path.basename(f) for f in exported])

    print(json.dumps({"phase": "summary", "ok": True, "root": root,
                      "res": args.res, "images": args.images,
                      "steps": args.steps}), flush=True)


if __name__ == "__main__":
    main()
