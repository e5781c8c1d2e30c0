"""BASELINE tiers 4-5 under the r5 recipe + guardrails (VERDICT r4 #6):
short REAL training runs — not device-only step probes — of the 256^2
class-conditional preset and the 512^2 fused-Pallas preset, with eval,
recorded like the production drill: no quality claim, just "trains,
finite, improving" with the run digest as evidence.

    python scripts/tier_probe_r5.py [--tiers t4,t5] [--cpu]

Synthetic corpus (no datasets are vendored here; the synthetic renderer
plays the camera, classes select palettes), packed on the fly via the
in-memory dataset path. One JSON summary line per tier.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the r5 recipe (sweep-picked, docs/QUALITY_r5.md §4: the guard-only
# minimal arm won; ADA+LeCam regressed via controller pinning)
# transplanted to the higher tiers. The grad_norm_limit backstop is now
# a preset default; R1 gamma stays preset-default (untuned at these
# resolutions — this probe only claims stability, not quality).
RECIPE = {
    "train.max_nonfinite_skips": "96",
    "compile_cache": "/root/qr5/xla_cache",
    "train.eval_swd": "false",
    "data.dataset": "synthetic",
}

TIERS = {
    "t4": {
        "preset": "ffhq_256",
        "steps": 1024, "batch": 32, "spc": 16, "eval_every": 512,
        "extra": {"data.num_classes": "10"},
        "note": "class-conditional 256^2 (BASELINE config 4); batch 32 — "
                "b>=64 hits the tunnel compile-helper HTTP 500 (infra, "
                "docs/STATUS.md r3 table)",
    },
    "t5": {
        "preset": "ffhq_512",
        "steps": 512, "batch": 16, "spc": 8, "eval_every": 256,
        "extra": {},
        "note": "512^2 fused-Pallas path (BASELINE config 5)",
    },
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="t4,t5")
    ap.add_argument("--root", default="/root/qr5/tiers")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from locate_tpu import cli
    from locate_tpu.utils.digest import load_metrics_jsonl, stability_digest

    results = []
    for tier in args.tiers.split(","):
        spec = TIERS[tier.strip()]
        k = spec["spc"]
        workdir = os.path.join(args.root, tier)
        if os.path.isdir(workdir):
            import shutil

            shutil.rmtree(workdir)
        log_every = k * max(1, 96 // k)
        overrides = [
            spec["preset"],
            f"workdir={workdir}",
            f"train.global_batch={spec['batch']}",
            f"train.total_steps={spec['steps']}",
            f"train.steps_per_call={k}",
            f"train.eval_every={spec['eval_every']}",
            "train.eval_samples=512",
            f"train.sample_every={spec['steps']}",
            f"train.checkpoint_every={spec['steps']}",
            f"train.log_every={log_every}",
            # single chip; presets 4-5 default to data_parallel=-1
            "parallel.data_parallel=1",
        ] + [f"{kk}={vv}" for kk, vv in {**RECIPE, **spec["extra"]}.items()]
        t0 = time.perf_counter()
        rc = cli.main(["train", *overrides])
        wall = time.perf_counter() - t0
        out = {"tier": tier, "preset": spec["preset"], "rc": rc,
               "wall_s": round(wall, 1), "steps": spec["steps"],
               "batch": spec["batch"], "note": spec["note"]}
        mpath = os.path.join(workdir, "metrics.jsonl")
        if os.path.exists(mpath):
            rows = load_metrics_jsonl(mpath)
            d = stability_digest(rows)
            if d:
                out["digest"] = {
                    "eval": d.get("eval"),
                    "guards": d.get("guards"),
                    "logits_tail": d.get("logits_tail"),
                    "grad_norm_medians": {
                        kk: vv.get("median")
                        for kk, vv in d["grad_norms"].items()
                    },
                }
            tr = [r for r in rows if "images_per_sec" in r
                  and r["images_per_sec"]]
            if tr:
                out["images_per_sec_last"] = round(
                    tr[-1]["images_per_sec"], 1
                )
        results.append(out)
        print("TIER " + json.dumps(out), flush=True)
    os.makedirs(args.root, exist_ok=True)
    with open(os.path.join(args.root, "summary.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    return 0 if all(r["rc"] == 0 for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
