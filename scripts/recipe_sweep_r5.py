"""Round-5 flagship-recipe sweep (VERDICT r4 #1): find a 128^2 recipe
that HOLDS over a long horizon, before committing the 25k-step flagship
run to it.

The r4 collapse mechanism (docs/QUALITY_r5.md post-mortem): on the
10k-image corpus D separates real/fake within ~1 epoch (logit split +-7
by step 200), R1 gamma=0.1 is ~100x below the StyleGAN2 convention at
this resolution so D sharpens unchecked (E||grad_x D||^2 grew 3e-4 ->
2e5), parameter grads explode to 1e12..3e17 while staying finite, and
apply_if_finite happily applies them until both nets are dead (logits
pinned at 0, g_loss = ln 2) by step ~10k.

Arms therefore vary exactly the levers the diagnosis implicates — R1
strength, ADA (the limited-data memorization control), LeCam (divergence
cap), grad clipping — each with the round-5 guardrails active
(train.grad_norm_limit + gate_max=16 from the preset), short horizon
(default 4800 steps), eval every 800.

    python scripts/recipe_sweep_r5.py [--arms a,b,...] [--steps N]

Reuses the r4 corpus+pack at --root (default /root/qr4: same 10k JPEGs,
same pack — the comparison against the r4 trajectory is apples-to-apples)
but trains each arm under /root/qr5/sweep/<arm>. One JSON summary line
per arm; full metrics in each workdir for quality_trend.py.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Healthy r5 grad-norm envelope is measured by arm `a` first; the limit
# is a backstop ~100x above anything a healthy run shows (the r4 run
# crossed 1e12 within 200 steps of diverging, so any value in 1e3..1e9
# catches it early; 1e4 also bounds single-step param damage).
GUARDRAILS = {
    # Round-1 arms (a, b) ran with limit=1e4 — miscalibrated: this
    # architecture's HEALTHY g-grad norms have median ~1.6e3 with spikes
    # to 1e6 (the gate/GroupNorm amplifier tamed by gate_max but not
    # gone), so 1e4 skipped ~8-10% of G updates and dragged convergence.
    # The r4 death spiral crossed 1e12 within ~200 steps of diverging;
    # 1e6 (~600x the healthy median) catches it with zero drag.
    "train.grad_norm_limit": "1e6",
    "train.max_nonfinite_skips": "96",  # log cadence (=96) <= abort streak
    # shared persistent XLA cache: the eval/sample programs are identical
    # across arms, and a crashed arm resumes without recompiling
    "compile_cache": "/root/qr5/xla_cache",
}

ARMS = {
    # strong R1 alone: is regularization strength the whole story?
    # (round 1: best 118.7@2400, final 124.5; logit split +-15 — D still
    # memorizes; limit=1e4 skipped 392 G updates)
    "a_r1_10": {"train.r1_gamma": "10.0"},
    # the full limited-data stool at strong R1 (round 1: 119->136 flat;
    # ADA responding, p~0.13 at 1k; limit=1e4 skipped 280+ G updates)
    "b_r1_10_ada_lecam": {
        "train.r1_gamma": "10.0",
        "train.ada_target": "0.6",
        "train.lecam_gamma": "0.01",
    },
    # B with the recalibrated limit: was the guard the drag, or gamma?
    "d_r1_10_ada_lecam_lim6": {
        "train.r1_gamma": "10.0",
        "train.ada_target": "0.6",
        "train.lecam_gamma": "0.01",
    },
    # mild R1 + the stool: closer to r4's fast-early-progress regime
    # (gamma=0.1 reached rFID 92 by 2k before dying) but 10x stronger,
    # with ADA/LeCam carrying the memorization control
    "c_r1_1_ada_lecam": {
        "train.r1_gamma": "1.0",
        "train.ada_target": "0.6",
        "train.lecam_gamma": "0.01",
    },
    # minimal intervention: r4's fast-progress regime (sharp D) with only
    # the two diagnosed killers fixed — gate_max=16 (preset, tames the
    # gate/GroupNorm amplifier) and grad_norm_limit=1e6 (skips the
    # death-spiral updates). Motivated by round-2 observations: both
    # ADA+LeCam arms REGRESS after an early best because LeCam pins real
    # logits positive, so ADA's r_t=E[sign(D_real)] sticks at 1.0 and p
    # ramps toward its cap — augmentation leakage degrades G while D
    # never sharpens enough to teach it.
    "e_r1_1_plain": {"train.r1_gamma": "1.0"},
    # e with ADA but NO LeCam: does ADA alone (heuristic un-pinned)
    # control memorization without the leak?
    "f_r1_1_ada": {
        "train.r1_gamma": "1.0",
        "train.ada_target": "0.6",
    },
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/qr4",
                    help="corpus+pack root (reused across arms)")
    ap.add_argument("--out-root", default="/root/qr5/sweep")
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--steps", type=int, default=4800)
    ap.add_argument("--eval-every", type=int, default=800)
    ap.add_argument("--steps-per-call", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    os.makedirs(args.out_root, exist_ok=True)
    summaries = []
    for arm in args.arms.split(","):
        arm = arm.strip()
        overrides = {**GUARDRAILS, **ARMS[arm]}
        workdir = os.path.join(args.out_root, arm)
        cmd = [
            sys.executable, os.path.join(REPO, "scripts", "quality_run.py"),
            "--root", args.root, "--workdir", workdir, "--fresh",
            "--steps", str(args.steps),
            "--eval-every", str(args.eval_every),
            "--sample-every", str(args.steps),      # one end-of-run grid
            "--checkpoint-every", str(args.steps),  # one final checkpoint
            "--steps-per-call", str(args.steps_per_call),
        ] + (["--cpu"] if args.cpu else []) + [
            x for k, v in overrides.items() for x in ("--override", f"{k}={v}")
        ]
        t0 = time.perf_counter()
        rc = subprocess.run(cmd, cwd=REPO).returncode
        wall = time.perf_counter() - t0

        summary = {"arm": arm, "rc": rc, "wall_s": round(wall, 1),
                   "overrides": overrides}
        mpath = os.path.join(workdir, "metrics.jsonl")
        if os.path.exists(mpath):
            sys.path.insert(0, REPO)
            from locate_tpu.utils.digest import (
                load_metrics_jsonl,
                stability_digest,
            )

            d = stability_digest(load_metrics_jsonl(mpath))
            if d:
                summary["digest"] = {
                    k: d.get(k) for k in ("eval", "logits_tail", "guards")
                }
                summary["digest"]["grad_norm_medians"] = {
                    k: v.get("median") for k, v in d["grad_norms"].items()
                }
        summaries.append(summary)
        print("SWEEP_ARM " + json.dumps(summary), flush=True)

    with open(os.path.join(args.out_root, "summary.json"), "w") as fh:
        json.dump(summaries, fh, indent=1)
    print(f"wrote {args.out_root}/summary.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
