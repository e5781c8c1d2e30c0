"""Production-shaped training run: every round-2 throughput/quality
feature enabled together.

    # one-time: pre-decode the dataset into uint8 memmap shards
    python -m locate_tpu pack celeba_64 data.path=/data/celeba --out=/data/celeba_packed

    python examples/train_production.py /data/celeba_packed [total_steps]

What this turns on (all config, no code):
  * packed input (`data.dataset=packed`): steady-state host cost is a
    page-cache memcpy + flip — no per-epoch JPEG decode;
  * `train.steps_per_call=8`: each compiled dispatch scans 8 optimizer
    steps over a stacked batch (identical trajectory, ~8x less dispatch
    overhead — cadences must be multiples of 8);
  * lazy R1 (preset default; gamma scales with resolution — 0.1 at
    64^2 per the dynamics sweep, 1.0 on the 128^2 flagship per the r5
    sweep, docs/QUALITY_r5.md §4) and the r5 grad-norm guard
    (`grad_norm_limit=1e6` preset default);
  * adaptive discriminator augmentation (`ada_target=0.6`) — for
    limited-data sets; D sees aug(x), p adapts online without recompile
    (caveat: don't stack with LeCam, and expect p to ramp while D is
    sharp — GUIDE.md §5);
  * bf16 stochastically-rounded EMA shadow (`ema_dtype=bfloat16`) —
    halves the shadow's HBM, unbiased accumulation;
  * in-training rFID eval every 2k steps with BEST-snapshot tracking
    (`eval_every` + `train.keep_best`, round 3): deliverables come from
    `<workdir>/checkpoints_best`, because GAN runs end worse than they
    peak;
  * DP over every available chip (preset `parallel` default).

Round-3 stability knobs to reach for when a run misbehaves (see
docs/GUIDE.md "Stability"): `model.spectral_norm=true`,
`train.feature_matching=1`, `train.pl_gamma=2`, or the classic
`train.loss=wgan train.gp_gamma=10`.
"""

import sys

import locate_tpu as lt


def main() -> None:
    packed_dir = sys.argv[1] if len(sys.argv) > 1 else ""
    total_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    overrides = {
        "data.dataset": "packed" if packed_dir else "synthetic",
        "train.steps_per_call": "8",
        "train.log_every": "200",
        "train.sample_every": "2000",
        "train.checkpoint_every": "2000",
        "train.ada_target": "0.6",
        "train.ema_dtype": "bfloat16",
        "train.async_checkpoint": "true",
        "train.eval_every": "2000",
    }
    if packed_dir:
        overrides["data.path"] = packed_dir
    cfg = lt.get_config("celeba_64", overrides)
    state = lt.train(cfg, total_steps=total_steps)
    print(
        f"finished at step {int(state.step)}; "
        f"augment p ended at {float(state.ada_p):.3f}; "
        f"samples in {cfg.workdir}/samples"
    )


if __name__ == "__main__":
    main()
