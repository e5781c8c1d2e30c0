"""Minimal training example — the script-level UX the reference offered
(a Colab-style `main` wiring config -> data -> models -> train,
SURVEY.md §3 "Entry script").

    python examples/train_cifar10.py [total_steps]

Uses the CIFAR-10 preset (reads local binaries from data/cifar10 if
present, otherwise the synthetic fallback so the example always runs),
trains, and writes sample grids + checkpoints under runs/cifar10_32/.
"""

import sys

import locate_tpu as lt


def main() -> None:
    total_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    cfg = lt.get_config(
        "cifar10_32",
        {
            "train.compute_dtype": "bfloat16",  # fp32 if running on CPU
            "train.log_every": "100",
            "train.sample_every": "1000",
            "train.checkpoint_every": "1000",
        },
    )
    state = lt.train(cfg, total_steps=total_steps)
    print(f"finished at step {int(state.step)}; samples in {cfg.workdir}/samples")


if __name__ == "__main__":
    main()
