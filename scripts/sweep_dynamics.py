"""Training-dynamics sweep (VERDICT r2 task 7): find preset defaults that
do NOT D-collapse over a long horizon.

Runs the 64^2 config on the synthetic set (no real datasets or Inception
weights are vendored in this environment — BASELINE.md "Open items" — so
rFID on the synthetic set is the available long-horizon signal; the same
sweep re-runs unchanged on real data + true FID once the driver vendors
them) for `steps` steps per arm, logging rFID every `eval_every`.

    python scripts/sweep_dynamics.py [steps] [arm ...]

Writes one JSON line per arm to stdout.
"""

import dataclasses
import json
import sys

sys.path.insert(0, ".")

from locate_tpu.config import get_config

ARMS = {
    # r1 gamma x lazy interval; beta1; two-timescale (slow G) variants.
    # NOTE: since round 2 the presets SHIP r1_gamma=0.1, so arms that
    # mean "unregularized" must pin it to 0 explicitly.
    "base": {"train.r1_gamma": "0.0"},
    "r1_01": {"train.r1_gamma": "0.1"},
    "r1_1": {"train.r1_gamma": "1.0"},
    "beta05": {"train.r1_gamma": "0.0",
               "train.g_opt.beta1": "0.5", "train.d_opt.beta1": "0.5"},
    "r1_01_beta05": {
        "train.r1_gamma": "0.1",
        "train.g_opt.beta1": "0.5",
        "train.d_opt.beta1": "0.5",
    },
    "ttur": {  # two-timescale: D faster than G (TTUR)
        "train.r1_gamma": "0.0",
        "train.d_opt.lr": "4e-4",
        "train.g_opt.lr": "1e-4",
    },
    "r1_01_ttur": {
        "train.r1_gamma": "0.1",
        "train.d_opt.lr": "4e-4",
        "train.g_opt.lr": "1e-4",
    },
    # ADA (round-2 feature): adaptive discriminator augmentation, alone
    # and on top of the shipped r1=0.1 default
    "ada": {"train.r1_gamma": "0.0", "train.ada_target": "0.6"},
    "r1_01_ada": {"train.r1_gamma": "0.1", "train.ada_target": "0.6"},
    # drift penalty (ProGAN): targets the observed D-saturation failure
    "lp": {"train.r1_gamma": "0.0", "train.logit_penalty": "1e-3"},
    "r1_01_lp": {"train.r1_gamma": "0.1", "train.logit_penalty": "1e-3"},
    # round-3 session-C regularizers (all default-off; arms check they
    # train stably and how they move rFID vs base)
    "sn": {"train.r1_gamma": "0.0", "model.spectral_norm": "true"},
    "fm": {"train.r1_gamma": "0.0", "train.feature_matching": "1.0"},
    "pl": {"train.r1_gamma": "0.0", "train.pl_gamma": "2.0"},
    "wgan_gp": {"train.r1_gamma": "0.0", "train.loss": "wgan",
                "train.gp_gamma": "10.0"},
    "r1_01_sn": {"train.r1_gamma": "0.1", "model.spectral_norm": "true"},
    # round-3 session-J regularizers: LeCam (limited-data logit-gap cap)
    # and BigGAN orthogonal reg, alone and on the shipped r1 default
    "lecam": {"train.r1_gamma": "0.0", "train.lecam_gamma": "0.3"},
    "r1_01_lecam": {"train.r1_gamma": "0.1", "train.lecam_gamma": "0.3"},
    "ortho": {"train.r1_gamma": "0.0", "train.ortho_gamma": "1e-4"},
    # the paper-recipe limited-data stack (ADA + bCR + LeCam)
    "limited_stack": {
        "train.r1_gamma": "0.1",
        "train.ada_target": "0.6",
        "train.bcr_gamma": "10.0",
        "train.lecam_gamma": "0.3",
    },
}


def run_arm(name: str, overrides: dict, steps: int, eval_every: int) -> dict:
    from locate_tpu.train.loop import train

    o = {
        "data.dataset": "synthetic",
        "train.global_batch": "64",
        "train.compute_dtype": "bfloat16",
        "train.log_every": str(eval_every),
        "train.sample_every": "0",
        "train.checkpoint_every": "0",
        "train.eval_every": str(eval_every),
        "train.eval_samples": "512",
        "train.tensorboard": "false",
        # abort only checks at log boundaries (= eval_every here); keep
        # the streak limit aligned so the config validates
        "train.max_nonfinite_skips": str(eval_every),
    }
    o.update(overrides)
    cfg = get_config("celeba_64", o)
    cfg = dataclasses.replace(cfg, workdir=f"/tmp/sweep_{name}")
    curve = []
    hooks = {"on_eval": lambda step, s: curve.append((step, round(s["fid"], 2)))}
    try:
        train(cfg, total_steps=steps, hooks=hooks, resume=False)
        status = "ok"
    except RuntimeError as e:  # non-finite abort
        status = f"aborted: {e}"
    fids = [f for _, f in curve]
    return {
        "arm": name,
        "status": status,
        "best_rfid": min(fids) if fids else None,
        "final_rfid": fids[-1] if fids else None,
        "curve": curve,
    }


def main():
    args = sys.argv[1:]
    small = "--small" in args  # 32^2 b16 fp32 CPU quick screen
    if small:
        args.remove("--small")
        # Force the CPU backend (the JAX_PLATFORMS env var is ignored by
        # the axon sitecustomize — docs/STATUS.md "Environment facts");
        # must run before any device use.
        import jax
        jax.config.update("jax_platforms", "cpu")
    steps = int(args[0]) if args else 5000
    arms = args[1:] or list(ARMS)
    eval_every = max(250, steps // 10)
    for name in arms:
        # "arm@seedK" runs the arm with train.seed=K (multi-seed spread:
        # GAN trajectories here are chaotic, single runs mislead)
        base, _, seed = name.partition("@seed")
        overrides = dict(ARMS[base])
        if seed:
            overrides["train.seed"] = seed
        if small:
            overrides.update({
                "model.resolution": "32", "data.resolution": "32",
                "train.global_batch": "16",
                "train.compute_dtype": "float32",  # CPU: bf16 is emulated
            })
        result = run_arm(name, overrides, steps, eval_every)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
