"""Diagnose the r4 quality-run G-grad explosion (docs/QUALITY_r4.md).

Loads checkpoints from the 25k-step lsun_bedroom_128 run and reports the
top per-leaf generator/discriminator gradient norms under the exact
training numerics (bf16 compute) and under fp32, to localize which
parameter leaf drives g_grad_norm to 1e10..inf.

Usage: python scripts/diag_gradscale.py <workdir> [--step N] [--init]
"""

import argparse
import dataclasses
import sys

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
import optax

import locate_tpu as lt
from locate_tpu.models.gan import build_gan
from locate_tpu.train.state import create_train_state
from locate_tpu.io.checkpoint import CheckpointManager
from locate_tpu.objectives.losses import get_losses


def leaf_norms(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        out[name] = (
            float(jnp.linalg.norm(leaf.astype(jnp.float32))),
            float(jnp.max(jnp.abs(leaf.astype(jnp.float32)))),
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--best", action="store_true",
                    help="restore from checkpoints_best instead")
    ap.add_argument("--init", action="store_true",
                    help="fresh-init params instead of a checkpoint")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled pre-import)")
    args = ap.parse_args()

    cfg = lt.get_config("lsun_bedroom_128")
    cfg = dataclasses.replace(cfg, workdir=args.workdir)
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    if not args.init:
        sub = "checkpoints_best" if args.best else "checkpoints"
        mgr = CheckpointManager(args.workdir + "/" + sub, keep=10)
        state = mgr.restore(state, step=args.step)
        print(f"restored step {int(state.step)} from {sub}", flush=True)
    else:
        print("fresh-init params", flush=True)

    g_loss_of, _ = get_losses(cfg.train.loss)
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (args.batch, cfg.model.latent_dim), jnp.float32)

    def g_loss_fn(g_params, d_params):
        fake = gan.generator.apply(g_params, z, None)
        return g_loss_of(gan.discriminator.apply(d_params, fake, None))

    for tag, dt in [("bf16(run numerics)", "bfloat16"), ("fp32", "float32")]:
        c2 = lt.get_config("lsun_bedroom_128",
                           {"train.compute_dtype": dt})
        gan2 = build_gan(c2)

        def lf(gp, dp):
            fake = gan2.generator.apply(gp, z, None)
            return g_loss_of(gan2.discriminator.apply(dp, fake, None))

        loss, grads = jax.jit(jax.value_and_grad(lf))(
            state.g_params, state.d_params)
        gnorm = optax.global_norm(grads)
        print(f"\n== {tag}: g_loss={float(loss):.4f} "
              f"g_grad_norm={float(gnorm):.4e}", flush=True)
        norms = leaf_norms(grads)
        for name, (n, mx) in sorted(norms.items(), key=lambda kv: -kv[1][0])[: args.top]:
            print(f"  grad |{name}| norm={n:.3e} max={mx:.3e}")

    # where are the PARAMS themselves largest? (diverged D shows here)
    print("\n== param scales (top by max|w|):")
    for label, tree in [("G", state.g_params), ("D", state.d_params)]:
        norms = leaf_norms(tree)
        for name, (n, mx) in sorted(norms.items(), key=lambda kv: -kv[1][1])[:8]:
            print(f"  {label} |{name}| norm={n:.3e} max={mx:.3e}")


if __name__ == "__main__":
    main()
