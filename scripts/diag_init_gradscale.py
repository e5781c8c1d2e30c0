"""Fresh-init G/D gradient scales vs resolution & dtype (CPU).

Companion to diag_gradscale.py for the r4 quality-run explosion: the run
logged g_grad_norm=9e10 at step 100 at 128^2 while 32^2 runs are healthy
(O(10)). This bisects: is the explosion already present at init, does it
scale with depth (stage count), and is it bf16-specific?
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

import locate_tpu as lt
from locate_tpu.models.gan import build_gan
from locate_tpu.objectives.losses import get_losses


def main():
    g_loss_of, d_loss_of = get_losses("nonsat")
    batch = 4
    for res in (32, 64, 128):
        for dt in ("float32", "bfloat16"):
            cfg = lt.get_config(
                "lsun_bedroom_128",
                {
                    "model.resolution": str(res),
                    "data.resolution": str(res),
                    "train.compute_dtype": dt,
                    # keep channels modest so CPU stays tractable but depth
                    # (stage count) matches the real preset at each res
                    "model.base_channels": "128",
                    "model.max_channels": "128",
                },
            )
            gan = build_gan(cfg)
            k = jax.random.PRNGKey(0)
            gp = gan.generator.init(jax.random.fold_in(k, 1))
            dp = gan.discriminator.init(jax.random.fold_in(k, 2))
            z = jax.random.normal(jax.random.fold_in(k, 3),
                                  (batch, cfg.model.latent_dim), jnp.float32)
            real = jnp.tanh(jax.random.normal(
                jax.random.fold_in(k, 4),
                (batch, res, res, 3), jnp.float32))

            def g_loss_fn(gp_):
                fake = gan.generator.apply(gp_, z, None)
                return g_loss_of(gan.discriminator.apply(dp, fake, None))

            gl, ggr = jax.jit(jax.value_and_grad(g_loss_fn))(gp)
            print(f"res={res} dt={dt}: g_loss={float(gl):.4f} "
                  f"g_grad_norm={float(optax.global_norm(ggr)):.4e}",
                  flush=True)


if __name__ == "__main__":
    main()
