"""Non-saturating GAN losses (SURVEY.md §1, BASELINE: "non-saturating GAN
forward-backward step"):

    L_G = mean softplus(-D(G(z)))
    L_D = mean softplus(-D(real)) + mean softplus(D(fake))

plus an optional lazy R1 gradient penalty on the discriminator (a standard
stability term; off by default since the reference's use is unconfirmed —
SURVEY.md §3 "Losses": "possibly a gradient/stability penalty").

All losses are computed in fp32 regardless of the network compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def g_nonsat_loss(fake_logits: jax.Array) -> jax.Array:
    """Generator non-saturating loss: -log sigmoid(D(fake))."""
    return jnp.mean(jax.nn.softplus(-fake_logits.astype(jnp.float32)))


def d_nonsat_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """Discriminator loss: -log sigmoid(D(real)) - log(1 - sigmoid(D(fake)))."""
    real = jnp.mean(jax.nn.softplus(-real_logits.astype(jnp.float32)))
    fake = jnp.mean(jax.nn.softplus(fake_logits.astype(jnp.float32)))
    return real + fake


def r1_penalty(d_apply, d_params, real_images: jax.Array, labels=None) -> jax.Array:
    """R1 = 0.5 * E[ ||grad_x D(x)||^2 ] on real images (fp32)."""

    def score(x):
        return jnp.sum(d_apply(d_params, x, labels))

    grads = jax.grad(score)(real_images.astype(jnp.float32))
    return 0.5 * jnp.mean(jnp.sum(grads.astype(jnp.float32) ** 2, axis=(1, 2, 3)))
