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


def g_hinge_loss(fake_logits: jax.Array) -> jax.Array:
    """Generator hinge loss: -E[D(fake)] (the geometric-GAN form used by
    SAGAN/BigGAN; offered as a config option alongside the reference's
    non-saturating loss)."""
    return -jnp.mean(fake_logits.astype(jnp.float32))


def d_hinge_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """Discriminator hinge loss: E[relu(1 - D(real))] + E[relu(1 + D(fake))]."""
    real = jnp.mean(jax.nn.relu(1.0 - real_logits.astype(jnp.float32)))
    fake = jnp.mean(jax.nn.relu(1.0 + fake_logits.astype(jnp.float32)))
    return real + fake


def g_wgan_loss(fake_logits: jax.Array) -> jax.Array:
    """Wasserstein generator loss: -E[D(fake)] (same form as hinge's G)."""
    return -jnp.mean(fake_logits.astype(jnp.float32))


def d_wgan_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """Wasserstein critic loss: E[D(fake)] - E[D(real)] (arXiv 1701.07875).
    Needs a Lipschitz control to be meaningful — pair with the R1 penalty
    (`train.r1_gamma`, a zero-centered gradient penalty: arXiv 1801.04406
    shows it serves the same role as WGAN-GP's one-centered one) and/or
    `train.logit_penalty` to keep the critic's scale anchored."""
    return jnp.mean(fake_logits.astype(jnp.float32)) - jnp.mean(
        real_logits.astype(jnp.float32)
    )


def get_losses(kind: str):
    """(g_loss_fn, d_loss_fn) for a configured loss family."""
    if kind == "nonsat":
        return g_nonsat_loss, d_nonsat_loss
    if kind == "hinge":
        return g_hinge_loss, d_hinge_loss
    if kind == "wgan":
        return g_wgan_loss, d_wgan_loss
    raise ValueError(f"unknown GAN loss {kind!r}")


def r1_penalty(d_apply, d_params, real_images: jax.Array, labels=None) -> jax.Array:
    """R1 = 0.5 * E[ ||grad_x D(x)||^2 ] on real images (fp32)."""

    def score(x):
        return jnp.sum(d_apply(d_params, x, labels))

    grads = jax.grad(score)(real_images.astype(jnp.float32))
    return 0.5 * jnp.mean(jnp.sum(grads.astype(jnp.float32) ** 2, axis=(1, 2, 3)))
