"""EMA shadow of the generator parameters (BASELINE config 3: "EMA
generator"; SURVEY.md §3 "Optimizers + EMA"). Pure-pytree update so it lives
inside the single jitted train step."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # copy=True: on fp32 params astype would alias the same buffer, and an
    # aliased EMA shadow breaks donation (same buffer donated twice) and
    # would silently track params exactly.
    return jax.tree.map(lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params)


def ema_update(ema_params, new_params, decay: float):
    """ema <- decay * ema + (1 - decay) * new (fp32 accumulation)."""
    d = jnp.asarray(decay, jnp.float32)
    return jax.tree.map(
        lambda e, p: e * d + p.astype(jnp.float32) * (1.0 - d),
        ema_params,
        new_params,
    )
