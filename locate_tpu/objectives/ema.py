"""EMA shadow of the generator parameters (BASELINE config 3: "EMA
generator"; SURVEY.md §3 "Optimizers + EMA"). Pure-pytree update so it lives
inside the single jitted train step.

Two storage modes (TrainConfig.ema_dtype):

  * float32 (default): plain fp32 accumulation.
  * bfloat16 + stochastic rounding: halves the shadow's HBM (one full
    extra copy of G at 512^2). Deterministic bf16 accumulation would
    STALL — with decay 0.999 the per-step increment (1-d)*(p-e) drops
    below half a bf16 ulp almost immediately and rounds to zero forever —
    so the f32 update is rounded to bf16 stochastically (unbiased:
    E[round(x)] == x), which preserves the EMA in expectation. The
    rounding consumes PRNG: the train step passes a per-step key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params, dtype=jnp.float32):
    # copy=True: on fp32 params astype would alias the same buffer, and an
    # aliased EMA shadow breaks donation (same buffer donated twice) and
    # would silently track params exactly.
    return jax.tree.map(lambda p: jnp.array(p, dtype=dtype, copy=True), params)


def stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """Unbiased f32 -> bf16 rounding.

    Bit-domain trick: bf16 is f32 with the low 16 mantissa bits dropped,
    so adding uniform random bits U[0, 2^16) before truncating makes the
    result round up with probability equal to the truncated fraction —
    E[result] == x exactly. Integer carry propagates into the exponent,
    which is the correct behavior at binade boundaries.
    """
    assert x.dtype == jnp.float32
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rnd = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = (bits + rnd) & jnp.uint32(0xFFFF0000)
    sr = jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)
    # The bit-domain add carries past the exponent field for inf/NaN and
    # values in f32's top binade (inf+rnd can become NaN; the carry can
    # reach the sign bit). Non-finite values must PROPAGATE — the
    # apply_if_finite machinery depends on seeing them — so pass them (and
    # anything the round would overflow) through plain casting instead.
    return jnp.where(jnp.isfinite(x) & (jnp.abs(x) < 3.3895e38), sr,
                     x.astype(jnp.bfloat16))


def ema_update(ema_params, new_params, decay: float, sr_key=None):
    """ema <- decay * ema + (1 - decay) * new.

    Accumulation is always fp32; if the shadow is stored in bfloat16 the
    fp32 result is stochastically rounded back (requires `sr_key`).
    """
    d = jnp.asarray(decay, jnp.float32)
    leaves_e, treedef = jax.tree.flatten(ema_params)
    leaves_p = jax.tree.leaves(new_params)
    bf16 = bool(leaves_e) and leaves_e[0].dtype == jnp.bfloat16
    if bf16 and sr_key is None:
        raise ValueError("bfloat16 EMA needs a PRNG key for stochastic rounding")
    keys = jax.random.split(sr_key, len(leaves_e)) if bf16 else [None] * len(leaves_e)
    out = []
    for e, p, k in zip(leaves_e, leaves_p, keys):
        new = e.astype(jnp.float32) * d + p.astype(jnp.float32) * (1.0 - d)
        out.append(stochastic_round_bf16(new, k) if bf16 else new)
    return jax.tree.unflatten(treedef, out)
