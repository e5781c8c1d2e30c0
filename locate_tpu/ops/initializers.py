"""Parameter initializers (fp32 leaves; dtype policy casts at apply time)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def he_normal(key, shape, dtype=jnp.float32, fan_in=None):
    """Kaiming-normal for conv weights in HWIO layout (fan_in = kh*kw*cin)."""
    if fan_in is None:
        fan_in = int(np.prod(shape[:-1]))
    std = float(np.sqrt(2.0 / max(1, fan_in)))
    return jax.random.normal(key, shape, dtype) * std


def normal(key, shape, dtype=jnp.float32, stddev=0.02):
    return jax.random.normal(key, shape, dtype) * stddev


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)
