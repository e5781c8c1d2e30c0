"""Activation functions as parameter-free layers (fused by XLA into
neighbouring convs; also fused by the Pallas stage kernels)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from locate_tpu.nn.core import Layer, elementwise


def make_act(kind: str, leaky_slope: float = 0.2) -> Layer:
    if kind == "leaky_relu":
        return elementwise(lambda x: jax.nn.leaky_relu(x, leaky_slope))
    if kind == "relu":
        return elementwise(jax.nn.relu)
    if kind == "silu":
        return elementwise(jax.nn.silu)
    if kind == "gelu":
        return elementwise(jax.nn.gelu)
    if kind == "tanh":
        return elementwise(jnp.tanh)
    if kind == "none":
        return elementwise(lambda x: x)
    raise ValueError(f"unknown activation {kind!r}")


def act_fn(kind: str, leaky_slope: float = 0.2):
    """The raw function (used inside Pallas kernels)."""
    layer = make_act(kind, leaky_slope)
    return lambda x: layer.apply((), x)
