"""Minimal functional module system.

The reference organized blocks as `nn.Module`s (SURVEY.md §2 L2, RECALL-med).
TPU-first we want parameters as *explicit pytrees* flowing through pure
functions — that keeps the whole GAN step jittable/shardable with zero
framework state and leaves fusion decisions to XLA/Pallas (SURVEY.md §8
"prefer plain/nnx-style explicit params for fusion freedom").

A `Layer` is an (init, apply) pair:
  * ``init(key) -> params``   (params: arbitrary pytree, fp32 leaves)
  * ``apply(params, x) -> y`` (pure; dtype policy applied by the layer)

Composition helpers (`sequential`, `residual`, `identity`) build bigger
layers from smaller ones; params compose as lists/dicts so the full model is
one pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax

Params = Any


@dataclasses.dataclass(frozen=True)
class Layer:
    init: Callable[[jax.Array], Params]
    apply: Callable[[Params, jax.Array], jax.Array]

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.apply(params, x)


def identity() -> Layer:
    return Layer(init=lambda key: (), apply=lambda params, x: x)


def elementwise(fn: Callable[[jax.Array], jax.Array]) -> Layer:
    """Parameter-free layer from an elementwise function."""
    return Layer(init=lambda key: (), apply=lambda params, x: fn(x))


def sequential(*layers: Layer) -> Layer:
    """Compose layers; params is a list aligned with `layers`."""
    layers = tuple(layers)

    def init(key):
        keys = jax.random.split(key, len(layers)) if layers else []
        return [layer.init(k) for layer, k in zip(layers, keys)]

    def apply(params, x):
        if len(params) != len(layers):
            raise ValueError(
                f"params list has {len(params)} entries for {len(layers)} "
                f"layers (stale pytree from a different config?)"
            )
        for layer, p in zip(layers, params):
            x = layer.apply(p, x)
        return x

    return Layer(init=init, apply=apply)


def residual(inner: Layer, scale: float = 1.0) -> Layer:
    """x + scale * inner(x). The inner layer must preserve shape."""

    def apply(params, x):
        return x + scale * inner.apply(params, x)

    return Layer(init=inner.init, apply=apply)


def named(**layers: Layer) -> Layer:
    """Compose a dict of layers applied in insertion order; params is a dict."""
    items = tuple(layers.items())

    def init(key):
        keys = jax.random.split(key, len(items)) if items else []
        return {name: layer.init(k) for (name, layer), k in zip(items, keys)}

    def apply(params, x):
        for name, layer in items:
            x = layer.apply(params[name], x)
        return x

    return Layer(init=init, apply=apply)


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def maybe_remat(inner: Layer) -> Layer:
    """Rematerialize `inner` on the backward pass (jax.checkpoint): its
    activations are recomputed instead of stored — the standard
    FLOPs-for-HBM trade at 512^2 (SURVEY.md §8 M7)."""
    return Layer(init=inner.init, apply=jax.checkpoint(inner.apply))
