"""Optimizer construction: two Adam-family chains, one per network
(SURVEY.md §3 "Optimizers + EMA", "alternating step order" per BASELINE)."""

from __future__ import annotations

import optax

from locate_tpu.config import OptimConfig


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    return optax.adam(
        learning_rate=cfg.lr, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps
    )
