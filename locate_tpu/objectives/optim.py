"""Optimizer construction: two Adam-family chains, one per network
(SURVEY.md §3 "Optimizers + EMA", "alternating step order" per BASELINE)."""

from __future__ import annotations

import optax

from locate_tpu.config import OptimConfig


def make_optimizer(
    cfg: OptimConfig, max_nonfinite_skips: int = 0
) -> optax.GradientTransformation:
    opt = optax.adam(
        learning_rate=cfg.lr, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps
    )
    if max_nonfinite_skips > 0:
        # Numerics sanitizer (SURVEY.md §6): skip non-finite updates, abort
        # after `max_nonfinite_skips` consecutive ones.
        opt = optax.apply_if_finite(opt, max_consecutive_errors=max_nonfinite_skips)
    return opt
