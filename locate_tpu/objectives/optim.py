"""Optimizer construction: two Adam-family chains, one per network
(SURVEY.md §3 "Optimizers + EMA", "alternating step order" per BASELINE),
with optional LR schedules and a non-finite-update guard."""

from __future__ import annotations

import optax

from locate_tpu.config import OptimConfig, TrainConfig


def make_schedule(base_lr: float, tcfg: TrainConfig):
    # Under grad_accum the schedule count advances once per OPTIMIZER
    # update (optax.MultiSteps only persists the inner state on emit
    # steps), while total_steps counts loop micro-steps — so horizons are
    # expressed in updates here or the schedule would never complete.
    accum = max(1, tcfg.grad_accum)
    decay_updates = max(1, tcfg.total_steps // accum)
    kind = tcfg.lr_schedule
    if kind == "constant":
        return base_lr
    if kind == "cosine":
        return optax.cosine_decay_schedule(base_lr, decay_steps=decay_updates)
    if kind == "linear_warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=base_lr,
            warmup_steps=max(1, tcfg.warmup_steps // accum),
            decay_steps=decay_updates,
        )
    raise ValueError(f"unknown lr_schedule {kind!r}")


def make_optimizer(
    cfg: OptimConfig,
    max_nonfinite_skips: int = 0,
    schedule=None,
) -> optax.GradientTransformation:
    opt = optax.adam(
        learning_rate=schedule if schedule is not None else cfg.lr,
        b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
    )
    if cfg.clip_grad_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.clip_grad_norm), opt)
    if max_nonfinite_skips > 0:
        # Numerics sanitizer (SURVEY.md §6): skip non-finite updates.
        # The error limit is effectively infinite ON PURPOSE: optax's
        # semantics at the limit are to give up and APPLY the non-finite
        # update (silently NaN-poisoning params). Instead, params are
        # never poisoned here and the TRAIN LOOP aborts when the streak
        # metric reaches cfg.train.max_nonfinite_skips.
        opt = optax.apply_if_finite(opt, max_consecutive_errors=10**9)
    return opt


def make_optimizers(tcfg: TrainConfig):
    """The (G, D) optimizer pair — single construction point so the train
    step and the TrainState factory always agree on state structure."""
    g = make_optimizer(
        tcfg.g_opt, tcfg.max_nonfinite_skips, make_schedule(tcfg.g_opt.lr, tcfg)
    )
    d = make_optimizer(
        tcfg.d_opt, tcfg.max_nonfinite_skips, make_schedule(tcfg.d_opt.lr, tcfg)
    )
    if tcfg.grad_accum > 1:
        g = optax.MultiSteps(g, every_k_schedule=tcfg.grad_accum).gradient_transformation()
        d = optax.MultiSteps(d, every_k_schedule=tcfg.grad_accum).gradient_transformation()
    return g, d
