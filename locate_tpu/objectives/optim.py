"""Optimizer construction: two Adam-family chains, one per network
(SURVEY.md §3 "Optimizers + EMA", "alternating step order" per BASELINE),
with optional LR schedules and two update guards — non-finite skip and
finite-but-exploded skip (train.grad_norm_limit)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from locate_tpu.config import OptimConfig, TrainConfig


def safe_global_norm(tree) -> jax.Array:
    """Overflow-proof global L2 norm in f32 (scaled sum-of-squares).

    `optax.global_norm` squares leaves at their native scale: the r4
    flagship run's exploded-but-finite gradients (|g| up to 3.3e17,
    squared 1e35 x millions of elements) overflowed the METRIC to inf,
    so metrics.jsonl could not distinguish "metric overflowed" from
    "update skipped" (VERDICT r4 weak #2). Here every leaf is divided by
    the tree-wide max|x| first, so the sum of squares is <= numel and
    the result is exact up to ~3e38/sqrt(numel). Non-finite leaves still
    propagate to a non-finite result (NaN through max / inf/inf=NaN),
    which is what the non-finite guard keys on."""
    leaves = [jnp.asarray(l, jnp.float32) for l in jax.tree.leaves(tree)]
    if not leaves:
        return jnp.zeros((), jnp.float32)
    scale = jnp.zeros((), jnp.float32)
    for l in leaves:
        scale = jnp.maximum(scale, jnp.max(jnp.abs(l), initial=0.0))
    safe = jnp.maximum(scale, jnp.finfo(jnp.float32).tiny)
    ssq = sum(jnp.sum(jnp.square(l / safe)) for l in leaves)
    return safe * jnp.sqrt(ssq)


class SkipLargeState(NamedTuple):
    """State of `skip_if_too_large` (mirrors optax.ApplyIfFiniteState)."""

    toolarge_count: Any   # total skipped-for-size updates (int32)
    toolarge_streak: Any  # CONSECUTIVE skipped-for-size updates (int32)
    grad_norm: Any        # safe global norm of the last grads seen (f32)
    inner_state: Any


def skip_if_too_large(
    inner: optax.GradientTransformation, limit: float
) -> optax.GradientTransformation:
    """Skip updates whose (finite) global grad norm exceeds `limit`.

    The sanitizer for the failure mode apply_if_finite is blind to
    (VERDICT r4 #2): gradients that explode but stay FINITE — the r4
    flagship run applied 1e12..3.3e17-norm updates for hours after the
    step-2000 best. Semantics mirror apply_if_finite: on a skipped step
    the emitted updates are zeros and the inner state is left untouched
    (Adam's moments never see the exploded gradient). Non-finite norms
    are NOT treated as too-large — they pass through to the non-finite
    guard inside, so the two event counters stay distinct."""

    def init_fn(params):
        # Distinct arrays on purpose: the train step donates its state,
        # and two pytree leaves sharing one buffer is a donation error.
        return SkipLargeState(jnp.zeros((), jnp.int32),
                              jnp.zeros((), jnp.int32),
                              jnp.zeros((), jnp.float32),
                              inner.init(params))

    def update_fn(updates, state, params=None):
        norm = safe_global_norm(updates)
        too_large = jnp.isfinite(norm) & (norm > limit)
        new_updates, new_inner = inner.update(updates, state.inner_state,
                                              params)
        out_updates = jax.tree.map(
            lambda u: jnp.where(too_large, jnp.zeros_like(u), u), new_updates
        )
        out_inner = jax.tree.map(
            lambda n, o: jnp.where(too_large, o, n), new_inner,
            state.inner_state,
        )
        return out_updates, SkipLargeState(
            state.toolarge_count + too_large.astype(jnp.int32),
            jnp.where(too_large, state.toolarge_streak + 1, 0),
            norm,
            out_inner,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def guard_stats(opt_state, tcfg: TrainConfig) -> dict:
    """Read the update guards' counters out of an optimizer state built
    by make_optimizers — the single place that knows the wrapper nesting
    (MultiSteps > skip_if_too_large > apply_if_finite > chain).

    Returns (only the keys whose guard is enabled):
      nonfinite_streak  — consecutive non-finite-skipped updates
      grad_limit_count  — total updates skipped for |g| > grad_norm_limit
      grad_limit_streak — consecutive such skips
      grad_norm_guard   — the guard's own (overflow-proof) |g| reading
    """
    s = opt_state.inner_opt_state if tcfg.grad_accum > 1 else opt_state
    out = {}
    if tcfg.grad_norm_limit > 0.0:
        out["grad_limit_count"] = s.toolarge_count
        out["grad_limit_streak"] = s.toolarge_streak
        s = s.inner_state
    if tcfg.max_nonfinite_skips > 0:
        out["nonfinite_streak"] = s.notfinite_count
    return out


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
    grad_norm_limit: float = 0.0,
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
    if grad_norm_limit > 0.0:
        # Outside apply_if_finite: non-finite grads fall through to the
        # non-finite counter, finite-but-exploded ones are caught here.
        opt = skip_if_too_large(opt, grad_norm_limit)
    return opt


def make_optimizers(tcfg: TrainConfig):
    """The (G, D) optimizer pair — single construction point so the train
    step and the TrainState factory always agree on state structure."""
    g = make_optimizer(
        tcfg.g_opt, tcfg.max_nonfinite_skips,
        make_schedule(tcfg.g_opt.lr, tcfg), tcfg.grad_norm_limit,
    )
    d = make_optimizer(
        tcfg.d_opt, tcfg.max_nonfinite_skips,
        make_schedule(tcfg.d_opt.lr, tcfg), tcfg.grad_norm_limit,
    )
    if tcfg.grad_accum > 1:
        g = optax.MultiSteps(g, every_k_schedule=tcfg.grad_accum).gradient_transformation()
        d = optax.MultiSteps(d, every_k_schedule=tcfg.grad_accum).gradient_transformation()
    return g, d
