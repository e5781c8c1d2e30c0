"""Sharding rules + the sharded train step (SURVEY.md §3.2, §3.3).

Design (the "How to Scale Your Model" recipe): write the train step as a
GLOBAL program over global-batch arrays, annotate input/output shardings on
the (data, model) mesh, and let XLA's SPMD partitioner insert the
collectives — psum gradient reduction over the `data` axis rides ICI
automatically because the batch is sharded on `data` while params are
replicated on it.

Sharding rules are shape-based and uniform across the whole TrainState
pytree (params, EMA shadow, and Adam mu/nu get identical layouts):

  * batch tensors: leading dim sharded over `data`
  * weight tensors: replicated over `data`; the trailing (output-channel)
    dim sharded over `model` when divisible and large enough — the
    megatron-style tensor-parallel slot for conv/dense channels
  * scalars / rng keys: fully replicated
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from locate_tpu.config import Config
from locate_tpu.models.gan import GAN
from locate_tpu.train.state import TrainState
from locate_tpu.train.step import make_multi_step, make_train_step


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_spec(leaf, mesh: Mesh, model_axis: str, min_shard: int) -> P:
    shape = getattr(leaf, "shape", ())
    mp = mesh.shape[model_axis]
    if mp > 1 and len(shape) >= 2:
        last = shape[-1]
        if last % mp == 0 and last >= min_shard:
            return P(*([None] * (len(shape) - 1)), model_axis)
    return P()


def param_shardings(params: Any, mesh: Mesh, model_axis: str = "model",
                    min_shard: int = 128) -> Any:
    """Shape-based NamedSharding pytree for a parameter (or optimizer/EMA)
    tree: trailing channel dim over `model`, replicated over `data`."""
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, mesh, model_axis, min_shard)),
        params,
    )


def _zero_leaf_spec(leaf, mesh: Mesh, data_axis: str, model_axis: str,
                    min_shard: int) -> P:
    """ZeRO leaf rule: start from the TP spec (trailing channel dim over
    `model` when eligible), then additionally shard the largest remaining
    dim over `data`. Scalars and indivisible leaves stay replicated, so the
    rule is safe to apply to any optimizer-state pytree (counters, MultiSteps
    accumulators, apply_if_finite flags all fall through to P())."""
    base = _leaf_spec(leaf, mesh, model_axis, min_shard)
    dp = mesh.shape[data_axis]
    shape = getattr(leaf, "shape", ())
    if dp <= 1 or not shape:
        return base
    spec = list(base) + [None] * (len(shape) - len(base))
    best = -1
    for i, size in enumerate(shape):
        if spec[i] is None and size % dp == 0 and size >= 2 * dp:
            if best < 0 or size >= shape[best]:
                best = i  # ties prefer the later (channel) dim
    if best < 0:
        return base
    spec[best] = data_axis
    return P(*spec)


def zero_shardings(tree: Any, mesh: Mesh, data_axis: str = "data",
                   model_axis: str = "model", min_shard: int = 128) -> Any:
    """Sharding pytree for a ZeRO-sharded subtree (optimizer state, EMA
    shadow, or — at stage 3 — the params themselves)."""
    return jax.tree.map(
        lambda leaf: NamedSharding(
            mesh, _zero_leaf_spec(leaf, mesh, data_axis, model_axis, min_shard)
        ),
        tree,
    )


def state_shardings(state_shape: Any, mesh: Mesh, model_axis: str = "model",
                    data_axis: str = "data", zero_stage: int = 0) -> Any:
    """Sharding tree for a TrainState (built from `jax.eval_shape` output or
    a concrete state). Uniform shape-based rule, so Adam mu/nu and the EMA
    shadow automatically match their parameters' layout.

    zero_stage (ParallelConfig.zero_stage): 0 = replicated over `data`;
    1 = optimizer state + EMA shadow sharded over `data` (GSPMD then lowers
    the grad all-reduce to reduce-scatter + sharded Adam update + param
    all-gather — ZeRO-1); 3 = params sharded too (FSDP: all-gather at use).
    A layout change only — the global program, and hence the trajectory, is
    identical (tests/test_parallel.py::test_zero*_matches_replicated)."""
    base = jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, mesh, model_axis, 128)),
        state_shape,
    )
    if zero_stage <= 0:
        return base
    def z(tree):
        return zero_shardings(tree, mesh, data_axis, model_axis)
    repl = {
        "g_opt_state": z(state_shape.g_opt_state),
        "d_opt_state": z(state_shape.d_opt_state),
    }
    if state_shape.ema_params is not None:
        repl["ema_params"] = z(state_shape.ema_params)
    if zero_stage >= 3:
        repl["g_params"] = z(state_shape.g_params)
        repl["d_params"] = z(state_shape.d_params)
    return base.replace(**repl)


def place_train_state(state: TrainState, shardings: Any) -> TrainState:
    """Move a (host/single-device) TrainState onto the mesh."""
    return jax.tree.map(jax.device_put, state, shardings)


def make_step_for(cfg: Config, gan: GAN, mesh: Mesh) -> Tuple[Any, Any, NamedSharding]:
    """Single dispatcher on `cfg.parallel.backend` so every consumer
    (train loop, bench, dryrun) honors the config and unknown backends
    fail loudly."""
    backend = cfg.parallel.backend
    if backend == "gspmd":
        return make_sharded_train_step(cfg, gan, mesh)
    if backend == "shard_map":
        return make_shardmap_train_step(cfg, gan, mesh)
    raise ValueError(
        f"unknown parallel.backend {backend!r}; expected 'gspmd' or 'shard_map'"
    )


def make_shardmap_train_step(
    cfg: Config, gan: GAN, mesh: Mesh
) -> Tuple[Any, Any, NamedSharding]:
    """Explicit-collective DP variant (SURVEY.md §3.3): the per-replica
    train step runs under `shard_map` over the `data` axis with psum/pmean
    gradient and metric reduction written out in the step itself
    (axis_name path), instead of GSPMD-inferred collectives.

    Same return contract as `make_sharded_train_step`. Data-parallel only:
    params are fully replicated over the mesh (the `model` axis must be 1).
    Useful when collective placement must be explicit/auditable; the GSPMD
    path remains the default.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map  # stable API since jax 0.8

    pcfg = cfg.parallel
    if mesh.shape[pcfg.model_axis] != 1:
        raise ValueError("shard_map step is DP-only (model_parallel must be 1)")
    step_fn = make_train_step(
        cfg, gan, axis_name=pcfg.data_axis,
        axis_size=mesh.shape[pcfg.data_axis],
    )
    # steps_per_call composes with shard_map the same way as with GSPMD:
    # the scan lives INSIDE the per-replica program (collectives inside a
    # scan body are fine), batches carry a leading [k] axis.
    k = cfg.train.steps_per_call
    step_fn = make_multi_step(step_fn, k)
    # leading replicated scan axes: [k] (steps_per_call) and/or [d_steps]
    lead = (1 if k > 1 else 0) + (1 if cfg.train.d_steps > 1 else 0)
    batch_spec = P(*([None] * lead), pcfg.data_axis)
    b_sharding = NamedSharding(mesh, batch_spec)
    rep = replicated(mesh)

    def shardings_for(state: TrainState) -> Any:
        # pure DP: everything replicated
        return jax.tree.map(lambda _: rep, state)

    def jit_step(state: TrainState):
        s_shardings = shardings_for(state)
        state_specs = jax.tree.map(lambda _: P(), state)
        mapped = shard_map(
            step_fn,
            mesh=mesh,
            in_specs=(state_specs, {"image": batch_spec, "label": batch_spec}),
            out_specs=(state_specs, P()),  # metrics pmean'd -> replicated
            check_vma=False,
        )

        return jax.jit(
            mapped,
            in_shardings=(s_shardings, {"image": b_sharding, "label": b_sharding}),
            out_shardings=(s_shardings, rep),
            donate_argnums=(0,),
        )

    return jit_step, shardings_for, b_sharding


def make_sharded_train_step(
    cfg: Config, gan: GAN, mesh: Mesh
) -> Tuple[Any, Any, NamedSharding]:
    """Returns (jitted_step, state_shardings_fn, batch_sharding).

    The step is the plain global-program train step jitted with explicit
    in/out shardings; the TrainState buffers are donated so params/opt
    state update in place in HBM.
    """
    pcfg = cfg.parallel
    single_b = batch_sharding(mesh, pcfg.data_axis)
    # Pin in-graph-sampled tensors (latents, fake labels) to the batch
    # sharding: keeps the generator forward data-parallel instead of
    # replicated, and works around an SPMD-partitioner backward
    # miscompile on meshes with a model axis (see make_train_step doc).
    step_fn = make_train_step(
        cfg, gan, axis_name=None,
        constrain_batch=lambda x: jax.lax.with_sharding_constraint(x, single_b),
    )
    k = cfg.train.steps_per_call
    step_fn = make_multi_step(step_fn, k)
    # Leading scan axes ahead of the (data-sharded) batch dim: [k] from
    # steps_per_call, [d_steps] from the critic ratio — both replicated.
    lead = (1 if k > 1 else 0) + (1 if cfg.train.d_steps > 1 else 0)
    b_sharding = (
        single_b if lead == 0
        else NamedSharding(mesh, P(*([None] * lead), pcfg.data_axis))
    )
    rep = replicated(mesh)

    def shardings_for(state: TrainState) -> Any:
        return state_shardings(
            state, mesh, pcfg.model_axis, pcfg.data_axis, pcfg.zero_stage
        )

    def jit_step(state: TrainState):
        s_shardings = shardings_for(state)
        batch_shardings = {"image": b_sharding, "label": b_sharding}
        return jax.jit(
            step_fn,
            in_shardings=(s_shardings, batch_shardings),
            out_shardings=(s_shardings, rep),
            donate_argnums=(0,),
        )

    return jit_step, shardings_for, b_sharding
