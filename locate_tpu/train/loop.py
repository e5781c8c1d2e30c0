"""Train loop / entry point (SURVEY.md §2 L6, §4.1): wires config -> data ->
models -> sharded jitted step, with periodic logging, sample-grid dumps,
and checkpointing — the reference's `train()` public entry point."""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax

from locate_tpu.config import Config
from locate_tpu.data.pipeline import make_input_pipeline
from locate_tpu.io.checkpoint import CheckpointManager
from locate_tpu.io.sampling import generate_samples, save_image_grid
from locate_tpu.models.gan import build_gan
from locate_tpu.parallel.mesh import make_mesh
from locate_tpu.parallel.sharding import make_step_for, place_train_state
from locate_tpu.train.state import TrainState, create_train_state
from locate_tpu.utils.metrics import MetricsLogger
from locate_tpu.utils.profiling import StepTimer, trace_annotation
from locate_tpu.utils.runlock import RunLock


def _dump_config(cfg: Config) -> None:
    """Write the resolved config to <workdir>/config.json (dataclass tree
    as JSON; tuples/other non-JSON leaves stringified)."""
    import dataclasses
    import json

    os.makedirs(cfg.workdir, exist_ok=True)
    with open(os.path.join(cfg.workdir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)


def train(
    cfg: Config,
    total_steps: Optional[int] = None,
    hooks: Optional[Dict[str, Callable]] = None,
    resume: bool = True,
) -> TrainState:
    """Run (or resume) training; returns the final TrainState.

    `hooks` may provide "on_metrics(step, metrics)" and
    "on_samples(step, images_u8)" callbacks (used by tests and TB logging).

    The workdir is exclusively locked for the duration (process 0 only —
    in a multi-host job every process shares one logical run, and only
    process 0 writes the artifacts the lock protects): a second `train()`
    on the same workdir fails fast instead of corrupting metrics.jsonl
    and racing checkpoint writes. See utils/runlock.py.
    """
    if cfg.compile_cache:
        from locate_tpu.utils import compile_cache

        compile_cache.enable(cfg.compile_cache)
    lock = RunLock.acquire(cfg.workdir) if jax.process_index() == 0 else None
    try:
        return _train_locked(cfg, total_steps, hooks, resume)
    finally:
        if lock is not None:
            lock.release()


def _train_locked(
    cfg: Config,
    total_steps: Optional[int] = None,
    hooks: Optional[Dict[str, Callable]] = None,
    resume: bool = True,
) -> TrainState:
    hooks = hooks or {}
    total_steps = total_steps or cfg.train.total_steps
    gan = build_gan(cfg)
    mesh = make_mesh(cfg.parallel)

    with mesh:
        state = create_train_state(cfg, gan, jax.random.PRNGKey(cfg.train.seed))
        jit_step_for, shardings_for, batch_shard = make_step_for(cfg, gan, mesh)
        state = place_train_state(state, shardings_for(state))

        ckpt = CheckpointManager(
            os.path.join(cfg.workdir, "checkpoints"),
            keep=cfg.train.keep_checkpoints,
            async_save=cfg.train.async_checkpoint,
        )
        if resume and ckpt.latest_step() is not None:
            state = ckpt.restore(state)
            print(f"[locate-tpu] resumed from step {int(state.step)}")

        step_fn = jit_step_for(state)
        k = cfg.train.steps_per_call
        if k > 1 and (total_steps % k or int(state.step) % k):
            raise ValueError(
                f"total_steps={total_steps} and the resume step "
                f"{int(state.step)} must both be multiples of "
                f"train.steps_per_call={k}"
            )
        batches = make_input_pipeline(
            cfg.data, cfg.train.global_batch,
            sharding=batch_shard, seed=cfg.train.seed,
            skip_batches=int(state.step),  # resume replays the exact stream
            steps_per_call=k,
            d_steps=cfg.train.d_steps,
        )

        # throughput counts REAL images consumed (with a critic ratio the
        # discriminator sees d_steps fresh batches per optimizer step)
        timer = StepTimer(cfg.train.global_batch * k * cfg.train.d_steps)
        # Run artifacts: only process 0 writes (multi-host processes share
        # the workdir; orbax coordinates its own writes, these don't).
        # metrics.jsonl appends when resuming and truncates on a fresh
        # run so the file describes exactly one training trajectory.
        primary = jax.process_index() == 0
        logger = MetricsLogger(
            os.path.join(cfg.workdir, "tb")
            if (cfg.train.tensorboard and primary) else None,
            jsonl_path=(
                os.path.join(cfg.workdir, "metrics.jsonl") if primary else None
            ),
            append=int(state.step) > 0,
            resume_step=int(state.step),  # drop records the replay re-logs
        )
        if primary:
            # reproducibility: the fully-resolved config this run executes
            _dump_config(cfg)
        sample_key = jax.random.PRNGKey(cfg.train.seed + 1)  # fixed grid latents
        metrics = {}
        # Lazy-regularizer observability: with r1_interval=16 and
        # log_every=100 a log step is never a fire step, so the logged
        # "r1" aliases to 0 forever. Track (host-side, no extra syncs —
        # just a pytree reference) the most recent dispatch whose window
        # contained a fire step; log boundaries read it back as
        # <name>_last_fire. For steps_per_call k>1 the scan metric is the
        # window MEAN, so the value is the fired penalty diluted by k.
        lazy_tracks = []  # (metric_name, interval, latest fire metrics)
        if cfg.train.r1_gamma > 0 and cfg.train.r1_interval > 1:
            lazy_tracks.append(["r1", cfg.train.r1_interval, None])
        if cfg.train.r2_gamma > 0 and cfg.train.r1_interval > 1:
            lazy_tracks.append(["r2", cfg.train.r1_interval, None])
        if cfg.train.pl_gamma > 0 and cfg.train.pl_interval > 1:
            lazy_tracks.append(["pl", cfg.train.pl_interval, None])
        eval_extractor = None
        eval_cache: dict = {}
        best_ckpt = None
        best_path = os.path.join(cfg.workdir, "best.json")
        best_fid = float("inf")
        best_step = 0           # step of the best rFID seen this run
        evals_since_best = 0    # consecutive evals without improvement
        grad_limit_seen = 0     # grad-norm-limit skips already warned about
        if cfg.train.keep_best and cfg.train.eval_every:
            best_ckpt = CheckpointManager(
                os.path.join(cfg.workdir, "checkpoints_best"), keep=1,
                async_save=False,
            )
            if resume and os.path.exists(best_path):
                import json

                with open(best_path) as f:
                    _best = json.load(f)
                best_fid = float(_best["fid"])
                best_step = int(_best.get("step", 0))
        start = int(state.step)
        try:
          # stride k: each dispatch advances k optimizer steps (config
          # validation pins every cadence to a multiple of k).
          for step_idx in range(start, total_steps, k):
            batch = next(batches)
            with trace_annotation("train_step"):
                state, metrics = step_fn(state, batch)
            # Block only while warming up (so the rate clock starts from a
            # clean synced point); steady-state ticks stay non-blocking to
            # preserve async dispatch (host prepares call N+1 while the
            # device runs call N). Rates are still real device throughput:
            # every log boundary's device_get below retires all steps
            # dispatched so far, and rates are only read after it.
            timer.tick(metrics if timer.warming_up else None)

            for tr in lazy_tracks:
                # fire iff some internal step in [step_idx, step_idx+k)
                # hits the interval (k=1: step_idx itself)
                if step_idx % tr[1] == 0 or (step_idx % tr[1]) + k > tr[1]:
                    tr[2] = metrics

            step_num = step_idx + k
            if step_num % cfg.train.log_every == 0 or step_num == total_steps:
                host_metrics = {
                    name: float(v)
                    for name, v in jax.device_get(metrics).items()
                }
                for name, _, fire_m in lazy_tracks:
                    if fire_m is not None and name in fire_m:
                        host_metrics[name + "_last_fire"] = float(
                            jax.device_get(fire_m[name])
                        )
                host_metrics["images_per_sec"] = timer.images_per_sec
                host_metrics["sec_per_step"] = timer.sec_per_step / k
                logger.log_scalars(step_num, host_metrics)
                if "on_metrics" in hooks:
                    hooks["on_metrics"](step_num, host_metrics)
                # Grad-norm-limit events (train.grad_norm_limit, the
                # finite-blow-up sanitizer): warn the moment the skip
                # count moves, so a reader of the console sees divergence
                # when it STARTS, not at the post-hoc digest.
                if cfg.train.grad_norm_limit > 0.0:
                    n_skips = int(
                        host_metrics.get("d_grad_limit_count", 0)
                        + host_metrics.get("g_grad_limit_count", 0)
                    )
                    if n_skips > grad_limit_seen:
                        print(
                            f"[locate-tpu] WARNING step {step_num}: "
                            f"{n_skips - grad_limit_seen} update(s) skipped"
                            f" for |grad| > {cfg.train.grad_norm_limit:g} "
                            f"({n_skips} total; window norms "
                            f"d={host_metrics.get('d_grad_norm', 0):.3g} "
                            f"g={host_metrics.get('g_grad_norm', 0):.3g})",
                            flush=True,
                        )
                        grad_limit_seen = n_skips
                # Numerics abort (SURVEY.md §6): params are never poisoned
                # (non-finite AND over-limit updates are always skipped),
                # but a persistent streak of either kind means training
                # is dead — stop instead of spinning.
                limit = cfg.train.max_nonfinite_skips
                if limit > 0:
                    streak = max(
                        host_metrics.get("d_nonfinite_streak", 0),
                        host_metrics.get("g_nonfinite_streak", 0),
                    )
                    if streak >= limit:
                        raise RuntimeError(
                            f"aborting at step {step_num}: {int(streak)} "
                            f"consecutive non-finite gradient steps "
                            f"(limit {limit})"
                        )
                    lim_streak = max(
                        host_metrics.get("d_grad_limit_streak", 0),
                        host_metrics.get("g_grad_limit_streak", 0),
                    )
                    if lim_streak >= limit:
                        raise RuntimeError(
                            f"aborting at step {step_num}: {int(lim_streak)}"
                            f" consecutive updates over grad_norm_limit="
                            f"{cfg.train.grad_norm_limit:g} (limit {limit})"
                        )

            if cfg.train.sample_every and (
                step_num % cfg.train.sample_every == 0 or step_num == total_steps
            ):
                g_params = state.ema_params if state.ema_params is not None else state.g_params
                imgs = generate_samples(gan, g_params, sample_key, min(64, cfg.train.global_batch))
                path = os.path.join(cfg.workdir, "samples", f"step_{step_num:08d}.png")
                save_image_grid(imgs, path)
                logger.log_images(step_num, "samples", imgs)
                if "on_samples" in hooks:
                    hooks["on_samples"](step_num, imgs)

            if cfg.train.eval_every and step_num % cfg.train.eval_every == 0:
                from locate_tpu.io.fid import RandomConvFeatures, evaluate_generator

                if eval_extractor is None:
                    ex_shard = None
                    if mesh.size > 1:
                        from jax.sharding import NamedSharding, PartitionSpec

                        ex_shard = NamedSharding(
                            mesh, PartitionSpec(cfg.parallel.data_axis)
                        )
                    eval_extractor = RandomConvFeatures(sharding=ex_shard)
                g_params = state.ema_params if state.ema_params is not None else state.g_params
                scores = evaluate_generator(
                    gan, g_params, batches.dataset,  # reuse: no dataset rebuild
                    n_samples=cfg.train.eval_samples, seed=cfg.train.seed,
                    extractor=eval_extractor, cache=eval_cache,
                    # evaluate over the TRAINING mesh: generation and
                    # feature extraction run data-parallel on a pod
                    mesh=mesh if mesh.size > 1 else None,
                )
                if cfg.train.eval_swd:
                    from locate_tpu.io.swd import swd_generator

                    scores.update(swd_generator(
                        gan, g_params, batches.dataset,
                        n_samples=cfg.train.eval_samples,
                        seed=cfg.train.seed,
                    ))
                logger.log_scalars(
                    step_num,
                    {"eval_rfid": scores["fid"], "eval_rkid": scores["kid"],
                     **{f"eval_{k}": v for k, v in scores.items()
                        if k.startswith("swd")}},
                )
                if "on_eval" in hooks:
                    hooks["on_eval"](step_num, scores)
                if best_ckpt is not None and scores["fid"] < best_fid:
                    best_fid = float(scores["fid"])
                    best_step = step_num
                    evals_since_best = 0
                    best_ckpt.save(state)
                    best_ckpt.wait()
                    if primary:
                        import json

                        with open(best_path, "w") as f:
                            json.dump(
                                {"fid": best_fid, "kid": float(scores["kid"]),
                                 "step": step_num}, f,
                            )
                elif best_ckpt is not None:
                    # Quality-regression warning (VERDICT r4 #2 tail): the
                    # r4 run peaked at step 2,000 and marched on for hours
                    # with nothing shipped saying so. Advisory — rFID is
                    # noisy and the best state is already snapshotted.
                    evals_since_best += 1
                    warn_after = cfg.train.regress_warn_evals
                    if warn_after and evals_since_best >= warn_after:
                        print(
                            f"[locate-tpu] WARNING step {step_num}: quality"
                            f" regressing — best rFID {best_fid:.2f} was at"
                            f" step {best_step}, {evals_since_best} evals"
                            f" ago (current {scores['fid']:.2f})",
                            flush=True,
                        )

            if cfg.train.checkpoint_every and (
                step_num % cfg.train.checkpoint_every == 0 or step_num == total_steps
            ):
                ckpt.save(state)
        finally:
            # stop the producer thread and release prefetched HBM batches
            batches.close()
            logger.close()
            ckpt.close()
            if best_ckpt is not None:
                best_ckpt.close()
            # End-of-run stability digest (utils/digest.py): every run —
            # including aborted ones, where it matters most — self-reports
            # grad-norm spikes, guard events, logit split, and best-step
            # lag. Best-effort: a digest failure must never mask the run's
            # own outcome.
            if primary:
                try:
                    from locate_tpu.utils.digest import (
                        format_digest,
                        load_metrics_jsonl,
                        stability_digest,
                    )

                    mpath = os.path.join(cfg.workdir, "metrics.jsonl")
                    if os.path.exists(mpath):
                        dig = stability_digest(load_metrics_jsonl(mpath))
                        if dig is not None:
                            print("[locate-tpu] run stability digest:",
                                  flush=True)
                            for line in format_digest(dig):
                                print("  " + line, flush=True)
                except Exception as e:  # pragma: no cover
                    print(f"[locate-tpu] (stability digest failed: {e!r})",
                          flush=True)
    return state
