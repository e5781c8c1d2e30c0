"""Checkpoint/resume tests (SURVEY.md §5 item 4, §6 "Failure detection"):
save -> restore round-trips the full TrainState bitwise; killed-and-resumed
training continues the exact trajectory (fault-injection analogue)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locate_tpu.io.checkpoint import CheckpointManager
from locate_tpu.models.gan import build_gan
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_train_step


def make_batch(cfg, key):
    img = jax.random.uniform(
        key, (cfg.train.global_batch, cfg.model.resolution, cfg.model.resolution, 3),
        minval=-1.0, maxval=1.0,
    )
    return {"image": img, "label": jnp.zeros((cfg.train.global_batch,), jnp.int32)}


def assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_restore_roundtrip(tiny_config, tmp_path):
    cfg = tiny_config
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(state, step=0)
    restored = mgr.restore(state)
    assert_tree_equal(state, restored)
    mgr.close()


def test_resume_continues_trajectory(tiny_config, tmp_path):
    """Train 4 steps straight vs train 2 + checkpoint + restore + 2: final
    metrics identical (deterministic resume)."""
    cfg = tiny_config
    gan = build_gan(cfg)
    step = jax.jit(make_train_step(cfg, gan))
    batch = make_batch(cfg, jax.random.PRNGKey(1))

    state_a = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    for _ in range(4):
        state_a, metrics_a = step(state_a, batch)

    state_b = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    for _ in range(2):
        state_b, _ = step(state_b, batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(state_b)
    restored = mgr.restore(state_b)
    for _ in range(2):
        restored, metrics_b = step(restored, batch)
    mgr.close()

    assert int(restored.step) == int(state_a.step) == 4
    for k in metrics_a:
        np.testing.assert_array_equal(
            np.asarray(metrics_a[k]), np.asarray(metrics_b[k]), err_msg=k
        )


def test_keep_last_k(tiny_config, tmp_path):
    cfg = tiny_config
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    for s in (1, 2, 3):
        state = dataclasses.replace(state, step=jnp.asarray(s, jnp.int32))
        mgr.save(state)
    assert mgr.latest_step() == 3
    with pytest.raises(Exception):
        mgr.restore(state, step=1)  # evicted by keep=2
    mgr.close()


def test_restore_missing_raises(tiny_config, tmp_path):
    cfg = tiny_config
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "empty"), keep=2)
    with pytest.raises(FileNotFoundError):
        mgr.restore(state)
    mgr.close()


def test_restore_backfills_new_state_fields(tiny_config, tmp_path):
    """A pre-ADA checkpoint restored into an ADA-enabled template must
    backfill ada_p from the template (orbax substitutes None for leaves
    absent on disk) instead of tracing None into the step."""
    import dataclasses

    from locate_tpu.io.checkpoint import CheckpointManager

    gan = build_gan(tiny_config)
    s0 = create_train_state(tiny_config, gan, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=1, async_save=False)
    mgr.save(s0, step=3)
    mgr.close()

    cfg_ada = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, ada_target=0.6, augment_p=0.25
        ),
    )
    tmpl = create_train_state(cfg_ada, build_gan(cfg_ada), jax.random.PRNGKey(0))
    mgr2 = CheckpointManager(str(tmp_path / "ck"), keep=1, async_save=False)
    restored = mgr2.restore(tmpl)
    mgr2.close()
    assert restored.ada_p is not None and float(restored.ada_p) == 0.25


def test_restore_backfills_pl_mean_enabled_on_resume(tiny_config, tmp_path):
    """Enable path-length reg on a run checkpointed without it: pl_mean
    backfills from the template's initial 0.0 (the running mean re-warms
    in ~1/pl_decay firing steps)."""
    import dataclasses

    from locate_tpu.io.checkpoint import CheckpointManager

    gan = build_gan(tiny_config)
    s0 = create_train_state(tiny_config, gan, jax.random.PRNGKey(0))
    assert s0.pl_mean is None
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=1, async_save=False)
    mgr.save(s0, step=2)
    mgr.close()

    cfg_pl = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(tiny_config.train, pl_gamma=2.0),
    )
    tmpl = create_train_state(cfg_pl, build_gan(cfg_pl), jax.random.PRNGKey(0))
    mgr2 = CheckpointManager(str(tmp_path / "ck"), keep=1, async_save=False)
    restored = mgr2.restore(tmpl)
    mgr2.close()
    assert restored.pl_mean is not None and float(restored.pl_mean) == 0.0


def test_restore_backfills_ema_enabled_on_resume(tiny_config, tmp_path):
    """Enable EMA on a run checkpointed without it: orbax rejects the
    missing SUBTREE outright, so restore retries with the field blanked
    and seeds the EMA shadow from the RESTORED generator (not the
    template's fresh random init — sampling prefers ema_params, so a
    template-seeded shadow would sample near-noise for ~1/(1-decay)
    steps after enabling EMA mid-run)."""
    import dataclasses

    from locate_tpu.io.checkpoint import CheckpointManager

    cfg_off = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(tiny_config.train, ema_decay=0.0),
    )
    gan = build_gan(cfg_off)
    s0 = create_train_state(cfg_off, gan, jax.random.PRNGKey(0))
    assert s0.ema_params is None
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=1, async_save=False)
    mgr.save(s0, step=2)
    mgr.close()

    cfg_on = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(tiny_config.train, ema_decay=0.99),
    )
    tmpl = create_train_state(cfg_on, build_gan(cfg_on), jax.random.PRNGKey(7))
    mgr2 = CheckpointManager(str(tmp_path / "ck"), keep=1, async_save=False)
    restored = mgr2.restore(tmpl)
    mgr2.close()
    assert restored.ema_params is not None
    # params came from DISK (seed 0); ema seeded from those SAME restored
    # params — the shadow must start at the trained generator, not the
    # template's seed-7 init
    for a, b in zip(jax.tree.leaves(restored.g_params), jax.tree.leaves(s0.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b, t in zip(
        jax.tree.leaves(restored.ema_params),
        jax.tree.leaves(restored.g_params),
        jax.tree.leaves(tmpl.ema_params),
    ):
        assert np.asarray(a).dtype == np.asarray(t).dtype
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b).astype(np.asarray(a).dtype)
        )


def test_topology_migration_roundtrip(tiny_config, tmp_path):
    """Production resume across topologies (SURVEY.md §6 failure recovery,
    scaled): a checkpoint saved single-device restores directly INTO an
    8-device DP×TP-sharded template (orbax reshards on load from the
    template's shardings), trains a step there, saves, and restores back
    onto a single device — values bitwise through both migrations."""
    import dataclasses

    from locate_tpu.config import ParallelConfig
    from locate_tpu.parallel.mesh import make_mesh
    from locate_tpu.parallel.sharding import (
        make_sharded_train_step,
        place_train_state,
    )

    cfg = dataclasses.replace(
        tiny_config, parallel=ParallelConfig(data_parallel=4, model_parallel=2)
    )
    gan = build_gan(cfg)

    # --- phase 1: single-device training run saves a checkpoint
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step1 = jax.jit(make_train_step(cfg, gan))
    state, _ = step1(state, make_batch(cfg, jax.random.PRNGKey(1)))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(state, step=1)
    single_leaves = jax.tree.leaves(state)

    # --- phase 2: restore into a 4x2 DP×TP-sharded template
    mesh = make_mesh(cfg.parallel)
    jit_step, shardings_for, b_sharding = make_sharded_train_step(cfg, gan, mesh)
    template = place_train_state(
        create_train_state(cfg, gan, jax.random.PRNGKey(9)),
        shardings_for(create_train_state(cfg, gan, jax.random.PRNGKey(9))),
    )
    sharded = mgr.restore(template, step=1)
    # the restored leaves carry the TEMPLATE's (mesh) shardings, not the
    # checkpoint's single-device placement...
    specs = jax.tree.leaves(shardings_for(template))
    for leaf, want in zip(jax.tree.leaves(sharded), specs):
        assert leaf.sharding.is_equivalent_to(want, leaf.ndim), (
            leaf.sharding, want)
    # ...and the values are the saved ones, bit for bit
    for a, b in zip(jax.tree.leaves(sharded), single_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the sharded program actually steps from the migrated state
    batch = jax.device_put(make_batch(cfg, jax.random.PRNGKey(2)),
                           {"image": b_sharding, "label": b_sharding})
    sharded, metrics = jit_step(sharded)(sharded, batch)
    assert np.isfinite(float(metrics["d_loss"]))
    mgr.save(sharded, step=2)
    mgr.wait()
    sharded_leaves = [np.asarray(x) for x in jax.tree.leaves(sharded)]

    # --- phase 3: migrate BACK to a single device
    back = mgr.restore(create_train_state(cfg, gan, jax.random.PRNGKey(3)),
                       step=2)
    for a, b in zip(jax.tree.leaves(back), sharded_leaves):
        np.testing.assert_array_equal(np.asarray(a), b)
    mgr.close()


# Subprocess body for the async-crash drill below. Writes a sync step-0
# checkpoint, starts an ASYNC step-1 save of a ~128 MB pytree, and SIGKILLs
# itself the instant save() returns — the background writer thread dies
# mid-flight, leaving whatever partial on-disk state a real crash would.
_CRASH_SCRIPT = r"""
import os, signal, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from locate_tpu.io.checkpoint import CheckpointManager

ckdir = sys.argv[1]
def big_state(fill):
    # ~128 MB across several leaves so the background write is in flight
    # for a long time relative to the kill latency (microseconds).
    return {"w%d" % i: jnp.full((4096, 2048), fill + i, jnp.float32)
            for i in range(4)}

mgr = CheckpointManager(ckdir, keep=3, async_save=True)
mgr.save(big_state(0.0), step=0)
mgr.wait()  # step 0 is COMPLETE on disk
print("SYNC0_DONE", flush=True)
mgr.save(big_state(100.0), step=1)  # async: returns with write in flight
os.kill(os.getpid(), signal.SIGKILL)
"""


def test_async_crash_restores_last_complete(tmp_path):
    """Crash drill (VERDICT r3 #7): a SIGKILL mid-async-save must not tear
    the store — a fresh CheckpointManager on the same directory sees only
    the last COMPLETE checkpoint (step 0), restores it intact, and can
    keep saving. This is the one failure mode async_save introduces over
    sync (io/checkpoint.py:20)."""
    import subprocess
    import sys

    ckdir = str(tmp_path / "ck")
    script = tmp_path / "crash.py"
    script.write_text(_CRASH_SCRIPT)
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # Prepend (never overwrite: .claude/skills/verify gotcha) so the
    # subprocess can import locate_tpu from the repo root.
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script), ckdir],
        capture_output=True, text=True, timeout=300, env=env,
    )
    # The subprocess must have completed step 0 and then died by SIGKILL.
    assert "SYNC0_DONE" in proc.stdout, proc.stdout + proc.stderr
    assert proc.returncode == -9, (proc.returncode, proc.stderr)

    mgr = CheckpointManager(ckdir, keep=3, async_save=True)
    # Only the complete checkpoint is visible; the torn step-1 attempt
    # (if any bytes landed) must not be offered for restore.
    assert mgr.latest_step() == 0, (
        f"torn checkpoint surfaced as latest: {mgr.latest_step()}"
    )
    template = {
        "w%d" % i: jnp.zeros((4096, 2048), jnp.float32) for i in range(4)
    }
    restored = mgr.restore(template)
    for i in range(4):
        np.testing.assert_array_equal(
            np.asarray(restored["w%d" % i]),
            np.full((4096, 2048), float(i), np.float32),
        )
    # The store still works after the crash: a new save at the torn step
    # succeeds and becomes latest.
    mgr.save({k: v + 7.0 for k, v in restored.items()}, step=1)
    mgr.wait()
    assert mgr.latest_step() == 1
    again = mgr.restore(template, step=1)
    np.testing.assert_array_equal(
        np.asarray(again["w0"]), np.full((4096, 2048), 7.0, np.float32)
    )
    mgr.close()
