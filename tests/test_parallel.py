"""Multi-device tests on the 8-fake-CPU-device mesh (SURVEY.md §5 item 3):
DP sharded step == single-device step, TP sharding compiles & runs, batch
sharding actually distributes data."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locate_tpu.config import ParallelConfig
from locate_tpu.models.gan import build_gan
from locate_tpu.parallel.mesh import make_mesh, single_device_mesh
from locate_tpu.parallel.sharding import (
    batch_sharding,
    make_sharded_train_step,
    param_shardings,
    place_train_state,
)
from locate_tpu.train.state import create_train_state


def make_batch(cfg, key):
    img = jax.random.uniform(
        key, (cfg.train.global_batch, cfg.model.resolution, cfg.model.resolution, 3),
        minval=-1.0, maxval=1.0,
    )
    return {"image": img, "label": jnp.zeros((cfg.train.global_batch,), jnp.int32)}


def run_steps(cfg, mesh, n_steps=3):
    gan = build_gan(cfg)
    with mesh:
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        jit_step_for, shardings_for, b_shard = make_sharded_train_step(cfg, gan, mesh)
        state = place_train_state(state, shardings_for(state))
        step = jit_step_for(state)
        batch = jax.device_put(
            make_batch(cfg, jax.random.PRNGKey(1)),
            {"image": b_shard, "label": b_shard},
        )
        history = []
        for _ in range(n_steps):
            state, metrics = step(state, batch)
            history.append({k: float(v) for k, v in metrics.items()})
    return state, history


def test_mesh_construction():
    mesh = make_mesh(ParallelConfig())
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(ParallelConfig(data_parallel=4, model_parallel=2))
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(ParallelConfig(data_parallel=3, model_parallel=2))


def test_dp_matches_single_device(tiny_config):
    """The same global program on a 1-device and an 8-device mesh must give
    the same loss trajectory (GSPMD semantics: sharding is a layout, not a
    program change)."""
    cfg = tiny_config
    _, hist1 = run_steps(cfg, single_device_mesh(cfg.parallel), n_steps=2)
    _, hist8 = run_steps(cfg, make_mesh(cfg.parallel), n_steps=2)
    for h1, h8 in zip(hist1, hist8):
        for k in h1:
            np.testing.assert_allclose(h1[k], h8[k], rtol=5e-4, atol=5e-4, err_msg=k)


def test_ffhq256_preset_config_dp_matches_single_device():
    """BASELINE config 4's PRESET (ffhq_256: class-conditional GAN, DP
    over ICI) run at tiny spatial shapes over the 8-fake-device mesh ==
    single device (VERDICT r2 task 3's multi-chip side). Keeps the
    preset's structural features — class conditioning (num_classes=10,
    G class-embed + D projection head), EMA, its optimizer chain — and
    shrinks only resolution/width/batch. r1_gamma=0 keeps the CPU
    grad-of-grad compile out (R1-on DP equality is pinned separately by
    test_r1_pallas on the tiny config)."""
    from locate_tpu.config import get_config

    cfg = get_config("ffhq_256", {
        "model.resolution": "16",
        "model.base_channels": "32",
        "model.max_channels": "32",
        "model.min_channels": "16",
        "model.latent_dim": "16",
        "data.resolution": "16",
        "data.dataset": "synthetic",
        "train.global_batch": "16",
        "train.compute_dtype": "float32",
        "train.r1_gamma": "0.0",
        "train.log_every": "2",
        "train.sample_every": "0",
        "train.checkpoint_every": "0",
    })
    assert cfg.model.num_classes == 10  # the preset's conditioning survives

    def batch(key):
        img = jax.random.uniform(
            key, (cfg.train.global_batch, 16, 16, 3), minval=-1.0, maxval=1.0)
        lab = jax.random.randint(
            jax.random.PRNGKey(9), (cfg.train.global_batch,), 0, 10)
        return {"image": img, "label": lab}

    def run(mesh):
        gan = build_gan(cfg)
        with mesh:
            state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
            jit_step_for, shardings_for, b_shard = make_sharded_train_step(
                cfg, gan, mesh)
            state = place_train_state(state, shardings_for(state))
            step = jit_step_for(state)
            b = jax.device_put(batch(jax.random.PRNGKey(1)),
                               {"image": b_shard, "label": b_shard})
            hist = []
            for _ in range(2):
                state, metrics = step(state, b)
                hist.append({k: float(v) for k, v in metrics.items()})
        return hist

    h1 = run(single_device_mesh(cfg.parallel))
    h8 = run(make_mesh(cfg.parallel))
    for a, b_ in zip(h1, h8):
        for k in a:
            np.testing.assert_allclose(a[k], b_[k], rtol=5e-4, atol=5e-4,
                                       err_msg=k)


def test_dp_state_replicated(tiny_config):
    """After a DP step params must be fully replicated (same value on every
    device)."""
    cfg = tiny_config
    state, _ = run_steps(cfg, make_mesh(cfg.parallel), n_steps=1)
    leaf = jax.tree.leaves(state.g_params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_batch_is_sharded(tiny_config):
    cfg = tiny_config
    mesh = make_mesh(cfg.parallel)
    b = batch_sharding(mesh)
    x = jax.device_put(jnp.zeros((8, 4, 4, 3)), b)
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (1, 4, 4, 3)


def test_tensor_parallel_step_runs(tiny_config):
    """DP x TP (4x2) mesh: channel-sharded params, step runs, loss finite,
    and matches the single-device trajectory."""
    cfg = dataclasses.replace(
        tiny_config, parallel=ParallelConfig(data_parallel=4, model_parallel=2)
    )
    _, hist = run_steps(cfg, make_mesh(cfg.parallel), n_steps=2)
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    _, hist1 = run_steps(cfg, single_device_mesh(cfg.parallel), n_steps=2)
    # Step 2 drift is Adam amplifying fp32 reduction-order noise on the
    # softmax gate's shift-invariant (true-gradient-zero) bias leaves;
    # per-step computation equality is pinned tightly by
    # test_tensor_parallel_per_step_equality below.
    np.testing.assert_allclose(hist1[0]["d_loss"], hist[0]["d_loss"], rtol=1e-4)
    np.testing.assert_allclose(hist1[1]["d_loss"], hist[1]["d_loss"], rtol=5e-3)


def test_tensor_parallel_per_step_equality(tiny_config):
    """Per-step state-rebase (VERDICT r1 weak #5): trajectory comparisons
    amplify fp reduction-order noise through the optimizer, so instead pin
    the per-step computation itself — run one TP step, pull the updated
    state to host, then take ONE step from that identical state on both the
    4x2 DP x TP mesh and a single device and require tight agreement."""
    cfg = dataclasses.replace(
        tiny_config, parallel=ParallelConfig(data_parallel=4, model_parallel=2)
    )
    gan = build_gan(cfg)
    batch_host = make_batch(cfg, jax.random.PRNGKey(1))

    def one_step(mesh, host_state):
        with mesh:
            jit_for, sh_for, b_shard = make_sharded_train_step(cfg, gan, mesh)
            state = place_train_state(host_state, sh_for(host_state))
            step = jit_for(state)
            batch = jax.device_put(
                batch_host, {"image": b_shard, "label": b_shard}
            )
            state, metrics = step(state, batch)
            return jax.device_get(state), {
                k: float(v) for k, v in metrics.items()
            }

    mesh_tp = make_mesh(cfg.parallel)
    mesh_1 = single_device_mesh(cfg.parallel)
    init = jax.device_get(create_train_state(cfg, gan, jax.random.PRNGKey(0)))
    # warm the state one step away from init (optimizer state non-trivial),
    # then rebase: both programs restart from these identical bits.
    rebase, _ = one_step(mesh_tp, init)
    state_tp, m_tp = one_step(mesh_tp, rebase)
    state_1, m_1 = one_step(mesh_1, rebase)
    for k in m_1:
        np.testing.assert_allclose(m_tp[k], m_1[k], rtol=1e-3, atol=1e-5, err_msg=k)
    # updated params agree leaf-by-leaf (Adam-normalized update: atol ~ lr)
    for leaf_tp, leaf_1 in zip(
        jax.tree.leaves(state_tp.g_params), jax.tree.leaves(state_1.g_params)
    ):
        np.testing.assert_allclose(leaf_tp, leaf_1, rtol=5e-2, atol=2e-4)


def test_shardmap_step_matches_gspmd(tiny_config):
    """Explicit shard_map+psum DP step vs GSPMD-inferred DP step: the two
    communication-backend realizations sample different (equally valid)
    latent streams (per-replica folded keys vs one global key), so exact
    equality is only required where the streams don't enter:
    step-1 real-data statistics. Loss-level metrics must agree loosely,
    and the shard_map path must be deterministic and keep params
    replicated."""
    from locate_tpu.parallel.sharding import make_shardmap_train_step

    cfg = tiny_config
    gan = build_gan(cfg)
    mesh = make_mesh(cfg.parallel)

    def run(maker):
        with mesh:
            state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
            jit_for, sh_for, b_shard = maker(cfg, gan, mesh)
            state = place_train_state(state, sh_for(state))
            step = jit_for(state)
            batch = jax.device_put(
                make_batch(cfg, jax.random.PRNGKey(1)),
                {"image": b_shard, "label": b_shard},
            )
            hist = []
            for _ in range(2):
                state, metrics = step(state, batch)
                hist.append({k: float(v) for k, v in metrics.items()})
            return state, hist

    _, gspmd = run(make_sharded_train_step)
    state_sm, sm = run(make_shardmap_train_step)
    # identical real batch + identical initial D => identical real logits
    np.testing.assert_allclose(
        gspmd[0]["real_logits"], sm[0]["real_logits"], rtol=1e-4, atol=1e-5
    )
    # losses agree to latent-sampling noise
    for k in ("d_loss", "g_loss"):
        np.testing.assert_allclose(gspmd[0][k], sm[0][k], rtol=0.05, err_msg=k)
    assert all(np.isfinite(list(h.values())).all() for h in sm)
    # params stay replicated across all 8 devices
    leaf = jax.tree.leaves(state_sm.g_params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    # the shard_map path itself is deterministic
    _, sm2 = run(make_shardmap_train_step)
    for a, b in zip(sm, sm2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_shardmap_steps_per_call_matches_sequential(tiny_config):
    """steps_per_call on the shard_map backend (round 3 — was
    gspmd-only): one k=2 scan call must advance the state exactly like
    two sequential k=1 calls of the same backend."""
    import dataclasses as dc

    from locate_tpu.parallel.sharding import make_shardmap_train_step

    cfg = tiny_config
    gan = build_gan(cfg)
    mesh = make_mesh(cfg.parallel)
    b0 = make_batch(cfg, jax.random.PRNGKey(1))
    b1 = make_batch(cfg, jax.random.PRNGKey(2))

    def run(k):
        c = cfg if k == 1 else dc.replace(
            cfg, train=dc.replace(
                cfg.train, steps_per_call=k,
                log_every=cfg.train.log_every * k,
                sample_every=cfg.train.sample_every * k,
                checkpoint_every=cfg.train.checkpoint_every * k,
                eval_every=0,
                total_steps=max(cfg.train.total_steps // k, 1) * k,
            ),
        )
        g = build_gan(c)
        with mesh:
            state = create_train_state(c, g, jax.random.PRNGKey(0))
            jit_for, sh_for, b_shard = make_shardmap_train_step(c, g, mesh)
            state = place_train_state(state, sh_for(state))
            step = jit_for(state)
            if k == 1:
                for b in (b0, b1):
                    dev = jax.device_put(
                        b, {"image": b_shard, "label": b_shard})
                    state, metrics = step(state, dev)
            else:
                stacked = jax.tree.map(
                    lambda a, b: np.stack([a, b]), b0, b1)
                dev = jax.device_put(
                    stacked, {"image": b_shard, "label": b_shard})
                state, metrics = step(state, dev)
            assert int(state.step) == 2
            return jax.device_get(state)

    s_seq = run(1)
    s_scan = run(2)

    def assert_params_close(a, b):
        # exclude the softmax gate's shift-invariant `to_logits.b` (true
        # gradient exactly zero; Adam amplifies per-compilation reduction
        # noise there to O(lr) — same exclusion as
        # test_step_variants.test_multi_step_matches_sequential)
        fa = jax.tree_util.tree_flatten_with_path(a)[0]
        fb = jax.tree.leaves(b)
        for (path, la), lb in zip(fa, fb):
            name = jax.tree_util.keystr(path)
            if "to_logits" in name and name.endswith("['b']"):
                continue
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-6, err_msg=name)

    assert_params_close(s_seq.g_params, s_scan.g_params)
    assert_params_close(s_seq.d_params, s_scan.d_params)


def test_shardmap_rejects_model_parallel(tiny_config):
    from locate_tpu.parallel.sharding import make_shardmap_train_step

    cfg = dataclasses.replace(
        tiny_config, parallel=ParallelConfig(data_parallel=4, model_parallel=2)
    )
    gan = build_gan(cfg)
    mesh = make_mesh(cfg.parallel)
    with pytest.raises(ValueError, match="DP-only"):
        make_shardmap_train_step(cfg, gan, mesh)


def test_param_sharding_rule():
    mesh = make_mesh(ParallelConfig(data_parallel=4, model_parallel=2))
    params = {
        "conv_w": jnp.zeros((3, 3, 64, 256)),   # shardable: 256 % 2 == 0
        "bias": jnp.zeros((256,)),              # 1-D: replicated
        "small": jnp.zeros((4, 6)),             # too small: replicated
    }
    specs = param_shardings(params, mesh)
    assert specs["conv_w"].spec == jax.sharding.PartitionSpec(None, None, None, "model")
    assert specs["bias"].spec == jax.sharding.PartitionSpec()
    assert specs["small"].spec == jax.sharding.PartitionSpec()


# ---------------------------------------------------------------------------
# ZeRO / FSDP state sharding (parallel.zero_stage)


def _zero_cfg(tiny_config, stage):
    return dataclasses.replace(
        tiny_config, parallel=ParallelConfig(zero_stage=stage)
    )


@pytest.mark.parametrize("stage", [1, 3])
def test_zero_matches_replicated(tiny_config, stage):
    """ZeRO is a LAYOUT change, not a program change: the stage-1 (sharded
    Adam mu/nu + EMA shadow) and stage-3 (sharded params too) trajectories
    on the 8-device mesh must match the replicated stage-0 run."""
    _, hist0 = run_steps(_zero_cfg(tiny_config, 0),
                         make_mesh(ParallelConfig()), n_steps=2)
    cfg = _zero_cfg(tiny_config, stage)
    _, histz = run_steps(cfg, make_mesh(cfg.parallel), n_steps=2)
    for h0, hz in zip(hist0, histz):
        for k in h0:
            np.testing.assert_allclose(h0[k], hz[k], rtol=5e-4, atol=5e-4,
                                       err_msg=f"stage={stage} {k}")


def test_zero1_shards_opt_state_not_params(tiny_config):
    """Stage 1: Adam mu/nu and the EMA shadow live sharded over `data`
    (per-device shard = 1/8 of the leaf), params stay replicated."""
    cfg = _zero_cfg(tiny_config, 1)
    state, _ = run_steps(cfg, make_mesh(cfg.parallel), n_steps=1)

    def data_sharded_bytes(tree):
        tot = shard = 0
        for leaf in jax.tree.leaves(tree):
            tot += leaf.size
            if "data" in tuple(leaf.sharding.spec):
                shard += leaf.size
                assert leaf.addressable_shards[0].data.size == leaf.size // 8
        return shard, tot

    s, t = data_sharded_bytes(state.g_opt_state)
    assert s / t > 0.9, f"only {s}/{t} opt-state elements data-sharded"
    s, t = data_sharded_bytes(state.ema_params)
    assert s / t > 0.9
    p, pt = data_sharded_bytes(state.g_params)
    assert p == 0, "stage 1 must not shard params"


def test_zero3_shards_params(tiny_config):
    cfg = _zero_cfg(tiny_config, 3)
    state, _ = run_steps(cfg, make_mesh(cfg.parallel), n_steps=1)
    sharded = sum(
        leaf.size
        for leaf in jax.tree.leaves(state.g_params)
        if "data" in tuple(leaf.sharding.spec)
    )
    total = sum(leaf.size for leaf in jax.tree.leaves(state.g_params))
    assert sharded / total > 0.9, f"only {sharded}/{total} param elements sharded"


def test_zero_composes_with_tp(tiny_config):
    """4x2 DP x TP with stage-1 ZeRO: model-axis channel sharding and
    data-axis state sharding coexist on the same leaves."""
    cfg = dataclasses.replace(
        tiny_config,
        parallel=ParallelConfig(data_parallel=4, model_parallel=2, zero_stage=1),
    )
    _, hist = run_steps(cfg, make_mesh(cfg.parallel), n_steps=2)
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    _, hist1 = run_steps(cfg, single_device_mesh(cfg.parallel), n_steps=2)
    np.testing.assert_allclose(hist1[0]["d_loss"], hist[0]["d_loss"], rtol=1e-4)


def test_zero_rejects_shard_map():
    with pytest.raises(ValueError, match="zero_stage"):
        ParallelConfig(backend="shard_map", zero_stage=1)
    with pytest.raises(ValueError, match="zero_stage"):
        ParallelConfig(zero_stage=2)


def test_zero_checkpoint_resume(tiny_config, tmp_path):
    """Checkpoint/resume under ZeRO-1 on the 8-device mesh: orbax saves the
    data-sharded opt state / EMA as global arrays and restores straight
    into the sharded template (train/loop.py restores AFTER
    place_train_state). 2+2 resumed steps == 4 straight steps, bitwise."""
    from locate_tpu.io.checkpoint import CheckpointManager
    from locate_tpu.parallel.sharding import make_sharded_train_step

    cfg = _zero_cfg(tiny_config, 1)
    gan = build_gan(cfg)
    mesh = make_mesh(cfg.parallel)
    batch = make_batch(cfg, jax.random.PRNGKey(1))

    def fresh():
        with mesh:
            state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
            jit_step_for, shardings_for, b_shard = make_sharded_train_step(
                cfg, gan, mesh)
            state = place_train_state(state, shardings_for(state))
            step = jit_step_for(state)
            b = jax.device_put(batch, {"image": b_shard, "label": b_shard})
        return state, step, b

    state_a, step, b = fresh()
    with mesh:
        for _ in range(4):
            state_a, metrics_a = step(state_a, b)

    state_b, step, b = fresh()
    with mesh:
        for _ in range(2):
            state_b, _ = step(state_b, b)
        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
        mgr.save(state_b)
        template, _, _ = fresh()  # sharded fresh template, like the loop's
        restored = mgr.restore(template)
        assert any(
            "data" in tuple(leaf.sharding.spec)
            for leaf in jax.tree.leaves(restored.g_opt_state)
        ), "restore dropped the ZeRO sharding"
        for _ in range(2):
            restored, metrics_b = step(restored, b)
        mgr.close()

    assert int(restored.step) == int(state_a.step) == 4
    for k in metrics_a:
        np.testing.assert_array_equal(
            np.asarray(metrics_a[k]), np.asarray(metrics_b[k]), err_msg=k)
