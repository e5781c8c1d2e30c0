"""Sanitizer & metrics tests (SURVEY.md §6): non-finite gradients skip the
update instead of poisoning params; MetricsLogger formats/flags correctly."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from locate_tpu.models.gan import build_gan
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_train_step
from locate_tpu.utils.metrics import MetricsLogger


def test_nonfinite_batch_skips_update(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(tiny_config.train, max_nonfinite_skips=5),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    nan_batch = {
        "image": jnp.full((cfg.train.global_batch, 16, 16, 3), jnp.nan),
        "label": jnp.zeros((cfg.train.global_batch,), jnp.int32),
    }
    before_d = jax.tree.leaves(state.d_params)[0].copy()
    state, metrics = step(state, nan_batch)
    after_d = jax.tree.leaves(state.d_params)[0]
    # update skipped: discriminator params unchanged despite the NaN batch
    np.testing.assert_array_equal(np.asarray(before_d), np.asarray(after_d))
    # and the step still counts + a good batch afterwards trains normally
    good = {
        "image": jax.random.uniform(
            jax.random.PRNGKey(1), (cfg.train.global_batch, 16, 16, 3),
            minval=-1.0, maxval=1.0,
        ),
        "label": jnp.zeros((cfg.train.global_batch,), jnp.int32),
    }
    state, metrics = step(state, good)
    assert np.isfinite(float(metrics["d_loss"]))
    after2 = jax.tree.leaves(state.d_params)[0]
    assert float(jnp.abs(after2 - after_d).max()) > 0


def test_metrics_logger_stdout(capsys):
    logger = MetricsLogger(None)
    logger.log_scalars(5, {"a": 1.0, "b": float("nan")})
    out = capsys.readouterr().out
    assert "step 5" in out and "a=1" in out and "NONFINITE=['b']" in out
    logger.log_images(5, "x", np.zeros((2, 4, 4, 3), np.uint8))  # no-op
    logger.flush()


def test_nonfinite_never_poisons_and_loop_aborts(tiny_config, tmp_path):
    """Params stay finite under an arbitrarily long NaN streak (optax is
    configured to never 'give up and apply'), and the train loop raises
    once the streak metric reaches max_nonfinite_skips."""
    import pytest

    from locate_tpu.train.loop import train

    cfg = dataclasses.replace(
        tiny_config,
        workdir=str(tmp_path / "run"),
        data=dataclasses.replace(tiny_config.data, dataset="synthetic"),
        train=dataclasses.replace(
            tiny_config.train, max_nonfinite_skips=3, log_every=1,
            sample_every=0, checkpoint_every=0, g_opt=dataclasses.replace(
                tiny_config.train.g_opt, lr=float("nan")
            ),
        ),
    )
    # NaN learning rate => every update is non-finite
    with pytest.raises(RuntimeError, match="non-finite gradient steps"):
        train(cfg, total_steps=10)


def test_nonfinite_streak_metric(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(tiny_config.train, max_nonfinite_skips=5),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    nan_batch = {
        "image": jnp.full((cfg.train.global_batch, 16, 16, 3), jnp.nan),
        "label": jnp.zeros((cfg.train.global_batch,), jnp.int32),
    }
    for want in (1, 2):
        state, metrics = step(state, nan_batch)
        assert int(metrics["d_nonfinite_streak"]) == want
    # params still bit-finite after the streak
    assert all(
        bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(state.d_params)
    )


def test_log_every_must_not_exceed_skip_limit():
    """The non-finite abort is only checked at log boundaries; the config
    rejects a log_every that would delay it past the streak limit."""
    import pytest

    from locate_tpu.config import TrainConfig

    with pytest.raises(ValueError, match="fire on time"):
        TrainConfig(max_nonfinite_skips=5, log_every=100)
    TrainConfig(max_nonfinite_skips=100, log_every=100)
    TrainConfig(max_nonfinite_skips=0, log_every=100)  # guard disabled


def test_run_artifacts_config_and_metrics_jsonl(tiny_config, tmp_path):
    """Every train() run leaves a machine-readable record: the resolved
    config.json and an append-only metrics.jsonl at log cadence."""
    import json

    from locate_tpu.train.loop import train

    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, log_every=2, sample_every=0, checkpoint_every=0
        ),
        workdir=str(tmp_path / "run"),
    )
    train(cfg, total_steps=4, resume=False)

    with open(tmp_path / "run" / "config.json") as f:
        dumped = json.load(f)
    assert dumped["train"]["global_batch"] == cfg.train.global_batch
    assert dumped["model"]["resolution"] == cfg.model.resolution

    lines = [
        json.loads(l)
        for l in open(tmp_path / "run" / "metrics.jsonl")
    ]
    assert [l["step"] for l in lines] == [2, 4]
    assert all(np.isfinite(l["d_loss"]) for l in lines)
    # a FRESH run into the same workdir truncates (one trajectory per file)
    train(cfg, total_steps=6, resume=False)
    lines2 = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert [l["step"] for l in lines2] == [2, 4, 6]
    # a RESUMED run appends
    cfg_ck = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, checkpoint_every=6),
    )
    train(cfg_ck, total_steps=6, resume=False)   # fresh: [2, 4, 6] + ckpt@6
    train(cfg_ck, total_steps=10, resume=True)   # resumes at 6, appends
    lines3 = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert [l["step"] for l in lines3] == [2, 4, 6, 8, 10]


def test_lazy_r1_last_fire_logged(tiny_config, tmp_path):
    """With r1_interval=4 and log_every=2 the log steps alias the cond to
    its zero branch (internal step at a log boundary is 1 mod 4 / 3 mod 4,
    never 0), so the raw "r1" metric logs 0 — r1_last_fire carries the
    most recent FIRED penalty instead (loop.py lazy_tracks)."""
    import json

    from locate_tpu.train.loop import train

    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, r1_gamma=1.0, r1_interval=4, log_every=2,
            sample_every=0, checkpoint_every=0,
        ),
        workdir=str(tmp_path / "run"),
    )
    train(cfg, total_steps=6, resume=False)
    lines = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert [l["step"] for l in lines] == [2, 4, 6]
    # the aliased raw metric: every logged dispatch (internal steps 1, 3,
    # 5) sits on the lazy-off branch
    assert all(l["r1"] == 0.0 for l in lines)
    # fires happened at internal steps 0 (logged at 2) and 4 (logged at 6)
    assert all(l["r1_last_fire"] > 0.0 for l in lines)
    assert lines[2]["r1_last_fire"] != lines[0]["r1_last_fire"]
