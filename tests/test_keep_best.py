"""Best-eval checkpoint tracking (train.keep_best): the loop snapshots
the state whenever the in-training rFID improves, records the incumbent
in best.json, and a resume cannot demote it."""

import dataclasses
import json
import os

import numpy as np

import locate_tpu as lt


def _cfg(tiny_config, workdir, total=8):
    return dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train,
            eval_every=2,
            eval_samples=16,
            log_every=2,
            sample_every=0,
            checkpoint_every=4,
        ),
        workdir=str(workdir),
    )


def test_keep_best_tracks_min_rfid(tiny_config, tmp_path):
    cfg = _cfg(tiny_config, tmp_path / "run")
    scores = []
    lt.train(cfg, total_steps=8,
             hooks={"on_eval": lambda s, sc: scores.append((s, sc["fid"]))})
    assert len(scores) == 4  # evals at 2, 4, 6, 8
    best_file = os.path.join(cfg.workdir, "best.json")
    assert os.path.exists(best_file)
    with open(best_file) as f:
        best = json.load(f)
    fids = {s: f for s, f in scores}
    assert best["fid"] == min(f for _, f in scores)
    assert np.isclose(fids[best["step"]], best["fid"])
    # exactly one best snapshot kept, at the winning step
    from locate_tpu.io.checkpoint import CheckpointManager

    mgr = CheckpointManager(
        os.path.join(cfg.workdir, "checkpoints_best"), keep=1,
        async_save=False,
    )
    assert mgr.latest_step() == best["step"]
    mgr.close()


def test_keep_best_survives_resume(tiny_config, tmp_path):
    """A resumed run must not overwrite the incumbent with a worse score:
    seed best.json with an unbeatable fid and check it survives."""
    cfg = _cfg(tiny_config, tmp_path / "run2")
    lt.train(cfg, total_steps=4)
    with open(os.path.join(cfg.workdir, "best.json")) as f:
        first = json.load(f)
    # make the incumbent unbeatable, then resume
    with open(os.path.join(cfg.workdir, "best.json"), "w") as f:
        json.dump({**first, "fid": -1.0}, f)
    lt.train(cfg, total_steps=8)
    with open(os.path.join(cfg.workdir, "best.json")) as f:
        after = json.load(f)
    assert after["fid"] == -1.0  # never demoted


def test_keep_best_disabled(tiny_config, tmp_path):
    cfg = dataclasses.replace(
        _cfg(tiny_config, tmp_path / "run3"),
        train=dataclasses.replace(
            tiny_config.train, eval_every=2, eval_samples=16,
            log_every=2, sample_every=0, checkpoint_every=4,
            keep_best=False,
        ),
    )
    lt.train(cfg, total_steps=4)
    assert not os.path.exists(os.path.join(cfg.workdir, "best.json"))
    assert not os.path.exists(os.path.join(cfg.workdir, "checkpoints_best"))