"""Integration smoke (SURVEY.md §5 item 4): the public train() entry runs N
steps on synthetic data, losses stay finite and move, sampling and
checkpoint-save -> restore -> resume work through the real code path."""

import dataclasses
import os

import numpy as np

from locate_tpu.train.loop import train


def test_train_loop_end_to_end(tiny_config, tmp_path):
    cfg = dataclasses.replace(
        tiny_config,
        workdir=str(tmp_path / "run"),
        train=dataclasses.replace(
            tiny_config.train, log_every=2, sample_every=4, checkpoint_every=4
        ),
    )
    collected = []
    hooks = {"on_metrics": lambda step, m: collected.append((step, m))}
    state = train(cfg, total_steps=4, hooks=hooks)
    assert int(state.step) == 4
    assert collected and all(
        np.isfinite(v) for _, m in collected for v in m.values()
    )
    assert os.path.exists(cfg.workdir + "/samples/step_00000004.png")
    assert os.path.isdir(cfg.workdir + "/checkpoints/4")

    # resume: continue to step 6 from the saved checkpoint
    state2 = train(cfg, total_steps=6)
    assert int(state2.step) == 6
