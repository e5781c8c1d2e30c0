"""Checkpoint/resume (SURVEY.md §4.4, §6): the reference used
torch.save/load of state dicts; here the single TrainState pytree is saved
with orbax-checkpoint (async-capable, multi-host aware), keep-last-K, and
resume restores step counter, PRNG key, EMA, and both optimizer states for
deterministic continuation."""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from locate_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, async_save: bool = False):
        """`async_save` uses orbax's async checkpointing: the save copies
        device buffers then writes in a background thread, so the train
        loop keeps stepping (matters at 512^2 state sizes)."""
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._async = async_save
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, state: TrainState, step: Optional[int] = None) -> None:
        if self._async:
            # Surface a failed background save at the NEXT checkpoint
            # interval, not thousands of steps later at close().
            self._mgr.check_for_errors()
        step = int(state.step) if step is None else int(step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if not self._async:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure/shardings of `template` (an abstract
        or concrete TrainState)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract)
        )
        # Backfill state fields the checkpoint predates (orbax substitutes
        # None for template leaves absent on disk — e.g. ada_p when
        # enabling augmentation on a pre-ADA run): keep the template's
        # initial value instead of tracing None into the step later.
        if template.ada_p is not None and restored.ada_p is None:
            restored = restored.replace(ada_p=template.ada_p)
        return restored

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
