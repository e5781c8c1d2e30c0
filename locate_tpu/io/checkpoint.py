"""Checkpoint/resume (SURVEY.md §4.4, §6): the reference used
torch.save/load of state dicts; here the single TrainState pytree is saved
with orbax-checkpoint (async-capable, multi-host aware), keep-last-K, and
resume restores step counter, PRNG key, EMA, and both optimizer states for
deterministic continuation."""

from __future__ import annotations

import itertools
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
        # Enabling a feature on resume means the template carries state
        # fields the checkpoint predates. Orbax handles a missing SCALAR
        # leaf by substituting None but refuses a missing SUBTREE
        # (structure mismatch), so: try the full template, then retry
        # with each optional feature field blanked until the structures
        # match, and backfill the blanked/None fields from the template's
        # initial values. Disabling a feature on resume (checkpoint HAS
        # the field, template doesn't) still raises orbax's mismatch —
        # that direction would silently drop state.
        optional = ("ema_params", "ada_p", "pl_mean", "lecam")
        candidates = [
            blank
            for r in range(len(optional) + 1)
            for blank in itertools.combinations(optional, r)
        ]
        first_err = None
        for blank in candidates:
            t = template
            for field in blank:
                # getattr default: tolerate non-TrainState pytrees (the
                # manager is generic — e.g. plain dicts in drills/tools).
                if getattr(t, field, None) is None:
                    break  # nothing to blank; combination is redundant
                t = t.replace(**{field: None})
            else:
                abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, t)
                try:
                    restored = self._mgr.restore(
                        step, args=ocp.args.StandardRestore(abstract)
                    )
                except ValueError as e:
                    # Keep the FULL-template error: it names the real
                    # structure mismatch. Later candidates blank fields on
                    # purpose, so their errors describe the wrong variant.
                    if first_err is None:
                        first_err = e
                    continue
                fills = {}
                for field in optional:
                    if (getattr(template, field, None) is None
                            or getattr(restored, field, None) is not None):
                        continue
                    if field == "ema_params":
                        # Enabling EMA on resume: seed the shadow from the
                        # RESTORED (trained) generator, not the template's
                        # fresh random init — sampling/export prefer
                        # ema_params, so a template-seeded shadow would
                        # emit near-noise for ~1/(1-decay) steps.
                        from locate_tpu.objectives.ema import ema_init

                        tmpl_leaves = jax.tree.leaves(template.ema_params)
                        fills[field] = ema_init(
                            restored.g_params,
                            dtype=tmpl_leaves[0].dtype if tmpl_leaves
                            else jax.numpy.float32,
                        )
                    else:
                        fills[field] = getattr(template, field)
                return restored.replace(**fills) if fills else restored
        raise first_err

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
