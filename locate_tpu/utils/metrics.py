"""Metrics/observability (SURVEY.md §6): the reference printed scalar
losses and dumped sample grids; the rebuild keeps those two channels and
adds a machine-readable metrics.jsonl in the workdir plus optional
TensorBoard (scalars + image grids) via tf.summary.

TensorFlow import is lazy and only happens when TB logging is enabled —
importing TF costs ~10s and is never needed in the hot path."""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    """stdout + metrics.jsonl (when `jsonl_path` set) + optional
    TensorBoard. `log_scalars` / `log_images` are no-ops for TB when
    `logdir` is None."""

    def __init__(self, logdir: Optional[str] = None,
                 jsonl_path: Optional[str] = None, append: bool = True,
                 resume_step: Optional[int] = None):
        self._writer = None
        self._jsonl = None
        if logdir:
            import tensorflow as tf  # lazy: heavy import (before the
            # jsonl open so an ImportError can't leak the file handle)

            self._writer = tf.summary.create_file_writer(logdir)
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            if append and resume_step is not None and os.path.exists(jsonl_path):
                # Resume rewinds to the last CHECKPOINT, which may predate
                # the last LOGGED step (crash between a log boundary and
                # the next save). The replayed steps will be re-logged, so
                # drop stale records with step > resume_step first — the
                # file must stay exactly one monotone trajectory.
                kept = []
                with open(jsonl_path) as f:
                    for line in f:
                        try:
                            rec = json.loads(line)
                        except json.JSONDecodeError:
                            # A crash mid-write leaves a torn final line —
                            # the very scenario this rewind handles. Drop it.
                            continue
                        if rec.get("step", 0) <= resume_step:
                            kept.append(line)
                with open(jsonl_path, "w") as f:
                    f.writelines(kept)
            # append on resume; a fresh run truncates so the artifact
            # describes exactly one training trajectory
            mode = "a" if append else "w"
            self._jsonl = open(jsonl_path, mode, buffering=1)  # line-buffered

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        parts = " ".join(
            f"{k}={v:.4g}" for k, v in sorted(scalars.items()) if np.isfinite(v)
        )
        bad = [k for k, v in scalars.items() if not np.isfinite(v)]
        suffix = f" NONFINITE={bad}" if bad else ""
        print(f"[locate-tpu] step {step} {parts}{suffix}", flush=True)
        if self._jsonl is not None:
            # json.dumps would emit bare NaN/Infinity tokens (invalid
            # JSON) for non-finite values — map them to null
            record = {
                k: (float(v) if np.isfinite(v) else None)
                for k, v in scalars.items()
            }
            self._jsonl.write(json.dumps({"step": step, **record}) + "\n")
        if self._writer is not None:
            import tensorflow as tf

            with self._writer.as_default(step=step):
                for k, v in scalars.items():
                    tf.summary.scalar(k, v)

    def log_images(self, step: int, tag: str, images_u8: np.ndarray) -> None:
        if self._writer is None:
            return
        import tensorflow as tf

        with self._writer.as_default(step=step):
            tf.summary.image(tag, images_u8[:16], max_outputs=16)

    def flush(self) -> None:
        if self._jsonl is not None:
            self._jsonl.flush()
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        self.flush()
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
