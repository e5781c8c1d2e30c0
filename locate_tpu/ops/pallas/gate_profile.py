"""Fused-kernel dispatch gates as DATA, not code constants (VERDICT r3 #5).

The checked-in `gate_profile.json` holds, per stage flavor, the minimum
location count (H*W) at which the Pallas fused-stage kernel dispatches
instead of the XLA composition, plus the per-tile VMEM budget used by
`fused_stage._pick_rows`. The defaults reproduce round 3's measured
never-slower gate (fuse only at >= 512^2 everywhere); on real (non-
emulated) hardware run

    python scripts/retune_gates.py --write

to re-measure the full shape ladder and rewrite the table in place.

Flavors (matching nn/blocks.py's dispatch sites):
    pair       conv block + locate gate, no resample
    conv       conv block only, no resample
    up_pair    generator head: upsample + conv + gate
    up_conv    upsample + conv (bps >= 2 first block)
    down_pair  discriminator tail: conv + gate + 2x2 avg-pool
    down_conv  conv + 2x2 avg-pool

Override the profile file with LOCATE_TPU_GATE_PROFILE=<path> (tuning
runs); override every flavor at once by setting
`locate_tpu.nn.blocks.FUSE_MIN_LOCATIONS` to an int (tests do this).
"""

from __future__ import annotations

import functools
import json
import os

FLAVORS = ("pair", "conv", "up_pair", "up_conv", "down_pair", "down_conv")

_DEFAULT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "gate_profile.json")


def profile_path() -> str:
    return os.environ.get("LOCATE_TPU_GATE_PROFILE", _DEFAULT_PATH)


@functools.lru_cache(maxsize=8)
def _load(path: str) -> dict:
    with open(path) as fh:
        prof = json.load(fh)
    ml = prof.get("min_locations", {})
    missing = [f for f in FLAVORS if f not in ml]
    if missing:
        raise ValueError(
            f"gate profile {path} missing min_locations for {missing}"
        )
    return prof


def load() -> dict:
    """The active profile dict (cached per path)."""
    return _load(profile_path())


def min_locations(flavor: str) -> int:
    """Dispatch threshold (H*W locations) for a stage flavor."""
    return int(load()["min_locations"][flavor])


def vmem_budget() -> int:
    """Per-tile VMEM state budget (bytes) for fused_stage._pick_rows.
    LOCATE_TPU_VMEM_BUDGET still overrides for one-off tuning runs."""
    return int(load().get("vmem_budget", 4 * 1024 * 1024))


def reload() -> None:
    """Drop the cache (after a retune rewrote the file)."""
    _load.cache_clear()
