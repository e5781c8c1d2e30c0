"""Multi-host / multi-slice hooks (SURVEY.md §3.2 "Multi-slice":
out of scope for single-slice targets, but the jax.distributed hook is
kept ready). Call `initialize_from_env()` once at process start on each
TPU-VM host; it is a no-op in single-process runs."""

from __future__ import annotations

import os
from typing import Optional


def initialize_from_env(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, as set by most TPU
    pod launchers). Returns True if distributed mode was initialized."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    if not coordinator_address and num_processes in (None, 1):
        return False  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
