"""Persistent XLA compilation cache (SURVEY.md §6 tracing/ops tooling).

On the tunneled-TPU deployment every jit signature costs a 30-90s (up to
minutes for grad-of-grad programs) remote compile; a resumed or
relaunched run pays it all again for byte-identical programs. JAX's
persistent compilation cache serializes compiled executables to disk
keyed on (program, backend, flags), so relaunches reload instead of
recompiling — this turns crash-resume and periodic-eval relaunches from
multi-minute events into seconds.

Enabled via `Config.compile_cache` (a directory path) — wired in both
`train()` and the CLI so every subcommand (train/eval/sample/project)
shares one cache. Safe everywhere: if the backend cannot serialize
executables the cache just stays empty (JAX logs a warning once).
"""

from __future__ import annotations

import os

_enabled_dir: str | None = None


def enable(path: str) -> None:
    """Point JAX's persistent compilation cache at `path` (idempotent;
    the cache is process-global, so a later call with a different path
    warns and keeps the first)."""
    global _enabled_dir
    if not path:
        return
    path = os.path.abspath(os.path.expanduser(path))
    if _enabled_dir is not None:
        if _enabled_dir != path:
            # The cache is process-global and jit signatures may already
            # be cached under the first dir; keep it (still-correct
            # caching) rather than churning mid-process.
            import warnings

            warnings.warn(
                f"compilation cache already enabled at {_enabled_dir!r}; "
                f"ignoring re-point to {path!r}",
                stacklevel=2,
            )
        return
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache even fast compiles: over the tunnel the wall-clock floor per
    # compile is RPC-bound, not XLA-bound, so "cheap" compiles are worth
    # caching too.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled_dir = path
