"""Persistent compilation cache (utils/compile_cache.py): enabling via
Config.compile_cache must populate the cache dir with serialized
executables, and the process-global enable must be idempotent. The
cross-process reload path was probed live on the axon TPU backend
(docs/DESIGN.md 'Compilation cache'); here we pin the wiring on CPU.

NOTE: enable() is process-global and has no off-switch, so the cache
stays pointed at this module's tmp dir for every later test file in the
same pytest shard. That is benign (extra cache writes for compiles over
the min-compile-time threshold, which this module restores), but if a
future test asserts on cache state it must not share a shard with this
file."""

import warnings

import jax
import jax.numpy as jnp
import pytest

from locate_tpu.utils import compile_cache


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    """One dir for the whole module: enable() is process-global."""
    d = tmp_path_factory.mktemp("jax_cache")
    compile_cache.enable(str(d))
    return d


def test_populates_on_compile(cache_dir):
    # Save/restore the prior value rather than assuming what enable() set:
    # leaving a mutated process-global here would couple later tests in
    # the shard to this one's ordering.
    prior = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        f = jax.jit(lambda x: jnp.tanh(x @ x.T) * 2 + 1)
        f(jnp.ones((64, 64))).block_until_ready()
        entries = list(cache_dir.iterdir())
        assert entries, "compile wrote no cache entries"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prior)


def test_idempotent_and_repoint_warns(cache_dir, tmp_path):
    compile_cache.enable(str(cache_dir))  # same dir: silent no-op
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        compile_cache.enable(str(tmp_path / "other"))
    assert any("already enabled" in str(x.message) for x in w)
    compile_cache.enable("")  # off-switch value: no-op


def test_config_field_roundtrip():
    from locate_tpu.config import get_config

    cfg = get_config("cifar10_32", {"compile_cache": "/tmp/xyz_cache"})
    assert cfg.compile_cache == "/tmp/xyz_cache"
    assert get_config("cifar10_32").compile_cache == ""
