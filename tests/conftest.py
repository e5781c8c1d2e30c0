"""Test env: force the CPU backend with 8 fake devices BEFORE jax imports —
the standard fake-backend trick for testing multi-chip DP without a pod
(SURVEY.md §5 item 3). Real-TPU runs (bench.py) don't import this."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects the (remote, slow) emulated-TPU
# backend regardless of the JAX_PLATFORMS env var; the config override
# below wins as long as no backend has initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "fake 8-device CPU mesh failed to initialize"

import pytest  # noqa: E402

from locate_tpu.config import (  # noqa: E402
    AttentionConfig,
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
    get_config,
)


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r4 #4): tests listed in tests/slow_tests.txt
    get the `slow` marker added centrally, so `pytest tests/ -m "not slow"`
    is the fast default tier (<30 min on this host) and the full suite
    stays the pre-snapshot gate. The list is regenerated from a full-suite
    run's --durations output (scripts/update_slow_tier.py); marking in one
    file avoids touching dozens of test modules and keeps the tier
    data-driven."""
    listed = set()
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    if os.path.exists(path):
        with open(path) as fh:
            listed = {
                ln.strip() for ln in fh
                if ln.strip() and not ln.startswith("#")
            }
    if not listed:
        return
    for item in items:
        if item.nodeid in listed:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def tiny_config() -> Config:
    """Smallest end-to-end config: 16x16, thin channels, fp32 (golden tests
    need fp32 numerics; bf16 paths are covered by dtype-specific tests)."""
    return Config(
        name="tiny",
        model=ModelConfig(
            resolution=16,
            base_channels=32,
            max_channels=32,
            min_channels=16,
            latent_dim=16,
            attention=AttentionConfig(pos_features=4, bottleneck=2),
        ),
        data=DataConfig(dataset="synthetic", resolution=16),
        train=TrainConfig(
            global_batch=8,
            compute_dtype="float32",
            log_every=2,
            sample_every=0,
            checkpoint_every=0,
            ema_decay=0.99,
        ),
        workdir="/tmp/locate_tpu_test",
    )
