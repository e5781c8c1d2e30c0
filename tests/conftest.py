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
