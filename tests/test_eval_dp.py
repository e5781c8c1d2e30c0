"""Data-parallel evaluation (evaluate_generator(mesh=...), eval --dp):
the mesh path must reproduce the single-device scores (same latent key
scheme through ShardedSampler, sharded extractor = same math under GSPMD),
pad/trim correctness for non-divisible batches, and the in-training eval
wiring."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec

from locate_tpu.config import ParallelConfig
from locate_tpu.io.fid import RandomConvFeatures, evaluate_generator
from locate_tpu.models.gan import build_gan
from locate_tpu.parallel.mesh import make_mesh


def test_sharded_extractor_matches_unsharded():
    mesh = make_mesh(ParallelConfig())
    shard = NamedSharding(mesh, PartitionSpec("data"))
    rng = np.random.default_rng(0)
    # 13 deliberately NOT divisible by 8: exercises the pad-and-trim path
    u8 = rng.integers(0, 256, (13, 16, 16, 3), np.uint8)
    plain = RandomConvFeatures()(u8)
    sharded = RandomConvFeatures(sharding=shard)(u8)
    assert sharded.shape == plain.shape
    np.testing.assert_allclose(sharded, plain, rtol=1e-5, atol=1e-5)


def test_eval_mesh_matches_single_device(tiny_config):
    from locate_tpu.data.datasets import make_dataset

    gan = build_gan(tiny_config)
    g_params = gan.generator.init(jax.random.PRNGKey(0))
    ds = make_dataset(tiny_config.data)
    kw = dict(n_samples=64, batch=32, seed=3, prdc_k=3)
    r1 = evaluate_generator(gan, g_params, ds, **kw)
    r8 = evaluate_generator(gan, g_params, ds, mesh=make_mesh(ParallelConfig()),
                            **kw)
    # identical latent streams (batch divisible by the mesh) + identical
    # extractor math -> scores agree to compile-level float noise
    np.testing.assert_allclose(r8["fid"], r1["fid"], rtol=1e-3)
    np.testing.assert_allclose(r8["kid"], r1["kid"], rtol=1e-2, atol=1e-4)
    for k in ("precision", "recall", "density", "coverage"):
        np.testing.assert_allclose(r8[k], r1[k], rtol=1e-3, atol=1e-6)


def test_loop_eval_uses_mesh(tiny_config, tmp_path):
    """train() with eval_every on an 8-device mesh: the eval runs (scores
    finite) through the mesh path — the wiring smoke for a pod."""
    from locate_tpu.train.loop import train

    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, log_every=2, sample_every=0,
            checkpoint_every=0, eval_every=2, eval_samples=32,
            keep_best=False,
        ),
        parallel=ParallelConfig(data_parallel=8),
        workdir=str(tmp_path),
    )
    seen = []
    train(cfg, total_steps=2, resume=False,
          hooks={"on_eval": lambda step, s: seen.append(s)})
    assert len(seen) == 1
    assert np.isfinite(seen[0]["fid"]) and np.isfinite(seen[0]["kid"])
