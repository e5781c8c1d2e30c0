"""Serving-export tests: exported generator reproduces the training
generator bit-for-bit through the portable .npz artifact."""

import numpy as np
import jax

from locate_tpu.io.export import export_generator, load_generator
from locate_tpu.models.gan import build_gan


def test_export_roundtrip(tiny_config, tmp_path):
    gan = build_gan(tiny_config)
    params = gan.init(jax.random.PRNGKey(0))
    path = export_generator(
        gan.config, params["generator"], str(tmp_path / "gen")
    )
    gen2, params2 = load_generator(path)
    z = gan.sample_latents(jax.random.PRNGKey(1), 3)
    a = gan.generator.apply(params["generator"], z)
    b = gen2.apply(params2, z.astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)
    )
    assert gen2.config.resolution == tiny_config.model.resolution
