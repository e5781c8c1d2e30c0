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


def test_export_bf16_ema_round_trip(tiny_config, tmp_path):
    """train.ema_dtype=bfloat16 shadows must export to a LOADABLE artifact
    (np.savez writes ml_dtypes bf16 as raw void arrays -> widened to f32)."""
    import jax.numpy as jnp

    from locate_tpu.train.state import create_train_state

    gan = build_gan(tiny_config)
    state = create_train_state(tiny_config, gan, jax.random.PRNGKey(0))
    ema_bf16 = jax.tree.map(
        lambda p: jnp.asarray(p, jnp.bfloat16), state.g_params
    )
    path = export_generator(tiny_config.model, ema_bf16, str(tmp_path / "gen"))
    gen, params = load_generator(path)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, tiny_config.model.latent_dim))
    out = gen.apply(params, z, None)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # widened leaves carry the bf16 VALUES (cast, not garbage)
    leaf_b = jax.tree.leaves(params)[0]
    leaf_ref = np.asarray(jax.tree.leaves(ema_bf16)[0], np.float32)
    np.testing.assert_array_equal(np.asarray(leaf_b), leaf_ref)
