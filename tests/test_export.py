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


def test_export_compiled_roundtrip(tiny_config, tmp_path):
    """The .stablehlo artifact (jax.export, weights baked in) reproduces
    the live generator through bare jax with no model code or weights
    file. Tolerance is float-compilation noise: the deserialized module
    is compiled separately from the live trace, so bitwise equality is
    not guaranteed (measured ~1e-7 max abs diff at fp32)."""
    from locate_tpu.io.export import export_compiled, load_compiled

    gan = build_gan(tiny_config)
    params = gan.init(jax.random.PRNGKey(0))
    path = export_compiled(
        gan.config, params["generator"], str(tmp_path / "gen"), batch=3
    )
    call, sig = load_compiled(path)
    assert sig["batch"] == 3
    assert sig["resolution"] == tiny_config.model.resolution
    z = np.asarray(gan.sample_latents(jax.random.PRNGKey(1), 3), np.float32)
    if tiny_config.model.num_classes:
        labels = np.arange(3, dtype=np.int32) % tiny_config.model.num_classes
        got = call(z, labels)
        want = gan.generator.apply(params["generator"], z, labels)
    else:
        got = call(z)
        want = gan.generator.apply(params["generator"], z)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=1e-5, rtol=1e-5,
    )
