"""Skip-RGB generator topology (model.g_rgb="skip", StyleGAN2 arXiv
1912.04958 §4.1 / MSG-GAN): per-stage linear RGB heads summed into a
running upsampled image, tanh once at the end. Equivalence to the "last"
head when earlier contributions are zero, per-stage gradient paths, and
train-step/DP integration."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locate_tpu.config import ModelConfig
from locate_tpu.models.gan import build_gan
from locate_tpu.models.generator import build_generator
from locate_tpu.parallel.mesh import make_mesh, single_device_mesh
from locate_tpu.parallel.sharding import (
    make_sharded_train_step,
    place_train_state,
)
from locate_tpu.train.state import create_train_state


def _mcfg(tiny_config, **kw):
    return dataclasses.replace(tiny_config.model, **kw)


def test_config_validation():
    with pytest.raises(ValueError):
        ModelConfig(g_rgb="both")
    ModelConfig(g_rgb="skip")  # fine, both families
    ModelConfig(arch="style", g_rgb="skip")


def test_skip_rgb_shapes_and_range(tiny_config):
    cfg = _mcfg(tiny_config, g_rgb="skip")
    gen = build_generator(cfg, jnp.float32)
    params = gen.init(jax.random.PRNGKey(0))
    assert "rgb" in params and "head" not in params
    assert len(params["rgb"]) == cfg.num_stages
    z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.latent_dim))
    img = gen.apply(params, z)
    assert img.shape == (4, cfg.resolution, cfg.resolution, 3)
    assert float(jnp.max(jnp.abs(img))) <= 1.0
    assert np.isfinite(np.asarray(img)).all()


def test_skip_zero_heads_equals_last_head(tiny_config):
    """With every rgb head except the top one zeroed, the skip generator
    must equal the "last" generator whose head carries the top stage's rgb
    params — the two topologies share the exact op chain at the top."""
    cfg_skip = _mcfg(tiny_config, g_rgb="skip")
    cfg_last = _mcfg(tiny_config, g_rgb="last")
    gen_s = build_generator(cfg_skip, jnp.float32)
    gen_l = build_generator(cfg_last, jnp.float32)
    p = gen_s.init(jax.random.PRNGKey(0))
    zeroed = [
        jax.tree.map(jnp.zeros_like, hp) if i < len(p["rgb"]) - 1 else hp
        for i, hp in enumerate(p["rgb"])
    ]
    p_skip = {**p, "rgb": zeroed}
    p_last = {"seed": p["seed"], "trunk": p["trunk"], "head": p["rgb"][-1]}
    z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg_skip.latent_dim))
    np.testing.assert_allclose(
        np.asarray(gen_s.apply(p_skip, z)),
        np.asarray(gen_l.apply(p_last, z)),
        rtol=1e-6, atol=1e-6,
    )


def test_skip_rgb_every_stage_gets_image_gradient(tiny_config):
    """The topology's point: EVERY stage's rgb head receives gradient
    directly from the image (no attenuation through later stages)."""
    cfg = _mcfg(tiny_config, g_rgb="skip")
    gen = build_generator(cfg, jnp.float32)
    params = gen.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))

    def loss(p):
        return jnp.mean(gen.apply(p, z) ** 2)

    grads = jax.grad(loss)(params)
    for i, hp in enumerate(grads["rgb"]):
        norm = float(
            jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(hp)))
        )
        assert norm > 0.0, f"stage {i} rgb head got no gradient"


def test_skip_rgb_train_step_dp_matches_single_device(tiny_config):
    cfg = dataclasses.replace(
        tiny_config, model=_mcfg(tiny_config, g_rgb="skip")
    )

    def run(mesh):
        gan = build_gan(cfg)
        with mesh:
            state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
            jit_for, sh_for, b_shard = make_sharded_train_step(cfg, gan, mesh)
            state = place_train_state(state, sh_for(state))
            step = jit_for(state)
            img = jax.random.uniform(
                jax.random.PRNGKey(1),
                (cfg.train.global_batch, cfg.model.resolution,
                 cfg.model.resolution, 3), minval=-1.0, maxval=1.0,
            )
            batch = jax.device_put(
                {"image": img, "label": jnp.zeros(
                    (cfg.train.global_batch,), jnp.int32)},
                {"image": b_shard, "label": b_shard},
            )
            hist = []
            for _ in range(2):
                state, metrics = step(state, batch)
                hist.append({k: float(v) for k, v in metrics.items()})
        return hist

    h1 = run(single_device_mesh(cfg.parallel))
    h8 = run(make_mesh(cfg.parallel))
    for a, b in zip(h1, h8):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=5e-4,
                                       err_msg=k)
    assert all(np.isfinite(list(h.values())).all() for h in h8)


# ---------------------------------------------------------------------------
# style family (per-stage STYLED to-RGB — StyleGAN2's actual skip config)
# ---------------------------------------------------------------------------


def _style_cfg(tiny_config, **kw):
    return _mcfg(tiny_config, arch="style", g_rgb="skip", **kw)


def test_style_skip_num_ws_and_shapes(tiny_config):
    cfg = _style_cfg(tiny_config)
    gen = build_generator(cfg, jnp.float32)
    # depth order: each stage's convs then its to-RGB
    assert gen.num_ws == cfg.num_stages * (cfg.blocks_per_stage + 1)
    params = gen.init(jax.random.PRNGKey(0))
    assert isinstance(params["rgb"], list)
    assert len(params["rgb"]) == cfg.num_stages
    z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.latent_dim))
    img = gen.apply(params, z)
    assert img.shape == (4, cfg.resolution, cfg.resolution, 3)
    assert float(jnp.max(jnp.abs(img))) <= 1.0
    assert np.isfinite(np.asarray(img)).all()


def test_style_skip_zero_heads_equals_last(tiny_config):
    """Zeroed all-but-top to-RGBs == the 'last' style generator carrying
    the top head's params (mapping/const/stages draws are identical —
    same init key stream)."""
    cfg_s = _style_cfg(tiny_config)
    cfg_l = _mcfg(tiny_config, arch="style", g_rgb="last")
    gen_s = build_generator(cfg_s, jnp.float32)
    gen_l = build_generator(cfg_l, jnp.float32)
    p = gen_s.init(jax.random.PRNGKey(0))
    zeroed = [
        jax.tree.map(jnp.zeros_like, hp) if i < len(p["rgb"]) - 1 else hp
        for i, hp in enumerate(p["rgb"])
    ]
    p_skip = {**p, "rgb": zeroed}
    p_last = {**p, "rgb": p["rgb"][-1]}
    z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg_s.latent_dim))
    np.testing.assert_allclose(
        np.asarray(gen_s.apply(p_skip, z)),
        np.asarray(gen_l.apply(p_last, z)),
        rtol=1e-6, atol=1e-6,
    )


def test_style_skip_gradients_and_mixing_identity(tiny_config):
    cfg = _style_cfg(tiny_config)
    gen = build_generator(cfg, jnp.float32)
    params = gen.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))

    def loss(p):
        return jnp.mean(gen.apply(p, z) ** 2)

    grads = jax.grad(loss)(params)
    for i, hp in enumerate(grads["rgb"]):
        norm = float(
            jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(hp)))
        )
        assert norm > 0.0, f"stage {i} styled to-RGB got no gradient"
    # mixing with cut == num_ws must be the plain apply bit-for-bit
    z2 = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.latent_dim))
    cut = jnp.full((2,), gen.num_ws, jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(gen.apply_mixed(params, z, z2, cut)),
        np.asarray(gen.apply(params, z)),
    )
    # a crossover INSIDE the to-RGB range must change the output (the
    # per-stage heads are genuinely styled)
    cut1 = jnp.ones((2,), jnp.int32)
    assert not np.array_equal(
        np.asarray(gen.apply_mixed(params, z, z2, cut1)),
        np.asarray(gen.apply(params, z)),
    )


def test_style_skip_train_step_runs(tiny_config):
    cfg = dataclasses.replace(tiny_config, model=_style_cfg(tiny_config))
    gan = build_gan(cfg)
    mesh = single_device_mesh(cfg.parallel)
    with mesh:
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        jit_for, sh_for, b_shard = make_sharded_train_step(cfg, gan, mesh)
        state = place_train_state(state, sh_for(state))
        step = jit_for(state)
        img = jax.random.uniform(
            jax.random.PRNGKey(1),
            (cfg.train.global_batch, cfg.model.resolution,
             cfg.model.resolution, 3), minval=-1.0, maxval=1.0,
        )
        batch = jax.device_put(
            {"image": img, "label": jnp.zeros(
                (cfg.train.global_batch,), jnp.int32)},
            {"image": b_shard, "label": b_shard},
        )
        for _ in range(2):
            state, metrics = step(state, batch)
        assert np.isfinite([float(v) for v in metrics.values()]).all()


def test_skip_rgb_ema_export_roundtrip(tiny_config, tmp_path):
    """The skip pytree must ride the standard subsystems: export artifact
    round-trips bit-exactly."""
    from locate_tpu.io.export import export_generator, load_generator

    cfg = dataclasses.replace(
        tiny_config, model=_mcfg(tiny_config, g_rgb="skip")
    )
    gan = build_gan(cfg)
    params = gan.generator.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "g_skip")
    export_generator(cfg.model, params, path)
    gen2, params2 = load_generator(path)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.model.latent_dim))
    np.testing.assert_array_equal(
        np.asarray(gan.generator.apply(params, z)),
        np.asarray(gen2.apply(params2, z)),
    )
