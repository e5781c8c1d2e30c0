"""Style generator family (model.arch="style", models/style_generator.py —
StyleGAN2 arXiv 1912.04958): the modulated conv's input-scale/output-demod
form vs the paper's LITERAL per-sample-weight grouped conv (torch twin),
full-generator torch-golden parity, train-step integration (incl. the
path-length reg it pairs with), and DP == single-device."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from locate_tpu.config import AttentionConfig, ModelConfig, StyleConfig
from locate_tpu.models.gan import build_gan
from locate_tpu.models.generator import build_generator
from locate_tpu.models.style_generator import (
    mapping_apply,
    modulated_conv2d,
    modulated_conv2d_init,
)
from locate_tpu.ops.activations import make_act

import torch_twin as tw

TOL = dict(rtol=2e-5, atol=2e-5)


def _style_model(**kw):
    base = dict(
        arch="style",
        resolution=16,
        base_channels=32,
        max_channels=32,
        min_channels=16,
        latent_dim=16,
        style=StyleConfig(mapping_layers=2),
        attention=AttentionConfig(pos_features=4, bottleneck=2),
    )
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.parametrize("demod", [True, False])
def test_modulated_conv_matches_torch_literal(demod):
    """Our MXU-friendly form (ONE shared-weight conv + two elementwise
    scales) == the paper's per-sample-weight grouped conv, fwd and grads."""
    key = jax.random.PRNGKey(0)
    params = modulated_conv2d_init(key, w_dim=12, cin=8, cout=16, kernel=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 6, 8), jnp.float32)
    wlat = jax.random.normal(jax.random.PRNGKey(2), (4, 12), jnp.float32)

    def loss(p, xx, ww):
        return jnp.sum(jnp.sin(modulated_conv2d(p, xx, ww, demodulate=demod)))

    ours, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(params, x, wlat)

    tp = tw.to_torch_params(params)
    xt, wt = tw.t(x), tw.t(wlat)
    xt.requires_grad_(True)
    wt.requires_grad_(True)
    lt = torch.sin(tw.modulated_conv_torch(tp, xt, wt, demodulate=demod)).sum()
    lt.backward()

    np.testing.assert_allclose(float(ours), float(lt.detach()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads[1]), xt.grad.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(grads[2]), wt.grad.numpy(), **TOL)
    np.testing.assert_allclose(
        np.asarray(grads[0]["w"]), tp["w"].grad.numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(grads[0]["affine"]["w"]),
        tp["affine"]["w"].grad.numpy(), rtol=2e-4, atol=2e-5,
    )


def test_mapping_matches_torch():
    cfg = _style_model()
    gen = build_generator(cfg)
    params = gen.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(3), (5, cfg.latent_dim))
    act = make_act(cfg.act, cfg.leaky_slope)
    act_fn = lambda x: act.apply((), x) * jnp.sqrt(2.0).astype(x.dtype)
    ours = mapping_apply(params["mapping"], z, cfg, act_fn)
    tp = tw.to_torch_params(params["mapping"])
    ref = tw.style_mapping_torch(tp, tw.t(z), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), **TOL)


@pytest.mark.parametrize("conditional", [False, True])
def test_style_generator_matches_torch_twin(conditional):
    """Full style generator (mapping + const + styled stages + attention +
    styled to-RGB) vs the literal-formulation torch twin, fwd + z-grad."""
    cfg = _style_model(
        num_classes=5 if conditional else 0,
        class_embed_dim=8 if conditional else 128,
    )
    gen = build_generator(cfg)
    params = gen.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.latent_dim))
    labels = jnp.asarray([0, 2, 4, 1]) if conditional else None

    ours, our_gz = jax.value_and_grad(
        lambda zz: jnp.sum(jnp.sin(gen.apply(params, zz, labels)))
    )(z)

    tp = tw.to_torch_params(params)
    zt = tw.t(z)
    zt.requires_grad_(True)
    tl = torch.from_numpy(np.asarray(labels).copy()) if conditional else None
    yt = tw.style_generator_forward(tp, cfg, zt, tl)
    lt = torch.sin(yt).sum()
    lt.backward()
    np.testing.assert_allclose(float(ours), float(lt.detach()), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(our_gz), zt.grad.numpy(), rtol=2e-4, atol=2e-5
    )


def test_style_demod_controls_output_variance():
    """Demodulation is the AdaIN replacement: with it, scaling a style's
    magnitude barely changes output scale; without it, output scales
    linearly. Pins that the demod term actually normalizes."""
    params = modulated_conv2d_init(
        jax.random.PRNGKey(0), w_dim=8, cin=16, cout=16, kernel=3
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    w1 = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    w10 = w1 * 10.0
    std = lambda y: float(jnp.std(y))
    demod_ratio = std(modulated_conv2d(params, x, w10)) / std(
        modulated_conv2d(params, x, w1)
    )
    raw_ratio = std(
        modulated_conv2d(params, x, w10, demodulate=False)
    ) / std(modulated_conv2d(params, x, w1, demodulate=False))
    assert demod_ratio < 2.0 < raw_ratio


def _style_config(tiny_config, **model_kw):
    return dataclasses.replace(
        tiny_config, model=_style_model(**model_kw)
    )


def test_style_gan_trains(tiny_config):
    """One jitted alternating step with a style G + shared D: finite
    losses, generator params move (including the mapping and const)."""
    from locate_tpu.train.state import create_train_state
    from locate_tpu.train.step import make_train_step

    cfg = _style_config(tiny_config)
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = {
        "image": jax.random.uniform(
            jax.random.PRNGKey(1), (8, 16, 16, 3), minval=-1.0, maxval=1.0
        ),
        "label": jnp.zeros((8,), jnp.int32),
    }
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    for part in ("mapping", "const", "stages", "rgb"):
        moved = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.g_params[part], new_state.g_params[part],
        )
        assert max(jax.tree.leaves(moved)) > 0.0, part


def test_style_with_path_length_reg(tiny_config):
    """PL reg (StyleGAN2's own regularizer) through the style G: the
    penalty's second-order graph compiles and the pl_mean baseline moves."""
    from locate_tpu.train.state import create_train_state
    from locate_tpu.train.step import make_train_step

    cfg = _style_config(tiny_config)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, pl_gamma=2.0, pl_interval=1)
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = {
        "image": jax.random.uniform(
            jax.random.PRNGKey(1), (8, 16, 16, 3), minval=-1.0, maxval=1.0
        ),
        "label": jnp.zeros((8,), jnp.int32),
    }
    state, m1 = step(state, batch)
    state, m2 = step(state, batch)
    assert np.isfinite(float(m2["g_loss"]))
    assert float(state.pl_mean) > 0.0  # baseline tracked a real path length


def test_style_dp_matches_single_device(tiny_config):
    """GSPMD 8-device DP == single device for the style family (the const
    broadcast, per-sample styles, and demod are all batch-pointwise)."""
    from locate_tpu.parallel.mesh import make_mesh, single_device_mesh
    from locate_tpu.parallel.sharding import (
        make_sharded_train_step,
        place_train_state,
    )
    from locate_tpu.train.state import create_train_state

    cfg = _style_config(tiny_config)

    def run(mesh):
        gan = build_gan(cfg)
        with mesh:
            state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
            jit_for, shardings_for, b_shard = make_sharded_train_step(
                cfg, gan, mesh
            )
            state = place_train_state(state, shardings_for(state))
            step = jit_for(state)
            batch = jax.device_put(
                {
                    "image": jax.random.uniform(
                        jax.random.PRNGKey(1), (8, 16, 16, 3),
                        minval=-1.0, maxval=1.0,
                    ),
                    "label": jnp.zeros((8,), jnp.int32),
                },
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


def test_style_ema_sampling_checkpoint_roundtrip(tiny_config, tmp_path):
    """The style params pytree flows through EMA + orbax save/restore
    bit-exactly (the Generator-contract guarantee the family relies on)."""
    from locate_tpu.io.checkpoint import CheckpointManager
    from locate_tpu.train.state import create_train_state

    cfg = _style_config(tiny_config)
    cfg = dataclasses.replace(cfg, workdir=str(tmp_path))
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=1)
    mgr.save(state)
    mgr.wait()
    restored = mgr.restore(state)
    mgr.close()
    for a, b in zip(jax.tree.leaves(state.g_params),
                    jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_style_export_roundtrip(tmp_path):
    """export/load of a style generator (config JSON carries arch + the
    StyleConfig sub-tree; params flatten/unflatten through the new pytree)."""
    from locate_tpu.io.export import export_generator, load_generator

    cfg = _style_model()
    gen = build_generator(cfg)
    params = gen.init(jax.random.PRNGKey(0))
    path = export_generator(cfg, params, str(tmp_path / "g.npz"))
    gen2, params2 = load_generator(path)
    assert gen2.config.arch == "style"
    assert gen2.config.style.mapping_layers == cfg.style.mapping_layers
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
    np.testing.assert_array_equal(
        np.asarray(gen.apply(params, z)), np.asarray(gen2.apply(params2, z))
    )


def test_w_space_truncation():
    """psi=0 collapses every sample to the mean-w image; psi=1 equals the
    untruncated apply; generate_samples wires it (and rejects the locate
    family)."""
    from locate_tpu.models.style_generator import apply_truncated, w_average

    cfg = _style_model()
    gen = build_generator(cfg)
    params = gen.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.latent_dim))
    w_avg = w_average(cfg, params, jax.random.PRNGKey(2), n=512)

    collapsed = apply_truncated(cfg, params, z, psi=0.0, w_avg=w_avg)
    np.testing.assert_allclose(
        np.asarray(collapsed[0]), np.asarray(collapsed[1]), atol=1e-6
    )
    full = apply_truncated(cfg, params, z, psi=1.0, w_avg=w_avg)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(gen.apply(params, z)), atol=1e-5
    )
    # variety shrinks monotonically-ish with psi
    spread = lambda y: float(jnp.std(y, axis=0).mean())
    assert spread(collapsed) < 1e-6 < spread(
        apply_truncated(cfg, params, z, psi=0.5, w_avg=w_avg)
    ) < spread(full) + 1e-6


def test_generate_samples_truncation_psi(tiny_config):
    from locate_tpu.io.sampling import generate_samples

    cfg = _style_config(tiny_config)
    gan = build_gan(cfg)
    params = gan.init(jax.random.PRNGKey(0))
    imgs = generate_samples(
        gan, params["generator"], jax.random.PRNGKey(1), 4,
        truncation_psi=0.7,
    )
    assert imgs.shape == (4, 16, 16, 3) and imgs.dtype == np.uint8

    gan_locate = build_gan(tiny_config)
    p2 = gan_locate.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        generate_samples(
            gan_locate, p2["generator"], jax.random.PRNGKey(1), 4,
            truncation_psi=0.7,
        )


def test_arch_validation():
    with pytest.raises(ValueError):
        ModelConfig(arch="nope")
    with pytest.raises(ValueError):
        StyleConfig(mapping_layers=0)
