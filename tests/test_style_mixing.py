"""Style mixing (style.mixing_prob, StyleGAN arXiv 1812.04948 §3.1) and
per-layer noise injection (style.noise, §3.2) for the style family:
edge-cut identities, torch-twin parity of the per-layer-w and noise paths,
init identity (strength 0), determinism, and DP equality of the mixed/
noisy train step."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch

from locate_tpu.config import AttentionConfig, ModelConfig, StyleConfig
from locate_tpu.models.gan import build_gan
from locate_tpu.models.generator import build_generator
from locate_tpu.models.style_generator import _const_noise_plane

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


def test_num_ws_and_edge_cuts():
    """cut=num_ws reproduces apply(z1) exactly; cut=0 reproduces apply(z2)
    (the per-layer w plumbing is a pure reindexing)."""
    cfg = _style_model()
    gen = build_generator(cfg)
    assert gen.num_ws == cfg.num_stages * cfg.blocks_per_stage + 1
    params = gen.init(jax.random.PRNGKey(0))
    z1 = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.latent_dim))
    z2 = jax.random.normal(jax.random.PRNGKey(2), (4, cfg.latent_dim))
    full = jnp.full((4,), gen.num_ws, jnp.int32)
    np.testing.assert_allclose(
        np.asarray(gen.apply_mixed(params, z1, z2, full)),
        np.asarray(gen.apply(params, z1)), **TOL)
    zero = jnp.zeros((4,), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(gen.apply_mixed(params, z1, z2, zero)),
        np.asarray(gen.apply(params, z2)), **TOL)


def test_mixed_apply_matches_torch_twin():
    """Mid-crossover mixing vs the literal torch twin fed explicit
    per-layer styles (per-sample crossover points)."""
    cfg = _style_model()
    gen = build_generator(cfg)
    params = gen.init(jax.random.PRNGKey(0))
    n, L = 4, gen.num_ws
    z1 = jax.random.normal(jax.random.PRNGKey(1), (n, cfg.latent_dim))
    z2 = jax.random.normal(jax.random.PRNGKey(2), (n, cfg.latent_dim))
    cut = jnp.asarray([1, 2, L - 1, L], jnp.int32)

    ours = np.asarray(gen.apply_mixed(params, z1, z2, cut))

    tp = tw.to_torch_params(params)
    w1 = tw.style_mapping_torch(tp["mapping"], tw.t(z1), cfg)
    w2 = tw.style_mapping_torch(tp["mapping"], tw.t(z2), cfg)
    cut_t = torch.from_numpy(np.asarray(cut).copy())
    ws = [torch.where((li < cut_t)[:, None], w1, w2) for li in range(L)]
    # route through the twin's synthesis with explicit per-layer styles —
    # feed z1 for the mapping arg (ignored when ws is given)
    ref = tw.style_generator_forward(tp, cfg, tw.t(z1), ws=ws)
    np.testing.assert_allclose(ours, ref.detach().numpy(), **TOL)


def test_noise_strength_zero_is_identity():
    """noise="const"/"random" add a strength scalar initialized to 0 (and
    draw no extra init keys), so the enabled model's apply == the disabled
    model's at init."""
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 16))
    base = build_generator(_style_model())
    p0 = base.init(jax.random.PRNGKey(0))
    for mode in ("const", "random"):
        g = build_generator(_style_model(style=StyleConfig(
            mapping_layers=2, noise=mode)))
        p = g.init(jax.random.PRNGKey(0))
        np.testing.assert_array_equal(
            np.asarray(g.apply(p, z)), np.asarray(base.apply(p0, z)))


def _set_strengths(params, value):
    out = jax.tree_util.tree_map(lambda x: x, params)  # copy structure
    for stage in out["stages"]:
        stage["convs"] = [
            {**c, "noise_strength": jnp.asarray(value, jnp.float32)}
            for c in stage["convs"]
        ]
    return out


def test_noise_random_determinism_and_variation():
    cfg = _style_model(style=StyleConfig(mapping_layers=2, noise="random"))
    gen = build_generator(cfg)
    params = _set_strengths(gen.init(jax.random.PRNGKey(0)), 0.3)
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 16))
    const_out = gen.apply(params, z)  # no rng -> const fallback
    np.testing.assert_array_equal(np.asarray(const_out),
                                  np.asarray(gen.apply(params, z)))
    k = jax.random.PRNGKey(7)
    r1 = gen.apply(params, z, noise_rng=k)
    r2 = gen.apply(params, z, noise_rng=k)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    r3 = gen.apply(params, z, noise_rng=jax.random.PRNGKey(8))
    assert float(jnp.max(jnp.abs(r1 - r3))) > 1e-4
    assert float(jnp.max(jnp.abs(r1 - const_out))) > 1e-4


def test_noise_const_matches_torch_twin():
    """Const-mode noise vs the twin fed the same per-layer planes, fwd +
    z-grad (pins the add-before-activation placement and the strength
    scaling)."""
    cfg = _style_model(style=StyleConfig(mapping_layers=2, noise="const"))
    gen = build_generator(cfg)
    params = _set_strengths(gen.init(jax.random.PRNGKey(0)), 0.25)
    z = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.latent_dim))
    ours, our_gz = jax.value_and_grad(
        lambda zz: jnp.sum(jnp.sin(gen.apply(params, zz)))
    )(z)

    tp = tw.to_torch_params(params)
    res = [4 * 2**i for i in range(cfg.num_stages)]
    planes = [
        torch.from_numpy(np.asarray(_const_noise_plane(li, res[li], res[li])))
        for li in range(gen.num_ws - 1)
    ]
    zt = tw.t(z)
    zt.requires_grad_(True)
    ref = torch.sin(
        tw.style_generator_forward(tp, cfg, zt, noise=planes)
    ).sum()
    ref.backward()
    np.testing.assert_allclose(float(ours), float(ref.detach()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(our_gz), zt.grad.numpy(),
                               rtol=2e-4, atol=2e-5)


def _train_cfg(tiny_config, style_kw, **train_kw):
    cfg = dataclasses.replace(
        tiny_config,
        model=_style_model(style=StyleConfig(mapping_layers=2, **style_kw)),
    )
    if train_kw:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **train_kw))
    return cfg


def _run(cfg, mesh, n_steps=2):
    from locate_tpu.parallel.sharding import (
        make_sharded_train_step,
        place_train_state,
    )
    from locate_tpu.train.state import create_train_state

    gan = build_gan(cfg)
    with mesh:
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        jit_for, sh_for, b_shard = make_sharded_train_step(cfg, gan, mesh)
        state = place_train_state(state, sh_for(state))
        step = jit_for(state)
        batch = jax.device_put(
            {"image": jax.random.uniform(
                jax.random.PRNGKey(1), (8, 16, 16, 3),
                minval=-1.0, maxval=1.0),
             "label": jnp.zeros((8,), jnp.int32)},
            {"image": b_shard, "label": b_shard},
        )
        hist = []
        for _ in range(n_steps):
            state, metrics = step(state, batch)
            hist.append({k: float(v) for k, v in metrics.items()})
    return hist


def test_mixing_noise_train_dp_matches_single_device(tiny_config):
    """The mixed + random-noise style train step: GSPMD 8-device ==
    single device (mixing draws are global-draw+local-slice; the noise
    key is a single global key whose draws GSPMD shards like any other
    in-graph batch tensor), finite, deterministic."""
    from locate_tpu.parallel.mesh import make_mesh, single_device_mesh

    cfg = _train_cfg(tiny_config, dict(mixing_prob=0.7, noise="random"))
    h1 = _run(cfg, single_device_mesh(cfg.parallel))
    h8 = _run(cfg, make_mesh(cfg.parallel))
    for a, b in zip(h1, h8):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=5e-4,
                                       err_msg=k)
    assert all(np.isfinite(list(m.values())).all() for m in h8)
    h8b = _run(cfg, make_mesh(cfg.parallel))
    for a, b in zip(h8, h8b):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_mixing_composes_with_fused_step_and_pl(tiny_config):
    """Mixing + noise under the fused flavor (shared-forward CSE keeps
    compiling) and with path-length reg (PL differentiates the PLAIN
    apply — the documented convention)."""
    from locate_tpu.parallel.mesh import single_device_mesh

    cfg = _train_cfg(tiny_config, dict(mixing_prob=0.9, noise="random"),
                     fused_step=True, pl_gamma=2.0, pl_interval=1)
    h = _run(cfg, single_device_mesh(cfg.parallel))
    assert all(np.isfinite(list(m.values())).all() for m in h)
    assert h[-1]["pl_len"] > 0.0


def test_noise_export_roundtrip(tmp_path):
    """The noise-strength leaves survive export/load; the loaded apply
    (const fallback) is bit-identical."""
    from locate_tpu.io.export import export_generator, load_generator

    cfg = _style_model(style=StyleConfig(mapping_layers=2, noise="const"))
    gen = build_generator(cfg)
    params = _set_strengths(gen.init(jax.random.PRNGKey(0)), 0.1)
    path = export_generator(cfg, params, str(tmp_path / "g.npz"))
    gen2, params2 = load_generator(path)
    assert gen2.config.style.noise == "const"
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
    np.testing.assert_array_equal(
        np.asarray(gen.apply(params, z)), np.asarray(gen2.apply(params2, z)))
