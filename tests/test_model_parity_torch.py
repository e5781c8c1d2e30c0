"""End-to-end cross-framework parity (SURVEY.md §5 item 1, the offline
stand-in for "FID parity vs the PyTorch reference"): with identical
weights, latents and data, the full JAX generator/discriminator, the GAN
losses, and their gradients must match the torch twin within fp32
tolerance. Per-op golden tests pin the pieces; this pins the COMPOSITION
(layer ordering, padding, residual scaling, init/layout conventions)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch

from locate_tpu.config import AttentionConfig, ModelConfig
from locate_tpu.models.discriminator import build_discriminator
from locate_tpu.models.generator import build_generator
from locate_tpu.objectives.losses import d_nonsat_loss, g_nonsat_loss

import torch_twin as tw


def model_cfg(**kw):
    base = dict(
        resolution=16,
        base_channels=32,
        max_channels=32,
        min_channels=16,
        latent_dim=12,
        attention=AttentionConfig(pos_features=4, bottleneck=2),
    )
    base.update(kw)
    return ModelConfig(**base)


def randomize_zero_init(params, key):
    """Fill zero-init leaves (attention logits convs, class projections)
    with noise so parity is checked on non-trivial paths."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = [
        jnp.where(jnp.all(l == 0), jax.random.normal(k, l.shape) * 0.2, l)
        if l.ndim > 0
        else l
        for l, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, out)


def test_generator_forward_parity():
    for cfg in (
        model_cfg(),
        model_cfg(blocks_per_stage=2),
        model_cfg(attention=AttentionConfig(mode="sigmoid", pos_features=4)),
        model_cfg(num_classes=3, class_embed_dim=6),
        model_cfg(factorized=False),
        model_cfg(norm="pixel"),
    ):
        if cfg.norm == "pixel":
            continue  # twin implements the default group norm only
        g = build_generator(cfg)
        params = randomize_zero_init(g.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(5))
        z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim), jnp.float32)
        labels = jnp.array([0, 2]) if cfg.num_classes else None
        ours = np.asarray(g.apply(params, z, labels))
        tp = tw.to_torch_params(jax.device_get(params))
        tl = torch.tensor([0, 2]) if cfg.num_classes else None
        theirs = tw.generator_forward(tp, cfg, tw.t(z), tl).detach().numpy()
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_discriminator_forward_parity():
    for cfg in (model_cfg(), model_cfg(num_classes=3, class_embed_dim=6)):
        d = build_discriminator(cfg)
        params = randomize_zero_init(d.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(6))
        x = jax.random.uniform(
            jax.random.PRNGKey(1), (2, 16, 16, 3), minval=-1.0, maxval=1.0
        )
        labels = jnp.array([1, 0]) if cfg.num_classes else None
        ours = np.asarray(d.apply(params, x, labels))
        tp = tw.to_torch_params(jax.device_get(params))
        tl = torch.tensor([1, 0]) if cfg.num_classes else None
        theirs = tw.discriminator_forward(tp, cfg, tw.t(x), tl).detach().numpy()
        np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_full_gan_losses_and_grads_parity():
    """The complete D-loss and G-loss (both nets composed) and their
    gradients w.r.t. every parameter match torch autograd."""
    cfg = model_cfg()
    g = build_generator(cfg)
    d = build_discriminator(cfg)
    gp = randomize_zero_init(g.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(7))
    dp = randomize_zero_init(d.init(jax.random.PRNGKey(1)), jax.random.PRNGKey(8))
    z = jax.random.normal(jax.random.PRNGKey(2), (4, cfg.latent_dim), jnp.float32)
    real = jax.random.uniform(
        jax.random.PRNGKey(3), (4, 16, 16, 3), minval=-1.0, maxval=1.0
    )

    def d_loss_fn(dp_):
        fake = jax.lax.stop_gradient(g.apply(gp, z))
        return d_nonsat_loss(d.apply(dp_, real), d.apply(dp_, fake))

    def g_loss_fn(gp_):
        return g_nonsat_loss(d.apply(dp, g.apply(gp_, z)))

    (d_loss, d_grads) = jax.value_and_grad(d_loss_fn)(dp)
    (g_loss, g_grads) = jax.value_and_grad(g_loss_fn)(gp)

    # torch side
    tgp = tw.to_torch_params(jax.device_get(gp))
    tdp = tw.to_torch_params(jax.device_get(dp))
    tz, treal = tw.t(z), tw.t(real)
    fake_t = tw.generator_forward(tgp, cfg, tz).detach()
    d_loss_t = (
        torch.nn.functional.softplus(-tw.discriminator_forward(tdp, cfg, treal)).mean()
        + torch.nn.functional.softplus(tw.discriminator_forward(tdp, cfg, fake_t)).mean()
    )
    d_loss_t.backward()
    np.testing.assert_allclose(float(d_loss), float(d_loss_t), rtol=1e-4)
    d_grads_t = _snapshot_and_clear_grads(tdp)

    fake_live = tw.generator_forward(tgp, cfg, tz)
    g_loss_t = torch.nn.functional.softplus(
        -tw.discriminator_forward(tdp, cfg, fake_live)
    ).mean()
    g_loss_t.backward()  # tdp grads now hold g-loss leakage; compare tgp only
    np.testing.assert_allclose(float(g_loss), float(g_loss_t), rtol=1e-4)

    # gradient parity, every leaf
    def check(jax_tree, torch_tree, path="", use_grad_attr=True):
        if isinstance(jax_tree, dict):
            for k in jax_tree:
                check(jax_tree[k], torch_tree[k], f"{path}/{k}", use_grad_attr)
        elif isinstance(jax_tree, (list, tuple)):
            for i, v in enumerate(jax_tree):
                check(v, torch_tree[i], f"{path}/{i}", use_grad_attr)
        elif jax_tree is None or (
            hasattr(jax_tree, "__len__") and len(jax_tree) == 0
        ):
            return
        else:
            theirs = torch_tree.grad if use_grad_attr else torch_tree
            ours = np.asarray(jax_tree)
            theirs = (
                np.zeros_like(ours)
                if theirs is None
                else np.asarray(
                    theirs.detach().numpy() if hasattr(theirs, "detach") else theirs
                )
            )
            np.testing.assert_allclose(
                ours, theirs, rtol=2e-3, atol=2e-4,
                err_msg=f"grad mismatch at {path}",
            )

    check(jax.device_get(d_grads), d_grads_t, use_grad_attr=False)
    check(jax.device_get(g_grads), tgp)


def _snapshot_and_clear_grads(torch_tree):
    import torch as _torch

    if isinstance(torch_tree, dict):
        return {k: _snapshot_and_clear_grads(v) for k, v in torch_tree.items()}
    if isinstance(torch_tree, (list, tuple)):
        return [_snapshot_and_clear_grads(v) for v in torch_tree]
    if torch_tree is None or not isinstance(torch_tree, _torch.Tensor):
        return torch_tree
    g = None if torch_tree.grad is None else torch_tree.grad.detach().numpy().copy()
    torch_tree.grad = None
    return g
