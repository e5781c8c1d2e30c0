"""LocAtE attention block tests: gate math properties, identity-at-init,
linear cost structure, and a torch-CPU golden twin of the full block
(SURVEY.md §5 items 1-2)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from locate_tpu.config import AttentionConfig
from locate_tpu.ops.attention import coord_features, locate_attention, locate_gate


def test_identity_at_init():
    """Zero-init logits + residual gating => block is the identity map."""
    cfg = AttentionConfig(mode="softmax", per_channel=True, pos_features=4, residual=True)
    layer = locate_attention(8, cfg)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 8), jnp.float32)
    y = layer.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6, atol=1e-6)


def test_softmax_gate_mean_one():
    """Residual softmax gate is normalized to spatial mean exactly 1."""
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 5, 3), jnp.float32) * 3
    x = jnp.ones((2, 5, 5, 3), jnp.float32)
    y = locate_gate(x, logits, "softmax", residual=True)
    np.testing.assert_allclose(np.asarray(y.mean(axis=(1, 2))), 1.0, rtol=1e-5, atol=1e-5)


def test_sigmoid_gate_bounded():
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 5, 1), jnp.float32) * 5
    x = jnp.ones((2, 5, 5, 3), jnp.float32)
    y = locate_gate(x, logits, "sigmoid", residual=True)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 2.0


def test_coord_features_shape_and_range():
    pos = coord_features(8, 16, 8)
    assert pos.shape == (8, 16, 8)
    assert float(jnp.abs(pos).max()) <= 1.0 + 1e-6
    # y-features vary along H only, x-features along W only
    assert np.allclose(np.asarray(pos[:, 0, :4]), np.asarray(pos[:, 5, :4]))
    assert np.allclose(np.asarray(pos[0, :, 4:]), np.asarray(pos[3, :, 4:]))


def test_block_matches_torch_twin():
    """Full-block golden test vs an independently-written torch twin."""
    cfg = AttentionConfig(mode="softmax", per_channel=True, pos_features=4, bottleneck=2)
    c = 6
    layer = locate_attention(c, cfg, act="leaky_relu", leaky_slope=0.2)
    params = layer.init(jax.random.PRNGKey(0))
    # randomize the zero-init logit conv so the test is non-trivial
    w2 = jax.random.normal(jax.random.PRNGKey(5), params["to_logits"]["w"].shape) * 0.3
    params = {
        "to_hidden": params["to_hidden"],
        "to_logits": {"w": w2, "b": params["to_logits"]["b"]},
    }
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 7, c), jnp.float32)
    y = np.asarray(layer.apply(params, x))

    # torch twin
    xt = torch.from_numpy(np.asarray(x))
    pos = torch.from_numpy(np.asarray(coord_features(5, 7, 4))).expand(2, 5, 7, 4)
    feats = torch.cat([xt, pos], dim=-1).permute(0, 3, 1, 2)
    w1 = torch.from_numpy(np.asarray(params["to_hidden"]["w"])).permute(3, 2, 0, 1)
    b1 = torch.from_numpy(np.asarray(params["to_hidden"]["b"]))
    h = F.leaky_relu(F.conv2d(feats, w1, b1), 0.2)
    w2t = torch.from_numpy(np.asarray(w2)).permute(3, 2, 0, 1)
    b2 = torch.from_numpy(np.asarray(params["to_logits"]["b"]))
    logits = F.conv2d(h, w2t, b2)  # (N, C, H, W)
    n, cc, hh, ww = logits.shape
    gate = F.softmax(logits.reshape(n, cc, hh * ww), dim=-1).reshape(n, cc, hh, ww)
    gate = gate * (hh * ww)
    y_ref = (xt.permute(0, 3, 1, 2) * gate).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)


def test_grad_flows():
    cfg = AttentionConfig()
    layer = locate_attention(8, cfg)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 8), jnp.float32)

    def loss(p):
        return jnp.sum(layer.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    # hidden conv receives gradient even though logits conv is zero-init
    assert float(jnp.abs(g["to_logits"]["w"]).sum()) > 0
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
