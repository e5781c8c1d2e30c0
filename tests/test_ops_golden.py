"""Golden-numerics unit tests vs a torch-CPU twin (SURVEY.md §5 item 1):
each JAX op's forward (and where cheap, gradient) must match the equivalent
torch op within fp32 tolerance. The torch twins are test fixtures built
here — NOT a port of the reference (the reference mount was empty; these
pin our ops to torch's battle-tested numerics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from locate_tpu.ops.conv import conv2d, dense, downsample_avg, factorized_conv2d, upsample_nearest
from locate_tpu.ops.norm import group_norm, pixel_norm

TOL = dict(rtol=2e-5, atol=2e-5)


def _np(x):
    return np.asarray(x, np.float32)


def torch_conv_nhwc(x_nhwc, w_hwio, b=None, stride=1, padding="same"):
    """Torch conv matching lax.conv_general_dilated NHWC/HWIO semantics."""
    xt = torch.from_numpy(_np(x_nhwc)).permute(0, 3, 1, 2)  # NCHW
    wt = torch.from_numpy(_np(w_hwio)).permute(3, 2, 0, 1)  # OIHW
    kh, kw = w_hwio.shape[0], w_hwio.shape[1]
    if padding == "same":
        # SAME padding for odd/even kernels with stride 1
        ph, pw = (kh - 1), (kw - 1)
        xt = F.pad(xt, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
    bt = torch.from_numpy(_np(b)) if b is not None else None
    yt = F.conv2d(xt, wt, bt, stride=stride)
    return yt.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("kernel", [(3, 3), (1, 3), (3, 1), (1, 1)])
def test_conv2d_matches_torch(kernel):
    key = jax.random.PRNGKey(0)
    layer = conv2d(6, 8, kernel)
    params = layer.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 9, 6), jnp.float32)
    y = layer.apply(params, x)
    y_ref = torch_conv_nhwc(x, params["w"], params["b"])
    np.testing.assert_allclose(_np(y), y_ref, **TOL)


def test_factorized_conv_matches_torch_composition():
    key = jax.random.PRNGKey(0)
    layer = factorized_conv2d(5, 7, kernel_size=3)
    params = layer.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 5), jnp.float32)
    y = layer.apply(params, x)
    mid = torch_conv_nhwc(x, params["row"]["w"])
    y_ref = torch_conv_nhwc(mid, params["col"]["w"], params["col"]["b"])
    np.testing.assert_allclose(_np(y), y_ref, **TOL)


def test_dense_matches_torch():
    layer = dense(12, 5)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 12), jnp.float32)
    y = layer.apply(params, x)
    y_ref = (
        torch.from_numpy(_np(x)) @ torch.from_numpy(_np(params["w"]))
        + torch.from_numpy(_np(params["b"]))
    ).numpy()
    np.testing.assert_allclose(_np(y), y_ref, **TOL)


def test_group_norm_matches_torch():
    layer = group_norm(8, groups=4)
    params = layer.init(jax.random.PRNGKey(0))
    # non-trivial scale/bias
    params = {
        "scale": jax.random.normal(jax.random.PRNGKey(2), (8,)) + 1.0,
        "bias": jax.random.normal(jax.random.PRNGKey(3), (8,)),
    }
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 8), jnp.float32)
    y = layer.apply(params, x)
    xt = torch.from_numpy(_np(x)).permute(0, 3, 1, 2)
    y_ref = F.group_norm(
        xt, 4,
        torch.from_numpy(_np(params["scale"])),
        torch.from_numpy(_np(params["bias"])),
        eps=1e-5,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(y), y_ref, rtol=1e-4, atol=1e-4)


def test_pixel_norm_unit_rms():
    layer = pixel_norm()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 16), jnp.float32) * 3.0
    y = layer.apply((), x)
    rms = jnp.sqrt(jnp.mean(y**2, axis=-1))
    np.testing.assert_allclose(_np(rms), np.ones_like(_np(rms)), rtol=1e-3, atol=1e-3)


def test_upsample_nearest_matches_torch():
    layer = upsample_nearest(2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 3), jnp.float32)
    y = layer.apply((), x)
    xt = torch.from_numpy(_np(x)).permute(0, 3, 1, 2)
    y_ref = F.interpolate(xt, scale_factor=2, mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(y), y_ref, **TOL)


def test_downsample_avg_matches_torch():
    layer = downsample_avg(2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 3), jnp.float32)
    y = layer.apply((), x)
    xt = torch.from_numpy(_np(x)).permute(0, 3, 1, 2)
    y_ref = F.avg_pool2d(xt, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(y), y_ref, **TOL)


def test_conv_grad_matches_torch():
    """Backward check: dL/dw for a conv matches torch autograd."""
    layer = conv2d(4, 4, (3, 3))
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 4), jnp.float32)

    def loss(p):
        return jnp.sum(layer.apply(p, x) ** 2)

    g = jax.grad(loss)(params)

    xt = torch.from_numpy(_np(x)).permute(0, 3, 1, 2)
    wt = torch.from_numpy(_np(params["w"])).permute(3, 2, 0, 1).requires_grad_(True)
    bt = torch.from_numpy(_np(params["b"])).requires_grad_(True)
    yt = F.conv2d(F.pad(xt, (1, 1, 1, 1)), wt, bt)
    (yt**2).sum().backward()
    np.testing.assert_allclose(
        _np(g["w"]), wt.grad.permute(2, 3, 1, 0).numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(_np(g["b"]), bt.grad.numpy(), rtol=1e-3, atol=1e-3)
