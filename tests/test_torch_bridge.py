"""Cross-framework weight portability (io/torch_bridge.py): pytree <->
torch state_dict round trip, torch-native layout semantics (OIHW kernels
actually drive F.conv2d to the same output as the JAX conv), and full-model
equivalence after a round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from locate_tpu.io.torch_bridge import (
    params_from_state_dict,
    state_dict_from_params,
)
from locate_tpu.models.gan import build_gan


@pytest.fixture(scope="module")
def gan_params(tiny_config):
    gan = build_gan(tiny_config)
    return gan, gan.init(jax.random.PRNGKey(0))


def test_round_trip_bitwise(gan_params):
    _, params = gan_params
    sd = state_dict_from_params(params["generator"])
    back = params_from_state_dict(sd, params["generator"])
    orig = jax.tree.leaves(params["generator"])
    got = jax.tree.leaves(back)
    assert len(orig) == len(got)
    for a, b in zip(orig, got):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_state_dict_names_and_layout(gan_params):
    """Names are dotted paths; 4-D kernels are torch OIHW (out-channels
    first), i.e. transposed from our HWIO."""
    _, params = gan_params
    sd = state_dict_from_params(params["discriminator"])
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    assert "stem.w" in sd
    hwio = np.asarray(params["discriminator"]["stem"]["w"])
    assert sd["stem.w"].shape == (hwio.shape[3], hwio.shape[2],
                                  hwio.shape[0], hwio.shape[1])


def test_kernel_drives_torch_conv(gan_params):
    """The exported kernel, fed to F.conv2d as-is, reproduces the JAX conv:
    pins that the OIHW transpose is real, not just a shape shuffle."""
    _, params = gan_params
    w = params["discriminator"]["stem"]["w"]  # HWIO, 1x1 stem
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, w.shape[2]))
    y_jax = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    sd = state_dict_from_params({"stem": params["discriminator"]["stem"]})
    y_t = F.conv2d(
        torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2),
        sd["stem.w"],
        padding="same",
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y_jax), y_t.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_full_model_forward_after_round_trip(gan_params):
    gan, params = gan_params
    sd = state_dict_from_params(params["generator"])
    back = params_from_state_dict(sd, params["generator"])
    z = gan.sample_latents(jax.random.PRNGKey(1), 4)
    a = gan.generator.apply(params["generator"], z)
    b = gan.generator.apply(back, z)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mismatch_fails_loudly(gan_params):
    _, params = gan_params
    sd = state_dict_from_params(params["generator"])
    sd_missing = dict(sd)
    name = next(iter(sd_missing))
    del sd_missing[name]
    with pytest.raises(ValueError, match="missing"):
        params_from_state_dict(sd_missing, params["generator"])
    sd_extra = dict(sd)
    sd_extra["not.a.leaf"] = torch.zeros(1)
    with pytest.raises(ValueError, match="extra"):
        params_from_state_dict(sd_extra, params["generator"])
    sd_shape = dict(sd)
    sd_shape[name] = torch.zeros((1, 2, 3))
    with pytest.raises(ValueError, match="shape"):
        params_from_state_dict(sd_shape, params["generator"])


def test_torch_save_load_round_trip(gan_params, tmp_path):
    """The dict survives torch.save/torch.load — the actual file a torch
    user hands over or receives."""
    _, params = gan_params
    sd = state_dict_from_params(params["generator"])
    p = str(tmp_path / "g.pt")
    torch.save(sd, p)
    loaded = torch.load(p, weights_only=True)
    back = params_from_state_dict(loaded, params["generator"])
    for a, b in zip(jax.tree.leaves(params["generator"]),
                    jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
