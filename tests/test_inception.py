"""InceptionV3 pool3 graph vs the PyTorch twin (VERDICT r1 missing #2):
pins the JAX architecture, the converter's BN folding, the FID-variant
pooling patches, the resize protocol, and the .npz plug-in dispatch —
everything except the pretrained weights themselves (network-blocked;
scripts/convert_inception.py runs where network exists)."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "scripts")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp

from convert_inception import fold_state_dict
from torch_inception import random_twin

from locate_tpu.io.inception import (
    FORMAT,
    conv_specs,
    make_feature_fn,
    pool3_features,
    preprocess,
    random_params,
)


def _jax_params(folded):
    return {
        spec[0]: {
            "w": jnp.asarray(folded[f"{spec[0]}.w"]),
            "b": jnp.asarray(folded[f"{spec[0]}.b"]),
        }
        for spec in conv_specs()
    }


# 75 is the smallest input that survives all stride reductions (Mixed_7x
# sees 1x1); it exercises every conv/pool while keeping the CPU twin fast.
SIZE = 75


@pytest.mark.parametrize("variant", ["torchvision", "fid"])
def test_pool3_matches_torch_twin(variant):
    twin = random_twin(variant, seed=3)
    folded = fold_state_dict(twin.state_dict(), variant)
    params = _jax_params(folded)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, SIZE, SIZE, 3)).astype(np.float32)

    got = np.asarray(pool3_features(params, jnp.asarray(x), variant))
    with torch.no_grad():
        want = twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_variant_pooling_differs():
    """The fid-variant pooling patches actually change the output (guards
    against the variant flag being silently ignored)."""
    params = random_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, SIZE, SIZE, 3))
    a = pool3_features(params, x, "torchvision")
    b = pool3_features(params, x, "fid")
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_preprocess_matches_torch_interpolate():
    """uint8 -> [0,1] -> bilinear 299 (align_corners=False, no antialias)
    -> normalize, vs the exact pytorch-fid preprocessing."""
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (3, 64, 48, 3), np.uint8)
    mean = np.asarray([0.5, 0.5, 0.5], np.float32)
    std = np.asarray([0.5, 0.5, 0.5], np.float32)
    got = np.asarray(preprocess(jnp.asarray(u8), mean, std, size=299))

    t = torch.from_numpy(u8.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
    t = torch.nn.functional.interpolate(
        t, size=(299, 299), mode="bilinear", align_corners=False
    )
    want = ((t - 0.5) / 0.5).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_npz_roundtrip_and_extractor_dispatch(tmp_path):
    """fold -> savez -> NpzFeatureExtractor auto-detects the inception
    format and produces (N, 2048) features through the full FID protocol
    (resize included); grayscale is broadcast to RGB."""
    from locate_tpu.io.fid import NpzFeatureExtractor

    twin = random_twin("fid", seed=7)
    folded = fold_state_dict(twin.state_dict(), "fid")
    path = str(tmp_path / "inception_test.npz")
    np.savez(path, **folded)

    ex = NpzFeatureExtractor(path)
    assert ex.cache_token == f"inception_v3:{path}"
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (2, 32, 32, 3), np.uint8)
    feats = ex(u8)
    assert feats.shape == (2, 2048) and feats.dtype == np.float32

    # full-protocol equality vs the twin: resize to 299 + normalize + pool3
    t = torch.from_numpy(u8.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
    t = torch.nn.functional.interpolate(
        t, size=(299, 299), mode="bilinear", align_corners=False
    )
    with torch.no_grad():
        want = twin((t - 0.5) / 0.5).numpy()
    np.testing.assert_allclose(feats, want, rtol=2e-3, atol=2e-4)

    gray = rng.integers(0, 256, (2, 32, 32, 1), np.uint8)
    assert ex(gray).shape == (2, 2048)


def test_npz_unknown_format_rejected(tmp_path):
    from locate_tpu.io.fid import NpzFeatureExtractor

    path = str(tmp_path / "bad.npz")
    np.savez(path, format=np.asarray("mystery/v9"), w0=np.zeros((3, 3, 3, 8)))
    with pytest.raises(ValueError, match="mystery"):
        NpzFeatureExtractor(path)


def test_fold_rejects_wrong_shapes():
    twin = random_twin(seed=0)
    sd = dict(twin.state_dict())
    sd["Conv2d_1a_3x3.conv.weight"] = torch.zeros(32, 3, 5, 5)
    with pytest.raises(ValueError, match="Conv2d_1a_3x3"):
        fold_state_dict(sd)
