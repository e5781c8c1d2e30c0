"""Inception Score (io/fid.py:inception_score, eval --inception-score,
arXiv 1606.03498 §4): the estimator against analytic cases and a direct
transcription of the definition, the fc logits head vs the torch twin,
the converter/npz round trip of fc, and the evaluate_generator wiring."""

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

from locate_tpu.io.fid import evaluate_generator, inception_score
from locate_tpu.io.inception import load_npz, logits_from_pool3, pool3_features


def test_is_analytic_bounds():
    # uniform p(y|x) == marginal -> KL 0 -> IS exactly 1
    logits = np.zeros((40, 7))
    mean, std = inception_score(logits, splits=4)
    assert abs(mean - 1.0) < 1e-9 and std < 1e-9
    # perfectly confident, perfectly diverse -> IS -> n_classes
    n = 8
    # 32 rows / 4 splits: each split covers every class exactly once, so
    # the split marginal is uniform and IS hits the n_classes ceiling
    one_hot = np.tile(np.eye(n), (4, 1)) * 60.0
    mean, _ = inception_score(one_hot, splits=4)
    assert abs(mean - n) < 1e-3
    # collapsed generator (always the same class) -> IS 1 despite confidence
    collapsed = np.zeros((40, n))
    collapsed[:, 2] = 60.0
    mean, _ = inception_score(collapsed, splits=4)
    assert abs(mean - 1.0) < 1e-6


def test_is_matches_direct_definition():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(64, 10)) * 3
    got_mean, got_std = inception_score(logits, splits=4)
    # direct transcription: softmax, split, exp(mean KL vs split marginal)
    z = logits - logits.max(1, keepdims=True)
    p = np.exp(z) / np.exp(z).sum(1, keepdims=True)
    scores = []
    for s in range(4):
        chunk = p[s * 16:(s + 1) * 16]
        py = chunk.mean(0)
        kl = np.mean([np.sum(q * (np.log(q + 1e-16) - np.log(py + 1e-16)))
                      for q in chunk])
        scores.append(np.exp(kl))
    np.testing.assert_allclose(got_mean, np.mean(scores), rtol=1e-10)
    np.testing.assert_allclose(got_std, np.std(scores), rtol=1e-10)
    with pytest.raises(ValueError):
        inception_score(logits[:3], splits=4)  # fewer samples than splits


SIZE = 75  # smallest input surviving all stride reductions (test_inception)


def test_logits_match_torch_twin(tmp_path):
    """fc folding + the logits = pool3 @ fc identity, end to end through
    the npz round trip."""
    twin = random_twin("fid", seed=11, fc_classes=13)
    folded = fold_state_dict(twin.state_dict(), "fid")
    assert folded["fc.w"].shape == (2048, 13)
    path = str(tmp_path / "inc_fc.npz")
    np.savez(path, **folded)
    params, _, _, variant = load_npz(path)
    assert variant == "fid" and "fc" in params

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, SIZE, SIZE, 3)).astype(np.float32)
    feats = pool3_features(params, jnp.asarray(x), variant)
    got = np.asarray(logits_from_pool3(params["fc"], feats))
    with torch.no_grad():
        want = twin.fc(twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))).numpy()
    assert got.shape == (2, 13)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    # fc is optional: archives without it still load, extractor.fc is None
    folded_noshead = {k: v for k, v in folded.items()
                      if not k.startswith("fc.")}
    path2 = str(tmp_path / "inc_nofc.npz")
    np.savez(path2, **folded_noshead)
    params2, _, _, _ = load_npz(path2)
    assert "fc" not in params2
    from locate_tpu.io.fid import NpzFeatureExtractor

    assert NpzFeatureExtractor(path2).fc is None


class _FcExtractor:
    """Cheap stand-in exposing the InceptionExtractor contract: features
    plus a .fc head (wiring test — the real graph is pinned above)."""

    cache_token = "fc-test"

    def __init__(self, dim=6, classes=5, seed=0):
        rng = np.random.default_rng(seed)
        self.fc = (rng.normal(size=(dim, classes)).astype(np.float32),
                   np.zeros(classes, np.float32))
        self._dim = dim

    def __call__(self, images_u8):
        x = images_u8.reshape(len(images_u8), -1).astype(np.float32) / 255.0
        return x[:, : self._dim]


def test_evaluate_generator_is_wiring(tiny_config):
    from locate_tpu.data.datasets import make_dataset
    from locate_tpu.models.gan import build_gan

    gan = build_gan(tiny_config)
    g_params = gan.generator.init(jax.random.PRNGKey(0))
    ds = make_dataset(tiny_config.data)
    r = evaluate_generator(
        gan, g_params, ds, n_samples=24, batch=12,
        extractor=_FcExtractor(), is_splits=3,
    )
    assert "is_mean" in r and "is_std" in r
    assert 1.0 <= r["is_mean"] <= 5.0 and np.isfinite(r["is_std"])
    # IS also available in ref_stats mode (fake-side-only metric) and the
    # numbers agree (identical generator stream/extractor)
    mu = np.zeros(6); sigma = np.eye(6)
    r2 = evaluate_generator(
        gan, g_params, None, n_samples=24, batch=12,
        extractor=_FcExtractor(), is_splits=3, ref_stats=(mu, sigma),
    )
    np.testing.assert_allclose(r2["is_mean"], r["is_mean"], rtol=1e-6)
    # extractor without a head -> loud error
    with pytest.raises(ValueError, match="classifier head"):
        evaluate_generator(gan, g_params, ds, n_samples=12, batch=12,
                           is_splits=2)
