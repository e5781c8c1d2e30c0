"""FID/KID evaluation tests: exact math on known Gaussians, metric
sanity (identical sets -> ~0; disjoint distributions -> large), and the
end-to-end generator evaluation entry."""

import numpy as np
import jax
import pytest

from locate_tpu.data.datasets import SyntheticImages
from locate_tpu.io.fid import (
    RandomConvFeatures,
    evaluate_generator,
    feature_stats,
    features_in_batches,
    frechet_distance,
    kid,
    load_stats,
    save_stats,
)


def test_frechet_closed_form():
    """For 1-D Gaussians: FID = (m1-m2)^2 + (s1-s2)^2 — check against the
    closed form via explicit stats."""
    d = frechet_distance(np.array([1.0]), np.array([[4.0]]),
                         np.array([3.0]), np.array([[9.0]]))
    # (1-3)^2 + (2-3)^2 = 4 + 1 = 5
    np.testing.assert_allclose(d, 5.0, rtol=1e-6)


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 8))
    mu, s = feature_stats(f)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-8


def test_frechet_orders_distributions():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(1000, 8))
    near = rng.normal(loc=0.1, size=(1000, 8))
    far = rng.normal(loc=2.0, size=(1000, 8))
    mu0, s0 = feature_stats(base)
    d_near = frechet_distance(*feature_stats(near), mu0, s0)
    d_far = frechet_distance(*feature_stats(far), mu0, s0)
    assert 0 < d_near < d_far


def test_kid_identical_near_zero_and_orders():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(600, 8))
    b = rng.normal(size=(600, 8))
    far = rng.normal(loc=1.5, size=(600, 8))
    same = abs(kid(a, b, subset_size=256, n_subsets=4))
    diff = kid(a, far, subset_size=256, n_subsets=4)
    assert same < 0.05
    assert diff > 10 * same


def test_random_features_deterministic():
    ex = RandomConvFeatures(seed=1, width=8)
    imgs = np.random.RandomState(0).randint(0, 255, (4, 32, 32, 3), np.uint8)
    f1 = ex(imgs)
    f2 = RandomConvFeatures(seed=1, width=8)(imgs)
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape[0] == 4 and f1.ndim == 2
    f3 = RandomConvFeatures(seed=2, width=8)(imgs)
    assert not np.allclose(f1, f3)


def test_features_in_batches_consistent():
    ex = RandomConvFeatures(seed=0, width=8)
    imgs = np.random.RandomState(0).randint(0, 255, (10, 16, 16, 3), np.uint8)
    whole = ex(imgs)
    batched = features_in_batches(imgs, ex, batch=3)
    np.testing.assert_allclose(whole, batched, rtol=1e-5, atol=1e-5)


def test_evaluate_generator_end_to_end(tiny_config):
    from locate_tpu.models.gan import build_gan

    cfg = tiny_config
    gan = build_gan(cfg)
    params = gan.init(jax.random.PRNGKey(0))
    ds = SyntheticImages(cfg.model.resolution, 3, length=64)
    result = evaluate_generator(
        gan, params["generator"], ds,
        n_samples=32, batch=16,
        extractor=RandomConvFeatures(seed=0, width=8),
    )
    assert np.isfinite(result["fid"]) and result["fid"] > 0
    assert np.isfinite(result["kid"])
    assert result["n_fake"] == 32

    # real-vs-real sanity: the dataset against itself scores (near) zero
    real = np.stack([ds.example(i)[0] for i in range(48)])
    ex = RandomConvFeatures(seed=0, width=8)
    f = features_in_batches(real, ex, 16)
    mu, s = feature_stats(f)
    assert frechet_distance(mu, s, mu, s) < 1e-6
    # untrained generator is far worse than real-vs-real
    assert result["fid"] > 1e-3


def test_evaluate_generator_per_class(tiny_config):
    """label= restricts both sides to one class: fakes conditioned on the
    label, reals filtered by dataset.labels; missing .labels errors."""
    import dataclasses

    from locate_tpu.models.gan import build_gan

    cfg = dataclasses.replace(
        tiny_config,
        model=dataclasses.replace(tiny_config.model, num_classes=2,
                                  class_embed_dim=4),
    )
    gan = build_gan(cfg)
    params = gan.init(jax.random.PRNGKey(0))

    class LabeledDs:
        labels = np.asarray([0] * 20 + [1] * 44)

        def __len__(self):
            return 64

        def example(self, i, rng=None):
            # class 0 dark, class 1 bright: per-class stats differ hugely
            v = 32 if self.labels[i] == 0 else 224
            img = np.full((16, 16, 3), v, np.uint8)
            img[0, 0, 0] = i  # break exact degeneracy
            return img, int(self.labels[i])

    ds = LabeledDs()
    ex = RandomConvFeatures(seed=0, width=8)
    r0 = evaluate_generator(gan, params["generator"], ds, n_samples=16,
                            batch=16, extractor=ex, label=0)
    r1 = evaluate_generator(gan, params["generator"], ds, n_samples=16,
                            batch=16, extractor=ex, label=1)
    assert r0["n_real"] == 16 and r1["n_real"] == 16
    assert np.isfinite(r0["fid"]) and np.isfinite(r1["fid"])
    assert r0["fid"] != r1["fid"]  # different real manifolds per class

    class NoLabelsDs:  # SyntheticImages grew .labels; error path needs a bare ds
        def __len__(self):
            return 8

        def example(self, i, rng=None):
            return np.zeros((16, 16, 3), np.uint8), 0

    with np.testing.assert_raises(ValueError):
        evaluate_generator(
            gan, params["generator"], NoLabelsDs(),
            n_samples=8, batch=8, extractor=ex, label=0,
        )


def test_stats_roundtrip(tmp_path):
    """save_stats/load_stats round-trip (pytorch-fid mu/sigma keys) and
    the not-a-stats-archive error path."""
    rng = np.random.default_rng(0)
    mu, sigma = feature_stats(rng.normal(size=(200, 6)))
    p = str(tmp_path / "stats.npz")
    save_stats(p, mu, sigma, n=np.int64(200))
    mu2, sigma2 = load_stats(p)
    np.testing.assert_array_equal(mu, mu2)
    np.testing.assert_array_equal(sigma, sigma2)
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, w0=np.zeros((3, 3, 3, 8)))
    with pytest.raises(ValueError, match="stats archive"):
        load_stats(bad)


def test_evaluate_generator_ref_stats(tiny_config, tmp_path):
    """The FID escape hatch: externally-computed real-side (mu, sigma)
    replaces the dataset, and the resulting FID equals the dataset-path
    FID computed with the same extractor/samples."""
    from locate_tpu.models.gan import build_gan

    cfg = tiny_config
    gan = build_gan(cfg)
    params = gan.init(jax.random.PRNGKey(0))
    ds = SyntheticImages(cfg.model.resolution, 3, length=64)
    ex = RandomConvFeatures(seed=0, width=8)
    arrays: dict = {}
    baseline = evaluate_generator(
        gan, params["generator"], ds,
        n_samples=32, batch=16, extractor=ex, out=arrays,
    )
    assert set(arrays) >= {
        "fake_features", "fake_mu", "fake_sigma",
        "real_features", "real_mu", "real_sigma",
    }
    p = str(tmp_path / "ref.npz")
    save_stats(p, arrays["real_mu"], arrays["real_sigma"])
    via_stats = evaluate_generator(
        gan, params["generator"], None,
        n_samples=32, batch=16, extractor=ex, ref_stats=load_stats(p),
    )
    np.testing.assert_allclose(via_stats["fid"], baseline["fid"], rtol=1e-9)
    assert via_stats["kid"] is None
    assert via_stats["real_side"] == "ref_stats"
    with pytest.raises(ValueError, match="dataset or ref_stats"):
        evaluate_generator(gan, params["generator"], None,
                           n_samples=8, batch=8, extractor=ex)


# ---------------------------------------------------------------------------
# precision / recall / density / coverage (kNN manifold metrics)


def test_prdc_identical_sets():
    """Same set on both sides: every fake IS a real point, so precision,
    recall, and coverage are exactly 1; density is around 1."""
    from locate_tpu.io.fid import prdc

    rng = np.random.default_rng(0)
    x = rng.normal(size=(128, 8))
    r = prdc(x, x.copy(), k=5)
    assert r["precision"] == 1.0 and r["recall"] == 1.0
    assert r["coverage"] == 1.0
    assert 0.5 < r["density"]


def test_prdc_disjoint_far_clusters():
    """Fakes far outside the real manifold: everything collapses to 0."""
    from locate_tpu.io.fid import prdc

    rng = np.random.default_rng(1)
    real = rng.normal(size=(96, 8))
    fake = rng.normal(size=(96, 8)) + 1000.0
    r = prdc(real, fake, k=5)
    assert r == {"precision": 0.0, "recall": 0.0, "density": 0.0,
                 "coverage": 0.0}


def test_prdc_mode_collapse_signature():
    """Mode collapse (all fakes near ONE real point): precision stays high
    (fakes are on-manifold) while recall/coverage crater — the split FID
    can't see. Also: k >= n rejected."""
    from locate_tpu.io.fid import prdc

    rng = np.random.default_rng(2)
    real = rng.normal(size=(128, 8)) * 5.0
    fake = real[0] + rng.normal(size=(128, 8)) * 1e-3
    r = prdc(real, fake, k=5)
    assert r["precision"] > 0.9
    assert r["recall"] < 0.2 and r["coverage"] < 0.2
    with pytest.raises(ValueError, match="prdc needs"):
        prdc(real[:4], fake[:4], k=5)


def test_prdc_matches_bruteforce_reference():
    """Batched-distance implementation == a direct O(N^2) transcription of
    the paper definitions on a small random instance."""
    from locate_tpu.io.fid import prdc

    rng = np.random.default_rng(3)
    real = rng.normal(size=(40, 4))
    fake = rng.normal(size=(50, 4), loc=0.3)
    k = 3

    def radii(x):
        d = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1))
        np.fill_diagonal(d, np.inf)
        return np.sort(d, axis=1)[:, k - 1]

    rr, rf = radii(real), radii(fake)
    d = np.sqrt(((real[:, None, :] - fake[None, :, :]) ** 2).sum(-1))
    expect = {
        "precision": (d <= rr[:, None]).any(0).mean(),
        "recall": (d <= rf[None, :]).any(1).mean(),
        "density": (d <= rr[:, None]).sum(0).mean() / k,
        "coverage": (d.min(1) <= rr).mean(),
    }
    got = prdc(real, fake, k=k)
    for key, val in expect.items():
        np.testing.assert_allclose(got[key], val, rtol=1e-12, err_msg=key)


def test_evaluate_generator_prdc(tiny_config):
    from locate_tpu.io.fid import prdc  # noqa: F401  (import check)
    from locate_tpu.models.gan import build_gan

    cfg = tiny_config
    gan = build_gan(cfg)
    params = gan.init(jax.random.PRNGKey(0))
    ds = SyntheticImages(cfg.model.resolution, 3, length=64)
    result = evaluate_generator(
        gan, params["generator"], ds,
        n_samples=32, batch=16,
        extractor=RandomConvFeatures(seed=0, width=8),
        prdc_k=3,
    )
    for key in ("precision", "recall", "density", "coverage"):
        assert key in result and 0.0 <= result[key], key
    # ref_stats mode can't do prdc — loud error, not a silent omission
    with pytest.raises(ValueError, match="per-sample"):
        evaluate_generator(
            gan, params["generator"], None,
            n_samples=8, batch=8,
            extractor=RandomConvFeatures(seed=0, width=8),
            ref_stats=(np.zeros(4), np.eye(4)),
            prdc_k=3,
        )
