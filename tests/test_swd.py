"""Sliced Wasserstein distance (io/swd.py, ProGAN arXiv 1710.10196 §5):
pyramid exactness, numpy-transcription oracle for the SW estimate,
identity/shift behavior, and the generator-vs-dataset entry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locate_tpu.io.swd import (
    _pyr_up,
    laplacian_pyramid,
    patch_descriptors,
    sliced_wasserstein,
    swd,
    swd_generator,
)


def test_laplacian_pyramid_reconstructs():
    """Sum-up reconstruction (level + pyr_up(coarser...)) must be exact up
    to float error — the band-pass decomposition loses nothing."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    levels = laplacian_pyramid(x, 3)
    assert [l.shape[1] for l in levels] == [32, 16, 8]
    recon = levels[-1]
    for lvl in reversed(levels[:-1]):
        recon = _pyr_up(recon) + lvl
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_sliced_wasserstein_matches_numpy_oracle():
    """With fixed directions, the estimate must equal the literal
    definition: mean over directions of mean |sorted(A.d) - sorted(B.d)|."""
    rng = np.random.default_rng(1)
    a = rng.normal(size=(64, 10)).astype(np.float32)
    b = rng.normal(size=(64, 10)).astype(np.float32) + 0.5
    dirs = rng.normal(size=(10, 7)).astype(np.float32)
    ours = float(sliced_wasserstein(jnp.asarray(a), jnp.asarray(b),
                                    jax.random.PRNGKey(0), dirs=dirs))
    d = dirs / np.linalg.norm(dirs, axis=0, keepdims=True)
    ref = np.mean(np.abs(np.sort(a @ d, axis=0) - np.sort(b @ d, axis=0)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_sliced_wasserstein_1d_analytic():
    """Single direction [1]: SWD is the exact 1-D W1 between the point
    sets — mean |sorted difference|."""
    a = jnp.asarray([[0.0], [1.0], [2.0]])
    b = jnp.asarray([[4.0], [0.5], [1.5]])
    v = float(sliced_wasserstein(a, b, jax.random.PRNGKey(0),
                                 dirs=jnp.asarray([[1.0]])))
    # sorted a: 0,1,2; sorted b: 0.5,1.5,4 -> |diffs| 0.5,0.5,2 -> mean 1.0
    np.testing.assert_allclose(v, 1.0, rtol=1e-6)


def test_swd_identity_is_zero_and_shift_detected():
    rng = np.random.default_rng(2)
    base = rng.integers(0, 200, (16, 32, 32, 3), dtype=np.uint8)
    r_same = swd(base, base.copy(), min_res=16, patches_per_image=32,
                 n_proj=64, repeats=2)
    assert set(r_same) == {"swd_32", "swd_16", "swd_avg"}
    for v in r_same.values():
        assert v == 0.0
    # structurally different set (heavy blocky pattern) -> clearly positive
    other = np.zeros_like(base)
    other[:, ::2, :, :] = 255
    r_diff = swd(base, other, min_res=16, patches_per_image=32,
                 n_proj=64, repeats=2)
    assert r_diff["swd_avg"] > 10.0


def test_swd_monotone_in_noise():
    """More corruption -> larger SWD (same seed, same patch positions)."""
    rng = np.random.default_rng(3)
    base = rng.integers(40, 216, (16, 32, 32, 3)).astype(np.int16)

    def noisy(s):
        n = rng.normal(scale=s, size=base.shape)
        return np.clip(base + n, 0, 255).astype(np.uint8)

    b8 = np.clip(base, 0, 255).astype(np.uint8)
    lo = swd(b8, noisy(8), min_res=16, patches_per_image=32, n_proj=64,
             repeats=2, seed=5)
    hi = swd(b8, noisy(64), min_res=16, patches_per_image=32, n_proj=64,
             repeats=2, seed=5)
    assert hi["swd_avg"] > lo["swd_avg"]


def test_patch_descriptors_shapes_and_bounds():
    rng = np.random.default_rng(4)
    lvl = jnp.asarray(rng.normal(size=(3, 16, 16, 3)).astype(np.float32))
    p = patch_descriptors(lvl, jax.random.PRNGKey(0), patches_per_image=10)
    assert p.shape == (30, 7, 7, 3)
    # every patch must be a real sub-window: values all present in source
    assert float(jnp.max(p)) <= float(jnp.max(lvl))
    with pytest.raises(ValueError):
        swd(np.zeros((2, 16, 16, 3), np.uint8),
            np.zeros((3, 16, 16, 3), np.uint8))


def test_in_training_swd_logged(tiny_config, tmp_path):
    """train.eval_swd: the in-training eval also logs eval_swd_* scalars
    (metrics.jsonl) alongside eval_rfid."""
    import dataclasses
    import json

    from locate_tpu.train.loop import train

    cfg = dataclasses.replace(
        tiny_config,
        workdir=str(tmp_path),
        train=dataclasses.replace(
            tiny_config.train, eval_every=2, eval_samples=8, eval_swd=True,
            log_every=2,
        ),
    )
    train(cfg, total_steps=2)
    recs = [json.loads(l) for l in
            open(tmp_path / "metrics.jsonl").read().splitlines()]
    evals = [r for r in recs if "eval_swd_avg" in r]
    assert evals and np.isfinite(evals[-1]["eval_swd_avg"])
    assert f"eval_swd_{tiny_config.model.resolution}" in evals[-1]
    assert "eval_rfid" in evals[-1]


def test_swd_generator_end_to_end(tiny_config):
    from locate_tpu.data.datasets import SyntheticImages
    from locate_tpu.models.gan import build_gan

    gan = build_gan(tiny_config)
    params = gan.generator.init(jax.random.PRNGKey(0))
    ds = SyntheticImages(tiny_config.model.resolution, length=64)
    r = swd_generator(gan, params, ds, n_samples=16, batch=8,
                      patches_per_image=16, n_proj=32, repeats=1)
    assert "swd_16" in r and "swd_avg" in r
    assert np.isfinite(list(r.values())).all()
    # an untrained generator vs structured data must be far from zero
    assert r["swd_avg"] > 0.0
