"""Sliced Wasserstein distance over Laplacian-pyramid patches (ProGAN,
arXiv 1710.10196 §5 + appendix A): the multi-scale GAN quality metric that
needs NO pretrained network — per-resolution SWD separates texture quality
(fine levels) from large-scale structure (coarse levels).

Protocol (the paper's): build a Laplacian pyramid of both image sets down
to `min_res`; at each level take `patches_per_image` random 7x7xC patch
descriptors per image; normalize each set per color channel (mean/std over
all patches); project both descriptor clouds onto random unit directions;
the SWD estimate is the mean L1 distance between the SORTED projections
(exact 1-D Wasserstein-1 per direction), averaged over `n_proj`
directions x `repeats` draws. Reported x1e3, as in the paper's tables.

Differences from the reference implementation, both deliberate:
  * patch positions use the SAME key for the real and fake sets — the
    estimator is unchanged (positions are i.i.d. uniform either way) but
    swd(x, x) == 0 exactly, which pins the wiring in tests;
  * everything (pyramid, patch gather, projections, sorts) is jittable
    JAX — the blur is a depthwise conv, the projection a single matmul —
    so the metric runs on-device next to the generated batch.

Relevance here: FID's Inception weights are a driver-vendored dependency
(docs/STATUS.md); SWD is the standard no-weights quality metric, fully
computable on this box. CLI: `locate-tpu eval --swd`.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

PATCH = 7

# ProGAN's 5-tap binomial pyramid filter [1,4,6,4,1]/16.
_K5 = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0
_K5_2D = np.outer(_K5, _K5)  # (5, 5), sums to 1


def _blur(x: jax.Array, gain: float = 1.0) -> jax.Array:
    """Depthwise 5x5 binomial blur, SAME padding (NHWC)."""
    c = x.shape[-1]
    k = jnp.asarray(_K5_2D * gain, x.dtype)
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # (5,5,1,C)
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _pyr_down(x: jax.Array) -> jax.Array:
    return _blur(x)[:, ::2, ::2, :]


def _pyr_up(x: jax.Array) -> jax.Array:
    """Zero-stuff 2x then blur with 4x gain (the zero-stuffed image has
    1/4 the energy; gain restores it — classic pyrUp)."""
    n, h, w, c = x.shape
    up = jnp.zeros((n, 2 * h, 2 * w, c), x.dtype).at[:, ::2, ::2, :].set(x)
    return _blur(up, gain=4.0)


def laplacian_pyramid(x: jax.Array, n_levels: int) -> List[jax.Array]:
    """Fine-to-coarse Laplacian pyramid: n_levels-1 band-pass levels plus
    the Gaussian base. Reconstruction (sum with pyr_up) is exact up to
    float error (tested)."""
    levels = []
    for _ in range(n_levels - 1):
        down = _pyr_down(x)
        levels.append(x - _pyr_up(down))
        x = down
    levels.append(x)
    return levels


def patch_descriptors(level: jax.Array, key: jax.Array,
                      patches_per_image: int = 128) -> jax.Array:
    """(N, H, W, C) level -> (N * patches_per_image, PATCH, PATCH, C)
    random patches (uniform positions)."""
    n, h, w, c = level.shape
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (n, patches_per_image), 0, h - PATCH + 1)
    xs = jax.random.randint(kx, (n, patches_per_image), 0, w - PATCH + 1)

    def take(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (PATCH, PATCH, c))

    per_img = jax.vmap(
        lambda img, yy, xx: jax.vmap(lambda y, x: take(img, y, x))(yy, xx)
    )(level, ys, xs)  # (N, P, 7, 7, C)
    return per_img.reshape(n * patches_per_image, PATCH, PATCH, c)


def _normalize_descriptors(desc: jax.Array) -> jax.Array:
    """Per-channel mean/std normalization over the whole descriptor set
    (ProGAN's finalize_descriptors), flattened to (n, PATCH*PATCH*C)."""
    mu = jnp.mean(desc, axis=(0, 1, 2), keepdims=True)
    sd = jnp.std(desc, axis=(0, 1, 2), keepdims=True) + 1e-8
    d = (desc - mu) / sd
    return d.reshape(d.shape[0], -1)


def sliced_wasserstein(a: jax.Array, b: jax.Array, key: jax.Array,
                       n_proj: int = 512, repeats: int = 4,
                       dirs: Optional[jax.Array] = None) -> jax.Array:
    """SWD between two equal-size descriptor clouds (n, d): mean over
    random unit directions of the exact 1-D W1 (mean |sorted difference|).
    `dirs` (d, n_proj) overrides the random draw (tests pin the estimate
    against a numpy transcription with fixed directions)."""
    if a.shape != b.shape:
        raise ValueError(f"descriptor sets differ: {a.shape} vs {b.shape}")
    d = a.shape[1]
    total = jnp.zeros((), jnp.float32)
    n_rep = 1 if dirs is not None else repeats
    for r in range(n_rep):
        if dirs is None:
            dd = jax.random.normal(jax.random.fold_in(key, r), (d, n_proj),
                                   jnp.float32)
        else:
            dd = jnp.asarray(dirs, jnp.float32)
        dd = dd / (jnp.linalg.norm(dd, axis=0, keepdims=True) + 1e-12)
        pa = jnp.sort(a.astype(jnp.float32) @ dd, axis=0)
        pb = jnp.sort(b.astype(jnp.float32) @ dd, axis=0)
        total = total + jnp.mean(jnp.abs(pa - pb))
    return total / n_rep


def swd(real_u8: np.ndarray, fake_u8: np.ndarray, *, min_res: int = 16,
        patches_per_image: int = 128, n_proj: int = 512, repeats: int = 4,
        seed: int = 0) -> Dict[str, float]:
    """Multi-scale SWD between two equal-size uint8 NHWC image sets.
    Returns {"swd_<res>": value_x1e3 per pyramid level, "swd_avg": mean}.
    Images enter as [0, 255] float (the reference protocol; the per-set
    per-channel normalization removes global scale anyway)."""
    if real_u8.shape != fake_u8.shape:
        raise ValueError(
            f"image sets differ: {real_u8.shape} vs {fake_u8.shape}"
        )
    res = real_u8.shape[1]
    if res < min_res:
        raise ValueError(f"images ({res}px) below min_res={min_res}")
    n_levels = int(np.log2(res // min_res)) + 1
    key = jax.random.PRNGKey(seed)
    pyr_r = laplacian_pyramid(jnp.asarray(real_u8, jnp.float32), n_levels)
    pyr_f = laplacian_pyramid(jnp.asarray(fake_u8, jnp.float32), n_levels)
    out: Dict[str, float] = {}
    vals = []
    for li, (lr, lf) in enumerate(zip(pyr_r, pyr_f)):
        k_lvl = jax.random.fold_in(key, li)
        k_patch, k_proj = jax.random.split(k_lvl)
        # same k_patch for both sets: swd(x, x) == 0 exactly (see module
        # docstring); estimator unchanged.
        dr = _normalize_descriptors(
            patch_descriptors(lr, k_patch, patches_per_image)
        )
        df = _normalize_descriptors(
            patch_descriptors(lf, k_patch, patches_per_image)
        )
        v = float(sliced_wasserstein(dr, df, k_proj, n_proj, repeats)) * 1e3
        out[f"swd_{lr.shape[1]}"] = v
        vals.append(v)
    out["swd_avg"] = float(np.mean(vals))
    return out


def swd_generator(gan, g_params, dataset, *, n_samples: int = 1024,
                  batch: int = 64, seed: int = 0, min_res: int = 16,
                  **swd_kw) -> Dict[str, float]:
    """SWD between `n_samples` generated images and `n_samples` random
    dataset examples (the eval-CLI entry; mirrors evaluate_generator's
    sampling scheme — same latent key folding, same real-side draw)."""
    from locate_tpu.io.sampling import generate_samples

    key = jax.random.PRNGKey(seed)
    fakes = []
    for i in range(0, n_samples, batch):
        k = jax.random.fold_in(key, i)
        n = min(batch, n_samples - i)
        fakes.append(generate_samples(gan, g_params, k, n))  # uint8 NHWC
    fake_u8 = np.concatenate(fakes, axis=0)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(dataset), min(n_samples, len(dataset)),
                     replace=False)
    real_u8 = np.stack([dataset.example(int(i))[0] for i in idx])
    n = min(len(real_u8), len(fake_u8))
    return swd(real_u8[:n], fake_u8[:n], min_res=min_res, seed=seed,
               **swd_kw)
