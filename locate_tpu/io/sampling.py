"""Sampling: fixed-latent image grids (SURVEY.md §4.3) — the reference's
`save_image`-style periodic sample dump, using the EMA generator when
available (BASELINE config 3)."""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from locate_tpu.models.gan import GAN


@functools.lru_cache(maxsize=8)
def _jitted_apply(apply_fn):
    # Cache per generator function: a fresh jax.jit wrapper every call
    # would retrace (and on TPU recompile) at each periodic sample dump.
    return jax.jit(apply_fn)


@functools.lru_cache(maxsize=8)
def _jitted_truncated(gan: GAN, psi: float):
    """Style-family w-space truncation as ONE jitted program (mapping +
    w_avg estimation + truncated synthesis); cached per (gan, psi)."""
    from locate_tpu.models.style_generator import apply_truncated

    def fn(params, z, labels, key):
        return apply_truncated(
            gan.config, params, z, labels, psi=psi, key=key,
            compute_dtype=gan.compute_dtype,
        )

    return jax.jit(fn)


def generate_samples(
    gan: GAN, g_params, key: jax.Array, count: int, labels=None,
    truncation: float = 0.0, truncation_psi: float = 0.0,
) -> np.ndarray:
    """Run the generator and return uint8 NHWC images on host.

    `truncation` > 0 truncates the z draw (any family, BigGAN-style);
    `truncation_psi` in (0, 1] applies W-SPACE truncation instead — the
    style family's native knob (requires model.arch="style")."""
    z = gan.sample_latents(key, count, truncation)
    if labels is None and gan.config.num_classes:
        labels = jnp.arange(count) % gan.config.num_classes
    if truncation_psi > 0.0:
        if gan.config.arch != "style":
            raise ValueError(
                "truncation_psi is w-space truncation — it needs "
                "model.arch='style' (use `truncation` for z-space)"
            )
        imgs = _jitted_truncated(gan, float(truncation_psi))(
            g_params, z, labels, jax.random.fold_in(key, 0x57415647)
        )
    else:
        imgs = _jitted_apply(gan.generator.apply)(g_params, z, labels)
    return to_uint8(np.asarray(jax.device_get(imgs), np.float32))


def slerp(a: jax.Array, b: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation between latent vectors (the standard way to
    walk a Gaussian latent space — linear interp leaves the shell)."""
    a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    omega = jnp.arccos(jnp.clip(jnp.sum(a_n * b_n, axis=-1, keepdims=True), -1, 1))
    so = jnp.sin(omega)
    t = jnp.asarray(t)[..., None]
    return jnp.where(
        so < 1e-6,
        (1.0 - t) * a + t * b,  # parallel vectors: fall back to lerp
        (jnp.sin((1.0 - t) * omega) * a + jnp.sin(t * omega) * b) / so,
    )


def interpolation_grid(
    gan: GAN, g_params, key: jax.Array, rows: int = 4, cols: int = 8,
    labels=None,
) -> np.ndarray:
    """`rows` latent pairs, each slerp-interpolated across `cols` steps —
    the classic GAN interpolation sheet. Returns uint8 (rows*cols, H, W, C)
    in row-major order for `save_image_grid(..., cols=cols)`."""
    ka, kb = jax.random.split(key)
    za = gan.sample_latents(ka, rows).astype(jnp.float32)
    zb = gan.sample_latents(kb, rows).astype(jnp.float32)
    ts = jnp.linspace(0.0, 1.0, cols)
    z = jax.vmap(lambda t: slerp(za, zb, jnp.full((rows,), t)))(ts)  # (cols, rows, D)
    z = jnp.swapaxes(z, 0, 1).reshape(rows * cols, -1)
    if labels is None and gan.config.num_classes:
        labels = jnp.repeat(jnp.arange(rows) % gan.config.num_classes, cols)
    imgs = _jitted_apply(gan.generator.apply)(
        g_params, z.astype(gan.compute_dtype), labels
    )
    return to_uint8(np.asarray(jax.device_get(imgs), np.float32))


def to_uint8(imgs: np.ndarray) -> np.ndarray:
    """Denormalize [-1, 1] -> [0, 255] uint8 (SURVEY.md §4.3)."""
    return np.clip((imgs + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)


class ShardedSampler:
    """Data-parallel serving: the (EMA) generator jitted over a pure-DP
    mesh, latent batch sharded over the `data` axis, params replicated —
    N chips generate N batches' worth per dispatch (BASELINE "sampling"
    API, scaled the TPU way: shardings + GSPMD, no device loops).

    One compile per (batch, labels-presence) signature; construct once
    and call per request. Latents are drawn with the SAME global-batch
    key scheme as `generate_samples`, so for identical (key, count) the
    sharded and single-device paths produce identical images up to
    compilation-level float noise.
    """

    def __init__(self, gan: GAN, g_params, mesh=None):
        from jax.sharding import NamedSharding, PartitionSpec as P

        if mesh is None:
            from locate_tpu.config import ParallelConfig
            from locate_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(ParallelConfig(data_parallel=-1))
        self.gan = gan
        self.mesh = mesh
        data_axis = mesh.axis_names[0]
        self.n_devices = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        self._batch = NamedSharding(mesh, P(data_axis))
        rep = NamedSharding(mesh, P())
        self.g_params = jax.device_put(g_params, rep)
        apply = gan.generator.apply
        self._fn = jax.jit(
            apply,
            in_shardings=(rep, self._batch, None),
            out_shardings=self._batch,
        )
        self._fn_labeled = jax.jit(
            apply,
            in_shardings=(rep, self._batch, self._batch),
            out_shardings=self._batch,
        )

    def __call__(self, key: jax.Array, count: int, labels=None,
                 truncation: float = 0.0) -> np.ndarray:
        """Generate `count` images (padded up to a multiple of the mesh
        size on-device, trimmed on host). Returns uint8 NHWC."""
        n = -(-count // self.n_devices) * self.n_devices  # round up
        z = jax.device_put(
            self.gan.sample_latents(key, n, truncation), self._batch
        )
        if labels is None and self.gan.config.num_classes:
            labels = jnp.arange(n) % self.gan.config.num_classes
        if labels is not None:
            labels = jnp.asarray(labels)
            if labels.shape[0] < n:  # pad to the rounded-up batch
                labels = jnp.concatenate(
                    [labels, jnp.zeros((n - labels.shape[0],), labels.dtype)]
                )
            labels = jax.device_put(labels, self._batch)
            imgs = self._fn_labeled(self.g_params, z, labels)
        else:
            imgs = self._fn(self.g_params, z, None)
        out = to_uint8(np.asarray(jax.device_get(imgs), np.float32))
        return out[:count]


def tile_grid(imgs: np.ndarray, cols: Optional[int] = None) -> np.ndarray:
    """Tile (N, H, W, C) uint8 images into one grid image."""
    n, h, w, c = imgs.shape
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    grid = np.zeros((rows * h, cols * w, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = imgs[i]
    return grid


def save_image_grid(imgs: np.ndarray, path: str, cols: Optional[int] = None) -> str:
    """Write a PNG grid to `path` (device->host boundary is in the caller)."""
    from PIL import Image

    grid = tile_grid(imgs, cols)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(path)
    return path
