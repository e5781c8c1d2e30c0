"""InceptionV3 pool3 feature graph in JAX — the standard FID extractor.

BASELINE.json:2's quality contract is "FID delta vs PyTorch reference";
standard FID uses InceptionV3's 2048-d global-average-pool ("pool3")
features. This module implements the torchvision `inception_v3`
architecture (inference path only) so that weights converted by
`scripts/convert_inception.py` (torchvision -> .npz, run wherever network
exists — this environment has none, BASELINE.md "Open items") plug in with
zero code changes:

    locate-tpu eval cifar10_32 --extractor=inception_v3_fid.npz --samples=50000

Weight schema (`locate-tpu-inception-v3/v1`): for every BasicConv2d module
path `P` in torchvision naming (e.g. ``Mixed_5b.branch5x5_1``):

    {P}.w   float32 HWIO conv kernel with the BatchNorm scale
            gamma/sqrt(var+eps) FOLDED into the output channels
    {P}.b   float32 (C_out,) folded bias: beta - mean*scale

plus ``format`` (this schema id), ``input_mean``/``input_std`` (3,) applied
after scaling uint8 to [0,1] — ImageNet stats for torchvision weights,
(0.5, 0.5) for the pt_inception FID weights — so the graph is faithful to
whichever weights are vendored.

Optionally ``fc.w`` (2048, n_classes) / ``fc.b`` (n_classes,) — the final
classifier, enabling Inception Score (Salimans et al., arXiv 1606.03498
§4): pool3 is the penultimate layer, so ``logits = pool3 @ fc.w + fc.b``
and IS costs one extra matmul on features already computed for FID.
Archives without fc still work for FID/KID (fc-requiring consumers raise).

FID protocol (matching pytorch-fid): uint8 RGB -> [0,1] -> bilinear resize
to 299x299 with half-pixel centers and NO antialias (exactly
``F.interpolate(mode='bilinear', align_corners=False)``) -> normalize ->
network -> 2048-d pool3 features. The standard sample count is 50k
(``--samples=50000``); smaller counts remain comparable across runs with
the same count.

The graph is verified against a from-scratch PyTorch twin with random
weights in tests/test_inception.py (tests/torch_inception.py), which pins
both the architecture and the converter's BN folding.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FORMAT = "locate-tpu-inception-v3/v1"

Params = Dict[str, Dict[str, jax.Array]]


# ---------------------------------------------------------------------------
# architecture spec: every BasicConv2d as (path, cin, cout, (kh, kw),
# (sh, sw), (ph, pw)) in torchvision's module naming/order
# ---------------------------------------------------------------------------


def _spec_a(prefix: str, cin: int, pool: int) -> List[tuple]:
    return [
        (f"{prefix}.branch1x1", cin, 64, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch5x5_1", cin, 48, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch5x5_2", 48, 64, (5, 5), (1, 1), (2, 2)),
        (f"{prefix}.branch3x3dbl_1", cin, 64, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch3x3dbl_2", 64, 96, (3, 3), (1, 1), (1, 1)),
        (f"{prefix}.branch3x3dbl_3", 96, 96, (3, 3), (1, 1), (1, 1)),
        (f"{prefix}.branch_pool", cin, pool, (1, 1), (1, 1), (0, 0)),
    ]


def _spec_b(prefix: str, cin: int) -> List[tuple]:
    return [
        (f"{prefix}.branch3x3", cin, 384, (3, 3), (2, 2), (0, 0)),
        (f"{prefix}.branch3x3dbl_1", cin, 64, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch3x3dbl_2", 64, 96, (3, 3), (1, 1), (1, 1)),
        (f"{prefix}.branch3x3dbl_3", 96, 96, (3, 3), (2, 2), (0, 0)),
    ]


def _spec_c(prefix: str, cin: int, c7: int) -> List[tuple]:
    return [
        (f"{prefix}.branch1x1", cin, 192, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch7x7_1", cin, c7, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch7x7_2", c7, c7, (1, 7), (1, 1), (0, 3)),
        (f"{prefix}.branch7x7_3", c7, 192, (7, 1), (1, 1), (3, 0)),
        (f"{prefix}.branch7x7dbl_1", cin, c7, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch7x7dbl_2", c7, c7, (7, 1), (1, 1), (3, 0)),
        (f"{prefix}.branch7x7dbl_3", c7, c7, (1, 7), (1, 1), (0, 3)),
        (f"{prefix}.branch7x7dbl_4", c7, c7, (7, 1), (1, 1), (3, 0)),
        (f"{prefix}.branch7x7dbl_5", c7, 192, (1, 7), (1, 1), (0, 3)),
        (f"{prefix}.branch_pool", cin, 192, (1, 1), (1, 1), (0, 0)),
    ]


def _spec_d(prefix: str, cin: int) -> List[tuple]:
    return [
        (f"{prefix}.branch3x3_1", cin, 192, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch3x3_2", 192, 320, (3, 3), (2, 2), (0, 0)),
        (f"{prefix}.branch7x7x3_1", cin, 192, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch7x7x3_2", 192, 192, (1, 7), (1, 1), (0, 3)),
        (f"{prefix}.branch7x7x3_3", 192, 192, (7, 1), (1, 1), (3, 0)),
        (f"{prefix}.branch7x7x3_4", 192, 192, (3, 3), (2, 2), (0, 0)),
    ]


def _spec_e(prefix: str, cin: int) -> List[tuple]:
    return [
        (f"{prefix}.branch1x1", cin, 320, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch3x3_1", cin, 384, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch3x3_2a", 384, 384, (1, 3), (1, 1), (0, 1)),
        (f"{prefix}.branch3x3_2b", 384, 384, (3, 1), (1, 1), (1, 0)),
        (f"{prefix}.branch3x3dbl_1", cin, 448, (1, 1), (1, 1), (0, 0)),
        (f"{prefix}.branch3x3dbl_2", 448, 384, (3, 3), (1, 1), (1, 1)),
        (f"{prefix}.branch3x3dbl_3a", 384, 384, (1, 3), (1, 1), (0, 1)),
        (f"{prefix}.branch3x3dbl_3b", 384, 384, (3, 1), (1, 1), (1, 0)),
        (f"{prefix}.branch_pool", cin, 192, (1, 1), (1, 1), (0, 0)),
    ]


def conv_specs() -> List[tuple]:
    """All BasicConv2d layers: (path, cin, cout, kernel, stride, padding)."""
    specs = [
        ("Conv2d_1a_3x3", 3, 32, (3, 3), (2, 2), (0, 0)),
        ("Conv2d_2a_3x3", 32, 32, (3, 3), (1, 1), (0, 0)),
        ("Conv2d_2b_3x3", 32, 64, (3, 3), (1, 1), (1, 1)),
        ("Conv2d_3b_1x1", 64, 80, (1, 1), (1, 1), (0, 0)),
        ("Conv2d_4a_3x3", 80, 192, (3, 3), (1, 1), (0, 0)),
    ]
    specs += _spec_a("Mixed_5b", 192, 32)
    specs += _spec_a("Mixed_5c", 256, 64)
    specs += _spec_a("Mixed_5d", 288, 64)
    specs += _spec_b("Mixed_6a", 288)
    specs += _spec_c("Mixed_6b", 768, 128)
    specs += _spec_c("Mixed_6c", 768, 160)
    specs += _spec_c("Mixed_6d", 768, 160)
    specs += _spec_c("Mixed_6e", 768, 192)
    specs += _spec_d("Mixed_7a", 768)
    specs += _spec_e("Mixed_7b", 1280)
    specs += _spec_e("Mixed_7c", 2048)
    return specs


# ---------------------------------------------------------------------------
# forward graph
# ---------------------------------------------------------------------------


def _conv(p: Dict[str, jax.Array], x: jax.Array, stride, padding) -> jax.Array:
    """BasicConv2d with BN pre-folded into (w, b): conv + bias + relu."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], stride,
        [(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + p["b"])


def _avg_pool3(x: jax.Array, include_pad: bool = True) -> jax.Array:
    """F.avg_pool2d(x, 3, stride=1, padding=1). torchvision's InceptionA/C/E
    default is count_include_pad=True; the pytorch-fid patched classes use
    count_include_pad=False."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    if include_pad:
        return s / 9.0
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / counts


def _max_pool3s1p1(x: jax.Array) -> jax.Array:
    """F.max_pool2d(x, 3, stride=1, padding=1) — pytorch-fid's Mixed_7c
    branch_pool."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _max_pool3s2(x: jax.Array) -> jax.Array:
    """F.max_pool2d(x, 3, stride=2) — valid padding."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (0, 0), (0, 0), (0, 0)],
    )


def _mixed_a(params: Params, prefix: str, x: jax.Array, pool_fn=_avg_pool3) -> jax.Array:
    def c(name, v, k=(1, 1), p=(0, 0)):
        return _conv(params[f"{prefix}.{name}"], v, (1, 1), p)

    b1 = c("branch1x1", x)
    b5 = c("branch5x5_2", c("branch5x5_1", x), p=(2, 2))
    b3 = c("branch3x3dbl_3", c("branch3x3dbl_2", c("branch3x3dbl_1", x), p=(1, 1)), p=(1, 1))
    bp = c("branch_pool", pool_fn(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _mixed_b(params: Params, prefix: str, x: jax.Array) -> jax.Array:
    b3 = _conv(params[f"{prefix}.branch3x3"], x, (2, 2), (0, 0))
    d = _conv(params[f"{prefix}.branch3x3dbl_1"], x, (1, 1), (0, 0))
    d = _conv(params[f"{prefix}.branch3x3dbl_2"], d, (1, 1), (1, 1))
    d = _conv(params[f"{prefix}.branch3x3dbl_3"], d, (2, 2), (0, 0))
    return jnp.concatenate([b3, d, _max_pool3s2(x)], axis=-1)


def _mixed_c(params: Params, prefix: str, x: jax.Array, pool_fn=_avg_pool3) -> jax.Array:
    def c(name, v, p=(0, 0)):
        return _conv(params[f"{prefix}.{name}"], v, (1, 1), p)

    b1 = c("branch1x1", x)
    b7 = c("branch7x7_3", c("branch7x7_2", c("branch7x7_1", x), p=(0, 3)), p=(3, 0))
    d = c("branch7x7dbl_1", x)
    d = c("branch7x7dbl_2", d, p=(3, 0))
    d = c("branch7x7dbl_3", d, p=(0, 3))
    d = c("branch7x7dbl_4", d, p=(3, 0))
    d = c("branch7x7dbl_5", d, p=(0, 3))
    bp = c("branch_pool", pool_fn(x))
    return jnp.concatenate([b1, b7, d, bp], axis=-1)


def _mixed_d(params: Params, prefix: str, x: jax.Array) -> jax.Array:
    def c(name, v, stride=(1, 1), p=(0, 0)):
        return _conv(params[f"{prefix}.{name}"], v, stride, p)

    b3 = c("branch3x3_2", c("branch3x3_1", x), stride=(2, 2))
    d = c("branch7x7x3_1", x)
    d = c("branch7x7x3_2", d, p=(0, 3))
    d = c("branch7x7x3_3", d, p=(3, 0))
    d = c("branch7x7x3_4", d, stride=(2, 2))
    return jnp.concatenate([b3, d, _max_pool3s2(x)], axis=-1)


def _mixed_e(params: Params, prefix: str, x: jax.Array, pool_fn=_avg_pool3) -> jax.Array:
    def c(name, v, p=(0, 0)):
        return _conv(params[f"{prefix}.{name}"], v, (1, 1), p)

    b1 = c("branch1x1", x)
    b3 = c("branch3x3_1", x)
    b3 = jnp.concatenate(
        [c("branch3x3_2a", b3, p=(0, 1)), c("branch3x3_2b", b3, p=(1, 0))],
        axis=-1,
    )
    d = c("branch3x3dbl_2", c("branch3x3dbl_1", x), p=(1, 1))
    d = jnp.concatenate(
        [c("branch3x3dbl_3a", d, p=(0, 1)), c("branch3x3dbl_3b", d, p=(1, 0))],
        axis=-1,
    )
    bp = c("branch_pool", pool_fn(x))
    return jnp.concatenate([b1, b3, d, bp], axis=-1)


def pool3_features(params: Params, x: jax.Array,
                   variant: str = "torchvision") -> jax.Array:
    """NHWC float input (pre-normalized, 299x299x3) -> (N, 2048) pool3.

    variant="torchvision": stock torchvision inception_v3 pooling.
    variant="fid": the pytorch-fid patched classes (pt_inception-2015-12-05
    weights): branch_pool avgpools use count_include_pad=False and
    Mixed_7c's branch_pool is a 3x3/s1/p1 MAX pool.
    """
    if variant not in ("torchvision", "fid"):
        raise ValueError(f"unknown inception variant {variant!r}")
    fid = variant == "fid"
    avg = (lambda v: _avg_pool3(v, include_pad=False)) if fid else _avg_pool3
    pool_7c = _max_pool3s1p1 if fid else avg
    x = _conv(params["Conv2d_1a_3x3"], x, (2, 2), (0, 0))
    x = _conv(params["Conv2d_2a_3x3"], x, (1, 1), (0, 0))
    x = _conv(params["Conv2d_2b_3x3"], x, (1, 1), (1, 1))
    x = _max_pool3s2(x)
    x = _conv(params["Conv2d_3b_1x1"], x, (1, 1), (0, 0))
    x = _conv(params["Conv2d_4a_3x3"], x, (1, 1), (0, 0))
    x = _max_pool3s2(x)
    x = _mixed_a(params, "Mixed_5b", x, avg)
    x = _mixed_a(params, "Mixed_5c", x, avg)
    x = _mixed_a(params, "Mixed_5d", x, avg)
    x = _mixed_b(params, "Mixed_6a", x)
    x = _mixed_c(params, "Mixed_6b", x, avg)
    x = _mixed_c(params, "Mixed_6c", x, avg)
    x = _mixed_c(params, "Mixed_6d", x, avg)
    x = _mixed_c(params, "Mixed_6e", x, avg)
    x = _mixed_d(params, "Mixed_7a", x)
    x = _mixed_e(params, "Mixed_7b", x, avg)
    x = _mixed_e(params, "Mixed_7c", x, pool_7c)
    return x.mean(axis=(1, 2))  # adaptive avg pool -> 2048


def logits_from_pool3(fc: Dict[str, jax.Array], feats) -> jax.Array:
    """pool3 features (N, 2048) -> class logits (N, n_classes). `fc` is the
    optional classifier head from the .npz (`fc.w`/`fc.b`)."""
    return jnp.asarray(feats, jnp.float32) @ fc["w"] + fc["b"]


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------


def random_params(key: jax.Array, dtype=jnp.float32,
                  fc_classes: int = 0) -> Params:
    """Random BN-folded parameters with the exact layer shapes — for tests
    (the torch-twin architecture check needs no pretrained weights).
    `fc_classes > 0` adds a random classifier head (Inception Score path;
    1008 for pt_inception, 1000 for torchvision)."""
    params: Params = {}
    for path, cin, cout, k, _, _ in conv_specs():
        key, k1, k2 = jax.random.split(key, 3)
        w = jax.random.normal(k1, (k[0], k[1], cin, cout), dtype)
        w = w * (2.0 / np.sqrt(k[0] * k[1] * cin))
        b = jax.random.normal(k2, (cout,), dtype) * 0.1
        params[path] = {"w": w, "b": b}
    if fc_classes:
        key, k1, k2 = jax.random.split(key, 3)
        params["fc"] = {
            "w": jax.random.normal(k1, (2048, fc_classes), dtype) / 45.0,
            "b": jax.random.normal(k2, (fc_classes,), dtype) * 0.1,
        }
    return params


def load_npz(path: str) -> Tuple[Params, np.ndarray, np.ndarray, str]:
    """Load a converted .npz -> (params, input_mean, input_std, variant)."""
    data = np.load(path)
    fmt = str(data["format"]) if "format" in data.files else ""
    if fmt != FORMAT:
        raise ValueError(
            f"{path!r} is not a {FORMAT} archive (format={fmt!r}); "
            f"produce one with scripts/convert_inception.py"
        )
    params: Params = {}
    for spec in conv_specs():
        p = spec[0]
        params[p] = {
            "w": jnp.asarray(data[f"{p}.w"]),
            "b": jnp.asarray(data[f"{p}.b"]),
        }
    if "fc.w" in data.files:  # optional classifier head (Inception Score)
        params["fc"] = {
            "w": jnp.asarray(data["fc.w"]),
            "b": jnp.asarray(data["fc.b"]),
        }
    mean = np.asarray(data["input_mean"], np.float32)
    std = np.asarray(data["input_std"], np.float32)
    variant = str(data["variant"]) if "variant" in data.files else "torchvision"
    return params, mean, std, variant


# ---------------------------------------------------------------------------
# FID-protocol extractor
# ---------------------------------------------------------------------------


def preprocess(images_u8: jax.Array, mean: np.ndarray, std: np.ndarray,
               size: int = 299) -> jax.Array:
    """uint8 NHWC -> [0,1] -> bilinear resize (half-pixel centers, no
    antialias — exactly F.interpolate(..., mode='bilinear',
    align_corners=False) as in pytorch-fid) -> (x - mean)/std."""
    x = jnp.asarray(images_u8, jnp.float32) / 255.0
    n, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (n, size, size, c), "bilinear", antialias=False)
    return (x - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)


class InceptionExtractor:
    """FID feature extractor: uint8 NHWC -> (N, 2048) pool3 features.

    Plugs into `evaluate_generator` / `locate-tpu eval --extractor=...`.
    Grayscale inputs are broadcast to RGB (standard FID practice for
    single-channel datasets).
    """

    def __init__(self, path: str, sharding=None):
        self.path = path
        params, mean, std, variant = load_npz(path)
        self._fn = make_feature_fn(params, mean, std, variant,
                                   sharding=sharding)
        # optional classifier head: (2048, n_classes), (n_classes,) numpy —
        # evaluate_generator turns the pool3 features it already has into
        # logits for Inception Score (None when the .npz ships no fc)
        self.fc = (
            (np.asarray(params["fc"]["w"]), np.asarray(params["fc"]["b"]))
            if "fc" in params else None
        )

    @property
    def cache_token(self) -> str:
        return f"inception_v3:{self.path}"

    def __call__(self, images_u8: np.ndarray) -> np.ndarray:
        return self._fn(images_u8)


def make_feature_fn(params: Params, mean: np.ndarray, std: np.ndarray,
                    variant: str = "torchvision", sharding=None):
    """(uint8 NHWC ndarray) -> (N, 2048) float32 ndarray, jitted once.
    `sharding` (a data-axis NamedSharding) runs the network data-parallel
    over the mesh — the batch stays sharded through resize + all convs
    (everything is batch-elementwise), params replicated by GSPMD."""

    @jax.jit
    def apply(x_u8):
        x = preprocess(x_u8, mean, std)
        return pool3_features(params, x, variant)

    def call(images_u8: np.ndarray) -> np.ndarray:
        if images_u8.shape[-1] == 1:
            images_u8 = np.repeat(images_u8, 3, axis=-1)
        from locate_tpu.io.fid import _shard_batch

        x, n = _shard_batch(np.asarray(images_u8), sharding)
        return np.asarray(apply(x), np.float32)[:n]

    return call
