"""FID/KID evaluation (SURVEY.md §6 "Metrics": FID as an offline eval entry
point; BASELINE quality target is "FID parity ... at each resolution").

Offline-environment note (BASELINE.md "Open items"): Inception weights
cannot be downloaded here and torchvision is not installed, so this module
provides

  * exact Frechet-distance / MMD math usable with ANY feature extractor,
  * `RandomConvFeatures` — a deterministic randomly-initialized conv
    feature net. Frechet distance under random conv features ("rFID") is a
    valid *relative* metric (same extractor, same data => comparable across
    checkpoints/models); it is not numerically comparable to published
    Inception-FID numbers,
  * `NpzFeatureExtractor` — loads a user-vendored extractor (conv weights
    in an .npz) so true Inception-FID plugs in the moment the driver
    vendors weights, with zero code change to the pipeline.

KID (kernel Inception distance; polynomial-kernel MMD^2, unbiased) is also
provided — it needs no matrix sqrt and has an unbiased small-sample
estimator.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

FeatureFn = Callable[[np.ndarray], np.ndarray]  # uint8 NHWC -> (N, D) f32


# ---------------------------------------------------------------------------
# statistics
# ---------------------------------------------------------------------------


def feature_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of an (N, D) feature matrix."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def save_stats(path: str, mu: np.ndarray, sigma: np.ndarray, **extra) -> None:
    """Write (mu, sigma) feature statistics as an .npz (pytorch-fid's
    `--save-stats` convention: keys `mu` and `sigma`), so stats interchange
    with the standard tooling in both directions."""
    np.savez(path, mu=np.asarray(mu, np.float64),
             sigma=np.atleast_2d(np.asarray(sigma, np.float64)), **extra)


def load_stats(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a (mu, sigma) .npz written by `save_stats` OR by pytorch-fid
    (`python -m pytorch_fid --save-stats`), which uses the same keys.
    This is the FID escape hatch: reference statistics computed OFF-box
    (where network/weights exist) plug in directly — no Inception weight
    file needed on this host."""
    data = np.load(path)
    keys = set(data.files)
    if not {"mu", "sigma"} <= keys:
        raise ValueError(
            f"{path!r} is not a stats archive (need keys mu+sigma, "
            f"got {sorted(keys)})"
        )
    return np.asarray(data["mu"], np.float64), np.atleast_2d(
        np.asarray(data["sigma"], np.float64)
    )


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID = |mu1-mu2|^2 + Tr(s1 + s2 - 2 sqrtm(s1 s2))."""
    from scipy import linalg

    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    def _sqrtm(a):
        out = linalg.sqrtm(a)
        # scipy < 1.17 returned (sqrtm, errest) with disp=False; >= 1.17
        # returns just the array
        return out[0] if isinstance(out, tuple) else out

    diff = mu1 - mu2
    covmean = _sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        # regularize near-singular covariances
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    covmean = np.real(covmean)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def kid(features_a: np.ndarray, features_b: np.ndarray, subset_size: int = 512,
        n_subsets: int = 10, seed: int = 0) -> float:
    """Unbiased polynomial-kernel MMD^2 (k(x,y) = (x.y/D + 1)^3), averaged
    over random subsets (the standard KID estimator)."""
    a = np.asarray(features_a, np.float64)
    b = np.asarray(features_b, np.float64)
    d = a.shape[1]
    rng = np.random.default_rng(seed)
    m = min(subset_size, len(a), len(b))
    if m < 2:
        raise ValueError(f"KID needs >= 2 samples per side, got {m}")
    vals = []
    for _ in range(n_subsets):
        xa = a[rng.choice(len(a), m, replace=False)]
        xb = b[rng.choice(len(b), m, replace=False)]
        kaa = (xa @ xa.T / d + 1.0) ** 3
        kbb = (xb @ xb.T / d + 1.0) ** 3
        kab = (xa @ xb.T / d + 1.0) ** 3
        np.fill_diagonal(kaa, 0.0)
        np.fill_diagonal(kbb, 0.0)
        mmd = (
            kaa.sum() / (m * (m - 1))
            + kbb.sum() / (m * (m - 1))
            - 2.0 * kab.mean()
        )
        vals.append(mmd)
    return float(np.mean(vals))


def inception_score(logits: np.ndarray, splits: int = 10) -> Tuple[float, float]:
    """Inception Score (Salimans et al., arXiv 1606.03498 §4) from class
    logits: IS = exp(E_x KL(p(y|x) || p(y))), computed per split with p(y)
    the split's marginal (the original protocol; splits=10 is standard).
    Returns (mean, std) over splits. Higher is better; 1 <= IS <= n_classes.
    """
    z = np.asarray(logits, np.float64)
    if z.ndim != 2 or len(z) < splits:
        raise ValueError(f"need (N>= {splits}, n_classes) logits, got {z.shape}")
    z = z - z.max(axis=1, keepdims=True)  # stable softmax
    p = np.exp(z)
    p /= p.sum(axis=1, keepdims=True)
    scores = []
    for chunk in np.array_split(p, splits):
        marginal = chunk.mean(axis=0, keepdims=True)
        kl = (chunk * (np.log(chunk + 1e-16) - np.log(marginal + 1e-16))).sum(1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


def _pairwise_dist(a: np.ndarray, b: np.ndarray, batch: int = 4096) -> np.ndarray:
    """Euclidean distance matrix [len(a), len(b)] in float64, row-batched so
    eval-sized sets (tens of k) never materialize more than batch*len(b)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    bb = (b * b).sum(1)
    rows = []
    for i in range(0, len(a), batch):
        ai = a[i : i + batch]
        sq = (ai * ai).sum(1)[:, None] + bb[None, :] - 2.0 * ai @ b.T
        rows.append(np.sqrt(np.maximum(sq, 0.0)))
    return np.concatenate(rows, axis=0)


def _knn_radius(x: np.ndarray, k: int) -> np.ndarray:
    """Distance from each point to its k-th nearest OTHER point in x."""
    d = _pairwise_dist(x, x)
    np.fill_diagonal(d, np.inf)
    return np.partition(d, k - 1, axis=1)[:, k - 1]


def prdc(real_features: np.ndarray, fake_features: np.ndarray,
         k: int = 5) -> dict:
    """Improved precision/recall (Kynkaanniemi et al., arXiv 1904.06991)
    and density/coverage (Naeem et al., arXiv 2002.09797) from kNN
    manifold estimates — the standard fidelity-vs-diversity split that a
    single FID number hides:

      precision — fraction of fakes inside the real manifold (fidelity)
      recall    — fraction of reals inside the fake manifold (diversity)
      density   — precision's count-based, outlier-robust refinement
      coverage  — fraction of reals with a fake within their kNN ball

    Pure numpy on feature matrices [N, D]; pairs with any extractor in
    this module (RandomConvFeatures for rP/rR, NpzFeatureExtractor for
    the Inception feature space)."""
    real = np.asarray(real_features, np.float64)
    fake = np.asarray(fake_features, np.float64)
    if min(len(real), len(fake)) <= k:
        raise ValueError(f"prdc needs > k={k} samples per side, got "
                         f"{len(real)} real / {len(fake)} fake")
    r_real = _knn_radius(real, k)   # [Nr]
    r_fake = _knn_radius(fake, k)   # [Nf]
    d_rf = _pairwise_dist(real, fake)  # [Nr, Nf]
    in_real = d_rf <= r_real[:, None]  # fake j inside real i's ball
    return {
        "precision": float(in_real.any(axis=0).mean()),
        "recall": float((d_rf <= r_fake[None, :]).any(axis=1).mean()),
        "density": float(in_real.sum(axis=0).mean() / k),
        "coverage": float((d_rf.min(axis=1) <= r_real).mean()),
    }


# ---------------------------------------------------------------------------
# feature extractors
# ---------------------------------------------------------------------------


def _shard_batch(images_u8: np.ndarray, sharding):
    """Place a uint8 batch under a (data-axis) sharding, padding the batch
    up to a multiple of the mesh size by repeating leading rows. Returns
    (device_array, true_count) — callers trim features back to
    true_count. None sharding = default single-device placement."""
    n = len(images_u8)
    if sharding is None:
        return jnp.asarray(images_u8), n
    d = len(sharding.mesh.devices.flatten())
    m = -(-n // d) * d
    if m != n:
        reps = -(-(m - n) // n)
        pad = np.concatenate([images_u8] * reps)[: m - n]
        images_u8 = np.concatenate([images_u8, pad])
    return jax.device_put(jnp.asarray(images_u8), sharding), n


def _make_conv_stack(ws, tail, sharding=None):
    """Shared extractor core: stride-2 conv + leaky-relu stack over
    uint8 NHWC input normalized to [-1, 1], with a pooling `tail`.
    `sharding` (a data-axis NamedSharding) runs the stack data-parallel
    over the mesh — GSPMD keeps every op batch-sharded, weights
    replicated."""

    @jax.jit
    def apply(x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        feats = []
        for i, w in enumerate(ws):
            x = jax.lax.conv_general_dilated(
                x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            x = jax.nn.leaky_relu(x, 0.2)
            feats = tail(i, len(ws), x, feats)
        return jnp.concatenate(feats, axis=-1)

    def call(images_u8):
        x, n = _shard_batch(np.asarray(images_u8), sharding)
        return np.asarray(apply(x), np.float32)[:n]

    return call


class RandomConvFeatures:
    """Deterministic random-weight conv feature net (JAX, jitted once).

    4 stride-2 conv stages (3x3, leaky-relu) + global mean/std pooling over
    the last two stages -> ~2*(c3+c4) features. Weights depend only on
    (seed, width, input channels), NOT on input resolution, so stats are
    comparable across models generating the same resolution.
    """

    def __init__(self, seed: int = 0, width: int = 64, sharding=None):
        self.seed = seed
        self.width = width
        self.sharding = sharding  # data-axis NamedSharding -> DP extraction
        self._calls = {}  # keyed by input channel count

    @property
    def cache_token(self) -> str:
        return f"random_conv:{self.seed}:{self.width}"

    def _build(self, cin: int):
        width = self.width
        key = jax.random.PRNGKey(self.seed)
        chans = [cin, width, width * 2, width * 4, width * 4]
        keys = jax.random.split(key, len(chans) - 1)
        ws = [
            jax.random.normal(k, (3, 3, ci, co), jnp.float32)
            * np.sqrt(2.0 / (9 * ci))
            for k, ci, co in zip(keys, chans[:-1], chans[1:])
        ]

        def tail(i, n_layers, x, feats):
            if i >= n_layers - 2:
                feats = feats + [x.mean(axis=(1, 2)), x.std(axis=(1, 2))]
            return feats

        return _make_conv_stack(ws, tail, self.sharding)

    def __call__(self, images_u8: np.ndarray) -> np.ndarray:
        cin = images_u8.shape[-1]
        if cin not in self._calls:
            self._calls[cin] = self._build(cin)
        return self._calls[cin](images_u8)


class NpzFeatureExtractor:
    """Feature net from vendored weights — the `--extractor=PATH.npz` slot.

    Dispatches on the archive's `format` field:

      * `locate-tpu-inception-v3/v1` (scripts/convert_inception.py output):
        the full InceptionV3 pool3 graph with the standard FID protocol
        (io/inception.py) — TRUE FID the moment weights are vendored.
      * otherwise (legacy): an .npz of HWIO conv kernels named w0..wK
        (stride 2 each) applied like RandomConvFeatures with global mean
        pooling of the final stage.
    """

    def __init__(self, path: str, sharding=None):
        self.path = path
        self.sharding = sharding  # data-axis NamedSharding -> DP extraction
        data = np.load(path)
        if "format" in data.files:
            from locate_tpu.io.inception import FORMAT, InceptionExtractor

            fmt = str(data["format"])
            if fmt != FORMAT:
                raise ValueError(f"unknown extractor format {fmt!r} in {path!r}")
            self._inner = InceptionExtractor(path, sharding=sharding)
            self._call = self._inner
            self._token = self._inner.cache_token
            self.fc = self._inner.fc  # classifier head (Inception Score)
            return
        ws = [jnp.asarray(data[f"w{i}"]) for i in range(len(data.files))]

        def tail(i, n_layers, x, feats):
            return [x.mean(axis=(1, 2))] if i == n_layers - 1 else feats

        self._call = _make_conv_stack(ws, tail, sharding)
        self._token = f"npz:{self.path}"

    @property
    def cache_token(self) -> str:
        return self._token

    def __call__(self, images_u8: np.ndarray) -> np.ndarray:
        return self._call(images_u8)


# ---------------------------------------------------------------------------
# end-to-end evaluation
# ---------------------------------------------------------------------------


def features_in_batches(images_u8: np.ndarray, extractor: FeatureFn,
                        batch: int = 64) -> np.ndarray:
    outs = []
    for i in range(0, len(images_u8), batch):
        outs.append(extractor(images_u8[i : i + batch]))
    return np.concatenate(outs, axis=0)


def evaluate_generator(
    gan,
    g_params,
    dataset=None,
    *,
    n_samples: int = 1024,
    extractor: Optional[FeatureFn] = None,
    batch: int = 64,
    seed: int = 0,
    cache: Optional[dict] = None,
    ref_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    out: Optional[dict] = None,
    prdc_k: Optional[int] = None,
    label: Optional[int] = None,
    is_splits: Optional[int] = None,
    mesh=None,
) -> dict:
    """Generate n_samples, extract features for both generated and real
    examples, return {"fid": ..., "kid": ...} (rFID/rKID with the default
    random extractor).

    Pass the same `cache` dict across calls (e.g. periodic in-training
    eval) to compute the real-image features once — they are constant for
    a fixed (dataset, extractor, seed, n_samples).

    `ref_stats=(mu, sigma)` replaces the real side entirely (stats escape
    hatch: reference statistics computed off-box, e.g. by pytorch-fid,
    yield TRUE FID with no real images or Inception weights on this host).
    KID needs raw features, so it is reported as None in that mode.
    `dataset` may then be None.

    `out` (a dict, mutated) receives the raw arrays for export:
    `fake_features`, `fake_mu`, `fake_sigma`, and — when the real side is
    computed — `real_features`, `real_mu`, `real_sigma`.

    `prdc_k` adds precision/recall/density/coverage (see `prdc`) at that
    kNN size; needs per-sample real features, so it is unavailable (and
    rejected) in ref_stats mode.

    `label` restricts BOTH sides to one class (per-class FID for
    conditional models — aggregate FID hides class dropping): fakes are
    generated with that label, reals are the dataset examples whose label
    matches (the dataset must expose `.labels`).

    `is_splits` adds Inception Score over the generated samples (is_mean/
    is_std at that split count; 10 is standard). Needs an extractor whose
    features are pool3 AND that exposes the classifier head as `.fc`
    (InceptionExtractor with an fc-bearing .npz) — logits are then one
    matmul on the fake features already in hand.

    `mesh` runs the whole eval DATA-PARALLEL over that jax.sharding.Mesh:
    generation through `ShardedSampler` (same latent key scheme, so the
    image stream matches the single-device path up to compile-level float
    noise) and feature extraction with the batch sharded over the mesh's
    first axis (the default extractor is rebuilt with that sharding;
    custom extractors are used as passed — construct them with
    `sharding=` to shard their pass too). The in-training eval passes the
    training mesh, so a pod evaluates at pod speed."""
    from locate_tpu.io.sampling import generate_samples

    sampler = None
    if mesh is not None and np.prod(list(mesh.shape.values())) > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        from locate_tpu.io.sampling import ShardedSampler

        sampler = ShardedSampler(gan, g_params, mesh)
        if extractor is None:
            extractor = RandomConvFeatures(
                sharding=NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            )
    extractor = extractor or RandomConvFeatures()
    key = jax.random.PRNGKey(seed)
    fake_feats = []
    for i in range(0, n_samples, batch):
        k = jax.random.fold_in(key, i)
        n = min(batch, n_samples - i)
        labels = None if label is None else jnp.full((n,), label)
        if sampler is not None:
            imgs = sampler(k, n, labels=labels)
        else:
            imgs = generate_samples(gan, g_params, k, n, labels=labels)
        fake_feats.append(extractor(imgs))
    fake = np.concatenate(fake_feats, axis=0)
    mu_f, s_f = feature_stats(fake)
    if out is not None:
        out.update(fake_features=fake, fake_mu=mu_f, fake_sigma=s_f)

    is_result = {}
    if is_splits is not None:
        fc = getattr(extractor, "fc", None)
        if fc is None:
            raise ValueError(
                "Inception Score needs an extractor with a classifier head "
                "(.fc) — pass an InceptionExtractor whose .npz includes "
                "fc.w/fc.b (scripts/convert_inception.py ships it)"
            )
        w, b = fc
        is_mean, is_std = inception_score(fake @ w + b, splits=is_splits)
        is_result = {"is_mean": is_mean, "is_std": is_std}

    if ref_stats is not None:
        if prdc_k is not None:
            raise ValueError(
                "prdc needs per-sample real features; ref_stats mode only "
                "has (mu, sigma) — pass a dataset (or precomputed features) "
                "instead"
            )
        mu_r, s_r = ref_stats
        return {
            "fid": frechet_distance(mu_f, s_f, mu_r, s_r),
            "kid": None,  # MMD needs per-sample features, not stats
            "n_fake": len(fake),
            "n_real": None,
            "real_side": "ref_stats",
            **is_result,  # IS is fake-side-only: available in stats mode
        }

    if dataset is None:
        raise ValueError("evaluate_generator needs a dataset or ref_stats")
    # stable key (NOT id(): default extractors are rebuilt per call and a
    # recycled id could return features from a DIFFERENT extractor)
    ex_token = getattr(extractor, "cache_token", repr(extractor))
    ds_token = f"{type(dataset).__name__}:{len(dataset)}"
    cache_key = ("real_features", ds_token, ex_token, seed, n_samples, label)
    real = cache.get(cache_key) if cache is not None else None
    if real is None:
        rng = np.random.default_rng(seed)
        pool = np.arange(len(dataset))
        if label is not None:
            ds_labels = getattr(dataset, "labels", None)
            if ds_labels is None:
                raise ValueError(
                    "per-class eval needs a dataset with a .labels array "
                    f"({type(dataset).__name__} has none)"
                )
            pool = pool[np.asarray(ds_labels) == label]
            if len(pool) == 0:
                raise ValueError(f"dataset has no examples of class {label}")
        idx = rng.choice(pool, min(n_samples, len(pool)), replace=False)
        real_imgs = np.stack([dataset.example(int(i))[0] for i in idx])
        real = features_in_batches(real_imgs, extractor, batch)
        if cache is not None:
            cache[cache_key] = real

    mu_r, s_r = feature_stats(real)
    if out is not None:
        out.update(real_features=real, real_mu=mu_r, real_sigma=s_r)
    result = {
        "fid": frechet_distance(mu_f, s_f, mu_r, s_r),
        "kid": kid(fake, real),
        "n_fake": len(fake),
        "n_real": len(real),
        **is_result,
    }
    if prdc_k is not None:
        result.update(prdc(real, fake, k=prdc_k))
    return result
