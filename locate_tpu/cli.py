"""CLI entry points (SURVEY.md §8 `cli/`): train / sample / bench with
preset configs and key=value overrides.

    python -m locate_tpu train cifar10_32 train.global_batch=32
    python -m locate_tpu sample cifar10_32 --checkpoint runs/cifar10_32
    python -m locate_tpu bench 128 20        # batch, timed steps
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional

from locate_tpu.config import get_config, parse_cli_overrides



def _resolve_config(preset, overrides):
    """get_config + process-global side effects every subcommand wants:
    the persistent compilation cache (Config.compile_cache)."""
    cfg = get_config(preset, overrides)
    if cfg.compile_cache:
        from locate_tpu.utils import compile_cache

        compile_cache.enable(cfg.compile_cache)
    return cfg


def _split_args(argv: List[str]):
    """--key=value / --key value flags; bare key=value args are config
    overrides."""
    flags = {}
    overrides = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            key, eq, val = a[2:].partition("=")
            if eq:
                flags[key] = val
            elif i + 1 < len(argv) and not argv[i + 1].startswith("--") and "=" not in argv[i + 1]:
                flags[key] = argv[i + 1]
                i += 1
            else:
                flags[key] = True
        else:
            overrides.append(a)
        i += 1
    return flags, parse_cli_overrides(overrides)


def _str_flag(flags, key: str, default: Optional[str] = None) -> Optional[str]:
    """A flag that requires a string value. A bare `--out` (or one whose
    value was swallowed as a config override, e.g. `--out train.x=1`)
    parses as True — reject it instead of stringifying to "True"."""
    val = flags.get(key, default)
    if val is True:
        raise SystemExit(
            f"--{key} requires a value (use --{key}=VALUE or --{key} VALUE)"
        )
    return val


def cmd_train(argv: List[str]) -> int:
    from locate_tpu.parallel.distributed import initialize_from_env
    from locate_tpu.train.loop import train
    from locate_tpu.utils.profiling import profiler_trace

    initialize_from_env()  # no-op single-process; pod launchers set env
    preset = argv[0] if argv else "cifar10_32"
    flags, overrides = _split_args(argv[1:])
    if flags.get("debug-nans"):
        # Numerics sanitizer mode (SURVEY §6): every jitted computation
        # re-runs un-jitted on the first non-finite output and raises at
        # the producing primitive. ~2x slower + per-step sync; for
        # debugging a collapse, not production (production uses the
        # apply_if_finite skip + streak abort instead).
        import jax

        jax.config.update("jax_debug_nans", True)
    cfg = _resolve_config(preset, overrides)
    trace_dir = flags.get("profile")
    with profiler_trace(
        (cfg.workdir + "/trace") if trace_dir is True else trace_dir
    ):
        train(cfg, resume=not flags.get("no-resume"))
    return 0


def cmd_sample(argv: List[str]) -> int:
    """Generate an image grid from the latest checkpoint's (EMA) generator.

    --truncation=T applies the truncation trick (z-space, any family);
    --truncation-psi=P applies w-space truncation (model.arch=style);
    --interpolate renders a slerp interpolation sheet (--rows/--cols)
    instead of random samples.
    """
    import jax

    from locate_tpu.io.checkpoint import CheckpointManager
    from locate_tpu.io.sampling import (
        generate_samples,
        interpolation_grid,
        save_image_grid,
    )
    from locate_tpu.models.gan import build_gan
    from locate_tpu.train.state import create_train_state

    preset = argv[0] if argv else "cifar10_32"
    flags, overrides = _split_args(argv[1:])
    cfg = _resolve_config(preset, overrides)
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(cfg.train.seed))
    ckpt_dir = _str_flag(flags, "checkpoint") or cfg.workdir + "/checkpoints"
    mgr = CheckpointManager(ckpt_dir, keep=cfg.train.keep_checkpoints)
    state = mgr.restore(state)
    g_params = state.ema_params if state.ema_params is not None else state.g_params
    seed = int(_str_flag(flags, "seed", "0"))
    key = jax.random.PRNGKey(seed)
    grid_cols = None
    if flags.get("interpolate"):
        rows = int(_str_flag(flags, "rows", "4"))
        grid_cols = int(_str_flag(flags, "cols", "8"))
        imgs = interpolation_grid(gan, g_params, key, rows, grid_cols)
        count = rows * grid_cols
    else:
        count = int(_str_flag(flags, "count", "64"))
        label = _str_flag(flags, "label")  # conditional: one class only
        labels = None
        if label is not None:
            import jax.numpy as jnp

            if not cfg.model.num_classes:
                raise SystemExit("--label needs model.num_classes > 0")
            labels = jnp.full((count,), int(label))
        imgs = generate_samples(
            gan, g_params, key, count, labels=labels,
            truncation=float(_str_flag(flags, "truncation", "0.0")),
            truncation_psi=float(_str_flag(flags, "truncation-psi", "0.0")),
        )
    out = _str_flag(flags, "out") or f"{cfg.workdir}/samples/cli_step_{int(state.step)}.png"
    save_image_grid(imgs, out, cols=grid_cols)
    print(f"[locate-tpu] wrote {count} samples (step {int(state.step)}) to {out}")
    mgr.close()
    return 0


def cmd_project(argv: List[str]) -> int:
    """Invert images into the generator's latent space (GAN inversion;
    io/projection.py — the whole optimization is ONE compiled scan).

        locate-tpu project PRESET --images DIR [--count N] [--steps N]
                  [--lr F] [--out z.npy] [--recon grid.png] [--raw]
                  [--space z|w|w+]

    --images: folder of images (decoded + center-cropped + resized to the
    config's resolution) OR a .npy of uint8/float NHWC images. Labels for
    class-conditional models come from class subdirs when present.
    --raw projects through the raw generator instead of the EMA one.
    --space w / w+ (style family only): optimize the intermediate
    latent(s) instead of z — the StyleGAN2 projector convention, the
    practical choice for inverting real photographs.
    Writes the latents (and the loss history) to --out (.npz).
    """
    import jax
    import numpy as np

    from locate_tpu.data.datasets import ImageFolder
    from locate_tpu.io.checkpoint import CheckpointManager
    from locate_tpu.io.projection import project, reconstruction_grid
    from locate_tpu.io.sampling import save_image_grid
    from locate_tpu.models.gan import build_gan
    from locate_tpu.train.state import create_train_state

    preset = argv[0] if argv else "cifar10_32"
    flags, overrides = _split_args(argv[1:])
    cfg = _resolve_config(preset, overrides)
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(cfg.train.seed))
    ckpt_dir = _str_flag(flags, "checkpoint") or cfg.workdir + "/checkpoints"
    mgr = CheckpointManager(ckpt_dir, keep=cfg.train.keep_checkpoints)
    state = mgr.restore(state)
    g_params = (
        state.g_params
        if (flags.get("raw") or state.ema_params is None)
        else state.ema_params
    )

    src = _str_flag(flags, "images")
    if not src:
        raise SystemExit("project needs --images=DIR_or_NPY")
    count = int(_str_flag(flags, "count", "16"))
    labels = None
    if src.endswith(".npy"):
        arr = np.load(src)[:count]
        imgs = np.asarray(arr, np.float32)
        if imgs.max() > 2.0:  # uint8-range -> [-1, 1]
            imgs = imgs / 127.5 - 1.0
    else:
        ds = ImageFolder(src, cfg.model.resolution, cfg.model.img_channels)
        n = min(count, len(ds))
        pairs = [ds.example(i) for i in range(n)]
        imgs = np.stack([p[0] for p in pairs]).astype(np.float32) / 127.5 - 1.0
        if cfg.model.num_classes:
            labels = np.asarray([p[1] for p in pairs], np.int32)
    if cfg.model.num_classes and labels is None:
        labels = np.zeros((imgs.shape[0],), np.int32)

    steps = int(_str_flag(flags, "steps", "400"))
    space = _str_flag(flags, "space", "z")
    z, hist = project(
        gan, g_params, imgs, labels=labels, steps=steps,
        lr=float(_str_flag(flags, "lr", "0.05")),
        prior_weight=float(_str_flag(flags, "prior-weight", "1e-3")),
        space=space,
        key=jax.random.PRNGKey(int(_str_flag(flags, "seed", "0"))),
    )
    out = _str_flag(flags, "out") or f"{cfg.workdir}/projected_z.npz"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez(out, z=z, loss_history=hist, space=space,
             **({} if labels is None else {"labels": labels}))
    print(
        f"[locate-tpu] projected {imgs.shape[0]} images in {steps} steps: "
        f"loss {float(hist[0]):.4f} -> {float(hist[-1]):.4f}; z -> {out}"
    )
    recon = _str_flag(flags, "recon")
    if recon:
        grid = reconstruction_grid(gan, g_params, imgs, z, labels,
                                   space=space)
        save_image_grid(grid, recon, cols=2)
        print(f"[locate-tpu] wrote [target|recon] grid to {recon}")
    mgr.close()
    return 0


def cmd_export(argv: List[str]) -> int:
    """Export the latest checkpoint's (EMA) generator to a standalone .npz
    + .json serving artifact. `--compiled-batch N` additionally writes a
    self-contained COMPILED .stablehlo artifact (jax.export: weights baked
    in, runs under bare jax with no model code) for batch-N serving.
    `--torch=PATH.pt` additionally writes a PyTorch state_dict (torch
    layout conventions — io/torch_bridge.py) for cross-framework use."""
    import jax

    from locate_tpu.io.checkpoint import CheckpointManager
    from locate_tpu.io.export import export_generator
    from locate_tpu.models.gan import build_gan
    from locate_tpu.train.state import create_train_state

    preset = argv[0] if argv else "cifar10_32"
    flags, overrides = _split_args(argv[1:])
    cfg = _resolve_config(preset, overrides)
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(cfg.train.seed))
    mgr = CheckpointManager(
        _str_flag(flags, "checkpoint") or cfg.workdir + "/checkpoints",
        keep=cfg.train.keep_checkpoints,
    )
    state = mgr.restore(state)
    g_params = state.ema_params if state.ema_params is not None else state.g_params
    out = _str_flag(flags, "out") or f"{cfg.workdir}/export/generator_{int(state.step)}"
    path = export_generator(gan.config, g_params, out)
    print(f"[locate-tpu] exported generator (step {int(state.step)}) to {path}")
    compiled_batch = _str_flag(flags, "compiled-batch")
    if compiled_batch:
        from locate_tpu.io.export import export_compiled

        cpath = export_compiled(
            gan.config, g_params, out, batch=int(compiled_batch),
            compute_dtype=cfg.train.compute_dtype,
        )
        print(f"[locate-tpu] exported compiled serving artifact to {cpath}")
    torch_out = _str_flag(flags, "torch")
    if torch_out:
        import torch

        from locate_tpu.io.torch_bridge import state_dict_from_params

        torch.save(state_dict_from_params(g_params), torch_out)
        print(f"[locate-tpu] exported torch state_dict to {torch_out}")
    mgr.close()
    return 0


def cmd_eval(argv: List[str]) -> int:
    """Offline FID/KID eval of the latest checkpoint vs the config's
    dataset (rFID/rKID with the built-in random extractor; pass
    --extractor=path.npz for vendored weights).

    Stats escape hatch (no Inception weights needed on this host):
      --ref-stats=PATH.npz   real-side (mu, sigma) computed externally
                             (pytorch-fid --save-stats convention) —
                             replaces the dataset entirely; TRUE FID when
                             paired with a matching --extractor.
      --stats-out=PATH.npz   write the GENERATED samples' (mu, sigma)
                             (keys mu/sigma) for external FID computation.
      --real-stats-out=PATH.npz  write the REAL side's (mu, sigma) — run
                             once with a vendored --extractor to mint the
                             ref-stats file other machines consume.
      --features-out=PATH.npz  write raw feature matrices
                             (fake_features [+ real_features]) for
                             external FID/KID/PR computation.
      --prdc-k=K             also report precision/recall/density/coverage
                             (kNN manifold metrics, arXiv 1904.06991 /
                             2002.09797) at kNN size K (e.g. 5). Needs the
                             dataset (not available with --ref-stats).
      --per-class            conditional models: also report FID/KID per
                             class (fakes conditioned on each label vs the
                             dataset's same-label examples) + worst/mean —
                             aggregate FID hides class dropping.
      --inception-score[=S]  also report Inception Score (is_mean/is_std,
                             S splits, default 10; arXiv 1606.03498 §4).
                             Needs an --extractor .npz that includes the
                             fc head (convert_inception.py ships it);
                             works with --ref-stats too (IS is fake-only).
      --swd                  also report sliced Wasserstein distance over
                             Laplacian-pyramid patches (ProGAN arXiv
                             1710.10196 §5: swd_<res> per level x1e3 +
                             swd_avg) — a quality metric needing NO
                             pretrained weights, fully computable on this
                             host. Needs the dataset (not --ref-stats).
      --dp                   run the eval data-parallel over ALL devices:
                             sharded generation + sharded feature
                             extraction (same latent streams; a pod
                             evaluates at pod speed).
    """
    import json

    import jax
    import numpy as np

    from locate_tpu.data.datasets import make_dataset
    from locate_tpu.io.checkpoint import CheckpointManager
    from locate_tpu.io.fid import (
        NpzFeatureExtractor,
        RandomConvFeatures,
        evaluate_generator,
        load_stats,
        save_stats,
    )
    from locate_tpu.models.gan import build_gan
    from locate_tpu.train.state import create_train_state

    preset = argv[0] if argv else "cifar10_32"
    flags, overrides = _split_args(argv[1:])
    cfg = _resolve_config(preset, overrides)
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(cfg.train.seed))
    ckpt_dir = _str_flag(flags, "checkpoint") or cfg.workdir + "/checkpoints"
    mgr = CheckpointManager(ckpt_dir, keep=cfg.train.keep_checkpoints)
    state = mgr.restore(state)
    g_params = state.ema_params if state.ema_params is not None else state.g_params
    mesh = None
    ex_shard = None
    if flags.get("dp") and len(jax.devices()) > 1:
        # data-parallel eval over every device: sharded generation
        # (ShardedSampler) + sharded feature extraction
        from jax.sharding import NamedSharding, PartitionSpec
        from locate_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.parallel)
        ex_shard = NamedSharding(mesh, PartitionSpec(cfg.parallel.data_axis))
    extractor_path = _str_flag(flags, "extractor")
    extractor = (
        NpzFeatureExtractor(extractor_path, sharding=ex_shard)
        if extractor_path
        else RandomConvFeatures(sharding=ex_shard)
    )
    ref_stats_path = _str_flag(flags, "ref-stats")
    stats_out = _str_flag(flags, "stats-out")
    real_stats_out = _str_flag(flags, "real-stats-out")
    features_out = _str_flag(flags, "features-out")
    if real_stats_out and ref_stats_path:
        raise SystemExit(
            "--real-stats-out needs the dataset path (it computes the real "
            "side); drop --ref-stats"
        )
    arrays: dict = {}
    result = evaluate_generator(
        gan, g_params,
        None if ref_stats_path else make_dataset(cfg.data),
        n_samples=int(_str_flag(flags, "samples", "1024")),
        extractor=extractor,
        ref_stats=load_stats(ref_stats_path) if ref_stats_path else None,
        out=arrays if (stats_out or real_stats_out or features_out) else None,
        prdc_k=(
            int(_str_flag(flags, "prdc-k")) if _str_flag(flags, "prdc-k")
            else None
        ),
        is_splits=(
            10 if flags.get("inception-score") is True
            else int(flags["inception-score"])
        ) if flags.get("inception-score") else None,
        mesh=mesh,
    )
    if stats_out:
        save_stats(stats_out, arrays["fake_mu"], arrays["fake_sigma"],
                   n=np.int64(result["n_fake"]))
        result["stats_out"] = stats_out
    if real_stats_out:
        save_stats(real_stats_out, arrays["real_mu"], arrays["real_sigma"],
                   n=np.int64(result["n_real"]))
        result["real_stats_out"] = real_stats_out
    if features_out:
        feats = {"fake_features": arrays["fake_features"]}
        if "real_features" in arrays:
            feats["real_features"] = arrays["real_features"]
        np.savez(features_out, **feats)
        result["features_out"] = features_out
    if flags.get("per-class"):
        # per-class FID surfaces class dropping that aggregate FID hides
        if not cfg.model.num_classes:
            raise SystemExit("--per-class needs a conditional model "
                             "(model.num_classes > 0)")
        if ref_stats_path:
            raise SystemExit("--per-class needs the dataset, not --ref-stats")
        ds = make_dataset(cfg.data)
        n_per = int(_str_flag(flags, "samples", "1024"))
        per = {}
        for cls in range(cfg.model.num_classes):
            r = evaluate_generator(
                gan, g_params, ds, n_samples=n_per, extractor=extractor,
                label=cls, mesh=mesh,
            )
            per[cls] = {"fid": r["fid"], "kid": r["kid"],
                        "n_real": r["n_real"]}
        result["per_class"] = per
        fids = [v["fid"] for v in per.values()]
        result["per_class_fid_worst"] = max(fids)
        result["per_class_fid_mean"] = float(np.mean(fids))
    if flags.get("swd"):
        if ref_stats_path:
            raise SystemExit("--swd compares raw images — it needs the "
                             "dataset, not --ref-stats")
        from locate_tpu.io.swd import swd_generator

        result.update(swd_generator(
            gan, g_params, make_dataset(cfg.data),
            n_samples=int(_str_flag(flags, "samples", "1024")),
            seed=cfg.train.seed,
        ))
    result["step"] = int(state.step)
    print(json.dumps(result))
    mgr.close()
    return 0


def cmd_pack(argv: List[str]) -> int:
    """One-time offline pack of the config's dataset into pre-decoded,
    pre-resized uint8 memmap shards (`--out DIR`, `--shard-size N`).
    Training then uses `data.dataset=packed data.path=DIR` and the host
    input path is pure page-cache memcpy (no per-epoch decode)."""
    from locate_tpu.data.datasets import make_dataset
    from locate_tpu.data.packed import pack_dataset

    preset = argv[0] if argv else "cifar10_32"
    flags, overrides = _split_args(argv[1:])
    cfg = _resolve_config(preset, overrides)
    src = make_dataset(cfg.data)
    out = _str_flag(flags, "out") or (
        (cfg.data.path.rstrip("/") or cfg.workdir)
        + f"_packed{cfg.data.resolution}"
    )
    path = pack_dataset(
        src, out,
        shard_size=int(_str_flag(flags, "shard-size", "4096")),
        batch_size=int(_str_flag(flags, "batch", "64")),
        progress=True,
    )
    print(
        f"[locate-tpu] packed {len(src)} examples @ {cfg.data.resolution}px "
        f"to {path} — train with data.dataset=packed data.path={path}"
    )
    return 0


def cmd_lsun_export(argv: List[str]) -> int:
    """Export an LSUN LMDB archive to an image folder
    (`lsun-export <lmdb_dir> <out_dir> [--limit N]`); the folder then
    feeds `train data.dataset=folder` or the `pack` CLI. Export is
    optional — `data.dataset=lsun` trains from the archive directly via
    the dependency-free reader (data/lmdb_reader.py)."""
    from locate_tpu.data.lsun import lsun_to_folder

    if len(argv) < 2:
        print("usage: lsun-export <lmdb_dir> <out_dir> [--limit N]")
        return 1
    flags, _ = _split_args(argv[2:])
    limit = flags.get("limit")
    n = lsun_to_folder(argv[0], argv[1],
                       limit=int(limit) if limit else None, progress=True)
    print(f"[locate-tpu] exported {n} LSUN records to {argv[1]}")
    return 0


def cmd_bench_input(argv: List[str]) -> int:
    """Host input-pipeline throughput (images/sec, no device): measures
    the producer thread incl. native decode (SURVEY.md hard part #4 —
    the host must outrun the chips)."""
    import json
    import time

    from locate_tpu.data.datasets import make_dataset
    from locate_tpu.data.pipeline import BatchProducer

    preset = argv[0] if argv else "cifar10_32"
    flags, overrides = _split_args(argv[1:])
    cfg = _resolve_config(preset, overrides)
    batches = int(_str_flag(flags, "batches", "20"))
    prod = BatchProducer(
        make_dataset(cfg.data), cfg.train.global_batch,
        random_flip=cfg.data.random_flip, seed=0,
    )
    it = iter(prod)
    next(it)  # warm up
    t0 = time.perf_counter()
    for _ in range(batches):
        next(it)
    dt = time.perf_counter() - t0
    prod.close()
    print(json.dumps({
        "metric": f"input pipeline images/sec ({cfg.data.dataset}, {cfg.data.resolution}px)",
        "value": round(batches * cfg.train.global_batch / dt, 2),
        "unit": "images/sec",
    }))
    return 0


def cmd_bench(argv: List[str]) -> int:
    """`bench [batch] [steps] [xla|fused|e2e|spc=N]` — preset names and
    key=value overrides are ignored by bench.py (it pins the
    primary-metric config), so only numeric/flag args are forwarded."""
    import bench

    forwarded = [
        a for a in argv
        if a.isdigit() or a in ("xla", "fused", "e2e")
        or (a.startswith("spc=") and a[4:].isdigit())
    ]
    sys.argv = ["bench.py"] + forwarded
    bench.main()
    return 0


def cmd_bench_sample(argv: List[str]) -> int:
    """`bench-sample PRESET [overrides] [--batch N] [--steps N]
    [--checkpoint DIR] [--dp]` — serving throughput: images/sec
    generating in `train.compute_dtype`, device compute + host transfer
    included (exactly what a sampling service pays per request batch).
    Loads the latest checkpoint's (EMA) generator when one exists (or
    --checkpoint is given); otherwise times freshly initialized weights —
    throughput is weight-value-independent either way. `--dp` shards each
    request batch over ALL devices (io.sampling.ShardedSampler) for
    multi-chip serving."""
    import json
    import time

    import jax

    from locate_tpu.io.sampling import generate_samples
    from locate_tpu.models.gan import build_gan

    preset = argv[0] if argv else "cifar10_32"
    flags, overrides = _split_args(argv[1:])
    cfg = _resolve_config(preset, overrides)
    batch = int(_str_flag(flags, "batch", "64"))
    steps = int(_str_flag(flags, "steps", "20"))
    if batch < 1 or steps < 1:
        raise SystemExit("usage: --batch and --steps must be >= 1")
    gan = build_gan(cfg)
    params = gan.init(jax.random.PRNGKey(0))["generator"]
    ckpt_dir = _str_flag(flags, "checkpoint") or cfg.workdir + "/checkpoints"
    weights = "init"
    # Only open a manager when a checkpoint dir actually exists —
    # CheckpointManager(create=True) would mkdir <workdir>/checkpoints as
    # a side effect of merely benchmarking init weights.
    if os.path.isdir(ckpt_dir):
        from locate_tpu.io.checkpoint import CheckpointManager
        from locate_tpu.train.state import create_train_state

        mgr = CheckpointManager(ckpt_dir, keep=cfg.train.keep_checkpoints)
        try:
            if mgr.latest_step() is not None:
                state = mgr.restore(
                    create_train_state(cfg, gan, jax.random.PRNGKey(cfg.train.seed))
                )
                params = (
                    state.ema_params if state.ema_params is not None
                    else state.g_params
                )
                weights = "ema" if state.ema_params is not None else "g"
        finally:
            mgr.close()
    key = jax.random.PRNGKey(1)
    if flags.get("dp"):
        from locate_tpu.io.sampling import ShardedSampler

        sampler = ShardedSampler(gan, params)
        sample = lambda k, n: sampler(k, n)  # noqa: E731
        devices = sampler.n_devices
    else:
        sample = lambda k, n: generate_samples(gan, params, k, n)  # noqa: E731
        devices = 1
    # compile + warmup
    sample(key, batch)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(steps):
            sample(jax.random.fold_in(key, i), batch)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "metric": (
            f"generator sampling images/sec ({cfg.model.resolution}px, "
            f"batch {batch}, {cfg.train.compute_dtype}, incl. host transfer"
            + (f", sharded over {devices} devices)" if devices > 1 else ")")
        ),
        "value": round(steps * batch / best, 2),
        "unit": "images/sec",
        "sec_per_batch": round(best / steps, 5),
        "devices": devices,
        "weights": weights,
    }))
    return 0


def _infer_dataset_kind(path: str) -> str:
    """Map a filesystem path to the DataConfig.dataset kind reading it:
    .zip archives, LMDB environments (data.mdb / .mdb), TFRecord shards,
    packed dirs (meta.json), else an image folder."""
    low = path.lower()
    if low.endswith(".zip"):
        return "zip"
    if low.endswith(".mdb") or os.path.isfile(os.path.join(path, "data.mdb")):
        return "lsun"
    if low.endswith((".tfrecord", ".tfrecords")):
        return "tfrecord"
    if os.path.isfile(os.path.join(path, "meta.json")):
        return "packed"
    return "folder"


def cmd_compare(argv: List[str]) -> int:
    """`compare --a=PATH --b=PATH [--resolution=R] [--samples=N]
    [--extractor=npz] [--swd] [--prdc-k=K] [--seed=S]` — dataset-vs-
    dataset metrics with NO model involved (the pytorch-fid workflow):
    FID/KID between two image sources (folder / zip / LMDB / TFRecord /
    packed — inferred from the path), optionally SWD (raw pixels, no
    weights needed) and precision/recall/density/coverage. Use cases:
    score an exported sample dump against the dataset, validate a pack
    or format conversion (identical sources -> all-zero metrics), or
    compare two datasets."""
    import json

    import numpy as np

    from locate_tpu.config import DataConfig
    from locate_tpu.data.datasets import make_dataset
    from locate_tpu.io.fid import (
        NpzFeatureExtractor,
        RandomConvFeatures,
        feature_stats,
        features_in_batches,
        frechet_distance,
        kid,
        prdc,
    )

    flags, overrides = _split_args(argv)
    if overrides:
        raise SystemExit(f"compare takes flags only, got {overrides}")
    a_path, b_path = _str_flag(flags, "a"), _str_flag(flags, "b")
    if not a_path or not b_path:
        raise SystemExit("compare needs --a=PATH and --b=PATH")
    res = int(_str_flag(flags, "resolution", "256"))
    n = int(_str_flag(flags, "samples", "1024"))
    seed = int(_str_flag(flags, "seed", "0"))
    extractor_path = _str_flag(flags, "extractor")
    extractor = (NpzFeatureExtractor(extractor_path) if extractor_path
                 else RandomConvFeatures())

    def load(path):
        kind = _infer_dataset_kind(path)
        ds = make_dataset(DataConfig(dataset=kind, path=path, resolution=res))
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(ds), min(n, len(ds)), replace=False)
        return kind, np.stack([ds.example(int(i))[0] for i in idx])

    kind_a, imgs_a = load(a_path)
    kind_b, imgs_b = load(b_path)
    m = min(len(imgs_a), len(imgs_b))
    imgs_a, imgs_b = imgs_a[:m], imgs_b[:m]
    fa = features_in_batches(imgs_a, extractor)
    fb = features_in_batches(imgs_b, extractor)
    result = {
        "a": {"path": a_path, "kind": kind_a, "n": int(m)},
        "b": {"path": b_path, "kind": kind_b, "n": int(m)},
        "fid": frechet_distance(*feature_stats(fa), *feature_stats(fb)),
        "kid": kid(fa, fb),
        "extractor": "npz" if extractor_path else "random-conv (rFID)",
    }
    k_prdc = _str_flag(flags, "prdc-k")
    if k_prdc:
        result.update(prdc(fa, fb, k=int(k_prdc)))
    if flags.get("swd"):
        from locate_tpu.io.swd import swd

        result.update(swd(imgs_a, imgs_b, seed=seed))
    print(json.dumps(result))
    return 0


def cmd_info(argv: List[str]) -> int:
    """`info PRESET [overrides]` — model and memory planning without
    touching a device: per-stage shapes, parameter counts (G/D/total),
    and the per-device training-state HBM budget (params + Adam moments
    + EMA shadow, divided per the configured ZeRO stage and mesh size).
    Everything comes from `jax.eval_shape` over the real constructors —
    no arrays are materialized, so ffhq_512 answers instantly."""
    import json

    import jax
    import numpy as np

    from locate_tpu.models.gan import build_gan

    preset = argv[0] if argv else "cifar10_32"
    flags, overrides = _split_args(argv[1:])
    cfg = _resolve_config(preset, overrides)
    gan = build_gan(cfg)

    def count(tree):
        return int(sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree)))

    shapes = jax.eval_shape(gan.init, jax.random.PRNGKey(0))
    n_g, n_d = count(shapes["generator"]), count(shapes["discriminator"])
    n_total = n_g + n_d
    # fp32 training state per replica: params + Adam mu/nu (both nets)
    # + EMA shadow of G. ZeRO-1 shards the moments+EMA over `data`,
    # ZeRO-3 the params too (parallel/sharding.py).
    ema_on = cfg.train.ema_decay > 0
    ema_bytes = n_g * (2 if cfg.train.ema_dtype == "bfloat16" else 4)
    dp = cfg.parallel.data_parallel
    dp = len(jax.devices()) if dp == -1 else dp
    z = cfg.parallel.zero_stage
    param_bytes = n_total * 4 / (dp if z >= 3 else 1)
    opt_bytes = (n_total * 2 * 4 + (ema_bytes if ema_on else 0)) / (
        dp if z >= 1 else 1
    )
    batch_bytes = (
        cfg.train.global_batch * cfg.model.resolution**2
        * cfg.model.img_channels
    ) // max(dp, 1)
    info = {
        "preset": cfg.name,
        "arch": cfg.model.arch,
        "resolution": cfg.model.resolution,
        "stage_resolutions": list(cfg.model.stage_resolutions()),
        "stage_channels": list(cfg.model.stage_channels()),
        "g_rgb": cfg.model.g_rgb,
        "params_g": n_g,
        "params_d": n_d,
        "params_total": n_total,
        "zero_stage": z,
        "data_parallel": dp,
        "state_bytes_per_device": int(param_bytes + opt_bytes),
        "state_mib_per_device": round(
            (param_bytes + opt_bytes) / 2**20, 1
        ),
        "input_bytes_per_device_per_step": int(batch_bytes),
        "global_batch": cfg.train.global_batch,
        "compute_dtype": cfg.train.compute_dtype,
    }
    if cfg.model.arch == "style":
        info["num_ws"] = gan.generator.num_ws
    print(json.dumps(info))
    return 0


COMMANDS = {
    "train": cmd_train,
    "compare": cmd_compare,
    "info": cmd_info,
    "sample": cmd_sample,
    "project": cmd_project,
    "eval": cmd_eval,
    "export": cmd_export,
    "pack": cmd_pack,
    "lsun-export": cmd_lsun_export,
    "bench": cmd_bench,
    "bench-input": cmd_bench_input,
    "bench-sample": cmd_bench_sample,
}


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in COMMANDS:
        print(__doc__)
        print(f"commands: {sorted(COMMANDS)}")
        return 0 if argv and argv[0] in ("-h", "--help") else 1
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
