"""Generator export for serving: a trained (EMA) generator saved as one
portable .npz plus its config, loadable without the training stack. The
serving path is sampling (SURVEY.md §4.3); this gives it a deployable
artifact independent of orbax checkpoint layout."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from locate_tpu.config import AttentionConfig, ModelConfig, StyleConfig
from locate_tpu.models.generator import Generator, build_generator


def _flatten(tree: Any, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten_into(template: Any, flat: dict, prefix: str = "") -> Any:
    if isinstance(template, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}{k}/") for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        seq = [
            _unflatten_into(v, flat, f"{prefix}{i}/") for i, v in enumerate(template)
        ]
        return type(template)(seq) if isinstance(template, tuple) else seq
    return flat[prefix.rstrip("/")]


def export_generator(model_cfg: ModelConfig, g_params: Any, path: str) -> str:
    """Write <path>.npz (flattened params) and <path>.json (model config)."""
    base = path[:-4] if path.endswith(".npz") else path
    os.makedirs(os.path.dirname(base) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(g_params))
    # np.savez writes ml_dtypes bfloat16 as raw '|V2' void arrays that
    # np.load cannot hand back to JAX — widen non-numpy dtypes (the bf16
    # EMA shadow, train.ema_dtype=bfloat16) to float32 for portability.
    flat = {
        k: (v.astype(np.float32) if v.dtype.kind == "V" else v)
        for k, v in flat.items()
    }
    np.savez(base + ".npz", **flat)
    with open(base + ".json", "w") as f:
        json.dump(dataclasses.asdict(model_cfg), f, indent=2)
    return base + ".npz"


def export_compiled(
    model_cfg: ModelConfig,
    g_params: Any,
    path: str,
    batch: int = 64,
    compute_dtype=None,
    platforms: Tuple[str, ...] = (),
) -> str:
    """Serialize the COMPILED generator as a self-contained StableHLO
    artifact (`jax.export`): weights baked in as constants, callable with
    just (z[, labels]) — the TPU-native analogue of a frozen serving
    graph. Unlike the .npz (weights + python model code), this artifact
    runs under any jax/jaxlib with no locate_tpu on the path, and pins the
    exact compiled numerics of this build.

    `platforms` defaults to the current backend; when overriding (e.g.
    ("tpu", "cpu")) note the Pallas-vs-XLA kernel dispatch follows the
    TRACING backend — export on the machine class you serve on to get the
    fused TPU kernels in the artifact.

    Writes <base>.stablehlo (serialized bytes) + <base>.stablehlo.json
    (call signature sidecar). Returns the .stablehlo path.
    """
    from jax import export as jax_export

    base = path[:-4] if path.endswith(".npz") else path
    os.makedirs(os.path.dirname(base) or ".", exist_ok=True)
    gen = build_generator(model_cfg, compute_dtype)
    params = jax.device_get(g_params)  # bake as host constants

    conditional = model_cfg.num_classes > 0
    if conditional:
        fn = jax.jit(lambda z, labels: gen.apply(params, z, labels))
        args = (
            jax.ShapeDtypeStruct((batch, model_cfg.latent_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch,), np.int32),
        )
    else:
        fn = jax.jit(lambda z: gen.apply(params, z, None))
        args = (jax.ShapeDtypeStruct((batch, model_cfg.latent_dim), jnp.float32),)
    exp = jax_export.export(fn, platforms=tuple(platforms) or None)(*args)
    with open(base + ".stablehlo", "wb") as f:
        f.write(exp.serialize())
    with open(base + ".stablehlo.json", "w") as f:
        json.dump(
            {
                "batch": batch,
                "latent_dim": model_cfg.latent_dim,
                "num_classes": model_cfg.num_classes,
                "resolution": model_cfg.resolution,
                "platforms": list(exp.platforms),
            },
            f,
            indent=2,
        )
    return base + ".stablehlo"


def load_compiled(path: str):
    """Load a `.stablehlo` artifact: returns (callable, signature dict).
    The callable takes (z[, labels]) at exactly the exported batch size
    and needs ONLY jax — no model code, no weights file."""
    base = path[: -len(".stablehlo")] if path.endswith(".stablehlo") else path
    from jax import export as jax_export

    with open(base + ".stablehlo", "rb") as f:
        exp = jax_export.deserialize(f.read())
    with open(base + ".stablehlo.json") as f:
        sig = json.load(f)
    return exp.call, sig


def load_generator(path: str, compute_dtype=None) -> Tuple[Generator, Any]:
    """Load an exported generator: returns (Generator, params)."""
    base = path[:-4] if path.endswith(".npz") else path
    with open(base + ".json") as f:
        raw = json.load(f)
    raw["attention"] = AttentionConfig(**raw["attention"])
    if isinstance(raw.get("style"), dict):  # style-family sub-config
        raw["style"] = StyleConfig(**raw["style"])
    if isinstance(raw.get("attention_stages"), list):
        raw["attention_stages"] = tuple(raw["attention_stages"])
    model_cfg = ModelConfig(**raw)
    gen = build_generator(model_cfg, compute_dtype)
    template = gen.init(jax.random.PRNGKey(0))
    flat = dict(np.load(base + ".npz"))
    params = _unflatten_into(template, flat)
    return gen, params
