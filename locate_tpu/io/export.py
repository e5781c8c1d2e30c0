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

from locate_tpu.config import AttentionConfig, ModelConfig
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


def load_generator(path: str, compute_dtype=None) -> Tuple[Generator, Any]:
    """Load an exported generator: returns (Generator, params)."""
    base = path[:-4] if path.endswith(".npz") else path
    with open(base + ".json") as f:
        raw = json.load(f)
    raw["attention"] = AttentionConfig(**raw["attention"])
    if isinstance(raw.get("attention_stages"), list):
        raw["attention_stages"] = tuple(raw["attention_stages"])
    model_cfg = ModelConfig(**raw)
    gen = build_generator(model_cfg, compute_dtype)
    template = gen.init(jax.random.PRNGKey(0))
    flat = dict(np.load(base + ".npz"))
    params = _unflatten_into(template, flat)
    return gen, params
