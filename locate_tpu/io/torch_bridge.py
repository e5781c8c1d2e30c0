"""Cross-framework weight portability: params pytree <-> PyTorch state_dict.

Migration path for users arriving from (or leaving to) a PyTorch codebase
(SURVEY.md §1: the reference is pure PyTorch): a trained generator or
discriminator moves across frameworks as one flat dict of named tensors.

Conventions converted (both directions):
  * 4-D conv kernels: JAX HWIO (this repo's lax.conv_general_dilated
    NHWC/HWIO layout, ops/conv.py) <-> torch OIHW (F.conv2d).
  * Everything else passes through unchanged: linear weights stay [in, out]
    (consumed as ``x @ w + b``, exactly as tests/torch_twin.py documents),
    biases, norm scale/bias, class embeddings.

Naming: pytree path joined with '.', sequence indices as numbers — e.g.
``trunk.0.1.main.2.row.w`` — the same addressing torch.nn.Module state
dicts use, so the file round-trips through ``torch.save``/``torch.load``
and standard state-dict tooling.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    elif tree is not None:
        out[prefix.rstrip(".")] = np.asarray(jax.device_get(tree))
    return out


def _is_conv_kernel(name: str, arr) -> bool:
    return name.rsplit(".", 1)[-1] == "w" and getattr(arr, "ndim", 0) == 4


def state_dict_from_params(params: Any) -> Dict[str, Any]:
    """Our params pytree -> {dotted name: torch.Tensor} (conv kernels
    transposed HWIO -> OIHW; bf16 leaves widened to float32 so the file
    loads under any torch build)."""
    import torch

    sd = {}
    for name, arr in _flatten(params).items():
        if arr.dtype.kind == "V" or str(arr.dtype) == "bfloat16":
            arr = arr.astype(np.float32)
        if _is_conv_kernel(name, arr):
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        # copy=True: jax-backed buffers arrive read-only and torch refuses
        # (warns on) non-writable storage
        sd[name] = torch.from_numpy(np.array(arr, copy=True))
    return sd


def params_from_state_dict(sd: Dict[str, Any], template: Any) -> Any:
    """Inverse of `state_dict_from_params`: rebuild a params pytree with the
    template's structure and per-leaf dtypes from a torch state_dict (or any
    {name: array} mapping). Conv kernels are transposed OIHW -> HWIO.
    Missing or extra names fail loudly."""
    import jax.numpy as jnp

    flat = {}
    for name, tensor in sd.items():
        arr = np.asarray(
            tensor.detach().cpu().float().numpy()
            if hasattr(tensor, "detach") else tensor
        )
        if _is_conv_kernel(name, arr):
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        flat[name] = arr

    want = _flatten(template)
    missing = sorted(set(want) - set(flat))
    extra = sorted(set(flat) - set(want))
    if missing or extra:
        raise ValueError(
            f"state_dict does not match the template: missing={missing[:5]} "
            f"extra={extra[:5]} (of {len(missing)}/{len(extra)})"
        )
    for name, ref in want.items():
        if flat[name].shape != ref.shape:
            raise ValueError(
                f"{name}: shape {flat[name].shape} != template {ref.shape}"
            )

    def rebuild(node: Any, prefix: str = "") -> Any:
        if isinstance(node, dict):
            return {k: rebuild(v, f"{prefix}{k}.") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            seq = [rebuild(v, f"{prefix}{i}.") for i, v in enumerate(node)]
            return tuple(seq) if isinstance(node, tuple) else seq
        if node is None:
            return None
        arr = flat[prefix.rstrip(".")]
        return jnp.asarray(arr, dtype=node.dtype)

    return rebuild(template)
