"""LocAtE location-based (positional) attention — the reference's namesake
block, rebuilt TPU-first.

Mechanism (SURVEY.md §1, §3 "LocAtE attention block"; BASELINE north_star):
attention weights are derived from per-location features plus an explicit
spatial-coordinate embedding, NOT from O(N^2) token-token similarity. Cost is
linear in the number of locations, so "sequence length" = H*W never hits an
O(N^2) wall even at 512^2 (SURVEY.md §6 "Long-context").

Computation (all 1x1 convs — pure MXU matmuls over the channel axis, the
ideal TPU shape):

    pos   = sinusoidal coordinate features, shape (H, W, P)   [static]
    h     = act(W1 @ concat(x, pos))            # bottleneck 1x1 conv
    a     = W2 @ h                              # gate logits, zero-init
    gate  = softmax_{H,W}(a) * H*W              # mean-1 normalized attention
          | sigmoid(a) * 2                      # unnormalized variant
    y     = x * gate                            # modulate the feature map
          | x * (1 + (gate - 1))  == x * gate   # residual form: identity at
                                                # init because W2 is zero-init

The gate math (`locate_gate`) is factored out so the fused Pallas kernel and
this XLA composition share one definition and can be diffed exactly
(SURVEY.md §5 test strategy #2).

Exact reference hyperparameters are reconstructions (the reference mount was
empty — SURVEY.md §0); everything is driven by `AttentionConfig`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from locate_tpu.config import AttentionConfig
from locate_tpu.nn.core import Layer
from locate_tpu.ops import initializers
from locate_tpu.ops.activations import act_fn
from locate_tpu.ops.conv import conv2d


@functools.lru_cache(maxsize=64)
def _coord_features_np(height: int, width: int, features: int) -> np.ndarray:
    """Sinusoidal coordinate embedding, shape (H, W, features).

    Half the channels encode the y axis, half the x axis; within each half,
    sin/cos pairs at octave frequencies of the normalized coordinate in
    [-1, 1]. Computed in numpy (shape-static) so it constant-folds under jit.
    """
    assert features % 4 == 0, "pos_features must be a multiple of 4"
    per_axis = features // 2
    n_freq = per_axis // 2
    ys = np.linspace(-1.0, 1.0, height, dtype=np.float32)
    xs = np.linspace(-1.0, 1.0, width, dtype=np.float32)
    freqs = (np.pi * 2.0 ** np.arange(n_freq, dtype=np.float32))[None, :]
    y_feat = np.concatenate(
        [np.sin(ys[:, None] * freqs), np.cos(ys[:, None] * freqs)], axis=-1
    )  # (H, per_axis)
    x_feat = np.concatenate(
        [np.sin(xs[:, None] * freqs), np.cos(xs[:, None] * freqs)], axis=-1
    )  # (W, per_axis)
    out = np.concatenate(
        [
            np.broadcast_to(y_feat[:, None, :], (height, width, per_axis)),
            np.broadcast_to(x_feat[None, :, :], (height, width, per_axis)),
        ],
        axis=-1,
    )
    return np.ascontiguousarray(out)


def coord_features(height: int, width: int, features: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_coord_features_np(height, width, features), dtype)


def locate_gate(x: jax.Array, logits: jax.Array, mode: str, residual: bool,
                gate_max: float = 0.0) -> jax.Array:
    """Shared gate math: modulate feature map `x` (N,H,W,C) by gate computed
    from `logits` (N,H,W,C or N,H,W,1). Softmax/stats in fp32.

    `gate_max` > 0 clamps the gate (`AttentionConfig.gate_max`): the
    mean-1 softmax gate is otherwise unbounded above by H*W, and a
    saturated gate collapses the feature map spatially — the r4 quality
    run's failure mode (docs/QUALITY_r4.md). where(g > M, M, g) so the
    subgradient at the boundary is 1, matching torch.clamp."""
    n, h, w, _ = logits.shape
    lf = logits.astype(jnp.float32)
    if mode == "softmax":
        flat = lf.reshape(n, h * w, lf.shape[-1])
        gate = jax.nn.softmax(flat, axis=1).reshape(lf.shape)
        if residual:
            # Scale to mean 1 so zero-init logits give the identity map.
            gate = gate * (h * w)
    elif mode == "sigmoid":
        gate = jax.nn.sigmoid(lf)
        if residual:
            # sigmoid(0) * 2 == 1: identity at zero-init logits.
            gate = gate * 2.0
    else:
        raise ValueError(f"unknown attention mode {mode!r}")
    if gate_max > 0.0:
        gate = jnp.where(gate > gate_max, jnp.float32(gate_max), gate)
    out = x.astype(jnp.float32) * gate
    return out.astype(x.dtype)


def locate_attention(
    channels: int,
    cfg: AttentionConfig,
    act: str = "leaky_relu",
    leaky_slope: float = 0.2,
    compute_dtype: Optional[jnp.dtype] = None,
    use_pallas: bool = False,
) -> Layer:
    """Location-based attention block for feature maps of `channels`.

    With `use_pallas` the residual-form block runs as the fused Pallas
    kernel (ops/pallas/fused_attention.py) on TPU backends; the XLA
    composition below remains the fallback and the numerical oracle.
    """
    hidden = max(8, channels // cfg.bottleneck)
    out_ch = channels if cfg.per_channel else 1
    in_ch = channels + cfg.pos_features
    to_hidden = conv2d(in_ch, hidden, (1, 1), compute_dtype=compute_dtype)
    # Zero-init the logit conv so the block is the identity at init
    # (training-stability choice; see module docstring).
    to_logits = conv2d(
        hidden, out_ch, (1, 1),
        weight_init=initializers.zeros, compute_dtype=compute_dtype,
    )
    activation = act_fn(act, leaky_slope)

    def init(key):
        k1, k2 = jax.random.split(key)
        return {"to_hidden": to_hidden.init(k1), "to_logits": to_logits.init(k2)}

    def apply_xla(params, x):
        n, h, w, c = x.shape
        cd = compute_dtype or x.dtype
        feats = x.astype(cd)
        if cfg.pos_features:
            pos = coord_features(h, w, cfg.pos_features, cd)
            feats = jnp.concatenate(
                [feats, jnp.broadcast_to(pos[None], (n, h, w, cfg.pos_features))],
                axis=-1,
            )
        hdn = activation(to_hidden.apply(params["to_hidden"], feats))
        logits = to_logits.apply(params["to_logits"], hdn)
        return locate_gate(x, logits, cfg.mode, cfg.residual, cfg.gate_max)

    def apply_pallas(params, x):
        from locate_tpu.ops.pallas.fused_attention import fused_locate_attention

        n, h, w, c = x.shape
        cd = compute_dtype or x.dtype
        w1 = params["to_hidden"]["w"][0, 0]            # (C+P, Hd)
        w1x, w1p = w1[:c], w1[c:]
        b1 = params["to_hidden"]["b"]
        w2 = params["to_logits"]["w"][0, 0]            # (Hd, Cout)
        b2 = params["to_logits"]["b"]
        if cfg.pos_features:
            pos = coord_features(h, w, cfg.pos_features, jnp.float32)
            pos_proj = pos.reshape(h * w, cfg.pos_features) @ w1p.astype(jnp.float32)
        else:
            pos_proj = jnp.zeros((h * w, w1.shape[1]), jnp.float32)
        # Interpret mode off-TPU so tests exercise the same kernel logic.
        interpret = jax.default_backend() == "cpu"
        return fused_locate_attention(
            x.astype(cd), pos_proj, w1x, b1, w2, b2,
            mode=cfg.mode, act=act, leaky_slope=leaky_slope,
            gate_max=cfg.gate_max, interpret=interpret,
        )

    def fused_profitable(hw: int) -> bool:
        """Measured never-slower gate (VERDICT r2 task 4; chained
        microbench table in docs/DESIGN.md): softmax mode beats XLA across
        the shape ladder (1.0-5.7x); sigmoid mode only wins at small
        spatial extents (1.3-1.8x at <= 16^2, 0.5-0.8x above, where the
        launch overhead of its single cheap pass dominates)."""
        if cfg.mode == "softmax":
            return True
        return hw <= 256

    def apply_dispatch(params, x):
        n, h, w, _ = x.shape
        if fused_profitable(h * w):
            return apply_pallas(params, x)
        return apply_xla(params, x)

    use_fused = use_pallas and cfg.residual
    if use_pallas and not cfg.residual:
        import warnings

        warnings.warn(
            "use_pallas requested but attention.residual=False: the fused "
            "kernel only implements the residual form — falling back to "
            "XLA (benchmarks of this config measure the XLA path)",
            stacklevel=2,
        )
    return Layer(init=init, apply=apply_dispatch if use_fused else apply_xla)
