"""Fused LocAtE attention Pallas kernels (SURVEY.md §8 M6; BASELINE:
"conv + attention + norm + activation in a single pass").

The location-attention block is two 1x1 convs (pure per-location matmuls)
around an activation, a gate normalization, and a multiply:

    u = x @ W1x + pos_proj + b1      (T, Hd)   per-location
    h = act(u)
    l = h @ W2 + b2                  (T, Cout) per-location
    g = 2*sigmoid(l)                  [sigmoid mode, tile-local]
      | softmax_{HW}(l) * HW          [softmax mode, spatial-global]
    y = x * g

XLA compiles this as 2 matmul fusions + a reduce + an elementwise fusion,
materializing `u`/`l`/`g` in HBM between them. The Pallas kernel keeps the
whole chain in VMEM per spatial tile: x is read once and y written once —
the block runs at its HBM-traffic lower bound (2 passes of (HW, C)).

* sigmoid mode: everything is per-location -> ONE kernel, grid (N, S) over
  spatial tiles.
* softmax mode: the spatial softmax couples locations -> flash-style two
  kernels over the same grid: (1) running max/sum-exp accumulated across a
  batch row's tiles in VMEM scratch (TPU grids iterate sequentially, so
  scratch carries across the S dimension), (2) recompute logits and apply
  the normalized gate. Logits are recomputed instead of stored: the gate
  MLP matmuls are ~C^2/2 FLOPs per location, far cheaper than an (HW, C)
  HBM round-trip.

`pos_proj` (the coordinate embedding already projected through its slice of
W1) is precomputed in XLA: it is batch-independent and constant-folds, and
keeping it out of the kernel avoids a (T, P) block with a tiny
non-128-aligned lane dimension.

Backward: custom_vjp that recomputes via the pure-XLA composition
(`locate_attention_xla_core`) — mathematically exact, keeps the fused
forward in the hot sampling/D-fwd path; a hand-written Pallas backward is a
later optimization.

The XLA composition is both the fallback and the test oracle
(SURVEY.md §5 item 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(kind: str, slope: float):
    if kind == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, slope)
    if kind == "relu":
        return jax.nn.relu
    if kind == "silu":
        return jax.nn.silu
    if kind == "gelu":
        return jax.nn.gelu
    raise ValueError(f"unsupported activation for fused attention: {kind!r}")


def locate_attention_xla_core(
    x2d: jax.Array,       # (N, HW, C)
    pos_proj: jax.Array,  # (HW, Hd) fp32
    w1x: jax.Array,       # (C, Hd)
    b1: jax.Array,        # (Hd,)
    w2: jax.Array,        # (Hd, Cout)
    b2: jax.Array,        # (Cout,)
    *,
    mode: str,
    act: str,
    leaky_slope: float,
    hw_scale: float,
) -> jax.Array:
    """Pure-XLA composition — fallback & oracle; numerics match the kernels
    (compute-dtype matmuls with f32 accumulation, gate math in f32)."""
    a = _act(act, leaky_slope)
    cd = x2d.dtype
    u = (
        jnp.einsum("nsc,ch->nsh", x2d, w1x.astype(cd),
                   preferred_element_type=jnp.float32)
        + pos_proj[None]
        + b1.astype(jnp.float32)
    )
    h = a(u).astype(cd)
    l = (
        jnp.einsum("nsh,hc->nsc", h, w2.astype(cd),
                   preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32)
    )
    if mode == "sigmoid":
        g = jax.nn.sigmoid(l) * 2.0
    else:
        g = jax.nn.softmax(l, axis=1) * hw_scale
    return (x2d.astype(jnp.float32) * g).astype(cd)


# ---------------------------------------------------------------------------
# kernels (grid = (N, S) spatial tiles; weights pre-cast to compute dtype)
# ---------------------------------------------------------------------------


def _gate_logits(x_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref, act, leaky_slope):
    xb = x_ref[0]                                               # (T, C)
    u = jnp.dot(xb, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + pp_ref[:] + b1_ref[:]
    h = _act(act, leaky_slope)(u).astype(xb.dtype)
    l = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    return l + b2_ref[:]                                        # (T, Cout) f32


def _sigmoid_kernel(x_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                    *, act, leaky_slope):
    l = _gate_logits(x_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref, act, leaky_slope)
    g = jax.nn.sigmoid(l) * 2.0
    o_ref[0] = (x_ref[0].astype(jnp.float32) * g).astype(o_ref.dtype)


def _softmax_stats_kernel(x_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                          m_ref, s_ref, m_acc, s_acc, *, act, leaky_slope):
    sidx = pl.program_id(1)
    l = _gate_logits(x_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref, act, leaky_slope)
    tile_max = jnp.max(l, axis=0, keepdims=True)          # (1, Cout)
    tile_sum = jnp.sum(jnp.exp(l - tile_max), axis=0, keepdims=True)

    @pl.when(sidx == 0)
    def _():
        m_acc[:] = tile_max
        s_acc[:] = tile_sum

    @pl.when(sidx > 0)
    def _():
        m_old = m_acc[:]
        m_new = jnp.maximum(m_old, tile_max)
        s_acc[:] = (
            s_acc[:] * jnp.exp(m_old - m_new) + tile_sum * jnp.exp(tile_max - m_new)
        )
        m_acc[:] = m_new

    @pl.when(sidx == pl.num_programs(1) - 1)
    def _():
        m_ref[0] = m_acc[:]
        s_ref[0] = s_acc[:]


def _softmax_apply_kernel(x_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                          m_ref, s_ref, o_ref, *, act, leaky_slope, hw_scale):
    l = _gate_logits(x_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref, act, leaky_slope)
    g = jnp.exp(l - m_ref[0]) / s_ref[0] * hw_scale
    o_ref[0] = (x_ref[0].astype(jnp.float32) * g).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrapper with custom VJP
# ---------------------------------------------------------------------------


def _pick_tile(hw: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if hw % t == 0:
            return t
    return hw


def _pallas_forward(x2d, pos_proj, w1x, b1, w2, b2, *, mode, act, leaky_slope,
                    hw_scale, interpret):
    n, hw, c = x2d.shape
    hd = w1x.shape[1]
    cout = w2.shape[1]
    t = _pick_tile(hw)
    s = hw // t
    cd = x2d.dtype

    # pre-cast weights to the compute dtype; biases/pos_proj stay f32 (they
    # join post-matmul f32 accumulators)
    w1c = w1x.astype(cd)
    w2c = w2.astype(cd)
    b1r = b1.reshape(1, hd).astype(jnp.float32)
    b2r = b2.reshape(1, cout).astype(jnp.float32)
    ppf = pos_proj.astype(jnp.float32)

    kern = functools.partial
    x_spec = pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    pp_spec = pl.BlockSpec((t, hd), lambda i, j: (j, 0), memory_space=pltpu.VMEM)

    def full(shape):
        nzeros = len(shape)
        return pl.BlockSpec(
            shape, lambda i, j, _n=nzeros: (0,) * _n, memory_space=pltpu.VMEM
        )

    w_specs = [full(w1c.shape), full((1, hd)), full(w2c.shape), full((1, cout))]

    if mode == "sigmoid":
        return pl.pallas_call(
            kern(_sigmoid_kernel, act=act, leaky_slope=leaky_slope),
            grid=(n, s),
            in_specs=[x_spec, pp_spec] + w_specs,
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((n, hw, c), cd),
            interpret=interpret,
        )(x2d, ppf, w1c, b1r, w2c, b2r)

    if mode != "softmax":
        raise ValueError(f"unknown attention mode {mode!r}")

    # stats carry a leading singleton so the block's trailing two dims are
    # full-extent (Mosaic's (8, 128)-divisibility rule)
    stat_spec = pl.BlockSpec(
        (1, 1, cout), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    m, se = pl.pallas_call(
        kern(_softmax_stats_kernel, act=act, leaky_slope=leaky_slope),
        grid=(n, s),
        in_specs=[x_spec, pp_spec] + w_specs,
        out_specs=(stat_spec, stat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1, cout), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, cout), jnp.float32),
            pltpu.VMEM((1, cout), jnp.float32),
        ],
        interpret=interpret,
    )(x2d, ppf, w1c, b1r, w2c, b2r)

    return pl.pallas_call(
        kern(_softmax_apply_kernel, act=act, leaky_slope=leaky_slope,
             hw_scale=hw_scale),
        grid=(n, s),
        in_specs=[x_spec, pp_spec] + w_specs + [stat_spec, stat_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((n, hw, c), cd),
        interpret=interpret,
    )(x2d, ppf, w1c, b1r, w2c, b2r, m, se)


@functools.lru_cache(maxsize=None)
def _make_fused_core(mode: str, act: str, leaky_slope: float, hw_scale: float,
                     interpret: bool):
    """Per-config custom_vjp op: fused Pallas forward, XLA-recompute
    backward (exact: the oracle computes the same function)."""

    @jax.custom_vjp
    def core(x2d, pos_proj, w1x, b1, w2, b2):
        return _pallas_forward(
            x2d, pos_proj, w1x, b1, w2, b2,
            mode=mode, act=act, leaky_slope=leaky_slope,
            hw_scale=hw_scale, interpret=interpret,
        )

    def fwd(x2d, pos_proj, w1x, b1, w2, b2):
        y = core(x2d, pos_proj, w1x, b1, w2, b2)
        return y, (x2d, pos_proj, w1x, b1, w2, b2)

    def bwd(residuals, gy):
        _, vjp = jax.vjp(
            lambda *args: locate_attention_xla_core(
                *args, mode=mode, act=act, leaky_slope=leaky_slope,
                hw_scale=hw_scale,
            ),
            *residuals,
        )
        return vjp(gy)

    core.defvjp(fwd, bwd)
    return core


def fused_locate_attention(
    x: jax.Array,         # (N, H, W, C)
    pos_proj: jax.Array,  # (H*W, Hd)
    w1x: jax.Array,       # (C, Hd)
    b1: jax.Array,        # (Hd,)
    w2: jax.Array,        # (Hd, Cout)
    b2: jax.Array,        # (Cout,)
    *,
    mode: str = "softmax",
    act: str = "leaky_relu",
    leaky_slope: float = 0.2,
    interpret: bool = False,
) -> jax.Array:
    """Fused residual-form location attention; differentiable."""
    n, h, w, c = x.shape
    core = _make_fused_core(mode, act, float(leaky_slope), float(h * w), interpret)
    return core(x.reshape(n, h * w, c), pos_proj, w1x, b1, w2, b2).reshape(x.shape)
