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

Backward: hand-written Pallas kernels (default for leaky_relu/relu) that
recompute the gate MLP per tile (flash-style — the MLP matmuls are far
cheaper than materializing u/h/l/g in HBM) and accumulate the weight
gradients directly in revisited output blocks across the sequential grid:

  * sigmoid mode: ONE pass, grid (S, N) with batch innermost so the
    dpos_proj block (indexed by the spatial tile only) accumulates over
    consecutive batch steps and flushes on tile change; dW/db blocks have
    constant index maps so they live in VMEM for the whole grid.
  * softmax mode: pass A re-reduces c = sum_s g*(x*dy) per (batch,
    channel) using the forward's saved (max, sum-exp) stats; pass B
    applies the softmax jacobian dl = g*dg - (g/HW)*c and the shared MLP
    backward.

For other activations the backward falls back to jax.vjp of the XLA
composition (exact, just less fused).

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


def _clamp_gate(g, gate_max: float):
    """AttentionConfig.gate_max: cap the gate at a static bound (0 = off).
    where(g > M, M, g) so the boundary subgradient is 1 (torch.clamp)."""
    if gate_max > 0.0:
        return jnp.where(g > gate_max, jnp.float32(gate_max), g)
    return g


def _gate_mask(g, gate_max: float):
    """d(clamped gate)/d(gate): 1 below the bound, 0 above (static no-op
    multiplier when the clamp is off)."""
    if gate_max > 0.0:
        return (g <= gate_max).astype(jnp.float32)
    return 1.0


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
    gate_max: float = 0.0,
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
    g = _clamp_gate(g, gate_max)
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
                    *, act, leaky_slope, gate_max):
    l = _gate_logits(x_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref, act, leaky_slope)
    g = _clamp_gate(jax.nn.sigmoid(l) * 2.0, gate_max)
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
                          m_ref, s_ref, o_ref, *, act, leaky_slope, hw_scale,
                          gate_max):
    l = _gate_logits(x_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref, act, leaky_slope)
    g = _clamp_gate(jnp.exp(l - m_ref[0]) / s_ref[0] * hw_scale, gate_max)
    o_ref[0] = (x_ref[0].astype(jnp.float32) * g).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrapper with custom VJP
# ---------------------------------------------------------------------------


def _pick_tile(hw: int, channels: int = 512) -> int:
    """Spatial tile size: target ~256 KB of bf16 x-block per grid step
    (measured sweet spot at C=512 on the v5e — bigger tiles regress,
    likely from VMEM pressure under the pipeline's double buffering),
    clamped to [8, 1024] and to divisors of hw."""
    budget = max(8, min(1024, (256 * 1024) // max(1, channels * 2)))
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if t <= budget and hw % t == 0:
            return t
    return hw


def _prep_operands(x2d, pos_proj, w1x, b1, w2, b2):
    """Shared fwd/bwd pre-cast: weights to the compute dtype (MXU inputs);
    biases/pos_proj stay f32 (they join post-matmul f32 accumulators)."""
    cd = x2d.dtype
    hd = w1x.shape[1]
    cout = w2.shape[1]
    return (
        w1x.astype(cd),
        b1.reshape(1, hd).astype(jnp.float32),
        w2.astype(cd),
        b2.reshape(1, cout).astype(jnp.float32),
        pos_proj.astype(jnp.float32),
    )


def _full_spec(shape):
    """Whole-array block (constant index map) — weights/biases."""
    nzeros = len(shape)
    return pl.BlockSpec(
        shape, lambda i, j, _n=nzeros: (0,) * _n, memory_space=pltpu.VMEM
    )


def _tile_specs(t, c, hd, *, batch_major: bool):
    """(x, pos_proj) BlockSpecs. batch_major: grid (N, S), spatial tile is
    grid dim 1; else grid (S, N) with the batch innermost."""
    if batch_major:
        x_spec = pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        pp_spec = pl.BlockSpec((t, hd), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((1, t, c), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM)
        pp_spec = pl.BlockSpec((t, hd), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    return x_spec, pp_spec


def softmax_gate_stats(x2d, pos_proj, w1x, b1, w2, b2, *, act, leaky_slope,
                       interpret):
    """Run ONLY the flash-style (running max, sum-exp) stats pass over the
    gate logits of `x2d` — used by the fused-stage backward to recompute
    the softmax residuals without paying the apply pass."""
    n, hw, c = x2d.shape
    hd = w1x.shape[1]
    cout = w2.shape[1]
    t = _pick_tile(hw, c)
    s = hw // t
    w1c, b1r, w2c, b2r, ppf = _prep_operands(x2d, pos_proj, w1x, b1, w2, b2)
    x_spec, pp_spec = _tile_specs(t, c, hd, batch_major=True)
    stat_spec = pl.BlockSpec(
        (1, 1, cout), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_softmax_stats_kernel, act=act,
                          leaky_slope=leaky_slope),
        grid=(n, s),
        in_specs=[x_spec, pp_spec, _full_spec(w1c.shape), _full_spec((1, hd)),
                  _full_spec(w2c.shape), _full_spec((1, cout))],
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


def _pallas_forward_with_stats(x2d, pos_proj, w1x, b1, w2, b2, *, mode, act,
                               leaky_slope, hw_scale, gate_max, interpret):
    """Returns (y, m, se): softmax mode also returns its running max /
    sum-exp stats (saved as residuals so the backward reuses them);
    sigmoid mode returns (y, None, None)."""
    n, hw, c = x2d.shape
    hd = w1x.shape[1]
    cout = w2.shape[1]
    t = _pick_tile(hw, c)
    s = hw // t
    cd = x2d.dtype

    w1c, b1r, w2c, b2r, ppf = _prep_operands(x2d, pos_proj, w1x, b1, w2, b2)
    kern = functools.partial
    x_spec, pp_spec = _tile_specs(t, c, hd, batch_major=True)
    w_specs = [_full_spec(w1c.shape), _full_spec((1, hd)),
               _full_spec(w2c.shape), _full_spec((1, cout))]

    if mode == "sigmoid":
        y = pl.pallas_call(
            kern(_sigmoid_kernel, act=act, leaky_slope=leaky_slope,
                 gate_max=gate_max),
            grid=(n, s),
            in_specs=[x_spec, pp_spec] + w_specs,
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((n, hw, c), cd),
            interpret=interpret,
        )(x2d, ppf, w1c, b1r, w2c, b2r)
        return y, None, None

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

    y = pl.pallas_call(
        kern(_softmax_apply_kernel, act=act, leaky_slope=leaky_slope,
             hw_scale=hw_scale, gate_max=gate_max),
        grid=(n, s),
        in_specs=[x_spec, pp_spec] + w_specs + [stat_spec, stat_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((n, hw, c), cd),
        interpret=interpret,
    )(x2d, ppf, w1c, b1r, w2c, b2r, m, se)
    return y, m, se


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _act_grad(kind: str, slope: float):
    # Subgradient choices match the oracle EXACTLY: jax.nn.leaky_relu is
    # where(x >= 0, ...) (grad 1 at 0); jax.nn.relu's custom JVP defines
    # grad 0 at 0.
    if kind == "leaky_relu":
        return lambda u: jnp.where(u >= 0, 1.0, slope)
    if kind == "relu":
        return lambda u: jnp.where(u > 0, 1.0, 0.0)
    raise ValueError(kind)


_PALLAS_BWD_ACTS = ("leaky_relu", "relu")


def _softmax_csum_kernel(x_ref, dy_ref, pp_ref, w1_ref, b1_ref, w2_ref,
                         b2_ref, m_ref, s_ref, c_ref, c_acc,
                         *, act, leaky_slope, hw_scale, gate_max):
    """Pass A: c[n, cout] = sum_s g * mask * (x * dy), accumulated over a
    batch row's spatial tiles (grid (N, S), S innermost); mask is the
    gate-clamp subgradient (all-ones when gate_max is off)."""
    sidx = pl.program_id(1)
    l = _gate_logits(x_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref, act, leaky_slope)
    g = jnp.exp(l - m_ref[0]) / s_ref[0] * hw_scale
    dg = x_ref[0].astype(jnp.float32) * dy_ref[0].astype(jnp.float32)
    if l.shape[-1] == 1 and dg.shape[-1] != 1:
        # broadcast gate (per_channel=False): dL/dg sums over channels
        dg = jnp.sum(dg, axis=-1, keepdims=True)
    dg = dg * _gate_mask(g, gate_max)
    part = jnp.sum(g * dg, axis=0, keepdims=True)

    @pl.when(sidx == 0)
    def _():
        c_acc[:] = part

    @pl.when(sidx > 0)
    def _():
        c_acc[:] = c_acc[:] + part

    @pl.when(sidx == pl.num_programs(1) - 1)
    def _():
        c_ref[0] = c_acc[:]


def _bwd_kernel_sigmoid(x_ref, dy_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        dx_ref, dpp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                        *, act, leaky_slope, gate_max):
    _bwd_body(x_ref, dy_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
              None, None, None,
              dx_ref, dpp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
              mode="sigmoid", act=act, leaky_slope=leaky_slope, hw_scale=1.0,
              gate_max=gate_max)


def _bwd_kernel_softmax(x_ref, dy_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        m_ref, s_ref, c_ref,
                        dx_ref, dpp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                        *, act, leaky_slope, hw_scale, gate_max):
    _bwd_body(x_ref, dy_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
              m_ref, s_ref, c_ref,
              dx_ref, dpp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
              mode="softmax", act=act, leaky_slope=leaky_slope,
              hw_scale=hw_scale, gate_max=gate_max)


def _bwd_body(x_ref, dy_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
              m_ref, s_ref, c_ref,
              dx_ref, dpp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
              *, mode, act, leaky_slope, hw_scale, gate_max):
    """Pass B (grid (S, N), batch innermost): recompute the gate MLP for
    one tile, apply the gate jacobian, and backprop the per-location MLP.
    Weight grads accumulate in-place in their (revisited) output blocks;
    dpos_proj accumulates over the batch steps of its spatial tile.
    sigmoid mode passes no stats refs (m/s/c are None)."""
    i = pl.program_id(0)  # spatial tile
    j = pl.program_id(1)  # batch element

    xb = x_ref[0]                                    # (T, C) cd
    cd = xb.dtype
    xf = xb.astype(jnp.float32)
    dyf = dy_ref[0].astype(jnp.float32)

    # recompute forward for this tile
    u = jnp.dot(xb, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + pp_ref[:] + b1_ref[:]
    h = _act(act, leaky_slope)(u).astype(cd)
    l = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    l = l + b2_ref[:]

    dg = xf * dyf
    if l.shape[-1] == 1 and dg.shape[-1] != 1:
        # broadcast gate (per_channel=False): dL/dg sums over channels
        dg = jnp.sum(dg, axis=-1, keepdims=True)
    if mode == "sigmoid":
        p = jax.nn.sigmoid(l)
        g = 2.0 * p
        ghat = _clamp_gate(g, gate_max)
        dl = 2.0 * p * (1.0 - p) * (_gate_mask(g, gate_max) * dg)
    else:
        g = jnp.exp(l - m_ref[0]) / s_ref[0] * hw_scale
        ghat = _clamp_gate(g, gate_max)
        # c_ref was accumulated from MASKED dg (pass A), so only the
        # local dg needs the clamp subgradient here
        dl = g * (_gate_mask(g, gate_max) * dg) - (g / hw_scale) * c_ref[0]

    dlc = dl.astype(cd)
    # dh = dl @ W2^T ; du = act'(u) * dh ; dx = g*dy + du @ W1^T
    dh = jax.lax.dot_general(
        dlc, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    du = _act_grad(act, leaky_slope)(u) * dh
    duc = du.astype(cd)
    dx_gate = jax.lax.dot_general(
        duc, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[0] = (ghat * dyf + dx_gate).astype(dx_ref.dtype)

    # ---- accumulated gradients ----
    dw1_part = jax.lax.dot_general(      # x^T @ du : (C, Hd)
        xb, duc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2_part = jax.lax.dot_general(      # h^T @ dl : (Hd, Cout)
        h, dlc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_part = jnp.sum(du, axis=0, keepdims=True)
    db2_part = jnp.sum(dl, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dw1_ref[:] += dw1_part
    db1_ref[:] += db1_part
    dw2_ref[:] += dw2_part
    db2_ref[:] += db2_part

    # dpos_proj block is per-spatial-tile: init at this tile's first batch
    # step, accumulate across the (consecutive) batch steps
    @pl.when(j == 0)
    def _():
        dpp_ref[:] = jnp.zeros_like(dpp_ref)

    dpp_ref[:] += du


def _pallas_backward(x2d, dy2d, pos_proj, w1x, b1, w2, b2, m, se, *,
                     mode, act, leaky_slope, hw_scale, gate_max, interpret):
    n, hw, c = x2d.shape
    hd = w1x.shape[1]
    cout = w2.shape[1]
    t = _pick_tile(hw, c)
    s = hw // t
    cd = x2d.dtype

    w1c, b1r, w2c, b2r, ppf = _prep_operands(x2d, pos_proj, w1x, b1, w2, b2)
    kern = functools.partial
    w_specs = [_full_spec(w1c.shape), _full_spec((1, hd)),
               _full_spec(w2c.shape), _full_spec((1, cout))]
    # stats indexed by the batch grid dim: dim 1 in pass B's (S, N) grid
    stat_spec = pl.BlockSpec(
        (1, 1, cout), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )

    if mode == "softmax":
        # pass A: grid (N, S) — csum per batch row
        xa_spec, ppa_spec = _tile_specs(t, c, hd, batch_major=True)
        stata_spec = pl.BlockSpec(
            (1, 1, cout), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        )
        csum = pl.pallas_call(
            kern(_softmax_csum_kernel, act=act, leaky_slope=leaky_slope,
                 hw_scale=hw_scale, gate_max=gate_max),
            grid=(n, s),
            in_specs=[xa_spec, xa_spec, ppa_spec] + w_specs + [stata_spec, stata_spec],
            out_specs=stata_spec,
            out_shape=jax.ShapeDtypeStruct((n, 1, cout), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, cout), jnp.float32)],
            interpret=interpret,
        )(x2d, dy2d, ppf, w1c, b1r, w2c, b2r, m, se)
        bwd_kernel = kern(_bwd_kernel_softmax, act=act,
                          leaky_slope=leaky_slope, hw_scale=hw_scale,
                          gate_max=gate_max)
        stats_operands = (m, se, csum)
        stats_specs = [stat_spec, stat_spec, stat_spec]
    else:
        # sigmoid is tile-local: no stats operands at all
        bwd_kernel = kern(_bwd_kernel_sigmoid, act=act,
                          leaky_slope=leaky_slope, gate_max=gate_max)
        stats_operands = ()
        stats_specs = []

    # pass B: grid (S, N) — batch innermost for dpos_proj accumulation
    xb_spec, ppb_spec = _tile_specs(t, c, hd, batch_major=False)

    outs = pl.pallas_call(
        bwd_kernel,
        grid=(s, n),
        in_specs=[xb_spec, xb_spec, ppb_spec] + w_specs + stats_specs,
        out_specs=(
            xb_spec,                               # dx
            ppb_spec,                              # dpos_proj
            _full_spec(w1c.shape),                 # dw1
            _full_spec((1, hd)),                   # db1
            _full_spec(w2c.shape),                 # dw2
            _full_spec((1, cout)),                 # db2
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, hw, c), cd),
            jax.ShapeDtypeStruct((hw, hd), jnp.float32),
            jax.ShapeDtypeStruct(w1x.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, hd), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ),
        interpret=interpret,
    )(x2d, dy2d, ppf, w1c, b1r, w2c, b2r, *stats_operands)

    dx, dpp, dw1, db1, dw2, db2 = outs
    return (
        dx,
        dpp.astype(pos_proj.dtype),
        dw1.astype(w1x.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
    )


@functools.lru_cache(maxsize=None)
def _make_fused_core(mode: str, act: str, leaky_slope: float, hw_scale: float,
                     gate_max: float, interpret: bool):
    """Per-config custom_vjp op: fused Pallas forward; fused Pallas
    backward for supported activations, else exact XLA-recompute."""

    @jax.custom_vjp
    def core(x2d, pos_proj, w1x, b1, w2, b2):
        y, _, _ = _pallas_forward_with_stats(
            x2d, pos_proj, w1x, b1, w2, b2,
            mode=mode, act=act, leaky_slope=leaky_slope,
            hw_scale=hw_scale, gate_max=gate_max, interpret=interpret,
        )
        return y

    def fwd(x2d, pos_proj, w1x, b1, w2, b2):
        y, m, se = _pallas_forward_with_stats(
            x2d, pos_proj, w1x, b1, w2, b2,
            mode=mode, act=act, leaky_slope=leaky_slope,
            hw_scale=hw_scale, gate_max=gate_max, interpret=interpret,
        )
        return y, (x2d, pos_proj, w1x, b1, w2, b2, m, se)

    def bwd(residuals, gy):
        x2d, pos_proj, w1x, b1, w2, b2, m, se = residuals
        if act in _PALLAS_BWD_ACTS:
            return _pallas_backward(
                x2d, gy, pos_proj, w1x, b1, w2, b2, m, se,
                mode=mode, act=act, leaky_slope=leaky_slope,
                hw_scale=hw_scale, gate_max=gate_max, interpret=interpret,
            )
        _, vjp = jax.vjp(
            lambda *args: locate_attention_xla_core(
                *args, mode=mode, act=act, leaky_slope=leaky_slope,
                hw_scale=hw_scale, gate_max=gate_max,
            ),
            x2d, pos_proj, w1x, b1, w2, b2,
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
    gate_max: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """Fused residual-form location attention.

    Differentiable FIRST-ORDER ONLY (custom_vjp): grad-of-grad (R1,
    path-length penalties, Hessians) must go through the XLA composition
    instead — see train/step.py's `d_apply_r1` twin for the pattern.
    """
    n, h, w, c = x.shape
    core = _make_fused_core(mode, act, float(leaky_slope), float(h * w),
                            float(gate_max), interpret)
    return core(x.reshape(n, h * w, c), pos_proj, w1x, b1, w2, b2).reshape(x.shape)
