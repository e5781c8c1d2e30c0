"""Fused stage-group Pallas kernel: norm + act + factorized conv + skip
(+ LocAtE gate) in a SINGLE pass — BASELINE.json:5's literal fusion unit
("conv + attention + norm + activation ... in a single pass"),
SURVEY.md §4.2 / §8 hard part #1.

XLA compiles the stage as: a GroupNorm stats pass, a norm+act elementwise
pass, TWO standalone convolution kernels (the factorized (1,3)/(3,1) pair
— elementwise producers don't fuse into TPU conv ops), a skip-add, and the
attention kernel. Each boundary is an (N,H,W,C) HBM round trip. This
kernel keeps the whole chain in VMEM per spatial tile of image rows:

    x tile (+1-row halos)  --HBM read-->  VMEM
      u = act(norm(x))                       per-channel affine, VPU
      v = (1,3)-conv(u)                      3 shifted MXU matmuls
      w = (3,1)-conv(v) + b                  3 row-sliced MXU matmuls
      w = (w + skip(x)) * 1/sqrt(2)          skip = identity or 1x1 matmul
      [sigmoid gate: y = w * 2*sigmoid(MLP(w) + pos)]   tile-local
    y  --HBM write-->

The convolution-as-shifted-matmul trick: a SAME (1,3) conv over rows is
three (T, C) @ (C, Co) matmuls of W-shifted copies of the input (shifts
are sublane moves + an edge mask — no relayout); the (3,1) conv is three
contiguous row-slices of the halo'd tile. Zero-padding at image edges
falls out of zeroing the halo rows: the row conv is bias-free, so
rowconv(0) == 0 == the column conv's SAME padding.

Halos come in as separate 1-row blocks with clamped index maps (masked to
zero at the image's top/bottom), so no manual DMA is needed and the
pipeline double-buffers everything.

GroupNorm statistics are global over (H, W, C/G), so they are reduced in
XLA first (one bandwidth-bound pass over x — the unfused path pays the
same) and enter the kernel pre-folded as per-(batch, channel) affine
(a, b): u = act(x * a + b).

Modes:
  * attention=sigmoid  -> ONE kernel (gate is tile-local).
  * attention=softmax  -> the conv pass ALSO accumulates the gate-logit
    running (max, sum-exp) flash-style across the row tiles (TPU grids
    iterate sequentially, scratch carries over S) and writes the
    pre-gate output w; the existing fused-attention apply kernel then
    recomputes the cheap gate MLP from w and applies the normalized gate.
    Total HBM traffic: read x, write w, read w, write y — vs the unfused
    path's ~8 feature-map passes.
  * attention=None     -> conv block only (used for the non-final conv
    blocks of a multi-block stage).

Backward: custom_vjp whose backward is jax.vjp of `stage_oracle` — the
exact XLA composition (lax.conv etc., numerics identical to the unfused
layer path). The stage forward dominates sampling/serving and ~1/3 of the
train step; the backward stays on XLA's (already measured, well-fused)
gradient kernels. Grad-of-grad therefore also works through this op.

The XLA layer composition remains the fallback and the test oracle
(SURVEY.md §5 item 2); tests/test_fused_stage.py pins fwd+grad in
interpret mode and the real-TPU bf16 path is spot-checked per CLAUDE.md.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from locate_tpu.ops.pallas.fused_attention import (
    _act,
    _full_spec,
    _pick_tile,
    _prep_operands,
    _softmax_apply_kernel,
)

SQRT_HALF = 0.7071067811865476


# ---------------------------------------------------------------------------
# XLA oracle (backward provider; matches the unfused layer numerics)
# ---------------------------------------------------------------------------


def stage_oracle(ops: dict, *, h: int, w: int, groups: int, eps: float,
                 act: str, leaky_slope: float, mode: Optional[str]) -> jax.Array:
    """Exact XLA composition of the fused stage (lax convs, f32 norm/gate
    stats) — the custom_vjp backward runs through jax.vjp of this."""
    x = ops["x"]  # (N, H, W, C)
    n, _, _, c = x.shape
    cd = x.dtype
    afn = _act(act, leaky_slope)

    xf = x.astype(jnp.float32).reshape(n, h, w, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(n, h, w, c)
    u = afn((xf * ops["gn_scale"] + ops["gn_bias"]).astype(cd))

    dims = ("NHWC", "HWIO", "NHWC")
    v = jax.lax.conv_general_dilated(
        u, ops["w_row"].astype(cd), (1, 1), "SAME", dimension_numbers=dims
    )
    y = jax.lax.conv_general_dilated(
        v, ops["w_col"].astype(cd), (1, 1), "SAME", dimension_numbers=dims
    )
    y = y + ops["b_col"].astype(cd)
    if "w_skip" in ops:
        skip = jax.lax.conv_general_dilated(
            x, ops["w_skip"].astype(cd), (1, 1), "SAME", dimension_numbers=dims
        )
    else:
        skip = x
    y = (y + skip) * jnp.asarray(SQRT_HALF, cd)

    if mode is None:
        return y

    # residual-form locate gate (shared math with ops/attention.locate_gate)
    co = y.shape[-1]
    y2 = y.reshape(n, h * w, co)
    lg = (
        jnp.einsum("nsc,ch->nsh", y2, ops["w1x"].astype(cd),
                   preferred_element_type=jnp.float32)
        + ops["pos_proj"][None].astype(jnp.float32)
        + ops["b1"].astype(jnp.float32)
    )
    hg = afn(lg).astype(cd)
    logits = (
        jnp.einsum("nsh,hc->nsc", hg, ops["w2"].astype(cd),
                   preferred_element_type=jnp.float32)
        + ops["b2"].astype(jnp.float32)
    )
    if mode == "sigmoid":
        g = jax.nn.sigmoid(logits) * 2.0
    elif mode == "softmax":
        g = jax.nn.softmax(logits, axis=1) * float(h * w)
    else:
        raise ValueError(f"unknown gate mode {mode!r}")
    out = (y2.astype(jnp.float32) * g).astype(cd)
    return out.reshape(n, h, w, co)


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------


def _row_shift_taps(u2: jax.Array, width: int):
    """The three W-shifted copies of a row-major (R*W, C) buffer for a SAME
    (1,3) conv: tap k multiplies u[x + k - 1]. Shifts are 1-sublane
    concatenations; row boundaries are masked to zero (= SAME padding)."""
    t, c = u2.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) % width
    zero_row = jnp.zeros((1, c), u2.dtype)
    left = jnp.concatenate([zero_row, u2[:-1]], axis=0)   # u[x-1]
    left = jnp.where(col == 0, jnp.zeros((), u2.dtype), left)
    right = jnp.concatenate([u2[1:], zero_row], axis=0)   # u[x+1]
    right = jnp.where(col == width - 1, jnp.zeros((), u2.dtype), right)
    return left, u2, right


def _stage_tile(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref, bc_ref,
                skip_ref, *, width, rows, act, leaky_slope):
    """Compute the conv-block output for one tile of `rows` image rows.
    Returns (w2, x2): the (rows*W, Co) stage output and the raw x tile."""
    i = pl.program_id(1)
    s = pl.num_programs(1)
    cd = x_ref.dtype
    afn = _act(act, leaky_slope)
    a = a_ref[0]  # (1, C) f32: folded rstd*scale
    b = b_ref[0]  # (1, C) f32: folded bias - mean*rstd*scale

    def norm_act(t2):
        return afn(t2.astype(jnp.float32) * a + b).astype(cd)

    x2 = x_ref[0]  # (rows*W, C)
    zero = jnp.zeros((), cd)
    # halo rows: zeroed at the image's top/bottom edge — the row conv is
    # bias-free, so a zero u row yields the column conv's SAME zero padding
    u_up = jnp.where(i > 0, norm_act(up_ref[0]), zero)
    u_dn = jnp.where(i < s - 1, norm_act(dn_ref[0]), zero)
    u = jnp.concatenate([u_up, norm_act(x2), u_dn], axis=0)  # ((rows+2)W, C)

    # (1,3) conv: f32 accumulation, ONE cast to cd (matches XLA conv's
    # internal f32 accumulate -> output dtype). When C < 128 the per-tap
    # K=C matmuls waste the 128-deep MXU; concatenating the taps into one
    # K=3C matmul trades a lane-concat for ~1.5x better MXU utilization.
    taps = _row_shift_taps(u, width)
    if wr_ref.ndim == 2:  # host pre-stacked (3C, Co) for the concat path
        v = jnp.dot(
            jnp.concatenate(taps, axis=1), wr_ref[:],
            preferred_element_type=jnp.float32,
        )
    else:
        v = jnp.dot(taps[0], wr_ref[0], preferred_element_type=jnp.float32)
        v += jnp.dot(taps[1], wr_ref[1], preferred_element_type=jnp.float32)
        v += jnp.dot(taps[2], wr_ref[2], preferred_element_type=jnp.float32)
    v = v.astype(cd)  # ((rows+2)W, Co)

    # (3,1) conv: contiguous row slices of the halo'd buffer (same K<128
    # concat trick over the Co contraction)
    tw = rows * width
    vslices = (v[:tw], v[width : width + tw], v[2 * width :])
    if wc_ref.ndim == 2:  # host pre-stacked (3Co, Co)
        y = jnp.dot(
            jnp.concatenate(vslices, axis=1), wc_ref[:],
            preferred_element_type=jnp.float32,
        )
    else:
        y = jnp.dot(vslices[0], wc_ref[0], preferred_element_type=jnp.float32)
        y += jnp.dot(vslices[1], wc_ref[1], preferred_element_type=jnp.float32)
        y += jnp.dot(vslices[2], wc_ref[2], preferred_element_type=jnp.float32)
    y = y.astype(cd) + bc_ref[:].astype(cd)

    if skip_ref is not None:
        skip = jnp.dot(x2, skip_ref[:], preferred_element_type=jnp.float32)
        skip = skip.astype(cd)
    else:
        skip = x2
    return (y + skip) * jnp.asarray(SQRT_HALF, cd), x2


def _gate_logits_of(w2, pp_ref, w1_ref, b1_ref, w2g_ref, b2_ref, act, slope):
    u = jnp.dot(w2, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + pp_ref[:] + b1_ref[:]
    hg = _act(act, slope)(u).astype(w2.dtype)
    l = jnp.dot(hg, w2g_ref[:], preferred_element_type=jnp.float32)
    return l + b2_ref[:]


def _kernel_conv_only(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref,
                      bc_ref, skip_ref, o_ref, *, width, rows, act, leaky_slope):
    w2, _ = _stage_tile(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref,
                        bc_ref, skip_ref, width=width, rows=rows, act=act,
                        leaky_slope=leaky_slope)
    o_ref[0] = w2


def _kernel_sigmoid(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref,
                    bc_ref, skip_ref, pp_ref, w1_ref, b1_ref, w2g_ref, b2_ref,
                    o_ref, *, width, rows, act, leaky_slope):
    w2, _ = _stage_tile(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref,
                        bc_ref, skip_ref, width=width, rows=rows, act=act,
                        leaky_slope=leaky_slope)
    l = _gate_logits_of(w2, pp_ref, w1_ref, b1_ref, w2g_ref, b2_ref, act,
                        leaky_slope)
    g = jax.nn.sigmoid(l) * 2.0
    o_ref[0] = (w2.astype(jnp.float32) * g).astype(o_ref.dtype)


def _kernel_softmax_stats(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref,
                          bc_ref, skip_ref, pp_ref, w1_ref, b1_ref, w2g_ref,
                          b2_ref, w_out_ref, m_ref, s_ref, m_acc, s_acc,
                          *, width, rows, act, leaky_slope):
    """Conv pass fused with the flash-style gate-logit stats reduction."""
    sidx = pl.program_id(1)
    w2, _ = _stage_tile(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref,
                        bc_ref, skip_ref, width=width, rows=rows, act=act,
                        leaky_slope=leaky_slope)
    w_out_ref[0] = w2
    l = _gate_logits_of(w2, pp_ref, w1_ref, b1_ref, w2g_ref, b2_ref, act,
                        leaky_slope)
    tile_max = jnp.max(l, axis=0, keepdims=True)
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
            s_acc[:] * jnp.exp(m_old - m_new)
            + tile_sum * jnp.exp(tile_max - m_new)
        )
        m_acc[:] = m_new

    @pl.when(sidx == pl.num_programs(1) - 1)
    def _():
        m_ref[0] = m_acc[:]
        s_ref[0] = s_acc[:]


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------


def _pick_rows(h: int, width: int, c: int, co: int, hd: int,
               budget: int = 4 * 1024 * 1024) -> int:
    """Rows per tile: the kernel keeps ~4 row-copies of C channels and ~3 of
    Co (+gate hidden) live per row; stay under `budget` VMEM for the tile
    state (weights + pipeline double buffering come on top)."""
    per_row = width * (2 * (4 * c + 3 * co + hd) + 4 * co)
    t = max(1, budget // max(1, per_row))
    for cand in (128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= t and h % cand == 0:
            return cand
    return 1


def _fold_groupnorm(x4, gn_scale, gn_bias, groups: int, eps: float):
    """(N, C) per-batch affine (a, b) with the group stats folded in:
    norm(x)*scale+bias == x*a + b."""
    n, h, w, c = x4.shape
    xf = x4.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3))                       # (N, G)
    var = xf.var(axis=(1, 3))
    rstd = jax.lax.rsqrt(var + eps)
    cg = c // groups
    mean_c = jnp.repeat(mean, cg, axis=1)             # (N, C)
    rstd_c = jnp.repeat(rstd, cg, axis=1)
    a = rstd_c * gn_scale[None]
    b = gn_bias[None] - mean_c * a
    # (N, 1, C): Mosaic requires the block's last two dims be (8,128)-
    # divisible or full-extent; a (1, 1, C) block of a 3-D array qualifies
    return a[:, None, :], b[:, None, :]


def _pallas_stage_forward(ops: dict, *, h, w, groups, eps, act, leaky_slope,
                          mode, interpret):
    x4 = ops["x"]
    n, _, _, c = x4.shape
    cd = x4.dtype
    co = ops["w_col"].shape[-1]
    x2 = x4.reshape(n, h * w, c)

    a, b = _fold_groupnorm(x4, ops["gn_scale"], ops["gn_bias"], groups, eps)
    # K < 128 underutilizes the MXU's 128-deep contraction: pre-stack the
    # taps' weights so the kernel runs ONE K=3C matmul over lane-concat'd
    # shifted copies instead of three K=C matmuls (see _stage_tile)
    wr = ops["w_row"].reshape(3, c, co).astype(cd)
    if c < 128:
        wr = wr.reshape(3 * c, co)
    wc = ops["w_col"].reshape(3, co, co).astype(cd)
    if co < 128:
        wc = wc.reshape(3 * co, co)
    bc = ops["b_col"].reshape(1, co).astype(jnp.float32)
    has_skip = "w_skip" in ops
    skip_ops = (ops["w_skip"].reshape(c, co).astype(cd),) if has_skip else ()

    if mode is not None:
        hd = ops["w1x"].shape[1]
        w1c, b1r, w2c, b2r, ppf = _prep_operands(
            x2, ops["pos_proj"], ops["w1x"], ops["b1"], ops["w2"], ops["b2"]
        )
        cout = ops["w2"].shape[1]
    else:
        hd = 0

    rows = _pick_rows(h, w, c, co, hd)
    s = h // rows
    tw = rows * w

    x_spec = pl.BlockSpec((1, tw, c), lambda ni, i: (ni, i, 0),
                          memory_space=pltpu.VMEM)
    # 1-row halo blocks; index maps clamp at the image edge (the kernel
    # masks those rows to zero, so the clamped data is never used)
    up_spec = pl.BlockSpec(
        (1, w, c),
        lambda ni, i: (ni, jnp.maximum(i * rows - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    dn_spec = pl.BlockSpec(
        (1, w, c),
        lambda ni, i: (ni, jnp.minimum((i + 1) * rows, h - 1), 0),
        memory_space=pltpu.VMEM,
    )
    ab_spec = pl.BlockSpec((1, 1, c), lambda ni, i: (ni, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tw, co), lambda ni, i: (ni, i, 0),
                            memory_space=pltpu.VMEM)

    conv_specs = [x_spec, up_spec, dn_spec, ab_spec, ab_spec,
                  _full_spec(wr.shape), _full_spec(wc.shape),
                  _full_spec((1, co))]
    conv_args = [x2, x2, x2, a, b, wr, wc, bc]
    if has_skip:
        conv_specs.append(_full_spec((c, co)))
        conv_args.extend(skip_ops)

    def bind(kern):
        fn = functools.partial(kern, width=w, rows=rows, act=act,
                               leaky_slope=leaky_slope)
        if has_skip:
            return fn
        # arity without the skip ref
        def no_skip(*refs):
            return fn(*refs[:8], None, *refs[8:])
        return no_skip

    if mode is None:
        y2 = pl.pallas_call(
            bind(_kernel_conv_only),
            grid=(n, s),
            in_specs=conv_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n, h * w, co), cd),
            interpret=interpret,
        )(*conv_args)
        return y2.reshape(n, h, w, co)

    pp_spec = pl.BlockSpec((tw, hd), lambda ni, i: (i, 0),
                           memory_space=pltpu.VMEM)
    gate_specs = [pp_spec, _full_spec(w1c.shape), _full_spec((1, hd)),
                  _full_spec(w2c.shape), _full_spec((1, cout))]
    gate_args = [ppf, w1c, b1r, w2c, b2r]

    if mode == "sigmoid":
        y2 = pl.pallas_call(
            bind(_kernel_sigmoid),
            grid=(n, s),
            in_specs=conv_specs + gate_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n, h * w, co), cd),
            interpret=interpret,
        )(*conv_args, *gate_args)
        return y2.reshape(n, h, w, co)

    assert mode == "softmax"
    stat_spec = pl.BlockSpec((1, 1, cout), lambda ni, i: (ni, 0, 0),
                             memory_space=pltpu.VMEM)
    w_pre, m, se = pl.pallas_call(
        bind(_kernel_softmax_stats),
        grid=(n, s),
        in_specs=conv_specs + gate_specs,
        out_specs=(out_spec, stat_spec, stat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, h * w, co), cd),
            jax.ShapeDtypeStruct((n, 1, cout), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, cout), jnp.float32),
            pltpu.VMEM((1, cout), jnp.float32),
        ],
        interpret=interpret,
    )(*conv_args, *gate_args)

    # apply pass: recompute the cheap gate MLP from w_pre, apply the
    # normalized gate (reuses the fused-attention apply kernel / tiling)
    t = _pick_tile(h * w, co)
    s2 = (h * w) // t
    xa_spec = pl.BlockSpec((1, t, co), lambda ni, i: (ni, i, 0),
                           memory_space=pltpu.VMEM)
    ppa_spec = pl.BlockSpec((t, hd), lambda ni, i: (i, 0),
                            memory_space=pltpu.VMEM)
    y2 = pl.pallas_call(
        functools.partial(_softmax_apply_kernel, act=act,
                          leaky_slope=leaky_slope, hw_scale=float(h * w)),
        grid=(n, s2),
        in_specs=[xa_spec, ppa_spec, _full_spec(w1c.shape),
                  _full_spec((1, hd)), _full_spec(w2c.shape),
                  _full_spec((1, cout)), stat_spec, stat_spec],
        out_specs=xa_spec,
        out_shape=jax.ShapeDtypeStruct((n, h * w, co), cd),
        interpret=interpret,
    )(w_pre, ppf, w1c, b1r, w2c, b2r, m, se)
    return y2.reshape(n, h, w, co)


@functools.lru_cache(maxsize=None)
def _make_stage_core(h, w, groups, eps, act, leaky_slope, mode, interpret):
    """custom_vjp op over a dict of operands: Pallas forward, XLA-oracle
    backward (exact; supports grad-of-grad through the oracle)."""
    kw = dict(h=h, w=w, groups=groups, eps=eps, act=act,
              leaky_slope=leaky_slope, mode=mode)

    @jax.custom_vjp
    def core(ops):
        return _pallas_stage_forward(ops, interpret=interpret, **kw)

    def fwd(ops):
        return core(ops), ops

    def bwd(ops, gy):
        _, vjp = jax.vjp(lambda o: stage_oracle(o, **kw), ops)
        return vjp(gy)

    core.defvjp(fwd, bwd)
    return core


def fused_stage(
    x: jax.Array,                    # (N, H, W, C)
    gn_scale: jax.Array,             # (C,)
    gn_bias: jax.Array,              # (C,)
    w_row: jax.Array,                # (1, 3, C, Co)
    w_col: jax.Array,                # (3, 1, Co, Co)
    b_col: jax.Array,                # (Co,)
    w_skip: Optional[jax.Array],     # (1, 1, C, Co) or None (identity)
    *,
    groups: int,
    eps: float = 1e-5,
    act: str = "leaky_relu",
    leaky_slope: float = 0.2,
    # attention (None -> conv block only); residual-form gate
    mode: Optional[str] = None,
    pos_proj: Optional[jax.Array] = None,   # (H*W, Hd)
    w1x: Optional[jax.Array] = None,        # (Co, Hd)
    b1: Optional[jax.Array] = None,         # (Hd,)
    w2: Optional[jax.Array] = None,         # (Hd, Cout)
    b2: Optional[jax.Array] = None,         # (Cout,)
    interpret: bool = False,
) -> jax.Array:
    """Fused pre-activation residual conv block with optional fused
    residual-form location attention. See module docstring."""
    n, h, w_, c = x.shape
    ops = {
        "x": x,
        "gn_scale": gn_scale,
        "gn_bias": gn_bias,
        "w_row": w_row,
        "w_col": w_col,
        "b_col": b_col,
    }
    if w_skip is not None:
        ops["w_skip"] = w_skip
    if mode is not None:
        co = w_col.shape[-1]
        hd = w1x.shape[1]
        if pos_proj is None:
            pos_proj = jnp.zeros((h * w_, hd), jnp.float32)
        ops.update(pos_proj=pos_proj, w1x=w1x, b1=b1, w2=w2, b2=b2)
    core = _make_stage_core(
        h, w_, int(groups), float(eps), act, float(leaky_slope), mode,
        bool(interpret),
    )
    return core(ops)
