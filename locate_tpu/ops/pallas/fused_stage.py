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

Backward (round 3, hand-written for leaky_relu/relu): the gated stage is
exactly `locate_attention(conv_core(x))` evaluated at the pre-gate output
w, so the backward chains (1) the fused-attention backward kernels on w
(recomputed flash-style by one conv-only kernel call — cheaper than
holding an (N,HW,Co) residual; softmax stats rerun their stats pass) and
(2) a conv-block backward kernel
(`_kernel_conv_bwd`): every convolution transpose is the forward's
shifted-MXU-matmul with the shift reversed, weight grads accumulate
in-place in constant-index f32 blocks across the sequential grid, and the
act'+GroupNorm-statistics backward runs as one bandwidth-bound XLA
epilogue pass. Other activations (or `oracle_bwd=True`) fall back to
jax.vjp of `stage_oracle` — the exact XLA composition. Either way the op
is FIRST-ORDER only; grad-of-grad (R1) goes through the XLA twin
(train/step.py `d_apply_r1`).

The XLA layer composition remains the fallback and the test oracle
(SURVEY.md §5 item 2); tests/test_fused_stage.py pins fwd+grad in
interpret mode and the real-TPU bf16 path is spot-checked per CLAUDE.md.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from locate_tpu.ops.pallas.fused_attention import (
    _act,
    _act_grad,
    _clamp_gate,
    _full_spec,
    _pallas_backward,
    _pick_tile,
    _prep_operands,
    _softmax_apply_kernel,
    _PALLAS_BWD_ACTS,
)

SQRT_HALF = 0.7071067811865476


# ---------------------------------------------------------------------------
# XLA oracle (backward provider; matches the unfused layer numerics)
# ---------------------------------------------------------------------------


def _up2x(x: jax.Array) -> jax.Array:
    """Nearest-2x upsample, identical construction to
    ops/conv.upsample_nearest (broadcast-reshape, no gather)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def _down2x(y: jax.Array) -> jax.Array:
    """2x2 avg-pool in f32 (sum * 1/4 — the kernel's exact pooling math),
    cast back to the input dtype; matches ops/conv.downsample_avg up to
    f32 reduction order."""
    n, h, w, c = y.shape
    p = y.astype(jnp.float32).reshape(n, h // 2, 2, w // 2, 2, c)
    return (p.sum(axis=(2, 4)) * 0.25).astype(y.dtype)


def stage_oracle(ops: dict, *, h: int, w: int, groups: int, eps: float,
                 act: str, leaky_slope: float, mode: Optional[str],
                 gate_max: float = 0.0,
                 upsample: bool = False, downsample: bool = False) -> jax.Array:
    """Exact XLA composition of the fused stage (lax convs, f32 norm/gate
    stats) — the custom_vjp backward runs through jax.vjp of this.
    With `upsample`, ops["x"] is the COARSE (H/2, W/2) tensor and the
    composition is upsample_nearest(2) -> conv block [-> gate], i.e. the
    unfused generator stage head; (h, w) are always the FINE dims.
    With `downsample`, the composition ends in a 2x2 avg-pool — the
    unfused discriminator stage tail — and the output is (H/2, W/2)."""
    x = ops["x"]  # (N, H, W, C) — or (N, H/2, W/2, C) when upsample
    if upsample:
        x = _up2x(x)
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
        return _down2x(y) if downsample else y

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
    g = _clamp_gate(g, gate_max)
    out = (y2.astype(jnp.float32) * g).astype(cd).reshape(n, h, w, co)
    return _down2x(out) if downsample else out


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


def _row_unshift_sum(t0, t1, t2, width: int):
    """Transpose of `_row_shift_taps`: du[x] = t0[x+1] + t1[x] + t2[x-1]
    with row-boundary masking (t_k = dv @ Wr[k]^T; tap k of the forward
    multiplied u[x + k - 1], so its transpose scatters by -(k - 1))."""
    t, c = t1.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) % width
    zero_row = jnp.zeros((1, c), t1.dtype)
    from_t0 = jnp.concatenate([t0[1:], zero_row], axis=0)      # t0[x+1]
    from_t0 = jnp.where(col == width - 1, jnp.zeros((), t1.dtype), from_t0)
    from_t2 = jnp.concatenate([zero_row, t2[:-1]], axis=0)     # t2[x-1]
    from_t2 = jnp.where(col == 0, jnp.zeros((), t1.dtype), from_t2)
    return from_t0 + t1 + from_t2


def _expand2x_rows(t2: jax.Array, wc: int) -> jax.Array:
    """Nearest-2x expand of a coarse row-major (Rc*wc, C) buffer to
    (2Rc*2wc, C): broadcast-reshape along new column-pair / row-pair axes
    (sublane-only data movement, no gathers — the VMEM analogue of
    ops/conv.upsample_nearest).

    Mosaic note (probed on the real backend, round 3): these sublane
    reshapes compile for f32 but NOT for bf16 (the packed (16, 128)
    tiling rejects the shape casts) — callers must expand in f32 and
    cast afterwards, which is bitwise identical since expansion is pure
    duplication."""
    c = t2.shape[-1]
    rc = t2.shape[0] // wc
    t = t2.reshape(rc, wc, c)
    t = jnp.broadcast_to(t[:, :, None, :], (rc, wc, 2, c)).reshape(rc, 2 * wc, c)
    t = jnp.broadcast_to(t[:, None], (rc, 2, 2 * wc, c)).reshape(2 * rc, 2 * wc, c)
    return t.reshape(4 * rc * wc, c)


def _expand2x_cols(row2: jax.Array, wc: int) -> jax.Array:
    """Column-only nearest expand of one coarse row (wc, C) -> (2wc, C).
    (A fine halo row is one of the two identical fine copies of its coarse
    row, so row duplication is not needed.)"""
    c = row2.shape[-1]
    t = jnp.broadcast_to(row2.reshape(wc, 1, c), (wc, 2, c))
    return t.reshape(2 * wc, c)


def _pool2x(t2: jax.Array, w: int) -> jax.Array:
    """Transpose of `_expand2x_rows`: 2x2 SUM-pool a fine row-major
    (Rf*w, C) buffer to (Rf/2 * w/2, C) — the exact vjp of nearest-2x
    upsampling."""
    c = t2.shape[-1]
    rf = t2.shape[0] // w
    t = t2.reshape(rf // 2, 2, w // 2, 2, c).sum(axis=(1, 3))
    return t.reshape((rf // 2) * (w // 2), c)


def _stage_tile(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref, bc_ref,
                skip_ref, *, width, rows, act, leaky_slope, upsample=False):
    """Compute the conv-block output for one tile of `rows` image rows.
    Returns (w2, x2): the (rows*W, Co) stage output and the raw x tile.

    With `upsample`, the x/halo refs hold the COARSE tensor ((rows/2)
    coarse rows of width/2); norm+act runs at coarse resolution (1/4 the
    VPU work — nearest-2x commutes with elementwise ops and GroupNorm
    statistics are invariant under it) and the 2x expansion to the fine
    tile happens in VMEM, so the upsampled tensor never exists in HBM."""
    i = pl.program_id(1)
    s = pl.num_programs(1)
    cd = x_ref.dtype
    afn = _act(act, leaky_slope)
    a = a_ref[0]  # (1, C) f32: folded rstd*scale
    b = b_ref[0]  # (1, C) f32: folded bias - mean*rstd*scale

    def norm_act(t2):
        return afn(t2.astype(jnp.float32) * a + b).astype(cd)

    x2 = x_ref[0]  # (rows*W, C) — or ((rows/2)*(W/2), C) coarse
    zero = jnp.zeros((), cd)
    # halo rows: zeroed at the image's top/bottom edge — the row conv is
    # bias-free, so a zero u row yields the column conv's SAME zero padding
    if upsample:
        # expand in f32, cast after (Mosaic can't sublane-reshape bf16;
        # bitwise identical — see _expand2x_rows)
        def norm_act32(t2):
            return afn(t2.astype(jnp.float32) * a + b)

        wc_half = width // 2
        u_up = jnp.where(
            i > 0,
            _expand2x_cols(norm_act32(up_ref[0]), wc_half).astype(cd),
            zero,
        )
        u_dn = jnp.where(
            i < s - 1,
            _expand2x_cols(norm_act32(dn_ref[0]), wc_half).astype(cd),
            zero,
        )
        u_mid = _expand2x_rows(norm_act32(x2), wc_half).astype(cd)
    else:
        u_up = jnp.where(i > 0, norm_act(up_ref[0]), zero)
        u_dn = jnp.where(i < s - 1, norm_act(dn_ref[0]), zero)
        u_mid = norm_act(x2)
    u = jnp.concatenate([u_up, u_mid, u_dn], axis=0)  # ((rows+2)W, C)

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
        # 1x1 skip projection at COARSE resolution when upsampling (the
        # matmul commutes with nearest expansion: 1/4 the MXU work).
        # Matches the oracle bitwise: cast f32->cd commutes with the
        # duplication, so expand-then-cast == cast-then-expand.
        skip = jnp.dot(x2, skip_ref[:], preferred_element_type=jnp.float32)
        if upsample:
            skip = _expand2x_rows(skip, width // 2)  # f32 expand (Mosaic)
        skip = skip.astype(cd)
    elif upsample:  # identity skip: lossless cd->f32->cd round trip
        skip = _expand2x_rows(x2.astype(jnp.float32), width // 2).astype(cd)
    else:
        skip = x2
    return (y + skip) * jnp.asarray(SQRT_HALF, cd), x2


def _gate_logits_of(w2, pp_ref, w1_ref, b1_ref, w2g_ref, b2_ref, act, slope):
    u = jnp.dot(w2, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + pp_ref[:] + b1_ref[:]
    hg = _act(act, slope)(u).astype(w2.dtype)
    l = jnp.dot(hg, w2g_ref[:], preferred_element_type=jnp.float32)
    return l + b2_ref[:]


def _pool_avg(t2_f32: jax.Array, width: int, dtype) -> jax.Array:
    """In-VMEM 2x2 avg-pool of a fine f32 row-major tile before the HBM
    write (the fused `downsample` tail: output traffic drops 4x and the
    separate XLA pool pass disappears)."""
    return (_pool2x(t2_f32, width) * 0.25).astype(dtype)


def _kernel_conv_only(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref,
                      bc_ref, skip_ref, o_ref, *, width, rows, act,
                      leaky_slope, upsample=False, downsample=False):
    w2, _ = _stage_tile(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref,
                        bc_ref, skip_ref, width=width, rows=rows, act=act,
                        leaky_slope=leaky_slope, upsample=upsample)
    if downsample:
        o_ref[0] = _pool_avg(w2.astype(jnp.float32), width, o_ref.dtype)
    else:
        o_ref[0] = w2


def _kernel_sigmoid(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref,
                    bc_ref, skip_ref, pp_ref, w1_ref, b1_ref, w2g_ref, b2_ref,
                    o_ref, *, width, rows, act, leaky_slope, gate_max=0.0,
                    upsample=False, downsample=False):
    w2, _ = _stage_tile(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref,
                        bc_ref, skip_ref, width=width, rows=rows, act=act,
                        leaky_slope=leaky_slope, upsample=upsample)
    l = _gate_logits_of(w2, pp_ref, w1_ref, b1_ref, w2g_ref, b2_ref, act,
                        leaky_slope)
    g = _clamp_gate(jax.nn.sigmoid(l) * 2.0, gate_max)
    gated = (w2.astype(jnp.float32) * g).astype(o_ref.dtype)
    if downsample:
        # pool the cd-cast gated values in f32 — bitwise the oracle's
        # cast-then-_down2x order
        o_ref[0] = _pool_avg(gated.astype(jnp.float32), width, o_ref.dtype)
    else:
        o_ref[0] = gated


def _kernel_softmax_apply_pool(x_ref, pp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                               m_ref, s_ref, o_ref, *, act, leaky_slope,
                               hw_scale, width, gate_max=0.0):
    """fused_attention._softmax_apply_kernel + in-VMEM 2x2 avg-pool before
    the write (the fused `downsample` tail for softmax mode); x tiles are
    row-aligned (multiples of 2 image rows) so pooling stays tile-local."""
    l = _gate_logits_of(x_ref[0], pp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        act, leaky_slope)
    g = _clamp_gate(jnp.exp(l - m_ref[0]) / s_ref[0] * hw_scale, gate_max)
    gated = (x_ref[0].astype(jnp.float32) * g).astype(o_ref.dtype)
    o_ref[0] = _pool_avg(gated.astype(jnp.float32), width, o_ref.dtype)


def _kernel_softmax_stats(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref,
                          bc_ref, skip_ref, pp_ref, w1_ref, b1_ref, w2g_ref,
                          b2_ref, w_out_ref, m_ref, s_ref, m_acc, s_acc,
                          *, width, rows, act, leaky_slope, upsample=False,
                          downsample=False):
    """Conv pass fused with the flash-style gate-logit stats reduction.
    `downsample` is accepted for bind() uniformity but unused here: w_pre
    must stay FINE (the apply pass recomputes the gate MLP from it);
    pooling happens in _kernel_softmax_apply_pool."""
    del downsample
    sidx = pl.program_id(1)
    w2, _ = _stage_tile(x_ref, up_ref, dn_ref, a_ref, b_ref, wr_ref, wc_ref,
                        bc_ref, skip_ref, width=width, rows=rows, act=act,
                        leaky_slope=leaky_slope, upsample=upsample)
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


def _kernel_conv_bwd(x_ref, xu_ref, xd_ref, dw_ref, dwu_ref, dwd_ref,
                     a_ref, b_ref, wr_ref, wc_ref, skip_ref,
                     du_ref, dxs_ref, dwr_ref, dwc_ref, dbc_ref, dws_ref,
                     *, width, rows, act, leaky_slope, upsample=False):
    """Backward of the conv-block core for one tile of image rows.

    Given dL/dw (the post-skip stage output grad, incl. 1-row halos — the
    column conv couples adjacent rows), recomputes u/v flash-style from x
    and emits:
      du   — dL/d(act(norm(x)))   (the XLA epilogue finishes act'+GN bwd)
      dxs  — the skip path's dL/dx (sqrt(1/2) * dw [@ Wskip^T])
      dWr/dWc/dbc[/dWskip] — weight grads, accumulated in-place across
      the sequential grid in constant-index f32 blocks.
    All convolution transposes are the forward's shifted MXU matmuls with
    the shift direction reversed (see _row_unshift_sum).

    With `upsample`, the x refs are COARSE (as in the forward): u is
    recomputed at coarse resolution and expanded in VMEM, while du/dxs
    are 2x2-SUM-pooled back to coarse before the write — the vjp of
    nearest expansion — so the fine-resolution gradient of the upsampled
    tensor never exists in HBM either.
    """
    i = pl.program_id(1)
    s = pl.num_programs(1)
    nidx = pl.program_id(0)
    cd = x_ref.dtype
    afn = _act(act, leaky_slope)
    a = a_ref[0]
    b = b_ref[0]

    def norm_act(t2):
        return afn(t2.astype(jnp.float32) * a + b).astype(cd)

    x2 = x_ref[0]                                    # (tw, C) [coarse if up]
    c = x2.shape[-1]
    co = dw_ref.shape[-1]
    tw = rows * width
    zero = jnp.zeros((), cd)

    # recompute u (and v) on the extended rows, halos zeroed at the edges
    if upsample:
        # f32 expand, cast after — see _expand2x_rows (Mosaic bf16 limit)
        def norm_act32(t2):
            return afn(t2.astype(jnp.float32) * a + b)

        wc_half = width // 2
        u_up = jnp.where(
            i > 0,
            _expand2x_cols(norm_act32(xu_ref[0]), wc_half).astype(cd),
            zero,
        )
        u_dn = jnp.where(
            i < s - 1,
            _expand2x_cols(norm_act32(xd_ref[0]), wc_half).astype(cd),
            zero,
        )
        u_mid = _expand2x_rows(norm_act32(x2), wc_half).astype(cd)
    else:
        u_up = jnp.where(i > 0, norm_act(xu_ref[0]), zero)
        u_dn = jnp.where(i < s - 1, norm_act(xd_ref[0]), zero)
        u_mid = norm_act(x2)
    u_ext = jnp.concatenate([u_up, u_mid, u_dn], axis=0)
    wr3 = wr_ref[:]                                  # (3, C, Co) cd
    taps_e = _row_shift_taps(u_ext, width)
    if c < 128:  # same K=3C lane-concat MXU trick as the forward
        v_ext = jnp.dot(jnp.concatenate(taps_e, axis=1),
                        wr3.reshape(3 * c, co),
                        preferred_element_type=jnp.float32)
    else:
        v_ext = jnp.dot(taps_e[0], wr3[0], preferred_element_type=jnp.float32)
        v_ext += jnp.dot(taps_e[1], wr3[1], preferred_element_type=jnp.float32)
        v_ext += jnp.dot(taps_e[2], wr3[2], preferred_element_type=jnp.float32)
    v_ext = v_ext.astype(cd)                         # ((rows+2)W, Co)

    # dL/dy0 on the extended rows (the skip-scale folds in here; halo rows
    # beyond the image contribute nothing -> zero masked)
    sqh = jnp.asarray(SQRT_HALF, jnp.float32)
    dwf = dw_ref[0].astype(jnp.float32) * sqh        # (tw, Co) f32
    dy0_c = dwf.astype(cd)
    dy0_u = jnp.where(i > 0, (dwu_ref[0].astype(jnp.float32) * sqh).astype(cd),
                      zero)
    dy0_d = jnp.where(i < s - 1,
                      (dwd_ref[0].astype(jnp.float32) * sqh).astype(cd), zero)
    dy0_ext = jnp.concatenate([dy0_u, dy0_c, dy0_d], axis=0)

    # column conv transpose: dv_j = dy0_{j+1}@Wc[0]^T + dy0_j@Wc[1]^T
    #                               + dy0_{j-1}@Wc[2]^T  (row slices)
    wc3 = wc_ref[:]                                  # (3, Co, Co) cd
    tr = (((1,), (1,)), ((), ()))                    # contract last-with-last
    dv = jax.lax.dot_general(dy0_ext[2 * width:], wc3[0], tr,
                             preferred_element_type=jnp.float32)
    dv += jax.lax.dot_general(dy0_ext[width:width + tw], wc3[1], tr,
                              preferred_element_type=jnp.float32)
    dv += jax.lax.dot_general(dy0_ext[:tw], wc3[2], tr,
                              preferred_element_type=jnp.float32)
    dv_c = dv.astype(cd)                             # (tw, Co)

    # dWc[k] = sum_i v_{i+k-1}^T dy0_i  (forward's vslices, central dy0)
    red0 = (((0,), (0,)), ((), ()))                  # contract over rows
    dwc_part = jnp.stack([
        jax.lax.dot_general(v_ext[:tw], dy0_c, red0,
                            preferred_element_type=jnp.float32),
        jax.lax.dot_general(v_ext[width:width + tw], dy0_c, red0,
                            preferred_element_type=jnp.float32),
        jax.lax.dot_general(v_ext[2 * width:], dy0_c, red0,
                            preferred_element_type=jnp.float32),
    ])                                               # (3, Co, Co) f32

    # row conv transpose: t_k = dv @ Wr[k]^T, scattered by the reversed
    # shifts; dWr[k] = tap_k(u_central)^T @ dv
    t0 = jax.lax.dot_general(dv_c, wr3[0], tr,
                             preferred_element_type=jnp.float32)
    t1 = jax.lax.dot_general(dv_c, wr3[1], tr,
                             preferred_element_type=jnp.float32)
    t2 = jax.lax.dot_general(dv_c, wr3[2], tr,
                             preferred_element_type=jnp.float32)
    du_fine = _row_unshift_sum(t0, t1, t2, width)    # (tw, C) f32
    if upsample:
        du_ref[0] = _pool2x(du_fine, width).astype(cd)
    else:
        du_ref[0] = du_fine.astype(cd)

    u_c = u_ext[width:width + tw]
    taps_c = _row_shift_taps(u_c, width)
    dwr_part = jnp.stack([
        jax.lax.dot_general(taps_c[0], dv_c, red0,
                            preferred_element_type=jnp.float32),
        jax.lax.dot_general(taps_c[1], dv_c, red0,
                            preferred_element_type=jnp.float32),
        jax.lax.dot_general(taps_c[2], dv_c, red0,
                            preferred_element_type=jnp.float32),
    ])                                               # (3, C, Co) f32

    dbc_part = jnp.sum(dwf, axis=0, keepdims=True)   # (1, Co); dbc sees
    # the sqrt(1/2)-scaled grad exactly like the oracle's  y + b  term

    # skip-path grads: with upsample the forward skip is up(skip(x_c)), so
    # its vjp pools dy0 to coarse FIRST and the 1x1 transpose runs at
    # coarse resolution (1/4 the MXU work, mirroring the forward)
    dy0_s = _pool2x(dwf, width).astype(cd) if upsample else dy0_c
    if skip_ref is not None:
        dxs_ref[0] = jax.lax.dot_general(
            dy0_s, skip_ref[:], tr, preferred_element_type=jnp.float32
        ).astype(cd)
        dws_part = jax.lax.dot_general(x2, dy0_s, red0,
                                       preferred_element_type=jnp.float32)
    else:
        dxs_ref[0] = dy0_s                           # identity skip (C==Co)

    @pl.when(jnp.logical_and(nidx == 0, i == 0))
    def _():
        dwr_ref[:] = jnp.zeros_like(dwr_ref)
        dwc_ref[:] = jnp.zeros_like(dwc_ref)
        dbc_ref[:] = jnp.zeros_like(dbc_ref)
        if skip_ref is not None:
            dws_ref[:] = jnp.zeros_like(dws_ref)

    dwr_ref[:] += dwr_part
    dwc_ref[:] += dwc_part
    dbc_ref[:] += dbc_part
    if skip_ref is not None:
        dws_ref[:] += dws_part


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------


def _pick_rows(h: int, width: int, c: int, co: int, hd: int,
               budget: Optional[int] = None) -> int:
    """Rows per tile: the kernel keeps ~4 row-copies of C channels and ~3 of
    Co (+gate hidden) live per row; stay under `budget` VMEM for the tile
    state (weights + pipeline double buffering come on top).

    The default budget comes from gate_profile.json (4 MiB as checked in;
    scripts/retune_gates.py rewrites it). LOCATE_TPU_VMEM_BUDGET (bytes)
    overrides for one-off tuning runs; measured on the emulated chip
    (DESIGN.md "gate re-check"): 2-16 MiB all land within the session
    noise band at the losing 256^2 shapes, so the default stays."""
    env = os.environ.get("LOCATE_TPU_VMEM_BUDGET")
    if env:
        budget = int(env)
    elif budget is None:
        from locate_tpu.ops.pallas import gate_profile

        budget = gate_profile.vmem_budget()
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
                          mode, interpret, gate_max=0.0, upsample=False,
                          downsample=False):
    x4 = ops["x"]  # coarse (N, h/2, w/2, C) when upsample; (h, w) are FINE
    n, _, _, c = x4.shape
    cd = x4.dtype
    co = ops["w_col"].shape[-1]
    x2 = x4.reshape(n, (h * w) // 4 if upsample else h * w, c)

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
    if upsample or downsample:
        rows = max(rows, 2)  # whole coarse rows / poolable row pairs
    s = h // rows
    tw = rows * w
    tw_out = tw // 4 if downsample else tw
    hw_out = (h * w) // 4 if downsample else h * w

    def out4(y2):  # flat kernel output -> NHWC at the output resolution
        if downsample:
            return y2.reshape(n, h // 2, w // 2, co)
        return y2.reshape(n, h, w, co)

    if upsample:
        # x/halo blocks index the COARSE array: fine tile i covers coarse
        # rows [i*rows/2, (i+1)*rows/2); the fine halo row r0-1 (odd) is
        # the second copy of coarse row r0/2 - 1, so halos are 1 COARSE
        # row with the same clamped maps, in coarse index space
        rc, wc_half = rows // 2, w // 2
        x_spec = pl.BlockSpec((1, rc * wc_half, c), lambda ni, i: (ni, i, 0),
                              memory_space=pltpu.VMEM)
        up_spec = pl.BlockSpec(
            (1, wc_half, c),
            lambda ni, i: (ni, jnp.maximum(i * rc - 1, 0), 0),
            memory_space=pltpu.VMEM,
        )
        dn_spec = pl.BlockSpec(
            (1, wc_half, c),
            lambda ni, i: (ni, jnp.minimum((i + 1) * rc, (h // 2) - 1), 0),
            memory_space=pltpu.VMEM,
        )
    else:
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
    out_spec = pl.BlockSpec((1, tw_out, co), lambda ni, i: (ni, i, 0),
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
                               leaky_slope=leaky_slope, upsample=upsample,
                               downsample=downsample)
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
            out_shape=jax.ShapeDtypeStruct((n, hw_out, co), cd),
            interpret=interpret,
        )(*conv_args)
        return out4(y2)

    pp_spec = pl.BlockSpec((tw, hd), lambda ni, i: (i, 0),
                           memory_space=pltpu.VMEM)
    gate_specs = [pp_spec, _full_spec(w1c.shape), _full_spec((1, hd)),
                  _full_spec(w2c.shape), _full_spec((1, cout))]
    gate_args = [ppf, w1c, b1r, w2c, b2r]

    if mode == "sigmoid":
        y2 = pl.pallas_call(
            bind(functools.partial(_kernel_sigmoid, gate_max=gate_max)),
            grid=(n, s),
            in_specs=conv_specs + gate_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n, hw_out, co), cd),
            interpret=interpret,
        )(*conv_args, *gate_args)
        return out4(y2)

    assert mode == "softmax"
    stat_spec = pl.BlockSpec((1, 1, cout), lambda ni, i: (ni, 0, 0),
                             memory_space=pltpu.VMEM)
    wpre_spec = pl.BlockSpec((1, tw, co), lambda ni, i: (ni, i, 0),
                             memory_space=pltpu.VMEM)  # always FINE
    w_pre, m, se = pl.pallas_call(
        bind(_kernel_softmax_stats),
        grid=(n, s),
        in_specs=conv_specs + gate_specs,
        out_specs=(wpre_spec, stat_spec, stat_spec),
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
    # normalized gate (reuses the fused-attention apply kernel / tiling);
    # with `downsample` the pooled variant writes the coarse output
    # directly (row-aligned tiles so the 2x2 pool stays tile-local)
    if downsample:
        y2 = pl.pallas_call(
            functools.partial(_kernel_softmax_apply_pool, act=act,
                              leaky_slope=leaky_slope, hw_scale=float(h * w),
                              width=w, gate_max=gate_max),
            grid=(n, s),
            in_specs=[wpre_spec, pp_spec, _full_spec(w1c.shape),
                      _full_spec((1, hd)), _full_spec(w2c.shape),
                      _full_spec((1, cout)), stat_spec, stat_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n, hw_out, co), cd),
            interpret=interpret,
        )(w_pre, ppf, w1c, b1r, w2c, b2r, m, se)
        return out4(y2)
    t = _pick_tile(h * w, co)
    s2 = (h * w) // t
    xa_spec = pl.BlockSpec((1, t, co), lambda ni, i: (ni, i, 0),
                           memory_space=pltpu.VMEM)
    ppa_spec = pl.BlockSpec((t, hd), lambda ni, i: (i, 0),
                            memory_space=pltpu.VMEM)
    y2 = pl.pallas_call(
        functools.partial(_softmax_apply_kernel, act=act,
                          leaky_slope=leaky_slope, hw_scale=float(h * w),
                          gate_max=gate_max),
        grid=(n, s2),
        in_specs=[xa_spec, ppa_spec, _full_spec(w1c.shape),
                  _full_spec((1, hd)), _full_spec(w2c.shape),
                  _full_spec((1, cout)), stat_spec, stat_spec],
        out_specs=xa_spec,
        out_shape=jax.ShapeDtypeStruct((n, h * w, co), cd),
        interpret=interpret,
    )(w_pre, ppf, w1c, b1r, w2c, b2r, m, se)
    return y2.reshape(n, h, w, co)


def _pallas_conv_backward(ops: dict, dw2: jax.Array, *, h, w, groups, eps,
                          act, leaky_slope, interpret, upsample=False) -> dict:
    """Hand-written backward of the conv-block core: Pallas kernel for the
    conv transposes + weight grads (see _kernel_conv_bwd), XLA epilogue
    for the act' + GroupNorm-statistics backward (one bandwidth-bound
    pass, matching the oracle's f32 norm math). `dw2` is dL/d(stage
    output before any gate), shape (N, H*W, Co) — always FINE; with
    `upsample` the x side (and the du/dxs outputs) are coarse."""
    x4 = ops["x"]
    n, _, _, c = x4.shape
    cd = x4.dtype
    co = ops["w_col"].shape[-1]
    hw_x = (h * w) // 4 if upsample else h * w  # x-side (coarse) extent
    x2 = x4.reshape(n, hw_x, c)

    a, b = _fold_groupnorm(x4, ops["gn_scale"], ops["gn_bias"], groups, eps)
    wr3 = ops["w_row"].reshape(3, c, co).astype(cd)
    wc3 = ops["w_col"].reshape(3, co, co).astype(cd)
    has_skip = "w_skip" in ops

    # backward keeps ~2x the forward's live row state: run at half the
    # profile budget (LOCATE_TPU_VMEM_BUDGET still overrides inside)
    from locate_tpu.ops.pallas import gate_profile as _gp

    rows = _pick_rows(h, w, c, co, 0, budget=_gp.vmem_budget() // 2)
    if upsample:
        rows = max(rows, 2)
    s = h // rows
    tw = rows * w
    # x-side tile geometry (coarse when upsampling; see the forward)
    x_rows = rows // 2 if upsample else rows
    x_w = w // 2 if upsample else w
    x_h = h // 2 if upsample else h

    def tile_spec(ch, trows, tw_):
        return pl.BlockSpec((1, trows * tw_, ch), lambda ni, i: (ni, i, 0),
                            memory_space=pltpu.VMEM)

    def halo_specs(ch, trows, tw_, th):
        up = pl.BlockSpec((1, tw_, ch),
                          lambda ni, i: (ni, jnp.maximum(i * trows - 1, 0), 0),
                          memory_space=pltpu.VMEM)
        dn = pl.BlockSpec((1, tw_, ch),
                          lambda ni, i: (ni, jnp.minimum((i + 1) * trows, th - 1), 0),
                          memory_space=pltpu.VMEM)
        return up, dn

    ab_spec = pl.BlockSpec((1, 1, c), lambda ni, i: (ni, 0, 0),
                           memory_space=pltpu.VMEM)
    xu_spec, xd_spec = halo_specs(c, x_rows, x_w, x_h)
    du_spec, dd_spec = halo_specs(co, rows, w, h)
    in_specs = [tile_spec(c, x_rows, x_w), xu_spec, xd_spec,
                tile_spec(co, rows, w), du_spec, dd_spec,
                ab_spec, ab_spec, _full_spec(wr3.shape), _full_spec(wc3.shape)]
    in_args = [x2, x2, x2, dw2, dw2, dw2, a, b, wr3, wc3]
    if has_skip:
        in_specs.append(_full_spec((c, co)))
        in_args.append(ops["w_skip"].reshape(c, co).astype(cd))

    out_specs = [tile_spec(c, x_rows, x_w), tile_spec(c, x_rows, x_w),
                 _full_spec(wr3.shape), _full_spec(wc3.shape),
                 _full_spec((1, co))]
    out_shapes = [jax.ShapeDtypeStruct((n, hw_x, c), cd),
                  jax.ShapeDtypeStruct((n, hw_x, c), cd),
                  jax.ShapeDtypeStruct((3, c, co), jnp.float32),
                  jax.ShapeDtypeStruct((3, co, co), jnp.float32),
                  jax.ShapeDtypeStruct((1, co), jnp.float32)]
    if has_skip:
        out_specs.append(_full_spec((c, co)))
        out_shapes.append(jax.ShapeDtypeStruct((c, co), jnp.float32))

    fn = functools.partial(_kernel_conv_bwd, width=w, rows=rows, act=act,
                           leaky_slope=leaky_slope, upsample=upsample)
    if has_skip:
        kern = fn
    else:
        def kern(*refs):  # arity without skip_ref / dws_ref
            return fn(*refs[:10], None, *refs[10:], None)

    outs = pl.pallas_call(
        kern,
        grid=(n, s),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(*in_args)
    if has_skip:
        du2, dxs2, dwr, dwc, dbc, dws = outs
    else:
        du2, dxs2, dwr, dwc, dbc = outs

    # ---- XLA epilogue: act' + GroupNorm backward (f32, matches oracle) --
    # Runs over the x-side (coarse when upsampling: du2 was pooled in the
    # kernel, and the GN-statistics vjp of the fine composition reduces to
    # exactly the coarse-side GN vjp applied to the pooled du — the same
    # commutation that lets the forward fold coarse stats).
    cg = c // groups
    xf = x2.astype(jnp.float32).reshape(n, hw_x, groups, cg)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = ((xf - mean) * rstd).reshape(n, hw_x, c)
    # act was evaluated on the cd-cast pre-activation; take its
    # subgradient at exactly those values
    z_cd = (xhat * ops["gn_scale"].astype(jnp.float32)
            + ops["gn_bias"].astype(jnp.float32)).astype(cd)
    dz = du2.astype(jnp.float32) * _act_grad(act, leaky_slope)(
        z_cd.astype(jnp.float32))
    d_scale = jnp.sum(dz * xhat, axis=(0, 1))
    d_bias = jnp.sum(dz, axis=(0, 1))
    dzs = (dz * ops["gn_scale"].astype(jnp.float32)).reshape(
        n, hw_x, groups, cg)
    xhat_g = xhat.reshape(n, hw_x, groups, cg)
    m1 = dzs.mean(axis=(1, 3), keepdims=True)
    m2 = (dzs * xhat_g).mean(axis=(1, 3), keepdims=True)
    dx_norm = (rstd * (dzs - m1 - xhat_g * m2)).reshape(n, hw_x, c)
    dx = (dx_norm + dxs2.astype(jnp.float32)).astype(cd)

    grads = {
        "x": dx.reshape(x4.shape),
        "gn_scale": d_scale.astype(ops["gn_scale"].dtype),
        "gn_bias": d_bias.astype(ops["gn_bias"].dtype),
        "w_row": dwr.reshape(ops["w_row"].shape).astype(ops["w_row"].dtype),
        "w_col": dwc.reshape(ops["w_col"].shape).astype(ops["w_col"].dtype),
        "b_col": dbc.reshape(ops["b_col"].shape).astype(ops["b_col"].dtype),
    }
    if has_skip:
        grads["w_skip"] = dws.reshape(ops["w_skip"].shape).astype(
            ops["w_skip"].dtype)
    return grads


_CONV_KEYS = ("x", "gn_scale", "gn_bias", "w_row", "w_col", "b_col", "w_skip")


@functools.lru_cache(maxsize=None)
def _make_stage_core(h, w, groups, eps, act, leaky_slope, mode, interpret,
                     oracle_bwd=False, upsample=False, downsample=False,
                     gate_max=0.0):
    """custom_vjp op over a dict of operands: Pallas forward; hand-written
    Pallas backward (round 3) for leaky_relu/relu — gate backward via the
    fused-attention bwd kernels on the pre-gate output w (saved by the
    softmax forward, recomputed flash-style for sigmoid), conv-block
    backward via _kernel_conv_bwd + XLA GroupNorm epilogue. Other
    activations (or oracle_bwd=True, the A/B-benchmark escape hatch) fall
    back to jax.vjp of the exact XLA oracle. First-order only either way
    (grad-of-grad goes through the oracle twin, see train/step.py)."""
    kw = dict(h=h, w=w, groups=groups, eps=eps, act=act,
              leaky_slope=leaky_slope, mode=mode, gate_max=gate_max,
              upsample=upsample, downsample=downsample)
    hand_written = (act in _PALLAS_BWD_ACTS) and not oracle_bwd

    # The backward chain is itself a custom_vjp op so grad-of-grad stays
    # supported: second order differentiates the ORACLE's vjp instead
    # (exact XLA math — the Pallas bwd kernels have no jvp/transpose
    # rules). Residuals (the gated modes' pre-gate output w + softmax
    # stats) are recomputed flash-style from `ops` inside this op, so
    # nothing pallas-made crosses the custom_vjp boundary.
    @jax.custom_vjp
    def bwd_op(ops, gy):
        n = ops["x"].shape[0]
        co = ops["w_col"].shape[-1]
        if downsample:
            # vjp of the fused avg-pool tail: expand the coarse cotangent
            # to fine with weight 1/4 (exactly _down2x's transpose) —
            # same HBM traffic as the unfused pool's backward, so the
            # forward-side saving is pure gain
            gy = _up2x(gy.astype(jnp.float32) * 0.25).astype(gy.dtype)
        gy2 = gy.reshape(n, h * w, co)
        if mode is None:
            return _pallas_conv_backward(
                ops, gy2, h=h, w=w, groups=groups, eps=eps, act=act,
                leaky_slope=leaky_slope, interpret=interpret,
                upsample=upsample,
            )
        # gated: gate backward on the pre-gate output w (the stage's gate
        # IS the standalone locate-attention block applied at w); w is
        # recomputed by one conv-only kernel call (remat-style — cheaper
        # than holding an (N,HW,Co) residual across the whole backward)
        conv_ops = {k: ops[k] for k in _CONV_KEYS if k in ops}
        w_pre2 = _pallas_stage_forward(
            conv_ops, h=h, w=w, groups=groups, eps=eps, act=act,
            leaky_slope=leaky_slope, mode=None, interpret=interpret,
            upsample=upsample,
        ).reshape(n, h * w, co)
        if mode == "softmax":
            from locate_tpu.ops.pallas.fused_attention import (
                softmax_gate_stats,
            )

            m, se = softmax_gate_stats(
                w_pre2, ops["pos_proj"], ops["w1x"], ops["b1"],
                ops["w2"], ops["b2"], act=act, leaky_slope=leaky_slope,
                interpret=interpret,
            )
        else:
            m = se = None
        dw2, dpp, dw1, db1, dw2g, db2 = _pallas_backward(
            w_pre2, gy2, ops["pos_proj"], ops["w1x"], ops["b1"],
            ops["w2"], ops["b2"], m, se,
            mode=mode, act=act, leaky_slope=leaky_slope,
            hw_scale=float(h * w), gate_max=gate_max, interpret=interpret,
        )
        grads = _pallas_conv_backward(
            ops, dw2, h=h, w=w, groups=groups, eps=eps, act=act,
            leaky_slope=leaky_slope, interpret=interpret, upsample=upsample,
        )
        grads.update(pos_proj=dpp, w1x=dw1, b1=db1, w2=dw2g, b2=db2)
        return grads

    def bwd_op_fwd(ops, gy):
        return bwd_op(ops, gy), (ops, gy)

    def bwd_op_bwd(res, gg):
        ops, gy = res

        def first_order(o, g):
            _, vjp = jax.vjp(lambda oo: stage_oracle(oo, **kw), o)
            return vjp(g)[0]

        _, vjp2 = jax.vjp(first_order, ops, gy)
        return vjp2(gg)

    bwd_op.defvjp(bwd_op_fwd, bwd_op_bwd)

    @jax.custom_vjp
    def core(ops):
        return _pallas_stage_forward(ops, interpret=interpret, **kw)

    def fwd(ops):
        return core(ops), ops

    def bwd(ops, gy):
        if not hand_written:
            _, vjp = jax.vjp(lambda o: stage_oracle(o, **kw), ops)
            return vjp(gy)
        return (bwd_op(ops, gy),)

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
    gate_max: float = 0.0,                  # AttentionConfig.gate_max
    interpret: bool = False,
    oracle_bwd: bool = False,               # force the XLA-oracle backward
    upsample: bool = False,                 # x is COARSE; fuse nearest-2x in
    downsample: bool = False,               # fuse a trailing 2x2 avg-pool
) -> jax.Array:
    """Fused pre-activation residual conv block with optional fused
    residual-form location attention. See module docstring.

    With `upsample`, `x` is the PRE-upsample (H/2, W/2) tensor and the op
    computes the whole `upsample_nearest(2) -> conv block [-> gate]`
    generator stage head in one pass: the 2x-expanded tensor (the largest
    in the network) never exists in HBM, norm/act/skip run at coarse
    resolution, and the backward pools gradients to coarse in-kernel.
    `pos_proj` (and the output) are at the FINE resolution.

    With `downsample` (the discriminator-stage mirror), the op ends in the
    stage's 2x2 avg-pool, applied in VMEM before the output write: the
    fine post-gate tensor never exists in HBM (output traffic drops 4x
    and the separate pool pass disappears; the softmax pre-gate residual
    w_pre stays fine, as its apply-pass recompute requires). The output is
    (N, H/2, W/2, Co); the backward expands the coarse cotangent exactly
    like the unfused pool's vjp, so no backward-side cost is added."""
    if upsample and downsample:
        raise ValueError("upsample and downsample are mutually exclusive")
    n, h, w_, c = x.shape
    if upsample:
        h, w_ = 2 * h, 2 * w_
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
        bool(interpret), bool(oracle_bwd), bool(upsample), bool(downsample),
        float(gate_max),
    )
    return core(ops)
