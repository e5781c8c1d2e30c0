"""Flash (tiled, memory-linear) dot-product attention Pallas kernels.

Backs the optional FULL self-attention block (`attention.kind="self"`,
ops/self_attention.py — SAGAN, arXiv 1805.08318). The reference's namesake
block is *location-based* (linear-cost) attention; SURVEY.md §3.2 and §6
documented full O(N^2) spatial self-attention as a slot ("if full
self-attention were ever added ... blockwise") — this module fills it the
TPU-native way.

Why a kernel at all: XLA materializes the (T, T) score/probability matrix
in HBM for both forward and backward. At T = H*W = 64^2 = 4096 and batch
64 that is 2 GB of bf16 scores per materialization; at 128^2 it is
off-the-chart. The flash scheme (Dao et al., arXiv 2205.14135; the
blockwise/online-softmax construction goes back to Milakov & Gimelshein,
arXiv 1805.02867) never forms the full matrix: scores live one
(block_q, block_kv) VMEM tile at a time, with running (max, sum-exp)
per-row statistics carried across kv tiles — the same flash-style scratch
accumulation the LocAtE kernels already use (fused_attention.py). Memory
is O(T) instead of O(T^2); HBM traffic is one pass over q/k/v/o.

Layout notes (TPU):
  * Grids iterate sequentially on TPU, so VMEM scratch carries running
    stats across the innermost grid dimension (kv tiles for the forward
    and dq passes; q tiles for the dkv pass).
  * Per-row statistics (logsumexp L, delta = rowsum(do * o)) are stored
    lane-broadcast as (..., T, 128) f32 — a (tq, 1) column read is a
    [:, :1] lane slice, avoiding sublane/lane transposes of 1-D vectors
    (Mosaic-friendly; the standard TPU flash layout).
  * Matmul inputs are cast to the compute dtype (bf16 on TPU) with f32 MXU
    accumulation via preferred_element_type; softmax math is f32.

Backward is hand-written (two passes — dq over kv tiles, dk/dv over q
tiles — plus a cheap XLA delta reduction), NOT jax.vjp of the oracle:
the oracle's backward would rematerialize the (T, T) matrix and forfeit
exactly the memory bound the kernel exists for. First-order only
(custom_vjp); grad-of-grad paths (R1 on a self-attention discriminator)
use the XLA twin, same policy as every other kernel here.

The XLA composition (`attention_reference`) is the fallback and the test
oracle (SURVEY.md §5 item 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -1e30  # "-inf" stand-in: exp(_NEG_BIG - finite) underflows to 0
_STAT_LANES = 128  # lane-broadcast width for per-row stats


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array, *,
                        scale: float) -> jax.Array:
    """Pure-XLA oracle: softmax(q k^T * scale) v over (B, T, d) operands.

    Numerics mirror the kernels exactly: scores accumulate in f32 from
    compute-dtype operands, softmax in f32, probabilities cast back to the
    compute dtype for the value matmul (identity cast under f32 tests)."""
    cd = q.dtype
    s = jnp.einsum("btd,bsd->bts", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bts,bsd->btd", p.astype(cd), v,
                      preferred_element_type=jnp.float32).astype(cd)


def _pick_block(t: int, target: int = 512) -> int:
    """Largest power-of-two tile <= target dividing t (t = H*W is a power
    of two in this model family); ~512 keeps the (tq, tkv) f32 score tile
    at 1 MB — comfortably inside VMEM next to the q/k/v/acc blocks."""
    b = 8
    while b * 2 <= min(t, target) and t % (b * 2) == 0:
        b *= 2
    return b


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, ell_ref, m_scr, l_scr, acc_scr,
                *, scale):
    kv = pl.program_id(2)

    @pl.when(kv == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_BIG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                   # (tq, dh) cd
    k = k_ref[0]                                   # (tkv, dh) cd
    v = v_ref[0]                                   # (tkv, dv) cd
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale                                      # (tq, tkv) f32

    m_prev = m_scr[:, :1]                          # (tq, 1)
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)                        # (tq, tkv) f32
    l_next = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)

    @pl.when(kv == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)
        ell_ref[0] = m_scr[:] + jnp.log(l_scr[:])  # lane-broadcast logsumexp


def _flash_forward(q, k, v, *, scale, block_q, block_kv, interpret):
    """Returns (o, ell) with ell the per-row logsumexp, (B, T, 128) f32."""
    b, t, dh = q.shape
    s_len = k.shape[1]
    dv = v.shape[2]
    tq = block_q or _pick_block(t)
    tkv = block_kv or _pick_block(s_len)
    grid = (b, t // tq, s_len // tkv)

    q_spec = pl.BlockSpec((1, tq, dh), lambda bi, qi, ki: (bi, qi, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, tkv, dh), lambda bi, qi, ki: (bi, ki, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, tkv, dv), lambda bi, qi, ki: (bi, ki, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, tq, dv), lambda bi, qi, ki: (bi, qi, 0),
                          memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, tq, _STAT_LANES),
                             lambda bi, qi, ki: (bi, qi, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=(o_spec, stat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, dv), q.dtype),
            jax.ShapeDtypeStruct((b, t, _STAT_LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tq, _STAT_LANES), jnp.float32),
            pltpu.VMEM((tq, _STAT_LANES), jnp.float32),
            pltpu.VMEM((tq, dv), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _recompute_p_ds(q, k, v, do, ell_col, delta_col, *, scale):
    """Shared tile math: p = exp(s - L) and ds = p * (do v^T - delta)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale                                      # (tq, tkv) f32
    p = jnp.exp(s - ell_col)                       # normalized probs
    dov = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )                                              # (tq, tkv) f32
    ds = p * (dov - delta_col)
    return p, ds


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, ell_ref, dl_ref, dq_ref, acc_scr,
               *, scale):
    kv = pl.program_id(2)

    @pl.when(kv == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    _, ds = _recompute_p_ds(
        q, k, v_ref[0], do_ref[0], ell_ref[0][:, :1], dl_ref[0][:, :1],
        scale=scale,
    )
    acc_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                      # (tq, dh)

    @pl.when(kv == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, ell_ref, dl_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, scale):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    do = do_ref[0]
    p, ds = _recompute_p_ds(
        q, k_ref[0], v_ref[0], do, ell_ref[0][:, :1], dl_ref[0][:, :1],
        scale=scale,
    )
    dv_scr[:] += jax.lax.dot_general(              # p^T do : (tkv, dv)
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_scr[:] += jax.lax.dot_general(              # ds^T q : (tkv, dh)
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(qi == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, ell, do, *, scale, block_q, block_kv,
                    interpret):
    b, t, dh = q.shape
    s_len = k.shape[1]
    dv = v.shape[2]
    tq = block_q or _pick_block(t)
    tkv = block_kv or _pick_block(s_len)

    # delta = rowsum(do * o): cheap elementwise+reduce, lane-broadcast for
    # the kernels' [:, :1] column reads (no reason to burn a Pallas pass).
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (b, t, _STAT_LANES))

    q_spec2 = pl.BlockSpec((1, tq, dh), lambda bi, i, j: (bi, i, 0),
                           memory_space=pltpu.VMEM)
    do_spec2 = pl.BlockSpec((1, tq, dv), lambda bi, i, j: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    k_spec2 = pl.BlockSpec((1, tkv, dh), lambda bi, i, j: (bi, j, 0),
                           memory_space=pltpu.VMEM)
    v_spec2 = pl.BlockSpec((1, tkv, dv), lambda bi, i, j: (bi, j, 0),
                           memory_space=pltpu.VMEM)
    stat_spec2 = pl.BlockSpec((1, tq, _STAT_LANES),
                              lambda bi, i, j: (bi, i, 0),
                              memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        grid=(b, t // tq, s_len // tkv),
        in_specs=[q_spec2, k_spec2, v_spec2, do_spec2, stat_spec2, stat_spec2],
        out_specs=q_spec2,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((tq, dh), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, ell, delta)

    # dkv pass: q tiles innermost; kv-tile blocks indexed by grid dim 1.
    q_spec3 = pl.BlockSpec((1, tq, dh), lambda bi, j, i: (bi, i, 0),
                           memory_space=pltpu.VMEM)
    do_spec3 = pl.BlockSpec((1, tq, dv), lambda bi, j, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    k_spec3 = pl.BlockSpec((1, tkv, dh), lambda bi, j, i: (bi, j, 0),
                           memory_space=pltpu.VMEM)
    v_spec3 = pl.BlockSpec((1, tkv, dv), lambda bi, j, i: (bi, j, 0),
                           memory_space=pltpu.VMEM)
    stat_spec3 = pl.BlockSpec((1, tq, _STAT_LANES),
                              lambda bi, j, i: (bi, i, 0),
                              memory_space=pltpu.VMEM)
    dk, dv_grad = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        grid=(b, s_len // tkv, t // tq),
        in_specs=[q_spec3, k_spec3, v_spec3, do_spec3, stat_spec3, stat_spec3],
        out_specs=(k_spec3, v_spec3),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((tkv, dh), jnp.float32),
            pltpu.VMEM((tkv, dv), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do, ell, delta)
    return dq, dk, dv_grad


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_flash_core(scale: float, block_q, block_kv, interpret: bool):
    @jax.custom_vjp
    def core(q, k, v):
        o, _ = _flash_forward(q, k, v, scale=scale, block_q=block_q,
                              block_kv=block_kv, interpret=interpret)
        return o

    def fwd(q, k, v):
        o, ell = _flash_forward(q, k, v, scale=scale, block_q=block_q,
                                block_kv=block_kv, interpret=interpret)
        return o, (q, k, v, o, ell)

    def bwd(residuals, do):
        q, k, v, o, ell = residuals
        return _flash_backward(q, k, v, o, ell, do, scale=scale,
                               block_q=block_q, block_kv=block_kv,
                               interpret=interpret)

    core.defvjp(fwd, bwd)
    return core


def flash_attention(
    q: jax.Array,  # (B, T, dh)
    k: jax.Array,  # (B, S, dh)
    v: jax.Array,  # (B, S, dv)
    *,
    scale: float,
    block_q: int | None = None,
    block_kv: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k^T * scale) v without materializing the (T, S) matrix.

    Differentiable FIRST-ORDER ONLY (custom_vjp with hand-written flash
    backward); grad-of-grad must use `attention_reference` (the train
    step's R1 XLA-twin pattern handles this automatically via
    use_pallas=False twins). T and S must be divisible by the (power-of-
    two) block sizes; defaults pick the largest <= 512 that divides."""
    return _make_flash_core(float(scale), block_q, block_kv, interpret)(q, k, v)
