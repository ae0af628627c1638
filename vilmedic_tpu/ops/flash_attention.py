"""Pallas flash attention (online-softmax, tiled) for long token axes.

The reference's long-sequence axis is multi-image patch concatenation — N images
x S patches fused into one cross-attention memory (reference RRG_HF.py:116-152,
visual_encoder multi-image path; SURVEY.md §5 "long-context") — and the
VisionLanguage prefix-LM's image prefix (~1.4k tokens at DINOv2 resolution),
whose prefill/train passes are *causal*. At those lengths XLA's materialized
(Tq, Tk) attention becomes HBM-bound; this kernel streams K/V blocks through
VMEM with the online-softmax recurrence so the score matrix never hits HBM.
``causal=True`` additionally skips K/V blocks entirely above the diagonal and
masks the diagonal block.

Differentiation: ``flash_attention`` carries a ``jax.custom_vjp`` whose
backward is a pair of fused Pallas kernels (FlashAttention-2 recurrence: dq
blocked over query rows; dk/dv/dbias blocked over key rows) — the (Tq, Tk)
score matrix never hits HBM in EITHER pass. The forward saves the per-row
log-sum-exp (f32, replicated across one small sublane tile — see STATS_LANES)
so the backward recomputes probabilities
block-locally from q·kᵀ − lse. ``VILMEDIC_FLASH_BWD=xla`` falls back to the
round-3 behavior (recompute the mathematically identical dense XLA attention
and differentiate that) for A/B and as a safety hatch.

Static shapes only (this toolchain's Mosaic rejects dynamic ref offsets); the
key padding mask is passed as an additive bias row. ``flash_attention`` matches
``ops.attention.dot_product_attention`` to f32 tolerance and is exposed through
the same (B, T, H, D) layout.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9
LANE = 128
# Per-row stats (lse, delta) are replicated across a SMALL lane tile so
# stores/loads stay layout-friendly (no sublane<->lane transpose in the
# kernels) without paying full 128-lane replication in HBM: at VL-518 train
# shapes the (BH, Tq, 128) f32 residuals were ~75 MB each of pure HBM traffic
# when only the VMEM-side view needs lane width (ADVICE r4). 8 lanes keeps the
# HBM array 16x smaller; Mosaic pads the VMEM tile to the lane width itself.
STATS_LANES = 8


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *maybe_lse, block_k: int,
            scale: float, block_q: int, causal: bool, off: int,
            with_lse: bool = False):
    from jax.experimental import pallas as pl

    # matmuls run in the INPUT dtype with f32 accumulation: bf16 operands hit
    # the MXU at full rate (upcasting to f32 first ran the scores matmul as a
    # multi-pass f32 MXU decomposition — measured ~23% of peak at the VL-518
    # prefill shape). bf16 products are exact in f32 accumulation; only the
    # softmax-weights cast below loses bits (same trade as the dense XLA
    # path, ops/attention.py). The scale folds into the f32 scores instead
    # of the operand.
    q = q_ref[0]  # (bq, d), input dtype
    tk = k_ref.shape[1]
    num_kv = tk // block_k
    iq = pl.program_id(1)

    def make_body(masked):
        def body(i, carry):
            acc, m, l = carry
            k = k_ref[0, pl.ds(i * block_k, block_k), :]
            v = v_ref[0, pl.ds(i * block_k, block_k), :]
            b = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (bq, bk) f32
            s = s + b[None, :]
            if masked:
                # query row r attends key col c iff c <= r + off (off = Tk -
                # Tq of the UNPADDED lengths; padded cols carry NEG_INF in
                # the bias). Only blocks intersecting the diagonal run this —
                # interior blocks are fully visible and skip the three
                # iota/compare/select VPU passes (the kernel is VPU-bound,
                # not MXU-bound, at these shapes).
                bq = q.shape[0]
                rows = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
                cols = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
                s = jnp.where(cols <= rows + off, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc_new, m_new, l_new
        return body

    d = q_ref.shape[-1]
    bq = q.shape[0]
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    carry = (acc0, m0, l0)
    if causal:
        # skip K/V blocks whose every column is above the diagonal for every
        # row of this q block: last visible col = (iq+1)*block_q - 1 + off
        hi = jnp.minimum(
            num_kv, (((iq + 1) * block_q + off) + block_k - 1) // block_k
        )
        hi = jnp.maximum(hi, 0)
        # blocks below lo_partial are fully visible for every row of this q
        # block: block i is full iff i*bk + bk - 1 <= iq*block_q + off (the
        # first row's limit), i.e. i < (iq*block_q + off + 1) // block_k
        lo_partial = jnp.clip((iq * block_q + off + 1) // block_k, 0, hi)
        carry = jax.lax.fori_loop(0, lo_partial, make_body(False), carry)
        carry = jax.lax.fori_loop(lo_partial, hi, make_body(True), carry)
    else:
        carry = jax.lax.fori_loop(0, num_kv, make_body(False), carry)
    acc, m, l = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if with_lse:
        lse = m + jnp.log(jnp.maximum(l, 1e-30))  # (bq, 1)
        maybe_lse[0][0] = jnp.broadcast_to(lse, (bq, STATS_LANES))


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "causal", "off",
                     "with_lse"),
)
def _flash_bhtd(q, k, v, bias, block_q=128, block_k=128, interpret=False,
                causal=False, off=0, with_lse=False):
    """q: (BH, Tq, D), k/v: (BH, Tk, D), bias: (BH, 1, Tk) additive.

    ``with_lse=True`` additionally returns the per-row log-sum-exp as
    (BH, Tq, STATS_LANES) f32 (sublane-tile-replicated) — the backward
    kernels' residual."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, tq, d = q.shape
    tk = k.shape[1]
    block_q = min(block_q, tq)
    block_k = min(block_k, tk)
    assert tq % block_q == 0 and tk % block_k == 0
    scale = d ** -0.5

    grid = (bh, tq // block_q)
    out_shape = jax.ShapeDtypeStruct((bh, tq, d), q.dtype)
    out_specs = pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    if with_lse:
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((bh, tq, STATS_LANES), jnp.float32)]
        out_specs = [out_specs,
                     pl.BlockSpec((1, block_q, STATS_LANES),
                                  lambda b, i: (b, i, 0),
                                  memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, scale=scale,
                          block_q=block_q, causal=causal, off=off,
                          with_lse=with_lse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v, bias)


def _pad_bhtd(q, k, v, keybias, block_q, block_k):
    """Shared fwd/bwd prep: pad to block multiples, fold (B, T, H, D) ->
    (BH, T, D), expand the key bias to (BH, 1, Tk)."""
    b, tq, h, d = q.shape
    tk = k.shape[1]

    def to_bhtd(x):
        return jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)

    pad_q = (-tq) % min(block_q, max(tq, 1))
    pad_k = (-tk) % min(block_k, max(tk, 1))
    bias = keybias
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad_k)), constant_values=NEG_INF)
    bias_bh = jnp.repeat(bias, h, axis=0)[:, None, :]  # (BH, 1, Tkp)
    return to_bhtd(q), to_bhtd(k), to_bhtd(v), bias_bh, to_bhtd


def _flash_forward(q, k, v, keybias, block_q, block_k, interpret, causal,
                   with_lse=False):
    """(B, T, H, D) wrapper: pad to block multiples, run the kernel."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    off = tk - tq
    qp, kp, vp, bias_bh, _ = _pad_bhtd(q, k, v, keybias, block_q, block_k)
    res = _flash_bhtd(
        qp, kp, vp, bias_bh,
        block_q=block_q, block_k=block_k, interpret=interpret,
        causal=causal, off=off, with_lse=with_lse,
    )
    out, lse = res if with_lse else (res, None)
    out = out.reshape(b, h, -1, d).swapaxes(1, 2)[:, :tq]
    return (out, lse) if with_lse else out


def _reference_attention(q, k, v, keybias, causal):
    """Mathematically identical XLA attention — the custom-vjp backward
    recomputes and differentiates this (f32 scores/softmax, same masks)."""
    d = q.shape[-1]
    tq, tk = q.shape[1], k.shape[1]
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32) * (d ** -0.5),
        k.astype(jnp.float32), preferred_element_type=jnp.float32,
    )
    scores = scores + keybias[:, None, None, :]
    if causal:
        row = jnp.arange(tq)[:, None]
        col = jnp.arange(tk)[None, :]
        scores = scores + jnp.where(col <= row + (tk - tq), 0.0, NEG_INF)[None, None]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", w, v.astype(jnp.float32)
    ).astype(q.dtype)


# ---------------------------------------------------------------------------
# v2: transpose-free, head-pair-packed kernels.
#
# The v1 kernels take (BH, T, D) slabs, which costs a real (B, T, H, D) ->
# (B, H, T, D) relayout per operand per call (~12 ms per VL-518 prefill) and
# runs every MXU contraction at D=64 — half the 128-lane systolic depth. v2
# reads the projections' NATIVE (B, T, H*D) layout ((B, T, H, D) -> (B, T,
# H*D) is a pure bitcast): the grid is (B, H*D//128, Tq blocks), each step
# owning one 128-lane block = ``hpb = 128//D`` heads. Queries are packed as
# hpb lane-masked row blocks (the fused beam kernel's trick: the other heads'
# lanes contribute exact zeros, so the 128-deep dot equals the per-head
# D-deep dot) — full-depth MXU contractions, zero relayouts, and the output
# block IS the (B, T, H*D) slice (per-head results selected by lane group).
# Same online-softmax math; lse/delta residuals live per head-pair as
# (B, HP, Tq, hpb*STATS_LANES).
# ---------------------------------------------------------------------------


def _v2_masks(bq: int, d: int, hpb: int):
    from jax import lax

    lane_iota = lax.broadcasted_iota(jnp.int32, (bq, LANE), 1)
    return [(lane_iota >= hi * d) & (lane_iota < (hi + 1) * d)
            for hi in range(hpb)]


def _v2_pack(x, masks):
    """(bq, LANE) -> (hpb*bq, LANE) lane-masked head row blocks."""
    zero = jnp.zeros_like(x)
    return jnp.concatenate([jnp.where(m, x, zero) for m in masks], axis=0)


def _v2_lse_col(stats2, hi: int):
    """Extract head ``hi``'s per-row stat from a (bq, hpb*STATS_LANES) block
    as (bq, 1) — masked lane-sum instead of a sub-128 lane slice."""
    from jax import lax

    iota = lax.broadcasted_iota(jnp.int32, stats2.shape, 1)
    return jnp.sum(
        jnp.where(iota == hi * STATS_LANES, stats2, 0.0), axis=-1,
        keepdims=True,
    )


def _kernel_v2(q_ref, k_ref, v_ref, bias_ref, o_ref, *maybe_lse,
               block_k: int, scale: float, block_q: int, causal: bool,
               off: int, d: int, with_lse: bool = False):
    from jax.experimental import pallas as pl

    q2 = q_ref[0]                                  # (bq, LANE), input dtype
    bq = q2.shape[0]
    hpb = LANE // d
    masks = _v2_masks(bq, d, hpb)
    q_all = _v2_pack(q2, masks)                    # (hpb*bq, LANE)
    tk = k_ref.shape[1]
    num_kv = tk // block_k
    iq = pl.program_id(2)
    rows1 = iq * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (bq, block_k), 0
    )
    rows_all = jnp.concatenate([rows1] * hpb, axis=0)

    def make_body(masked):
        def body(i, carry):
            acc, m, l = carry
            k = k_ref[0, pl.ds(i * block_k, block_k), :]
            v = v_ref[0, pl.ds(i * block_k, block_k), :]
            b = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
            s = jax.lax.dot_general(
                q_all, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + b[None, :]                 # (hpb*bq, bk)
            if masked:
                cols = i * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (hpb * bq, block_k), 1
                )
                s = jnp.where(cols <= rows_all + off, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc_new, m_new, l_new
        return body

    rows2 = hpb * bq
    carry = (jnp.zeros((rows2, LANE), jnp.float32),
             jnp.full((rows2, 1), NEG_INF, jnp.float32),
             jnp.zeros((rows2, 1), jnp.float32))
    if causal:
        hi_b = jnp.minimum(
            num_kv, (((iq + 1) * block_q + off) + block_k - 1) // block_k
        )
        hi_b = jnp.maximum(hi_b, 0)
        lo_partial = jnp.clip((iq * block_q + off + 1) // block_k, 0, hi_b)
        carry = jax.lax.fori_loop(0, lo_partial, make_body(False), carry)
        carry = jax.lax.fori_loop(lo_partial, hi_b, make_body(True), carry)
    else:
        carry = jax.lax.fori_loop(0, num_kv, make_body(False), carry)
    acc, m, l = carry

    oh = acc / jnp.maximum(l, 1e-30)               # (hpb*bq, LANE)
    out = oh[(hpb - 1) * bq:rows2]
    for hi in range(hpb - 1):
        out = jnp.where(masks[hi], oh[hi * bq:(hi + 1) * bq], out)
    o_ref[0] = out.astype(o_ref.dtype)
    if with_lse:
        lse = m + jnp.log(jnp.maximum(l, 1e-30))   # (hpb*bq, 1)
        maybe_lse[0][0, 0] = jnp.concatenate(
            [jnp.broadcast_to(lse[hi * bq:(hi + 1) * bq], (bq, STATS_LANES))
             for hi in range(hpb)], axis=1,
        )


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "causal", "off",
                     "with_lse", "d"),
)
def _flash_bthd(q, k, v, bias, d, block_q=512, block_k=512, interpret=False,
                causal=False, off=0, with_lse=False):
    """v2 entry: q (B, Tq, HD), k/v (B, Tk, HD), bias (B, Tk) additive; HD a
    128-multiple, 128 % d == 0. ``with_lse`` adds a (B, HP, Tq,
    hpb*STATS_LANES) f32 residual (per-head lane groups of STATS_LANES)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tq, hd = q.shape
    tk = k.shape[1]
    block_q = min(block_q, tq)
    block_k = min(block_k, tk)
    assert tq % block_q == 0 and tk % block_k == 0 and hd % LANE == 0
    hp_n = hd // LANE
    hpb = LANE // d
    scale = d ** -0.5

    grid = (b, hp_n, tq // block_q)
    out_shape = jax.ShapeDtypeStruct((b, tq, hd), q.dtype)
    qo_spec = pl.BlockSpec((1, block_q, LANE), lambda bb, hp, i: (bb, i, hp),
                           memory_space=pltpu.VMEM)
    out_specs = qo_spec
    if with_lse:
        out_shape = [out_shape, jax.ShapeDtypeStruct(
            (b, hp_n, tq, hpb * STATS_LANES), jnp.float32)]
        out_specs = [out_specs, pl.BlockSpec(
            (1, 1, block_q, hpb * STATS_LANES),
            lambda bb, hp, i: (bb, hp, i, 0), memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        functools.partial(_kernel_v2, block_k=block_k, scale=scale,
                          block_q=block_q, causal=causal, off=off, d=d,
                          with_lse=with_lse),
        grid=grid,
        in_specs=[
            qo_spec,
            pl.BlockSpec((1, tk, LANE), lambda bb, hp, i: (bb, 0, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, LANE), lambda bb, hp, i: (bb, 0, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk), lambda bb, hp, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v, bias[:, None, :])


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, *, block_k: int, scale: float, block_q: int,
                   causal: bool, off: int):
    """dQ blocked over query rows: dS = P ⊙ (dO·Vᵀ − Δ); dQ = scale · dS·K.
    P is recomputed block-locally as exp(S − lse) — no (Tq, Tk) HBM traffic."""
    from jax.experimental import pallas as pl

    # matmuls in the input dtype (f32 accumulation) — see _kernel's note
    q = q_ref[0]                                  # (bq, d)
    do = do_ref[0]                                # (bq, d)
    lse = lse_ref[0][:, :1]                       # (bq, 1) — lane-replicated
    delta = delta_ref[0][:, :1]
    tk = k_ref.shape[1]
    num_kv = tk // block_k
    iq = pl.program_id(1)
    bq, d = q.shape

    def make_body(masked):
        def body(i, acc):
            k = k_ref[0, pl.ds(i * block_k, block_k), :]
            v = v_ref[0, pl.ds(i * block_k, block_k), :]
            b = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + b[None, :]
            if masked:  # diagonal-intersecting blocks only (see _kernel)
                rows = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
                cols = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
                s = jnp.where(cols <= rows + off, s, NEG_INF)
            p = jnp.exp(s - lse)                   # (bq, bk); masked -> 0
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (p * (dp - delta)).astype(k.dtype)
            return acc + jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return body

    acc = jnp.zeros((bq, d), jnp.float32)
    if causal:
        hi = jnp.minimum(
            num_kv, (((iq + 1) * block_q + off) + block_k - 1) // block_k
        )
        hi = jnp.maximum(hi, 0)
        lo_partial = jnp.clip((iq * block_q + off + 1) // block_k, 0, hi)
        acc = jax.lax.fori_loop(0, lo_partial, make_body(False), acc)
        acc = jax.lax.fori_loop(lo_partial, hi, make_body(True), acc)
    else:
        acc = jax.lax.fori_loop(0, num_kv, make_body(False), acc)
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dbias_ref, *, block_q: int, scale: float,
                    block_k: int, causal: bool, off: int):
    """dK/dV/dbias blocked over key rows, looping query blocks:
    dV += Pᵀ·dO;  dK += scale · dSᵀ·Q;  dbias += Σ_rows dS."""
    from jax.experimental import pallas as pl

    # matmuls in the input dtype (f32 accumulation) — see _kernel's note
    k = k_ref[0]                                  # (bk, d)
    v = v_ref[0]
    b = bias_ref[0, 0].astype(jnp.float32)        # (bk,)
    tq = q_ref.shape[1]
    num_q = tq // block_q
    ik = pl.program_id(1)
    bk, d = k.shape

    def make_body(masked):
        def body(j, carry):
            dk_acc, dv_acc, db_acc = carry
            q = q_ref[0, pl.ds(j * block_q, block_q), :]
            do = do_ref[0, pl.ds(j * block_q, block_q), :]
            lse = lse_ref[0, pl.ds(j * block_q, block_q), :][:, :1]
            delta = delta_ref[0, pl.ds(j * block_q, block_q), :][:, :1]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + b[None, :]
            if masked:  # diagonal-intersecting blocks only (see _kernel)
                rows = j * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 0)
                cols = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 1)
                s = jnp.where(cols <= rows + off, s, NEG_INF)
            p = jnp.exp(s - lse)                   # (bq, bk)
            dv_acc = dv_acc + jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db_acc = db_acc + jnp.sum(ds, axis=0)
            return dk_acc, dv_acc, db_acc
        return body

    zeros = (jnp.zeros((bk, d), jnp.float32), jnp.zeros((bk, d), jnp.float32),
             jnp.zeros((bk,), jnp.float32))
    if causal:
        # first query block whose last row can see this key block's first col:
        # need r >= c_min - off with c_min = ik*block_k
        lo = jnp.maximum(0, (ik * block_k - off) // block_q)
        # q block j is FULLY visible iff its first row sees this key block's
        # last col: j*block_q + off >= (ik+1)*block_k - 1
        j_full = jnp.clip(
            (ik * block_k + block_k - 1 - off + block_q - 1) // block_q,
            lo, num_q,
        )
        carry = jax.lax.fori_loop(lo, j_full, make_body(True), zeros)
        carry = jax.lax.fori_loop(j_full, num_q, make_body(False), carry)
    else:
        carry = jax.lax.fori_loop(0, num_q, make_body(False), zeros)
    dk_acc, dv_acc, db_acc = carry
    # dK = scale · dSᵀ·Q — the scale factors out of the block sum
    dk_ref[0] = (dk_acc * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)
    dbias_ref[0, 0] = db_acc


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "causal", "off"),
)
def _flash_bwd_bhtd(q, k, v, bias, do, lse, delta, block_q, block_k,
                    interpret, causal, off):
    """(BH, T, D) backward: two pallas_calls (dq over q blocks; dk/dv/dbias
    over k blocks). lse/delta are (BH, Tq, STATS_LANES) tile-replicated f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, tq, d = q.shape
    tk = k.shape[1]
    block_q = min(block_q, tq)
    block_k = min(block_k, tk)
    assert tq % block_q == 0 and tk % block_k == 0
    scale = d ** -0.5

    def vmem(shape, index):
        return pl.BlockSpec(shape, index, memory_space=pltpu.VMEM)

    q_blk = vmem((1, block_q, d), lambda b, i: (b, i, 0))
    q_full = vmem((1, tq, d), lambda b, i: (b, 0, 0))
    k_full = vmem((1, tk, d), lambda b, i: (b, 0, 0))
    k_blk = vmem((1, block_k, d), lambda b, i: (b, i, 0))
    stats_blk = vmem((1, block_q, STATS_LANES), lambda b, i: (b, i, 0))
    stats_full = vmem((1, tq, STATS_LANES), lambda b, i: (b, 0, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, scale=scale,
                          block_q=block_q, causal=causal, off=off),
        grid=(bh, tq // block_q),
        in_specs=[q_blk, k_full, k_full,
                  vmem((1, 1, tk), lambda b, i: (b, 0, 0)),
                  q_blk, stats_blk, stats_blk],
        out_specs=q_blk,
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias, do, lse, delta)

    dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, scale=scale,
                          block_k=block_k, causal=causal, off=off),
        grid=(bh, tk // block_k),
        in_specs=[q_full, k_blk, k_blk,
                  vmem((1, 1, block_k), lambda b, i: (b, 0, i)),
                  q_full, stats_full, stats_full],
        out_specs=[k_blk, k_blk,
                   vmem((1, 1, block_k), lambda b, i: (b, 0, i))],
        out_shape=[jax.ShapeDtypeStruct((bh, tk, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, tk, d), v.dtype),
                   jax.ShapeDtypeStruct((bh, 1, tk), jnp.float32)],
        interpret=interpret,
    )(q, k, v, bias, do, lse, delta)
    return dq, dk, dv, dbias


def _bwd_dq_kernel_v2(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                      delta_ref, dq_ref, *, block_k: int, scale: float,
                      block_q: int, causal: bool, off: int, d: int):
    from jax.experimental import pallas as pl

    q2 = q_ref[0]
    do2 = do_ref[0]
    bq = q2.shape[0]
    hpb = LANE // d
    masks = _v2_masks(bq, d, hpb)
    q_all = _v2_pack(q2, masks)
    do_all = _v2_pack(do2, masks)
    lse2 = lse_ref[0, 0]                           # (bq, hpb*STATS_LANES)
    delta2 = delta_ref[0, 0]
    lse_all = jnp.concatenate(
        [_v2_lse_col(lse2, hi) for hi in range(hpb)], axis=0)
    delta_all = jnp.concatenate(
        [_v2_lse_col(delta2, hi) for hi in range(hpb)], axis=0)
    tk = k_ref.shape[1]
    num_kv = tk // block_k
    iq = pl.program_id(2)
    rows_all = jnp.concatenate(
        [iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)]
        * hpb, axis=0)

    def make_body(masked):
        def body(i, acc):
            k = k_ref[0, pl.ds(i * block_k, block_k), :]
            v = v_ref[0, pl.ds(i * block_k, block_k), :]
            b = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
            s = jax.lax.dot_general(
                q_all, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + b[None, :]
            if masked:
                cols = i * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (hpb * bq, block_k), 1)
                s = jnp.where(cols <= rows_all + off, s, NEG_INF)
            p = jnp.exp(s - lse_all)
            dp = jax.lax.dot_general(
                do_all, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (p * (dp - delta_all)).astype(k.dtype)
            return acc + jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return body

    rows2 = hpb * bq
    acc = jnp.zeros((rows2, LANE), jnp.float32)
    if causal:
        hi_b = jnp.minimum(
            num_kv, (((iq + 1) * block_q + off) + block_k - 1) // block_k)
        hi_b = jnp.maximum(hi_b, 0)
        lo_partial = jnp.clip((iq * block_q + off + 1) // block_k, 0, hi_b)
        acc = jax.lax.fori_loop(0, lo_partial, make_body(False), acc)
        acc = jax.lax.fori_loop(lo_partial, hi_b, make_body(True), acc)
    else:
        acc = jax.lax.fori_loop(0, num_kv, make_body(False), acc)
    dq = acc[(hpb - 1) * bq:rows2]
    for hi in range(hpb - 1):
        dq = jnp.where(masks[hi], acc[hi * bq:(hi + 1) * bq], dq)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel_v2(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                       delta_ref, dk_ref, dv_ref, dbias_ref, *, block_q: int,
                       scale: float, block_k: int, causal: bool, off: int,
                       d: int):
    from jax.experimental import pallas as pl

    k = k_ref[0]                                   # (bk, LANE)
    v = v_ref[0]
    b = bias_ref[0, 0].astype(jnp.float32)         # (bk,)
    tq = q_ref.shape[1]
    num_q = tq // block_q
    ik = pl.program_id(2)
    bk = k.shape[0]
    hpb = LANE // d
    masks = _v2_masks(block_q, d, hpb)

    def make_body(masked):
        def body(j, carry):
            dk_acc, dv_acc, db_acc = carry
            q_all = _v2_pack(q_ref[0, pl.ds(j * block_q, block_q), :], masks)
            do_all = _v2_pack(do_ref[0, pl.ds(j * block_q, block_q), :], masks)
            lse2 = lse_ref[0, 0, pl.ds(j * block_q, block_q), :]
            delta2 = delta_ref[0, 0, pl.ds(j * block_q, block_q), :]
            lse_all = jnp.concatenate(
                [_v2_lse_col(lse2, hi) for hi in range(hpb)], axis=0)
            delta_all = jnp.concatenate(
                [_v2_lse_col(delta2, hi) for hi in range(hpb)], axis=0)
            s = jax.lax.dot_general(
                q_all, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + b[None, :]
            if masked:
                rows = j * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, bk), 0)
                rows = jnp.concatenate([rows] * hpb, axis=0)
                cols = ik * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (hpb * block_q, bk), 1)
                s = jnp.where(cols <= rows + off, s, NEG_INF)
            p = jnp.exp(s - lse_all)               # (hpb*bq, bk)
            # do/q are lane-masked, so summing the head row blocks in ONE
            # rows-contraction matmul lands each head's contribution in its
            # own lane group — no per-head select needed for dk/dv
            dv_acc = dv_acc + jax.lax.dot_general(
                p.astype(do_all.dtype), do_all, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do_all, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta_all)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds.astype(q_all.dtype), q_all, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db_acc = db_acc + jnp.sum(ds, axis=0)
            return dk_acc, dv_acc, db_acc
        return body

    zeros = (jnp.zeros((bk, LANE), jnp.float32),
             jnp.zeros((bk, LANE), jnp.float32),
             jnp.zeros((bk,), jnp.float32))
    if causal:
        lo = jnp.maximum(0, (ik * block_k - off) // block_q)
        j_full = jnp.clip(
            (ik * block_k + block_k - 1 - off + block_q - 1) // block_q,
            lo, num_q,
        )
        carry = jax.lax.fori_loop(lo, j_full, make_body(True), zeros)
        carry = jax.lax.fori_loop(j_full, num_q, make_body(False), carry)
    else:
        carry = jax.lax.fori_loop(0, num_q, make_body(False), zeros)
    dk_acc, dv_acc, db_acc = carry
    dk_ref[0] = (dk_acc * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)
    dbias_ref[0, 0, 0] = db_acc


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "causal", "off", "d"),
)
def _flash_bwd_bthd(q, k, v, bias, do, lse, delta, d, block_q, block_k,
                    interpret, causal, off):
    """v2 backward: (B, T, HD) operands, (B, HP, Tq, hpb*STATS_LANES)
    residuals; dbias returned per head-pair as (B, HP, 1, Tk)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tq, hd = q.shape
    tk = k.shape[1]
    block_q = min(block_q, tq)
    block_k = min(block_k, tk)
    assert tq % block_q == 0 and tk % block_k == 0 and hd % LANE == 0
    hp_n = hd // LANE
    hpb = LANE // d
    scale = d ** -0.5
    bias3 = bias[:, None, :]

    def vmem(shape, index):
        return pl.BlockSpec(shape, index, memory_space=pltpu.VMEM)

    q_blk = vmem((1, block_q, LANE), lambda bb, hp, i: (bb, i, hp))
    q_full = vmem((1, tq, LANE), lambda bb, hp, i: (bb, 0, hp))
    k_full = vmem((1, tk, LANE), lambda bb, hp, i: (bb, 0, hp))
    k_blk = vmem((1, block_k, LANE), lambda bb, hp, i: (bb, i, hp))
    bias_full = vmem((1, 1, tk), lambda bb, hp, i: (bb, 0, 0))
    stats_blk = vmem((1, 1, block_q, hpb * STATS_LANES),
                     lambda bb, hp, i: (bb, hp, i, 0))
    stats_full = vmem((1, 1, tq, hpb * STATS_LANES),
                      lambda bb, hp, i: (bb, hp, 0, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_v2, block_k=block_k, scale=scale,
                          block_q=block_q, causal=causal, off=off, d=d),
        grid=(b, hp_n, tq // block_q),
        in_specs=[q_blk, k_full, k_full, bias_full, q_blk, stats_blk,
                  stats_blk],
        out_specs=q_blk,
        out_shape=jax.ShapeDtypeStruct((b, tq, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, bias3, do, lse, delta)

    dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_v2, block_q=block_q, scale=scale,
                          block_k=block_k, causal=causal, off=off, d=d),
        grid=(b, hp_n, tk // block_k),
        in_specs=[q_full, k_blk, k_blk,
                  vmem((1, 1, block_k), lambda bb, hp, i: (bb, 0, i)),
                  q_full, stats_full, stats_full],
        out_specs=[k_blk, k_blk,
                   vmem((1, 1, 1, block_k), lambda bb, hp, i: (bb, hp, 0, i))],
        out_shape=[jax.ShapeDtypeStruct((b, tk, hd), k.dtype),
                   jax.ShapeDtypeStruct((b, tk, hd), v.dtype),
                   jax.ShapeDtypeStruct((b, hp_n, 1, tk), jnp.float32)],
        interpret=interpret,
    )(q, k, v, bias3, do, lse, delta)
    return dq, dk, dv, dbias


def _v2_pad(x, t_to):
    pad = t_to - x.shape[1]
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x


def _flash_v2_forward(q, k, v, keybias, d, block_q, block_k, interpret,
                      causal, with_lse=False):
    """(B, T, HD) wrapper: pad T to block multiples (no relayout — the fold
    from (B, T, H, D) is a bitcast), run the packed kernel."""
    b, tq, hd = q.shape
    tk = k.shape[1]
    off = tk - tq
    tqp = tq + (-tq) % min(block_q, max(tq, 1))
    tkp = tk + (-tk) % min(block_k, max(tk, 1))
    bias = keybias
    if tkp != tk:
        bias = jnp.pad(bias, ((0, 0), (0, tkp - tk)), constant_values=NEG_INF)
    res = _flash_bthd(
        _v2_pad(q, tqp), _v2_pad(k, tkp), _v2_pad(v, tkp), bias, d,
        block_q=block_q, block_k=block_k, interpret=interpret, causal=causal,
        off=off, with_lse=with_lse,
    )
    out, lse = res if with_lse else (res, None)
    out = out[:, :tq]
    return (out, lse) if with_lse else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_v2_diff(q, k, v, keybias, d, block_q, block_k, interpret, causal):
    return _flash_v2_forward(q, k, v, keybias, d, block_q, block_k, interpret,
                             causal)


def _flash_v2_diff_fwd(q, k, v, keybias, d, block_q, block_k, interpret,
                       causal):
    if _bwd_impl() == "xla":
        out = _flash_v2_forward(q, k, v, keybias, d, block_q, block_k,
                                interpret, causal)
        return out, (q, k, v, keybias)
    out, lse = _flash_v2_forward(q, k, v, keybias, d, block_q, block_k,
                                 interpret, causal, with_lse=True)
    return out, (q, k, v, keybias, out, lse)


def _flash_v2_diff_bwd(d, block_q, block_k, interpret, causal, res, g):
    if len(res) == 4:  # VILMEDIC_FLASH_BWD=xla fallback
        q, k, v, keybias = res
        b, tq, hd = q.shape

        def ref(q_, k_, v_, b_):
            un = lambda x: x.reshape(b, x.shape[1], hd // d, d)
            return _reference_attention(
                un(q_), un(k_), un(v_), b_, causal
            ).reshape(b, tq, hd)

        _, vjp = jax.vjp(ref, q, k, v, keybias)
        return vjp(g)
    q, k, v, keybias, out, lse = res
    b, tq, hd = q.shape
    tk = k.shape[1]
    off = tk - tq
    hp_n = hd // LANE
    hpb = LANE // d
    tqp = tq + (-tq) % min(block_q, max(tq, 1))
    tkp = tk + (-tk) % min(block_k, max(tk, 1))
    bias = keybias
    if tkp != tk:
        bias = jnp.pad(bias, ((0, 0), (0, tkp - tk)), constant_values=NEG_INF)
    qp, kp, vp = _v2_pad(q, tqp), _v2_pad(k, tkp), _v2_pad(v, tkp)
    gp, outp = _v2_pad(g, tqp), _v2_pad(out, tqp)
    # Δ per (row, head): rowsum(dO ⊙ O) within each head's d lanes, laid out
    # as the lse residual is — (B, HP, Tqp, hpb*STATS_LANES)
    prod = (gp.astype(jnp.float32) * outp.astype(jnp.float32)).reshape(
        b, tqp, hp_n, hpb, d).sum(-1)
    delta = jnp.repeat(
        prod.transpose(0, 2, 1, 3), STATS_LANES, axis=-1)
    dq, dk, dv, dbias = _flash_bwd_bthd(
        qp, kp, vp, bias, gp, lse, delta, d,
        block_q=block_q, block_k=block_k, interpret=interpret, causal=causal,
        off=off,
    )
    dbias = dbias.sum(1)[:, 0, :tk].astype(keybias.dtype)
    return (dq[:, :tq].astype(q.dtype), dk[:, :tk].astype(k.dtype),
            dv[:, :tk].astype(v.dtype), dbias)


_flash_v2_diff.defvjp(_flash_v2_diff_fwd, _flash_v2_diff_bwd)


def _flash_backward(q, k, v, keybias, out, lse, g, block_q, block_k,
                    interpret, causal):
    """(B, T, H, D) backward wrapper: pad like the forward, build Δ =
    rowsum(dO ⊙ O) lane-replicated, run the kernels, unpad/unfold."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    off = tk - tq
    qp, kp, vp, bias_bh, to_bhtd = _pad_bhtd(q, k, v, keybias, block_q,
                                             block_k)
    tqp = qp.shape[1]
    gp, outp = g, out
    if tqp != tq:
        pad = ((0, 0), (0, tqp - tq), (0, 0), (0, 0))
        gp = jnp.pad(g, pad)
        outp = jnp.pad(out, pad)
    do = to_bhtd(gp)
    # Δ_i = Σ_d dO ⊙ O per row; padded rows (dO = 0) contribute 0
    delta = jnp.sum(do.astype(jnp.float32) * to_bhtd(outp).astype(jnp.float32),
                    axis=-1)                      # (BH, Tqp)
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, STATS_LANES))
    dq, dk, dv, dbias = _flash_bwd_bhtd(
        qp, kp, vp, bias_bh, do, lse, delta,
        block_q=block_q, block_k=block_k, interpret=interpret, causal=causal,
        off=off,
    )

    def unfold(x, t):
        return x.reshape(b, h, -1, d).swapaxes(1, 2)[:, :t]

    dbias = dbias.reshape(b, h, -1).sum(1)[:, :tk].astype(keybias.dtype)
    return (unfold(dq, tq).astype(q.dtype), unfold(dk, tk).astype(k.dtype),
            unfold(dv, tk).astype(v.dtype), dbias)


def _bwd_impl() -> str:
    return os.environ.get("VILMEDIC_FLASH_BWD", "pallas").lower()


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_diff(q, k, v, keybias, block_q, block_k, interpret, causal):
    return _flash_forward(q, k, v, keybias, block_q, block_k, interpret, causal)


def _flash_diff_fwd(q, k, v, keybias, block_q, block_k, interpret, causal):
    if _bwd_impl() == "xla":
        out = _flash_forward(q, k, v, keybias, block_q, block_k, interpret,
                             causal)
        return out, (q, k, v, keybias)
    out, lse = _flash_forward(q, k, v, keybias, block_q, block_k, interpret,
                              causal, with_lse=True)
    return out, (q, k, v, keybias, out, lse)


def _flash_diff_bwd(block_q, block_k, interpret, causal, res, g):
    if len(res) == 4:  # VILMEDIC_FLASH_BWD=xla fallback (round-3 behavior)
        q, k, v, keybias = res
        _, vjp = jax.vjp(
            lambda q_, k_, v_, b_: _reference_attention(q_, k_, v_, b_, causal),
            q, k, v, keybias,
        )
        return vjp(g)
    q, k, v, keybias, out, lse = res
    return _flash_backward(q, k, v, keybias, out, lse, g, block_q, block_k,
                           interpret, causal)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def flash_attention(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, H, D)
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,  # (B, Tk) 1=keep
    block_q: int = 512,  # tuned on v5e: 512/512 is 1.6x faster than XLA @ T=2048
    block_k: int = 512,
    interpret: Optional[bool] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Tiled attention with (B, T, H, D) layout; key-padding mask, optional
    causal masking (query r sees key c iff c <= r + Tk - Tq). Differentiable —
    the backward is a pair of fused Pallas kernels (FlashAttention-2
    recurrence); ``VILMEDIC_FLASH_BWD=xla`` restores the dense-recompute VJP."""
    b, tk = k.shape[0], k.shape[1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    keybias = jnp.zeros((b, tk), jnp.float32) if key_mask is None else jnp.where(
        key_mask > 0, 0.0, NEG_INF
    ).astype(jnp.float32)
    tq, h, d = q.shape[1], q.shape[2], q.shape[3]
    hd = h * d
    # v2 (transpose-free, head-packed): (B, T, H, D) -> (B, T, HD) is a pure
    # bitcast, so the v1 path's (B, H, T, D) relayouts disappear and every
    # MXU contraction runs at the full 128-lane depth. VILMEDIC_FLASH_IMPL=v1
    # restores the per-(b,h)-slab kernels for A/B.
    if (hd % LANE == 0 and LANE % d == 0
            and os.environ.get("VILMEDIC_FLASH_IMPL", "v2") != "v1"):
        out = _flash_v2_diff(
            q.reshape(b, tq, hd), k.reshape(b, tk, hd), v.reshape(b, tk, hd),
            keybias, d, block_q, block_k, bool(interpret), bool(causal),
        )
        return out.reshape(b, tq, h, d)
    return _flash_diff(q, k, v, keybias, block_q, block_k, bool(interpret),
                       bool(causal))
