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

Differentiation: the kernel is forward-only, so ``flash_attention`` carries a
``jax.custom_vjp`` whose backward pass recomputes the mathematically identical
XLA attention and differentiates that — long-sequence TRAIN forwards keep the
flash forward while grads flow through the standard path (which is exactly
what the non-flash route would have used).

Static shapes only (this toolchain's Mosaic rejects dynamic ref offsets); the
key padding mask is passed as an additive bias row. ``flash_attention`` matches
``ops.attention.dot_product_attention`` to f32 tolerance and is exposed through
the same (B, T, H, D) layout.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int, scale: float,
            block_q: int, causal: bool, off: int):
    from jax.experimental import pallas as pl

    q = q_ref[0].astype(jnp.float32) * scale  # (bq, d)
    tk = k_ref.shape[1]
    num_kv = tk // block_k
    iq = pl.program_id(1)

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        b = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        s = s + b[None, :]
        if causal:
            # query row r attends key col c iff c <= r + off (off = Tk - Tq
            # of the UNPADDED lengths; padded cols carry NEG_INF in the bias)
            bq = q.shape[0]
            rows = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            cols = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            s = jnp.where(cols <= rows + off, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    d = q_ref.shape[-1]
    bq = q.shape[0]
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    if causal:
        # skip K/V blocks whose every column is above the diagonal for every
        # row of this q block: last visible col = (iq+1)*block_q - 1 + off
        hi = jnp.minimum(
            num_kv, (((iq + 1) * block_q + off) + block_k - 1) // block_k
        )
        hi = jnp.maximum(hi, 0)
    else:
        hi = num_kv
    acc, m, l = jax.lax.fori_loop(0, hi, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret", "causal", "off")
)
def _flash_bhtd(q, k, v, bias, block_q=128, block_k=128, interpret=False,
                causal=False, off=0):
    """q: (BH, Tq, D), k/v: (BH, Tk, D), bias: (BH, 1, Tk) additive."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, tq, d = q.shape
    tk = k.shape[1]
    block_q = min(block_q, tq)
    block_k = min(block_k, tk)
    assert tq % block_q == 0 and tk % block_k == 0
    scale = d ** -0.5

    grid = (bh, tq // block_q)
    return pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, scale=scale,
                          block_q=block_q, causal=causal, off=off),
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
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def _flash_forward(q, k, v, keybias, block_q, block_k, interpret, causal):
    """(B, T, H, D) wrapper: pad to block multiples, run the kernel."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    off = tk - tq

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

    bias_bh = jnp.repeat(bias, h, axis=0)[:, None, :]  # (BH, 1, Tk)
    out = _flash_bhtd(
        to_bhtd(q), to_bhtd(k), to_bhtd(v), bias_bh,
        block_q=block_q, block_k=block_k, interpret=interpret,
        causal=causal, off=off,
    )
    out = out.reshape(b, h, -1, d).swapaxes(1, 2)
    return out[:, :tq]


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_diff(q, k, v, keybias, block_q, block_k, interpret, causal):
    return _flash_forward(q, k, v, keybias, block_q, block_k, interpret, causal)


def _flash_diff_fwd(q, k, v, keybias, block_q, block_k, interpret, causal):
    out = _flash_forward(q, k, v, keybias, block_q, block_k, interpret, causal)
    return out, (q, k, v, keybias)


def _flash_diff_bwd(block_q, block_k, interpret, causal, res, g):
    q, k, v, keybias = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _reference_attention(q_, k_, v_, b_, causal),
        q, k, v, keybias,
    )
    return vjp(g)


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
    the backward pass is the recomputed XLA attention's VJP."""
    b, tk = k.shape[0], k.shape[1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    keybias = jnp.zeros((b, tk), jnp.float32) if key_mask is None else jnp.where(
        key_mask > 0, 0.0, NEG_INF
    ).astype(jnp.float32)
    return _flash_diff(q, k, v, keybias, block_q, block_k, bool(interpret),
                       bool(causal))
