"""Pallas flash attention (online-softmax, tiled) for long token axes.

The reference's long-sequence axis is multi-image patch concatenation — N images
x S patches fused into one cross-attention memory (reference RRG_HF.py:116-152,
visual_encoder multi-image path; SURVEY.md §5 "long-context"). At those lengths
XLA's materialized (Tq, Tk) attention becomes HBM-bound; this kernel streams K/V
blocks through VMEM with the online-softmax recurrence so the score matrix never
hits HBM.

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


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int, scale: float):
    from jax.experimental import pallas as pl

    q = q_ref[0].astype(jnp.float32) * scale  # (bq, d)
    tk = k_ref.shape[1]
    num_kv = tk // block_k

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        b = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        s = s + b[None, :]
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
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def _flash_bhtd(q, k, v, bias, block_q=128, block_k=128, interpret=False):
    """q: (BH, Tq, D), k/v: (BH, Tk, D), bias: (BH, Tk) additive."""
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
        functools.partial(_kernel, block_k=block_k, scale=scale),
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


def flash_attention(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, H, D)
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,  # (B, Tk) 1=keep
    block_q: int = 512,  # tuned on v5e: 512/512 is 1.6x faster than XLA @ T=2048
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Tiled attention with (B, T, H, D) layout; non-causal, key-padding mask."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def to_bhtd(x):
        return jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)

    # pad sequence dims up to block multiples
    pad_q = (-tq) % min(block_q, max(tq, 1))
    pad_k = (-tk) % min(block_k, max(tk, 1))
    bias = jnp.zeros((b, tk), jnp.float32) if key_mask is None else jnp.where(
        key_mask > 0, 0.0, NEG_INF
    ).astype(jnp.float32)
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
    )
    out = out.reshape(b, h, -1, d).swapaxes(1, 2)
    return out[:, :tq]
