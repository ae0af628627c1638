"""Attention compute ops.

The framework's transformer blocks route all attention through this module so the
implementation can be swapped per-backend: a plain-XLA einsum path (which XLA fuses
onto the MXU well at these sequence lengths — reports are <= 128 tokens, vision
memories are O(10^2-10^3) patches, reference SURVEY.md §2.3), and a Pallas
flash-attention kernel for long multi-image token axes.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

NEG_INF = -1e9  # additive mask value; safe in f32 and bf16


def _softmax_f32(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    unnorm = jnp.exp(x - m)
    return unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)


# Route attention with both axes >= this length through the Pallas flash
# kernel (measured crossover on v5e vs XLA's fused dense path — see
# docs/performance.md auto-policy table). Overridable for A/B sweeps.
FLASH_MIN_LEN = int(os.environ.get("VILMEDIC_FLASH_MIN_LEN", 1024))
# Train steps (fwd+bwd) cross over earlier: the dense path's backward
# materializes several (B, H, Tq, Tk) score-sized tensors in HBM while the
# fused Pallas VJP streams them — measured on v5e: flash/dense 0.80 at T512
# causal, 0.78 at T512 non-causal, 0.42 at T1472 (the DINOv2 VL-prefill
# shape); dense still wins at T256/T197 (experiments/ab_flash_train_crossover).
FLASH_MIN_LEN_TRAIN = int(os.environ.get("VILMEDIC_FLASH_MIN_LEN_TRAIN", 512))


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
    causal: bool = False,
    train: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: (B, Tq, H, Dh), k/v: (B, Tk, H, Dh), bias broadcastable to (B, H, Tq, Tk).
    Scores and softmax are computed in f32 for stability regardless of compute dtype.

    ``causal=True`` applies the causal constraint (query r sees key c iff
    c <= r + Tk - Tq) IN ADDITION to ``bias`` — callers that want the flash
    route pass a key-padding-only bias plus this flag instead of baking the
    triangle into a dense (Tq, Tk) bias.

    Long sequences (the multi-image patch-concat axis; the prefix-LM image
    prefix) stream through the Pallas flash kernel instead of materializing
    the score matrix; the kernel carries a custom VJP whose backward is a
    pair of fused Pallas kernels, so this routing is train-safe and the
    score matrix stays out of HBM in both passes.

    ``train=True`` (a fwd+bwd step will run) lowers the flash crossover to
    ``FLASH_MIN_LEN_TRAIN``: the dense backward's HBM-resident score-sized
    intermediates make flash win from ~T512 where the forward alone would not.
    """
    key_bias_only = bias is None or (
        bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1
    )
    min_len = FLASH_MIN_LEN_TRAIN if train else FLASH_MIN_LEN
    if (
        q.shape[1] >= min_len
        and k.shape[1] >= min_len
        and key_bias_only
    ):
        from .flash_attention import flash_attention

        key_mask = None if bias is None else (bias[:, 0, 0, :] >= -0.5).astype(jnp.int32)
        return flash_attention(q, k, v, key_mask=key_mask, causal=causal).astype(dtype)

    depth = q.shape[-1]
    q = q * (depth ** -0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    if causal:
        tq, tk = scores.shape[-2], scores.shape[-1]
        row = jnp.arange(tq)[:, None]
        col = jnp.arange(tk)[None, :]
        scores = scores + jnp.where(col <= row + (tk - tq), 0.0, NEG_INF)[None, None]
    weights = _softmax_f32(scores).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def mask_to_bias(mask: jnp.ndarray) -> jnp.ndarray:
    """(…, Tq, Tk) boolean/0-1 mask -> additive bias (0 keep / NEG_INF drop)."""
    return jnp.where(mask > 0, 0.0, NEG_INF).astype(jnp.float32)


def make_attention_bias(
    key_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    query_len: Optional[int] = None,
    key_len: Optional[int] = None,
    decode_index: Optional[jnp.ndarray] = None,
) -> Optional[jnp.ndarray]:
    """Build a (B, 1, Tq, Tk) additive bias from a key padding mask and causality.

    During incremental decoding (Tq == 1) ``decode_index`` gives the absolute
    position of the query so the causal constraint becomes "attend to k <= index".
    """
    bias = None
    if key_mask is not None:
        bias = mask_to_bias(key_mask[:, None, None, :])
    if causal:
        if decode_index is not None:
            positions = jnp.arange(key_len)[None, None, None, :]
            causal_bias = jnp.where(positions <= decode_index, 0.0, NEG_INF)
        else:
            tq = query_len
            tk = key_len if key_len is not None else tq
            row = jnp.arange(tq)[:, None]
            col = jnp.arange(tk)[None, :]
            causal_bias = jnp.where(col <= row, 0.0, NEG_INF)[None, None, :, :]
        bias = causal_bias if bias is None else bias + causal_bias
    return bias
