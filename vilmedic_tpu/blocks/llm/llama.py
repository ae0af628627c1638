"""LLaMA-family causal LM in Flax — the TPU serving path for LLM judges.

The reference's GREEN scorer drives a 7B LLaMA-2 judge through host-torch
``AutoModelForCausalLM`` (reference NLG/green/green.py:24-29, checkpoint
``StanfordAIMI/GREEN-radllama2-7b``); on a TPU host that makes the judge the
eval bottleneck (docs/metrics.md). This module is a TPU-native equivalent:
RMSNorm / rotary / GQA / SwiGLU decoder with a left-padded KV-cache greedy
decode, jitted end-to-end, with optional tensor-parallel param shardings over
a ``('model',)`` mesh so a 7B judge fits a v5e slice (bf16 params are ~14 GB
— one v5e chip holds the weights but not weights + cache; 4-8 chips serve it
comfortably).

Numerics follow HF ``LlamaForCausalLM`` exactly (modeling_llama: rotate_half
rotary with concatenated cos/sin, pre-norm residuals, f32 softmax):
``tests/test_llama_judge.py`` asserts logit parity and greedy-sequence parity
against random-init torch models, including GQA and left-padding.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def llama_config_from_hf(hf: Dict, dtype=jnp.bfloat16) -> LlamaConfig:
    """Build a :class:`LlamaConfig` from an HF ``config.json`` dict."""
    return LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get(
            "num_key_value_heads", hf["num_attention_heads"]
        ),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        dtype=dtype,
    )


class RMSNorm(nn.Module):
    eps: float
    dtype: Any

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       jnp.float32)
        xf = x.astype(jnp.float32)
        y = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (y * w).astype(self.dtype)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _rope_cos_sin(positions, head_dim: int, theta: float):
    """HF llama rotary tables: inv_freq over the first half, duplicated.

    positions: (B, T) int32 -> cos/sin (B, T, head_dim) f32.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (B, T, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x, cos, sin):
    # x (B, T, H, Dh); cos/sin (B, T, Dh) -> broadcast over heads
    xf = x.astype(jnp.float32)
    out = xf * cos[:, :, None, :] + _rotate_half(xf) * sin[:, :, None, :]
    return out.astype(x.dtype)


class LlamaAttention(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, key_mask, cache=None, cache_index=None):
        """Self-attention with rotary embeddings and optional KV cache.

        x: (B, T, h); positions: (B, T) absolute positions (left-pad aware);
        key_mask: (B, S) 0/1 over the S key slots this call may attend to
        (S == T without cache, S == cache length with cache; causality within
        the current x block is enforced here). cache: optional (k, v) each
        (B, S, n_kv, Dh) — x's keys/values are written at ``cache_index``.
        Returns (out (B, T, h), new_cache).
        """
        cfg = self.cfg
        b, t, _ = x.shape
        nh, nkv, dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                       cfg.head_dim)
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=cfg.dtype, name=name
        )
        q = dense(nh * dh, "q_proj")(x).reshape(b, t, nh, dh)
        k = dense(nkv * dh, "k_proj")(x).reshape(b, t, nkv, dh)
        v = dense(nkv * dh, "v_proj")(x).reshape(b, t, nkv, dh)

        cos, sin = _rope_cos_sin(positions, dh, cfg.rope_theta)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

        if cache is not None:
            ck, cv = cache
            ck = lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                          (0, cache_index, 0, 0))
            cv = lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                          (0, cache_index, 0, 0))
            cache = (ck, cv)
            k, v = ck, cv  # (B, S, nkv, Dh)
        s = k.shape[1]

        if nkv != nh:  # GQA: every kv head serves nh // nkv query heads
            rep = nh // nkv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        scores = jnp.einsum(
            "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
        ) * (dh ** -0.5)
        # key padding mask + causality by SLOT index (HF builds its causal
        # mask over sequence indices; rope positions only rotate q/k). Slot
        # order equals temporal order under left padding, so comparing the
        # key's slot against the query's slot is exact for prefill blocks
        # and for single-token decode steps alike.
        key_slots = jnp.arange(s)
        q_slots = (jnp.arange(t) if cache is None
                   else cache_index + jnp.arange(t))
        visible = (key_mask[:, None, None, :] > 0) & (
            key_slots[None, None, None, :] <= q_slots[None, None, :, None]
        )
        scores = jnp.where(visible, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v)
        out = dense(cfg.hidden_size, "o_proj")(out.reshape(b, t, nh * dh))
        return out, cache


class LlamaMLP(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        gate = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=cfg.dtype,
                        name="gate_proj")(x)
        up = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=cfg.dtype,
                      name="up_proj")(x)
        return nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype,
                        name="down_proj")(nn.silu(gate) * up)


class LlamaLayer(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, key_mask, cache=None, cache_index=None):
        cfg = self.cfg
        h, cache = LlamaAttention(cfg, name="self_attn")(
            RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="input_layernorm")(x),
            positions, key_mask, cache, cache_index,
        )
        x = x + h
        x = x + LlamaMLP(cfg, name="mlp")(
            RMSNorm(cfg.rms_norm_eps, cfg.dtype,
                    name="post_attention_layernorm")(x)
        )
        return x, cache


class LlamaForCausalLM(nn.Module):
    """HF ``LlamaForCausalLM``-equivalent decoder.

    ``__call__`` runs the full sequence (parity/testing); ``forward_cached``
    is the serving entry: one call covers both prefill (T == prompt length,
    ``cache_index = 0``) and single-token decode (T == 1).
    """

    cfg: LlamaConfig

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                     dtype=cfg.dtype)
        self.layers = [LlamaLayer(cfg, name=f"layers_{i}")
                       for i in range(cfg.num_hidden_layers)]
        self.norm = RMSNorm(cfg.rms_norm_eps, cfg.dtype)
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                    dtype=cfg.dtype)

    def _head(self, x):
        if self.cfg.tie_word_embeddings:
            return self.embed_tokens.attend(x)
        return self.lm_head(x)

    def __call__(self, input_ids, attention_mask):
        """Full-sequence logits (B, T, V). Left- or right-padding per
        ``attention_mask``; positions are cumsum(mask)-1 like HF."""
        positions = jnp.clip(
            jnp.cumsum(attention_mask, axis=-1) - 1, 0, None
        ).astype(jnp.int32)
        x = self.embed_tokens(input_ids)
        for layer in self.layers:
            x, _ = layer(x, positions, attention_mask)
        return self._head(self.norm(x)).astype(jnp.float32)

    def init_cache(self, batch: int, length: int):
        cfg = self.cfg
        shape = (batch, length, cfg.num_key_value_heads, cfg.head_dim)
        return [(jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))
                for _ in range(cfg.num_hidden_layers)]

    def forward_cached(self, input_ids, positions, key_mask, cache,
                       cache_index):
        """Prefill or decode through the KV cache.

        input_ids (B, T) are written at cache slots
        ``[cache_index, cache_index + T)``; key_mask (B, S) marks every cache
        slot valid *after* this write (S == cache length). Returns
        (logits (B, T, V) f32, new_cache).
        """
        x = self.embed_tokens(input_ids)
        new_cache = []
        for layer, layer_cache in zip(self.layers, cache):
            x, c = layer(x, positions, key_mask, layer_cache, cache_index)
            new_cache.append(c)
        return self._head(self.norm(x)).astype(jnp.float32), new_cache


def greedy_generate(model: LlamaForCausalLM, params, input_ids,
                    attention_mask, max_new_tokens: int, eos_id: int,
                    pad_id: int):
    """Jittable batched greedy decode with LEFT-padded prompts.

    input_ids/attention_mask: (B, P) left-padded (pads first, like the
    reference judge's ``padding_side="left"`` tokenizer — green.py:37) so
    every row's last prompt token sits at column P-1 and decode steps write
    contiguous cache slots P, P+1, ... Returns (B, max_new_tokens) int32,
    ``pad_id`` after each row's EOS (emitted EOS kept, HF-style). Exits the
    loop early once every row has finished.
    """
    b, p = input_ids.shape
    total = p + max_new_tokens
    cache = model.init_cache(b, total)

    positions = jnp.clip(
        jnp.cumsum(attention_mask, axis=-1) - 1, 0, None
    ).astype(jnp.int32)
    key_mask0 = jnp.pad(attention_mask, ((0, 0), (0, max_new_tokens)))
    logits, cache = model.apply(
        params, input_ids, positions, key_mask0, cache, 0,
        method=LlamaForCausalLM.forward_cached,
    )
    next_tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    prompt_len = positions[:, -1] + 1  # (B,) real lengths

    out0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    out0 = out0.at[:, 0].set(next_tok)
    done0 = next_tok == eos_id

    def cond(state):
        t, _, _, _, done = state
        return (t < max_new_tokens) & ~jnp.all(done)

    def body(state):
        t, tok, cache, out, done = state
        slot = p + t - 1  # cache slot of token emitted at step t-1
        key_mask = key_mask0.at[:, p:].set(
            (jnp.arange(max_new_tokens)[None, :] <= t - 1).astype(
                key_mask0.dtype
            )
        )
        logits, cache = model.apply(
            params, tok[:, None], (prompt_len + t - 1)[:, None], key_mask,
            cache, slot, method=LlamaForCausalLM.forward_cached,
        )
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad_id, nxt)
        out = out.at[:, t].set(nxt)
        done = done | (nxt == eos_id)
        return t + 1, nxt, cache, out, done

    _, _, _, out, _ = lax.while_loop(
        cond, body, (jnp.asarray(1), next_tok, cache, out0, done0)
    )
    return out


def llama_param_shardings(params, mesh, axis: str = "model"):
    """NamedShardings that tensor-parallel a LLaMA param tree over ``axis``.

    Megatron layout: q/k/v and gate/up shard the output features, o and down
    shard the input features, embedding + lm_head shard the vocab dim;
    norms replicate. Any dim not divisible by the axis size falls back to
    replication (e.g. odd test vocabs; real LLaMA vocab 32000 shards fine).
    Use with ``jax.device_put`` (or as pjit in_shardings) — XLA inserts the
    all-reduces.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]

    def spec(path, x):
        names = [getattr(k, "key", str(k)) for k in path]
        joined = "/".join(names)

        def along(dim):
            if x.shape[dim] % n != 0:
                return P()
            return P(*(axis if d == dim else None for d in range(x.ndim)))

        if x.ndim == 2:
            if any(s in joined for s in ("q_proj", "k_proj", "v_proj",
                                         "gate_proj", "up_proj")):
                return along(1)
            if any(s in joined for s in ("o_proj", "down_proj")):
                return along(0)
            if "embed_tokens" in joined or "lm_head" in joined:
                # vocab dim: axis 0 for embedding tables, 1 for the head kernel
                return along(0) if "embedding" in joined else along(1)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, spec(path, x)), params
    )
