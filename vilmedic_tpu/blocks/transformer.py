"""BERT-generation-style transformer encoder/decoder in Flax, TPU-first.

Functional replacement for the reference's HuggingFace blocks
(reference vilmedic/blocks/huggingface/encoder/encoder_model.py:10-66 and
decoder/decoder_model.py:8-53): a post-LayerNorm transformer with learned absolute
positions, GELU FFN, and — for the decoder — causal self-attention plus
cross-attention over an encoder memory, with the HF ``labels=input_ids`` shifted
LM loss semantics.

TPU-first design points:
- parameters live in f32, compute dtype is configurable (bf16 on TPU; no loss
  scaling needed, replacing the reference's AMP GradScaler, trainor.py:96);
- incremental decoding uses an **explicit cache pytree** passed in/out of
  ``apply`` (mode='decode'), so the beam-search ``lax.scan`` can gather/reorder
  cache entries per beam with a plain ``tree_map`` — the functional equivalent of
  the reference's per-model ``_reorder_cache`` (beam_search.py:312-319);
- all shapes static: self-attention caches are pre-allocated at ``max_len``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import NEG_INF, dot_product_attention, make_attention_bias

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    bos_token_id: Optional[int] = None
    eos_token_id: Optional[int] = None
    hidden_act: str = "gelu"
    initializer_range: float = 0.02
    add_cross_attention: bool = False
    # remat each layer (HF config key). True = full remat (max memory saving,
    # recomputes the matmuls); "dots" = policy remat (saves matmul outputs,
    # recomputes only the elementwise chain — the throughput-safe variant,
    # measured in experiments/ab_vit_mfu.py / docs/performance.md)
    gradient_checkpointing: Any = False
    # BERT/RoBERTa prediction heads run dense+act+LayerNorm before the vocab
    # projection (HF BertLMPredictionHead / RobertaLMHead); BertGeneration's
    # head is a bare Linear. Needed for pretrained-weight parity.
    lm_head_transform: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_dict(cls, d: Dict, **overrides) -> "TransformerConfig":
        """Build from a (HF-style) config dict, ignoring unknown keys — the config
        surface accepts full HF decoder blocks (reference config/RRG/baseline-mimic.yml)."""
        from ..config.config import Config

        if isinstance(d, Config):
            d = d.to_dict()
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in {**d, **overrides}.items() if k in known}
        if "lm_head_transform" not in kwargs and d.get("model_type") in (
            "bert", "roberta", "camembert", "xlm-roberta",
        ):
            kwargs["lm_head_transform"] = True
        if kwargs.get("dtype") in ("bfloat16", "bf16"):
            kwargs["dtype"] = jnp.bfloat16
        elif kwargs.get("dtype") in ("float32", "fp32"):
            kwargs["dtype"] = jnp.float32
        return cls(**kwargs)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def make_blocked_head_weights(dec_params, dtype, block: int = 128):
    """Pad the LM head to a multiple of ``block`` output columns, ONCE.

    Returns ``(kernel (H, nb*block) dtype, bias (nb*block,) dtype)`` with padded
    kernel columns at 0 and padded bias lanes at -1e30, for
    ``TransformerDecoder._head_blocked``. Build this outside the decode loop
    and close over it so it enters ``lax.while_loop`` as an invariant.

    Measured NEGATIVE (v5e, beam 8, batch 64, vocab 50k — ROUND3_NOTES): on
    the fused stats-kernel route do NOT pre-pad here to the kernel's 1024
    vocab tile. The stats kernel's own in-loop pad of the weight matrix
    profiles at ~100 us/step, yet removing it by pre-padding LOST 7% e2e
    (395 vs 424 rep/s) — the freshly padded per-step copy materializes in the
    pallas operand's layout, while the loop-invariant pre-padded buffer gets
    relayouted at the custom-call boundary every step instead.
    """
    kernel = dec_params["lm_head"]["kernel"]
    bias = dec_params["lm_head"]["bias"]
    v = kernel.shape[1]
    nb = -(-v // block)
    pad = nb * block - v
    kb = jnp.pad(kernel, ((0, 0), (0, pad))).astype(dtype)
    # Bias mirrors the unblocked path's effective numerics: flax Dense rounds
    # the bias to the compute dtype, then XLA folds `_head`'s astype(f32) into
    # the dot (removing the bf16 output rounding) and converts the bias back
    # up — so: round-trip through `dtype`, add in f32.
    bb = jnp.pad(bias, (0, pad), constant_values=-1.0e30).astype(dtype).astype(
        jnp.float32
    )
    return kb, bb


def to_kernel_cache(self_cache, scales=None):
    """Convert a (tiled) self cache to the fused-kernel layout.

    Renames per-layer ``self_k``/``self_v`` (N, T, H, D) leaves to
    ``self_k_tnf``/``self_v_tnf`` in (T, N, H*D): the layout the Pallas
    reorder-free beam kernel wants (per-(group, head-pair) slab DMAs with a
    128-multiple lane dim, and a t-write on the untiled leading dim). The
    self cache is zeros at this point, so the transpose constant-folds — no
    data movement.

    ``scales`` (per-layer (2, H*D) f32 arrays — see
    ``models.vision_language.derive_gen_kv_scales``) switches the cache
    leaves to int8 and attaches the scales as a ``self_kv_sc`` leaf: the
    fused kernel then quantizes each step's K/V write and dequantizes reads
    via the folded per-lane scales, halving the generated-segment HBM
    traffic per decode step. Must be applied AFTER ``tile_for_beams`` (the
    scale leaf has no batch axis).
    """
    out = []
    for i, layer in enumerate(self_cache):
        k = layer["self_k"]
        n, t, h, d = k.shape
        k_tnf = jnp.transpose(k, (1, 0, 2, 3)).reshape(t, n, h * d)
        v_tnf = jnp.transpose(layer["self_v"], (1, 0, 2, 3)).reshape(
            t, n, h * d)
        entry = {"self_k_tnf": k_tnf, "self_v_tnf": v_tnf}
        if scales is not None:
            # the cache is zeros here, so the int8 cast constant-folds
            entry["self_k_tnf"] = k_tnf.astype(jnp.int8)
            entry["self_v_tnf"] = v_tnf.astype(jnp.int8)
            entry["self_kv_sc"] = scales[i].astype(jnp.float32)
        out.append(entry)
    return tuple(out)


def quantize_kv(x):
    """Symmetric int8 quantization of a (B, S, H, D) K/V tensor with
    per-(token, head) scales: returns ``(q int8, scale f32 (B, S, H))`` with
    ``q * scale[..., None] ~= x`` (<= scale/2 absolute rounding error per
    element). Used for the beam-shared prefix segment, whose full re-read
    every decode step is the bandwidth floor at DINOv2 prefix lengths."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _remat_policy(gradient_checkpointing):
    """jax.checkpoint policy for a truthy gradient_checkpointing value:
    "dots" saves matmul outputs and recomputes only the elementwise chain
    (LN/GELU/softmax/dropout masks); True (or anything else truthy) is the
    HF-style full remat — everything recomputed, maximum memory saving."""
    if gradient_checkpointing == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    return None


def _dense(cfg: TransformerConfig, features: int, name: str) -> nn.Dense:
    return nn.Dense(
        features,
        dtype=cfg.dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.normal(cfg.initializer_range),
        name=name,
    )


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention with optional pre-allocated decode cache.

    NOTE: attention-probability dropout (reference BERT blocks) is folded away —
    only the residual-path hidden dropout is applied; this changes training noise
    slightly but never eval behavior.
    """

    config: TransformerConfig
    cross: bool = False

    def setup(self):
        cfg = self.config
        self.q_proj = _dense(cfg, cfg.hidden_size, "q")
        self.k_proj = _dense(cfg, cfg.hidden_size, "k")
        self.v_proj = _dense(cfg, cfg.hidden_size, "v")
        self.o_proj = _dense(cfg, cfg.hidden_size, "o")

    def _split(self, x):
        b, t, _ = x.shape
        cfg = self.config
        return x.reshape(b, t, cfg.num_attention_heads, cfg.head_dim)

    def _merge(self, x):
        b, t, _, _ = x.shape
        return x.reshape(b, t, self.config.hidden_size)

    def kv(self, kv_input: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project an encoder memory to (K, V) once — the cross-attention cache."""
        return self._split(self.k_proj(kv_input)), self._split(self.v_proj(kv_input))

    def __call__(
        self,
        x: jnp.ndarray,
        kv_input: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
        cache: Optional[Dict[str, jnp.ndarray]] = None,
        decode_index: Optional[jnp.ndarray] = None,
        ancestry: Optional[jnp.ndarray] = None,
        causal: bool = False,
        train: bool = False,
    ):
        q = self._split(self.q_proj(x))
        new_cache = None
        if self.cross:
            if cache is not None:
                k, v = cache["k"], cache["v"]
            else:
                k, v = self.kv(kv_input)
            if cache is not None and k.shape[0] != q.shape[0]:
                # Beam-shared cross cache: the K/V (and bias) stay at batch
                # size B while queries arrive beam-tiled (N = B*k rows,
                # beam-major within item, single token). All beams of an item
                # attend to the SAME memory, so fold the beam axis into the
                # query-time axis instead of tiling the cache — tiling it made
                # XLA sink the repeat INTO the decode loop and rematerialize +
                # read a (N, S, H, D) cross K/V every step (~150 us/step at
                # bench shapes on v5e; profile in ROUND3_NOTES).
                b = k.shape[0]
                fold = q.shape[0] // b
                assert q.shape[0] == b * fold and q.shape[1] == 1, (
                    q.shape, k.shape
                )
                q2 = q.reshape(b, fold, *q.shape[2:])
                out = dot_product_attention(
                    q2, k, v, bias=bias, dtype=self.config.dtype
                )
                out = out.reshape(q.shape[0], 1, self.config.hidden_size)
                return self.o_proj(out), None
        else:
            k_new = self._split(self.k_proj(x))
            v_new = self._split(self.v_proj(x))
            if cache is not None and "k_tnf" in cache:
                # fused Pallas path: reorder-free attention + in-place cache
                # write in ONE kernel over the (T, N, H*D) caches. ``ancestry``
                # arrives as the kernel's dense flat (groups, rows, T*rows)
                # 0/1 mask — carried in that form by beam_search
                # (ancestry_group_items), so there is NO per-step mask
                # construction at the XLA level.
                assert ancestry is not None and ancestry.ndim == 3
                assert decode_index is not None
                from ..ops.beam_cache_attention import (
                    fused_beam_cache_attention,
                )

                cfg = self.config
                n = k_new.shape[0]
                out, kc2, vc2 = fused_beam_cache_attention(
                    cache["k_tnf"], cache["v_tnf"],
                    q.reshape(n, cfg.num_attention_heads, cfg.head_dim),
                    k_new.reshape(n, cfg.num_attention_heads, cfg.head_dim),
                    v_new.reshape(n, cfg.num_attention_heads, cfg.head_dim),
                    ancestry,
                    decode_index,
                    interpret=jax.default_backend() == "cpu",
                    kv_scales=cache.get("kv_sc"),
                )
                new_cache = {"k_tnf": kc2, "v_tnf": vc2}
                if "kv_sc" in cache:
                    new_cache["kv_sc"] = cache["kv_sc"]
                out = out.astype(cfg.dtype).reshape(n, 1, cfg.hidden_size)
                return self.o_proj(out), new_cache
            if cache is not None:
                # Incremental decode: write this step's K/V at decode_index.
                # (A (B, H, T, D) cache layout with matching einsums was tried
                # to kill the while-carry relayout copies: no speedup on v5e
                # and the reordered contraction perturbs near-tie beam choices
                # by 1 ulp — keep (B, T, H, D).)
                idx = decode_index.astype(jnp.int32)
                k = jax.lax.dynamic_update_slice(
                    cache["k"], k_new.astype(cache["k"].dtype), (0, idx, 0, 0)
                )
                v = jax.lax.dynamic_update_slice(
                    cache["v"], v_new.astype(cache["v"].dtype), (0, idx, 0, 0)
                )
                new_cache = {"k": k, "v": v}
                if ancestry is not None:
                    # read the PRE-update cache: the DUS result's only consumer
                    # is then the loop carry — the canonical in-place-update
                    # pattern (reading the DUS output here made XLA round-trip
                    # the whole 39 MB cache through alternate memory every
                    # step: ~160 us/leaf/step on v5e)
                    out = self._ancestry_attention(
                        q, cache["k"], cache["v"], k_new, v_new, ancestry
                    )
                    return self.o_proj(self._merge(out)), new_cache
            else:
                k, v = k_new, v_new
        out = dot_product_attention(
            q, k, v, bias=bias, dtype=self.config.dtype, causal=causal,
            train=train,
        )
        return self.o_proj(self._merge(out)), new_cache

    def prefix_decode(self, x, prefix_kv, cache, decode_index, ancestry=None):
        """Single-token decode over a beam-SHARED prefix plus the per-beam
        generated cache, in one joint softmax.

        The prefix-LM's image prefix K/V is identical across the beams of an
        item, so it never enters the beam-gathered cache: ``prefix_kv`` is
        ``(pk, pv)`` at batch size B (closed over as a decode-loop invariant)
        while ``x``/``cache`` carry N = B*fold beam-major rows (fold = beams,
        or any whole-batch tiling). Scores over the prefix fold the beam axis
        into the query axis (the beam-shared cross-attention trick); scores
        over the generated slots stay per-row; ONE softmax over the
        concatenated (P + T) keys reproduces exactly the softmax the
        old concatenated cache computed (prefix slots first). Returns
        ``(out (N, 1, hidden), new_cache)``.

        With a kernel-layout cache (``k_tnf``/``v_tnf`` in (T, N, H*D)) and a
        dense ``ancestry`` mask, the generated segment runs through the fused
        reorder-free Pallas kernel (in-place cache write, never permuted on
        beam reorder) with ``return_stats=True``, and its normalized output
        merges with the prefix segment via the online-softmax combine —
        exactness of the merge is oracle-tested in
        tests/test_fused_beam_kernel.py.
        """
        cfg = self.config
        q = self._split(self.q_proj(x))  # (N, 1, H, D)
        k_new = self._split(self.k_proj(x))
        v_new = self._split(self.v_proj(x))
        idx = decode_index.astype(jnp.int32)
        heads, d = cfg.num_attention_heads, cfg.head_dim

        from ..ops.beam_cache_attention import (
            KernelPrefix, fused_beam_cache_attention,
        )

        if isinstance(prefix_kv, KernelPrefix):
            # packed prefix (P_pad, B, H*D): streamed through the fused
            # kernel's own online softmax — prefix + generated cache +
            # current step in ONE joint pass, no XLA-side prefix einsum,
            # no merge, one custom call per layer per step
            assert ancestry is not None and ancestry.ndim == 3
            n = q.shape[0]
            out, kc2, vc2 = fused_beam_cache_attention(
                cache["k_tnf"], cache["v_tnf"],
                q.reshape(n, heads, d),
                k_new.reshape(n, heads, d),
                v_new.reshape(n, heads, d),
                ancestry, idx,
                interpret=jax.default_backend() == "cpu",
                prefix=(prefix_kv.pk, prefix_kv.pv, prefix_kv.p_real,
                        prefix_kv.beams),
            )
            new_cache = {"k_tnf": kc2, "v_tnf": vc2}
            out = out.astype(cfg.dtype).reshape(n, 1, cfg.hidden_size)
            return self.o_proj(out), new_cache

        # prefix segment operands: either (pk, pv) bf16 or the int8-quantized
        # (pk_q, k_scale, pv_q, v_scale) from prefill(quantize_prefix=True) —
        # the per-(token, head) scales factor out of both einsums, so the
        # decode loop streams int8 from HBM (half the per-step prefix read)
        if len(prefix_kv) == 4:
            pk, k_scale, pv, v_scale = prefix_kv
        else:
            pk, pv = prefix_kv
            k_scale = v_scale = None

        # Prefix matmuls follow the STORED prefix dtype: bf16 (and int8,
        # whose [-127, 127] values are exact in bf16's 8 mantissa bits) ride
        # the MXU's native bf16 path with f32 accumulation — an f32 matmul
        # is ~6x slower on TPU and cost ~0.5 ms/step at the DINOv2 518px
        # shape before r5. f32-stored prefixes (f32-dtype configs, tests)
        # keep exact f32 matmuls so decode == full-forward bit-for-bit.
        mm_dtype = (
            jnp.float32 if pk.dtype == jnp.float32 else jnp.bfloat16
        )

        def _p_scores(qf):
            # (B, H, fold, P) f32-accumulated prefix scores
            sp = jnp.einsum(
                "bqhd,bphd->bhqp", qf.astype(mm_dtype), pk.astype(mm_dtype),
                preferred_element_type=jnp.float32,
            )
            if k_scale is not None:
                sp = sp * k_scale.transpose(0, 2, 1)[:, :, None, :]
            return sp

        def _p_values(weights, out_dtype):
            # (B, fold, H, D) from (B, H, fold, P) weights — same-dtype MXU
            # matmul with f32 accumulation (same argument as _p_scores)
            if v_scale is not None:
                weights = weights * v_scale.transpose(0, 2, 1)[:, :, None, :]
            return jnp.einsum(
                "bhqp,bphd->bqhd", weights.astype(mm_dtype),
                pv.astype(mm_dtype),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)

        if cache is not None and "k_tnf" in cache:
            assert ancestry is not None and ancestry.ndim == 3
            n = q.shape[0]
            from ..ops.beam_cache_attention import fused_beam_cache_attention

            out_g, kc2, vc2, m_g, l_g = fused_beam_cache_attention(
                cache["k_tnf"], cache["v_tnf"],
                q.reshape(n, heads, d),
                k_new.reshape(n, heads, d),
                v_new.reshape(n, heads, d),
                ancestry, idx,
                interpret=jax.default_backend() == "cpu",
                return_stats=True,
                kv_scales=cache.get("kv_sc"),
            )
            new_cache = {"k_tnf": kc2, "v_tnf": vc2}
            if "kv_sc" in cache:
                new_cache["kv_sc"] = cache["kv_sc"]

            b, p = pk.shape[:2]
            fold = n // b
            qf = (q[:, 0].astype(jnp.float32) * (d ** -0.5)).reshape(
                b, fold, heads, d
            )
            sp = _p_scores(qf)
            mp = sp.max(-1)  # (B, H, fold)
            ep = jnp.exp(sp - mp[..., None])
            lp = ep.sum(-1)
            accp = _p_values(ep, jnp.float32)
            mp = mp.transpose(0, 2, 1).reshape(n, heads)
            lp = lp.transpose(0, 2, 1).reshape(n, heads)
            accp = accp.reshape(n, heads, d)

            big = jnp.maximum(m_g, mp)
            cg = jnp.exp(m_g - big) * l_g
            cp = jnp.exp(mp - big)
            out = (cg[..., None] * out_g + cp[..., None] * accp) / (
                cg + cp * lp
            )[..., None]
            out = out.astype(cfg.dtype).reshape(n, 1, cfg.hidden_size)
            return self.o_proj(out), new_cache
        ck = jax.lax.dynamic_update_slice(
            cache["k"], k_new.astype(cache["k"].dtype), (0, idx, 0, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cache["v"], v_new.astype(cache["v"].dtype), (0, idx, 0, 0)
        )
        new_cache = {"k": ck, "v": cv}

        b, p = pk.shape[:2]
        n, _, heads, d = q.shape
        fold = n // b
        assert b * fold == n, (b, n)
        t = ck.shape[1]
        qs = (q[:, 0] * (d ** -0.5)).astype(jnp.float32)

        qf = qs.reshape(b, fold, heads, d)
        sp = _p_scores(qf)
        sg = jnp.einsum("nhd,nthd->nht", qs, ck.astype(jnp.float32))
        # causal by slot: generated slots beyond the current index are unwritten
        sg = jnp.where(jnp.arange(t)[None, None, :] <= idx, sg, NEG_INF)
        sg = sg.reshape(b, fold, heads, t).transpose(0, 2, 1, 3)  # (B,H,fold,T)

        s = jnp.concatenate([sp, sg], axis=-1)  # (B, H, fold, P+T)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        wp = w[..., :p]
        wg = w[..., p:].astype(cfg.dtype)

        out = _p_values(wp, cfg.dtype)
        out = out + jnp.einsum(
            "nht,nthd->nhd", wg.transpose(0, 2, 1, 3).reshape(n, heads, t), cv
        ).reshape(b, fold, heads, d)
        out = out.reshape(n, 1, cfg.hidden_size)
        return self.o_proj(out), new_cache

    def _ancestry_attention(self, q, k_old, v_old, k_new, v_new, ancestry):
        """Reorder-free beam decode self-attention.

        ``ancestry`` is a (B, kj, kq, T) one-hot: the beam now living in slot
        ``kq`` of batch item ``B`` took timestep ``t``'s K/V from slot ``kj``
        (all-zero over kj at t >= decode_index — which also subsumes the
        causal mask). Instead of physically permuting the (N, T, H, D) caches
        every step (~330 us/step of pure HBM traffic + relayout copies at
        beam 8, vocab-50k bench shapes on v5e), scores are computed against
        ALL slots of the PRE-update cache in a slot-batched standard-attention
        shape, non-ancestor (slot, t) lanes are masked to NEG_INF, and the
        current step's self K/V (always the slot's own ``k_new``/``v_new``)
        joins the softmax as one extra analytic lane — so the joint softmax
        equals the permuted path's softmax over t exactly (masked lanes
        underflow to exp -> 0, selected lanes get +0.0; value-preserving).
        Functional analog of HF ``_reorder_cache`` with the reorder folded
        into the attention reads. TPU note: the (slot, t) contraction
        accumulates nonzero terms in a different tile order than the permuted
        path, so bf16 runs can differ by 1 ulp on near-ties (f32 is
        bit-exact — asserted in tests/test_decoding.py).
        """
        cfg = self.config
        n, t, nh, d = k_old.shape
        b, kj, kq, t2 = ancestry.shape
        scale = d ** -0.5
        qn = q * scale  # (N, 1, NH, D), bf16 scale as dot_product_attention
        qs = jnp.broadcast_to(
            qn.reshape(b, 1, kq, nh, d), (b, kj, kq, nh, d)
        ).reshape(n, kq, nh, d)
        scores = jnp.einsum(
            "nqhd,nthd->nhqt", qs, k_old, preferred_element_type=jnp.float32
        ).reshape(b, kj, nh, kq, t)
        bias = jnp.where(ancestry > 0, 0.0, NEG_INF)  # (b, kj, kq, t) f32
        scores = scores + bias[:, :, None]
        # current step: slot q attends its own freshly projected K/V
        s_cur = jnp.sum(
            (qn * k_new).astype(jnp.float32), axis=-1
        )  # (N, 1, NH)
        s_cur = s_cur.reshape(b, kq, nh).transpose(0, 2, 1)  # (b, nh, kq)
        # softmax jointly over (kj, t) + the current lane, no transposes of
        # the big score tensor
        m_past = jnp.max(scores, axis=(1, 4))  # (b, nh, kq)
        m = jnp.maximum(m_past, s_cur)
        unnorm = jnp.exp(scores - m[:, None, :, :, None])
        un_cur = jnp.exp(s_cur - m)
        denom = jnp.sum(unnorm, axis=(1, 4)) + un_cur  # (b, nh, kq)
        weights = (unnorm / denom[:, None, :, :, None]).astype(cfg.dtype)
        partial = jnp.einsum(
            "nhqt,nthd->nqhd", weights.reshape(n, nh, kq, t), v_old,
            preferred_element_type=jnp.float32,  # keep slot partials unrounded
        )
        out = jnp.sum(partial.reshape(b, kj, kq, nh, d), axis=1)
        w_cur = (un_cur / denom).transpose(0, 2, 1).reshape(n, nh)  # (N, NH)
        out = out.reshape(n, nh, d) + (
            w_cur[..., None].astype(cfg.dtype) * v_new.reshape(n, nh, d)
        ).astype(jnp.float32)
        return out.astype(cfg.dtype).reshape(n, 1, nh, d)


class FeedForward(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        h = _dense(cfg, cfg.intermediate_size, "fc1")(x)
        if cfg.hidden_act == "gelu":
            # exact erf GELU (HF BERT/ViT parity)
            h = nn.gelu(h, approximate=False)
        elif cfg.hidden_act == "gelu_tanh":
            # tanh-approx GELU (HF "gelu_new"/"gelu_pytorch_tanh"): |Δ| < 1e-3
            # of exact, and markedly cheaper on the TPU VPU — erf is the
            # priciest transcendental in the FFN at (B, T, 4H) scale
            h = nn.gelu(h, approximate=True)
        else:
            h = nn.relu(h)
        h = _dense(cfg, cfg.hidden_size, "fc2")(h)
        return nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)


class Embeddings(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(self, input_ids, position_ids, deterministic=True):
        cfg = self.config
        word = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            name="word_embeddings",
        )(input_ids)
        pos = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            name="position_embeddings",
        )(position_ids)
        h = word + pos
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln")(h)
        return nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)


class EncoderLayer(nn.Module):
    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.self_attn = MultiHeadAttention(cfg, cross=False, name="self_attn")
        self.self_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="self_ln")
        self.ffn = FeedForward(cfg, name="ffn")
        self.ffn_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ffn_ln")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, x, bias=None, deterministic=True):
        attn, _ = self.self_attn(x, bias=bias, train=not deterministic)
        x = self.self_ln(x + self.dropout(attn, deterministic=deterministic))
        x = self.ffn_ln(x + self.ffn(x, deterministic=deterministic))
        return x


class DecoderLayer(nn.Module):
    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.self_attn = MultiHeadAttention(cfg, cross=False, name="self_attn")
        self.self_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="self_ln")
        self.cross_attn = MultiHeadAttention(cfg, cross=True, name="cross_attn")
        self.cross_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="cross_ln")
        self.ffn = FeedForward(cfg, name="ffn")
        self.ffn_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ffn_ln")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(
        self,
        x,
        enc_hidden=None,
        self_bias=None,
        cross_bias=None,
        deterministic=True,
        self_cache=None,
        cross_cache=None,
        decode_index=None,
        ancestry=None,
    ):
        # NOTE: callers pass every argument positionally — ``deterministic`` is
        # a remat static_argnum when gradient_checkpointing is on.
        attn, new_self_cache = self.self_attn(
            x, bias=self_bias, cache=self_cache, decode_index=decode_index,
            ancestry=ancestry, train=not deterministic,
        )
        x = self.self_ln(x + self.dropout(attn, deterministic=deterministic))
        cross, _ = self.cross_attn(
            x, kv_input=enc_hidden, bias=cross_bias, cache=cross_cache,
            train=not deterministic,
        )
        x = self.cross_ln(x + self.dropout(cross, deterministic=deterministic))
        x = self.ffn_ln(x + self.ffn(x, deterministic=deterministic))
        return x, new_self_cache


class TransformerEncoder(nn.Module):
    """Bidirectional text encoder (reference EncoderModel / BertGenerationEncoder)."""

    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.embeddings = Embeddings(cfg, name="embeddings")
        # remat trades recompute for activation memory (jax.checkpoint — the
        # TPU-native realization of the HF gradient_checkpointing flag);
        # "dots" keeps matmul outputs and recomputes only the elementwise
        # chain (see ViT.gradient_checkpointing for the measured tradeoff)
        layer_cls = (
            nn.remat(EncoderLayer, static_argnums=(3,),
                     policy=_remat_policy(cfg.gradient_checkpointing))
            if cfg.gradient_checkpointing else EncoderLayer
        )
        self.layers = [
            layer_cls(cfg, name=f"layer_{i}") for i in range(cfg.num_hidden_layers)
        ]

    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        t = input_ids.shape[1]
        positions = jnp.arange(t)[None, :]
        h = self.embeddings(input_ids, positions, deterministic=deterministic)
        bias = make_attention_bias(key_mask=attention_mask, query_len=t, key_len=t)
        for layer in self.layers:
            h = layer(h, bias, deterministic)
        return h


class TransformerDecoder(nn.Module):
    """Causal decoder with cross-attention and LM head.

    Three modes:
    - ``mode='train'``: full-sequence teacher forcing -> logits (B, T, V);
    - ``mode='init_cache'``: build the decode cache — zeroed self K/V at
      ``max_len`` plus precomputed cross K/V from the encoder memory;
    - ``mode='decode'``: one-token step at ``decode_index`` with cache in/out.
    """

    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.embeddings = Embeddings(cfg, name="embeddings")
        layer_cls = (
            nn.remat(DecoderLayer, static_argnums=(5,),
                     policy=_remat_policy(cfg.gradient_checkpointing))
            if cfg.gradient_checkpointing else DecoderLayer
        )
        self.layers = [
            layer_cls(cfg, name=f"layer_{i}") for i in range(cfg.num_hidden_layers)
        ]
        if cfg.lm_head_transform:
            self.lm_transform = _dense(cfg, cfg.hidden_size, "lm_transform")
            self.lm_transform_ln = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="lm_transform_ln"
            )
        self.lm_head = _dense(cfg, cfg.vocab_size, "lm_head")

    def _head(self, h, keep_dtype: bool = False):
        if self.config.lm_head_transform:
            h = self.lm_transform_ln(nn.gelu(self.lm_transform(h), approximate=False))
        out = self.lm_head(h)
        # keep_dtype=True would emit bf16 logits (half the HBM traffic, no
        # precision loss since the matmul already rounded to bf16) — measured
        # SLOWER on v5e (190 vs 208 reports/s): the bf16 (16,128) tiling of the
        # downstream pad+block-reduce underperforms the f32 (8,128) path.
        return out if keep_dtype else out.astype(jnp.float32)

    def _head_blocked(self, h, blocked_weights, block: int = 128):
        """LM head emitting (N, nb, block) f32 logits, padded lanes at <= -1e30.

        ``blocked_weights`` is the (padded kernel (H, nb*block), padded bias)
        pair from :func:`make_blocked_head_weights`, built ONCE outside the
        decode loop (building it in-step re-pads the full vocab kernel every
        token — measured ~160 us/step at vocab 50k on v5e; XLA does not hoist
        it). The contraction is the same 2-D bf16 matmul flax ``Dense`` emits —
        zero-padded output columns cannot change the real columns' bits — so
        beam choices are bit-identical to the unblocked head while the
        candidate selection skips its per-step pad of the logits tensor.
        """
        cfg = self.config
        if cfg.lm_head_transform:
            h = self.lm_transform_ln(nn.gelu(self.lm_transform(h), approximate=False))
        kb, bb = blocked_weights
        # f32-accumulated dot + f32 bias add: bit-identical to what XLA's
        # simplifier makes of `_head` (convert(dot_bf16) -> dot with
        # preferred_element_type=f32), so beam choices don't shift.
        out = jnp.matmul(
            h.reshape(-1, kb.shape[0]).astype(cfg.dtype), kb,
            preferred_element_type=jnp.float32,
        ) + bb
        # Measured equivalents/negatives on v5e (don't redo): a 3-D rhs einsum
        # ('nh,hbv->nbv', pref f32) lowers to this same matmul+reshape; without
        # preferred_element_type it takes a bf16-accumulated path (wrong bits);
        # a flat variant feeding reduce_window block-stats is 2x slower.
        nb = out.shape[-1] // block
        return out.reshape(out.shape[0], nb, block)

    def _head_blocked_stats(self, h, blocked_weights, tile_v: int = None):
        """LM head through the fused Pallas kernel (ops/blocked_lm_head):
        one pass over the weight stream emits BLOCK-MAJOR padded f32 logits
        (nb, N, 128) PLUS the per-128-block max / sum-exp the beam candidate
        selection needs — the XLA route re-reads the full (N, V) logits from
        HBM for that stats pass and relayouts them for the candidate gather.
        Returns ``(logits (nb, N, 128), bmax (N, nb), bsum (N, nb))`` for
        beam_search's ``_candidates_from_stats``.

        The kernel matmul is the same bf16 contraction with f32 accumulation
        as ``_head_blocked`` up to K-split reduction order (measured max
        logit delta 4.8e-7 at bench shapes on v5e): candidate scores shift by
        ulps while the selected (beam, token) pairs matched the XLA route
        exactly in the hardware A/B (experiments/ab_lmhead_kernel.py).
        """
        from ..ops.blocked_lm_head import (
            lm_head_blocked_stats,
            pick_tile_v,
            unpack_stats,
        )

        cfg = self.config
        if cfg.lm_head_transform:
            h = self.lm_transform_ln(nn.gelu(self.lm_transform(h), approximate=False))
        kb, bb = blocked_weights
        h2 = h.reshape(-1, kb.shape[0]).astype(cfg.dtype)
        if tile_v is None:  # VMEM-budgeted: narrows as the row count grows
            tile_v = pick_tile_v(h2.shape[0], kb.shape[0])
        logits, bmax_p, bsum_p = lm_head_blocked_stats(
            h2, kb, bb,
            tile_v=tile_v, interpret=jax.default_backend() == "cpu",
        )
        return logits, unpack_stats(bmax_p, tile_v), unpack_stats(bsum_p, tile_v)

    def __call__(
        self,
        input_ids=None,
        attention_mask=None,
        encoder_hidden_states=None,
        encoder_attention_mask=None,
        deterministic: bool = True,
        mode: str = "train",
        cache=None,
        decode_index=None,
        max_len: Optional[int] = None,
        blocked_head=None,  # (padded kernel, padded bias) — make_blocked_head_weights
        ancestry=None,  # (B, kj, kq, T) one-hot (or the kernel's flat 3-D mask) — reorder-free beam decode
    ):
        cfg = self.config

        if mode == "init_cache":
            # Returns (self_cache, cross_cache). The self cache is the per-beam
            # mutable decode state (gathered on beam reorder); the cross cache
            # is beam-invariant — it stays OUT of the decode carry so the beam
            # loop never gathers or rewrites it (a large fraction of per-step
            # HBM traffic in the naive layout).
            b = encoder_hidden_states.shape[0]
            self_shape = (b, max_len, cfg.num_attention_heads, cfg.head_dim)
            self_cache, cross_cache = [], []
            for layer in self.layers:
                ck, cv = layer.cross_attn.kv(encoder_hidden_states.astype(cfg.dtype))
                self_cache.append(
                    {
                        "self_k": jnp.zeros(self_shape, cfg.dtype),
                        "self_v": jnp.zeros(self_shape, cfg.dtype),
                    }
                )
                cross_cache.append({"cross_k": ck, "cross_v": cv})
            return tuple(self_cache), tuple(cross_cache)

        if mode == "decode":
            # input_ids: (B, 1); cache: (self_cache tuple, cross_cache tuple)
            self_cache_in, cross_cache = cache
            positions = jnp.full((1, 1), 0, jnp.int32) + decode_index
            h = self.embeddings(input_ids, positions, deterministic=True)
            kernel_cache = "self_k_tnf" in self_cache_in[0]
            if kernel_cache:
                max_len = self_cache_in[0]["self_k_tnf"].shape[0]
            else:
                max_len = self_cache_in[0]["self_k"].shape[1]
            self_bias = make_attention_bias(
                causal=True, key_len=max_len, decode_index=decode_index
            )
            cross_bias = make_attention_bias(key_mask=encoder_attention_mask)
            new_cache = []
            for layer, self_lc, cross_lc in zip(self.layers, self_cache_in, cross_cache):
                if kernel_cache:
                    self_in = {"k_tnf": self_lc["self_k_tnf"],
                               "v_tnf": self_lc["self_v_tnf"]}
                else:
                    self_in = {"k": self_lc["self_k"], "v": self_lc["self_v"]}
                h, new_self = layer(
                    h,
                    None,
                    self_bias,
                    cross_bias,
                    True,
                    self_in,
                    {"k": cross_lc["cross_k"], "v": cross_lc["cross_v"]},
                    decode_index,
                    ancestry,
                )
                if kernel_cache:
                    new_cache.append({"self_k_tnf": new_self["k_tnf"],
                                      "self_v_tnf": new_self["v_tnf"]})
                else:
                    new_cache.append({"self_k": new_self["k"], "self_v": new_self["v"]})
            if blocked_head is not None and blocked_head != 0:
                if len(blocked_head) == 3 and blocked_head[2] == "stats":
                    # fused Pallas head: (flat logits, block max, block sumexp)
                    logits = self._head_blocked_stats(h[:, -1], blocked_head[:2])
                else:
                    # (N, nb, block) f32 — consumed by beam_search(blocked_vocab=V)
                    logits = self._head_blocked(h[:, -1], blocked_head)
            else:
                logits = self._head(h, keep_dtype=False)
            return logits, tuple(new_cache)

        # train / teacher-forced eval
        t = input_ids.shape[1]
        positions = jnp.arange(t)[None, :]
        h = self.embeddings(input_ids, positions, deterministic=deterministic)
        self_bias = make_attention_bias(
            key_mask=attention_mask, causal=True, query_len=t, key_len=t
        )
        cross_bias = make_attention_bias(key_mask=encoder_attention_mask)
        enc_h = (
            encoder_hidden_states.astype(cfg.dtype)
            if encoder_hidden_states is not None
            else None
        )
        for layer in self.layers:
            h, _ = layer(h, enc_h, self_bias, cross_bias, deterministic)
        return self._head(h)


def causal_lm_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """HF ``labels=input_ids`` semantics: predict token t+1 from prefix <= t
    (reference decoder_model.py:46) — but masked by the attention mask so padding
    never contributes to the loss (a deliberate improvement over the reference,
    which feeds unmasked pad labels into CrossEntropyLoss)."""
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:].astype(jnp.int32)
    # lse - picked instead of materializing the (B, T, V) log-softmax (saves a
    # full f32 logits-sized write+read, ~7 ms/step at batch 128 on v5e); the
    # one-hot mask-reduce avoids the TPU scatter in take_along_axis's backward.
    lse = jax.nn.logsumexp(shift_logits, axis=-1)
    iota = jax.lax.broadcasted_iota(jnp.int32, shift_logits.shape, 2)
    picked = jnp.sum(
        jnp.where(iota == shift_labels[..., None], shift_logits, 0.0), axis=-1
    )
    nll = lse - picked
    if label_mask is not None:
        mask = label_mask[:, 1:].astype(jnp.float32)
    else:
        mask = jnp.ones_like(nll)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
