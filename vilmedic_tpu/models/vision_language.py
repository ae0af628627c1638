"""VisionLanguage: frozen vision backbone + prefix-conditioned causal LM.

Parity with reference hf_trainer/models/vision_language_modernbert/model.py:11-283:
a frozen ViT-style backbone, a 2-layer GELU MLP projecting patch features into
the LM embedding space, a learned image-marker token prepended to the projected
patches, and a decoder-only causal LM conditioned on that prefix; the LM loss
covers only text positions; generation decodes autoregressively after a one-shot
**prefill** of the image prefix into the KV cache.

TPU-native: prefill writes the whole prefix's K/V with one
``dynamic_update_slice`` per layer inside a single jitted call; decode steps are
the same ``lax.while_loop`` machinery as the cross-attention models.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import registry
from ..blocks.transformer import (
    Embeddings,
    FeedForward,
    MultiHeadAttention,
    TransformerConfig,
    _dense,
    quantize_kv,
)
from ..blocks.vision.visual_encoder import build_visual_encoder
from ..config.config import Config
from ..decoding import beam_search, greedy_search, tile_for_beams
from ..ops.attention import make_attention_bias
from .base import TaskModel, get_special_token_ids, resolve_block_config


class CausalLayer(nn.Module):
    """Self-attention-only transformer layer with decode cache support."""

    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.self_attn = MultiHeadAttention(cfg, cross=False, name="self_attn")
        self.self_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="self_ln")
        self.ffn = FeedForward(cfg, name="ffn")
        self.ffn_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ffn_ln")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, x, bias=None, deterministic=True, cache=None, decode_index=None,
                 prefix_kv=None, ancestry=None, causal=False):
        if prefix_kv is not None:
            # beam-shared prefix decode: one joint softmax over the shared
            # prefix K/V (batch B) + the per-beam generated cache (fused
            # reorder-free kernel segment when ancestry + k_tnf layout)
            attn, new_cache = self.self_attn.prefix_decode(
                x, prefix_kv, cache, decode_index, ancestry=ancestry
            )
        else:
            attn, new_cache = self.self_attn(
                x, bias=bias, cache=cache, decode_index=decode_index,
                causal=causal, train=not deterministic,
            )
        x = self.self_ln(x + self.dropout(attn, deterministic=deterministic))
        x = self.ffn_ln(x + self.ffn(x, deterministic=deterministic))
        return x, new_cache


def _layer_forward(layer, x, bias, deterministic, causal):
    """Full-sequence CausalLayer call in module-first form so nn.remat can
    mark ``deterministic``/``causal`` static (kwarg bools would be traced
    through jax.checkpoint and break the Python-level flag checks)."""
    h, _ = layer(x, bias=bias, deterministic=deterministic, causal=causal)
    return h


class VisionLanguageModule(nn.Module):
    cfg: TransformerConfig
    vision: nn.Module  # VisualEncoder (frozen)
    num_image_tokens: int  # static prefix length incl. the marker token
    #: drop the backbone's CLS token from the prefix — the reference's
    #: DINOv2 backbone path returns patch tokens only (AutoBackbone feature
    #: maps, reference model.py:86-99)
    drop_cls_token: bool = False

    def setup(self):
        cfg = self.cfg
        self.embeddings = Embeddings(cfg, name="embeddings")
        self.layers = [CausalLayer(cfg, name=f"layer_{i}") for i in range(cfg.num_hidden_layers)]
        self.lm_head = _dense(cfg, cfg.vocab_size, "lm_head")
        self.proj_fc1 = _dense(cfg, cfg.hidden_size, "proj_fc1")
        self.proj_fc2 = _dense(cfg, cfg.hidden_size, "proj_fc2")
        self.image_token_embedding = self.param(
            "image_token_embedding", nn.initializers.normal(0.02),
            (1, 1, cfg.hidden_size), jnp.float32,
        )

    def image_prefix(self, images, train: bool = False):
        """(B, P, D): marker token + projected patch features (reference :81-106)."""
        feats = self.vision(images, train=False)  # frozen backbone
        feats = jax.lax.stop_gradient(feats)
        if self.drop_cls_token:
            feats = feats[:, 1:]
        proj = self.proj_fc2(nn.gelu(self.proj_fc1(feats)))
        b = proj.shape[0]
        marker = jnp.tile(self.image_token_embedding.astype(proj.dtype), (b, 1, 1))
        return jnp.concatenate([marker, proj], axis=1)

    def _text_embed(self, input_ids, offset):
        t = input_ids.shape[1]
        positions = jnp.arange(t)[None, :] + offset
        return self.embeddings(input_ids, positions, deterministic=True)

    def __call__(self, images, input_ids, attention_mask, train: bool = False):
        """Teacher-forced LM loss over text positions only (reference :120-180)."""
        cfg = self.cfg
        prefix = self.image_prefix(images, train=train)
        p = prefix.shape[1]
        t = input_ids.shape[1]
        positions = jnp.arange(t)[None, :] + p
        text = self.embeddings(input_ids, positions, deterministic=not train)
        h = jnp.concatenate([prefix.astype(text.dtype), text], axis=1)

        key_mask = jnp.concatenate(
            [jnp.ones((h.shape[0], p), jnp.int32), attention_mask], axis=1
        )
        # key-padding-only bias + causal flag (NOT a dense triangle bias): at
        # DINOv2 prefix lengths the attention routes through the causal flash
        # kernel (ops/attention FLASH_MIN_LEN) — train-safe via its custom VJP
        bias = make_attention_bias(key_mask=key_mask)
        # remat trades recompute for activation memory on the TRAIN forward
        # only (each layer holds (B, ~1.5k, H) activations at DINOv2 prefix
        # lengths); decode/prefill are grad-free and stay un-wrapped
        run = (
            nn.remat(_layer_forward, static_argnums=(3, 4))
            if cfg.gradient_checkpointing else _layer_forward
        )
        for layer in self.layers:
            h = run(layer, h, bias, not train, True)
        logits = self.lm_head(h[:, p:]).astype(jnp.float32)

        from ..blocks.transformer import causal_lm_loss

        loss = causal_lm_loss(logits, input_ids, attention_mask)
        return {"loss": loss, "logits": logits}

    def prefill(self, images, max_text_len, quantize_prefix: bool = False):
        """Run the image prefix through the stack; returns
        ``(gen_cache, prefix_kv, prefix_len)``.

        The prefix K/V stay SEPARATE from the generated-token cache: they are
        identical across the beams of an item, so the beam loop closes over
        them as invariants (batch size B, beam-folded reads in
        ``MultiHeadAttention.prefix_decode``) and only gathers/rewrites the
        small (N, max_text_len) generated cache — for a DINOv2-sized prefix
        (~1.4k tokens vs ~100 generated) that removes >90% of the per-step
        beam-reorder cache traffic the concatenated layout paid.

        ``quantize_prefix=True`` stores the prefix K/V as int8 with per-
        (token, head) symmetric scales — the decode loop re-reads the whole
        prefix every step (~S*H*D*2*2 bytes/layer/item, the bandwidth floor at
        DINOv2 prefix lengths), so halving its footprint halves that floor.
        APPROXIMATE (<=1/127 relative rounding per element); opt-in via the
        eval config ``prefix_kv_dtype: int8``.
        """
        cfg = self.cfg
        prefix = self.image_prefix(images, train=False)
        b, p, _ = prefix.shape

        h = prefix.astype(cfg.dtype)
        gen_caches, prefix_kvs = [], []
        shape = (b, max_text_len, cfg.num_attention_heads, cfg.head_dim)
        for layer in self.layers:
            # the self-attention K/V projections of this layer's prefix input
            # ARE the prefix segment of the decode-time cache
            pk, pv = (x.astype(cfg.dtype) for x in layer.self_attn.kv(h))
            if quantize_prefix:
                prefix_kvs.append(quantize_kv(pk) + quantize_kv(pv))
            else:
                prefix_kvs.append((pk, pv))
            h, _ = layer(h, deterministic=True, causal=True)
            gen_caches.append({
                "self_k": jnp.zeros(shape, cfg.dtype),
                "self_v": jnp.zeros(shape, cfg.dtype),
            })
        return tuple(gen_caches), tuple(prefix_kvs), p

    def decode_step(self, tokens, cache, prefix_kv, index, prefix_len,
                    blocked_head=None, ancestry=None):
        """One-token decode at absolute position prefix_len + index.

        ``cache`` holds only the generated-token K/V (beam-gathered, written
        at slot ``index``); ``prefix_kv`` is the beam-shared prefix segment
        from :meth:`prefill` (batch size B — the joint softmax in
        ``MultiHeadAttention.prefix_decode`` folds the beam axis).
        ``blocked_head`` is the pre-padded (kernel, bias) pair from
        ``make_blocked_head_weights`` — beam search then consumes
        (N, nb, 128) f32 blocks with no per-step pad/reshape of the 50k-wide
        logits (bit-identical to the plain head, same argument as
        ``TransformerDecoder._head_blocked``)."""
        abs_index = prefix_len + index
        h = self._text_embed(tokens, abs_index)
        kernel_cache = "self_k_tnf" in cache[0]
        new_cache = []
        for layer, lc, pkv in zip(self.layers, cache, prefix_kv):
            if kernel_cache:
                cache_in = {"k_tnf": lc["self_k_tnf"], "v_tnf": lc["self_v_tnf"]}
                if "self_kv_sc" in lc:  # int8 generated cache (per-lane scales)
                    cache_in["kv_sc"] = lc["self_kv_sc"]
            else:
                cache_in = {"k": lc["self_k"], "v": lc["self_v"]}
            h, new_self = layer(
                h, deterministic=True, cache=cache_in,
                decode_index=index, prefix_kv=pkv, ancestry=ancestry,
            )
            if kernel_cache:
                entry = {"self_k_tnf": new_self["k_tnf"],
                         "self_v_tnf": new_self["v_tnf"]}
                if "kv_sc" in new_self:
                    entry["self_kv_sc"] = new_self["kv_sc"]
                new_cache.append(entry)
            else:
                new_cache.append({"self_k": new_self["k"], "self_v": new_self["v"]})
        if blocked_head is not None:
            kb, bb = blocked_head
            out = jnp.matmul(
                h[:, -1].astype(self.cfg.dtype), kb,
                preferred_element_type=jnp.float32,
            ) + bb
            logits = out.reshape(out.shape[0], out.shape[-1] // 128, 128)
            return logits, tuple(new_cache)
        return self.lm_head(h).astype(jnp.float32), tuple(new_cache)


def _pad_bias(bias, total_keys):
    """Extend a (.., P, P) causal bias to (.., P, total) with -inf on the
    not-yet-written key slots."""
    from ..ops.attention import NEG_INF

    p = bias.shape[-1]
    pad = jnp.full(bias.shape[:-1] + (total_keys - p,), NEG_INF, bias.dtype)
    return jnp.concatenate([bias, pad], axis=-1)


def derive_gen_kv_scales(prefix_kvs, margin: float = 1.25):
    """Per-layer (2, H*D) f32 per-lane scales for the int8 GENERATED cache
    (``gen_kv_dtype: int8``), derived from the prefix K/V statistics.

    The generated-segment cache needs a scale that is FIXED across decode
    steps (past entries must dequantize consistently), known before the
    first write, and cheap to apply in the fused kernel. Per-lane (= per
    head-channel) scales satisfy all three: the K scale folds into the query
    (it multiplies the contracted dim) and the V scale factors out of the
    output lanes — zero per-chunk kernel cost (ops/beam_cache_attention).
    The prefix tokens went through the SAME K/V projections as the generated
    text tokens will, so their per-channel maxima are the best available
    zero-cost estimate; ``margin`` headroom absorbs text tokens running
    hotter than image tokens, and the kernel's saturating clip bounds the
    error for any channel that still overshoots. Accepts both prefill
    formats: bf16 ``(pk, pv)`` and int8 ``(pk_q, k_sc, pv_q, v_sc)``
    4-tuples (per-(token, head) scales, ``blocks.transformer.quantize_kv``).
    """
    def _amax_lanes(x, sc=None):
        xf = jnp.abs(x.astype(jnp.float32))
        if sc is not None:  # int8 prefix: |x| = |q| * scale[..., None]
            xf = xf * sc.astype(jnp.float32)[..., None]
        b, s, h, d = xf.shape
        return jnp.max(xf, axis=(0, 1)).reshape(h * d)

    out = []
    for pkv in prefix_kvs:
        if len(pkv) == 4:
            pk_q, k_sc, pv_q, v_sc = pkv
            ka, va = _amax_lanes(pk_q, k_sc), _amax_lanes(pv_q, v_sc)
        else:
            pk, pv = pkv
            ka, va = _amax_lanes(pk), _amax_lanes(pv)
        sc = jnp.stack([ka, va]) * (margin / 127.0)
        out.append(jnp.maximum(sc, 1e-8))
    return tuple(out)


def maybe_fuse_prefix(prefix_kv, anc_g, beam_width, prefix_len):
    """Repack per-layer bf16 ``(pk, pv)`` prefix K/V into ``KernelPrefix``
    bundles when the fused kernel can stream the beam-shared prefix INSIDE
    its own online softmax (one joint pass over prefix + generated cache +
    current step — no XLA prefix einsum, no stats merge). int8 4-tuples and
    non-fusable shapes return unchanged (einsum + merge path).

    MEASURED NEGATIVE at the DINOv2 target shape, so OFF by default
    (``VILMEDIC_FUSED_PREFIX=1`` opts in): at 518px/14 batch 16 beam 8 the
    fused route ran 40.7 vs the merge path's 55.6 rep/s (-27%,
    experiments/ab_fused_prefix.py). The kernel's beam-folded column layout
    makes prefix columns span all gB items of a group, so 7/8 of the score
    matrix is cross-item-masked — 8x redundant MXU+VPU work per chunk that
    outweighs the saved einsum/merge/custom-call overhead. Both paths read
    the same prefix HBM bytes, and the einsum's MXU cost is trivial
    (~0.3 GFLOP/layer/step), so fusion has no bandwidth advantage to offer.
    Kept as an experiment; parity vs the merge path is oracle-tested in
    interpret mode (bf16 kernel scores vs the einsum's f32 differ in ulps,
    so TPU beam sequences may legitimately diverge on near-tied beams)."""
    import os

    from ..ops.beam_cache_attention import (
        KernelPrefix, pack_kernel_prefix, prefix_fusable,
    )

    interp = jax.default_backend() == "cpu"
    if (
        len(prefix_kv[0]) == 2  # bf16 (pk, pv); int8 keeps the merge
        and os.environ.get("VILMEDIC_FUSED_PREFIX", "0") == "1"
        and (interp or prefix_fusable(beam_width, anc_g, prefix_len))
    ):
        return tuple(
            KernelPrefix(*pack_kernel_prefix(pk, pv, anc_g), beams=beam_width)
            for pk, pv in prefix_kv
        )
    return prefix_kv


def vl_evaluation(models, config, dl, from_training=True, **kwargs) -> Dict[str, Any]:
    model = models[0]
    module = model.module
    dataset = dl.dataset
    tokenizer = dataset.tokenizer
    max_len = int(dataset.tokenizer_max_len)
    bos_id, eos_id, pad_id = get_special_token_ids(model.dec_config, tokenizer)
    beam_width = int(config.get("beam_width", 1) or 1)
    length_penalty = float(config.get("length_penalty") or 1.0)

    # Data-parallel generation — SAME policy/helpers as the RRG/RRS eval
    # (evaluation_nlg.setup_sharded_eval / wrap_generate_sharded).
    import os

    # Reorder-free beam decode for the generated segment (same policy as
    # evaluation_nlg): the fused Pallas kernel needs 128-multiple H*D, a
    # head_dim dividing 128, and beam <= 64; VILMEDIC_ANCESTRY_DECODE=0
    # restores the cache-permute path.
    cfg_dec = model.dec_config
    ancestry_impl = os.environ.get("VILMEDIC_ANCESTRY_DECODE", "pallas")
    kernel_ok = (
        beam_width and 1 < beam_width <= 64
        and cfg_dec.hidden_size % 128 == 0
        and 128 % cfg_dec.head_dim == 0
        and ancestry_impl == "pallas"
    )

    from .evaluation_nlg import setup_sharded_eval, wrap_generate_sharded

    variables = model.variables
    batch_size = getattr(dl, "batch_size", None)
    mesh, pad_target, replicate = setup_sharded_eval(config, batch_size)
    if mesh is not None:
        variables = replicate(variables)

    # int8 prefix-KV cache (config ``prefix_kv_dtype: int8``): halves the
    # per-step prefix HBM read that floors DINOv2-scale decode throughput;
    # APPROXIMATE (see VisionLanguageModule.prefill), default off
    quantize_prefix = str(config.get("prefix_kv_dtype", "") or "") == "int8"
    # int8 GENERATED cache (config ``gen_kv_dtype: int8``): halves the
    # generated-segment slab reads inside the fused beam kernel — the other
    # half of the per-step HBM floor at long decodes. Per-lane static scales
    # from the prefix stats (derive_gen_kv_scales); kernel-path only.
    quantize_gen = str(config.get("gen_kv_dtype", "") or "") == "int8"

    def generate(variables, images):
        cache, prefix_kv, prefix_len = module.apply(
            variables, images, max_len, quantize_prefix=quantize_prefix,
            method=type(module).prefill,
        )
        batch = images.shape[0]
        # biggest legal kernel group for THIS batch/max_len (shared helper —
        # encodes the fused kernel's slab-legality rules); None -> permute path
        anc_g = None
        if kernel_ok and beam_width > 1:
            from ..ops.beam_cache_attention import pick_ancestry_group

            anc_g = pick_ancestry_group(batch, beam_width, max_len)
        kernel_now = bool(kernel_ok) and anc_g is not None
        if beam_width > 1:
            # only the generated-token cache tiles to B*beam rows; the prefix
            # K/V stay at batch B as loop invariants (prefix_decode folds the
            # beam axis) — never gathered on beam reorder
            cache = tile_for_beams(cache, beam_width)
        if kernel_now:
            from ..blocks.transformer import to_kernel_cache

            # (T, N, H*D) kernel layout: in-place slab writes, cache carried
            # un-permuted across beam reorders (ancestry folds the reorder
            # into the attention reads)
            gen_scales = (
                derive_gen_kv_scales(prefix_kv) if quantize_gen else None
            )
            cache = to_kernel_cache(cache, scales=gen_scales)
            if gen_scales is None:  # fused-prefix experiment excludes int8
                prefix_kv = maybe_fuse_prefix(
                    prefix_kv, anc_g, beam_width, prefix_len
                )
        # under shard_map the freshly-zeroed gen cache is "unvarying" while
        # the loop body makes it varying — promote it (evaluation_nlg _pvary)
        vary_axes = () if mesh is None else ("data",)
        if vary_axes:
            cache = jax.tree.map(
                lambda x: jax.lax.pcast(x, vary_axes, to="varying"), cache
            )

        # blocked LM head for beam decode at large vocab: pad the vocab
        # projection to 128-blocks ONCE outside the decode loop; the beam
        # search consumes (N, nb, 128) f32 blocks directly (bit-identical,
        # no per-step pad/relayout of the 50k-wide logits — the same
        # 242->280 rep/s lever as the RRG decoder)
        vocab = model.dec_config.vocab_size
        blocked = None
        if beam_width > 1 and vocab >= 4096:
            from ..blocks.transformer import make_blocked_head_weights

            blocked = make_blocked_head_weights(
                variables["params"], model.dec_config.dtype
            )

        def step_fn(tokens, cache, index, anc=None):
            logits, new_cache = module.apply(
                variables, tokens, cache, prefix_kv, index, prefix_len,
                blocked_head=blocked, ancestry=anc,
                method=type(module).decode_step,
            )
            if blocked is not None:
                return logits, new_cache
            return logits[:, -1].astype(jnp.float32), new_cache

        if beam_width > 1:
            return beam_search(
                step_fn, cache, batch, beam_width, max_len, bos_id, eos_id,
                pad_id, length_penalty, vary_axes=vary_axes,
                blocked_vocab=vocab if blocked is not None else None,
                ancestry=kernel_now, ancestry_group_items=anc_g,
            ).sequences
        return greedy_search(
            step_fn, cache, batch, max_len, bos_id, eos_id, pad_id,
            forced_eos=False, vary_axes=vary_axes,
        ).sequences

    generate = wrap_generate_sharded(generate, mesh, bool(kernel_ok))

    from ..models.evaluation_nlg import _pad_batch, pipelined_decode
    from ..parallel.mesh import shard_batch

    def prepare(batch):
        images = np.asarray(batch["images"])
        n = images.shape[0]
        if pad_target and n < pad_target:  # static-shape padding for XLA
            # pad on host BEFORE any device transfer — padding a device array
            # would round-trip the whole image batch through the host
            images = _pad_batch(images, pad_target)
        images = jnp.asarray(images)
        if mesh is not None:
            images = shard_batch(images, mesh)
        return images, batch["input_ids"], n

    # shared decode/detokenize pipeline (evaluation_nlg.pipelined_decode)
    return pipelined_decode(
        dl, tokenizer, prepare, lambda images: generate(variables, images)
    )


@registry.register("model")
class VisionLanguage(TaskModel):
    """proto ``VisionLanguage``: the hf_trainer stack's VLM as a native model."""

    def __init__(self, decoder=None, vision=None, vision_model_name=None,
                 dl=None, logger=None, from_training=True, dtype="float32",
                 **kwargs):
        compute_dtype = jnp.bfloat16 if str(dtype) in ("bfloat16", "bf16") else jnp.float32
        decoder_args = resolve_block_config(decoder or {})
        if isinstance(vision, str):
            vision_model_name = vision
            vision = None
        vision = _d(vision or {})
        vision_model_name = vision.pop("vision_model_name", vision_model_name)

        self._pretrained_blocks = {}
        drop_cls_token = False
        if vision_model_name:
            # pretrained frozen tower (reference model.py:15,46: AutoBackbone
            # from vision_model_name with requires_grad=False). Architecture
            # from the locally cached HF config; weights overlay post-init
            # through zoo/convert_vision.convert_hf_dinov2.
            from .hf_compat import _resolve_hf_config

            hf = _resolve_hf_config(vision_model_name)
            if hf.get("model_type") != "dinov2":
                raise ValueError(
                    f"vision_model_name {vision_model_name!r} resolved to "
                    f"model_type {hf.get('model_type')!r}; only DINOv2 "
                    f"backbones are supported here (the reference's default)"
                )
            vision.setdefault("backbone", "dinov2")
            # image_size may be overridden (the position grid re-interpolates
            # at load); every other architecture key comes from the checkpoint
            for k in ("hidden_size", "num_hidden_layers", "num_attention_heads",
                      "mlp_ratio", "patch_size", "layer_norm_eps",
                      "use_swiglu_ffn", "hidden_act"):
                if k in hf:
                    vision.setdefault(k, hf[k])
            vision.setdefault("image_size", hf.get("image_size", 518))
            self._pretrained_blocks["vision"] = (vision_model_name, "dinov2")
            drop_cls_token = True

        tok_overrides = {}
        if dl is not None:
            tokenizer = dl.dataset.tokenizer
            tok_overrides = dict(
                vocab_size=tokenizer.vocab_size,
                bos_token_id=tokenizer.cls_token_id,
                eos_token_id=tokenizer.sep_token_id,
                pad_token_id=tokenizer.pad_token_id,
            )
        self.dec_config = TransformerConfig.from_dict(
            decoder_args, **tok_overrides, dtype=compute_dtype
        )
        vision.setdefault("proto", "VisualEncoder")
        vision.setdefault("backbone", "vit")
        vision.setdefault("permute", "no_permute")
        vision.setdefault("freeze", True)
        # frozen tower -> excluded from the optimizer entirely (no adam
        # m/v slots, no zero-grad update traffic; see TaskModel.frozen_prefixes)
        self.frozen_prefixes = ("vision",) if vision.get("freeze") else ()
        enc = build_visual_encoder(vision, dtype=compute_dtype)

        image_size = vision.get("image_size", 224)
        patch = vision.get("patch_size", 16)
        # prefix = patches + marker (+ cls unless the backbone drops it)
        num_image_tokens = (image_size // patch) ** 2 + (1 if drop_cls_token else 2)
        self.module = VisionLanguageModule(
            cfg=self.dec_config, vision=enc, num_image_tokens=num_image_tokens,
            drop_cls_token=drop_cls_token,
        )
        self.eval_func = vl_evaluation
        self.variables: Optional[Dict] = None

    def init_variables(self, rng, batch):
        return self.module.init(
            {"params": rng, "dropout": rng},
            batch["images"], batch["input_ids"], batch["attention_mask"],
            train=False,
        )

    def apply_train(self, variables, batch, rng, train: bool = True):
        kwargs = {"train": train}
        if train and rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        out = self.module.apply(
            variables, batch["images"], batch["input_ids"],
            batch["attention_mask"], **kwargs,
        )
        return out, {}

    def __repr__(self):
        return "model: VisionLanguage (frozen ViT + prefix-conditioned causal LM)"


def _d(cfg):
    if isinstance(cfg, Config):
        return cfg.to_dict()
    return dict(cfg or {})
