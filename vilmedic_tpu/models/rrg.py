"""RRG: Radiology Report Generation — vision encoder + causal cross-attn decoder.

Parity with reference vilmedic/models/rrg/RRG.py:10-52: a proto-dispatched CNN
(``VisualEncoder``) feeding a BertGeneration-style decoder whose forward computes
the shifted LM loss, with ``encode()`` exposed for generation and
``eval_func`` = the NLG beam-search evaluation loop.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..blocks.transformer import TransformerConfig, TransformerDecoder, causal_lm_loss
from ..blocks.vision.visual_encoder import VisualEncoder, build_visual_encoder
from ..registry import register
from .base import TaskModel, resolve_block
from .evaluation_nlg import evaluation


class RRGModule(nn.Module):
    enc: VisualEncoder
    dec_config: TransformerConfig

    def setup(self):
        self.dec = TransformerDecoder(self.dec_config, name="dec")

    def __call__(self, images, input_ids, attention_mask, images_mask=None, train=False):
        enc_hidden, enc_mask = self.enc.encode(images, images_mask, train=train)
        logits = self.dec(
            input_ids,
            attention_mask,
            encoder_hidden_states=enc_hidden,
            encoder_attention_mask=enc_mask.astype(jnp.int32),
            deterministic=not train,
        )
        loss = causal_lm_loss(logits, input_ids, attention_mask)
        return {"loss": loss, "logits": logits}

    def encode(self, images, images_mask=None):
        enc_hidden, enc_mask = self.enc.encode(images, images_mask, train=False)
        return enc_hidden, enc_mask

    def init_cache(self, enc_hidden, max_len):
        """-> (self_cache, cross_cache): mutable beam state vs loop-invariants."""
        return self.dec(
            encoder_hidden_states=enc_hidden, mode="init_cache", max_len=max_len
        )

    def decode_step(self, tokens, self_cache, cross_cache, enc_mask, index,
                    blocked_head=None, ancestry=None):
        return self.dec(
            tokens,
            encoder_attention_mask=enc_mask,
            mode="decode",
            cache=(self_cache, cross_cache),
            decode_index=index,
            blocked_head=blocked_head,
            ancestry=ancestry,
        )


@register("model")
class RRG(TaskModel):
    def __init__(
        self,
        decoder,
        cnn,
        dl=None,
        logger=None,
        from_training=True,
        dtype="float32",
        **kwargs,
    ):
        compute_dtype = jnp.bfloat16 if str(dtype) in ("bfloat16", "bf16") else jnp.float32
        vocab_size = None
        if dl is not None:
            vocab_size = dl.dataset.tokenizer.vocab_size
        dec_args, dec_pretrained = resolve_block(decoder)
        self._pretrained_blocks = (
            {"dec": (dec_pretrained, "causal")} if dec_pretrained else {}
        )
        self.dec_config = TransformerConfig.from_dict(
            dec_args,
            **({"vocab_size": vocab_size} if vocab_size else {}),
            add_cross_attention=True,
            dtype=compute_dtype,
        )
        self.module = RRGModule(
            enc=build_visual_encoder(cnn, dtype=compute_dtype),
            dec_config=self.dec_config,
        )
        # cnn.freeze stop-gradients the backbone (visual_encoder.py:91-94);
        # exclude it from the optimizer too (the projection sibling under
        # enc/ stays trainable) — see TaskModel.frozen_prefixes
        if (cnn or {}).get("freeze"):
            self.frozen_prefixes = ("enc/model",)
        self.eval_func = evaluation
        self.variables: Optional[Dict] = None  # set by the executor

    # -- executor contract --------------------------------------------------
    def init_variables(self, rng, batch):
        return self.module.init(
            {"params": rng, "dropout": rng},
            batch["images"],
            batch["input_ids"],
            batch["attention_mask"],
            images_mask=batch.get("images_mask"),
            train=False,
        )

    def apply_train(self, variables, batch, rng, train: bool = True):
        has_stats = "batch_stats" in variables and variables["batch_stats"]
        kwargs = dict(
            images_mask=batch.get("images_mask"),
            train=train,
            rngs={"dropout": rng} if train else {},
        )
        if has_stats:
            kwargs["mutable"] = ["batch_stats"]
        out = self.module.apply(
            variables,
            batch["images"],
            batch["input_ids"],
            batch["attention_mask"],
            **kwargs,
        )
        if has_stats:
            out, updated = out
            return out, updated.get("batch_stats", {})
        return out, {}

    # -- generation contract ------------------------------------------------
    def encoder_inputs(self, batch) -> Dict[str, Any]:
        return {"images": batch["images"], "images_mask": batch.get("images_mask")}

    def __repr__(self):
        return "model: RRG (VisualEncoder + TransformerDecoder)"
