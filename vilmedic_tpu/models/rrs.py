"""RRS: Radiology Report Summarization — text encoder + causal cross-attn decoder.

Parity with reference vilmedic/models/rrs/RRS.py:11-59: a BertGeneration-style
text encoder over the findings (``src``) and a decoder generating the impression
(``tgt``); shares the NLG beam-search ``eval_func`` with RRG.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..blocks.transformer import (
    TransformerConfig,
    TransformerDecoder,
    TransformerEncoder,
    causal_lm_loss,
)
from ..registry import register
from .base import TaskModel, resolve_block
from .evaluation_nlg import evaluation


class RRSModule(nn.Module):
    enc_config: TransformerConfig
    dec_config: TransformerConfig

    def setup(self):
        self.enc = TransformerEncoder(self.enc_config, name="enc")
        self.dec = TransformerDecoder(self.dec_config, name="dec")

    def __call__(
        self,
        input_ids,
        attention_mask,
        decoder_input_ids,
        decoder_attention_mask,
        train=False,
    ):
        enc_hidden = self.enc(input_ids, attention_mask, deterministic=not train)
        logits = self.dec(
            decoder_input_ids,
            decoder_attention_mask,
            encoder_hidden_states=enc_hidden,
            encoder_attention_mask=attention_mask,
            deterministic=not train,
        )
        loss = causal_lm_loss(logits, decoder_input_ids, decoder_attention_mask)
        return {"loss": loss, "logits": logits}

    def encode(self, input_ids, attention_mask):
        return self.enc(input_ids, attention_mask, deterministic=True), attention_mask

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
class RRS(TaskModel):
    def __init__(
        self,
        encoder,
        decoder,
        dl=None,
        logger=None,
        from_training=True,
        dtype="float32",
        **kwargs,
    ):
        compute_dtype = jnp.bfloat16 if str(dtype) in ("bfloat16", "bf16") else jnp.float32
        enc_vocab = dl.dataset.src.tokenizer.vocab_size if dl is not None else None
        dec_vocab = dl.dataset.tgt.tokenizer.vocab_size if dl is not None else None
        enc_args, enc_pretrained = resolve_block(encoder)
        dec_args, dec_pretrained = resolve_block(decoder)
        self._pretrained_blocks = {}
        if enc_pretrained:
            self._pretrained_blocks["enc"] = (enc_pretrained, "encoder")
        if dec_pretrained:
            self._pretrained_blocks["dec"] = (dec_pretrained, "causal")
        self.enc_config = TransformerConfig.from_dict(
            enc_args,
            **({"vocab_size": enc_vocab} if enc_vocab else {}),
            dtype=compute_dtype,
        )
        self.dec_config = TransformerConfig.from_dict(
            dec_args,
            **({"vocab_size": dec_vocab} if dec_vocab else {}),
            add_cross_attention=True,
            dtype=compute_dtype,
        )
        self.module = RRSModule(enc_config=self.enc_config, dec_config=self.dec_config)
        self.eval_func = evaluation
        self.variables: Optional[Dict] = None

    def init_variables(self, rng, batch):
        return self.module.init(
            {"params": rng, "dropout": rng},
            batch["input_ids"],
            batch["attention_mask"],
            batch["decoder_input_ids"],
            batch["decoder_attention_mask"],
            train=False,
        )

    def apply_train(self, variables, batch, rng, train: bool = True):
        out = self.module.apply(
            variables,
            batch["input_ids"],
            batch["attention_mask"],
            batch["decoder_input_ids"],
            batch["decoder_attention_mask"],
            train=train,
            rngs={"dropout": rng} if train else {},
        )
        return out, {}

    def encoder_inputs(self, batch) -> Dict[str, Any]:
        return {
            "input_ids": batch["input_ids"],
            "attention_mask": batch["attention_mask"],
        }

    def __repr__(self):
        return "model: RRS (TransformerEncoder + TransformerDecoder)"
