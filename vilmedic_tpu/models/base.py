"""Task-model contract.

Reference contract (SURVEY.md §1 L4->L6): every model is a module whose forward
returns a dict with at least ``loss``, and which carries an ``eval_func``
attribute — a free function ``(models, config, dl, from_training) -> results``
that owns the whole evaluation loop (reference executors/utils.py:37-42,
validator.py:68-79).

TPU translation: a task model is a host-side wrapper that owns
- ``module``: the top-level Flax module,
- ``init_variables(rng, batch)``: parameter/batch-stats initialization from a
  sample batch,
- ``apply_train(variables, batch, rng, train)``: pure loss computation returning
  ``(out_dict, new_batch_stats)`` — this is what the executor jits and grads,
- ``eval_func``: the evaluation loop (decoding, metrics inputs).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax


def get_special_token_ids(model_config, tokenizer) -> Tuple[int, int, int]:
    """BOS/EOS/PAD from the decoder config with tokenizer fallback
    (reference blocks/huggingface/decoder/evaluation.py:9-17)."""
    bos = getattr(model_config, "bos_token_id", None)
    eos = getattr(model_config, "eos_token_id", None)
    pad = getattr(model_config, "pad_token_id", None)
    if None in (bos, eos, pad):
        bos = tokenizer.vocab[tokenizer.cls_token]
        eos = tokenizer.vocab[tokenizer.sep_token]
        pad = tokenizer.vocab[tokenizer.pad_token]
    return int(bos), int(eos), int(pad)


def resolve_block_config(block_cfg) -> dict:
    """Resolve a reference-style encoder/decoder block config.

    ``proto: <hf-name>`` pulls the architecture hyperparameters from the
    locally cached HF config (the reference instantiates the full pretrained
    model, decoder_model.py:15-21; weights are not fetchable offline, so only
    the architecture transfers); ``proto: null`` keeps the explicit keys.
    """
    from ..config.config import Config

    if isinstance(block_cfg, Config):
        block_cfg = block_cfg.to_dict()
    block_cfg = dict(block_cfg or {})
    proto = block_cfg.pop("proto", None)
    if isinstance(proto, str) and proto:
        try:
            from transformers import AutoConfig

            hf = AutoConfig.from_pretrained(proto, local_files_only=True).to_dict()
            hf.update(block_cfg)  # explicit keys win
            return hf
        except Exception:
            import logging

            logging.getLogger(__name__).warning(
                f"Pretrained config {proto!r} not in local cache; "
                f"using explicit keys/defaults"
            )
    return block_cfg


class TaskModel:
    module = None
    eval_func = None

    def init_variables(self, rng, batch) -> Dict:
        raise NotImplementedError

    def apply_train(self, variables, batch, rng, train: bool = True):
        raise NotImplementedError

    def count_params(self, variables) -> int:
        return sum(
            x.size for x in jax.tree.leaves(variables.get("params", variables))
        )

    def __repr__(self):
        return type(self).__name__


def variables_of(params, batch_stats=None) -> Dict:
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out
