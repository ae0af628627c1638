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
import numpy as np


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


def resolve_block(block_cfg):
    """Resolve a reference-style encoder/decoder block config.

    ``proto: <hf-name>`` pulls the architecture hyperparameters from the
    locally cached HF config (the reference instantiates the full pretrained
    model, decoder_model.py:15-21); ``proto: null`` keeps the explicit keys.
    Returns ``(config_dict, pretrained_name_or_None)`` — the name is non-None
    only when the HF config resolved locally, so weight loading can follow.
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
            return hf, proto
        except Exception:
            import logging

            logging.getLogger(__name__).warning(
                f"Pretrained config {proto!r} not in local cache; "
                f"using explicit keys/defaults"
            )
    return block_cfg, None


def resolve_block_config(block_cfg) -> dict:
    return resolve_block(block_cfg)[0]


def _hf_torch_state_dict(name: str, causal: bool):
    """Load the torch state dict of a locally cached HF model (None if absent).
    The reference's equivalents: ``AutoModelForCausalLM.from_pretrained(name,
    add_cross_attention=True)`` (RRG_HF.py:90, decoder_model.py:15-21) and
    ``AutoModel.from_pretrained(name)`` (encoder_model.py:19-35)."""
    try:
        from transformers import AutoModel, AutoModelForCausalLM

        if causal:
            m = AutoModelForCausalLM.from_pretrained(
                name, local_files_only=True, is_decoder=True,
                add_cross_attention=True,
            )
        else:
            m = AutoModel.from_pretrained(name, local_files_only=True)
    except Exception:
        return None
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


class TaskModel:
    module = None
    eval_func = None
    #: subtree name -> (pretrained hf name, "causal" | "encoder"); populated by
    #: constructors when a block's ``proto`` is a locally cached pretrained name
    _pretrained_blocks: Dict = {}
    #: top-level param subtrees whose weights are frozen (stop_gradient'd in
    #: the module). The Trainor excludes them from the optimizer via
    #: optax.multi_transform — the TPU-native analog of torch skipping
    #: requires_grad=False params: no m/v slots allocated (a DINOv2-base
    #: tower's adam state is ~690 MB) and no zero-grad update traffic.
    frozen_prefixes: tuple = ()

    def init_variables(self, rng, batch) -> Dict:
        raise NotImplementedError

    def apply_train(self, variables, batch, rng, train: bool = True):
        raise NotImplementedError

    def load_pretrained(self, variables, logger=None) -> Dict:
        """Overlay locally cached pretrained HF weights recorded by the ctor
        onto freshly initialized variables (reference loads pretrained modules
        directly, RRG_HF.py:18-115; here weights convert through zoo/convert)."""
        blocks = self._pretrained_blocks
        if not blocks:
            return variables
        from ..zoo.convert import (
            convert_hf_causal_lm, convert_hf_text_encoder, overlay_params,
        )

        params = dict(variables["params"])
        for key, (name, kind) in blocks.items():
            if key not in params:
                continue
            sd = _hf_torch_state_dict(name, causal=(kind == "causal"))
            if sd is None:
                if logger is not None:
                    logger.warning(
                        f"Pretrained weights for {name!r} not in the local HF "
                        f"cache; {key} keeps random init"
                    )
                continue
            if kind == "vit":
                from ..zoo.convert_vision import convert_hf_vit

                conv = {"model": convert_hf_vit(sd)}  # VisualEncoder.model
            elif kind == "dinov2":
                from ..zoo.convert_vision import convert_hf_dinov2

                # the checkpoint's position grid re-interpolates to this
                # model's static grid (inferred from the initialized params —
                # convert_vision.interpolate_pos_grid, torch-bicubic-exact)
                tgt = None
                try:
                    tgt = int(
                        np.shape(params[key]["model"]["pos_embed"])[1]
                    )
                except (KeyError, TypeError):
                    pass
                conv = {"model": convert_hf_dinov2(sd, target_tokens=tgt)}
            elif kind == "causal":
                conv = convert_hf_causal_lm(sd)
            else:
                conv = convert_hf_text_encoder(sd)
            params[key] = overlay_params(params[key], conv, logger, key)
            if logger is not None:
                logger.info(f"Loaded pretrained {name} weights into {key!r}")
        variables = dict(variables)
        variables["params"] = params
        return variables

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
