"""Reference/HF checkpoint -> Flax parameter conversion.

The reference's model zoo ships torch ``.pth`` checkpoints whose decoder/encoder
are HF BertGeneration modules (reference zoo/modeling_auto.py:55-117,
blocks/huggingface/decoder/decoder_model.py:8-53). This module maps those state
dicts onto the native Flax modules so reference-trained weights load directly —
the migration path for users switching frameworks (SURVEY.md §7 hard part #5).

Covered:
- ``convert_bert_generation_decoder``: HF BertGenerationDecoder ->
  ``blocks.transformer.TransformerDecoder`` params (numeric-parity tested);
- ``convert_bert_generation_encoder``: HF BertGenerationEncoder ->
  ``TransformerEncoder`` params;
- ``convert_reference_rrg``: a reference RRG ``.pth`` ``model`` state dict
  (``dec.decoder.*`` + ``enc.*``) -> RRG module params (vision tower conversion
  requires the torchvision layout and is mapped name-wise where possible).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(np.asarray(w).T)


def _a(w) -> np.ndarray:
    return np.asarray(w)


def _layer_params(sd: Dict, prefix: str) -> Dict:
    """One BertGeneration layer -> one ``DecoderLayer``/``EncoderLayer`` tree."""
    p = {
        "self_attn": {
            "q": {"kernel": _t(sd[f"{prefix}.attention.self.query.weight"]),
                  "bias": _a(sd[f"{prefix}.attention.self.query.bias"])},
            "k": {"kernel": _t(sd[f"{prefix}.attention.self.key.weight"]),
                  "bias": _a(sd[f"{prefix}.attention.self.key.bias"])},
            "v": {"kernel": _t(sd[f"{prefix}.attention.self.value.weight"]),
                  "bias": _a(sd[f"{prefix}.attention.self.value.bias"])},
            "o": {"kernel": _t(sd[f"{prefix}.attention.output.dense.weight"]),
                  "bias": _a(sd[f"{prefix}.attention.output.dense.bias"])},
        },
        "self_ln": {"scale": _a(sd[f"{prefix}.attention.output.LayerNorm.weight"]),
                    "bias": _a(sd[f"{prefix}.attention.output.LayerNorm.bias"])},
        "ffn": {
            "fc1": {"kernel": _t(sd[f"{prefix}.intermediate.dense.weight"]),
                    "bias": _a(sd[f"{prefix}.intermediate.dense.bias"])},
            "fc2": {"kernel": _t(sd[f"{prefix}.output.dense.weight"]),
                    "bias": _a(sd[f"{prefix}.output.dense.bias"])},
        },
        "ffn_ln": {"scale": _a(sd[f"{prefix}.output.LayerNorm.weight"]),
                   "bias": _a(sd[f"{prefix}.output.LayerNorm.bias"])},
    }
    if f"{prefix}.crossattention.self.query.weight" in sd:
        p["cross_attn"] = {
            "q": {"kernel": _t(sd[f"{prefix}.crossattention.self.query.weight"]),
                  "bias": _a(sd[f"{prefix}.crossattention.self.query.bias"])},
            "k": {"kernel": _t(sd[f"{prefix}.crossattention.self.key.weight"]),
                  "bias": _a(sd[f"{prefix}.crossattention.self.key.bias"])},
            "v": {"kernel": _t(sd[f"{prefix}.crossattention.self.value.weight"]),
                  "bias": _a(sd[f"{prefix}.crossattention.self.value.bias"])},
            "o": {"kernel": _t(sd[f"{prefix}.crossattention.output.dense.weight"]),
                  "bias": _a(sd[f"{prefix}.crossattention.output.dense.bias"])},
        }
        p["cross_ln"] = {
            "scale": _a(sd[f"{prefix}.crossattention.output.LayerNorm.weight"]),
            "bias": _a(sd[f"{prefix}.crossattention.output.LayerNorm.bias"]),
        }
    return p


def _embeddings(sd: Dict, prefix: str) -> Dict:
    return {
        "word_embeddings": {"embedding": _a(sd[f"{prefix}.word_embeddings.weight"])},
        "position_embeddings": {
            "embedding": _a(sd[f"{prefix}.position_embeddings.weight"])
        },
        "ln": {"scale": _a(sd[f"{prefix}.LayerNorm.weight"]),
               "bias": _a(sd[f"{prefix}.LayerNorm.bias"])},
    }


def convert_bert_generation_decoder(state_dict: Dict, num_layers: int) -> Dict:
    """HF ``BertGenerationDecoder.state_dict()`` -> TransformerDecoder params."""
    sd = {k: v for k, v in state_dict.items()}
    params = {"embeddings": _embeddings(sd, "bert.embeddings")}
    for i in range(num_layers):
        params[f"layer_{i}"] = _layer_params(sd, f"bert.encoder.layer.{i}")
    # BertGenerationOnlyLMHead: decoder Linear (tied to embeddings) + bias
    weight_key = ("lm_head.decoder.weight" if "lm_head.decoder.weight" in sd
                  else "bert.embeddings.word_embeddings.weight")
    bias = sd.get("lm_head.decoder.bias", sd.get("lm_head.bias"))
    params["lm_head"] = {"kernel": _t(sd[weight_key]), "bias": _a(bias)}
    return params


def convert_bert_generation_encoder(state_dict: Dict, num_layers: int) -> Dict:
    """HF ``BertGenerationEncoder.state_dict()`` -> TransformerEncoder params."""
    sd = {k: v for k, v in state_dict.items()}
    params = {"embeddings": _embeddings(sd, "embeddings")}
    for i in range(num_layers):
        params[f"layer_{i}"] = _layer_params(sd, f"encoder.layer.{i}")
    return params


def convert_reference_rrg(model_state: Dict, num_layers: int) -> Dict:
    """Reference RRG ``.pth`` model state dict -> partial RRG params.

    The decoder (``dec.decoder.*``) converts exactly; the vision tower uses the
    torchvision layout and converts name-wise for the linear projection
    (``enc.visual_projection``); conv/BN tensors require the torchvision module
    order and are left to a future round (documented gap).
    """
    dec_sd = {k[len("dec.decoder."):]: v for k, v in model_state.items()
              if k.startswith("dec.decoder.")}
    out = {"dec": convert_bert_generation_decoder(dec_sd, num_layers)}
    vp_w = model_state.get("enc.visual_projection.weight")
    if vp_w is not None:
        out["enc"] = {
            "visual_projection": {
                "kernel": _t(vp_w),
                "bias": _a(model_state["enc.visual_projection.bias"]),
            }
        }
    return out
