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


def convert_reference_rrg(
    model_state: Dict, num_layers: int, backbone: str = "densenet169"
) -> Dict:
    """Reference RRG ``.pth`` model state dict -> ``{"params", "batch_stats"}``.

    - decoder ``dec.decoder.*`` (BertGenerationDecoder) converts exactly;
    - vision tower ``enc.model.*`` (torchvision module wrapped in a truncating
      Sequential, reference visual_encoder.py:71-83) converts through
      ``convert_vision``;
    - ``enc.visual_projection`` converts as a Dense.
    """
    from .convert_vision import convert_densenet, convert_resnet

    dec_sd = {k[len("dec.decoder."):]: v for k, v in model_state.items()
              if k.startswith("dec.decoder.")}
    params: Dict = {"dec": convert_bert_generation_decoder(dec_sd, num_layers)}
    batch_stats: Dict = {}

    # vision tower: undo the truncating-Sequential renaming. DenseNet
    # truncation keeps named children inside index 0 ('0.conv0.*'); ResNet
    # truncation flattens top-level modules to bare indices.
    raw = {k[len("enc.model."):]: v for k, v in model_state.items()
           if k.startswith("enc.model.")}
    vision_sd = {}
    if raw:
        is_dense = any("denseblock" in k for k in raw)
        if is_dense:
            for k, v in raw.items():
                parts = k.split(".", 1)
                rest = parts[1] if parts[0].isdigit() and len(parts) > 1 else k
                vision_sd[f"features.{rest}"] = v
            vp, vs = convert_densenet(vision_sd, backbone)
        else:
            resnet_seq = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
                          "6": "layer3", "7": "layer4"}
            for k, v in raw.items():
                parts = k.split(".", 1)
                head = resnet_seq.get(parts[0], parts[0])
                vision_sd[head + ("." + parts[1] if len(parts) > 1 else "")] = v
            vp, vs = convert_resnet(vision_sd, backbone)
        params["enc"] = {"model": vp}
        batch_stats["enc"] = {"model": vs}

    vp_w = model_state.get("enc.visual_projection.weight")
    if vp_w is not None:
        params.setdefault("enc", {})["visual_projection"] = {
            "kernel": _t(vp_w),
            "bias": _a(model_state["enc.visual_projection.bias"]),
        }
    return {"params": params, "batch_stats": batch_stats}
