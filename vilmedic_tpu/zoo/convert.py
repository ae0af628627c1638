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


def _find_base_prefix(sd: Dict) -> str:
    for k in sd:
        i = k.find("embeddings.word_embeddings.weight")
        if i >= 0:
            return k[:i]
    raise KeyError("no word_embeddings in state dict")


def _embeddings_general(sd: Dict, prefix: str, position_offset: int = 0,
                        keep_token_type: bool = False) -> Dict:
    """BERT/RoBERTa embeddings -> native embeddings params.

    - token-type embeddings: for targets without a token-type table
      (``blocks.transformer.Embeddings``) row 0 is folded into the word
      embeddings — single-segment input adds it uniformly BEFORE the
      LayerNorm, so ``word += token_type[0]`` is exact. Targets that model
      segments (``scorers.chexbert.BertEmbeddings``) pass
      ``keep_token_type=True`` to keep the table as its own param;
    - RoBERTa's position ids start at ``padding_idx + 1`` (= 2): shifting the
      position table by the offset reproduces HF rows for left-aligned
      (generation) sequences exactly.
    """
    word = _a(sd[f"{prefix}word_embeddings.weight"]).astype(np.float32).copy()
    tt = sd.get(f"{prefix}token_type_embeddings.weight")
    out: Dict = {}
    if keep_token_type:
        out["token_type_embeddings"] = {
            "embedding": _a(tt) if tt is not None
            else np.zeros((2, word.shape[1]), np.float32)
        }
    elif tt is not None:
        word = word + _a(tt)[0][None, :]
    pos = _a(sd[f"{prefix}position_embeddings.weight"]).astype(np.float32)
    if position_offset:
        pos = np.concatenate(
            [pos[position_offset:],
             np.zeros((position_offset, pos.shape[1]), pos.dtype)], axis=0
        )
    out.update({
        "word_embeddings": {"embedding": word},
        "position_embeddings": {"embedding": pos},
        "ln": {"scale": _a(sd[f"{prefix}LayerNorm.weight"]),
               "bias": _a(sd[f"{prefix}LayerNorm.bias"])},
    })
    return out


def _num_layers(sd: Dict, layer_prefix: str) -> int:
    return 1 + max(
        int(k[len(layer_prefix):].split(".")[0])
        for k in sd if k.startswith(layer_prefix)
    )


def convert_hf_causal_lm(
    state_dict: Dict, position_offset: int = None
) -> Dict:
    """Any HF BERT-family causal LM (BertGenerationDecoder, RobertaForCausalLM,
    BertLMHeadModel) -> native ``TransformerDecoder`` params.

    Replaces the reference's ``AutoModelForCausalLM.from_pretrained(name,
    add_cross_attention=True)`` path (reference RRG_HF.py:90,
    decoder_model.py:15-21) for loading pretrained weights into the TPU-native
    decoder. BERT/RoBERTa prediction heads (dense+act+LN before the vocab
    projection) map to ``lm_transform``/``lm_transform_ln`` — build the decoder
    with ``lm_head_transform=True`` for these.
    """
    sd = dict(state_dict)
    base = _find_base_prefix(sd)  # "bert." / "roberta." / ""
    if position_offset is None:
        position_offset = 2 if base.startswith("roberta") else 0
    layer_prefix = f"{base}encoder.layer."
    n_layers = _num_layers(sd, layer_prefix)
    params: Dict = {
        "embeddings": _embeddings_general(sd, f"{base}embeddings.", position_offset)
    }
    for i in range(n_layers):
        params[f"layer_{i}"] = _layer_params(sd, f"{base}encoder.layer.{i}")

    word_key = f"{base}embeddings.word_embeddings.weight"
    vocab = np.asarray(sd[word_key]).shape[0]
    if "lm_head.dense.weight" in sd:  # RobertaLMHead
        params["lm_transform"] = {"kernel": _t(sd["lm_head.dense.weight"]),
                                  "bias": _a(sd["lm_head.dense.bias"])}
        params["lm_transform_ln"] = {"scale": _a(sd["lm_head.layer_norm.weight"]),
                                     "bias": _a(sd["lm_head.layer_norm.bias"])}
        w = sd.get("lm_head.decoder.weight", sd[word_key])
        b = sd.get("lm_head.decoder.bias", sd.get("lm_head.bias"))
    elif "cls.predictions.transform.dense.weight" in sd:  # BertLMPredictionHead
        params["lm_transform"] = {
            "kernel": _t(sd["cls.predictions.transform.dense.weight"]),
            "bias": _a(sd["cls.predictions.transform.dense.bias"])}
        params["lm_transform_ln"] = {
            "scale": _a(sd["cls.predictions.transform.LayerNorm.weight"]),
            "bias": _a(sd["cls.predictions.transform.LayerNorm.bias"])}
        w = sd.get("cls.predictions.decoder.weight", sd[word_key])
        b = sd.get("cls.predictions.decoder.bias", sd.get("cls.predictions.bias"))
    else:  # BertGenerationOnlyLMHead: bare (tied) Linear
        w = sd.get("lm_head.decoder.weight", sd[word_key])
        b = sd.get("lm_head.decoder.bias", sd.get("lm_head.bias"))
    params["lm_head"] = {
        "kernel": _t(w),
        "bias": _a(b) if b is not None else np.zeros((vocab,), np.float32),
    }
    return params


def convert_hf_text_encoder(state_dict: Dict, position_offset: int = None) -> Dict:
    """Any HF BERT-family encoder (BertModel/RobertaModel/BertGenerationEncoder)
    -> native ``TransformerEncoder`` params (reference encoder_model.py:19-35
    ``AutoModel.from_pretrained``). The pooler (unused by RRS) is dropped."""
    sd = dict(state_dict)
    base = _find_base_prefix(sd)
    if position_offset is None:
        position_offset = 2 if base.startswith("roberta") else 0
    params: Dict = {
        "embeddings": _embeddings_general(sd, f"{base}embeddings.", position_offset)
    }
    layer_prefix = f"{base}encoder.layer."
    for i in range(_num_layers(sd, layer_prefix)):
        params[f"layer_{i}"] = _layer_params(sd, f"{base}encoder.layer.{i}")
    return params


def overlay_params(dst: Dict, src: Dict, logger=None, path: str = "") -> Dict:
    """Overlay converted pretrained params onto an initialized tree, keeping the
    destination leaf wherever the source is missing or shape-mismatched (e.g. a
    rebuilt task vocab differing from the pretrained vocab)."""
    out = dict(dst)
    for k, v in src.items():
        here = f"{path}/{k}" if path else k
        if k not in dst:
            continue
        if isinstance(v, dict) and isinstance(dst[k], dict):
            out[k] = overlay_params(dst[k], v, logger, here)
        else:
            dv = dst[k]
            if tuple(np.shape(v)) == tuple(np.shape(dv)):
                out[k] = np.asarray(v).astype(np.asarray(dv).dtype)
            elif logger is not None:
                logger.warning(
                    f"pretrained weight {here} shape {np.shape(v)} != "
                    f"model {np.shape(dv)}; keeping random init"
                )
    return out


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
