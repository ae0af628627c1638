"""HF-surface model protos: RRG_HF and RRS_HF.

Parity with reference vilmedic/models/rrg/RRG_HF.py:18-177 and rrs/RRS_HF.py:
the reference builds HF ``VisionEncoderDecoderModel`` / ``EncoderDecoderModel``
from ``proto_model``/``proto_config``/``proto_config_args`` mapping-name lookups,
injects tokenizer special ids into the decoder config, adds an encoder->decoder
projection when hidden sizes differ, and supports the multi-image 5-D path
(flatten B*N crops -> encode -> concat patch sequences -> patch-level attention
mask -> decoder, RRG_HF.py:116-152).

TPU-native mapping: the same config surface constructs the native Flax ViT
encoder + cross-attention decoder (RRG_HF) or text encoder + decoder (RRS_HF);
the multi-image path is the VisualEncoder 5-D branch (visual_encoder.py here),
whose concat-patches + mask semantics match RRG_HF's. Pretrained HF text
weights (decoder/encoder given as name strings) load from the local HF cache
through zoo/convert (see models/base.TaskModel.load_pretrained); pretrained
configs resolve the architecture either way.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from .. import registry
from ..blocks.transformer import TransformerConfig
from ..blocks.vision.visual_encoder import VisualEncoder
from ..config.config import Config
from .base import TaskModel
from .evaluation_nlg import evaluation
from .rrg import RRGModule
from .rrs import RRS


def _d(cfg):
    if isinstance(cfg, Config):
        return cfg.to_dict()
    return dict(cfg or {})


def _resolve_hf_config(name: str) -> Dict:
    """Pull a config dict for a pretrained name — local HF cache first, network
    only as a fallback (never when VILMEDIC_OFFLINE is set)."""
    from transformers import AutoConfig

    try:
        return AutoConfig.from_pretrained(name, local_files_only=True).to_dict()
    except Exception:
        from ..constants import offline_mode

        if offline_mode():
            raise RuntimeError(
                f"HF config {name!r} not in the local cache and VILMEDIC_OFFLINE "
                f"is set — pre-populate the cache or unset the env var."
            )
        return AutoConfig.from_pretrained(name).to_dict()


def _config_args(section: Dict) -> Dict:
    """Extract config args from a ``proto_model/proto_config/proto_config_args``
    block or a pretrained name string (reference RRG_HF.py:30-52)."""
    if isinstance(section, str):
        return _resolve_hf_config(section)
    section = _d(section)
    args = _d(section.get("proto_config_args") or {})
    return args


@registry.register("model")
class RRG_HF(TaskModel):
    def __init__(self, encoderdecoder=None, decoder=None, vision=None, dl=None,
                 logger=None, from_training=True, dtype="float32", **kwargs):
        assert (encoderdecoder is None) != (decoder is None or vision is None), (
            "Either proto should be provided, or both decoder and vision "
            "should be provided."
        )
        compute_dtype = jnp.bfloat16 if str(dtype) in ("bfloat16", "bf16") else jnp.float32

        self._pretrained_blocks = {}
        if encoderdecoder is not None:
            full = _resolve_hf_config(encoderdecoder)
            vision_args = full.get("encoder", {})
            decoder_args = full.get("decoder", {})
        else:
            vision_args = _config_args(vision)
            decoder_args = _config_args(decoder)
            if isinstance(decoder, str):
                # pretrained decoder name: weights load post-init (ref :90)
                self._pretrained_blocks["dec"] = (decoder, "causal")
            if isinstance(vision, str) and vision_args.get("model_type") == "vit":
                # pretrained HF ViT: build the pre-LN tower and load weights
                vision_args = dict(vision_args, pre_ln=True)
                self._pretrained_blocks["enc"] = (vision, "vit")

        # tokenizer special ids injected into the decoder config (reference :72-78)
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
            decoder_args, **tok_overrides, add_cross_attention=True,
            dtype=compute_dtype,
        )
        enc_hidden = vision_args.get("hidden_size", 768)
        # enc->dec projection when hidden sizes differ (reference :135-139)
        projection = (
            self.dec_config.hidden_size if enc_hidden != self.dec_config.hidden_size
            else None
        )
        enc = VisualEncoder(
            backbone="vit",
            permute="no_permute",
            projection_dim=projection,
            backbone_kwargs={
                k: v for k, v in vision_args.items()
                if k in ("hidden_size", "num_hidden_layers", "num_attention_heads",
                         "intermediate_size", "patch_size", "image_size",
                         "hidden_dropout_prob", "layer_norm_eps", "pre_ln")
            },
            dtype=compute_dtype,
        )
        self.module = RRGModule(enc=enc, dec_config=self.dec_config)
        self.eval_func = evaluation  # == vision_multi semantics
        self.variables: Optional[Dict] = None

    def init_variables(self, rng, batch):
        from .rrg import RRG as _RRG

        return _RRG.init_variables(self, rng, batch)

    def apply_train(self, variables, batch, rng, train: bool = True):
        from .rrg import RRG as _RRG

        return _RRG.apply_train(self, variables, batch, rng, train)

    def encoder_inputs(self, batch):
        return {"images": batch["images"], "images_mask": batch.get("images_mask")}

    def __repr__(self):
        return "model: RRG_HF (ViT VisionEncoderDecoder, native)"


@registry.register("model")
class RRS_HF(RRS):
    """HF ``EncoderDecoderModel`` surface over the native RRS module
    (reference vilmedic/models/rrs/RRS_HF.py, forward :136-166)."""

    def __init__(self, encoderdecoder=None, encoder=None, decoder=None, dl=None,
                 logger=None, from_training=True, dtype="float32", **kwargs):
        if encoderdecoder is not None:
            full = _resolve_hf_config(encoderdecoder)
            encoder_args = full.get("encoder", {})
            decoder_args = full.get("decoder", {})
        else:
            # string names pass through as ``proto`` so RRS records them for
            # pretrained weight loading (reference RRS_HF pretrained path)
            encoder_args = (
                {"proto": encoder} if isinstance(encoder, str) else _config_args(encoder)
            )
            decoder_args = (
                {"proto": decoder} if isinstance(decoder, str) else _config_args(decoder)
            )
        super().__init__(
            encoder=encoder_args, decoder=decoder_args, dl=dl, logger=logger,
            from_training=from_training, dtype=dtype, **kwargs,
        )

    def __repr__(self):
        return "model: RRS_HF (EncoderDecoder, native)"
