"""Unified vision tower: backbone + truncation + projection + multi-image path.

Parity with reference vilmedic/blocks/vision/visual_encoder.py:86-235:
- any registered backbone (resnet*/densenet*/3d_densenet*/vit*) truncated at a
  named ``output_layer`` (``avgpool`` synthesized for densenets, reference :47-52);
- output permutes: ``batch_first`` -> (B, S, C) spatial tokens ((B, C) for pooled),
  ``spatial_first`` -> (S, B, C), ``no_permute`` raw;
- optional linear ``visual_projection`` applied in ``encode``;
- ``freeze`` stops gradients into the backbone (the functional analog of the
  reference's ``requires_grad=False`` + ``train()`` override, :121-124, 216-221);
- multi-image 5-D path (reference :160-178): flatten (B, N) into the batch, encode,
  zero masked images' features, concatenate per-image patch sequences into one
  cross-attention memory of (B, N*S, C) with a feature-level attention mask.

Inputs are NHWC (TPU-native convolution layout), not the reference's NCHW.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import register
from .densenet import make_densenet
from .resnet import STAGE_SIZES, make_resnet
from .vit import make_vit


def make_backbone(backbone: str, output_layer: Optional[str], dtype=jnp.float32, **kwargs):
    name = backbone.lower()
    if name in STAGE_SIZES:
        return make_resnet(name, output_layer or "avgpool", dtype=dtype)
    if name.startswith("densenet"):
        return make_densenet(
            name, output_layer or "features", spatial_dims=2, dtype=dtype, **kwargs
        )
    if name.startswith("3d_densenet"):
        return make_densenet(
            name, output_layer or "features", spatial_dims=3, dtype=dtype, **kwargs
        )
    if "dinov2" in name:
        from .dinov2 import make_dinov2

        return make_dinov2(name, output_layer, dtype=dtype, **kwargs)
    if "vit" in name or "deit" in name:
        return make_vit(name, output_layer, dtype=dtype, **kwargs)
    raise KeyError(f"Unknown vision backbone {backbone!r}")


@register("block")
class VisualEncoder(nn.Module):
    backbone: str
    permute: str = "batch_first"
    dropout_out: float = 0.0
    freeze: bool = False
    output_layer: Optional[str] = None
    projection_dim: Optional[int] = None  # visual_projection.out_features
    slice_encode: Optional[bool] = None
    slice_dim: Optional[int] = None
    backbone_kwargs: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        assert self.permute in ("batch_first", "spatial_first", "no_permute")
        self.model = make_backbone(
            self.backbone, self.output_layer, dtype=self.dtype, **(self.backbone_kwargs or {})
        )
        if self.projection_dim is not None:
            self.visual_projection = nn.Dense(
                self.projection_dim, dtype=self.dtype, param_dtype=jnp.float32,
                name="visual_projection",
            )
        else:
            self.visual_projection = None
        self.dropout = nn.Dropout(self.dropout_out)

    @property
    def is_3d(self) -> bool:
        return "3d" in self.backbone

    def _project(self, features):
        if self.visual_projection is not None:
            features = self.visual_projection(features)
        return features

    def __call__(self, images, train: bool = False):
        """Backbone forward + permute (reference :183-214)."""
        train = train and not self.freeze
        out = self.model(images, train=train)
        if self.freeze:
            out = jax.lax.stop_gradient(out)
        name = self.backbone.lower()
        if "vit" in name or "deit" in name or "dinov2" in name:
            return self.dropout(out, deterministic=not train)

        out = self.dropout(out, deterministic=not train)
        if self.permute == "no_permute":
            return out
        if out.ndim == 2:  # pooled (B, C) — 'avgpool' squeezed case
            return out
        b = out.shape[0]
        c = out.shape[-1]
        tokens = out.reshape(b, -1, c)  # NHWC -> (B, S, C): spatial flatten
        if self.permute == "batch_first":
            if tokens.shape[1] == 1:
                return tokens.squeeze(1)
            return tokens
        # spatial_first
        return jnp.transpose(tokens, (1, 0, 2))

    def encode(self, images, images_mask=None, train: bool = False):
        """(features, features_mask) for generation (reference :127-181)."""
        if images.ndim == 4:
            features = self(images, train=train)
            features_mask = jnp.sum(jnp.abs(features), axis=-1) != 0
            return self._project(features), features_mask

        assert images.ndim == 5, "wrong images shape"

        if self.slice_encode:
            # Per-slice encoding of a volume (reference :146-153). Works with a
            # 2-D backbone here (the reference restricted this to MONAI 3-D
            # nets); each slice becomes one feature vector.
            slice_dim = self.slice_dim if self.slice_dim is not None else 1
            n_slices = images.shape[slice_dim]
            outs = [
                self(jnp.take(images, i, axis=slice_dim), train=train)
                for i in range(n_slices)
            ]
            features = jnp.stack(outs, axis=1)
            features_mask = jnp.sum(jnp.abs(features), axis=-1) != 0
            return self._project(features), features_mask

        if self.is_3d:
            features = self(images, train=train)
            features_mask = jnp.sum(jnp.abs(features), axis=-1) != 0
            return self._project(features), features_mask

        # Multi-image: (B, N, H, W, C) -> (B*N, H, W, C)
        b, n = images.shape[:2]
        flat = images.reshape((b * n,) + images.shape[2:])
        features = self(flat, train=train)
        if features.ndim <= 2:
            raise ValueError(
                "The input size is too small for this model: spatial dim shrunk to 1."
            )
        s, c = features.shape[-2], features.shape[-1]
        features = features.reshape(b, n, s, c)
        if images_mask is not None:
            features = features * images_mask[:, :, None, None].astype(features.dtype)
        features = features.reshape(b, n * s, c)
        features_mask = jnp.sum(jnp.abs(features), axis=-1) != 0
        return self._project(features), features_mask


def build_visual_encoder(cfg, dtype=jnp.float32) -> VisualEncoder:
    """Build from a reference-style ``cnn:`` config block
    (e.g. config/RRG/biomed-roberta-baseline-mimic.yml: backbone/output_layer/
    dropout_out/permute/visual_projection/freeze)."""
    from ...config.config import Config

    if isinstance(cfg, Config):
        cfg = cfg.to_dict()
    cfg = dict(cfg)
    cfg.pop("proto", None)
    vp = cfg.pop("visual_projection", None)
    projection_dim = vp.get("out_features") if isinstance(vp, dict) else None
    known = {"backbone", "permute", "dropout_out", "freeze", "output_layer",
             "slice_encode", "slice_dim"}
    extra = {k: v for k, v in cfg.items() if k not in known and k != "pretrained"}
    return VisualEncoder(
        **{k: v for k, v in cfg.items() if k in known},
        projection_dim=projection_dim,
        backbone_kwargs=extra or None,
        dtype=dtype,
    )
