"""Flax DINOv2 vision tower (LayerScale pre-LN ViT, no pooler).

Parity target: HF ``Dinov2Model`` / ``Dinov2Backbone`` — the frozen vision
tower of the reference's second-generation flagship
(reference hf_trainer/models/vision_language_modernbert/model.py:15
``IAMJB/maira-2-dinov2`` via ``AutoBackbone``, instantiated at :46).

Differences from the plain ViT in ``vit.py``:
- **LayerScale**: each residual branch is scaled by a learned per-channel
  ``lambda1`` (``x += ls1 * attn(norm1(x)); x += ls2 * mlp(norm2(x))``);
- MLP width is ``int(hidden_size * mlp_ratio)`` (SwiGLU variant supported);
- final LayerNorm, **no CLS pooler**;
- the position grid is **interpolatable**: checkpoints trained at one
  resolution load at another. HF re-interpolates bicubically on every forward
  (modeling_dinov2.py ``interpolate_pos_encoding``); TPU-first we bake the
  interpolation ONCE at weight-conversion time (the grid is static per
  config) — see ``zoo/convert_vision.interpolate_pos_grid`` — so the forward
  is a pure add with no resize op in the compiled graph.

Outputs the full (B, 1 + S, D) hidden state after the final LayerNorm (the
``Dinov2Model`` contract). Backbone consumers (the VisionLanguage prefix)
drop the CLS token — HF's ``Dinov2Backbone`` does the same slice
(modeling_dinov2.py:669).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..transformer import FeedForward, MultiHeadAttention, TransformerConfig


class SwiGLUFFN(nn.Module):
    """HF ``Dinov2SwiGLUFFN``: ``out(silu(x1) * x2)`` with the 2/3-ratio,
    8-aligned hidden width."""

    config: TransformerConfig
    hidden_features: int

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        h = nn.Dense(2 * self.hidden_features, dtype=cfg.dtype,
                     param_dtype=jnp.float32, name="weights_in")(x)
        x1, x2 = jnp.split(h, 2, axis=-1)
        h = nn.silu(x1) * x2
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                        param_dtype=jnp.float32, name="weights_out")(h)


class DinoLayer(nn.Module):
    """Pre-LN transformer layer with LayerScale (HF ``Dinov2Layer``)."""

    config: TransformerConfig
    use_swiglu_ffn: bool = False
    mlp_hidden: int = 0

    def setup(self):
        cfg = self.config
        self.ln_before = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                                      name="ln_before")
        self.self_attn = MultiHeadAttention(cfg, cross=False, name="self_attn")
        self.ls1 = self.param("ls1", nn.initializers.ones, (cfg.hidden_size,),
                              jnp.float32)
        self.ln_after = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                                     name="ln_after")
        if self.use_swiglu_ffn:
            self.ffn = SwiGLUFFN(cfg, hidden_features=self.mlp_hidden, name="ffn")
        else:
            self.ffn = FeedForward(cfg, name="ffn")
        self.ls2 = self.param("ls2", nn.initializers.ones, (cfg.hidden_size,),
                              jnp.float32)
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, x, deterministic=True):
        # train= routes FLASH_MIN_LEN_TRAIN when the tower trains (freeze=False
        # at 518px/14 -> T=1370 >= 512); inference keeps FLASH_MIN_LEN routing
        attn, _ = self.self_attn(self.ln_before(x), train=not deterministic)
        x = x + self.dropout(attn, deterministic=deterministic) * self.ls1.astype(x.dtype)
        h = self.ffn(self.ln_after(x), deterministic=deterministic)
        return x + h * self.ls2.astype(x.dtype)


class Dinov2(nn.Module):
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 14
    image_size: int = 518
    hidden_dropout_prob: float = 0.0
    layer_norm_eps: float = 1e-6
    use_swiglu_ffn: bool = False
    hidden_act: str = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mlp_hidden = int(self.hidden_size * self.mlp_ratio)
        cfg = TransformerConfig(
            vocab_size=1,
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=mlp_hidden,
            hidden_dropout_prob=self.hidden_dropout_prob,
            attention_probs_dropout_prob=0.0,
            layer_norm_eps=self.layer_norm_eps,
            hidden_act=self.hidden_act,
            dtype=self.dtype,
        )
        b = x.shape[0]
        x = nn.Conv(
            self.hidden_size,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(x)
        x = x.reshape(b, -1, self.hidden_size)

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02),
            (1, 1, self.hidden_size), jnp.float32,
        )
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, x.shape[1], self.hidden_size), jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        x = nn.Dropout(self.hidden_dropout_prob)(x, deterministic=not train)
        swiglu_hidden = (int(mlp_hidden * 2 / 3) + 7) // 8 * 8
        for i in range(self.num_hidden_layers):
            x = DinoLayer(
                cfg, use_swiglu_ffn=self.use_swiglu_ffn,
                mlp_hidden=swiglu_hidden, name=f"layer_{i}",
            )(x, deterministic=not train)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                            name="ln_final")(x)


def make_dinov2(backbone: str, output_layer=None, dtype=jnp.float32, **kwargs) -> Dinov2:
    known = {
        "hidden_size", "num_hidden_layers", "num_attention_heads", "mlp_ratio",
        "patch_size", "image_size", "hidden_dropout_prob", "layer_norm_eps",
        "use_swiglu_ffn", "hidden_act",
    }
    return Dinov2(dtype=dtype, **{k: v for k, v in kwargs.items() if k in known})
