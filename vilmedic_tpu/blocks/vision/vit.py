"""Flax Vision Transformer (patch embed + CLS token + transformer encoder).

Architectural parity with the HF ``ViTModel`` path in the reference
(reference visual_encoder.py:56-58): returns the last hidden state
(B, 1 + num_patches, D) with no permute applied downstream.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..transformer import EncoderLayer, FeedForward, MultiHeadAttention, TransformerConfig


class ViTLayer(nn.Module):
    """Pre-LayerNorm transformer layer (HF ``ViTLayer`` residual structure:
    ``x += attn(ln_before(x)); x += mlp(ln_after(x))``) — required for
    pretrained HF ViT weight parity (the BERT-style EncoderLayer is post-LN)."""

    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.ln_before = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                                      name="ln_before")
        self.self_attn = MultiHeadAttention(cfg, cross=False, name="self_attn")
        self.ln_after = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                                     name="ln_after")
        self.ffn = FeedForward(cfg, name="ffn")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, x, deterministic=True):
        # train= threads the FLASH_MIN_LEN_TRAIN routing through the attention
        # (same as EncoderLayer/DecoderLayer): trainable pre-LN towers at
        # 512 <= T < 1024 (e.g. 336px/16, 384px/14) otherwise keep the dense
        # path in train and miss the measured fused-backward win (ADVICE r4)
        attn, _ = self.self_attn(self.ln_before(x), train=not deterministic)
        x = x + self.dropout(attn, deterministic=deterministic)
        x = x + self.ffn(self.ln_after(x), deterministic=deterministic)
        return x


class ViT(nn.Module):
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    image_size: int = 224
    hidden_dropout_prob: float = 0.0
    layer_norm_eps: float = 1e-12
    #: "gelu" (exact erf, HF-pretrained-weight parity) | "gelu_tanh"
    #: (tanh approx, |Δ| < 1e-3, cheaper on the VPU — docs/performance.md)
    hidden_act: str = "gelu"
    #: pre-LN layers (HF ViT residual structure); default post-LN (BERT-style)
    pre_ln: bool = False
    #: remat each layer (jax.checkpoint). Measured on v5e (batch 64 train):
    #: the un-remat fc1 fusions write TWO (B, 197, 3072) bf16 residual
    #: tensors per layer for the backward (~155 MB/layer) and run at ~44%
    #: MXU. Full remat (True) recomputes the MATMULS too and measured a NET
    #: LOSS at bench shapes (586 -> 496 samples/s, experiments/ab_vit_mfu.py)
    #: — its value is purely activation memory. "dots" remats with
    #: jax.checkpoint_policies.dots_with_no_batch_dims_saveable: matmul
    #: outputs are SAVED, only the elementwise chain (LN/GELU/softmax/dropout
    #: masks) is recomputed — the residual-write savings without the matmul
    #: recompute (docs/performance.md).
    gradient_checkpointing: Any = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = TransformerConfig(
            vocab_size=1,
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=self.intermediate_size,
            hidden_dropout_prob=self.hidden_dropout_prob,
            layer_norm_eps=self.layer_norm_eps,
            hidden_act=self.hidden_act,
            dtype=self.dtype,
        )
        b = x.shape[0]
        # Patchify: conv with patch-size kernel/stride (MXU-friendly big matmul).
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
            "cls_token", nn.initializers.zeros, (1, 1, self.hidden_size), jnp.float32
        )
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), x], axis=1)
        num_tokens = x.shape[1]
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, num_tokens, self.hidden_size),
            jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        x = nn.Dropout(self.hidden_dropout_prob)(x, deterministic=not train)
        layer_cls = ViTLayer if self.pre_ln else EncoderLayer
        if self.gradient_checkpointing:
            from ..transformer import _remat_policy

            policy = _remat_policy(self.gradient_checkpointing)
            if self.pre_ln:
                layer_cls = nn.remat(ViTLayer, static_argnums=(2,), policy=policy)
            else:
                layer_cls = nn.remat(EncoderLayer, static_argnums=(3,), policy=policy)
        for i in range(self.num_hidden_layers):
            if self.pre_ln:
                x = layer_cls(cfg, name=f"layer_{i}")(x, not train)
            else:
                x = layer_cls(cfg, name=f"layer_{i}")(x, None, not train)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="ln_final")(x)
        return x


def make_vit(backbone: str, output_layer=None, dtype=jnp.float32, **kwargs) -> ViT:
    known = {
        "hidden_size", "num_hidden_layers", "num_attention_heads", "intermediate_size",
        "patch_size", "image_size", "hidden_dropout_prob", "layer_norm_eps", "pre_ln",
        "gradient_checkpointing", "hidden_act",
    }
    return ViT(dtype=dtype, **{k: v for k, v in kwargs.items() if k in known})
