"""Self-supervised contrastive pretraining: ConVIRT and GLoRIA.

Parity targets:
- ConVIRT (reference vilmedic/models/selfsup/conVIRT.py:46-110): text encoder +
  visual encoder + two 2-layer MLP projections, NT-Xent/InfoNCE loss, eval
  returning mean loss (+ embeddings at test time for t-SNE post-processing).
  The reference's ``forward_batch_size`` chunking (:83-98) exists to fit large
  contrastive batches in GPU memory; on TPU the full batch runs in bf16 in one
  XLA program, so the config key is accepted and ignored.
- GLoRIA (reference vilmedic/models/selfsup/GLoRIA.py:47-271): global+local
  contrastive learning. The reference grabs local CNN features with a forward
  hook on layer3 (:79); here the ResNet exposes ``capture_layer`` as an explicit
  second output — same features, no hooks. Sub-word aggregation over full words
  (:123-181) is implemented by ``_aggregate_words`` below: a static-shape
  segment-sum pools sub-word token embeddings into whole-word slots (parity
  asserted against a ragged numpy oracle in tests), and the masked local loss
  consumes the pooled words exactly as the reference does.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import registry
from ..blocks.transformer import TransformerConfig, TransformerEncoder
from ..blocks.vision.resnet import ResNet, STAGE_SIZES, BasicBlock, BottleneckBlock
from ..blocks.vision.visual_encoder import build_visual_encoder
from ..config.config import Config
from .base import TaskModel, resolve_block_config


def _d(cfg):
    if isinstance(cfg, Config):
        return cfg.to_dict()
    return dict(cfg or {})


# ---------------------------------------------------------------------------
# ConVIRT
# ---------------------------------------------------------------------------

class MLPProjection(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class ConVIRTModule(nn.Module):
    enc_config: TransformerConfig
    visual: nn.Module
    projection_dim: int

    def setup(self):
        cfg = self.enc_config
        self.linguistic = TransformerEncoder(cfg, name="linguistic")
        self.pooler = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="pooler")
        self.lin_proj = MLPProjection(self.projection_dim, cfg.dtype, name="lin_proj")
        self.vis_proj = MLPProjection(self.projection_dim, cfg.dtype, name="vis_proj")

    def __call__(self, input_ids, attention_mask, images, train: bool = False):
        hidden = self.linguistic(input_ids, attention_mask, deterministic=not train)
        pooled = nn.tanh(self.pooler(hidden[:, 0]))
        linguistic = self.lin_proj(pooled)
        v = self.visual(images, train=train)
        if v.ndim == 3:  # token outputs (ViT / feature maps) -> mean pool
            v = jnp.mean(v, axis=1)
        visual = self.vis_proj(v)
        return linguistic, visual


def convirt_evaluation(models, config, dl, from_training=True, **kwargs):
    """reference conVIRT.py:13-37: mean loss; embeddings when not from training."""
    model = models[0]

    @jax.jit
    def forward(variables, input_ids, attention_mask, images):
        out, _ = model.apply_train(
            variables,
            {"input_ids": input_ids, "attention_mask": attention_mask, "images": images},
            rng=None,
            train=False,
        )
        return out["loss"], out["linguistic"], out["visual"]

    losses, linguistics, visuals = [], [], []
    for batch in dl:
        loss, lin, vis = forward(
            model.variables, batch["input_ids"], batch["attention_mask"], batch["images"]
        )
        losses.append(float(loss))
        if not from_training:
            linguistics.append(np.asarray(lin))
            visuals.append(np.asarray(vis))

    if from_training:
        return {"loss": float(np.mean(losses))}
    return {
        "loss": float(np.mean(losses)),
        "linguistic": np.concatenate(linguistics),
        "visual": np.concatenate(visuals),
    }


@registry.register("model")
class ConVIRT(TaskModel):
    def __init__(self, encoder, cnn, projection, loss, forward_batch_size=None,
                 dl=None, logger=None, from_training=True, dtype="float32", **kwargs):
        compute_dtype = jnp.bfloat16 if str(dtype) in ("bfloat16", "bf16") else jnp.float32
        encoder = _d(encoder)
        projection = _d(projection)
        loss = _d(loss)

        vocab_size = dl.dataset.tokenizer.vocab_size if dl is not None else None
        self.enc_config = TransformerConfig.from_dict(
            resolve_block_config(encoder), **({"vocab_size": vocab_size} if vocab_size else {}),
            dtype=compute_dtype,
        )
        self.loss_fn = registry.get("loss", loss.pop("proto"))(**loss)
        if (cnn or {}).get("freeze"):
            self.frozen_prefixes = ("visual/model",)  # TaskModel.frozen_prefixes
        self.module = ConVIRTModule(
            enc_config=self.enc_config,
            visual=build_visual_encoder(cnn, dtype=compute_dtype),
            projection_dim=int(projection.get("projection_dim", 768)),
        )
        self.eval_func = convirt_evaluation
        self.variables: Optional[Dict] = None

    def init_variables(self, rng, batch):
        return self.module.init(
            {"params": rng, "dropout": rng},
            batch["input_ids"], batch["attention_mask"], batch["images"], train=False,
        )

    def apply_train(self, variables, batch, rng, train: bool = True):
        kwargs = {"train": train}
        if train and rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        has_stats = "batch_stats" in variables and variables["batch_stats"]
        if has_stats and train:
            kwargs["mutable"] = ["batch_stats"]
        out = self.module.apply(
            variables, batch["input_ids"], batch["attention_mask"], batch["images"],
            **kwargs,
        )
        new_stats = {}
        if has_stats and train:
            out, updated = out
            new_stats = updated.get("batch_stats", {})
        linguistic, visual = out
        loss_out = self.loss_fn(linguistic, visual)
        loss = loss_out[0] if isinstance(loss_out, tuple) else loss_out
        return {
            "loss": loss, "linguistic": linguistic, "visual": visual,
        }, new_stats

    def __repr__(self):
        return "model: ConVIRT"


# ---------------------------------------------------------------------------
# GLoRIA
# ---------------------------------------------------------------------------

class GLoRIAModule(nn.Module):
    enc_config: TransformerConfig
    backbone: str = "resnet50"
    local_layer: str = "layer3"
    feature_dim: int = 768

    def setup(self):
        cfg = self.enc_config
        sizes, kind = STAGE_SIZES[self.backbone]
        block = BasicBlock if kind == "basic" else BottleneckBlock
        self.cnn = ResNet(
            stage_sizes=sizes, block_cls=block, output_layer="avgpool",
            capture_layer=self.local_layer, dtype=cfg.dtype, name="cnn",
        )
        self.text_encoder = TransformerEncoder(cfg, name="text_encoder")
        self.global_embedder = nn.Dense(self.feature_dim, dtype=cfg.dtype, name="global_embedder")
        self.local_embedder = nn.Dense(self.feature_dim, dtype=cfg.dtype, name="local_embedder")
        self.word_embedder = nn.Dense(self.feature_dim, dtype=cfg.dtype, name="word_embedder")
        self.sent_embedder = nn.Dense(self.feature_dim, dtype=cfg.dtype, name="sent_embedder")

    def __call__(self, input_ids, attention_mask, images, train: bool = False):
        global_feat, local_map = self.cnn(images, train=train)
        b = local_map.shape[0]
        local_feat = self.local_embedder(local_map.reshape(b, -1, local_map.shape[-1]))
        global_feat = self.global_embedder(global_feat)

        hidden = self.text_encoder(input_ids, attention_mask, deterministic=not train)
        mask_f = attention_mask.astype(jnp.float32)
        pooled = jnp.sum(hidden * mask_f[:, :, None], axis=1) / jnp.clip(
            jnp.sum(mask_f, axis=1, keepdims=True), 1.0, None
        )
        return {
            "global_features": global_feat,
            "local_features": local_feat,
            "word_embeddings": self.word_embedder(hidden),
            "sent_embeddings": self.sent_embedder(pooled),
            "words_mask": mask_f,
        }


def gloria_evaluation(models, config, dl, from_training=True, **kwargs):
    model = models[0]

    @jax.jit
    def forward(variables, input_ids, attention_mask, images):
        out, _ = model.apply_train(
            variables,
            {"input_ids": input_ids, "attention_mask": attention_mask, "images": images},
            rng=None, train=False,
        )
        return out["loss"], out["global"], out["sent"]

    losses, visuals, linguistics = [], [], []
    for batch in dl:
        loss, vis, lin = forward(
            model.variables, batch["input_ids"], batch["attention_mask"], batch["images"]
        )
        losses.append(float(loss))
        if not from_training:
            visuals.append(np.asarray(vis))
            linguistics.append(np.asarray(lin))
    if from_training:
        return {"loss": float(np.mean(losses))}
    return {
        "loss": float(np.mean(losses)),
        "visual": np.concatenate(visuals),
        "linguistic": np.concatenate(linguistics),
    }


@registry.register("model")
class GLoRIA(TaskModel):
    def __init__(self, encoder=None, cnn=None, loss=None, dl=None, logger=None,
                 from_training=True, dtype="float32", aggregate_words=True, **kwargs):
        compute_dtype = jnp.bfloat16 if str(dtype) in ("bfloat16", "bf16") else jnp.float32
        encoder = _d(encoder)
        loss = _d(loss or {"proto": "GLoRIALoss"})
        cnn = _d(cnn or {})
        self.aggregate_words = bool(aggregate_words)

        vocab_size = dl.dataset.tokenizer.vocab_size if dl is not None else None
        self.enc_config = TransformerConfig.from_dict(
            resolve_block_config(encoder),
            **({"vocab_size": vocab_size} if vocab_size else {}),
            dtype=compute_dtype,
        )
        self.tokenizer = dl.dataset.tokenizer if dl is not None else None
        loss.pop("proto", None)
        from ..blocks.losses import GLoRIALoss

        self.loss_fn = GLoRIALoss(**loss)
        self.module = GLoRIAModule(
            enc_config=self.enc_config,
            backbone=cnn.get("backbone", "resnet50"),
            feature_dim=int(cnn.get("feature_dim", 768)),
        )
        self.eval_func = gloria_evaluation
        self.variables: Optional[Dict] = None
        # whole-word aggregation tables (reference aggregate_tokens,
        # GLoRIA.py:123-181): device constants built once from the tokenizer —
        # "##" continuation pieces merge into their word by segment-sum.
        self._cont_table = None
        self._drop_table = None
        if self.aggregate_words and self.tokenizer is not None:
            import numpy as _np

            vocab = self.tokenizer.vocab
            cont = _np.zeros((len(vocab),), bool)
            drop = _np.zeros((len(vocab),), bool)
            for tok, idx in vocab.items():
                if tok.startswith("##"):
                    cont[idx] = True
            for tok in (self.tokenizer.cls_token, self.tokenizer.pad_token):
                if tok in vocab:
                    drop[vocab[tok]] = True
            self._cont_table = jnp.asarray(cont)
            self._drop_table = jnp.asarray(drop)

    def _aggregate_words(self, word_emb, input_ids, attention_mask):
        """Sum wordpiece embeddings per whole word (static-shape: cumsum
        segment ids + one-hot einsum; [SEP] kept as its own word like the
        reference, [CLS]/[PAD] dropped). -> (agg_emb, word_mask)."""
        t = input_ids.shape[1]
        cont = self._cont_table[input_ids]
        keep = (~self._drop_table[input_ids]) & (attention_mask > 0)
        starts = (~cont) & keep
        word_ids = jnp.cumsum(starts.astype(jnp.int32), axis=1) - 1
        valid = keep & (word_ids >= 0)
        oh = jax.nn.one_hot(
            jnp.where(valid, word_ids, t), t + 1, dtype=word_emb.dtype
        )[..., :t]  # (B, T_tok, T_word); invalid tokens land in the dropped bin
        agg = jnp.einsum("btw,btd->bwd", oh, word_emb)
        word_mask = (jnp.sum(oh, axis=1) > 0).astype(jnp.float32)
        # masked slots would be exactly zero -> 0/0 in the loss's cosine
        # normalization; backfill with a benign constant (they are masked out)
        agg = jnp.where(word_mask[..., None] > 0, agg, 1.0)
        return agg, word_mask

    def init_variables(self, rng, batch):
        return self.module.init(
            {"params": rng, "dropout": rng},
            batch["input_ids"], batch["attention_mask"], batch["images"], train=False,
        )

    def apply_train(self, variables, batch, rng, train: bool = True):
        kwargs = {"train": train}
        if train and rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        has_stats = "batch_stats" in variables and variables["batch_stats"]
        if has_stats and train:
            kwargs["mutable"] = ["batch_stats"]
        out = self.module.apply(
            variables, batch["input_ids"], batch["attention_mask"], batch["images"],
            **kwargs,
        )
        new_stats = {}
        if has_stats and train:
            out, updated = out
            new_stats = updated.get("batch_stats", {})
        word_embeddings = out["word_embeddings"]
        words_mask = out["words_mask"]
        if self._cont_table is not None:
            # whole-word aggregation (reference GLoRIA.py:123-181) instead of
            # raw wordpiece embeddings for the local attention loss
            word_embeddings, words_mask = self._aggregate_words(
                word_embeddings, batch["input_ids"], batch["attention_mask"]
            )
        loss = self.loss_fn(
            out["global_features"], out["local_features"], word_embeddings,
            out["sent_embeddings"], words_mask,
        )
        return {
            "loss": loss,
            "global": out["global_features"],
            "sent": out["sent_embeddings"],
        }, new_stats

    # -- inference API (reference GLoRIA.py:183-266) -----------------------
    def get_similarities(self, images, texts_input_ids, texts_attention_mask):
        """Global cosine similarity between each image and each text prompt."""
        out, _ = self.apply_train(
            self.variables,
            {"input_ids": texts_input_ids, "attention_mask": texts_attention_mask,
             "images": images},
            rng=None, train=False,
        )
        img = out["global"] / jnp.linalg.norm(out["global"], axis=-1, keepdims=True)
        txt = out["sent"] / jnp.linalg.norm(out["sent"], axis=-1, keepdims=True)
        return np.asarray(img @ txt.T)

    def zero_shot_classification(self, images, class_prompts: Dict[str, Dict]):
        """class name -> tokenized prompts dict; returns predicted class names."""
        sims = []
        names = list(class_prompts)
        for name in names:
            p = class_prompts[name]
            s = self.get_similarities(images, p["input_ids"], p["attention_mask"])
            sims.append(s.mean(axis=1))
        sims = np.stack(sims, axis=1)  # (B, n_classes)
        return [names[i] for i in sims.argmax(axis=1)]

    def __repr__(self):
        return "model: GLoRIA"
