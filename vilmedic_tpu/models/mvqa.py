"""MVQA: medical VQA / image classification.

Parity with reference vilmedic/models/mvqa/MVQA.py:14-59: CNN -> linear+LayerNorm
adapter -> transformer encoder over spatial tokens (a set transformer) -> pooler
(first token, dense+tanh) -> linear classifier; loss proto-dispatched; returns
``answer = argmax``; ``eval_func`` = the ensemble classification loop.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from .. import registry
from ..blocks.classifier import Classifier, evaluation
from ..blocks.transformer import EncoderLayer, TransformerConfig
from ..blocks.vision.visual_encoder import build_visual_encoder
from ..config.config import Config
from .base import TaskModel


class MVQAModule(nn.Module):
    cnn: nn.Module
    adapter_out: int
    transformer_cfg: TransformerConfig
    num_classes: int
    classifier_dropout: float = 0.0

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg = self.transformer_cfg
        out = self.cnn(images, train=train)
        if out.ndim == 2:
            out = out[:, None, :]  # pooled vector -> single token
        out = nn.Dense(self.adapter_out, dtype=cfg.dtype, name="adapter")(out)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                           name="adapter_ln")(out)
        for i in range(cfg.num_hidden_layers):
            out = EncoderLayer(cfg, name=f"layer_{i}")(out, deterministic=not train)
        pooled = nn.tanh(
            nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="pooler")(out[:, 0])
        )
        logits = Classifier(
            self.num_classes, dropout=self.classifier_dropout, name="classifier"
        )(pooled, train=train)
        return logits.astype(jnp.float32)


@registry.register("model")
class MVQA(TaskModel):
    def __init__(self, cnn, classifier, adapter, transformer, loss,
                 dl=None, logger=None, from_training=True, dtype="float32", **kwargs):
        compute_dtype = jnp.bfloat16 if str(dtype) in ("bfloat16", "bf16") else jnp.float32
        transformer = _d(transformer)
        adapter = _d(adapter)
        classifier = _d(classifier)
        loss = _d(loss)

        self.transformer_cfg = TransformerConfig.from_dict(transformer, dtype=compute_dtype)
        self.num_classes = classifier.get("num_classes")
        if self.num_classes is None and dl is not None:
            self.num_classes = len(dl.dataset.labels_map)

        self.loss_fn = registry.get("loss", loss.pop("proto"))(**loss)
        if (cnn or {}).get("freeze"):
            self.frozen_prefixes = ("cnn/model",)  # see TaskModel.frozen_prefixes
        self.module = MVQAModule(
            cnn=build_visual_encoder(cnn, dtype=compute_dtype),
            adapter_out=adapter.get("output_size", self.transformer_cfg.hidden_size),
            transformer_cfg=self.transformer_cfg,
            num_classes=int(self.num_classes),
            classifier_dropout=float(classifier.get("dropout", 0.0) or 0.0),
        )
        self.eval_func = evaluation
        self.variables: Optional[Dict] = None

    def init_variables(self, rng, batch):
        return self.module.init(
            {"params": rng, "dropout": rng}, batch["images"], train=False
        )

    def _apply(self, variables, batch, rng=None, train=False):
        kwargs = {"train": train}
        if train and rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        has_stats = "batch_stats" in variables and variables["batch_stats"]
        if has_stats and train:
            kwargs["mutable"] = ["batch_stats"]
        out = self.module.apply(variables, batch["images"], **kwargs)
        new_stats = {}
        if has_stats and train:
            out, updated = out
            new_stats = updated.get("batch_stats", {})
        logits = out
        labels = batch.get("labels")
        loss = jnp.asarray(0.0)
        if labels is not None:
            loss = self.loss_fn(logits, jnp.asarray(labels))
            if isinstance(loss, tuple):
                loss = loss[0]
        return {
            "loss": loss,
            "output": logits,
            "answer": jnp.argmax(logits, axis=-1),
        }, new_stats

    def apply_train(self, variables, batch, rng, train: bool = True):
        return self._apply(variables, batch, rng, train=train)

    def apply_eval(self, variables, batch):
        out, _ = self._apply(variables, batch, train=False)
        return out

    def __repr__(self):
        return "model: MVQA (VisualEncoder + set-transformer + Classifier)"


def _d(cfg):
    if isinstance(cfg, Config):
        return cfg.to_dict()
    return dict(cfg or {})
