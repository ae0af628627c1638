"""Classifier head + ensemble classification evaluation loop.

Parity with reference vilmedic/blocks/classifier/classifier.py:4 (a linear head)
and classifier/evaluation.py:7-60 (pre-allocated (N, n_models, n_classes) logits,
mean over models, refs = labels / hyps = mean logits).
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..registry import register


@register("block", "Classifier")
class Classifier(nn.Module):
    num_classes: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32)(x)


def evaluation(models, config, dl, from_training=True, **kwargs) -> Dict:
    """Ensemble classification eval (reference classifier/evaluation.py:7-60)."""
    apply_fns = []
    for m in models:
        fn = jax.jit(
            lambda variables, images, labels, _m=m: _m.apply_eval(
                variables, {"images": images, "labels": labels}
            )
        )
        apply_fns.append(fn)

    from ..data.image import prepare_batch

    all_logits: List[np.ndarray] = []
    all_labels: List[np.ndarray] = []
    losses: List[List[float]] = []

    for batch in dl:
        batch = prepare_batch(batch, dl.dataset)
        labels = batch["labels"]
        batch_logits = []
        batch_losses = []
        for m, fn in zip(models, apply_fns):
            out = fn(m.variables, batch["images"], jnp.asarray(labels))
            batch_logits.append(np.asarray(out["output"], np.float32))
            batch_losses.append(float(out["loss"]))
        all_logits.append(np.stack(batch_logits, axis=1))  # (B, n_models, C)
        all_labels.append(np.asarray(labels))
        losses.append(batch_losses)

    logits = np.concatenate(all_logits, axis=0)
    labels = np.concatenate(all_labels, axis=0)
    preds = np.mean(logits, axis=1)
    return {
        "loss": float(np.mean(losses)),
        "refs": labels,
        "hyps": preds,
        "logits": logits,
    }
