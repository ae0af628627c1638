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
    """Ensemble classification eval (reference classifier/evaluation.py:7-60).

    Multi-device: the forward shards over the local mesh's data axis (batches
    padded to a device multiple) — the classification analog of the sharded
    generation eval; ``shard_eval: false`` disables."""
    import math

    devices = jax.local_devices()
    n_dev = len(devices)
    shard_eval = config.get("shard_eval", None)
    if shard_eval is None:
        shard_eval = n_dev > 1
    batch_size = getattr(dl, "batch_size", None)
    mesh = None
    pad_target = None
    if shard_eval and n_dev > 1 and batch_size:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import get_mesh, shard_batch

        mesh = get_mesh(devices=devices)
        pad_target = math.ceil(int(batch_size) / n_dev) * n_dev
        repl = NamedSharding(mesh, P())

    apply_fns = []
    for m in models:
        variables = m.variables
        if mesh is not None:
            # params may be committed to the (possibly global) training mesh:
            # stage through host numpy, then replicate on the local mesh
            if jax.process_count() > 1:
                variables = jax.tree.map(lambda x: np.asarray(x), variables)
            variables = jax.device_put(variables, repl)
        fn = jax.jit(
            lambda variables, images, labels, _m=m: _m.apply_eval(
                variables, {"images": images, "labels": labels}
            )
        )
        apply_fns.append((fn, variables))

    from ..data.image import prepare_batch

    all_logits: List[np.ndarray] = []
    all_labels: List[np.ndarray] = []
    losses: List[List[float]] = []

    for batch in dl:
        batch = prepare_batch(batch, dl.dataset)
        labels = batch["labels"]
        n = len(labels)
        images = batch["images"]
        dev_labels = np.asarray(labels)
        if pad_target and n < pad_target:
            # NOTE: the remainder batch's mean loss includes the duplicated pad
            # rows (metrics are exact — logits sliced back to n); same edge
            # effect as the reference's DataParallel mean over ragged replicas.
            reps = pad_target - n
            images = np.concatenate([images, np.repeat(images[-1:], reps, axis=0)])
            dev_labels = np.concatenate(
                [dev_labels, np.repeat(dev_labels[-1:], reps, axis=0)]
            )
        if mesh is not None:
            placed = shard_batch({"images": images, "labels": dev_labels}, mesh)
            images, dev_labels = placed["images"], placed["labels"]
        batch_logits = []
        batch_losses = []
        for fn, variables in apply_fns:
            out = fn(variables, images, jnp.asarray(dev_labels))
            batch_logits.append(np.asarray(out["output"], np.float32)[:n])
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
