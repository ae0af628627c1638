"""Eval post-processing: representation dumps/plots and attention overlays.

Parity with reference vilmedic/blocks/scorers/post_processing.py:21-221: a config
list like ``post_processing: [{plot_representation: {keys: [...], ...}}]``
dispatched by name after evaluation, writing artifacts into ckpt_dir.
"""

from __future__ import annotations

import os
import numpy as np


def save_representation(results, key, split, seed, ckpt_dir, epoch, dl, **kwargs):
    """Dump a results[key] embedding matrix to ``{split}_{seed}_{key}.npy``
    (reference post_processing.py:71)."""
    arr = np.asarray(results[key])
    path = os.path.join(ckpt_dir, f"{split}_{seed}_{key}.npy")
    np.save(path, arr)
    return path


def plot_representation(
    results, keys, split, seed, ckpt_dir, epoch, dl,
    labels_keep=None, max_samples_per_class=250, **kwargs,
):
    """t-SNE scatter of embeddings colored by labels
    (reference post_processing.py:88-186)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    for key in keys:
        if key not in results:
            continue
        emb = np.asarray(results[key])
        if emb.ndim > 2:
            emb = emb.reshape(emb.shape[0], -1)
        n = min(len(emb), 2000)
        proj = TSNE(n_components=2, init="pca", perplexity=min(30, max(2, n // 4))).fit_transform(
            emb[:n]
        )
        fig, ax = plt.subplots(figsize=(8, 8))
        ax.scatter(proj[:, 0], proj[:, 1], s=4)
        ax.set_title(f"{key} ({split}, epoch {epoch})")
        path = os.path.join(ckpt_dir, f"{split}_{seed}_{epoch}_{key}.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)


def plot_attention(results, split, seed, ckpt_dir, epoch, dl, **kwargs):
    """Attention-map overlays on input images (reference post_processing.py:21)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    attentions = results.get("attentions")
    if attentions is None:
        return
    att = np.asarray(attentions)
    out_dir = os.path.join(ckpt_dir, f"attention_{split}_{seed}_{epoch}")
    os.makedirs(out_dir, exist_ok=True)
    for i in range(min(8, att.shape[0])):
        fig, ax = plt.subplots()
        ax.imshow(att[i].mean(axis=0) if att[i].ndim == 3 else att[i], cmap="viridis")
        fig.savefig(os.path.join(out_dir, f"{i}.png"), dpi=100)
        plt.close(fig)


_DISPATCH = {
    "save_representation": save_representation,
    "plot_representation": plot_representation,
    "plot_attention": plot_attention,
}


def post_processing(post_processing, results, split, seed, ckpt_dir, epoch, dl):
    """Dispatch a post-processing config list (reference post_processing.py:188-221)."""
    for entry in post_processing or []:
        if isinstance(entry, str):
            name, args = entry, {}
        else:
            name = list(entry.keys())[0]
            args = entry[name] or {}
            if hasattr(args, "to_dict"):
                args = args.to_dict()
        fn = _DISPATCH.get(name)
        if fn is None:
            continue
        fn(results=results, split=split, seed=seed, ckpt_dir=ckpt_dir,
           epoch=epoch, dl=dl, **args)
