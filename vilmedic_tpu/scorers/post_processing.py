"""Eval post-processing: representation dumps/plots and attention overlays.

Parity with reference vilmedic/blocks/scorers/post_processing.py:21-221: a
config list like ``post_processing: [{plot_representation: {keys: [...],
labels_keep: [...], max_samples_per_class: 250}}]`` dispatched by name after
evaluation, writing artifacts into ckpt_dir:

- ``plot_representation``: embeddings colored by the dataset's labels —
  multi-label points kept only when exactly one (kept) class is active
  (reference :100-121), ``labels_keep`` filtering, per-class subsampling
  (``max_samples_per_class``, reference :141-155), embeddings + labels dumped
  as .npy, one scatter per projector: t-SNE always, UMAP when importable
  (umap-learn is absent from this image);
- ``save_representation``: raw embedding dumps (reference :71-85);
- ``plot_attention``: attention maps upscaled (PIL bicubic + Gaussian smooth —
  the skimage ``pyramid_expand`` analog) and composited over the ACTUAL input
  images with a Reds colormap + colorbar (reference :21-69).
"""

from __future__ import annotations

import logging
import os
import numpy as np

logger = logging.getLogger(__name__)


def _find_label_dataset(dataset):
    """The composite's LabelDataset child (reference :92-95 attr scan)."""
    if hasattr(dataset, "labels_map"):
        return dataset
    for v in vars(dataset).values():
        if hasattr(v, "labels_map") and getattr(v, "labels_map") is not None:
            return v
    return None


def save_representation(results, keys=None, key=None, split=None, seed=None,
                        ckpt_dir=None, epoch=None, dl=None, **kwargs):
    """Dump results[key] embedding matrices (reference post_processing.py:71)."""
    out_dir = os.path.join(ckpt_dir, f"save_representation_{seed}_{split}")
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for k in keys or ([key] if key else []):
        if k not in results:
            logger.warning(f"Key {k} is not found in results dictionary")
            continue
        arr = np.asarray(results[k])
        path = os.path.join(out_dir, f"{split}_{k}_embeddings.npy")
        np.save(path, arr)
        paths.append(path)
    return paths


def _filter_by_labels(vectors, labels, labels_map, multi_label, labels_keep):
    """Reference :100-121: per-point label resolution + labels_keep filter."""
    embeddings, emb_labels = [], []
    for vector, label in zip(vectors, labels):
        if multi_label:
            c = np.where(np.asarray(label) == 1.0)[0]
            if labels_keep is not None:
                c = [c_ for c_ in c if labels_map[int(c_)] in labels_keep]
            if len(c) != 1:
                continue  # ambiguous point: more than one (kept) class, or none
            label = int(c[0])
        else:
            label = int(label)
            if labels_keep is not None and labels_map[label] not in labels_keep:
                continue
        emb_labels.append(labels_map[label])
        embeddings.append(np.asarray(vector))
    return np.array(embeddings), np.array(emb_labels)


def _subsample_per_class(embeddings, emb_labels, max_samples_per_class):
    """Reference :141-155 per-class cap."""
    if not isinstance(max_samples_per_class, int):
        logger.warning(
            f"Argument max_samples_per_class is not an integer, found "
            f"{type(max_samples_per_class)}. Using all points"
        )
        return embeddings, emb_labels
    new_e, new_l = [], []
    for g in np.unique(emb_labels):
        ix = np.where(emb_labels == g)[0]
        np.random.shuffle(ix)
        new_l.append(emb_labels[ix[:max_samples_per_class]])
        new_e.append(embeddings[ix[:max_samples_per_class]])
    return np.concatenate(new_e), np.concatenate(new_l)


def _projectors(n_points: int, n_classes: int):
    from sklearn.manifold import TSNE

    yield TSNE(n_components=2, init="pca",
               perplexity=min(30, max(2, n_points // 4)))
    try:
        import umap

        yield umap.UMAP(n_neighbors=max(2, n_classes))
    except ImportError:
        logger.info("umap-learn not installed; skipping the UMAP projection")


def plot_representation(results, keys, split, seed, ckpt_dir, epoch, dl,
                        labels_keep=None, max_samples_per_class=None, **kwargs):
    """Label-colored embedding scatters (reference post_processing.py:88-186)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    label_dataset = _find_label_dataset(dl.dataset)
    out_dir = os.path.join(ckpt_dir, f"plot_representation_{seed}_{split}")
    os.makedirs(out_dir, exist_ok=True)
    written = []

    for key in keys:
        if key not in results:
            logger.warning(f"Key {key} is not found in results dictionary")
            continue
        vectors = [np.asarray(v).reshape(-1) for v in results[key]]

        if label_dataset is not None:
            labels = label_dataset.labels  # processed list (reference :96)
            labels_map = label_dataset.labels_map.idx2label
            multi_label = label_dataset.labels_map.multi_label
            embeddings, emb_labels = _filter_by_labels(
                vectors, labels, labels_map, multi_label, labels_keep
            )
            n_classes = len(labels_map)
        else:  # no labels available: single unnamed class
            embeddings = np.array(vectors)
            emb_labels = np.array(["all"] * len(embeddings))
            n_classes = 1

        np.save(os.path.join(out_dir, f"{split}_{key}_embeddings.npy"), embeddings)
        np.save(os.path.join(out_dir, f"{split}_{key}_labels.npy"), emb_labels)
        assert len(embeddings) != 0, "No embedding kept for visualization"

        if max_samples_per_class is not None:
            embeddings, emb_labels = _subsample_per_class(
                embeddings, emb_labels, max_samples_per_class
            )

        for visualization in _projectors(len(embeddings), n_classes):
            name = type(visualization).__name__
            proj = visualization.fit_transform(embeddings)
            fig = plt.figure()
            for g in np.unique(emb_labels):
                ix = np.where(emb_labels == g)
                plt.scatter(proj[ix, 0], proj[ix, 1], s=0.5, label=g)
            plt.legend(markerscale=10, loc="center left", bbox_to_anchor=(1, 0.5))
            plt.tight_layout()
            path = os.path.join(out_dir, f"{split}_{key}_{name}.png")
            fig.savefig(path, dpi=120)
            plt.close(fig)
            written.append(path)
    return written


def _upscale_attention(weights: np.ndarray, size: int, smooth: bool = True):
    """(S,) or (s, s) attention -> (size, size) alpha map. PIL bicubic resize +
    Gaussian blur replaces skimage pyramid_expand (reference :52-60)."""
    from PIL import Image, ImageFilter

    w = np.asarray(weights, np.float64)
    if w.ndim == 1:
        square = int(np.sqrt(len(w)))
        w = w[: square * square].reshape(square, square)
    w = w - w.min()
    if w.max() > 0:
        w = w / w.max()
    im = Image.fromarray((w * 255).astype(np.uint8))
    im = im.resize((size, size), Image.BICUBIC)
    if smooth:
        im = im.filter(ImageFilter.GaussianBlur(radius=size / 16))
    return np.asarray(im, np.float64) / 255.0


def plot_attention(results, split, seed, ckpt_dir, epoch, dl, smooth=True,
                   max_samples: int = 8, **kwargs):
    """Attention overlays composited on the input images
    (reference post_processing.py:21-69). Accepts ``results['attentions']``
    shaped (N, ..., S) — the trailing axis is the patch attention row; leading
    axes beyond the sample axis (layers/heads) use the LAST slice, matching the
    reference's ``attentions[-1, -1, -1, -1, -1, :]`` selection."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm
    import matplotlib.pyplot as plt

    attentions = results.get("attentions")
    if attentions is None:
        logger.warning("No attention weights found in results, skipping")
        return []
    att = np.asarray(attentions)
    out_dir = os.path.join(ckpt_dir, f"plot_attention_{seed}_{split}_{epoch}")
    os.makedirs(out_dir, exist_ok=True)

    dataset = dl.dataset
    image_dataset = dataset if hasattr(dataset, "open_raw_image") else None
    if image_dataset is None:
        for v in vars(dataset).values():
            if hasattr(v, "open_raw_image"):
                image_dataset = v
                break

    written = []
    for i in range(min(max_samples, att.shape[0])):
        weights = att[i]
        while weights.ndim > 1:
            weights = weights[-1]  # last layer/head/query row

        if image_dataset is not None:
            img = image_dataset.open_raw_image(i)
            img = np.asarray(img, np.float64)
            if img.max() > 1:
                img = img / 255.0
            size = img.shape[0]
        else:
            img = None
            size = 224

        alpha = _upscale_attention(weights, size, smooth=smooth)
        fig, ax = plt.subplots()
        if img is not None:
            ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
        m = ax.imshow(alpha, alpha=0.6, cmap=cm.Reds)
        fig.colorbar(m, ax=ax)
        ax.axis("off")
        path = os.path.join(out_dir, f"att_{i}.png")
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written


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
            logger.warning(f"Unknown post-processing step: {name}")
            continue
        fn(results=results, split=split, seed=seed, ckpt_dir=ckpt_dir,
           epoch=epoch, dl=dl, **args)
