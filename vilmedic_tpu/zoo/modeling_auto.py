"""Model-zoo API: one-line loading of trained checkpoints for inference.

Parity with reference vilmedic/zoo/modeling_auto.py:16-117: ``AutoModel.
from_pretrained(name)`` resolves a zoo name (or a local checkpoint directory),
loads the config saved with the checkpoint, rebuilds the dataset (vocab/label
paths rewritten into the checkpoint directory) and the model by proto registry,
restores weights strictly, and returns ``(model, dataset)`` where
``dataset.inference(...)`` builds batches from raw user input.

The reference downloads from HF hub / GDrive; this environment has no egress, so
remote names resolve only if already present in the local cache — a local path
always works. MODEL_ZOO keeps the reference's public name surface.
"""

from __future__ import annotations

import glob
import os
from typing import Tuple

from .. import registry
from ..config.config import Config
from ..constants import MODEL_ZOO_CACHE_DIR
from ..data.loader import DataLoader
from ..executors.checkpoint import load_checkpoint, restore_into

# Public zoo names (reference modeling_auto.py:16-39). Values are the remote
# sources in the reference; here they key into the local cache directory.
MODEL_ZOO = {
    "rrg/baseline-mimic": "RRG trained on MIMIC-CXR impressions",
    "rrg/baseline-padchest": "RRG trained on PadChest",
    "rrg/baseline-indiana": "RRG trained on Indiana (Open-I)",
    "rrg/biomed-roberta-baseline-mimic": "RRG biomed-roberta decoder, MIMIC-CXR",
    "rrg/biomed-roberta-baseline-indiana": "RRG biomed-roberta decoder, Indiana",
    "rrs/biomed-roberta-baseline-mimic": "RRS biomed-roberta, MIMIC-CXR",
    "rrs/baseline-mimic": "RRS trained on MIMIC-CXR",
    "selfsup/convirt-mimic": "ConVIRT pretrained on MIMIC-CXR",
    "selfsup/convirt-mimic-balanced": "ConVIRT balanced sampling",
    "selfsup/convirt-padchest-16": "ConVIRT PadChest 16",
    "selfsup/convirt-padchest-32": "ConVIRT PadChest 32",
    "selfsup/gloria-chexpert": "GLoRIA pretrained on CheXpert",
    "selfsup/gloria-mimic-48": "GLoRIA MIMIC-CXR 48",
    "selfsup/simclr-mimic-16": "SimCLR MIMIC 16",
    "selfsup/simclr-mimic-32": "SimCLR MIMIC 32",
    "selfsup/simclr-mimic-64": "SimCLR MIMIC 64",
    "selfsup/vae-mimic": "VAE MIMIC",
    "selfsup/vae-indiana": "VAE Indiana",
    "selfsup/vae-padchest": "VAE PadChest",
    "mvqa/mvqa-imageclef": "MVQA ImageCLEF",
}


class AutoModel:
    @classmethod
    def from_pretrained(
        cls, pretrained_model_name_or_path: str, logger=None, **kwargs
    ) -> Tuple[object, object]:
        path = cls._resolve(pretrained_model_name_or_path)

        ckpts = glob.glob(os.path.join(path, "*.ckpt"))
        assert len(ckpts) >= 1, f"No checkpoint found in {path}"
        ckpt = ckpts[0]
        state = load_checkpoint(ckpt)

        config = Config(state["config"])
        model_config = config.model.to_dict()
        dataset_config = config.dataset.to_dict()

        # Inference-only dataset rebuild: tokenizers/vocabs/label maps come from
        # the checkpoint dir (ckpt_dir=path resolves ``vocab.{src,tgt}`` and
        # ``labels.tok``), data files are skipped (reference :87-89 rewrites
        # vocab paths; here the datasets support an explicit zoo mode).
        for section in dataset_config.values():
            if isinstance(section, dict):
                section["inference_only"] = True

        dataset_proto = dataset_config.pop("proto")
        dataset_config.pop("num_workers", None)
        dataset = registry.get("dataset", dataset_proto)(
            split="test", ckpt_dir=path, called_by_ensemblor=True, **dataset_config
        )

        dl = DataLoader(dataset, batch_size=4, num_workers=0)
        model_proto = model_config.pop("proto")
        model = registry.get("model", model_proto)(
            **model_config, dl=dl, logger=logger, from_training=False
        )

        import jax

        sample = _dummy_batch(dataset)
        variables = model.init_variables(jax.random.key(0), sample)
        model.variables = restore_into(variables, state["model"])

        assert hasattr(dataset, "inference"), (
            "dataset must implement an inference() method"
        )
        return model, dataset

    @staticmethod
    def _resolve(name_or_path: str) -> str:
        if os.path.isdir(name_or_path):
            return name_or_path
        if name_or_path in MODEL_ZOO:
            cached = os.path.join(MODEL_ZOO_CACHE_DIR, name_or_path)
            if os.path.isdir(cached):
                return cached
            raise FileNotFoundError(
                f"Zoo model {name_or_path!r} is not in the local cache "
                f"({cached}) and this environment has no network egress. "
                f"Place the checkpoint directory there or pass a local path."
            )
        raise KeyError(
            f"Unknown zoo name {name_or_path!r}; known: {sorted(MODEL_ZOO)}"
        )


def _dummy_batch(dataset):
    """Fabricate a shape-correct one-sample batch from the dataset structure,
    so model variables can be initialized before restoring checkpoint weights
    (the zoo dataset itself is empty — it exists for tokenizers/transforms)."""
    import numpy as np

    batch = {}

    def text_entry(text_ds, prefix=""):
        max_len = text_ds.tokenizer_max_len or 16
        batch[prefix + "input_ids"] = np.zeros((1, max_len), np.int32)
        batch[prefix + "attention_mask"] = np.ones((1, max_len), np.int32)

    image_ds = getattr(dataset, "image", None)
    if image_ds is None and hasattr(dataset, "imgseq"):
        image_ds = dataset.imgseq.image
    if image_ds is not None:
        crop = image_ds.crop
        if image_ds.multi_image and image_ds.multi_image > 1:
            n = image_ds.multi_image
            batch["images"] = np.zeros((1, n, crop, crop, 3), np.float32)
            batch["images_mask"] = np.ones((1, n), bool)
        else:
            batch["images"] = np.zeros((1, crop, crop, 3), np.float32)
            batch["images_mask"] = None

    if hasattr(dataset, "seq"):
        text_entry(dataset.seq)
    elif hasattr(dataset, "imgseq"):
        text_entry(dataset.imgseq.seq)
    if hasattr(dataset, "src"):
        text_entry(dataset.src)
    if hasattr(dataset, "tgt"):
        text_entry(dataset.tgt, prefix="decoder_")
    if hasattr(dataset, "label") or hasattr(dataset, "labels_map"):
        labels_map = getattr(dataset, "labels_map", None)
        if labels_map is not None and labels_map.multi_label:
            batch["labels"] = np.zeros((1, len(labels_map)), np.float32)
        else:
            batch["labels"] = np.zeros((1,), np.int32)
    return batch
