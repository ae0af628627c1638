"""Label dataset: label vocab built on train, single or multi-label batches.

Parity with reference vilmedic/datasets/base/LabelDataset.py: builds ``labels.tok``
in ckpt_dir from the train split, single-label -> int index, multi-label ->
multi-hot vector, unseen labels -> ignore index -100. Batches are numpy.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from ..registry import register
from .utils import Labels, load_file

IGNORE_INDEX = -100


def make_labels(root, split, file):
    return load_file(os.path.join(root, split + "." + file))


@register("dataset")
class LabelDataset:
    def __init__(
        self,
        root=None,
        split=None,
        file=None,
        ckpt_dir=None,
        label_file=None,
        inference_only=False,
        **kwargs,
    ):
        if inference_only:  # zoo mode: label map from ckpt_dir only
            file = None
            label_file = label_file or os.path.join(ckpt_dir, "labels.tok")
        assert split is not None, "Argument split cant be None"
        assert not (file is None and label_file is None), (
            "Please specify a file or a label_file"
        )

        self.root = root
        self.split = split
        self.label_file = label_file
        self.labels_map: Optional[Labels] = None
        self.raw_labels: Optional[List[str]] = None

        if file is not None:
            self.raw_labels = make_labels(root, split, file)
            self.label_file = os.path.join(ckpt_dir, "labels.tok")
            if split == "train" and not os.path.exists(self.label_file):
                Labels(self.raw_labels).dump(self.label_file)

        try:
            self.labels_map = Labels().load(self.label_file)
        except FileNotFoundError:
            raise FileNotFoundError(
                "label file does not exist, verify path or start a training"
            )

        self.labels = None
        if self.raw_labels is not None:
            self.labels = [self.get_processed_label(l) for l in self.raw_labels]

    def get_processed_label(self, label: str):
        try:
            classes = label.split(",")
            if not self.labels_map.multi_label:
                return np.int32(self.labels_map.label2idx[classes[0]])
            multi_hot = np.zeros(len(self.labels_map), dtype=np.float32)
            multi_hot[[self.labels_map.label2idx[c] for c in classes]] = 1.0
            return multi_hot
        except KeyError:
            # Label absent from the train set (OOD split) -> ignore index
            return np.int32(IGNORE_INDEX)

    def __len__(self):
        return len(self.labels or [])

    def __getitem__(self, index):
        return {"label": self.labels[index]}

    def get_collate_fn(self):
        def collate_fn(batch):
            return {"labels": np.stack([s["label"] for s in batch])}

        return collate_fn

    def inference(self, label):
        if not isinstance(label, list):
            label = [label]
        return self.get_collate_fn()(
            [{"label": self.get_processed_label(l)} for l in label]
        )

    def __repr__(self):
        return "LabelDataset\n" + json.dumps(
            {"num_labels": len(self.labels_map)}, indent=4, default=str
        )
