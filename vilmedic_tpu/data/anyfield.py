"""Untyped per-line payload dataset under a configurable key.

Parity with reference vilmedic/datasets/base/AnyDataset.py:12-52 (used e.g. to feed
``concepts`` lists to constrained decoding). Processing comes from the registry
instead of ``eval``.
"""

from __future__ import annotations

import json
import os

from ..registry import register
from .processing import get_processing


def make_lines(root, split, file, processing):
    with open(os.path.join(root, split + "." + file)) as f:
        return [processing(line.strip()) for line in f]


@register("dataset")
class AnyDataset:
    def __init__(self, root=None, file=None, split=None, processing=None, name=None, **kwargs):
        assert split is not None, "Argument split cannot be None"
        self.root = root
        self.file = file
        self.split = split
        self.name = name or "any"
        self.processing = get_processing(processing)
        self.lines = make_lines(root, split, file, self.processing)

    def __getitem__(self, index):
        return {self.name: self.lines[index]}

    def get_collate_fn(self):
        def collate_fn(batch):
            return {self.name: [s[self.name] for s in batch]}

        return collate_fn

    def __len__(self):
        return len(self.lines)

    def inference(self, sentences):
        raise NotImplementedError()

    def __repr__(self):
        return "AnyDataset\n" + json.dumps(
            {"root": self.root, "file": self.file, "name": self.name},
            indent=4,
            default=str,
        )
