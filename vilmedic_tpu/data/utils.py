"""Data-layer helpers: line-file loading, vocab building, label maps.

Parity with reference vilmedic/datasets/base/utils.py:8-49 (``load_file``, ``Vocab``,
``Labels``). ``Labels.load`` avoids the reference's ``eval`` on the multi-label flag.
"""

from __future__ import annotations

import itertools
import os
from typing import List, Optional

import numpy as np


def load_file(path: str) -> List[str]:
    """Load the nth sentence from line n (reference base/utils.py:8-13)."""
    with open(path, "r") as f:
        content = f.read().strip()
    return content.split("\n")


class Vocab:
    """Vocabulary built from tokenized train sentences, dumped one word per line,
    special tokens first (reference base/utils.py:17-29)."""

    def __init__(
        self,
        sentences=None,
        pad_token="[PAD]",
        eos_token="[SEP]",
        bos_token="[CLS]",
        unk_token="[UNK]",
        mask_token="[MASK]",
    ):
        tokens = list(itertools.chain(*(sentences or [])))
        self.words = [bos_token, pad_token, eos_token, unk_token, mask_token] + sorted(
            set(tokens)
        )

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            f.write("\n".join(str(w) for w in self.words))


class Labels:
    """Label vocabulary with single/multi-label detection
    (reference base/utils.py:31-49)."""

    def __init__(self, labels: Optional[List[str]] = None):
        self.labels: List[str] = []
        self.multi_label = False
        self.label2idx = {}
        self.idx2label = {}
        if labels is not None:
            self.labels = sorted(set(l for label in labels for l in label.split(",")))
            self.multi_label = max(len(label.split(",")) for label in labels) > 1
            self._index()

    def _index(self):
        self.label2idx = {l: i for i, l in enumerate(self.labels)}
        self.idx2label = {i: l for i, l in enumerate(self.labels)}

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(
                "\n".join(
                    str(w) for w in [f"multi-label:{self.multi_label}"] + self.labels
                )
            )

    def load(self, path: str) -> "Labels":
        with open(path, "r") as f:
            lines = [w.strip() for w in f.readlines()]
        flag = lines.pop(0).split(":")[-1].strip().lower()
        assert flag in ("true", "false"), "Bad formatting"
        self.multi_label = flag == "true"
        self.labels = lines
        self._index()
        return self

    def __len__(self):
        return len(self.labels)


def pad_to_multiple(length: int, multiple: int = 8) -> int:
    """Round a sequence length up to an XLA-friendly multiple (static-ish shapes
    bound the number of recompiles when no max_len is configured)."""
    return max(multiple, ((length + multiple - 1) // multiple) * multiple)


def stack_pad_1d(arrays, pad_value: int, target_len: Optional[int] = None):
    """Stack variable-length 1-D int arrays into (B, L) with right padding."""
    if target_len is None:
        target_len = pad_to_multiple(max(len(a) for a in arrays))
    out = np.full((len(arrays), target_len), pad_value, dtype=np.int32)
    mask = np.zeros((len(arrays), target_len), dtype=np.int32)
    for i, a in enumerate(arrays):
        n = min(len(a), target_len)
        out[i, :n] = a[:n]
        mask[i, :n] = 1
    return out, mask
