"""Text dataset: line files or HF datasets -> token id batches with static shapes.

Parity with reference vilmedic/datasets/base/TextDataset.py:28-161:
- sentences loaded from ``{split}.{file}`` (or an HF dataset field), cleaned by a
  registered ``processing`` function and whitespace-split;
- tokenizer is either a pretrained ``AutoTokenizer`` or a ``BertTokenizer`` over a
  vocab built from the train split and dumped to ``ckpt_dir/vocab.{src,tgt}``;
- collation yields padded/truncated ``input_ids`` + ``attention_mask``.

TPU-first deltas: batches are numpy ``int32`` with **static shapes** — when
``tokenizer_max_len`` is set we always pad to it, otherwise we pad the batch to a
multiple of 8 — so that the jitted train step compiles once.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from ..registry import register
from .processing import get_processing
from .utils import Vocab, load_file

os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")


def split_sentences(sentences: List[str], processing) -> List[List[str]]:
    return [processing(s.strip()).split() for s in sentences]


def make_sentences(root: str, split: str, file: str, processing) -> List[List[str]]:
    return split_sentences(load_file(os.path.join(root, split + "." + file)), processing)


@register("dataset")
class TextDataset:
    def __init__(
        self,
        root=None,
        file=None,
        split=None,
        ckpt_dir=None,
        processing=None,
        tokenizer=None,
        tokenizer_max_len=None,
        vocab_file=None,
        source="src",
        hf_dataset=None,
        hf_field=None,
        hf_local=None,
        hf_filter=None,
        inference_only=False,
        **kwargs,
    ):
        if inference_only:
            # zoo mode: tokenizer/processing only, no data files on disk
            file = None
            hf_dataset = None
        assert source in ("src", "tgt")
        assert split is not None, "Argument split cannot be None"
        assert not (file is not None and vocab_file is not None), (
            "You cannot mention both a data file and a vocab file"
        )
        assert not (vocab_file is not None and tokenizer is not None), (
            "You cannot mention both a pretrained tokenizer and a vocab file"
        )
        assert not (source == "tgt" and tokenizer_max_len is None), (
            "You must specify tokenizer_max_len for source tgt"
        )

        self.root = root
        self.file = file
        self.split = split
        self.source = source
        self.ckpt_dir = ckpt_dir
        self.processing_name = processing
        self.processing = get_processing(processing)
        self.tokenizer_max_len = tokenizer_max_len
        self.vocab_file = vocab_file
        self.sentences: Optional[List[List[str]]] = None

        if file is not None:
            self.sentences = make_sentences(root, split, file, self.processing)

        if hf_dataset is not None:
            from .hf_plumbing import process_hf_dataset

            dataset = process_hf_dataset(hf_dataset, hf_local, hf_filter, hf_field, split)
            self.sentences = split_sentences(
                [d[hf_field] for d in dataset], self.processing
            )

        self.tokenizer = self._build_tokenizer(tokenizer, vocab_file)

        # Tokenizer call args (reference TextDataset.py:95-102)
        self.tokenizer_args = {"padding": True, "add_special_tokens": True}
        if self.source == "src":
            self.tokenizer_args["add_special_tokens"] = False
        if self.tokenizer_max_len is not None:
            self.tokenizer_args.update(
                padding="max_length", truncation=True, max_length=self.tokenizer_max_len
            )

    def _build_tokenizer(self, tokenizer, vocab_file):
        from transformers import AutoTokenizer, BertTokenizer

        if tokenizer is not None:
            try:
                # local cache first — avoids slow network retries offline
                return AutoTokenizer.from_pretrained(tokenizer, local_files_only=True)
            except Exception:
                from ..constants import offline_mode

                if offline_mode():
                    raise RuntimeError(
                        f"Tokenizer {tokenizer!r} not in the local HF cache and "
                        f"VILMEDIC_OFFLINE is set — pre-populate the cache or "
                        f"unset the env var."
                    )
                return AutoTokenizer.from_pretrained(tokenizer)
        if vocab_file is None:
            vocab_file = os.path.join(self.ckpt_dir, f"vocab.{self.source}")
            if self.split == "train" and not os.path.exists(vocab_file):
                Vocab(self.sentences).dump(vocab_file)
        self.vocab_file = vocab_file
        return BertTokenizer(vocab_file=vocab_file, do_basic_tokenize=False)

    def __len__(self):
        return len(self.sentences or [])

    def __getitem__(self, index):
        return {f"{self.source}_seq": " ".join(self.sentences[index])}

    def get_collate_fn(self):
        key = f"{self.source}_seq"

        def collate_fn(batch):
            seq = self.tokenizer(
                [s[key] for s in batch],
                return_tensors="np",
                **self.tokenizer_args,
            )
            input_ids = np.asarray(seq["input_ids"], dtype=np.int32)
            attention_mask = np.asarray(seq["attention_mask"], dtype=np.int32)
            if self.tokenizer_max_len is None:
                # Static-friendly: round batch max length up to a multiple of 8.
                from .utils import pad_to_multiple

                target = pad_to_multiple(input_ids.shape[1])
                if target > input_ids.shape[1]:
                    pad_id = self.tokenizer.pad_token_id or 0
                    pad_width = ((0, 0), (0, target - input_ids.shape[1]))
                    input_ids = np.pad(input_ids, pad_width, constant_values=pad_id)
                    attention_mask = np.pad(attention_mask, pad_width, constant_values=0)
            return {"input_ids": input_ids, "attention_mask": attention_mask}

        return collate_fn

    def inference(self, seq):
        """Build a batch from raw user strings (zoo API; reference ImSeq.py:39-50)."""
        if not isinstance(seq, list):
            seq = [seq]
        batch = [{f"{self.source}_seq": " ".join(self.processing(s.strip()).split())} for s in seq]
        return self.get_collate_fn()(batch)

    def show_length(self, out_path=None):
        """Histogram of tokenizer vs whitespace sentence lengths
        (reference TextDataset.py:141-161), saved as a PNG."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        tokenizer_len, sentence_len = [], []
        for idx in range(len(self)):
            sentence = self[idx][f"{self.source}_seq"]
            ids = self.tokenizer(sentence, add_special_tokens=True)["input_ids"]
            tokenizer_len.append(len(ids))
            sentence_len.append(len(sentence.split()))
        fig, ax = plt.subplots(1, 2, figsize=(10, 4))
        ax[0].hist(tokenizer_len, bins=40)
        ax[0].set_title("tokenizer_len")
        ax[1].hist(sentence_len, bins=40)
        ax[1].set_title("sentence_len")
        out_path = out_path or os.path.join(
            self.ckpt_dir or ".", f"length.{self.source}.png"
        )
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
        return out_path

    def __repr__(self):
        return "TextDataset\n" + json.dumps(
            {
                "source": self.source,
                "root": self.root,
                "file": self.file,
                "len": len(self),
                "processing": str(self.processing_name),
                "Tokenizer": {
                    "name_or_path": getattr(self.tokenizer, "name_or_path", None),
                    "vocab_size": self.tokenizer.vocab_size,
                    "tokenizer_args": self.tokenizer_args,
                },
            },
            indent=4,
            default=str,
        )
