"""Composite datasets merging base datasets' items and collates.

Parity with reference vilmedic/datasets/{ImSeq,Seq2Seq,ImSeq2Seq,ImLabel,
ImSeqLabel,ImSeqAny}.py: each composite merges its children's ``__getitem__`` and
collate outputs, exposes tokenizer attributes for models/eval loops, and provides
``inference()`` for the zoo API. The Seq2Seq target collate renames its keys to
``decoder_input_ids``/``decoder_attention_mask`` (reference Seq2Seq.py:21-24).
"""

from __future__ import annotations

from ..registry import register
from .anyfield import AnyDataset
from .image import ImageDataset
from .label import LabelDataset
from .text import TextDataset


def _merge_collates(*collate_fns):
    def collate_fn(batch):
        out = {}
        for fn in collate_fns:
            out.update(fn(batch))
        return out

    return collate_fn


def _check_batch(batch):
    sizes = {len(v) for v in batch.values() if v is not None}
    assert len(sizes) <= 1, "elements in batch do not have the same size"
    return batch


@register("dataset")
class ImSeq:
    """Image + sequence (reference ImSeq.py:8-50)."""

    def __init__(self, seq, image, split, ckpt_dir=None, called_by_ensemblor=False, **kwargs):
        self.split = split
        self.seq = TextDataset(**_as_dict(seq), split=split, ckpt_dir=ckpt_dir)
        self.image = ImageDataset(
            **_as_dict(image), split=split, called_by_ensemblor=called_by_ensemblor
        )
        assert len(self.image) == len(self.seq)

        self.tokenizer = self.seq.tokenizer
        self.tokenizer_max_len = self.seq.tokenizer_max_len
        self.tokenizer_args = self.seq.tokenizer_args

    def __len__(self):
        return len(self.image)

    def __getitem__(self, index):
        return {**self.image[index], **self.seq[index]}

    def get_collate_fn(self):
        return _merge_collates(self.seq.get_collate_fn(), self.image.get_collate_fn())

    def inference(self, seq=None, image=None):
        if seq is None and image is None:
            return {}
        batch = {}
        if image is not None:
            batch.update(self.image.inference(image))
        if seq is not None:
            batch.update(self.seq.inference(seq))
        return _check_batch(batch)

    def __repr__(self):
        return "ImSeq\n" + str(self.seq) + "\n" + str(self.image)


@register("dataset")
class Seq2Seq:
    """Source + target sequences (reference Seq2Seq.py:5-50)."""

    def __init__(self, src, tgt, split, ckpt_dir=None, **kwargs):
        self.split = split
        self.src = TextDataset(**_as_dict(src), split=split, ckpt_dir=ckpt_dir, source="src")
        self.tgt = TextDataset(**_as_dict(tgt), split=split, ckpt_dir=ckpt_dir, source="tgt")
        assert len(self.src) == len(self.tgt), (len(self.src), len(self.tgt))

        self.tgt_tokenizer = self.tgt.tokenizer
        self.tgt_tokenizer_max_len = self.tgt.tokenizer_max_len

    def __len__(self):
        return len(self.src)

    def __getitem__(self, index):
        return {**self.src[index], **self.tgt[index]}

    def _tgt_collate(self):
        tgt_fn = self.tgt.get_collate_fn()

        def collate_fn(batch):
            tgt = tgt_fn(batch)
            return {
                "decoder_input_ids": tgt.pop("input_ids"),
                "decoder_attention_mask": tgt.pop("attention_mask"),
            }

        return collate_fn

    def get_collate_fn(self):
        return _merge_collates(self.src.get_collate_fn(), self._tgt_collate())

    def inference(self, src=None, tgt=None):
        if src is None and tgt is None:
            return {}
        batch = {}
        if src is not None:
            batch.update(self.src.inference(src))
        if tgt is not None:
            t = self.tgt.inference(tgt)
            batch["decoder_input_ids"] = t.pop("input_ids")
            batch["decoder_attention_mask"] = t.pop("attention_mask")
        return _check_batch(batch)

    def __repr__(self):
        return "Seq2Seq\n" + str(self.src) + "\n" + str(self.tgt)


@register("dataset")
class ImSeq2Seq:
    """Image + source + target (reference ImSeq2Seq.py:7)."""

    def __init__(self, src, tgt, image, split, ckpt_dir=None, called_by_ensemblor=False, **kwargs):
        self.split = split
        self.seq2seq = Seq2Seq(src, tgt, split=split, ckpt_dir=ckpt_dir)
        self.image = ImageDataset(
            **_as_dict(image), split=split, called_by_ensemblor=called_by_ensemblor
        )
        assert len(self.image) == len(self.seq2seq)

        self.src = self.seq2seq.src
        self.tgt = self.seq2seq.tgt
        self.tgt_tokenizer = self.seq2seq.tgt_tokenizer
        self.tgt_tokenizer_max_len = self.seq2seq.tgt_tokenizer_max_len

    def __len__(self):
        return len(self.image)

    def __getitem__(self, index):
        return {**self.image[index], **self.seq2seq[index]}

    def get_collate_fn(self):
        return _merge_collates(self.seq2seq.get_collate_fn(), self.image.get_collate_fn())

    def inference(self, src=None, tgt=None, image=None):
        batch = {}
        if image is not None:
            batch.update(self.image.inference(image))
        batch.update(self.seq2seq.inference(src=src, tgt=tgt))
        return _check_batch(batch)

    def __repr__(self):
        return "ImSeq2Seq\n" + str(self.seq2seq) + "\n" + str(self.image)


@register("dataset")
class ImLabel:
    """Image + label (reference ImLabel.py)."""

    def __init__(self, label, image, split, ckpt_dir=None, called_by_ensemblor=False, **kwargs):
        self.split = split
        self.image = ImageDataset(
            **_as_dict(image), split=split, called_by_ensemblor=called_by_ensemblor
        )
        self.label = LabelDataset(**_as_dict(label), split=split, ckpt_dir=ckpt_dir)
        assert len(self.image) == len(self.label)
        self.labels_map = self.label.labels_map

    def __len__(self):
        return len(self.image)

    def __getitem__(self, index):
        return {**self.image[index], **self.label[index]}

    def get_collate_fn(self):
        return _merge_collates(self.image.get_collate_fn(), self.label.get_collate_fn())

    def inference(self, image=None, label=None):
        batch = {}
        if image is not None:
            batch.update(self.image.inference(image))
        if label is not None:
            batch.update(self.label.inference(label))
        return _check_batch(batch)

    def __repr__(self):
        return "ImLabel\n" + str(self.image) + "\n" + str(self.label)


@register("dataset")
class ImSeqLabel:
    """Image + sequence + label (reference ImSeqLabel.py:8)."""

    def __init__(self, seq, label, image, split, ckpt_dir=None, called_by_ensemblor=False, **kwargs):
        self.split = split
        self.imgseq = ImSeq(
            seq, image, split=split, ckpt_dir=ckpt_dir, called_by_ensemblor=called_by_ensemblor
        )
        self.label = LabelDataset(**_as_dict(label), split=split, ckpt_dir=ckpt_dir)
        assert len(self.imgseq) == len(self.label)

        self.tokenizer = self.imgseq.tokenizer
        self.tokenizer_max_len = self.imgseq.tokenizer_max_len
        self.tokenizer_args = self.imgseq.tokenizer_args

    def __len__(self):
        return len(self.label)

    def __getitem__(self, index):
        return {**self.imgseq[index], **self.label[index]}

    def get_collate_fn(self):
        return _merge_collates(self.imgseq.get_collate_fn(), self.label.get_collate_fn())

    def __repr__(self):
        return "ImSeqLabel\n" + str(self.imgseq) + "\n" + str(self.label)


@register("dataset")
class ImSeqAny:
    """Image + sequence + untyped payload (reference ImSeqAny.py:6)."""

    def __init__(self, seq, image, any, split, ckpt_dir=None, called_by_ensemblor=False, **kwargs):
        self.split = split
        self.imgseq = ImSeq(
            seq, image, split=split, ckpt_dir=ckpt_dir, called_by_ensemblor=called_by_ensemblor
        )
        self.any = AnyDataset(**_as_dict(any), split=split)
        assert len(self.imgseq) == len(self.any)

        self.tokenizer = self.imgseq.tokenizer
        self.tokenizer_max_len = self.imgseq.tokenizer_max_len
        self.tokenizer_args = self.imgseq.tokenizer_args

    def __len__(self):
        return len(self.any)

    def __getitem__(self, index):
        return {**self.imgseq[index], **self.any[index]}

    def get_collate_fn(self):
        return _merge_collates(self.imgseq.get_collate_fn(), self.any.get_collate_fn())

    def __repr__(self):
        return "ImSeqAny\n" + str(self.imgseq) + "\n" + str(self.any)


@register("dataset")
class IndexDataset:
    """Wrap any registered dataset proto so items/batches carry their index.

    Parity with reference vilmedic/datasets/base/papers/IndexDataset.py:4-27,
    which builds a dynamic subclass via ``type(..., (ActualIndexDataset,
    eval(dataset), object))``. Here the wrapped proto is resolved from the
    dataset registry and composed (no eval, no dynamic MRO): ``__getitem__``
    adds an ``index`` key and the collate appends the batch's index list,
    everything else delegates to the wrapped dataset.
    """

    def __init__(self, dataset, **kwargs):
        from .. import registry

        self.dataset = registry.get("dataset", dataset)(**kwargs)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index):
        return {**self.dataset[index], "index": index}

    def get_collate_fn(self):
        inner = self.dataset.get_collate_fn()

        def collate_fn(batch):
            return {**inner(batch), "index": [s["index"] for s in batch]}

        return collate_fn

    def __getattr__(self, name):
        # Tokenizer/label attributes etc. pass through to the wrapped dataset.
        dataset = self.__dict__.get("dataset")
        if dataset is None:  # probed before __init__ finished (or unpickling)
            raise AttributeError(name)
        return getattr(dataset, name)

    def __repr__(self):
        return "IndexDataset with original dataset being: \n" + repr(self.dataset)


def _as_dict(cfg):
    from ..config.config import Config

    if isinstance(cfg, Config):
        return cfg.to_dict()
    return dict(cfg)
