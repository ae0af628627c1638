"""Data layer tests: cleaners, vocab, tokenization, image collate, loader."""

import os

import numpy as np
import pytest
from PIL import Image

from vilmedic_tpu.data import DataLoader, ImSeq, TextDataset, vilmedic_collate
from vilmedic_tpu.data.processing import (
    gloria_clean_report_chexpert,
    ifcc_clean_report,
    r2gen_clean_report,
)
from vilmedic_tpu.data.utils import Labels, Vocab


def test_r2gen_clean_report():
    # Numbered-list markers stripped, punctuation removed, sentence join with ' . '
    report = "1. There is No evidence of pneumonia. 2. Heart size is normal.\n"
    assert r2gen_clean_report(report) == "there is no evidence of pneumonia . heart size is normal ."
    assert r2gen_clean_report("") == ""
    assert r2gen_clean_report("Lungs are clear.") == "lungs are clear ."


def test_ifcc_clean_report():
    assert ifcc_clean_report("No acute disease.") == "no acute disease ."


def test_gloria_clean_report():
    out = gloria_clean_report_chexpert("1. Heart is normal. 2. No effusion seen.")
    assert out == "heart is normal no effusion seen"


def test_vocab_build_and_dump(tmp_path):
    sentences = [["lungs", "clear"], ["heart", "normal", "clear"]]
    vocab = Vocab(sentences)
    assert vocab.words[:5] == ["[CLS]", "[PAD]", "[SEP]", "[UNK]", "[MASK]"]
    assert set(vocab.words[5:]) == {"lungs", "clear", "heart", "normal"}
    path = tmp_path / "vocab.tgt"
    vocab.dump(str(path))
    assert path.read_text().splitlines()[0] == "[CLS]"


def test_labels_roundtrip(tmp_path):
    labels = Labels(["cat,dog", "dog", "bird"])
    assert labels.multi_label
    p = tmp_path / "labels.tok"
    labels.dump(str(p))
    loaded = Labels().load(str(p))
    assert loaded.multi_label and set(loaded.labels) == {"cat", "dog", "bird"}


def _write_text_dataset(tmp_path, n=6):
    lines = [f"finding number {i} is clear ." for i in range(n)]
    (tmp_path / "train.report.tok").write_text("\n".join(lines))
    (tmp_path / "validate.report.tok").write_text("\n".join(lines[:2]))
    return lines


def test_text_dataset_vocab_tokenizer(tmp_path):
    _write_text_dataset(tmp_path)
    ds = TextDataset(
        root=str(tmp_path),
        file="report.tok",
        split="train",
        ckpt_dir=str(tmp_path),
        source="tgt",
        tokenizer_max_len=16,
    )
    assert os.path.exists(tmp_path / "vocab.tgt")
    batch = ds.get_collate_fn()([ds[0], ds[1]])
    assert batch["input_ids"].shape == (2, 16)  # static max_length padding
    assert batch["input_ids"].dtype == np.int32
    assert batch["attention_mask"][0].sum() > 2
    # [CLS] prefix (add_special_tokens for tgt)
    assert batch["input_ids"][0, 0] == ds.tokenizer.cls_token_id
    # decode roundtrip
    text = ds.tokenizer.decode(
        batch["input_ids"][0], skip_special_tokens=True, clean_up_tokenization_spaces=False
    )
    assert text == "finding number 0 is clear ."


def _make_images(tmp_path, n=6, size=40):
    paths = []
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        p = tmp_path / f"im{i}.jpg"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def test_multi_image_collate_mask():
    im = np.ones((8, 8, 3), dtype=np.float32)
    batch = [
        {"image": [im, im * 2]},
        {"image": [im]},
        {"image": [im, im, im]},  # truncated to 2
    ]
    out = vilmedic_collate(batch, multi_image=2)
    assert out["images"].shape == (3, 2, 8, 8, 3)
    assert out["images_mask"].tolist() == [[True, True], [True, False], [True, True]]
    # padded image is zeros
    assert out["images"][1, 1].sum() == 0


def test_imseq_end_to_end(tmp_path):
    _write_text_dataset(tmp_path)
    paths = _make_images(tmp_path)
    (tmp_path / "train.image.tok").write_text("\n".join(paths))
    ds = ImSeq(
        seq=dict(root=str(tmp_path), file="report.tok", source="tgt", tokenizer_max_len=16),
        image=dict(root=str(tmp_path), file="image.tok", resize=32, crop=28),
        split="train",
        ckpt_dir=str(tmp_path),
    )
    batch = ds.get_collate_fn()([ds[i] for i in range(3)])
    assert batch["images"].shape == (3, 28, 28, 3)  # NHWC
    assert batch["input_ids"].shape == (3, 16)


def test_dataloader_order_and_prefetch(tmp_path):
    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.asarray([i], dtype=np.int32)}

    dl = DataLoader(Toy(), batch_size=3, shuffle=False, drop_last=False, num_workers=2)
    batches = list(dl)
    assert len(batches) == 4
    assert batches[0]["x"].ravel().tolist() == [0, 1, 2]
    assert batches[-1]["x"].ravel().tolist() == [9]

    # train mode: drop_last + deterministic shuffle per epoch
    dl = DataLoader(Toy(), batch_size=3, shuffle=True, drop_last=True, num_workers=0, seed=7)
    e0 = [b["x"].ravel().tolist() for b in dl]
    dl.set_epoch(1)
    e1 = [b["x"].ravel().tolist() for b in dl]
    assert len(e0) == 3 and e0 != e1

    # per-host sharding slices each batch
    dl0 = DataLoader(Toy(), batch_size=4, shuffle=False, num_workers=0, shard_index=0, num_shards=2)
    dl1 = DataLoader(Toy(), batch_size=4, shuffle=False, num_workers=0, shard_index=1, num_shards=2)
    b0 = next(iter(dl0))["x"].ravel().tolist()
    b1 = next(iter(dl1))["x"].ravel().tolist()
    assert sorted(b0 + b1) == [0, 1, 2, 3]


def test_offline_mode_fails_fast(monkeypatch, tmp_path):
    """VILMEDIC_OFFLINE=1 -> uncached HF tokenizer names raise immediately
    instead of hitting the network with slow retries."""
    import pytest

    from vilmedic_tpu.constants import offline_mode
    from vilmedic_tpu.data.text import TextDataset

    monkeypatch.setenv("VILMEDIC_OFFLINE", "1")
    assert offline_mode()
    root = tmp_path
    (root / "train.x.tok").write_text("hello world\n")
    with pytest.raises(RuntimeError, match="VILMEDIC_OFFLINE"):
        TextDataset(
            root=str(root), file="x.tok", split="train",
            tokenizer="nonexistent/never-cached-model-xyz",
            tokenizer_max_len=16, ckpt_dir=str(root),
        )


def test_index_dataset_wrapper(tmp_path):
    """IndexDataset proto: items and batches carry the sample index
    (reference vilmedic/datasets/base/papers/IndexDataset.py:4-27)."""
    from vilmedic_tpu.data.composites import IndexDataset

    _write_text_dataset(tmp_path)
    paths = _make_images(tmp_path)
    (tmp_path / "train.image.tok").write_text("\n".join(paths))
    ds = IndexDataset(
        dataset="ImSeq",
        seq=dict(root=str(tmp_path), file="report.tok", source="tgt", tokenizer_max_len=16),
        image=dict(root=str(tmp_path), file="image.tok", resize=32, crop=28),
        split="train",
        ckpt_dir=str(tmp_path),
    )
    assert len(ds) == 6
    item = ds[4]
    assert item["index"] == 4
    batch = ds.get_collate_fn()([ds[1], ds[5]])
    assert batch["index"] == [1, 5]
    assert batch["input_ids"].shape == (2, 16)
    # attribute passthrough to the wrapped dataset
    assert ds.tokenizer is ds.dataset.tokenizer
    assert "IndexDataset" in repr(ds)


def test_to_huggingface_processor():
    """Eval-transform -> ViTImageProcessor bridge (reference ImageDataset.py:269-284);
    custom transforms return None per the reference's tolerant contract."""
    from vilmedic_tpu import registry
    from vilmedic_tpu.data.image import ImageDataset

    ds = ImageDataset(split="validate", inference_only=True, resize=256, crop=224)
    p = ds.to_huggingface_processor()
    assert p is not None
    assert p.image_mean == [0.485, 0.456, 0.406]
    assert p.image_std == [0.229, 0.224, 0.225]
    assert p.size == {"height": 224, "width": 224}

    if "_IdentityT" not in registry.available("transform"):
        @registry.register("transform")
        class _IdentityT:
            def __call__(self, img):
                return img

    ds2 = ImageDataset(split="validate", inference_only=True, custom_transform_validate="_IdentityT")
    assert ds2.to_huggingface_processor() is None


def test_device_prefetch_overlap_and_errors():
    """DevicePrefetch yields placed batches in order, overlaps place_fn with
    consumption, and propagates producer exceptions to the consumer."""
    import time

    from vilmedic_tpu.data.loader import DevicePrefetch

    import jax.numpy as jnp

    batches = [{"x": np.full((2, 3), i, np.float32)} for i in range(6)]
    placed = []

    def place(b):
        placed.append(len(placed))
        return {"x": jnp.asarray(b["x"]) + 1}

    out = list(DevicePrefetch(batches, place, depth=2))
    assert len(out) == 6
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i + 1

    # placement runs ahead of consumption (depth-2 buffer)
    seen = []

    def slow_consumer():
        it = iter(DevicePrefetch(batches, place2, depth=2))
        first = next(it)
        time.sleep(0.15)  # while we sleep, the producer fills the buffer
        seen.append(len(placed2))
        for b in it:
            pass

    placed2 = []

    def place2(b):
        placed2.append(1)
        return b

    slow_consumer()
    assert seen[0] >= 3  # first consumed + >=2 buffered ahead

    # errors surface on the consumer thread, not silently swallowed
    def bad_place(b):
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        list(DevicePrefetch(batches, bad_place))


def test_device_prefetch_early_exit():
    """Breaking out of the consumer loop does not deadlock the producer."""
    from vilmedic_tpu.data.loader import DevicePrefetch

    batches = [{"x": np.zeros(1)} for _ in range(100)]
    it = iter(DevicePrefetch(batches, lambda b: b, depth=2))
    next(it)
    it.close()  # generator close -> finally drains the producer
