"""Image dataset: JPG/PNG/DICOM/NPY decode, transforms, and multi-image collation.

Parity with reference vilmedic/datasets/base/ImageDataset.py:
- per-line multi-path image lists (``read_images``, :63-78);
- train transforms Resize->RandomCrop->RandomHorizontalFlip->Normalize vs eval
  Resize->Normalize with ImageNet statistics (:80-110);
- DICOM windowing path (:126-134) via the pure-Python reader in ``dicom.py``;
- multi-image collate padding/truncating to ``multi_image`` N with zero images and
  an ``images_mask`` of (sum != 0) (:25-54).

TPU-first deltas: batches are numpy ``float32`` in **NHWC** layout (XLA's preferred
convolution layout on TPU), shapes are fully static, and transforms are plain
numpy/PIL callables resolved from a registry instead of ``eval``'d config strings.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np
import PIL
from PIL import Image, ImageFile

from ..registry import register
from .utils import load_file

ImageFile.LOAD_TRUNCATED_IMAGES = True  # tolerate truncated files (reference :21-22)
PIL.Image.MAX_IMAGE_PIXELS = None

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


# ---------------------------------------------------------------------------
# Transforms (torchvision-free)
# ---------------------------------------------------------------------------

def resize_pil(img: Image.Image, size) -> Image.Image:
    """torchvision ``Resize`` semantics: int -> smaller edge, tuple -> exact."""
    if isinstance(size, (tuple, list)):
        return img.resize((int(size[1]), int(size[0])), Image.BILINEAR)
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, int(round(h * size / w)))
    else:
        new_w, new_h = max(1, int(round(w * size / h))), size
    return img.resize((new_w, new_h), Image.BILINEAR)


def to_float_array(img: Image.Image) -> np.ndarray:
    """ToTensor semantics without the CHW permute: HWC float32 in [0, 1]."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    return arr


def normalize(arr: np.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> np.ndarray:
    return (arr - mean) / std


class TrainTransform:
    """Resize(resize) -> RandomCrop(crop) -> RandomHorizontalFlip -> Normalize."""

    def __init__(self, resize=256, crop=224, rng: Optional[np.random.Generator] = None):
        self.resize = resize
        self.crop = crop
        self.rng = rng or np.random.default_rng()

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = resize_pil(img, self.resize)
        arr = to_float_array(img)
        h, w = arr.shape[:2]
        top = int(self.rng.integers(0, max(h - self.crop, 0) + 1))
        left = int(self.rng.integers(0, max(w - self.crop, 0) + 1))
        arr = arr[top: top + self.crop, left: left + self.crop]
        if self.rng.random() < 0.5:
            arr = arr[:, ::-1]
        return normalize(arr).astype(np.float32)


class EvalTransform:
    """Resize((crop, crop)) -> Normalize."""

    def __init__(self, crop=224):
        self.crop = crop

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = resize_pil(img, (self.crop, self.crop))
        return normalize(to_float_array(img)).astype(np.float32)


class TrainTransformU8:
    """Device-preproc host half: resize smaller edge -> center square -> random
    flip, all in uint8. The random crop + normalize run on device
    (ops/image_preproc.crop_normalize), so the batch crosses the host->device
    link as uint8. NOTE: the random crop is drawn from the center square rather
    than the full aspect-preserved image — a documented, opt-in deviation."""

    def __init__(self, resize=256, crop=224, rng: Optional[np.random.Generator] = None):
        self.resize = resize
        self.crop = crop
        self.rng = rng or np.random.default_rng()

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = resize_pil(img, self.resize)
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        h, w = arr.shape[:2]
        top = (h - self.resize) // 2
        left = (w - self.resize) // 2
        arr = arr[top: top + self.resize, left: left + self.resize]
        if self.rng.random() < 0.5:
            arr = arr[:, ::-1]
        return np.ascontiguousarray(arr)


class EvalTransformU8:
    """Device-preproc host half for eval: exact resize to (crop, crop) uint8."""

    def __init__(self, crop=224):
        self.crop = crop

    def __call__(self, img: Image.Image) -> np.ndarray:
        arr = np.asarray(resize_pil(img, (self.crop, self.crop)), dtype=np.uint8)
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        return np.ascontiguousarray(arr)


def get_transforms(
    split,
    resize,
    crop,
    custom_transform_train=None,
    custom_transform_validate=None,
    ext=".jpg",
    called_by_ensemblor=False,
    device_preproc=False,
):
    """Transform selection parity with reference ImageDataset.py:80-110; custom
    transforms are registry names, not ``eval`` strings."""
    from .. import registry

    if called_by_ensemblor:
        split = "validate"

    if custom_transform_train is not None and split == "train":
        return registry.get("transform", custom_transform_train)()
    if custom_transform_validate is not None and split != "train":
        return registry.get("transform", custom_transform_validate)()
    if ext in (".npy", ".npz"):
        return lambda x: np.asarray(x, dtype=np.float32)
    if device_preproc:
        return TrainTransformU8(resize, crop) if split == "train" else EvalTransformU8(crop)
    if split == "train":
        return TrainTransform(resize, crop)
    return EvalTransform(crop)


# ---------------------------------------------------------------------------
# IO
# ---------------------------------------------------------------------------

def open_image(image, ext: str):
    """Decode one image (reference ImageDataset.py:113-144)."""
    if isinstance(image, Image.Image):
        return image if image.mode == "RGB" else image.convert("RGB")
    if ext in (".jpg", ".jpeg", ".png"):
        return Image.open(image).convert("RGB")
    if ext == ".dcm":
        from .dicom import dicom_to_uint8

        return Image.fromarray(dicom_to_uint8(image)).convert("RGB")
    if ext in (".npy", ".npz"):
        if isinstance(image, str):
            image = np.load(image)
        return np.asarray(image)
    raise NotImplementedError(f"Image extension {ext} not implemented")


def read_images(root: str, split: str, file: str) -> List[List[str]]:
    """Per-line comma-separated image path lists (reference ImageDataset.py:63-78)."""
    file_path = os.path.join(root, split + "." + file)
    if ".npy" in file_path:
        return [[x] for x in np.load(file_path)]
    images = []
    for line in load_file(file_path):
        paths = [p.strip() for p in line.split(",")]
        for p in paths:
            assert os.path.exists(p), f"Image path does not exist: {p}"
        images.append(paths)
    return images


# ---------------------------------------------------------------------------
# Collation
# ---------------------------------------------------------------------------

def vilmedic_collate(batch, multi_image: Optional[int] = None):
    """Multi-image collate with zero-pad + mask (reference ImageDataset.py:25-54).

    Returns NHWC float32 ``images`` of shape (B, H, W, C) for single-image, or
    (B, N, H, W, C) plus a boolean ``images_mask`` (B, N) for multi-image.
    """
    if not multi_image or multi_image == 1:
        return {
            "images": np.stack([np.asarray(s["image"][0]) for s in batch]).astype(np.float32),
            "images_mask": None,
        }

    new_batch, new_masks = [], []
    for sample in batch:
        sample_images = [np.asarray(im, dtype=np.float32) for im in sample["image"]]
        sample_images = sample_images[:multi_image]
        while len(sample_images) < multi_image:
            sample_images.append(np.zeros_like(sample_images[0]))
        stacked = np.stack(sample_images)
        mask = stacked.reshape(stacked.shape[0], -1).sum(axis=1) != 0
        new_batch.append(stacked)
        new_masks.append(mask)
    return {
        "images": np.stack(new_batch).astype(np.float32),
        "images_mask": np.stack(new_masks),
    }


def prepare_batch(batch, dataset):
    """Apply pending device-side preprocessing for a dataset's batches."""
    image_ds = getattr(dataset, "image", None)
    if image_ds is None and hasattr(dataset, "imgseq"):
        image_ds = dataset.imgseq.image
    if image_ds is not None and getattr(image_ds, "device_preproc", False):
        return finalize_device_preproc(batch, image_ds.crop)
    return batch


def finalize_device_preproc(batch, crop: int):
    """Convert a device-preproc batch (uint8 + crop offsets) into normalized
    float ``images`` on device; no-op for already-float batches."""
    if "images_u8" not in batch:
        return batch
    from ..ops.image_preproc import crop_normalize

    batch = dict(batch)
    images_u8 = batch.pop("images_u8")
    tops = batch.pop("preproc_tops")
    lefts = batch.pop("preproc_lefts")
    batch["images"] = crop_normalize(images_u8, tops, lefts, crop)
    return batch


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------

@register("dataset")
class ImageDataset:
    def __init__(
        self,
        root=None,
        file=None,
        split=None,
        image_path=None,
        custom_transform_train=None,
        custom_transform_validate=None,
        resize=256,
        crop=224,
        ext=".jpg",
        multi_image=None,
        called_by_ensemblor=None,
        hf_dataset=None,
        hf_field=None,
        hf_local=None,
        hf_filter=None,
        inference_only=False,
        device_preproc=False,
        **kwargs,
    ):
        assert split is not None, "Argument split cant be None"
        if inference_only:  # zoo mode: transforms only, no data files on disk
            file = None
            hf_dataset = None
        assert file is None or hf_dataset is None, (
            "You cannot have file and hf_dataset at the same time"
        )

        self.root = root
        self.file = file
        self.split = split
        self.image_path = image_path
        self.resize = int(resize)
        self.crop = int(crop)
        self.ext = ext
        self.multi_image = multi_image or 0
        self.device_preproc = bool(device_preproc)
        assert not (self.device_preproc and self.multi_image > 1), (
            "device_preproc does not support multi_image yet"
        )
        self.images: Optional[List[List]] = None

        if file is not None:
            self.images = read_images(root, split, file)

        if hf_dataset is not None:
            from .hf_plumbing import load_hf_images

            self.images = load_hf_images(
                hf_dataset, hf_local, hf_filter, hf_field, split, image_path
            )

        self.transform = get_transforms(
            split,
            self.resize,
            self.crop,
            custom_transform_train,
            custom_transform_validate,
            self.ext,
            bool(called_by_ensemblor),
            device_preproc=self.device_preproc,
        )

    def __len__(self):
        return len(self.images or [])

    def __getitem__(self, index):
        return {"image": [self.transform(open_image(im, self.ext)) for im in self.images[index]]}

    def open_raw_image(self, index: int) -> np.ndarray:
        """First image of a sample WITHOUT normalization, center-sized to the
        eval crop — for attention-overlay post-processing (the reference strips
        Normalize from the transform pipeline, post_processing.py:42-44)."""
        img = open_image(self.images[index][0], self.ext)
        img = resize_pil(img, self.crop)
        arr = np.asarray(img)
        h, w = arr.shape[:2]
        top = max((h - self.crop) // 2, 0)
        left = max((w - self.crop) // 2, 0)
        return arr[top: top + self.crop, left: left + self.crop]

    def get_collate_fn(self):
        if self.device_preproc:
            is_train = isinstance(self.transform, TrainTransformU8)
            rng = np.random.default_rng()

            def collate_fn(batch):
                # random crop applied HERE as a u8 slice: the crop itself is
                # a (crop, crop) memcpy either way, and doing it host-side
                # ships 224^2 instead of 256^2 bytes per image — 25% less
                # H2D traffic, which IS the measured loader floor on
                # bandwidth-limited links (BENCH r4: h2d_place 95 img/s vs
                # host collate 1967). The device half (crop_normalize with
                # zero offsets) reduces to the u8->f32 normalize.
                imgs = [np.asarray(s["image"][0]) for s in batch]
                b, r = len(imgs), imgs[0].shape[0]
                span = max(r - self.crop, 0)
                if is_train and span > 0:
                    tops = rng.integers(0, span + 1, b).astype(np.int32)
                    lefts = rng.integers(0, span + 1, b).astype(np.int32)
                else:
                    tops = np.zeros(b, np.int32)
                    lefts = np.zeros(b, np.int32)
                c = self.crop
                images = np.stack([
                    im[t: t + c, l: l + c]
                    for im, t, l in zip(imgs, tops, lefts)
                ])
                zeros = np.zeros(b, np.int32)
                return {
                    "images_u8": images,
                    "preproc_tops": zeros,
                    "preproc_lefts": zeros,
                    "images_mask": None,
                }

            return collate_fn

        def collate_fn(batch):
            return vilmedic_collate(batch, self.multi_image)

        return collate_fn

    def to_huggingface_processor(self):
        """Bridge the dataset's eval transform to a HF ``ViTImageProcessor``
        (reference ImageDataset.py:269-284). Returns None when a custom
        transform was provided (its geometry is not introspectable), matching
        the reference's failure contract."""
        if not isinstance(
            self.transform, (EvalTransform, EvalTransformU8, TrainTransform, TrainTransformU8)
        ):
            print("custom transforms has been provided and is not compatible with this method.")
            return None
        try:
            from transformers import ViTImageProcessor
            from transformers.image_utils import PILImageResampling

            return ViTImageProcessor(
                do_normalize=True,
                do_resize=True,
                do_rescale=True,
                image_mean=[round(float(m), 6) for m in np.ravel(IMAGENET_MEAN)],
                image_std=[round(float(s), 6) for s in np.ravel(IMAGENET_STD)],
                resample=PILImageResampling.BILINEAR,
                size=self.crop,
            )
        except Exception as e:  # tolerant contract as the reference, honest message
            print(f"could not build a ViTImageProcessor: {e}")
            return None

    def inference(self, image):
        """Build a batch from raw paths/PIL images (zoo API)."""
        if not isinstance(image, list):
            image = [image]
        batch = [
            {"image": [self.transform(open_image(im, self.ext)) for im in (ims if isinstance(ims, list) else [ims])]}
            for ims in image
        ]
        return self.get_collate_fn()(batch)

    def __repr__(self):
        return "ImageDataset\n" + json.dumps(
            {
                "split": self.split,
                "len": len(self),
                "image_path": self.image_path,
                "root": self.root,
                "file": self.file,
                "transform": type(self.transform).__name__,
                "ext": self.ext,
            },
            indent=4,
            default=str,
        )
