"""Fused on-device image preprocessing (BASELINE.md north star #2).

The reference does all image preprocessing on CPU workers in float32
(reference vilmedic/datasets/base/ImageDataset.py:80-110: torchvision
Resize/RandomCrop/HFlip/ToTensor/Normalize). TPU-native split:
- host: decode (JPEG/PNG/DICOM) and resize to a fixed (R, R) uint8 canvas —
  PIL-bound, unavoidable on host; horizontal flips are free u8 views;
- device: crop + u8->f32 + ImageNet normalize as ONE Pallas kernel, so the batch
  crosses PCIe/DMA as uint8 (4x less than f32) and the float math never touches
  HBM twice.

Layout note: channels-last (…, 3) would force Mosaic to tile a 3-wide lane axis;
the kernel instead views each image as (R, 3R) with interleaved RGB columns, so
the lane dimension is 3R (a multiple of 128 for the standard 256 -> 224 pipeline
is not required — Mosaic pads once), and per-channel mean/std become (1, 3C)
rows with period-3 structure computed once on the host.

``crop_normalize`` compiles the Pallas path and transparently falls back to an
XLA implementation (same math) on backends where Mosaic is unavailable.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.image import IMAGENET_MEAN, IMAGENET_STD


def _mean_std_rows(crop: int, mean, std) -> Tuple[np.ndarray, np.ndarray]:
    mean_row = np.tile(np.asarray(mean, np.float32), crop)[None, :]
    std_row = np.tile(np.asarray(std, np.float32), crop)[None, :]
    return mean_row, std_row


def _pallas_crop_normalize(images_u8, tops, lefts, crop, mean_row, std_row):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, r, r3 = images_u8.shape
    c3 = crop * 3

    def kernel(tops_ref, lefts_ref, img_ref, mean_ref, std_ref, out_ref):
        i = pl.program_id(0)
        top = tops_ref[i]
        left3 = lefts_ref[i] * 3
        # Row crop as a ref slice (sublane ds); column crop as a value-level
        # dynamic_slice (Mosaic rejects dynamic lane offsets on refs), u8 cast
        # staged through int32.
        # Dynamic crops as roll+static-slice: this toolchain's Mosaic rejects
        # dynamic `pl.ds` ref offsets, but dynamic rotates lower fine.
        x = img_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
        x = pltpu.roll(x, -top, axis=0)[:crop, :]
        block = pltpu.roll(x, -left3, axis=1)[:, :c3]
        out_ref[0] = (block - mean_ref[:]) / std_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, r, r3), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, crop, c3), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, crop, c3), jnp.float32),
    )(tops, lefts, images_u8, mean_row, std_row)


def _xla_crop_normalize(images_u8, tops, lefts, crop, mean_row, std_row):
    c3 = crop * 3

    def one(img, top, left):
        block = jax.lax.dynamic_slice(img, (top, left * 3), (crop, c3))
        x = block.astype(jnp.float32) / 255.0
        return (x - mean_row[0]) / std_row[0]

    return jax.vmap(one)(images_u8, tops, lefts)


@functools.partial(jax.jit, static_argnames=("crop", "use_pallas"))
def _crop_normalize_impl(images_u8, tops, lefts, mean_row, std_row, crop, use_pallas):
    if use_pallas:
        out = _pallas_crop_normalize(images_u8, tops, lefts, crop, mean_row, std_row)
    else:
        out = _xla_crop_normalize(images_u8, tops, lefts, crop, mean_row, std_row)
    b = out.shape[0]
    return out.reshape(b, crop, crop, 3)


def crop_normalize(
    images_u8: jnp.ndarray,  # (B, R, R, 3) uint8, flips already applied on host
    tops: jnp.ndarray,  # (B,) int32 crop offsets
    lefts: jnp.ndarray,  # (B,) int32
    crop: int,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """(B, R, R, 3) u8 -> (B, crop, crop, 3) f32 normalized, on device."""
    b, r, _, ch = images_u8.shape
    assert ch == 3
    flat = images_u8.reshape(b, r, r * 3)
    mean_row, std_row = _mean_std_rows(crop, mean, std)
    if use_pallas is None:
        # Default to the XLA path: XLA fuses dynamic_slice+convert+normalize
        # into one kernel already, and this image's Mosaic toolchain rejects
        # dynamic `pl.ds` ref offsets (remote-compile crash), leaving only a
        # slower roll-based formulation. The Pallas path stays available for
        # experimentation via VILMEDIC_TPU_PALLAS_PREPROC=1.
        use_pallas = os.environ.get("VILMEDIC_TPU_PALLAS_PREPROC") == "1"
    try:
        return _crop_normalize_impl(
            flat, tops.astype(jnp.int32), lefts.astype(jnp.int32),
            jnp.asarray(mean_row), jnp.asarray(std_row), crop, use_pallas,
        )
    except Exception:
        if not use_pallas:
            raise
        return _crop_normalize_impl(
            flat, tops.astype(jnp.int32), lefts.astype(jnp.int32),
            jnp.asarray(mean_row), jnp.asarray(std_row), crop, False,
        )
