"""Device image-preproc op: crop+normalize matches the host reference math."""

import numpy as np
import jax.numpy as jnp

from vilmedic_tpu.data.image import IMAGENET_MEAN, IMAGENET_STD
from vilmedic_tpu.ops.image_preproc import crop_normalize


def test_crop_normalize_matches_host():
    rng = np.random.default_rng(0)
    b, r, c = 4, 40, 32
    images = rng.integers(0, 256, (b, r, r, 3), dtype=np.uint8)
    tops = np.asarray([0, 3, 8, 5], np.int32)
    lefts = np.asarray([2, 0, 8, 7], np.int32)

    out = np.asarray(
        crop_normalize(jnp.asarray(images), jnp.asarray(tops), jnp.asarray(lefts), c)
    )
    assert out.shape == (b, c, c, 3)

    for i in range(b):
        crop_block = images[i, tops[i]: tops[i] + c, lefts[i]: lefts[i] + c].astype(
            np.float32
        ) / 255.0
        expected = (crop_block - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(out[i], expected, rtol=1e-5, atol=1e-5)
