"""Split the VL-518 batch cost into vision tower / decoder prefill / decode
loop — the r4 analysis attributed per-step decode costs but never measured
prefill, and the r5 trace shows the while loop is only ~56% of the batch.

Run: BENCH_VL_BATCH=16 BENCH_VL_IMAGE=518 BENCH_VL_PATCH=14 \
     python experiments/profile_vl_split.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from vilmedic_tpu.models.vision_language import VisionLanguageModule


def _sync(out):
    # one-element readback: syncing on a full leaf bills the ~20-35 MB/s
    # tunnel transfer to the measurement (performance.md bench rules)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timeit(fn, *args, n=5, label=""):
    _sync(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        _sync(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:32s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")
    module, variables, generate, batch, vl_image, n_prefix = bench.build_vl()
    images = jax.jit(lambda key: jax.random.normal(
        key, (batch, vl_image, vl_image, 3), jnp.float32
    ))(jax.random.key(1))
    np.asarray(images[0, 0, 0])

    vision_fn = jax.jit(lambda v, im: module.apply(
        v, im, method=VisionLanguageModule.image_prefix
    ))
    prefill_fn = jax.jit(lambda v, im: module.apply(
        v, im, bench.MAX_LEN, method=VisionLanguageModule.prefill
    ))
    prefill_int8 = jax.jit(lambda v, im: module.apply(
        v, im, bench.MAX_LEN, quantize_prefix=True,
        method=VisionLanguageModule.prefill,
    ))

    t_vision = timeit(vision_fn, variables, images, label="vision tower (image_prefix)")
    t_prefill = timeit(prefill_fn, variables, images, label="full prefill (tower+12L)")
    timeit(prefill_int8, variables, images, label="full prefill int8")
    t_batch = timeit(generate, variables, images, label="full generate (beam 8)")
    print(f"\nprefill share {t_prefill / t_batch * 100:.1f}%  "
          f"decode {1e3 * (t_batch - t_prefill):.1f} ms "
          f"({1e3 * (t_batch - t_prefill) / bench.MAX_LEN * 1e3:.0f} us/step)  "
          f"tower-only share {t_vision / t_batch * 100:.1f}%  "
          f"rep/s {batch / t_batch:.1f}")


if __name__ == "__main__":
    main()
