"""Spike: does this toolchain's Mosaic support float8_e4m3fn VMEM refs,
astype conversions, and DMA copies on v5e? Decides whether the generated-
token KV cache can ride fp8 storage (scale-free 2x traffic cut; accuracy
measured separately at task level).

Run: python experiments/spike_fp8_cache.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f8 = jnp.float8_e4m3fn

    def kernel(x_ref, o_ref):
        # f8 -> f32 load/convert, compute, convert back
        x = x_ref[...].astype(jnp.float32)
        o_ref[...] = (x * 2.0).astype(o_ref.dtype)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(128, 256)),
                    jnp.bfloat16).astype(f8)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 256), f8),
        )(x)
        got = np.asarray(out.astype(jnp.float32))
        want = np.asarray(x.astype(jnp.float32)) * 2.0
        err = np.max(np.abs(got - want) / (np.abs(want) + 1e-6))
        print(f"fp8 VMEM + astype: OK, max rel err {err:.4f}")
    except Exception as e:
        print(f"fp8 VMEM kernel FAILED: {type(e).__name__}: {e}"[:500])
        return

    # matmul path: f8 slab -> bf16 -> MXU dot
    def mm_kernel(a_ref, b_ref, o_ref):
        a = a_ref[...].astype(jnp.bfloat16)
        b = b_ref[...].astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    a = jnp.asarray(np.random.default_rng(1).normal(size=(128, 128)),
                    jnp.bfloat16).astype(f8)
    b = jnp.asarray(np.random.default_rng(2).normal(size=(128, 128)),
                    jnp.bfloat16)
    try:
        out = pl.pallas_call(
            mm_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(a, b.astype(f8))
        ref = np.asarray(a.astype(jnp.float32)) @ np.asarray(
            b.astype(f8).astype(jnp.float32))
        err = np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-3))
        print(f"fp8->bf16 MXU dot: OK, max rel err {err:.4f}")
    except Exception as e:
        print(f"fp8 matmul kernel FAILED: {type(e).__name__}: {e}"[:500])

    # async-copy an f8 HBM slab into VMEM scratch (the cache-slab pattern)
    def dma_kernel(x_hbm, o_ref, buf, sem):
        cp = pltpu.make_async_copy(x_hbm.at[0:8], buf, sem)
        cp.start()
        cp.wait()
        o_ref[...] = buf[...].astype(jnp.float32)

    try:
        out = pl.pallas_call(
            dma_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 256), f8),
                            pltpu.SemaphoreType.DMA],
        )(x.reshape(128, 256)[:16])
        want = np.asarray(x.astype(jnp.float32))[:8]
        err = np.max(np.abs(np.asarray(out) - want))
        print(f"fp8 HBM->VMEM DMA: OK, max abs err {err:.4f}")
    except Exception as e:
        print(f"fp8 DMA FAILED: {type(e).__name__}: {e}"[:500])


if __name__ == "__main__":
    main()
