"""Forward-only flash comparison at the VL-518 prefill shapes: our v2 kernel
(block sweep) vs the jax-shipped pallas kernels (legacy flash_attention and
splash attention), timings INCLUSIVE of any layout transposes from the
projections' native (B, T, H, D).

The r5 trace showed _flash_bthd at ~2.09 ms/layer for (16, 1371, 12, 64) —
~34% of the zero-padded MXU bound — and prefill flash is 46 ms of the 264 ms
VL-518 batch, the single biggest non-decode cost.

Run: python experiments/ab_flash_vs_library.py
Env: B, T, H, D, CAUSAL, REPS.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")

from vilmedic_tpu.ops.flash_attention import flash_attention

B = int(os.environ.get("B", 16))
T = int(os.environ.get("T", 1371))
H = int(os.environ.get("H", 12))
D = int(os.environ.get("D", 64))
CAUSAL = bool(int(os.environ.get("CAUSAL", 0)))
REPS = int(os.environ.get("REPS", 10))


def timed(fn, q, k, v, label):
    @jax.jit
    def chain(q, k, v):
        def body(_, q):
            o = fn(q, k, v)
            return q + 0.0 * o.astype(q.dtype)
        return jax.lax.fori_loop(0, REPS, body, q)

    try:
        np.asarray(chain(q, k, v)[0, 0, 0])  # compile + warm
        t0 = time.perf_counter()
        np.asarray(chain(q, k, v)[0, 0, 0])
        us = (time.perf_counter() - t0) / REPS * 1e6
        flops = 4 * B * H * T * T * D * (0.5 if CAUSAL else 1.0)
        print(f"  {label:42s} {us:9.0f} us  ({flops / us / 1e6:6.1f} TFLOP/s)",
              flush=True)
        return us
    except Exception as e:
        print(f"  {label:42s} FAILED {e!r:.160}", flush=True)
        return None


def main():
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (B, T, H, D)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)
    print(f"B{B} T{T} H{H}x{D} bf16 causal={CAUSAL}, {REPS} chained reps")

    for bq, bk in ((512, 512), (256, 256), (128, 128), (128, 512), (512, 128),
                   (256, 512), (1408, 128), (128, 1408)):
        timed(functools.partial(flash_attention, block_q=bq, block_k=bk,
                                causal=CAUSAL),
              q, k, v, f"ours v2 block {bq}/{bk}")

    # legacy jax pallas flash: (B, H, T, D) layout, includes the transpose
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention as lfa

        def legacy(q, k, v, bq, bkm, bkv):
            qt = jnp.swapaxes(q, 1, 2)
            kt = jnp.swapaxes(k, 1, 2)
            vt = jnp.swapaxes(v, 1, 2)
            bs = lfa.BlockSizes(
                block_q=bq, block_k_major=bkm, block_k=bkv,
                block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bkm,
                block_q_dkv=bq, block_k_dkv=bkv,
                block_q_dq=bq, block_k_dq=bkv, block_k_major_dq=bkm,
            )
            o = lfa.flash_attention(qt, kt, vt, causal=CAUSAL,
                                    sm_scale=D ** -0.5, block_sizes=bs)
            return jnp.swapaxes(o, 1, 2)

        for bq, bk in ((512, 512), (256, 256), (128, 128)):
            timed(functools.partial(legacy, bq=bq, bkm=bk, bkv=bk), q, k, v,
                  f"jax legacy flash {bq}/{bk} (+transpose)")
    except Exception as e:
        print(f"  legacy unavailable: {e!r:.120}")

    # splash attention: per-batch vmap over (H, T, D)
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        def splash(q, k, v):
            mask_cls = sm.CausalMask if CAUSAL else sm.FullMask
            mask = sm.MultiHeadMask(
                [mask_cls((T, T)) if CAUSAL else sm.FullMask((T, T))
                 for _ in range(H)]
            )
            kernel = sk.make_splash_mha(
                mask=mask, head_shards=1, q_seq_shards=1)
            qt = jnp.swapaxes(q, 1, 2) * (D ** -0.5)
            kt = jnp.swapaxes(k, 1, 2)
            vt = jnp.swapaxes(v, 1, 2)
            o = jax.vmap(kernel)(qt, kt, vt)
            return jnp.swapaxes(o, 1, 2)

        timed(splash, q, k, v, "jax splash (+transpose)")
    except Exception as e:
        print(f"  splash unavailable: {e!r:.120}")

    # dense XLA reference point
    from vilmedic_tpu.ops import attention as att

    def dense(q, k, v):
        scale = D ** -0.5
        s = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                       preferred_element_type=jnp.float32)
        if CAUSAL:
            row = jnp.arange(T)[:, None]
            col = jnp.arange(T)[None, :]
            s = s + jnp.where(col <= row, 0.0, att.NEG_INF)[None, None]
        w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", w, v)

    timed(dense, q, k, v, "dense XLA")


if __name__ == "__main__":
    main()
