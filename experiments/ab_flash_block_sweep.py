"""Block-size sweep for the flash kernel's fwd+bwd at the VL-prefill shape.

The 512/512 default was tuned on the FORWARD at T=2048
(ops/flash_attention.py:448). The fused Pallas backward reuses the same
blocks, but its kernels hold more per-block VMEM state (dq: k/v/do blocks +
the q-row accumulator; dkv: q/do blocks + two accumulators), so the optimal
point may differ. This times one jitted fwd+bwd (value_and_grad of a scalar
readout) at B8·T1472·H12×64 bf16 causal across block combinations, with a
fori-chained inner loop so the axon tunnel's per-dispatch latency stays out
of the numbers.

Run: python experiments/ab_flash_block_sweep.py
Env: B, T, H, D, REPS override the shape.
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

B = int(os.environ.get("B", 8))
T = int(os.environ.get("T", 1472))
H = int(os.environ.get("H", 12))
D = int(os.environ.get("D", 64))
REPS = int(os.environ.get("REPS", 10))


def main():
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (B, T, H, D)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)

    def step(bq, bk, q, k, v):
        def loss(q):
            o = flash_attention(q, k, v, block_q=bq, block_k=bk, causal=True)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        return jax.grad(loss)(q)

    print(f"fwd+bwd B{B} T{T} H{H}x{D} bf16 causal, {REPS} chained reps")
    results = {}
    for bq in (256, 512, 1024):
        for bk in (256, 512, 1024):
            if bq > T or bk > T:
                continue

            @jax.jit
            def timed(q, k, v, bq=bq, bk=bk):
                # chain through q so XLA can't parallelize the reps
                def body(_, q):
                    dq = step(bq, bk, q, k, v)
                    return q + 0.0 * dq.astype(q.dtype)

                return jax.lax.fori_loop(0, REPS, body, q)

            try:
                np.asarray(timed(q, k, v)[0, 0, 0])  # compile + warm
                t0 = time.perf_counter()
                np.asarray(timed(q, k, v)[0, 0, 0])
                us = (time.perf_counter() - t0) / REPS * 1e6
                results[(bq, bk)] = us
                print(f"  block_q={bq:>4d} block_k={bk:>4d}: {us:8.0f} us/step",
                      flush=True)
            except Exception as e:
                print(f"  block_q={bq:>4d} block_k={bk:>4d}: FAILED {e!r:.120}",
                      flush=True)
    if results:
        (bq, bk), best = min(results.items(), key=lambda kv: kv[1])
        base = results.get((512, 512))
        rel = f" ({best / base:.2f}x of 512/512)" if base else ""
        print(f"best: block_q={bq} block_k={bk} at {best:.0f} us{rel}")


if __name__ == "__main__":
    main()
