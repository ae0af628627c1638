"""A/B the flash kernels' matmul dtype at the VL-518 prefill shape.

The kernels now run their dot_generals in the INPUT dtype (f32 accumulation);
upcasting bf16 operands to f32 first — the pre-r5 behavior — made every score
matmul a multi-pass f32 MXU op. f32 inputs reproduce the old timing exactly,
so this is a true before/after on one binary.

The op is iterated inside ONE jit (lax.scan feeding the output back as q) —
per-program tunnel dispatch is ~4-50 ms, far larger than the kernel
(performance.md bench rules).

Run: python experiments/ab_flash_dtype.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vilmedic_tpu.ops.flash_attention import flash_attention

ITERS = 20


def bench(dtype, t, b=16, h=12, d=64, causal=True, bwd=False):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), dtype)
    k = jnp.asarray(rng.normal(size=(b, t, h, d)), dtype)
    v = jnp.asarray(rng.normal(size=(b, t, h, d)), dtype)

    if bwd:
        grad = jax.grad(
            lambda q, k, v: flash_attention(q, k, v, causal=causal)
            .astype(jnp.float32).sum(), argnums=(0, 1, 2))

        def body(carry, _):
            dq, dk, dv = grad(*carry)
            return (dq.astype(dtype), dk.astype(dtype), dv.astype(dtype)), ()
    else:
        def body(carry, _):
            q, k, v = carry
            out = flash_attention(q, k, v, causal=causal)
            return (out.astype(dtype), k, v), ()

    @jax.jit
    def run(q, k, v):
        (q, k, v), _ = jax.lax.scan(body, (q, k, v), None, length=ITERS)
        return q

    np.asarray(run(q, k, v)[0, 0, 0])  # compile
    t0 = time.perf_counter()
    np.asarray(run(q, k, v)[0, 0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    flops = (4 if not bwd else 10) * b * h * t * t * d / (2 if causal else 1)
    name = dtype.__name__ if hasattr(dtype, "__name__") else str(dtype)
    print(f"  {name:9s} t={t:5d} {'fwd+bwd' if bwd else 'fwd    '}"
          f" {dt * 1e3:8.2f} ms  {flops / dt / 1e12:6.1f} TFLOP/s-equiv")
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")
    for t in (512, 1536):
        for bwd in (False, True):
            f32 = bench(jnp.float32, t, bwd=bwd)
            bf16 = bench(jnp.bfloat16, t, bwd=bwd)
            print(f"  -> bf16/f32 speedup x{f32 / bf16:.2f}\n")


if __name__ == "__main__":
    main()
