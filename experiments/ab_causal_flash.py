"""A/B on hardware: causal flash kernel vs XLA dense-bias attention for the
VisionLanguage prefill-shaped workload (long causal self-attention).

Shapes default to the DINOv2-scale prefix (T=1472 rows = 1371 prefix tokens
padded contextually, H=12 heads x 64 dim, bf16) — override with env
T/BATCH/HEADS/DIM. Checks parity first (on-device reduction), then times both
routes with the fori_loop chaining discipline (per-call dispatch over the
axon tunnel is ~4 ms, two orders above the program).

Run: python experiments/ab_causal_flash.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vilmedic_tpu.ops.attention import NEG_INF
from vilmedic_tpu.ops.flash_attention import flash_attention

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")

B = int(os.environ.get("BATCH", 8))
T = int(os.environ.get("T", 1472))
H = int(os.environ.get("HEADS", 12))
D = int(os.environ.get("DIM", 64))
BLOCK = int(os.environ.get("BLOCK", 512))
LOOP_N = 16


@jax.jit
def _make_data():
    q = (jax.random.normal(jax.random.key(0), (B, T, H, D)) * 0.5).astype(jnp.bfloat16)
    k = (jax.random.normal(jax.random.key(1), (B, T, H, D)) * 0.5).astype(jnp.bfloat16)
    v = (jax.random.normal(jax.random.key(2), (B, T, H, D)) * 0.5).astype(jnp.bfloat16)
    return q, k, v


q, k, v = _make_data()
np.asarray(v[0, 0, 0])


def xla_attention(q, k, v):
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32) * (D ** -0.5),
        k.astype(jnp.float32), preferred_element_type=jnp.float32,
    )
    row = jnp.arange(T)[:, None]
    col = jnp.arange(T)[None, :]
    scores = scores + jnp.where(col <= row, 0.0, NEG_INF)[None, None]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def flash(q, k, v):
    return flash_attention(q, k, v, causal=True, block_q=BLOCK, block_k=BLOCK)


@jax.jit
def compare(q, k, v):
    a = xla_attention(q, k, v).astype(jnp.float32)
    b = flash(q, k, v).astype(jnp.float32)
    return jnp.max(jnp.abs(a - b)), jnp.mean(jnp.abs(a))


def make_loop(route):
    @jax.jit
    def loop(q, k, v):
        def body(i, carry):
            q, acc = carry
            out = route(q, k, v)
            s = out.astype(jnp.float32).sum()
            q = q + (s * 1e-30).astype(q.dtype)
            return q, acc + s

        return jax.lax.fori_loop(0, LOOP_N, body, (q, 0.0))

    return loop


def timeit(fn, label, outer=3):
    np.asarray(fn(q, k, v)[1])  # compile + warm
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        out = fn(q, k, v)
        np.asarray(out[1])
        best = min(best, (time.perf_counter() - t0) / LOOP_N)
    print(f"{label}: {best * 1e6:.1f} us/call", flush=True)


def main():
    err, scale = (float(x) for x in np.asarray(compare(q, k, v)))
    print(f"max |xla - flash| = {err:.2e} (mean |out| {scale:.3f})", flush=True)
    assert err < 3e-2 * max(scale, 1.0), err  # bf16 output rounding
    timeit(make_loop(xla_attention), f"XLA dense-bias causal (B{B} T{T} H{H}x{D})")
    timeit(make_loop(flash), f"flash causal block={BLOCK}")


if __name__ == "__main__":
    main()
