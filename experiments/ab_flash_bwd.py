"""A/B on hardware: fused Pallas flash BACKWARD vs the dense XLA-recompute
backward (VILMEDIC_FLASH_BWD=xla) at VL-prefill train shapes.

The round-3 flash kernel was forward-only — training through the flash route
paid a full dense (Tq, Tk) attention materialization in the backward. The
round-4 backward kernels (dq blocked over query rows; dk/dv/dbias blocked
over key rows, lse residual) keep the score matrix out of HBM in both passes.

Shapes default to the DINOv2-scale causal prefix (B8 T1472 H12x64 bf16) —
override with env T/BATCH/HEADS/DIM/BLOCK. Parity is checked on-device
first; timing uses the fori_loop chaining discipline (axon tunnel dispatch
is ~4 ms/call, orders above the op).

Run: python experiments/ab_flash_bwd.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")

B = int(os.environ.get("BATCH", 8))
T = int(os.environ.get("T", 1472))
H = int(os.environ.get("HEADS", 12))
D = int(os.environ.get("DIM", 64))
BLOCK = int(os.environ.get("BLOCK", 512))
LOOP_N = 16
CAUSAL = os.environ.get("CAUSAL", "1") == "1"


@jax.jit
def _make_data():
    q = (jax.random.normal(jax.random.key(0), (B, T, H, D)) * 0.5).astype(jnp.bfloat16)
    k = (jax.random.normal(jax.random.key(1), (B, T, H, D)) * 0.5).astype(jnp.bfloat16)
    v = (jax.random.normal(jax.random.key(2), (B, T, H, D)) * 0.5).astype(jnp.bfloat16)
    return q, k, v


def build_step(impl):
    """One fwd+bwd through the flash route with the given backward impl.
    Chains by feeding -grad back into q so fori_loop iterations depend."""
    os.environ["VILMEDIC_FLASH_BWD"] = impl
    jax.clear_caches()
    from vilmedic_tpu.ops.flash_attention import flash_attention

    def loss(q, k, v):
        out = flash_attention(q, k, v, block_q=BLOCK, block_k=BLOCK,
                              causal=CAUSAL)
        return (out.astype(jnp.float32) ** 2).sum()

    grad_fn = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def chained(q, k, v):
        def body(_, carry):
            q, k, v = carry
            dq, dk, dv = grad_fn(q, k, v)
            scale = jnp.float32(1e-6)
            return (q - (scale * dq.astype(jnp.float32)).astype(q.dtype),
                    k - (scale * dk.astype(jnp.float32)).astype(k.dtype),
                    v - (scale * dv.astype(jnp.float32)).astype(v.dtype))
        return jax.lax.fori_loop(0, LOOP_N, body, (q, k, v))

    return grad_fn, chained


def main():
    q, k, v = _make_data()
    np.asarray(v[0, 0, 0])  # force resident
    print(f"B{B} T{T} H{H}x{D} block {BLOCK} causal={CAUSAL}")

    # ---- parity (on-device max |delta| between the two backends) ----
    grad_pallas, chained_pallas = build_step("pallas")
    gp = jax.jit(grad_pallas)(q, k, v)
    gp = [g.astype(jnp.float32) for g in gp]
    _ = [np.asarray(g[0, 0, 0, 0]) for g in gp]
    grad_xla, chained_xla = build_step("xla")
    gx = jax.jit(grad_xla)(q, k, v)
    for name, a, b in zip("q k v".split(), gp, gx):
        delta = float(jnp.max(jnp.abs(a - b.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(b.astype(jnp.float32))))
        print(f"  d{name}: max|pallas-xla| = {delta:.3e}  (max|xla| {ref:.3e})")

    # ---- timing ----
    results = {}
    for impl in ("xla", "pallas"):
        _, chained = build_step(impl)
        out = chained(q, k, v)
        np.asarray(out[0][0, 0, 0])  # compile + warm
        t0 = time.perf_counter()
        out = chained(q, k, v)
        np.asarray(out[0][0, 0, 0])
        dt = (time.perf_counter() - t0) / LOOP_N
        results[impl] = dt
        print(f"  {impl:6s} fwd+bwd: {dt * 1e6:9.1f} us/step")
    print(f"  speedup: {results['xla'] / results['pallas']:.2f}x")


if __name__ == "__main__":
    main()
