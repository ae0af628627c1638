"""A/B on hardware: WHERE is the train-time flash crossover now that the
backward is fused Pallas?

FLASH_MIN_LEN (ops/attention.py) was tuned on a FORWARD-only A/B (r3: dense
wins below ~1k because XLA fuses the short-sequence softmax chain well). The
round-4 fused backward changes the trade: the dense path's backward
materializes several (B, H, Tq, Tk) tensors in HBM, while the flash backward
streams them. This sweep times one fwd+bwd step through BOTH paths across
sequence lengths — including the ViT-encoder shape (B128 T197, non-causal)
that dominates the flagship train step — so FLASH_MIN_LEN (and a possible
train-specific threshold) is set by measurement, not extrapolation.

Dense path = the einsum branch of ops.attention.dot_product_attention
(f32 scores/softmax), differentiated by XLA. Flash path = the Pallas kernel
with its fused Pallas VJP. Parity is asserted on-device per point.

Run: python experiments/ab_flash_train_crossover.py
Env: POINTS="B:T:H:D:causal,..."  BLOCK=512  LOOP_N=8
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")

os.environ["VILMEDIC_FLASH_BWD"] = "pallas"

BLOCK = int(os.environ.get("BLOCK", 512))
LOOP_N = int(os.environ.get("LOOP_N", 8))
# Defaults: the ViT-encoder train shape, then a causal ladder around the
# current FLASH_MIN_LEN=1024 threshold up to the DINOv2 prefix length.
DEFAULT_POINTS = "128:197:12:64:0,32:256:12:64:1,16:512:12:64:1,8:768:12:64:1,8:1024:12:64:1,8:1472:12:64:1"
POINTS = [
    tuple(int(x) for x in p.split(":"))
    for p in os.environ.get("POINTS", DEFAULT_POINTS).split(",")
]


def dense_attention(q, k, v, causal):
    """The einsum branch of dot_product_attention (what runs below
    FLASH_MIN_LEN), inlined so routing thresholds can't interfere."""
    d = q.shape[-1]
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * (d ** -0.5), k,
        preferred_element_type=jnp.float32,
    )
    if causal:
        tq, tk = scores.shape[-2], scores.shape[-1]
        row = jnp.arange(tq)[:, None]
        col = jnp.arange(tk)[None, :]
        scores = scores + jnp.where(col <= row + (tk - tq), 0.0, -1e9)[None, None]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def build_chained(attn_fn):
    def loss(q, k, v):
        return (attn_fn(q, k, v).astype(jnp.float32) ** 2).sum()

    grad_fn = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def chained(q, k, v):
        def body(_, carry):
            q, k, v = carry
            dq, dk, dv = grad_fn(q, k, v)
            s = jnp.float32(1e-6)
            return (q - (s * dq.astype(jnp.float32)).astype(q.dtype),
                    k - (s * dk.astype(jnp.float32)).astype(k.dtype),
                    v - (s * dv.astype(jnp.float32)).astype(v.dtype))
        return jax.lax.fori_loop(0, LOOP_N, body, (q, k, v))

    return grad_fn, chained


def time_chained(chained, q, k, v):
    out = chained(q, k, v)
    np.asarray(out[0][0, 0, 0])  # compile + warm
    t0 = time.perf_counter()
    out = chained(q, k, v)
    np.asarray(out[0][0, 0, 0])
    return (time.perf_counter() - t0) / LOOP_N


def main():
    from vilmedic_tpu.ops.flash_attention import flash_attention

    print(f"block {BLOCK}, {LOOP_N}-step chained loops, bf16 inputs")
    print(f"{'shape':>24s} {'dense us':>10s} {'flash us':>10s} {'flash/dense':>12s}")
    for b, t, h, d, causal in POINTS:
        causal = bool(causal)
        key = jax.random.key(t)
        mk = jax.jit(lambda key=key: tuple(
            (jax.random.normal(k_, (b, t, h, d)) * 0.5).astype(jnp.bfloat16)
            for k_ in jax.random.split(key, 3)
        ))
        q, k, v = mk()
        np.asarray(v[0, 0, 0])

        grad_d, chain_d = build_chained(
            lambda q_, k_, v_: dense_attention(q_, k_, v_, causal))
        grad_f, chain_f = build_chained(
            lambda q_, k_, v_: flash_attention(
                q_, k_, v_, block_q=BLOCK, block_k=BLOCK, causal=causal))

        tag = f"B{b} T{t} H{h}x{d} c{int(causal)}"
        # parity gate before timing
        try:
            gd = jax.jit(grad_d)(q, k, v)
            gf = jax.jit(grad_f)(q, k, v)
            worst = max(
                float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                      bb.astype(jnp.float32))))
                for a, bb in zip(gd, gf)
            )
        except Exception as e:
            print(f"{tag:>24s}  flash FAILED: {e!r}"[:160])
            continue

        dt_d = time_chained(chain_d, q, k, v)
        dt_f = time_chained(chain_f, q, k, v)
        flag = " <-- flash wins" if dt_f < dt_d else ""
        print(f"{tag:>24s} {dt_d*1e6:10.1f} {dt_f*1e6:10.1f} "
              f"{dt_f/dt_d:12.2f} (max|dgrad| {worst:.1e}){flag}")


if __name__ == "__main__":
    main()
