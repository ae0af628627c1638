"""Microbenchmark: lm_head + candidate-selection variants at bench shapes.

Measures, on the real chip:
  A. current production route: _head_blocked matmul -> _candidates_from_blocks
  B. matmul alone (floor set by the weight stream)
  C. stats pass alone on pre-materialized blocked logits
  D. selection-after-stats alone (top_k + gather + final top_k)
Run: python experiments/microbench_lmhead.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vilmedic_tpu.decoding.decode import _candidates_from_blocks

B, K, H, V = 32, 8, 768, 50265
N = B * K
BLK = 128
NB = -(-V // BLK)
R = 2 * K

rng = np.random.default_rng(0)
kb = jnp.asarray(rng.normal(size=(H, NB * BLK)) * 0.02, jnp.bfloat16)
bb = jnp.asarray(
    np.concatenate([rng.normal(size=(V,)) * 0.02,
                    np.full((NB * BLK - V,), -1e30)]), jnp.float32
)
hs = [jnp.asarray(rng.normal(size=(N, H)), jnp.bfloat16) for _ in range(8)]
alive = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)


def timeit(fn, args_list, label, inner=4):
    outs = [fn(*a) for a in args_list[:1]]  # compile
    jax.tree.map(np.asarray, outs)
    t0 = time.perf_counter()
    outs = []
    for i in range(inner):
        for a in args_list:
            outs.append(fn(*a))
    jax.tree.map(lambda x: np.asarray(x), outs[-1])
    dt = (time.perf_counter() - t0) / (inner * len(args_list))
    print(f"{label}: {dt * 1e6:.1f} us")
    return dt


@jax.jit
def route_a(h, alive):
    out = jnp.matmul(h, kb, preferred_element_type=jnp.float32) + bb
    out = out.reshape(N, NB, BLK)
    return _candidates_from_blocks(out, B, K, alive, R)


@jax.jit
def route_b(h):
    return jnp.matmul(h, kb, preferred_element_type=jnp.float32) + bb


@jax.jit
def route_c(h):
    """matmul + block stats only (what the fused kernel would emit)."""
    out = jnp.matmul(h, kb, preferred_element_type=jnp.float32) + bb
    xp = out.reshape(N, NB, BLK)
    bmax = xp.max(axis=-1)
    bsum = jnp.sum(jnp.exp(xp - bmax[..., None]), axis=-1)
    return xp, bmax, bsum


@jax.jit
def route_d(xp, bmax, bsum, alive):
    """selection given precomputed stats."""
    from jax import lax

    m = bmax.max(axis=-1)
    lse = jnp.log(jnp.sum(jnp.exp(bmax - m[:, None]) * bsum, axis=-1)) + m
    off = alive.reshape(N) - lse
    adj = (bmax + off[:, None]).reshape(B, K * NB)
    _, gbidx = lax.top_k(adj, R)
    cand = jnp.take_along_axis(xp.reshape(B, K * NB, BLK), gbidx[..., None], axis=1)
    block_off = jnp.take_along_axis(
        jnp.repeat(off.reshape(B, K), NB, axis=1), gbidx, axis=1
    )
    cand_flat = (cand + block_off[..., None]).reshape(B, R * BLK)
    scores, sel = lax.top_k(cand_flat, R)
    chosen_block = jnp.take_along_axis(gbidx, sel // BLK, axis=1)
    return scores, chosen_block // NB, (chosen_block % NB) * BLK + sel % BLK


def main():
    print(f"shapes: N={N} H={H} V={V} NB={NB} R={R}", flush=True)
    timeit(route_a, [(h, alive) for h in hs], "A matmul+stats+selection")
    timeit(route_b, [(h,) for h in hs], "B matmul only")
    stats = [route_c(h) for h in hs]
    jax.tree.map(np.asarray, stats[-1])
    timeit(route_c, [(h,) for h in hs], "C matmul+stats")
    timeit(route_d, [s + (alive,) for s in stats], "D selection given stats")


if __name__ == "__main__":
    main()
