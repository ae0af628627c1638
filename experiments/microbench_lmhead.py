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

# generate on device in ONE jitted program: both H2D of ~100 MB and op-by-op
# dispatch are minutes over the axon tunnel
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")


@jax.jit
def _make_data():
    kb = (jax.random.normal(jax.random.key(0), (H, NB * BLK)) * 0.02).astype(
        jnp.bfloat16
    )
    bb = jnp.where(
        jnp.arange(NB * BLK) < V,
        jax.random.normal(jax.random.key(1), (NB * BLK,)) * 0.02,
        -1e30,
    ).astype(jnp.float32)
    hs = tuple(
        jax.random.normal(jax.random.key(2 + i), (N, H)).astype(jnp.bfloat16)
        for i in range(8)
    )
    alive = jax.random.normal(jax.random.key(99), (B, K)).astype(jnp.float32)
    return kb, bb, hs, alive


kb, bb, hs, alive = _make_data()
np.asarray(alive)  # force the whole program resident


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
