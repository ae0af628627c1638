"""A/B on hardware: XLA blocked route vs fused lm_head+stats Pallas kernel.

Checks bit-exactness of the kernel logits vs the XLA matmul, then times
matmul+stats+selection end-to-end for both routes at bench shapes.
Run: python experiments/ab_lmhead_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vilmedic_tpu.decoding.decode import (
    _candidates_from_blocks,
    _candidates_from_stats,
)
from vilmedic_tpu.ops.blocked_lm_head import lm_head_blocked_stats, unpack_stats

B, K, H, V = 32, 8, 768, 50265
N = B * K
BLK = 128
NB = -(-V // BLK)
R = 2 * K
TILE = int(os.environ.get("TILE", 1024))

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


@jax.jit
def route_xla(h, alive):
    out = jnp.matmul(h, kb, preferred_element_type=jnp.float32) + bb
    return _candidates_from_blocks(out.reshape(N, NB, BLK), B, K, alive, R)


@jax.jit
def route_kernel(h, alive):
    logits, bmax_p, bsum_p = lm_head_blocked_stats(h, kb, bb, tile_v=TILE)
    return _candidates_from_stats(
        logits, unpack_stats(bmax_p, TILE), unpack_stats(bsum_p, TILE),
        B, K, alive, R,
    )


@jax.jit
def logits_xla(h):
    return jnp.matmul(h, kb, preferred_element_type=jnp.float32) + bb


@jax.jit
def logits_kernel(h):
    return lm_head_blocked_stats(h, kb, bb, tile_v=TILE)[0]


LOOP_N = 32


def make_loop(route):
    """Chain LOOP_N route invocations inside ONE jitted program: per-call
    dispatch over the axon tunnel is ~4 ms (measured), two orders above the
    route itself, so host-side timing of individual calls is meaningless.
    A value-preserving dependency (h += scores_sum * 0-ish) serializes the
    iterations without changing the computation."""

    @jax.jit
    def loop(h, alive):
        def body(i, carry):
            h, acc = carry
            scores, beam, tok = route(h, alive)
            s = scores.sum()
            h = h + (s * 1e-30).astype(h.dtype)
            return h, acc + s
        return jax.lax.fori_loop(0, LOOP_N, body, (h, 0.0))

    return loop


def timeit(fn, args, label, outer=3):
    np.asarray(fn(*args)[1])  # compile + warm
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[1])
        best = min(best, (time.perf_counter() - t0) / LOOP_N)
    print(f"{label}: {best * 1e6:.1f} us", flush=True)


@jax.jit
def _compare(h, alive):
    # on-device comparison: D2H of the 51 MB logits over the tunnel is minutes
    a = logits_xla(h)
    b = logits_kernel(h)[:, : a.shape[1]]
    bits = jnp.all(a == b)
    maxdiff = jnp.max(jnp.abs(a - b))
    ga = route_xla(h, alive)
    gk = route_kernel(h, alive)
    sel_same = tuple(jnp.all(x == y) for x, y in zip(ga, gk))
    return bits, maxdiff, sel_same


def main():
    print(f"TILE={TILE}", flush=True)
    bits, maxdiff, sel_same = jax.tree.map(np.asarray, _compare(hs[0], alive))
    print(f"logits bit-exact vs XLA matmul: {bool(bits)}; "
          f"max abs diff {float(maxdiff)}", flush=True)
    for name, same in zip(("scores", "beam", "token"), sel_same):
        print(f"selection {name} identical: {bool(same)}", flush=True)

    timeit(make_loop(route_xla), (hs[0], alive), "XLA   matmul+stats+selection")
    timeit(make_loop(route_kernel), (hs[0], alive), "KERNEL fused+selection")


if __name__ == "__main__":
    main()
