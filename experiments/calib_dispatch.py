"""Calibrate the axon-tunnel per-call dispatch overhead and the true MXU rate.

  noop       — jitted x+1 on a (8,) array, N back-to-back calls: per-call cost
               IS the dispatch overhead (device work ~0)
  fc1_loop   — the FFN matmul (12608, 768) @ (768, 3072) iterated K times
               INSIDE one jit via lax.fori_loop: amortizes dispatch, measures
               the real matmul rate
  adamw_loop — optax.adamw on the full ViT+decoder param tree, K updates
               chained inside one jit: true per-update cost without dispatch

Run: python experiments/calib_dispatch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bench

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")

N = 20
K = 8


def main():
    print(f"devices: {jax.devices()}", flush=True)

    # ---- per-call dispatch overhead -----------------------------------------
    x = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    np.asarray(f(x))
    t0 = time.perf_counter()
    y = x
    for _ in range(N):
        y = f(y)
    np.asarray(y.ravel()[:1])
    per_call = (time.perf_counter() - t0) / N
    print(f"      noop: {per_call * 1e3:8.3f} ms/call (dispatch overhead)", flush=True)

    # ---- true matmul rate ----------------------------------------------------
    a = jax.jit(lambda k: jax.random.normal(k, (12608, 768), jnp.bfloat16))(jax.random.key(0))
    w = jax.jit(lambda k: jax.random.normal(k, (768, 3072), jnp.bfloat16))(jax.random.key(1))
    np.asarray(a[0, 0].astype(jnp.float32))

    @jax.jit
    def fc1_loop(a, w):
        def body(i, acc):
            # fold the iteration index in so the loop body can't be hoisted
            return jnp.matmul(acc + i * 0.0, w, preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)[:, :768]
        return jax.lax.fori_loop(0, K, body, a)

    np.asarray(fc1_loop(a, w).ravel()[:1])
    t0 = time.perf_counter()
    out = fc1_loop(a, w)
    np.asarray(out.ravel()[:1])
    dt = (time.perf_counter() - t0 - per_call) / K
    fl = 2 * 12608 * 768 * 3072
    print(f"  fc1_loop: {dt * 1e3:8.3f} ms/matmul  {fl / dt / 1e12:6.1f} TFLOP/s "
          f"({fl / dt / bench._peak_flops():.3f} of peak)", flush=True)

    # ---- true adamw cost on the real param tree ------------------------------
    module = bench.build_vit_model()
    im0 = jnp.zeros((2, bench.IMAGE, bench.IMAGE, 3), jnp.float32)
    ids0 = jnp.zeros((2, 8), jnp.int32)
    variables = jax.jit(lambda key: module.init(
        {"params": key}, im0, ids0, jnp.ones_like(ids0), train=False
    ))(jax.random.key(0))
    params = variables["params"]
    n_leaves = len(jax.tree.leaves(params))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    tx = optax.adamw(1e-4)
    opt_state = jax.jit(tx.init)(params)
    grads = jax.jit(lambda p: jax.tree.map(lambda x: x * 1e-3, p))(params)

    @jax.jit
    def adamw_loop(p, s, g):
        def body(i, carry):
            p, s = carry
            updates, s = tx.update(g, s, p)
            return (optax.apply_updates(p, updates), s)
        return jax.lax.fori_loop(0, K, body, (p, s))

    out = adamw_loop(params, opt_state, grads)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    out = adamw_loop(params, opt_state, grads)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0 - per_call) / K
    traffic = n_params * 4 * 7  # read p,m,v,g + write p,m,v (f32)
    print(f"adamw_loop: {dt * 1e3:8.3f} ms/update  ({n_leaves} leaves, "
          f"{n_params / 1e6:.1f}M params, roofline {traffic / 819e9 * 1e3:.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
