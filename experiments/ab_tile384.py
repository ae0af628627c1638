"""A/B: stats-kernel vocab tile 384 (divides the 128-blocked vocab 50304 —
NO in-loop pad at all) vs tile 1024 (pads 50304->51200 in-loop, ~100 us/step).

Narrower tiles cost more grid steps (131 vs 50) and 3/128-packed stats writes
(34 MB vs 13 MB per step), but remove the 78 MB per-step pad copy.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.environ["VILMEDIC_LMHEAD_KERNEL"] = "1"

import bench
from vilmedic_tpu.ops import blocked_lm_head

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")

TILE = int(os.environ.get("TILE", "384"))
B = 64

blocked_lm_head.pick_tile_v = lambda n, hidden, budget_bytes=10 << 20: TILE


def main():
    print(f"devices: {jax.devices()} tile={TILE}", flush=True)
    module = bench.build_model()
    im0 = jnp.zeros((2, bench.IMAGE, bench.IMAGE, 3), jnp.float32)
    ids0 = jnp.zeros((2, 8), jnp.int32)
    init = jax.jit(
        lambda key: module.init(
            {"params": key}, im0, ids0, jnp.ones_like(ids0), train=False
        )
    )
    variables = init(jax.random.key(0))

    gen = bench.build_generate(module, variables, B)
    make_images = jax.jit(
        lambda key: jax.random.normal(
            key, (B, bench.IMAGE, bench.IMAGE, 3), jnp.float32
        )
    )
    batches = [make_images(jax.random.key(i)) for i in range(5)]
    for b in batches:
        np.asarray(b[0, 0, 0])
    np.asarray(gen(variables, batches[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [gen(variables, b) for b in batches]
        for o in outs:
            np.asarray(o)
        best = min(best, (time.perf_counter() - t0) / len(batches))
    print(f"tile={TILE}: {best * 1e3:.1f} ms/batch -> {B / best:.1f} rep/s",
          flush=True)


if __name__ == "__main__":
    main()
