"""Decode throughput vs batch size on hardware (flagship RRG, beam 8).

The per-step lm_head cost at vocab 50k is dominated by the 77 MB bf16 weight
stream + the blocked-logits traffic — batch-independent for the weights — so
reports/s should amortize with batch until the row dimension makes the step
compute/activation bound. This sweep finds the knee.

Run: python experiments/ab_decode_batch.py  [BATCHES=32,64,128]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench

BATCHES = [int(b) for b in os.environ.get("BATCHES", "32,64,128").split(",")]

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")


def main():
    print(f"devices: {jax.devices()}", flush=True)
    module = bench.build_model()

    # init with a tiny batch: params are batch-agnostic, small init compiles fast
    im0 = jnp.zeros((2, bench.IMAGE, bench.IMAGE, 3), jnp.float32)
    ids0 = jnp.zeros((2, 8), jnp.int32)
    init = jax.jit(
        lambda key: module.init(
            {"params": key}, im0, ids0, jnp.ones_like(ids0), train=False
        )
    )
    variables = init(jax.random.key(0))
    print("init done", flush=True)

    make_images = jax.jit(
        lambda key, b: jax.random.normal(
            key, (b, bench.IMAGE, bench.IMAGE, 3), jnp.float32
        ),
        static_argnums=1,
    )

    for B in BATCHES:
        gen = bench.build_generate(module, variables, B)
        # distinct device-resident batches (H2D of 100s of MB over the axon
        # tunnel is minutes; generate them on device instead)
        batches = [make_images(jax.random.key(i), B) for i in range(5)]
        for b in batches:
            np.asarray(b[0, 0, 0])  # force resident
        t_c = time.perf_counter()
        np.asarray(gen(variables, batches[0]))  # compile + warm
        print(f"B={B}: compiled+warm in {time.perf_counter() - t_c:.1f}s",
              flush=True)

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [gen(variables, b) for b in batches]
            for o in outs:
                np.asarray(o)
            best = min(best, (time.perf_counter() - t0) / len(batches))
        print(f"B={B}: {best * 1e3:.1f} ms/batch -> {B / best:.1f} reports/s",
              flush=True)


if __name__ == "__main__":
    main()
