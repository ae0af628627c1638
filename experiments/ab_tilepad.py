"""A/B: loop-invariant tile pre-pad (vocab->51200 outside the loop) vs the
in-loop pad (weights padded to 50304, stats kernel pads to 51200 per step).
Both on the kernel stats route at batch 64.

VERDICT (v5e): in-loop pad 424.3 rep/s vs pre-pad 395.5 — the pre-pad LOSES
7% although the in-loop pad itself profiles at ~100 us/step: the per-step pad
materializes the weight copy in the pallas operand's layout, while the
loop-invariant pre-padded buffer is relayouted at the custom-call boundary
every step. make_blocked_head_weights therefore does NOT tile-pre-pad.
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
from vilmedic_tpu.blocks import transformer

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")

MODE = os.environ.get("TILEPAD", "off")  # on | off
B = 64

if MODE == "on":
    _orig = transformer.make_blocked_head_weights

    def tile_pre_pad(dec_params, dtype, block=128):
        # pre-pad to the stats kernel's 1024 vocab tile (the losing variant)
        return _orig(dec_params, dtype, block=1024)

    transformer.make_blocked_head_weights = tile_pre_pad
    bench.make_blocked_head_weights = tile_pre_pad


def main():
    print(f"devices: {jax.devices()} tilepad={MODE}", flush=True)
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
    print(f"tilepad={MODE}: {best * 1e3:.1f} ms/batch -> {B / best:.1f} rep/s",
          flush=True)


if __name__ == "__main__":
    main()
