"""A/B: fused in-kernel prefix streaming vs the XLA einsum + merge path.

The VL-518 decode profile attributes ~24 us/step/layer to the prefix re-read
(einsum path) and ~25 us/step/layer to the generated-segment kernel
(docs/performance.md). VILMEDIC_FUSED_PREFIX=1 streams the beam-shared
prefix INSIDE the fused Pallas kernel's online softmax: one custom call per
layer per step covering prefix + generated cache + current step, no
(B, H, fold, P) f32 score materialization, no stats merge.

Run (TPU): python experiments/ab_fused_prefix.py
Env: BENCH_VL_IMAGE/BENCH_VL_PATCH/BENCH_VL_BATCH as in bench.py (defaults
to the DINOv2-scale 518/14 point at batch 16).
"""

import os
import sys

os.environ.setdefault("BENCH_VL_IMAGE", "518")
os.environ.setdefault("BENCH_VL_PATCH", "14")
os.environ.setdefault("BENCH_VL_BATCH", "16")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import bench


def main():
    results = {}
    seqs = {}
    # build once per mode (the env flag gates tracing inside generate)
    for mode in ("0", "1"):
        os.environ["VILMEDIC_FUSED_PREFIX"] = mode
        module, variables, generate, batch, vl_image, n_prefix = bench.build_vl()
        label = {"0": "merge", "1": "fused"}[mode]
        rps = bench._time_vl_decode(generate, variables, batch, vl_image)
        results[label] = rps
        images = jax.jit(lambda key: jax.random.normal(
            key, (batch, vl_image, vl_image, 3)
        ))(jax.random.key(42))
        seqs[label] = np.asarray(generate(variables, images)[0])
        del module, variables, generate

    same = bool((seqs["merge"] == seqs["fused"]).all())
    print(f"merge:  {results['merge']:.2f} rep/s")
    print(f"fused:  {results['fused']:.2f} rep/s "
          f"({results['fused'] / results['merge'] - 1:+.1%})")
    print(f"sequence parity on shared images: {same}")


if __name__ == "__main__":
    main()
