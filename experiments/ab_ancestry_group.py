"""A/B: ancestry-group size for the fused beam kernel at the VL-518 point.

The kernel processes item-groups of g items (rows = g*beam): scores are
dense (hpb*rows, tchunk*rows) with cross-item lanes masked, so VPU (exp/
mask/softmax) and MXU work scale with rows^2 * t while the cache DMA is
rows-independent. pick_ancestry_group takes the BIGGEST legal g (best MXU
fill) — tuned on the RRG decode where the per-step score work is small.
At VL-518 the r5 trace shows the kernel at 44.6 us/step/layer vs a ~29 us
DMA floor, i.e. VPU-bound: halving rows should cut the non-DMA half.

Run (TPU): python experiments/ab_ancestry_group.py
Env: BENCH_VL_* as usual; GROUPS=csv of g values (default "8,4").
"""

import os
import sys

os.environ.setdefault("BENCH_VL_IMAGE", "518")
os.environ.setdefault("BENCH_VL_PATCH", "14")
os.environ.setdefault("BENCH_VL_BATCH", "16")
os.environ.setdefault("BENCH_VL_INT8", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from vilmedic_tpu.ops import beam_cache_attention as bca


def main():
    groups = [int(g) for g in os.environ.get("GROUPS", "8,4").split(",")]
    results = {}
    orig = bca.pick_ancestry_group
    for g in groups:
        if not bca.kernel_rows_ok(g * bench.BEAM, bench.MAX_LEN):
            print(f"g={g}: rows {g * bench.BEAM} illegal at t={bench.MAX_LEN}, skip")
            continue
        bca.pick_ancestry_group = lambda *a, g=g, **k: g
        module, variables, generate, batch, vl_image, n_prefix = bench.build_vl()
        rps = bench._time_vl_decode(generate, variables, batch, vl_image)
        results[g] = rps
        print(f"g={g} (rows {g * bench.BEAM}): {rps:.2f} rep/s")
        del module, variables, generate
    bca.pick_ancestry_group = orig
    if len(results) > 1:
        base = results[max(results)]
        best_g = max(results, key=results.get)
        print(f"best: g={best_g} at {results[best_g]:.2f} "
              f"({results[best_g] / base - 1:+.1%} vs g={max(results)})")


if __name__ == "__main__":
    main()
