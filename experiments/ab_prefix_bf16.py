"""Measure the VL-518 decode after switching the prefix-segment einsums from
f32 to bf16 MXU matmuls (f32 accumulation) — an f32 matmul runs ~6x slower
on the MXU, and the prefix scores/values are recomputed every layer every
step. Also reports the int8 prefix-KV point (same change applies: int8
values are exact in bf16).

Run (TPU): python experiments/ab_prefix_bf16.py
"""

import os
import sys

os.environ.setdefault("BENCH_VL_IMAGE", "518")
os.environ.setdefault("BENCH_VL_PATCH", "14")
os.environ.setdefault("BENCH_VL_BATCH", "16")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    module, variables, generate, batch, vl_image, n_prefix = bench.build_vl()
    exact = bench._time_vl_decode(generate, variables, batch, vl_image)
    gen_int8 = generate.rebuild(True)
    int8 = bench._time_vl_decode(gen_int8, variables, batch, vl_image)
    print(f"exact bf16-einsum: {exact:.2f} rep/s (r4 f32 baseline 51.4)")
    print(f"int8  bf16-einsum: {int8:.2f} rep/s (r4 f32 baseline 61.2)")


if __name__ == "__main__":
    main()
