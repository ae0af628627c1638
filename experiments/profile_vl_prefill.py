"""Trace ONLY the VL-518 prefill (vision tower + 12-layer prefix pass) and
aggregate device time by op category and source line — the r5 split showed
prefill is ~44% of the beam-8 batch and it had never been decomposed.

Run: BENCH_VL_BATCH=16 BENCH_VL_IMAGE=518 BENCH_VL_PATCH=14 \
     python experiments/profile_vl_prefill.py [outdir]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from vilmedic_tpu.models.vision_language import VisionLanguageModule


def summarize(outdir, top=30):
    traces = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                              recursive=True))
    assert traces, outdir
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    pid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    by_src = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        args = e.get("args", {})
        if "run_id" in args or "program_id" in args:
            continue
        dur = float(e.get("dur", 0.0))
        total += dur
        by_cat[args.get("hlo_category", "?")] += dur
        key = args.get("source", "") or e.get("name", "")
        op = args.get("tf_op", "")
        # keep the op path's tail for readability
        by_src[f"{key}  [{op.split('/')[-1][:60]}]"] += dur
    print(f"\ndevice total {total / 1e3:.1f} ms; by category:")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {v / 1e3:9.2f} ms  {k}")
    print("\nby source line:")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v / 1e3:9.2f} ms  {k}")


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vl_prefill_trace"
    module, variables, generate, batch, vl_image, n_prefix = bench.build_vl()
    images = jax.jit(lambda key: jax.random.normal(
        key, (batch, vl_image, vl_image, 3), jnp.float32
    ))(jax.random.key(1))
    np.asarray(images[0, 0, 0])

    prefill_fn = jax.jit(lambda v, im: module.apply(
        v, im, bench.MAX_LEN, method=VisionLanguageModule.prefill
    ))

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:1])

    sync(prefill_fn(variables, images))  # compile
    t0 = time.perf_counter()
    sync(prefill_fn(variables, images))
    print(f"prefill: {(time.perf_counter() - t0) * 1e3:.1f} ms")

    jax.profiler.start_trace(outdir)
    sync(prefill_fn(variables, images))
    jax.profiler.stop_trace()
    summarize(outdir)


if __name__ == "__main__":
    main()
