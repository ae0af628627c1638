"""Capture a jax.profiler trace of the VisionLanguage (prefix-LM) beam decode
and print the per-op device-time breakdown — the VL counterpart of
profile_decode.py. Honors BENCH_VL_BATCH / BENCH_VL_IMAGE / BENCH_VL_PATCH
(518/14 = DINOv2-scale ~1371-token prefix).

Run: python experiments/profile_vl.py [outdir]
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
import numpy as np

import bench


def summarize(outdir):
    traces = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                              recursive=True))
    assert traces, outdir
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    pid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    by_name = defaultdict(float)
    total = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        args = e.get("args", {})
        if "run_id" in args or "program_id" in args:
            continue  # module-level envelope events
        by_name[e.get("name", "")] += float(e.get("dur", 0.0))
        total += float(e.get("dur", 0.0))
    print(f"\ntop ops by total device time (us), total={total:.0f}:")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur:10.0f}  {name[:110]}")


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vl_trace"

    import jax.numpy as jnp

    module, variables, generate, batch, vl_image, n_prefix = bench.build_vl()
    images = jax.jit(lambda key: jax.random.normal(
        key, (batch, vl_image, vl_image, 3), jnp.float32
    ))(jax.random.key(1))
    np.asarray(images[0, 0, 0])

    np.asarray(generate(variables, images)[0])  # compile
    t0 = time.perf_counter()
    np.asarray(generate(variables, images)[0])
    dt = time.perf_counter() - t0
    print(f"one batch: {dt * 1e3:.1f} ms ({batch / dt:.1f} rep/s, "
          f"prefix {n_prefix} tokens)")

    jax.profiler.start_trace(outdir)
    np.asarray(generate(variables, images)[0])
    jax.profiler.stop_trace()
    summarize(outdir)


if __name__ == "__main__":
    main()
