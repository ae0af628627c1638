"""Capture a jax.profiler trace of the bench decode loop and print the
per-category time breakdown (parses the trace events).

Run: python experiments/profile_decode.py [outdir]
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


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decode_trace"
    module = bench.build_model()
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(bench.BATCH, bench.IMAGE, bench.IMAGE, 3)), jnp.float32
    )
    ids = jnp.asarray(rng.integers(3, bench.VOCAB, (bench.BATCH, 8)), jnp.int32)
    mask = jnp.ones((bench.BATCH, 8), jnp.int32)
    init = jax.jit(
        lambda key: module.init({"params": key}, images, ids, mask, train=False)
    )
    variables = init(jax.random.key(0))

    generate = bench.build_generate(module, variables, bench.BATCH)

    np.asarray(generate(variables, images))  # compile
    t0 = time.perf_counter()
    np.asarray(generate(variables, images))
    print(f"one batch: {(time.perf_counter() - t0) * 1e3:.1f} ms")

    jax.profiler.start_trace(outdir)
    np.asarray(generate(variables, images))
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                              recursive=True))
    assert traces, outdir
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # keep only TPU op-level lanes (XLA Ops), drop host threads
    pid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        tname = e.get("name", "")
        if e.get("args", {}).get("group_id") is None and "XLA Ops" not in str(e.get("tid")):
            pass
        dur = float(e.get("dur", 0.0))
        args = e.get("args", {})
        if "run_id" in args or "program_id" in args:
            continue  # module-level envelope events
        by_name[tname] += dur
        total += dur
    print(f"\ntop ops by total device time (us), total={total:.0f}:")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur:10.0f}  {name[:110]}")


if __name__ == "__main__":
    main()
