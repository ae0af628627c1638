"""Profile ONE ViT-fast-path train step (bench.build_vit_model shapes) and
print the per-op + per-category device-time breakdown — the train-side
counterpart of profile_vl.py, built to answer "where do the other 60% of
the 0.40 MFU go" (VERDICT r3 item 3).

Run: python experiments/profile_vit_train.py [outdir] [BATCH=64]
"""

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")

BATCH = int(os.environ.get("BATCH", 64))


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
            continue  # module-level envelope events
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "")
        by_name[name] += dur
        # stable-ish grouping: strip trailing .N, bucket by op family
        stem = re.sub(r"\.\d+$", "", name)
        fam = args.get("hlo_category") or stem
        by_cat[fam] += dur
        total += dur
    print(f"\n== by family (us), total={total:.0f} ==")
    for name, dur in sorted(by_cat.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur:10.0f}  {100 * dur / max(total, 1):5.1f}%  {name[:100]}")
    print("\n== top individual ops (us) ==")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur:10.0f}  {name[:110]}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vit_train_trace"
    print(f"devices: {jax.devices()}", flush=True)

    module = bench.build_vit_model()
    im0 = jnp.zeros((2, bench.IMAGE, bench.IMAGE, 3), jnp.float32)
    ids0 = jnp.zeros((2, 8), jnp.int32)
    variables = jax.jit(lambda key: module.init(
        {"params": key}, im0, ids0, jnp.ones_like(ids0), train=False
    ))(jax.random.key(0))

    sps, mfu, train_step, state = bench.bench_train(module, variables,
                                                    batch=BATCH)
    print(f"batch {BATCH}: {sps} samples/s, mfu={mfu}", flush=True)

    params, batch_stats, opt_state = state
    make_batch = jax.jit(lambda key: (
        jax.random.normal(key, (BATCH, bench.IMAGE, bench.IMAGE, 3), jnp.float32),
        jax.random.randint(key, (BATCH, bench.TRAIN_LEN), 3, bench.VOCAB, jnp.int32),
    ))
    images, ids = make_batch(jax.random.key(9))
    mask = jnp.ones((BATCH, bench.TRAIN_LEN), jnp.int32)
    np.asarray(images[0, 0, 0])

    jax.profiler.start_trace(outdir)
    for i in range(3):
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, images, ids, mask, jax.random.key(i)
        )
    _ = float(loss)
    jax.profiler.stop_trace()
    summarize(outdir)


if __name__ == "__main__":
    main()
