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

    from vilmedic_tpu.blocks.transformer import (
        make_blocked_head_weights,
        to_kernel_cache,
    )
    from vilmedic_tpu.decoding import beam_search, tile_for_beams

    @jax.jit
    def generate(variables, images):
        enc_h, enc_m = module.apply(variables, images, method=type(module).encode)
        self_cache, cross_cache = module.apply(
            variables, enc_h, bench.MAX_LEN, method=type(module).init_cache
        )
        self_cache = tile_for_beams(self_cache, bench.BEAM)
        cross_cache = tile_for_beams(cross_cache, bench.BEAM)
        enc_m = tile_for_beams(enc_m.astype(jnp.int32), bench.BEAM)
        self_cache = to_kernel_cache(self_cache)
        blocked = make_blocked_head_weights(
            variables["params"]["dec"], module.dec_config.dtype
        )

        def step_fn(tokens, self_cache, index, anc=None):
            logits, new_self = module.apply(
                variables, tokens, self_cache, cross_cache, enc_m, index,
                blocked_head=blocked, ancestry=anc,
                method=type(module).decode_step,
            )
            return logits, new_self

        anc_g = max(d for d in range(1, bench.BATCH + 1)
                    if bench.BATCH % d == 0 and d * bench.BEAM <= 64)
        return beam_search(
            step_fn, self_cache, bench.BATCH, bench.BEAM, bench.MAX_LEN,
            bos_id=0, eos_id=2, pad_id=1, length_penalty=1.0,
            blocked_vocab=bench.VOCAB, ancestry=True, ancestry_group_items=anc_g,
        ).sequences

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
