"""VL train scaling sweep at the DINOv2-scale operating point (518px/14).

Hardware session 1 measured the VL train step at 518/14 batch 8 at
31.4 samples/s, MFU 0.147 — far below the 224px point's 0.32. This sweeps
the two levers that plausibly lift it:

- batch size (8 / 16 / 32): at 1471-token sequences the per-layer
  activations are (B, 1471, 768); batch 8 may simply under-fill the MXU.
- gradient_checkpointing on the decoder stack: frees the activation
  memory that caps the batch (the tower is already grad-free via
  stop_gradient — models/vision_language.py:104 — so only the 12 decoder
  layers hold train activations).

One subprocess per point (donation + HBM fragmentation across jits make
in-process sweeps unreliable at these sizes; OOM points report as such
instead of killing the sweep).

Run: python experiments/ab_vl518_train.py
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_one(batch: int, remat: bool) -> str:
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")
import os
os.environ["BENCH_VL_TRAIN_BATCH"] = "{batch}"
import bench
module, variables, _gen, _b, vl_image, n_prefix = bench.build_vl(
    batch=2, vl_image=518, vl_patch=14, gradient_checkpointing={remat})
sps, mfu = bench.bench_vl_train(module, variables, vl_image)
print(f"RESULT sps={{sps}} mfu={{mfu}}")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return line
    err = (out.stderr or "")[-400:]
    return "OOM" if "RESOURCE_EXHAUSTED" in out.stderr else f"FAILED {err!r}"


def main():
    print("VL train step 518px/14 (1371-token prefix + 100 text tokens)")
    for remat in (False, True):
        for batch in (8, 16, 32):
            label = f"batch {batch:>2d} remat={int(remat)}"
            print(f"{label}: {run_one(batch, remat)}", flush=True)


if __name__ == "__main__":
    main()
