"""End-to-end A/B of FLASH_MIN_LEN_TRAIN on a real train step.

The attention-level crossover sweep (ab_flash_train_crossover.py) says flash
wins fwd+bwd from ~T512. This measures the same decision inside a full
VisionLanguage train step (frozen tower + 12-layer causal decoder + adamw) at
an intermediate prefix length that the OLD threshold (1024) routed dense and
the new TRAIN threshold (512) routes flash: 384px/14 -> 753+2 prefix + 100
text = 855-token sequences.

Run: python experiments/ab_vl_train_flash_threshold.py
Env: IMAGE=384 PATCH=14 BATCH=8
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

IMAGE = os.environ.get("IMAGE", "384")
PATCH = os.environ.get("PATCH", "14")
BATCH = os.environ.get("BATCH", "8")


def run_one(min_len_train: str) -> str:
    """One measurement per process: FLASH_MIN_LEN_TRAIN is read at import."""
    code = f"""
import sys, time
sys.path.insert(0, {REPO!r})
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")
import bench
module, variables, _gen, _b, vl_image, n_prefix = bench.build_vl(
    batch=2, vl_image={IMAGE}, vl_patch={PATCH})
import os
os.environ["BENCH_VL_TRAIN_BATCH"] = {BATCH!r}
sps, mfu = bench.bench_vl_train(module, variables, vl_image)
print(f"RESULT seq={{n_prefix + bench.TRAIN_LEN}} sps={{sps}} mfu={{mfu}}")
"""
    env = dict(os.environ, VILMEDIC_FLASH_MIN_LEN_TRAIN=min_len_train)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return line
    print(out.stdout[-2000:], file=sys.stderr)
    print(out.stderr[-2000:], file=sys.stderr)
    return "FAILED"


def main():
    print(f"VL train step {IMAGE}px/{PATCH} batch {BATCH}")
    for label, thr in (("dense (old threshold)", "100000"),
                       ("flash (train threshold 512)", "512")):
        print(f"{label:>30s}: {run_one(thr)}", flush=True)


if __name__ == "__main__":
    main()
