"""Pin down where the ViT tower's 60% of non-MXU time goes (enc_only 88 ms
at batch 64 vs ~17 ms MXU-minimum — experiments/profile_vit_train.py).

Hypotheses timed independently (fwd+bwd where relevant):
  patch_conv   — nn.Conv(768, 16x16/16) on (B,224,224,3): C_in=3 convs are a
                 known MXU-hostile shape on TPU (lane padding 3 -> 128)
  patch_mm     — same op as space-to-depth reshape + (B*196, 768) @ (768, 768)
  fc1_mm       — the exact FFN matmul shape (B*197, 768) @ (768, 3072)
  enc_fwd_det  — tower forward, deterministic (no dropout RNG)
  enc_fwd_drop — tower forward with dropout active (threefry cost)
  enc_fwdbwd   — tower fwd+bwd (no optimizer)

Run: python experiments/microbench_vit_parts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import bench

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")

B = int(os.environ.get("MB_BATCH", 64))
N = 8


def timeit(fn, args, label, flops=None):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])  # tiny sync transfer
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / N
    extra = ""
    if flops:
        extra = f"  {flops / dt / 1e12:7.1f} TFLOP/s ({flops / dt / bench._peak_flops():.3f} of peak)"
    print(f"{label:>14}: {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}  batch={B}", flush=True)
    key = jax.random.key(0)
    imgs = jax.jit(lambda k: jax.random.normal(k, (B, 224, 224, 3), jnp.float32))(key)
    np.asarray(imgs[0, 0, 0])

    # ---- patchify: conv vs space-to-depth matmul ----------------------------
    conv = nn.Conv(768, (16, 16), strides=(16, 16), padding="VALID",
                   dtype=jnp.bfloat16, param_dtype=jnp.float32)
    cvars = jax.jit(conv.init)(key, imgs)
    conv_flops = 2 * B * 14 * 14 * 768 * 768 * 3  # fwd (+x3 for fwd+bwd)

    @jax.jit
    def conv_fwdbwd(p, x):
        def f(p):
            return jnp.sum(conv.apply(p, x).astype(jnp.float32) ** 2)
        return jax.value_and_grad(f)(p)

    timeit(conv_fwdbwd, (cvars, imgs), "patch_conv", conv_flops * 3)

    kernel = cvars["params"]["kernel"]  # (16, 16, 3, 768)
    W = kernel.reshape(-1, 768)

    @jax.jit
    def mm_fwdbwd(W, x):
        def f(W):
            p = x.reshape(B, 14, 16, 14, 16, 3).transpose(0, 1, 3, 2, 4, 5)
            p = p.reshape(B, 196, 16 * 16 * 3).astype(jnp.bfloat16)
            return jnp.sum(jnp.matmul(p, W.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32) ** 2)
        return jax.value_and_grad(f)(W)

    timeit(mm_fwdbwd, (W, imgs), "patch_mm", conv_flops * 3)

    # ---- the FFN matmul shape ----------------------------------------------
    a = jax.jit(lambda k: jax.random.normal(k, (B * 197, 768), jnp.bfloat16))(key)
    w1 = jax.jit(lambda k: jax.random.normal(k, (768, 3072), jnp.bfloat16))(key)
    np.asarray(a[0, 0].astype(jnp.float32))

    @jax.jit
    def fc1(a, w):
        return jnp.matmul(a, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    timeit(fc1, (a, w1), "fc1_mm", 2 * a.shape[0] * 768 * 3072)

    # ---- tower forward: dropout on/off, fwd vs fwd+bwd ----------------------
    from vilmedic_tpu.blocks.vision.vit import ViT

    vit = ViT(pre_ln=True, hidden_dropout_prob=0.1, dtype=jnp.bfloat16)
    vvars = jax.jit(lambda k: vit.init(k, jnp.zeros((2, 224, 224, 3))))(key)
    vit_fwd_flops = 2 * B * (197 * 768 * (768 * 4 + 3072 * 2) + 12 * 197 * 197 * 64 * 12 * 2) * 12 / 12  # rough
    # simpler: 12 layers x (qkvo + ffn) + attention
    per_layer = 2 * B * 197 * (768 * 768 * 4 + 768 * 3072 * 2) + 2 * 2 * B * 12 * 197 * 197 * 64
    vit_fwd_flops = 12 * per_layer + conv_flops

    @jax.jit
    def fwd_det(p, x):
        return jnp.sum(vit.apply(p, x, train=False).astype(jnp.float32) ** 2)

    timeit(fwd_det, (vvars, imgs), "enc_fwd_det", vit_fwd_flops)

    @jax.jit
    def fwd_drop(p, x, k):
        return jnp.sum(vit.apply(p, x, train=True,
                                 rngs={"dropout": k}).astype(jnp.float32) ** 2)

    timeit(fwd_drop, (vvars, imgs, key), "enc_fwd_drop", vit_fwd_flops)

    @jax.jit
    def fwdbwd(p, x, k):
        def f(p):
            return jnp.sum(vit.apply(p, x, train=True,
                                     rngs={"dropout": k}).astype(jnp.float32) ** 2)
        return jax.value_and_grad(f)(p)

    timeit(fwdbwd, (vvars, imgs, key), "enc_fwdbwd", vit_fwd_flops * 3)


if __name__ == "__main__":
    main()
