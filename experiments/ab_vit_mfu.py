"""A/B the ViT-fast-path train-step MFU levers on hardware (VERDICT r3 item 3).

Profile findings behind the candidate levers (profile_vit_train.py, v5e,
batch 64, 0.40 MFU):
  - adamw update pass is batch-INDEPENDENT ~13 ms/step (lm-head update 4.0 ms,
    embedding update 1.4 ms, per-layer ffn updates ~0.5 ms x 24) -> larger
    batch amortizes it.
  - encoder fc1 fusions run at ~44% MXU because each writes TWO
    (B, 197, 3072) bf16 residual tensors for the backward -> remat kills the
    writes (and the memory that caps batch).
  - no donation: params+opt_state (~2.2 GB f32) are double-buffered.

Sweeps {batch} x {remat} with donated carried state and prints
samples/s + MFU for each point.

Run: python experiments/ab_vit_mfu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bench

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")

BATCHES = [int(b) for b in os.environ.get("AB_BATCHES", "64,128,192").split(",")]


def build(remat: bool, act: str = "gelu"):
    from vilmedic_tpu.blocks.transformer import TransformerConfig
    from vilmedic_tpu.blocks.vision.visual_encoder import VisualEncoder
    from vilmedic_tpu.models.rrg import RRGModule

    enc = VisualEncoder(
        backbone="vit", output_layer=None, permute="no_permute",
        projection_dim=768, dtype=jnp.bfloat16,
        backbone_kwargs={"pre_ln": True, "gradient_checkpointing": remat,
                         "hidden_act": act},
    )
    cfg = TransformerConfig(
        vocab_size=bench.VOCAB, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=514, add_cross_attention=True,
        dtype=jnp.bfloat16,
    )
    return RRGModule(enc=enc, dec_config=cfg)


def measure(module, variables, batch, donate, rng_impl="threefry2x32",
            flatten_opt=False):
    # optax.flatten: one fused update over a single concatenated vector
    # instead of ~150 per-leaf kernels (adamw_only measured 26 ms isolated —
    # experiments/profile_vit_train.py — suspected per-fusion launch overhead)
    tx = optax.adamw(1e-4)
    if flatten_opt:
        tx = optax.flatten(tx)
    # deep-copy: donation deletes the donated buffers, and `variables` is
    # shared across the batch sweep (first run poisoned every later point)
    params = jax.tree.map(jnp.array, variables["params"])
    opt_state = tx.init(params)
    mk_key = lambda i: jax.random.key(i, impl=rng_impl)

    def loss_fn(params, images, ids, mask, key):
        out = module.apply({"params": params}, images, ids, mask, train=True,
                           rngs={"dropout": key})
        return out["loss"]

    def _step(params, opt_state, images, ids, mask, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, ids, mask, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    train_step = jax.jit(_step, donate_argnums=(0, 1) if donate else ())

    make_batch = jax.jit(lambda key: (
        jax.random.normal(key, (batch, bench.IMAGE, bench.IMAGE, 3), jnp.float32),
        jax.random.randint(key, (batch, bench.TRAIN_LEN), 3, bench.VOCAB, jnp.int32),
    ))
    images, ids = make_batch(jax.random.key(1))
    mask = jnp.ones((batch, bench.TRAIN_LEN), jnp.int32)
    np.asarray(images[0, 0, 0])

    args = (params, opt_state, images, ids, mask, mk_key(0))
    flops = None
    try:
        cost = train_step.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass
    params, opt_state, loss = train_step(*args)
    _ = float(loss)
    N = 6
    t0 = time.perf_counter()
    for i in range(N):
        params, opt_state, loss = train_step(params, opt_state, images, ids,
                                             mask, mk_key(i))
    _ = float(loss)
    dt = (time.perf_counter() - t0) / N
    peak = bench._peak_flops()
    return round(batch / dt, 1), (round(flops / dt / peak, 4) if flops else None)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    # Measured 2026-08-19 (v5e, this file, threefry, donate=True):
    #   remat=False: 64 -> 577.1/0.4015(donate=False) 569.3, 128 -> 586.0/0.4079,
    #                192 -> 501.8
    #   remat=True:  64 -> 486.8, 128 -> 495.9, 192 -> 455.4 (NET LOSS)
    # Remaining grid: "dots" policy remat (save matmuls, recompute elementwise)
    # and the rbg dropout PRNG (threefry measured ~5.5 ms of the batch-64
    # forward alone, experiments/microbench_vit_parts.py), around the peak.
    # Measured 2026-08-19 (v5e, batch 128, donate=True): dots remat 484.3
    # (LOSS vs 586 no-remat), dots@192 474.4, rbg 592.2/0.4144 (best),
    # optax.flatten 535.9 (LOSS), dots+rbg+flat 451.9. Remaining lever:
    # tanh-approx GELU (the exact erf over (B,197,3072) x 12 layers is the
    # priciest VPU transcendental in the tower).
    GRID = (
        # (remat, donate, rng_impl, flatten_opt, act, batches)
        (False, True, "rbg", False, "gelu_tanh", (128,)),
        (False, True, "threefry2x32", False, "gelu_tanh", (128,)),
    )
    for remat, donate, rng_impl, flatten_opt, act, batches in GRID:
        module = build(remat, act)
        im0 = jnp.zeros((2, bench.IMAGE, bench.IMAGE, 3), jnp.float32)
        ids0 = jnp.zeros((2, 8), jnp.int32)
        variables = jax.jit(lambda key: module.init(
            {"params": key}, im0, ids0, jnp.ones_like(ids0), train=False
        ))(jax.random.key(0))
        for batch in batches:
            tag = (f"remat={remat} donate={donate} rng={rng_impl} "
                   f"flat={flatten_opt} act={act} batch={batch}")
            try:
                sps, mfu = measure(module, variables, batch, donate=donate,
                                   rng_impl=rng_impl, flatten_opt=flatten_opt)
                print(f"{tag}: {sps} samples/s  mfu={mfu}", flush=True)
            except Exception as e:  # OOM points are data too
                print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
