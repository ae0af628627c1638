"""A/B on hardware: MXU-packed vs plain densenet169 growth convs.

Times the full flagship RRG train step (bench.py shapes: batch 128, 224px,
bf16, adamw) with DenseNet packed_growth on/off using the SAME params (the
packed formulation is parameter-identical), and reports both wall-clock and
XLA's compiled-flops estimate for each graph — the plain graph's flops are the
honest "model flops" for MFU.

Run: python experiments/ab_packed_densenet.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")

TRAIN_BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", 128))
TRAIN_LEN = 100
VOCAB = 50265
IMAGE = 224
PEAK = 197e12  # v5e-class bf16


def build_model(packed: bool):
    from vilmedic_tpu.blocks.transformer import TransformerConfig
    from vilmedic_tpu.blocks.vision.visual_encoder import VisualEncoder
    from vilmedic_tpu.models.rrg import RRGModule

    enc = VisualEncoder(
        backbone="densenet169",
        output_layer="features",
        permute="batch_first",
        projection_dim=768,
        dtype=jnp.bfloat16,
        backbone_kwargs={"packed_growth": packed},
    )
    cfg = TransformerConfig(
        vocab_size=VOCAB,
        hidden_size=768,
        num_hidden_layers=1,
        num_attention_heads=12,
        intermediate_size=3072,
        max_position_embeddings=514,
        add_cross_attention=True,
        dtype=jnp.bfloat16,
    )
    return RRGModule(enc=enc, dec_config=cfg)


def make_step(module, tx):
    def loss_fn(params, batch_stats, images, ids, mask, key):
        vs = {"params": params}
        if batch_stats:
            vs["batch_stats"] = batch_stats
        out, updated = module.apply(
            vs, images, ids, mask, train=True, rngs={"dropout": key},
            mutable=["batch_stats"],
        )
        return out["loss"], updated.get("batch_stats", {})

    @jax.jit
    def train_step(params, batch_stats, opt_state, images, ids, mask, key):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, ids, mask, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return train_step


def main():
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(TRAIN_BATCH, IMAGE, IMAGE, 3)), jnp.float32
    )
    ids = jnp.asarray(rng.integers(3, VOCAB, (TRAIN_BATCH, TRAIN_LEN)), jnp.int32)
    mask = jnp.ones((TRAIN_BATCH, TRAIN_LEN), jnp.int32)
    tx = optax.adamw(1e-4)

    module0 = build_model(False)
    init = jax.jit(
        lambda key: module0.init({"params": key}, images, ids, mask, train=False)
    )
    variables = init(jax.random.key(0))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    print("init done", flush=True)

    losses = {}
    for label, packed in (("plain ", False), ("packed", True)):
        module = build_model(packed)
        step = make_step(module, tx)
        args = (params, batch_stats, opt_state, images, ids, mask,
                jax.random.key(0))
        t0 = time.time()
        compiled = step.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        print(f"{label} compiled {time.time()-t0:.0f}s  "
              f"xla-flops {flops/1e12:.3f} T", flush=True)

        p, bs, o, loss = step(*args)
        losses[label] = float(loss)
        N = 6
        t0 = time.perf_counter()
        for i in range(N):
            p, bs, o, loss = step(p, bs, o, images, ids, mask, jax.random.key(i))
        _ = float(loss)
        dt = (time.perf_counter() - t0) / N
        print(f"{label} {dt*1e3:.1f} ms/step  "
              f"{TRAIN_BATCH/dt:.1f} samples/s  "
              f"exec-MFU {flops/dt/PEAK:.4f}", flush=True)

    print(f"loss plain={losses['plain ']:.6f} packed={losses['packed']:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
