"""Decompose the ViT fast-path train step into component costs (VERDICT r3
item 3: vit_train_mfu 0.40 -> where do the other 60% go?).

Rather than parsing profiler protobufs, times each component as its own jitted
fwd+bwd(+adamw) program and compares against the full step:

  full        — the production step (bench.bench_train's program)
  enc_only    — ViT tower fwd+bwd (loss = mean(h^2)) + adamw on enc params
  dec_only    — 1-layer cross-attn decoder + lm-head + xent fwd+bwd + adamw,
                fed a FIXED (B, 197, 768) bf16 encoder output
  head_only   — lm-head matmul + causal_lm_loss fwd+bwd on fixed hidden states
                (the (B, T, V) logits round-trips)
  adamw_only  — optimizer update alone on full-model-shaped grads

Components don't sum exactly to the full step (XLA fuses across boundaries,
overlap differs) but the ranking tells us which lever moves MFU.

Run: python experiments/profile_vit_train.py
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

BATCH = int(os.environ.get("PROF_BATCH", 64))
N = 6


def timeit(fn, args, label, flops=None):
    """Chain N calls through carried state (first returned value tuple),
    sync once — same discipline as bench.py (tunnel RTT per-step otherwise)."""
    out = fn(*args)
    jax.block_until_ready(out)
    # force a real transfer: on the axon tunnel block_until_ready may not wait
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / N
    peak = bench._peak_flops()
    mfu = f"  mfu={flops / dt / peak:.4f}" if flops else ""
    print(f"{label:>10}: {dt * 1e3:8.2f} ms{mfu}", flush=True)
    return dt


def cost_flops(jitted, args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def main():
    print(f"devices: {jax.devices()}  batch={BATCH}", flush=True)
    from vilmedic_tpu.blocks.transformer import (
        TransformerConfig,
        TransformerDecoder,
        causal_lm_loss,
    )

    module = bench.build_vit_model()
    im0 = jnp.zeros((2, bench.IMAGE, bench.IMAGE, 3), jnp.float32)
    ids0 = jnp.zeros((2, 8), jnp.int32)
    variables = jax.jit(lambda key: module.init(
        {"params": key}, im0, ids0, jnp.ones_like(ids0), train=False
    ))(jax.random.key(0))
    params = variables["params"]
    tx = optax.adamw(1e-4)

    images = jax.jit(lambda k: jax.random.normal(
        k, (BATCH, bench.IMAGE, bench.IMAGE, 3), jnp.float32))(jax.random.key(1))
    ids = jax.jit(lambda k: jax.random.randint(
        k, (BATCH, bench.TRAIN_LEN), 3, bench.VOCAB, jnp.int32))(jax.random.key(2))
    mask = jnp.ones((BATCH, bench.TRAIN_LEN), jnp.int32)
    np.asarray(images[0, 0, 0])

    # ---- full step ---------------------------------------------------------
    opt_state = jax.jit(tx.init)(params)

    def full_loss(p, key):
        out = module.apply({"params": p}, images, ids, mask, train=True,
                           rngs={"dropout": key})
        return out["loss"]

    @jax.jit
    def full_step(p, s, key):
        loss, grads = jax.value_and_grad(full_loss)(p, key)
        updates, s = tx.update(grads, s, p)
        return (optax.apply_updates(p, updates), s, loss)

    args = (params, opt_state, jax.random.key(0))
    t_full = timeit(full_step, args, "full", cost_flops(full_step, args))

    # ---- encoder only ------------------------------------------------------
    enc_params = params["enc"]
    enc_opt = jax.jit(tx.init)(enc_params)

    def enc_loss(p, key):
        h, _ = module.enc.apply({"params": p}, images, None, train=True,
                                rngs={"dropout": key},
                                method=type(module.enc).encode)
        return jnp.mean(h.astype(jnp.float32) ** 2)

    @jax.jit
    def enc_step(p, s, key):
        loss, grads = jax.value_and_grad(enc_loss)(p, key)
        updates, s = tx.update(grads, s, p)
        return (optax.apply_updates(p, updates), s, loss)

    eargs = (enc_params, enc_opt, jax.random.key(0))
    t_enc = timeit(enc_step, eargs, "enc_only", cost_flops(enc_step, eargs))

    # ---- decoder only (fixed encoder output) -------------------------------
    dec = TransformerDecoder(module.dec_config)
    dec_params = params["dec"]
    dec_opt = jax.jit(tx.init)(dec_params)
    enc_h = jax.jit(lambda k: jax.random.normal(
        k, (BATCH, 197, 768), jnp.bfloat16))(jax.random.key(3))
    enc_m = jnp.ones((BATCH, 197), jnp.int32)
    np.asarray(enc_h[0, 0, 0].astype(jnp.float32))

    def dec_loss(p, key):
        logits = dec.apply({"params": p}, ids, mask,
                           encoder_hidden_states=enc_h,
                           encoder_attention_mask=enc_m,
                           deterministic=False, rngs={"dropout": key})
        return causal_lm_loss(logits, ids, mask)

    @jax.jit
    def dec_step(p, s, key):
        loss, grads = jax.value_and_grad(dec_loss)(p, key)
        updates, s = tx.update(grads, s, p)
        return (optax.apply_updates(p, updates), s, loss)

    dargs = (dec_params, dec_opt, jax.random.key(0))
    t_dec = timeit(dec_step, dargs, "dec_only", cost_flops(dec_step, dargs))

    # ---- lm-head + xent only (fixed pre-head hidden states) ----------------
    W = dec_params["lm_head"]["kernel"]
    b = dec_params["lm_head"]["bias"]
    h_fix = jax.jit(lambda k: jax.random.normal(
        k, (BATCH, bench.TRAIN_LEN, 768), jnp.bfloat16))(jax.random.key(4))
    np.asarray(h_fix[0, 0, 0].astype(jnp.float32))

    def head_loss(W, b, h):
        logits = (jnp.matmul(h, W.astype(h.dtype)) + b.astype(h.dtype)
                  ).astype(jnp.float32)
        return causal_lm_loss(logits, ids, mask)

    @jax.jit
    def head_step(W, b, h):
        loss, grads = jax.value_and_grad(head_loss, argnums=(0, 1, 2))(W, b, h)
        return (grads[2], loss)  # carry dh so the chain is honest

    hargs = (W, b, h_fix)
    t_head = timeit(head_step, hargs, "head_only", cost_flops(head_step, hargs))

    # ---- adamw only --------------------------------------------------------
    grads0 = jax.jit(lambda p: jax.tree.map(lambda x: x * 1e-3, p))(params)
    opt_state2 = jax.jit(tx.init)(params)

    @jax.jit
    def opt_step(p, s, g):
        updates, s = tx.update(g, s, p)
        return (optax.apply_updates(p, updates), s)

    t_opt = timeit(opt_step, (params, opt_state2, grads0), "adamw_only")

    print(f"\nsum(enc+dec+adamw) = {(t_enc + t_dec + t_opt) * 1e3:.2f} ms "
          f"vs full {t_full * 1e3:.2f} ms "
          f"(head_only {t_head * 1e3:.2f} ms is inside dec_only)", flush=True)


if __name__ == "__main__":
    main()
