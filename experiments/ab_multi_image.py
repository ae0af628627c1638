"""Measured hardware point for the multi-image long axis (SURVEY §5):
RRG flagship (DenseNet-169 + cross-attn decoder) at multi_image N=1 vs N=3 —
the N·S patch-concat path (reference RRG_HF.py:116-152) that serves as this
domain's long-context analog. Reports beam-8 decode rep/s and train
samples/s; the N=3 cross-attention memory is 3x876 patch tokens with a
per-image mask (one image of the three masked off, exercising the collate
semantics, ImageDataset multi-image collate).

Run: python experiments/ab_multi_image.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench


def measure_decode(module, variables, batch, n_img):
    generate = bench.build_generate(module, variables, batch)
    shape = (batch, bench.IMAGE, bench.IMAGE, 3) if n_img == 1 else (
        batch, n_img, bench.IMAGE, bench.IMAGE, 3)
    make_images = jax.jit(lambda key: jax.random.normal(key, shape, jnp.float32))
    batches = [make_images(jax.random.key(i)) for i in range(5)]
    for b in batches:
        np.asarray(b.reshape(-1)[:1])
    np.asarray(generate(variables, batches[0]))  # compile

    t0 = time.perf_counter()
    outs = [generate(variables, b) for b in batches]
    for o in outs:
        np.asarray(o)
    rps = batch * len(batches) / (time.perf_counter() - t0)
    print(f"decode  n_img={n_img} batch={batch}: {rps:7.1f} rep/s")
    return rps


def measure_train(module, variables, batch, n_img):
    import optax

    shape = (batch, bench.IMAGE, bench.IMAGE, 3) if n_img == 1 else (
        batch, n_img, bench.IMAGE, bench.IMAGE, 3)
    make_batch = jax.jit(lambda key: (
        jax.random.normal(key, shape, jnp.float32),
        jax.random.randint(key, (batch, bench.TRAIN_LEN), 3, bench.VOCAB,
                           jnp.int32),
    ))
    images, ids = make_batch(jax.random.key(1))
    mask = jnp.ones((batch, bench.TRAIN_LEN), jnp.int32)
    # one image of each item's three masked off — the real collate pads with
    # zero-images + a boolean images_mask (data/image.py)
    images_mask = None
    if n_img > 1:
        images_mask = jnp.asarray(
            (np.arange(n_img) < n_img - 1)[None].repeat(batch, 0), jnp.int32)
    np.asarray(images.reshape(-1)[:1])

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    def loss_fn(params, stats, images, ids, mask, key):
        vs = {"params": params}
        if stats:
            vs["batch_stats"] = stats
        out, upd = module.apply(
            vs, images, ids, mask, images_mask=images_mask, train=True,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return out["loss"], upd.get("batch_stats", {})

    @jax.jit
    def step(params, stats, opt_state, images, ids, mask, key):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats, images, ids, mask, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    key = jax.random.key(0)
    params, stats, opt_state, loss = step(params, stats, opt_state, images,
                                          ids, mask, key)  # compile
    np.asarray(loss)
    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        params, stats, opt_state, loss = step(params, stats, opt_state,
                                              images, ids, mask, key)
    np.asarray(loss)
    sps = batch * n / (time.perf_counter() - t0)
    print(f"train   n_img={n_img} batch={batch}: {sps:7.1f} samples/s "
          f"(loss {float(np.asarray(loss)):.3f})")
    return sps


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")
    module = bench.build_model()
    im0 = jnp.zeros((2, 3, bench.IMAGE, bench.IMAGE, 3), jnp.float32)
    ids0 = jnp.zeros((2, 8), jnp.int32)
    init = jax.jit(lambda key: module.init(
        {"params": key}, im0, ids0, jnp.ones_like(ids0), train=False))
    variables = init(jax.random.key(0))
    print("init done", file=sys.stderr)

    results = {}
    for n_img in (1, 3):
        results[f"decode_n{n_img}"] = measure_decode(module, variables, 32, n_img)
        results[f"train_n{n_img}"] = measure_train(module, variables, 16, n_img)
    r = results
    print(f"\nper-report cost ratio decode N3/N1: "
          f"{r['decode_n1'] / r['decode_n3']:.2f}x "
          f"(3.0x = encode-bound, 1.0x = decoder-bound)")
    print(f"per-sample cost ratio train  N3/N1: "
          f"{r['train_n1'] / r['train_n3']:.2f}x")


if __name__ == "__main__":
    main()
