"""GREEN-judge TPU serving throughput (blocks/llm Flax LLaMA).

Measures prefill+greedy-decode tokens/s of the judge path on the local JAX
backend with a random-init model (the real StanfordAIMI/GREEN-radllama2-7b
is weights-gated; shape realism comes from the config below). Run with
JUDGE_PRESET=tiny|1b|7b (default 1b; 7b needs a multi-chip slice — the 14 GB
of bf16 params alone exceed a lone v5e chip's 16 GB HBM once the cache and
activations land).

Numbers recorded in docs/metrics.md (GREEN eval-cost note).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vilmedic_tpu.blocks.llm import (
    LlamaConfig,
    LlamaForCausalLM,
    greedy_generate,
    llama_param_shardings,
)

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")

PRESETS = {
    # judge-shaped: rad-llama2 vocab, untied head
    "tiny": dict(hidden_size=512, intermediate_size=1376,
                 num_hidden_layers=4, num_attention_heads=8,
                 num_key_value_heads=8),
    "1b": dict(hidden_size=2048, intermediate_size=5504,
               num_hidden_layers=22, num_attention_heads=16,
               num_key_value_heads=16),
    "7b": dict(hidden_size=4096, intermediate_size=11008,
               num_hidden_layers=32, num_attention_heads=32,
               num_key_value_heads=32),
}

PRESET = os.environ.get("JUDGE_PRESET", "1b")
BATCH = int(os.environ.get("JUDGE_BATCH", 4))
PROMPT = int(os.environ.get("JUDGE_PROMPT", 1024))  # GREEN prompts are long
MAX_NEW = int(os.environ.get("JUDGE_MAX_NEW", 256))


def main():
    print(f"devices: {jax.devices()} preset={PRESET} batch={BATCH} "
          f"prompt={PROMPT} max_new={MAX_NEW}", flush=True)
    cfg = LlamaConfig(vocab_size=32000, max_position_embeddings=4096,
                      dtype=jnp.bfloat16, **PRESETS[PRESET])
    model = LlamaForCausalLM(cfg)

    # init ON DEVICE in one jitted program (axon: op-by-op init is minutes)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    params = jax.jit(
        lambda key: model.init(key, ids0, jnp.ones_like(ids0))
    )(jax.random.key(0))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params / 1e9:.2f}B", flush=True)

    devs = jax.devices()
    if len(devs) > 1:
        mesh = jax.sharding.Mesh(np.array(devs), ("model",))
        params = jax.device_put(params, llama_param_shardings(params, mesh))

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 32000, (BATCH, PROMPT)), jnp.int32)
    mask = jnp.ones((BATCH, PROMPT), jnp.int32)

    gen = jax.jit(lambda p, i, m: greedy_generate(
        model, p, i, m, MAX_NEW, eos_id=-1, pad_id=0  # no EOS: full-length run
    ))
    t0 = time.perf_counter()
    np.asarray(gen(params, ids, mask))
    print(f"compiled+warm in {time.perf_counter() - t0:.1f}s", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(gen(params, ids, mask))
        best = min(best, time.perf_counter() - t0)
    new_toks = BATCH * MAX_NEW
    print(
        f"{best * 1e3:.0f} ms/batch -> {new_toks / best:.1f} new tokens/s "
        f"({BATCH * PROMPT / best:.0f} prompt tokens/s prefill-inclusive)",
        flush=True,
    )


if __name__ == "__main__":
    main()
