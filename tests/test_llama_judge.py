"""Flax LLaMA (blocks/llm) — the GREEN judge's TPU serving path.

Converter + numerics parity against random-init torch ``LlamaForCausalLM``
(reference judge loading: NLG/green/green.py:24-29), greedy-decode parity
against HF ``generate`` incl. left padding and EOS early stop, GQA, the
tensor-parallel sharding layout on the 8-device CPU mesh, and the text-level
judge path with an injected tokenizer.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tr = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from vilmedic_tpu.blocks.llm import (
    LlamaConfig,
    LlamaForCausalLM,
    greedy_generate,
    llama_param_shardings,
)
from vilmedic_tpu.zoo.convert_llm import convert_hf_llama

VOCAB = 97


def tiny_torch(num_kv=4, seed=0):
    cfg = tr.LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=num_kv,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    model = tr.LlamaForCausalLM(cfg)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    model.eval()
    return cfg, model


def flax_from(hf_cfg, model, dtype=jnp.float32):
    cfg = LlamaConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        num_key_value_heads=hf_cfg.num_key_value_heads,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        rms_norm_eps=hf_cfg.rms_norm_eps,
        dtype=dtype,
    )
    params = {"params": convert_hf_llama(model.state_dict())}
    return LlamaForCausalLM(cfg), params


def left_padded_batch(rng, b=3, p=9):
    ids = rng.integers(3, VOCAB, (b, p)).astype(np.int32)
    mask = np.ones((b, p), np.int32)
    for i, pad in enumerate([0, 3, 5][:b]):
        ids[i, :pad] = 0
        mask[i, :pad] = 0
    return ids, mask


@pytest.mark.parametrize("num_kv", [4, 2])
def test_full_sequence_logit_parity(num_kv):
    hf_cfg, tm = tiny_torch(num_kv)
    fm, params = flax_from(hf_cfg, tm)
    rng = np.random.default_rng(1)
    ids, mask = left_padded_batch(rng)

    # HF's plain forward defaults position_ids to arange; pass the
    # mask-derived positions our module (and HF generate) uses
    pos = np.clip(np.cumsum(mask, -1) - 1, 0, None)
    with torch.no_grad():
        ref = tm(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            position_ids=torch.tensor(pos, dtype=torch.long),
        ).logits.numpy()
    got = np.asarray(fm.apply(params, jnp.asarray(ids), jnp.asarray(mask)))
    # compare where attended (padded rows produce garbage on both sides)
    np.testing.assert_allclose(
        got[mask > 0], ref[mask > 0], rtol=2e-4, atol=2e-4
    )


def test_greedy_generate_matches_hf_and_stops_at_eos():
    hf_cfg, tm = tiny_torch()
    fm, params = flax_from(hf_cfg, tm)
    rng = np.random.default_rng(2)
    ids, mask = left_padded_batch(rng)
    max_new = 8

    def ours(eos):
        return np.asarray(greedy_generate(
            fm, params, jnp.asarray(ids), jnp.asarray(mask),
            max_new, eos_id=eos, pad_id=1,
        ))

    def hf(eos):
        with torch.no_grad():
            out = tm.generate(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
                max_new_tokens=max_new, do_sample=False,
                eos_token_id=eos, pad_token_id=1,
            )
        return out.numpy()[:, ids.shape[1]:]

    # no EOS in play: pure step-by-step parity
    np.testing.assert_array_equal(ours(-1), hf(None))

    # force an EOS mid-generation: pick the token row 0 emits at step 3
    eos = int(ours(-1)[0, 2])
    got, ref = ours(eos), hf(eos)
    np.testing.assert_array_equal(got, ref)
    row = got[0]
    hit = int(np.argmax(row == eos))
    assert (row[hit + 1:] == 1).all()  # pad after EOS


def test_tensor_parallel_sharding_matches_single_device():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    hf_cfg, tm = tiny_torch()
    fm, params = flax_from(hf_cfg, tm)
    rng = np.random.default_rng(3)
    ids, mask = left_padded_batch(rng)

    base = np.asarray(fm.apply(params, jnp.asarray(ids), jnp.asarray(mask)))

    mesh = jax.sharding.Mesh(np.array(devs[:4]), ("model",))
    sharded = jax.device_put(params, llama_param_shardings(params, mesh))
    got = np.asarray(
        jax.jit(lambda p, i, m: fm.apply(p, i, m))(
            sharded, jnp.asarray(ids), jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(got[mask > 0], base[mask > 0],
                               rtol=1e-5, atol=1e-5)


class _WordTok:
    """Minimal left-padding tokenizer for the judge text path."""

    eos_token_id = 2
    pad_token_id = 1

    def __call__(self, texts, padding=True, truncation=True, max_length=None,
                 return_tensors="np"):
        seqs = [[3 + (hash(w) % (VOCAB - 3)) for w in t.split()][:max_length]
                for t in texts]
        p = max(len(s) for s in seqs)
        ids = np.full((len(seqs), p), self.pad_token_id, np.int32)
        mask = np.zeros((len(seqs), p), np.int32)
        for i, s in enumerate(seqs):
            ids[i, p - len(s):] = s
            mask[i, p - len(s):] = 1
        return {"input_ids": ids, "attention_mask": mask}

    def batch_decode(self, toks, skip_special_tokens=True):
        return [" ".join(f"t{int(x)}" for x in row if int(x) > 2)
                for row in np.asarray(toks)]


def test_tpu_judge_text_path(tmp_path):
    """End-to-end judge: checkpoint dir -> converted model -> batched,
    bucketed greedy decode -> decoded responses (generated tokens only)."""
    from vilmedic_tpu.scorers.green import GREENImpl

    hf_cfg, tm = tiny_torch()
    d = tmp_path / "judge"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    from safetensors.torch import save_file

    save_file({k: v.contiguous() for k, v in tm.state_dict().items()},
              str(d / "model.safetensors"))

    judge = GREENImpl._tpu_judge(
        str(d), max_length=64, batch_size=2, tokenizer=_WordTok(),
        max_new_tokens=6,
    )
    outs = judge(["lungs are clear", "no acute disease seen today",
                  "mild cardiomegaly"])
    assert len(outs) == 3 and all(isinstance(o, str) for o in outs)

    # the responses must equal direct greedy decode of the same model, with
    # the SAME batch layout and TP sharding the judge used (its last batch is
    # [p3, p3]: row 0 duplicated to the fixed batch size; params TP-shard over
    # all local devices) — a different batch shape or sharding changes matmul
    # reduction order, and greedy near-ties on a random-init model may flip
    fm, params = flax_from(hf_cfg, tm)
    tok = _WordTok()
    from vilmedic_tpu.blocks.llm import llama_param_shardings
    from vilmedic_tpu.scorers.green import _chat_wrap

    devs = jax.devices()
    if len(devs) > 1:
        mesh = jax.sharding.Mesh(np.array(devs), ("model",))
        params = jax.device_put(params, llama_param_shardings(params, mesh))

    enc = tok([_chat_wrap("mild cardiomegaly")] * 2)
    ids, mask = enc["input_ids"], enc["attention_mask"]
    lpad = 128 - ids.shape[1]
    ids = np.pad(ids, ((0, 0), (lpad, 0)), constant_values=1)
    mask = np.pad(mask, ((0, 0), (lpad, 0)))
    direct = np.asarray(jax.jit(
        lambda pr, i, m: greedy_generate(fm, pr, i, m, 6, eos_id=2, pad_id=1)
    )(params, jnp.asarray(ids), jnp.asarray(mask)))
    assert outs[2] == tok.batch_decode(direct)[0]

    # batching/slicing independence: a single-prompt call feeds the SAME
    # (batch-padded) executable the batched call used for its last chunk,
    # so the row must reproduce bit-exactly
    assert judge(["mild cardiomegaly"]) == [outs[2]]
