"""Architectural parity vs HuggingFace: converted weights reproduce HF logits.

This is the strongest equivalence check available offline: a randomly
initialized torch ``BertGenerationDecoder``/``Encoder`` (the reference's exact
decoder block, reference decoder_model.py:22-26) is converted to the native
Flax modules and must produce the same outputs on the same inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from transformers import BertGenerationConfig
from transformers.models.bert_generation import (
    BertGenerationDecoder,
    BertGenerationEncoder,
)

from vilmedic_tpu.blocks.transformer import (
    TransformerConfig,
    TransformerDecoder,
    TransformerEncoder,
)
from vilmedic_tpu.zoo.convert import (
    convert_bert_generation_decoder,
    convert_bert_generation_encoder,
)

CFG_KW = dict(
    vocab_size=64,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=32,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
    bos_token_id=0,
    eos_token_id=2,
    pad_token_id=1,
)


def test_decoder_matches_hf():
    hf_cfg = BertGenerationConfig(**CFG_KW, is_decoder=True, add_cross_attention=True)
    hf = BertGenerationDecoder(hf_cfg).eval()

    b, t, s = 2, 7, 5
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 64, (b, t))
    enc_states = rng.normal(size=(b, s, 32)).astype(np.float32)
    enc_mask = np.ones((b, s), np.int64)

    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones(b, t, dtype=torch.long),
            encoder_hidden_states=torch.tensor(enc_states),
            encoder_attention_mask=torch.tensor(enc_mask),
        ).logits.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_bert_generation_decoder(sd, CFG_KW["num_hidden_layers"])

    import jax.numpy as jnp

    dec = TransformerDecoder(TransformerConfig(**{
        k: v for k, v in CFG_KW.items() if k != "attention_probs_dropout_prob"
    }, add_cross_attention=True))
    logits = dec.apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32),
        jnp.ones((b, t), jnp.int32),
        jnp.asarray(enc_states),
        jnp.asarray(enc_mask, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(logits), hf_out, rtol=2e-4, atol=2e-4)


def test_encoder_matches_hf():
    hf_cfg = BertGenerationConfig(**CFG_KW)
    hf = BertGenerationEncoder(hf_cfg).eval()

    b, t = 2, 9
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 64, (b, t))

    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones(b, t, dtype=torch.long),
        ).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_bert_generation_encoder(sd, CFG_KW["num_hidden_layers"])

    import jax.numpy as jnp

    enc = TransformerEncoder(TransformerConfig(**{
        k: v for k, v in CFG_KW.items() if k != "attention_probs_dropout_prob"
    }))
    out = enc.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.ones((b, t), jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(out), hf_out, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ancestry", [False, True])
@pytest.mark.parametrize("length_penalty", [1.0, 2.0, 0.5])
def test_beam_search_matches_hf_generate(length_penalty, ancestry):
    """Converted model + our jitted beam search must reproduce HF ``generate``
    sequences (reference eval uses HF generate, evaluation.py:72-82; SURVEY.md
    hard part #1: match HF length-penalty/early-stop behavior)."""
    import jax
    import jax.numpy as jnp

    from transformers import GenerationConfig
    from vilmedic_tpu.decoding import beam_search, tile_for_beams

    hf_cfg = BertGenerationConfig(**CFG_KW, is_decoder=True, add_cross_attention=True)
    torch.manual_seed(0)
    hf = BertGenerationDecoder(hf_cfg).eval()

    b, s, max_len, beams = 3, 5, 12, 4
    rng = np.random.default_rng(0)
    enc_states = rng.normal(size=(b, s, 32)).astype(np.float32)
    enc_mask = np.ones((b, s), np.int64)

    with torch.no_grad():
        hf_seqs = hf.generate(
            input_ids=torch.zeros((b, 1), dtype=torch.long),  # BOS=0
            generation_config=GenerationConfig(
                bos_token_id=0, eos_token_id=2, pad_token_id=1,
                num_beams=beams, num_return_sequences=1, max_length=max_len,
                # use_cache=False: transformers 4.57's KV-cache path is broken
                # for standalone BertGenerationDecoder.generate (cross-attn mask
                # length mismatch); cache-free generate is semantically identical.
                length_penalty=length_penalty, use_cache=False,
            ),
            encoder_hidden_states=torch.tensor(enc_states),
            encoder_attention_mask=torch.tensor(enc_mask),
        ).numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_bert_generation_decoder(sd, CFG_KW["num_hidden_layers"])
    dec = TransformerDecoder(TransformerConfig(**{
        k: v for k, v in CFG_KW.items() if k != "attention_probs_dropout_prob"
    }, add_cross_attention=True))

    enc_j = jnp.asarray(enc_states)
    self_cache, cross_cache = dec.apply(
        {"params": params}, encoder_hidden_states=enc_j, mode="init_cache",
        max_len=max_len,
    )
    enc_m = jnp.asarray(enc_mask, jnp.int32)
    self_cache = tile_for_beams(self_cache, beams)
    cross_tiled = tile_for_beams(cross_cache, beams)
    enc_m_tiled = tile_for_beams(enc_m, beams)

    def step_fn(tokens, sc, index, anc=None):
        logits, new_self = dec.apply(
            {"params": params}, tokens, encoder_attention_mask=enc_m_tiled,
            mode="decode", cache=(sc, cross_tiled), decode_index=index,
            ancestry=anc,
        )
        return logits[:, -1].astype(jnp.float32), new_self

    result = beam_search(
        step_fn, self_cache, b, beams, max_len, bos_id=0, eos_id=2, pad_id=1,
        length_penalty=length_penalty, ancestry=ancestry,
    )
    ours = np.asarray(result.sequences)

    def trim(row):
        out = []
        for t in row:
            out.append(int(t))
            if t == 2:
                break
        return out

    for i in range(b):
        assert trim(ours[i]) == trim(hf_seqs[i]), (
            length_penalty, i, trim(ours[i]), trim(hf_seqs[i])
        )


def test_greedy_matches_hf_generate():
    """Greedy decoding (num_beams=1) parity with HF generate."""
    import jax.numpy as jnp

    from transformers import GenerationConfig
    from vilmedic_tpu.decoding import greedy_search

    hf_cfg = BertGenerationConfig(**CFG_KW, is_decoder=True, add_cross_attention=True)
    torch.manual_seed(1)
    hf = BertGenerationDecoder(hf_cfg).eval()

    b, s, max_len = 4, 5, 12
    rng = np.random.default_rng(2)
    enc_states = rng.normal(size=(b, s, 32)).astype(np.float32)
    enc_mask = np.ones((b, s), np.int64)

    with torch.no_grad():
        hf_seqs = hf.generate(
            input_ids=torch.zeros((b, 1), dtype=torch.long),
            generation_config=GenerationConfig(
                bos_token_id=0, eos_token_id=2, pad_token_id=1,
                num_beams=1, do_sample=False, max_length=max_len, use_cache=False,
            ),
            encoder_hidden_states=torch.tensor(enc_states),
            encoder_attention_mask=torch.tensor(enc_mask),
        ).numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_bert_generation_decoder(sd, CFG_KW["num_hidden_layers"])
    dec = TransformerDecoder(TransformerConfig(**{
        k: v for k, v in CFG_KW.items() if k != "attention_probs_dropout_prob"
    }, add_cross_attention=True))

    enc_j = jnp.asarray(enc_states)
    self_cache, cross_cache = dec.apply(
        {"params": params}, encoder_hidden_states=enc_j, mode="init_cache",
        max_len=max_len,
    )
    enc_m = jnp.asarray(enc_mask, jnp.int32)

    def step_fn(tokens, sc, index):
        logits, new_self = dec.apply(
            {"params": params}, tokens, encoder_attention_mask=enc_m,
            mode="decode", cache=(sc, cross_cache), decode_index=index,
        )
        return logits[:, -1].astype(jnp.float32), new_self

    ours = np.asarray(greedy_search(
        step_fn, self_cache, b, max_len, bos_id=0, eos_id=2, pad_id=1,
        forced_eos=False,
    ).sequences)

    def trim(row):
        out = []
        for t in row:
            out.append(int(t))
            if t == 2:
                break
        return out

    for i in range(b):
        assert trim(ours[i]) == trim(hf_seqs[i]), (i, trim(ours[i]), trim(hf_seqs[i]))
