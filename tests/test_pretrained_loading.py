"""Pretrained HF weight loading into native blocks (VERDICT r1 gap #3).

The reference builds decoders/encoders directly from pretrained HF weights
(RRG_HF.py:90 ``AutoModelForCausalLM.from_pretrained(name, add_cross_attention
=True)``, encoder_model.py:19-35). Here the torch state dict converts through
``zoo/convert.convert_hf_causal_lm`` / ``convert_hf_text_encoder`` into the
native Flax blocks — these tests prove logit-level parity on a random-init
RoBERTa (incl. token-type folding, the position-offset-2 quirk, and the
RobertaLMHead dense+LN transform), and that the RRG proto picks weights up from
a local HF directory automatically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vilmedic_tpu.blocks.transformer import TransformerConfig, TransformerDecoder
from vilmedic_tpu.zoo.convert import (
    convert_hf_causal_lm, convert_hf_text_encoder, overlay_params,
)

VOCAB, HIDDEN, LAYERS, HEADS, INTER = 120, 32, 2, 4, 64


def _roberta_config(**kw):
    from transformers import RobertaConfig

    return RobertaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=66, pad_token_id=1, bos_token_id=0,
        eos_token_id=2, **kw,
    )


@pytest.fixture(scope="module")
def torch_roberta_lm():
    import torch
    from transformers import RobertaForCausalLM

    torch.manual_seed(0)
    cfg = _roberta_config(is_decoder=True, add_cross_attention=True)
    return RobertaForCausalLM(cfg).eval()


def test_roberta_causal_lm_conversion_logits_match(torch_roberta_lm):
    import torch

    model = torch_roberta_lm
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_hf_causal_lm(sd)
    assert "lm_transform" in params  # RobertaLMHead dense+LN captured

    rng = np.random.default_rng(0)
    ids = rng.integers(3, VOCAB, (2, 9))  # avoid pad id 1 (RoBERTa pos quirk)
    mask = np.ones((2, 9), np.int64)
    enc = rng.normal(size=(2, 5, HIDDEN)).astype(np.float32)
    enc_mask = np.ones((2, 5), np.int64)

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask),
            encoder_hidden_states=torch.from_numpy(enc),
            encoder_attention_mask=torch.from_numpy(enc_mask),
        ).logits.numpy()

    cfg = TransformerConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=66, add_cross_attention=True,
        lm_head_transform=True,
    )
    dec = TransformerDecoder(cfg)
    ours = dec.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        encoder_hidden_states=jnp.asarray(enc),
        encoder_attention_mask=jnp.asarray(enc_mask, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_roberta_encoder_conversion_hidden_match():
    import torch
    from transformers import RobertaModel

    torch.manual_seed(1)
    model = RobertaModel(_roberta_config()).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    # RobertaModel state dict has no "roberta." prefix: offset passed explicitly
    params = convert_hf_text_encoder(sd, position_offset=2)

    rng = np.random.default_rng(1)
    ids = rng.integers(3, VOCAB, (2, 7))
    mask = np.ones((2, 7), np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    from vilmedic_tpu.blocks.transformer import TransformerEncoder

    cfg = TransformerConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=66,
    )
    enc = TransformerEncoder(cfg)
    ours = enc.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_rrg_proto_loads_pretrained_from_local_dir(tmp_path, torch_roberta_lm):
    """decoder.proto = <local HF dir> -> RRG builds the architecture from the
    config AND loads the converted weights (reference RRG_HF.py:90 semantics)."""
    model_dir = tmp_path / "tiny-roberta"
    torch_roberta_lm.save_pretrained(model_dir)

    from vilmedic_tpu import registry

    rrg = registry.get("model", "RRG")(
        decoder={"proto": str(model_dir)},
        cnn={"proto": "VisualEncoder", "backbone": "vit", "permute": "no_permute",
             "hidden_size": HIDDEN, "num_hidden_layers": 1,
             "num_attention_heads": HEADS, "intermediate_size": INTER,
             "patch_size": 16},
    )
    assert rrg._pretrained_blocks == {"dec": (str(model_dir), "causal")}
    assert rrg.dec_config.lm_head_transform  # model_type roberta -> MLP head

    batch = {
        "images": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.ones((1, 6), jnp.int32) * 3,
        "attention_mask": jnp.ones((1, 6), jnp.int32),
    }
    variables = rrg.init_variables(jax.random.key(0), batch)
    loaded = rrg.load_pretrained(variables)

    expected = convert_hf_causal_lm(
        {k: v.numpy() for k, v in torch_roberta_lm.state_dict().items()}
    )
    got_emb = loaded["params"]["dec"]["embeddings"]["word_embeddings"]["embedding"]
    np.testing.assert_allclose(
        np.asarray(got_emb), expected["embeddings"]["word_embeddings"]["embedding"],
        atol=1e-6,
    )
    got_fc1 = loaded["params"]["dec"]["layer_1"]["ffn"]["fc1"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got_fc1), expected["layer_1"]["ffn"]["fc1"]["kernel"], atol=1e-6
    )
    # random init differed before the overlay
    before = variables["params"]["dec"]["embeddings"]["word_embeddings"]["embedding"]
    assert not np.allclose(np.asarray(before), np.asarray(got_emb))


def test_overlay_keeps_mismatched_vocab():
    """Task vocab != pretrained vocab -> embeddings/lm_head keep random init,
    inner layers still load (defensive path for rebuilt-vocab recipes)."""
    dst = {
        "embeddings": {"word_embeddings": {"embedding": np.zeros((10, 4), np.float32)}},
        "layer_0": {"ffn": {"fc1": {"kernel": np.zeros((4, 8), np.float32)}}},
    }
    src = {
        "embeddings": {"word_embeddings": {"embedding": np.ones((99, 4), np.float32)}},
        "layer_0": {"ffn": {"fc1": {"kernel": np.ones((4, 8), np.float32)}}},
        "lm_head": {"kernel": np.ones((4, 99), np.float32)},  # absent in dst
    }
    out = overlay_params(dst, src)
    assert out["embeddings"]["word_embeddings"]["embedding"].sum() == 0  # kept
    assert out["layer_0"]["ffn"]["fc1"]["kernel"].sum() == 32  # loaded
    assert "lm_head" not in out


def test_hf_vit_conversion_hidden_match(tmp_path):
    """HF ViTModel weights -> our pre-LN ViT: last_hidden_state parity."""
    import torch
    from transformers import ViTConfig, ViTModel

    from vilmedic_tpu.blocks.vision.vit import ViT
    from vilmedic_tpu.zoo.convert_vision import convert_hf_vit

    torch.manual_seed(4)
    cfg = ViTConfig(hidden_size=HIDDEN, num_hidden_layers=LAYERS,
                    num_attention_heads=HEADS, intermediate_size=INTER,
                    image_size=32, patch_size=16)
    model = ViTModel(cfg, add_pooling_layer=False).eval()
    params = convert_hf_vit({k: v.numpy() for k, v in model.state_dict().items()})

    rng = np.random.default_rng(4)
    imgs = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(imgs)).last_hidden_state.numpy()

    vit = ViT(hidden_size=HIDDEN, num_hidden_layers=LAYERS,
              num_attention_heads=HEADS, intermediate_size=INTER,
              image_size=32, patch_size=16, pre_ln=True)
    ours = vit.apply({"params": params}, jnp.asarray(imgs.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_rrg_hf_loads_pretrained_vit_and_decoder(tmp_path, torch_roberta_lm):
    """RRG_HF with vision=<local ViT dir>, decoder=<local roberta dir> loads
    BOTH towers' pretrained weights (reference RRG_HF.py:49-52, :90)."""
    import torch
    from transformers import ViTConfig, ViTModel

    vit_dir = tmp_path / "tiny-vit"
    dec_dir = tmp_path / "tiny-roberta"
    torch.manual_seed(5)
    ViTModel(ViTConfig(hidden_size=HIDDEN, num_hidden_layers=1,
                       num_attention_heads=HEADS, intermediate_size=INTER,
                       image_size=32, patch_size=16)).save_pretrained(vit_dir)
    torch_roberta_lm.save_pretrained(dec_dir)

    from vilmedic_tpu import registry

    model = registry.get("model", "RRG_HF")(
        vision=str(vit_dir), decoder=str(dec_dir),
    )
    assert model._pretrained_blocks["enc"] == (str(vit_dir), "vit")
    assert model._pretrained_blocks["dec"] == (str(dec_dir), "causal")

    batch = {
        "images": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.ones((1, 6), jnp.int32) * 3,
        "attention_mask": jnp.ones((1, 6), jnp.int32),
    }
    variables = model.init_variables(jax.random.key(0), batch)
    loaded = model.load_pretrained(variables)
    # ViT cls token loaded exactly
    from transformers import ViTModel as _V

    ref_vit = _V.from_pretrained(vit_dir, local_files_only=True)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["enc"]["model"]["cls_token"]),
        ref_vit.state_dict()["embeddings.cls_token"].numpy(), atol=1e-6,
    )
    before = variables["params"]["enc"]["model"]["cls_token"]
    after = loaded["params"]["enc"]["model"]["cls_token"]
    assert not np.allclose(np.asarray(before), np.asarray(after)) or np.allclose(
        np.asarray(after), 0
    )
