"""Full reference-RRG checkpoint conversion: tree matches the native RRG module."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vilmedic_tpu.blocks.transformer import TransformerConfig
from vilmedic_tpu.blocks.vision.visual_encoder import VisualEncoder
from vilmedic_tpu.models.rrg import RRGModule
from vilmedic_tpu.zoo.convert import convert_reference_rrg

VOCAB, HIDDEN, LAYERS = 50, 32, 1


def _flax_rrg_shapes():
    enc = VisualEncoder(
        backbone="densenet121", output_layer="features", permute="batch_first",
        projection_dim=HIDDEN,
    )
    cfg = TransformerConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=32,
    )
    module = RRGModule(enc=enc, dec_config=cfg)
    variables = jax.eval_shape(
        lambda k: module.init(
            k, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 6), jnp.int32),
            jnp.ones((1, 6), jnp.int32),
        ),
        jax.random.key(0),
    )
    return variables


def _reference_style_state_dict(variables):
    """Synthesize a reference RRG torch state dict with correct shapes from the
    flax tree (decoder names per HF BertGeneration, vision per torchvision)."""
    sd = {}
    p = variables["params"]

    # decoder
    demb = p["dec"]["embeddings"]
    sd["dec.decoder.bert.embeddings.word_embeddings.weight"] = np.zeros(
        demb["word_embeddings"]["embedding"].shape, np.float32)
    sd["dec.decoder.bert.embeddings.position_embeddings.weight"] = np.zeros(
        demb["position_embeddings"]["embedding"].shape, np.float32)
    sd["dec.decoder.bert.embeddings.LayerNorm.weight"] = np.zeros(
        demb["ln"]["scale"].shape, np.float32)
    sd["dec.decoder.bert.embeddings.LayerNorm.bias"] = np.zeros(
        demb["ln"]["bias"].shape, np.float32)
    for i in range(LAYERS):
        fl = p["dec"][f"layer_{i}"]
        t = f"dec.decoder.bert.encoder.layer.{i}"
        for hf_block, fx_block in (("attention", "self_attn"),
                                   ("crossattention", "cross_attn")):
            for hf_n, fx_n in (("query", "q"), ("key", "k"), ("value", "v")):
                k = fl[fx_block][fx_n]["kernel"]
                sd[f"{t}.{hf_block}.self.{hf_n}.weight"] = np.zeros(k.shape[::-1], np.float32)
                sd[f"{t}.{hf_block}.self.{hf_n}.bias"] = np.zeros(
                    fl[fx_block][fx_n]["bias"].shape, np.float32)
            o = fl[fx_block]["o"]["kernel"]
            sd[f"{t}.{hf_block}.output.dense.weight"] = np.zeros(o.shape[::-1], np.float32)
            sd[f"{t}.{hf_block}.output.dense.bias"] = np.zeros(
                fl[fx_block]["o"]["bias"].shape, np.float32)
        ln_map = (("attention.output.LayerNorm", "self_ln"),
                  ("crossattention.output.LayerNorm", "cross_ln"),
                  ("output.LayerNorm", "ffn_ln"))
        for hf_n, fx_n in ln_map:
            sd[f"{t}.{hf_n}.weight"] = np.zeros(fl[fx_n]["scale"].shape, np.float32)
            sd[f"{t}.{hf_n}.bias"] = np.zeros(fl[fx_n]["bias"].shape, np.float32)
        sd[f"{t}.intermediate.dense.weight"] = np.zeros(
            fl["ffn"]["fc1"]["kernel"].shape[::-1], np.float32)
        sd[f"{t}.intermediate.dense.bias"] = np.zeros(
            fl["ffn"]["fc1"]["bias"].shape, np.float32)
        sd[f"{t}.output.dense.weight"] = np.zeros(
            fl["ffn"]["fc2"]["kernel"].shape[::-1], np.float32)
        sd[f"{t}.output.dense.bias"] = np.zeros(
            fl["ffn"]["fc2"]["bias"].shape, np.float32)
    sd["dec.decoder.lm_head.decoder.weight"] = np.zeros(
        p["dec"]["lm_head"]["kernel"].shape[::-1], np.float32)
    sd["dec.decoder.lm_head.decoder.bias"] = np.zeros(
        p["dec"]["lm_head"]["bias"].shape, np.float32)

    # vision tower (densenet121 under a truncating Sequential, index 0)
    vm = p["enc"]["model"]

    def put_conv(name, kernel):
        kh, kw, ci, co = kernel.shape
        sd[f"enc.model.0.{name}"] = np.zeros((co, ci, kh, kw), np.float32)

    def put_bn(prefix, scale):
        for s in ("weight", "bias", "running_mean", "running_var"):
            sd[f"enc.model.0.{prefix}.{s}"] = np.zeros(scale.shape, np.float32)

    put_conv("conv0.weight", vm["conv0"]["kernel"])
    put_bn("norm0", vm["norm0"]["scale"])
    from vilmedic_tpu.blocks.vision.densenet import CONFIGS

    _, blocks, _ = CONFIGS["densenet121"]
    for bi, n in enumerate(blocks):
        for li in range(n):
            fl = vm[f"block{bi}_layer{li}"]
            t = f"denseblock{bi + 1}.denselayer{li + 1}"
            put_bn(f"{t}.norm1", fl["BatchNorm_0"]["scale"])
            put_conv(f"{t}.conv1.weight", fl["Conv_0"]["kernel"])
            put_bn(f"{t}.norm2", fl["BatchNorm_1"]["scale"])
            put_conv(f"{t}.conv2.weight", fl["Conv_1"]["kernel"])
        if bi < len(blocks) - 1:
            put_bn(f"transition{bi + 1}.norm",
                   vm[f"transition{bi}_norm"]["scale"])
            put_conv(f"transition{bi + 1}.conv.weight",
                     vm[f"transition{bi}_conv"]["kernel"])
    put_bn("norm5", vm["norm_final"]["scale"])

    sd["enc.visual_projection.weight"] = np.zeros(
        p["enc"]["visual_projection"]["kernel"].shape[::-1], np.float32)
    sd["enc.visual_projection.bias"] = np.zeros(
        p["enc"]["visual_projection"]["bias"].shape, np.float32)
    return sd


def test_reference_rrg_conversion_tree():
    variables = _flax_rrg_shapes()
    sd = _reference_style_state_dict(variables)
    converted = convert_reference_rrg(sd, num_layers=LAYERS, backbone="densenet121")

    def shapes(tree):
        return jax.tree.map(lambda x: tuple(x.shape), tree)

    assert shapes(converted["params"]) == shapes(variables["params"])
    assert shapes(converted["batch_stats"]) == shapes(variables["batch_stats"])
