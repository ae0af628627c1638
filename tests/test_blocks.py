"""Flax block tests: decoder cache consistency, vision tower shapes, masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vilmedic_tpu.blocks.transformer import (
    TransformerConfig,
    TransformerDecoder,
    TransformerEncoder,
    causal_lm_loss,
)
from vilmedic_tpu.blocks.vision import VisualEncoder, build_visual_encoder

CFG = TransformerConfig(
    vocab_size=50,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=32,
    hidden_dropout_prob=0.0,
)


def test_decoder_train_shapes_and_loss():
    dec = TransformerDecoder(CFG)
    rng = jax.random.key(0)
    ids = jnp.array([[2, 5, 6, 7, 3, 0], [2, 9, 8, 3, 0, 0]], dtype=jnp.int32)
    mask = (ids != 0).astype(jnp.int32)
    enc = jnp.ones((2, 7, 32))
    enc_mask = jnp.ones((2, 7), dtype=jnp.int32)
    params = dec.init(rng, ids, mask, enc, enc_mask)["params"]
    logits = dec.apply({"params": params}, ids, mask, enc, enc_mask)
    assert logits.shape == (2, 6, 50)
    loss = causal_lm_loss(logits, ids, mask)
    assert loss.shape == () and float(loss) > 0


def test_incremental_decode_matches_teacher_forcing():
    """Cache-based one-token decoding must reproduce full-sequence logits."""
    dec = TransformerDecoder(CFG)
    rng = jax.random.key(1)
    b, t = 2, 5
    ids = jax.random.randint(rng, (b, t), 3, 50, dtype=jnp.int32)
    mask = jnp.ones((b, t), dtype=jnp.int32)
    enc = jax.random.normal(jax.random.key(2), (b, 7, 32))
    enc_mask = jnp.ones((b, 7), dtype=jnp.int32)
    params = dec.init(rng, ids, mask, enc, enc_mask)["params"]

    full_logits = dec.apply({"params": params}, ids, mask, enc, enc_mask)

    self_cache, cross_cache = dec.apply(
        {"params": params},
        encoder_hidden_states=enc,
        mode="init_cache",
        max_len=t,
    )
    step_logits = []
    for i in range(t):
        logits, self_cache = dec.apply(
            {"params": params},
            ids[:, i: i + 1],
            encoder_attention_mask=enc_mask,
            mode="decode",
            cache=(self_cache, cross_cache),
            decode_index=jnp.asarray(i),
        )
        step_logits.append(logits[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(step_logits), rtol=2e-3, atol=1e-3
    )


def test_cache_beam_gather():
    """Cache entries gather cleanly along the batch axis (beam reorder)."""
    dec = TransformerDecoder(CFG)
    enc = jnp.ones((4, 3, 32))
    params = dec.init(jax.random.key(0), jnp.ones((4, 2), jnp.int32), None, enc, None)["params"]
    self_cache, _cross = dec.apply(
        {"params": params}, encoder_hidden_states=enc, mode="init_cache", max_len=6
    )
    idx = jnp.array([1, 1, 0, 3])
    reordered = jax.tree.map(lambda x: x[idx], self_cache)
    assert reordered[0]["self_k"].shape == self_cache[0]["self_k"].shape


def test_encoder_shapes():
    enc = TransformerEncoder(CFG)
    ids = jnp.ones((2, 9), jnp.int32)
    mask = jnp.ones((2, 9), jnp.int32)
    params = enc.init(jax.random.key(0), ids, mask)["params"]
    out = enc.apply({"params": params}, ids, mask)
    assert out.shape == (2, 9, 32)


@pytest.mark.parametrize(
    "backbone,output_layer,expect_tokens,expect_dim",
    [
        ("resnet18", "layer4", 4, 512),  # 64/32=2 -> 2*2 tokens
        ("densenet121", "features", 4, 1024),
    ],
)
def test_visual_encoder_single_image(backbone, output_layer, expect_tokens, expect_dim):
    ve = VisualEncoder(backbone=backbone, output_layer=output_layer, permute="batch_first")
    x = jnp.ones((2, 64, 64, 3))
    variables = ve.init(jax.random.key(0), x)
    feats, mask = ve.apply(variables, x, method=VisualEncoder.encode)
    assert feats.shape == (2, expect_tokens, expect_dim)
    assert mask.shape == (2, expect_tokens)
    assert bool(mask.all())


def test_visual_encoder_avgpool_vector():
    ve = VisualEncoder(backbone="resnet18", output_layer="avgpool", permute="batch_first")
    x = jnp.ones((2, 64, 64, 3))
    variables = ve.init(jax.random.key(0), x)
    out = ve.apply(variables, x)
    assert out.shape == (2, 512)


def test_visual_encoder_multi_image_mask():
    ve = build_visual_encoder(
        dict(
            proto="VisualEncoder",
            backbone="resnet18",
            output_layer="layer4",
            permute="batch_first",
            dropout_out=0.0,
            visual_projection=dict(in_features=512, out_features=16),
        )
    )
    b, n = 2, 3
    x = np.random.default_rng(0).normal(size=(b, n, 64, 64, 3)).astype(np.float32)
    x[1, 2] = 0.0  # padded image
    images_mask = jnp.asarray([[True, True, True], [True, True, False]])
    variables = ve.init(
        jax.random.key(0), jnp.asarray(x), images_mask, method=VisualEncoder.encode
    )
    feats, mask = ve.apply(
        variables, jnp.asarray(x), images_mask, method=VisualEncoder.encode
    )
    assert feats.shape == (2, n * 4, 16)  # projected
    assert mask.shape == (2, n * 4)
    # padded image's 4 patch tokens are masked out
    assert not bool(mask[1, -4:].any())
    assert bool(mask[0].all())


def test_visual_encoder_3d_volume():
    """3-D densenet path (reference visual_encoder.py:144-158, MONAI parity):
    full-volume encoding of (B, D, H, W, C) and per-slice encoding."""
    ve = VisualEncoder(
        backbone="3d_densenet121", output_layer="avgpool", permute="batch_first"
    )
    vol = jnp.ones((2, 32, 32, 32, 1))
    variables = ve.init(jax.random.key(0), vol, method=VisualEncoder.encode)
    feats, mask = ve.apply(variables, vol, method=VisualEncoder.encode)
    assert feats.shape == (2, 1024)  # densenet121 channels, pooled over D,H,W

    ve_slice = VisualEncoder(
        backbone="densenet121", output_layer="avgpool", permute="batch_first",
        slice_encode=True, slice_dim=1,
    )
    small = jnp.ones((2, 4, 32, 32, 1))
    variables = ve_slice.init(jax.random.key(0), small, None, method=VisualEncoder.encode)
    feats, mask = ve_slice.apply(variables, small, None, method=VisualEncoder.encode)
    assert feats.shape == (2, 4, 1024)  # one vector per slice
    assert mask.shape == (2, 4)


@pytest.mark.parametrize("pre_ln", [False, True])
def test_vit_gradient_checkpointing_parity(pre_ln):
    """ViT(gradient_checkpointing=True|"dots") remats each encoder layer:
    forward and gradients match the un-remat'd tower (both LN layouts take
    distinct remat wrappers — static-arg positions differ; "dots" saves
    matmul outputs and recomputes only the elementwise chain)."""
    from vilmedic_tpu.blocks.vision.vit import ViT

    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)

    outs, grads = [], []
    for gc in (False, True, "dots"):
        vit = ViT(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                  intermediate_size=64, image_size=32, patch_size=16,
                  hidden_dropout_prob=0.0, pre_ln=pre_ln,
                  gradient_checkpointing=gc)
        variables = vit.init(jax.random.key(3), imgs)

        def loss_fn(p):
            return jnp.sum(vit.apply({"params": p}, imgs) ** 2)

        out = vit.apply(variables, imgs)
        l, g = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(l))
        outs.append(np.asarray(out))
        grads.append(g)

    for alt in (1, 2):
        np.testing.assert_allclose(outs[0], outs[alt], rtol=1e-6, atol=1e-6)
        for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[alt])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)


def test_gelu_tanh_activation_close_to_exact():
    """hidden_act="gelu_tanh" (tanh approx — the VPU-cheap variant) stays
    within 1e-3 of the exact-erf FFN output and trains (finite grads)."""
    outs = []
    for act in ("gelu", "gelu_tanh"):
        cfg = TransformerConfig(
            vocab_size=50, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=32, hidden_dropout_prob=0.0,
            hidden_act=act,
        )
        from vilmedic_tpu.blocks.transformer import FeedForward

        ffn = FeedForward(cfg)
        x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 5, 32)),
                        jnp.float32)
        variables = ffn.init(jax.random.key(0), x)
        outs.append(np.asarray(ffn.apply(variables, x)))
        g = jax.grad(lambda p: jnp.sum(ffn.apply({"params": p}, x) ** 2))(
            variables["params"]
        )
        assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))
    assert np.max(np.abs(outs[0] - outs[1])) < 1e-3
