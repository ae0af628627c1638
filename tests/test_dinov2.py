"""DINOv2 tower: converter parity vs torch Dinov2Model/Backbone + the
pretrained VisionLanguage wiring (reference
hf_trainer/models/vision_language_modernbert/model.py:15,46 — frozen
``IAMJB/maira-2-dinov2`` backbone via AutoBackbone)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tr = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from vilmedic_tpu.blocks.vision.dinov2 import Dinov2
from vilmedic_tpu.zoo.convert_vision import (
    _cubic_weights,
    convert_hf_dinov2,
    interpolate_pos_grid,
)


def tiny_config(**kw):
    from transformers import Dinov2Config

    return Dinov2Config(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        mlp_ratio=4,
        image_size=32,
        patch_size=8,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        **kw,
    )


def randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    model.eval()
    return model


def flax_from(config, sd, image_size=None, target_tokens=None):
    m = Dinov2(
        hidden_size=config.hidden_size,
        num_hidden_layers=config.num_hidden_layers,
        num_attention_heads=config.num_attention_heads,
        mlp_ratio=config.mlp_ratio,
        patch_size=config.patch_size,
        image_size=image_size or config.image_size,
        layer_norm_eps=config.layer_norm_eps,
        use_swiglu_ffn=config.use_swiglu_ffn,
    )
    params = convert_hf_dinov2(sd, target_tokens=target_tokens)
    return m, {"params": params}


def test_cubic_weights_match_torch_bicubic():
    """One axis of torch interpolate(mode='bicubic', align_corners=False)."""
    rng = np.random.default_rng(0)
    for n_in, n_out in [(4, 7), (7, 4), (5, 5), (2, 9)]:
        x = rng.normal(size=(1, 3, n_in, n_in)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.tensor(x), size=(n_out, n_out), mode="bicubic",
            align_corners=False,
        ).numpy()
        w = _cubic_weights(n_in, n_out)
        got = np.einsum("oi,bcij->bcoj", w, x)
        got = np.einsum("oj,bcij->bcio", w, got)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_interpolate_pos_grid_matches_hf():
    """Full pos-grid path vs HF's interpolate_pos_encoding."""
    from transformers.models.dinov2.modeling_dinov2 import Dinov2Embeddings

    config = tiny_config()
    emb = Dinov2Embeddings(config)
    with torch.no_grad():
        emb.position_embeddings.normal_()
    new_grid, d = 7, config.hidden_size
    fake_tokens = torch.zeros(1, 1 + new_grid * new_grid, d)
    want = emb.interpolate_pos_encoding(
        fake_tokens, new_grid * config.patch_size, new_grid * config.patch_size
    ).detach().numpy()
    got = interpolate_pos_grid(
        emb.position_embeddings.detach().numpy(), 1 + new_grid * new_grid
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("swiglu", [False, True])
def test_dinov2_matches_torch_model(swiglu):
    from transformers import Dinov2Model

    config = tiny_config(use_swiglu_ffn=swiglu)
    model = randomize(Dinov2Model(config))
    x = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(
            pixel_values=torch.tensor(x.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    m, variables = flax_from(config, sd)
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dinov2_backbone_feature_map_is_cls_dropped_hidden():
    """Dinov2Backbone's last feature map == final-LN hidden state minus CLS —
    the exact tensor the VisionLanguage prefix consumes (reference :86-99)."""
    from transformers import Dinov2Backbone

    config = tiny_config()
    model = randomize(Dinov2Backbone(config), seed=2)
    x = np.random.default_rng(2).normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        fm = model(torch.tensor(x.transpose(0, 3, 1, 2))).feature_maps[-1]
        want = fm.flatten(2).transpose(1, 2).numpy()  # (B, S, C)

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    m, variables = flax_from(config, sd)
    got = np.asarray(m.apply(variables, jnp.asarray(x)))[:, 1:]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dinov2_other_resolution_matches_torch():
    """Loading at a different image size: our baked interpolated grid vs
    torch's per-forward interpolation."""
    from transformers import Dinov2Model

    config = tiny_config()  # trained at 32 (4x4 grid)
    model = randomize(Dinov2Model(config), seed=3)
    new_size = 56  # 7x7 grid
    x = np.random.default_rng(3).normal(size=(2, new_size, new_size, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(
            pixel_values=torch.tensor(x.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    grid = new_size // config.patch_size
    m, variables = flax_from(
        config, sd, image_size=new_size, target_tokens=1 + grid * grid
    )
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_vision_language_loads_pretrained_dinov2(monkeypatch):
    """VisionLanguage with ``vision_model_name``: config resolves, the frozen
    tower loads converted weights, the prefix drops CLS, and the tower output
    matches torch exactly."""
    from transformers import Dinov2Model

    config = tiny_config()
    model = randomize(Dinov2Model(config), seed=4)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    from vilmedic_tpu.models import base as base_mod, hf_compat
    from vilmedic_tpu.models.vision_language import VisionLanguage

    monkeypatch.setattr(
        hf_compat, "_resolve_hf_config", lambda name: config.to_dict()
    )
    monkeypatch.setattr(
        base_mod, "_hf_torch_state_dict", lambda name, causal: sd
    )

    class DL:
        class dataset:
            class tokenizer:
                vocab_size = 50
                cls_token_id = 1
                sep_token_id = 2
                pad_token_id = 0

            tokenizer_max_len = 8

    vl = VisionLanguage(
        decoder={"proto": None, "hidden_size": 32, "num_hidden_layers": 1,
                 "num_attention_heads": 4, "intermediate_size": 64,
                 "max_position_embeddings": 64, "hidden_dropout_prob": 0.0},
        vision={"vision_model_name": "fake/dinov2-tiny"},
        dl=DL(),
    )
    assert vl._pretrained_blocks == {"vision": ("fake/dinov2-tiny", "dinov2")}
    # prefix length: 4x4 patches + marker, CLS dropped
    assert vl.module.num_image_tokens == 17 and vl.module.drop_cls_token

    x = np.random.default_rng(4).normal(size=(2, 32, 32, 3)).astype(np.float32)
    batch = {
        "images": jnp.asarray(x),
        "input_ids": jnp.ones((2, 8), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    variables = vl.init_variables(jax.random.key(0), batch)
    variables = vl.load_pretrained(variables)

    tower = vl.module.apply(
        variables, batch["images"],
        method=lambda m, im: m.vision(im, train=False),
    )
    with torch.no_grad():
        want = model(
            pixel_values=torch.tensor(x.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(tower), want, rtol=1e-4, atol=1e-4)

    # the full train step runs with the loaded tower
    out, _ = vl.apply_train(variables, batch, rng=None, train=False)
    assert np.isfinite(float(out["loss"]))
