"""VisionLanguage (prefix-conditioned causal LM): train + prefill/decode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vilmedic_tpu.config import Config
from vilmedic_tpu.executors import Trainor, Validator
from vilmedic_tpu.utils import set_logger

TINY_DECODER = {
    "proto": None,
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "intermediate_size": 64,
    "max_position_embeddings": 64,
    "hidden_dropout_prob": 0.0,
}
TINY_VISION = {
    "backbone": "vit",
    "permute": "no_permute",
    "hidden_size": 32,
    "num_hidden_layers": 1,
    "num_attention_heads": 4,
    "intermediate_size": 64,
    "patch_size": 16,
    "image_size": 32,
    "freeze": True,
}


def test_prefill_decode_matches_full_forward():
    """Incremental decode with prefilled image prefix must reproduce the
    teacher-forced logits."""
    from vilmedic_tpu.blocks.transformer import TransformerConfig
    from vilmedic_tpu.blocks.vision.visual_encoder import build_visual_encoder
    from vilmedic_tpu.models.vision_language import VisionLanguageModule

    cfg = TransformerConfig(
        vocab_size=40, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
    )
    module = VisionLanguageModule(
        cfg=cfg, vision=build_visual_encoder(dict(TINY_VISION)), num_image_tokens=6
    )
    b, t = 2, 6
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(b, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 40, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    variables = module.init(jax.random.key(0), images, ids, mask)

    full = module.apply(variables, images, ids, mask)["logits"]

    cache, prefix_kv, prefix_len = module.apply(
        variables, images, t, method=VisionLanguageModule.prefill
    )
    step_logits = []
    for i in range(t):
        logits, cache = module.apply(
            variables, ids[:, i: i + 1], cache, prefix_kv, jnp.asarray(i),
            prefix_len, method=VisionLanguageModule.decode_step,
        )
        step_logits.append(logits[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(step_logits), rtol=2e-3, atol=1e-3
    )


def test_vl_blocked_head_beam_parity():
    """Large-vocab VL beam decode through the blocked LM head (the
    vl_evaluation default at vocab >= 4096) must emit the same sequences as
    the plain flat-logits head."""
    from vilmedic_tpu.blocks.transformer import (
        TransformerConfig,
        make_blocked_head_weights,
    )
    from vilmedic_tpu.blocks.vision.visual_encoder import build_visual_encoder
    from vilmedic_tpu.decoding import beam_search, tile_for_beams
    from vilmedic_tpu.models.vision_language import VisionLanguageModule

    vocab = 4500
    cfg = TransformerConfig(
        vocab_size=vocab, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
    )
    module = VisionLanguageModule(
        cfg=cfg, vision=build_visual_encoder(dict(TINY_VISION)), num_image_tokens=6
    )
    b, t, k = 2, 8, 3
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.normal(size=(b, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, vocab, (b, 4)), jnp.int32)
    variables = module.init(jax.random.key(0), images, ids, jnp.ones_like(ids))

    cache0, prefix_kv, p = module.apply(
        variables, images, t, method=VisionLanguageModule.prefill
    )

    def run(blocked):
        cache = tile_for_beams(cache0, k)

        def step_fn(tokens, cache, index):
            logits, new_cache = module.apply(
                variables, tokens, cache, prefix_kv, index, p,
                blocked_head=blocked, method=VisionLanguageModule.decode_step,
            )
            if blocked is not None:
                return logits, new_cache
            return logits[:, -1].astype(jnp.float32), new_cache

        return np.asarray(beam_search(
            step_fn, cache, b, k, t, bos_id=0, eos_id=2, pad_id=1,
            length_penalty=1.0,
            blocked_vocab=vocab if blocked is not None else None,
        ).sequences)

    plain = run(None)
    blocked = run(make_blocked_head_weights(variables["params"], cfg.dtype))
    np.testing.assert_array_equal(plain, blocked)


def test_vl_kernel_cache_beam_parity():
    """The fused reorder-free kernel route for the generated segment
    (k_tnf cache + ancestry + prefix merge) must emit the same beam
    sequences as the plain gather/permute route."""
    from vilmedic_tpu.blocks.transformer import TransformerConfig, to_kernel_cache
    from vilmedic_tpu.blocks.vision.visual_encoder import build_visual_encoder
    from vilmedic_tpu.decoding import beam_search, tile_for_beams
    from vilmedic_tpu.models.vision_language import VisionLanguageModule

    vocab, k = 60, 4
    cfg = TransformerConfig(
        vocab_size=vocab, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2,  # head_dim 64: kernel-capable
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0,
    )
    module = VisionLanguageModule(
        cfg=cfg, vision=build_visual_encoder(dict(
            TINY_VISION, hidden_size=128, num_attention_heads=2
        )), num_image_tokens=6,
    )
    b, t = 2, 8
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.normal(size=(b, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, vocab, (b, 4)), jnp.int32)
    variables = module.init(jax.random.key(0), images, ids, jnp.ones_like(ids))

    def run(kernel, quantize=False, fused_prefix=False):
        cache0, prefix_kv, p = module.apply(
            variables, images, t, quantize_prefix=quantize,
            method=VisionLanguageModule.prefill,
        )
        cache = tile_for_beams(cache0, k)
        if kernel:
            cache = to_kernel_cache(cache)
        if fused_prefix:
            from vilmedic_tpu.ops.beam_cache_attention import (
                KernelPrefix, pack_kernel_prefix,
            )

            assert kernel and not quantize
            prefix_kv = tuple(
                KernelPrefix(*pack_kernel_prefix(pk, pv, 2), beams=k)
                for pk, pv in prefix_kv
            )

        def step_fn(tokens, cache, index, anc=None):
            logits, new_cache = module.apply(
                variables, tokens, cache, prefix_kv, index, p,
                ancestry=anc, method=VisionLanguageModule.decode_step,
            )
            return logits[:, -1].astype(jnp.float32), new_cache

        return np.asarray(beam_search(
            step_fn, cache, b, k, t, bos_id=0, eos_id=2, pad_id=1,
            length_penalty=1.0, ancestry=kernel,
            ancestry_group_items=2 if kernel else None,
        ).sequences)

    np.testing.assert_array_equal(run(False), run(True))
    # fused-prefix route (KernelPrefix streamed inside the kernel's own
    # online softmax — no XLA einsum, no merge) must emit the same beams
    np.testing.assert_array_equal(run(False), run(True, fused_prefix=True))

    # the env-gated helper: default OFF (measured -27% at the 518px target,
    # experiments/ab_fused_prefix.py), opt-in packs KernelPrefix bundles,
    # int8 4-tuples always keep the einsum+merge path
    from vilmedic_tpu.models.vision_language import maybe_fuse_prefix
    from vilmedic_tpu.ops.beam_cache_attention import KernelPrefix

    _, bf16_kv, p = module.apply(
        variables, images, t, method=VisionLanguageModule.prefill,
    )
    _, int8_kv, _ = module.apply(
        variables, images, t, quantize_prefix=True,
        method=VisionLanguageModule.prefill,
    )
    import os
    os.environ.pop("VILMEDIC_FUSED_PREFIX", None)
    assert maybe_fuse_prefix(bf16_kv, 2, k, p) is bf16_kv
    os.environ["VILMEDIC_FUSED_PREFIX"] = "1"
    try:
        fused = maybe_fuse_prefix(bf16_kv, 2, k, p)
        assert all(isinstance(f, KernelPrefix) for f in fused)
        assert maybe_fuse_prefix(int8_kv, 2, k, p) is int8_kv
    finally:
        os.environ.pop("VILMEDIC_FUSED_PREFIX", None)
    # int8 prefix: kernel and permute routes consume the SAME quantized
    # operands, so their sequences must still match each other exactly
    np.testing.assert_array_equal(run(False, quantize=True), run(True, quantize=True))


@pytest.mark.parametrize("dims", ["tiny", "kernel"])
def test_vision_language_end_to_end(tmp_path, dims):
    """dims='kernel' uses a 128-hidden/64-head-dim decoder so the default
    eval path exercises the fused reorder-free kernel route (incl. the
    check_vma-scoped shard_map on the 8-device CPU mesh)."""
    decoder = dict(TINY_DECODER)
    vision = dict(TINY_VISION)
    if dims == "kernel":
        decoder.update(hidden_size=128, num_attention_heads=2)
        vision.update(hidden_size=128, num_attention_heads=2)
    root = tmp_path / "data"
    root.mkdir()
    reports = ["no acute disease .", "lungs are clear .", "heart size normal .",
               "small effusion ."]
    rng = np.random.default_rng(0)
    paths = []
    for i in range(len(reports)):
        arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        p = root / f"im{i}.jpg"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    for split in ("train", "validate"):
        (root / f"{split}.report.tok").write_text("\n".join(reports))
        (root / f"{split}.image.tok").write_text("\n".join(paths))

    config = Config(
        {
            "ckpt_dir": str(tmp_path),
            "dataset": {
                "proto": "ImSeq",
                "image": {"root": str(root), "file": "image.tok", "resize": 36,
                          "crop": 32, "ext": ".jpg"},
                "seq": {"root": str(root), "file": "report.tok", "source": "tgt",
                        "tokenizer_max_len": 10},
                "num_workers": 0,
            },
            "model": {
                "proto": "VisionLanguage",
                "decoder": decoder,
                "vision": vision,
            },
            "batch_size": 4,
            "optimizer": "AdamW",
            "optim_params": {"lr": 1e-3},
            "epochs": 0,
            "early_stop": 3,
            "eval_start": 0,
            "early_stop_metric": "BLEU",
            "metrics": ["BLEU"],
            "beam_width": 2,
            "splits": ["validate"],
        }
    )
    seed = 616161
    set_logger(str(tmp_path), seed)
    trainor = Trainor(config=config, seed=seed)
    evaluator = Validator(config=config, models=[trainor.model],
                          train_dl=trainor.dl, seed=seed, from_training=True)
    trainor.evaluator = evaluator
    before_patch = np.asarray(
        trainor.model.variables["params"]["vision"]["model"]["patch_embed"]["kernel"]
    ).copy()
    # frozen_prefixes -> no adam moment slots for the tower at all
    import jax.tree_util as jtu

    opt_paths = [jtu.keystr(p) for p, _ in
                 jtu.tree_flatten_with_path(trainor.state.opt_state)[0]]
    assert not any("vision" in p for p in opt_paths), opt_paths[:5]
    trainor.start()
    assert "BLEU" in evaluator.scores[0]
    # frozen backbone: vision params BIT-identical after training (the
    # stop_gradient + masked-optimizer pair; reference requires_grad=False)
    after_patch = np.asarray(
        trainor.model.variables["params"]["vision"]["model"]["patch_embed"]["kernel"]
    )
    np.testing.assert_array_equal(before_patch, after_patch)
    assert np.isfinite(after_patch).all()

    # sharded (default on the 8-device CPU mesh) == unsharded generation
    from vilmedic_tpu.models.vision_language import vl_evaluation

    if len(jax.local_devices()) > 1:
        dl = evaluator.splits[0][1]
        sharded = vl_evaluation([trainor.model], config, dl)
        unsharded = vl_evaluation(
            [trainor.model], Config({**config.to_dict(), "shard_eval": False}),
            dl,
        )
        assert sharded["hyps"] == unsharded["hyps"]
        assert sharded["refs"] == unsharded["refs"]


def test_vl_flagship_config_constructs():
    """config/VL/vl-dinov2-modernbert.yml parses through the config system and
    its model block constructs via registry proto dispatch (tiny offline
    override: scratch ViT tower instead of the pretrained DINOv2, shrunk dims
    — the pretrained-tower wiring itself is covered by test_dinov2.py)."""
    import os

    from vilmedic_tpu import registry
    from vilmedic_tpu.config.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config, _ = load_config(os.path.join(repo, "config/VL/vl-dinov2-modernbert.yml"))
    model_cfg = config["model"].to_dict()
    assert model_cfg["proto"] == "VisionLanguage"
    assert model_cfg["vision"]["vision_model_name"] == "IAMJB/maira-2-dinov2"
    assert config["validator"].beam_width == 2
    # warmup lives under lr_decay_params — the scheduler only reads it there
    # (scheduler.py:62-67); verify it is actually CONSUMED, not just parsed
    from vilmedic_tpu.executors.scheduler import TrainingScheduler

    sched = TrainingScheduler(
        lr_decay_func="cosine",
        base_lr=float(config["trainor"].optim_params.lr),
        early_stop_metric="ROUGEL",
        early_stop_limit=5,
        lr_decay_params=config["trainor"].lr_decay_params.to_dict(),
        total_steps=1000,
    )
    assert sched.use_warmup and sched.warmup_steps == 100

    # offline-safe tiny construction through the same proto path
    model_cfg["vision"] = {
        "backbone": "vit", "hidden_size": 32, "num_hidden_layers": 1,
        "num_attention_heads": 4, "intermediate_size": 64,
        "patch_size": 16, "image_size": 32, "freeze": True, "pre_ln": True,
    }
    model_cfg["decoder"].update(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, vocab_size=97,
    )
    model_cfg["dtype"] = "float32"

    class DL:
        class dataset:
            class tokenizer:
                vocab_size = 97
                cls_token_id = 0
                sep_token_id = 2
                pad_token_id = 1

            tokenizer_max_len = 8

    m = registry.build("model", model_cfg, dl=DL())
    batch = {
        "images": jnp.zeros((2, 32, 32, 3), jnp.float32),
        "input_ids": jnp.ones((2, 8), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    variables = m.init_variables(jax.random.key(0), batch)
    out, _ = m.apply_train(variables, batch, rng=None, train=False)
    assert np.isfinite(float(out["loss"]))


def test_int8_prefix_kv_decode_close_to_exact():
    """prefill(quantize_prefix=True): per-(token, head) int8 prefix K/V —
    decode logits stay within quantization tolerance of the exact path, and
    the quantizer's reconstruction obeys its <= scale/2 per-element bound."""
    from vilmedic_tpu.blocks.transformer import (
        TransformerConfig,
        quantize_kv,
    )
    from vilmedic_tpu.blocks.vision.visual_encoder import build_visual_encoder
    from vilmedic_tpu.models.vision_language import VisionLanguageModule

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 7, 3, 8)) * 3.0, jnp.float32)
    q, scale = quantize_kv(x)
    assert q.dtype == jnp.int8 and scale.shape == (2, 7, 3)
    recon = np.asarray(q, np.float32) * np.asarray(scale)[..., None]
    assert np.max(np.abs(recon - np.asarray(x))) <= np.max(np.asarray(scale)) / 2 + 1e-6

    cfg = TransformerConfig(
        vocab_size=40, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
    )
    module = VisionLanguageModule(
        cfg=cfg, vision=build_visual_encoder(dict(TINY_VISION)), num_image_tokens=6
    )
    b, t = 2, 6
    images = jnp.asarray(rng.normal(size=(b, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 40, (b, t)), jnp.int32)
    variables = module.init(jax.random.key(0), images, ids, jnp.ones_like(ids))

    def roll(quantize):
        cache, prefix_kv, p = module.apply(
            variables, images, t, quantize_prefix=quantize,
            method=VisionLanguageModule.prefill,
        )
        if quantize:
            assert len(prefix_kv[0]) == 4 and prefix_kv[0][0].dtype == jnp.int8
        outs = []
        for i in range(t):
            logits, cache = module.apply(
                variables, ids[:, i: i + 1], cache, prefix_kv, jnp.asarray(i),
                p, method=VisionLanguageModule.decode_step,
            )
            outs.append(logits[:, 0])
        return np.asarray(jnp.stack(outs, 1))

    exact = roll(False)
    quant = roll(True)
    # int8 prefix rounding perturbs logits slightly, never wildly
    assert np.max(np.abs(exact - quant)) < 0.15, np.max(np.abs(exact - quant))
    assert np.mean(np.abs(exact - quant)) < 0.02


def test_gradient_checkpointing_vl_forward():
    """cfg.gradient_checkpointing remats the teacher-forced layer stack
    (train-path only): loss/gradients match the un-remat'd forward closely
    and stay finite; decode paths are unaffected (un-wrapped)."""
    from vilmedic_tpu.blocks.transformer import TransformerConfig
    from vilmedic_tpu.blocks.vision.visual_encoder import build_visual_encoder
    from vilmedic_tpu.models.vision_language import VisionLanguageModule

    rng = np.random.default_rng(7)
    b, t = 2, 6
    images = jnp.asarray(rng.normal(size=(b, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 40, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)

    losses, grads = [], []
    for gc in (False, True, "dots"):
        cfg = TransformerConfig(
            vocab_size=40, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, hidden_dropout_prob=0.0,
            gradient_checkpointing=gc,
        )
        module = VisionLanguageModule(
            cfg=cfg, vision=build_visual_encoder(dict(TINY_VISION)),
            num_image_tokens=6,
        )
        variables = module.init(jax.random.key(0), images, ids, mask)

        def loss_fn(p):
            return module.apply({"params": p}, images, ids, mask)["loss"]

        l, g = jax.value_and_grad(loss_fn)(variables["params"])
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
        losses.append(float(l))
        grads.append(g)

    for alt in (1, 2):
        np.testing.assert_allclose(losses[0], losses[alt], rtol=1e-5)
        for a, b_ in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[alt])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5
            )


def test_int8_gen_cache_beam_decode_close_to_exact():
    """gen_kv_dtype int8 plumbing (derive_gen_kv_scales + to_kernel_cache
    scales + the fused kernel's quantized write/read): the int8-generated
    beam decode must track the exact kernel route closely — the kernel-level
    numerics are oracle-locked in test_fused_beam_kernel; this locks the
    wiring (scale derivation from both prefill formats, cache dtype, scale
    leaf carried through the decode loop)."""
    from vilmedic_tpu.blocks.transformer import TransformerConfig, to_kernel_cache
    from vilmedic_tpu.blocks.vision.visual_encoder import build_visual_encoder
    from vilmedic_tpu.decoding import beam_search, tile_for_beams
    from vilmedic_tpu.models.vision_language import (
        VisionLanguageModule,
        derive_gen_kv_scales,
    )

    vocab, k = 60, 4
    cfg = TransformerConfig(
        vocab_size=vocab, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2,  # head_dim 64: kernel-capable
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0,
    )
    module = VisionLanguageModule(
        cfg=cfg, vision=build_visual_encoder(dict(
            TINY_VISION, hidden_size=128, num_attention_heads=2
        )), num_image_tokens=6,
    )
    b, t = 2, 8
    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.normal(size=(b, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, vocab, (b, 4)), jnp.int32)
    variables = module.init(jax.random.key(0), images, ids, jnp.ones_like(ids))

    # scale derivation accepts both prefill formats and (near-)agrees:
    # the int8 prefix's own quantization perturbs the maxima by <= 1 step
    _, bf16_kv, _ = module.apply(
        variables, images, t, method=VisionLanguageModule.prefill)
    _, int8_kv, _ = module.apply(
        variables, images, t, quantize_prefix=True,
        method=VisionLanguageModule.prefill)
    sc_a = derive_gen_kv_scales(bf16_kv)
    sc_b = derive_gen_kv_scales(int8_kv)
    for a, bb in zip(sc_a, sc_b):
        assert a.shape == (2, 128) and bb.shape == (2, 128)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=0.02, atol=1e-6)

    def run(quantize_gen):
        cache, prefix_kv, p = module.apply(
            variables, images, t, method=VisionLanguageModule.prefill,
        )
        scales = derive_gen_kv_scales(prefix_kv) if quantize_gen else None
        cache = tile_for_beams(cache, k)
        cache = to_kernel_cache(cache, scales=scales)
        if quantize_gen:
            assert cache[0]["self_k_tnf"].dtype == jnp.int8
            assert cache[0]["self_kv_sc"].shape == (2, 128)

        def step_fn(tokens, cache, index, anc=None):
            logits, new_cache = module.apply(
                variables, tokens, cache, prefix_kv, index, p,
                ancestry=anc, method=VisionLanguageModule.decode_step,
            )
            return logits[:, -1].astype(jnp.float32), new_cache

        res = beam_search(
            step_fn, cache, b, k, t, bos_id=0, eos_id=2, pad_id=1,
            length_penalty=1.0, ancestry=True, ancestry_group_items=2,
        )
        return np.asarray(res.sequences), np.asarray(res.scores)

    seq_exact, score_exact = run(False)
    seq_q, score_q = run(True)
    # int8 cache rounding perturbs scores slightly, never wildly; beams of a
    # tiny random model may legitimately flip on near-ties, so assert
    # closeness, not equality
    assert np.max(np.abs(score_exact - score_q)) < 0.05, (
        score_exact, score_q)
    agree = float(np.mean(seq_exact == seq_q))
    assert agree >= 0.8, (agree, seq_exact, seq_q)
