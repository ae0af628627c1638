"""End-to-end slice: tiny RRG trains, evaluates with beam search, checkpoints.

Exercises config -> data -> model -> jitted train step -> beam decode -> metrics,
the reference's core pipeline (SURVEY.md §7 step 4), on an 8-device CPU mesh.
"""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from vilmedic_tpu.config import Config
from vilmedic_tpu.executors import Trainor, Validator
from vilmedic_tpu.utils import set_logger

REPORTS = [
    "no acute disease .",
    "heart size is normal .",
    "small pleural effusion .",
    "no evidence of pneumonia .",
    "lungs are clear .",
    "mild cardiomegaly .",
    "no acute disease .",
    "lungs are clear .",
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("rrg_e2e")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(len(REPORTS)):
        arr = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        p = root / f"im{i}.jpg"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    for split in ("train", "validate"):
        (root / f"{split}.report.tok").write_text("\n".join(REPORTS))
        (root / f"{split}.image.tok").write_text("\n".join(paths))
    return root


def _config(root, ckpt_dir):
    return Config(
        {
            "ckpt_dir": str(ckpt_dir),
            "dataset": {
                "proto": "ImSeq",
                "image": {
                    "root": str(root),
                    "file": "image.tok",
                    "resize": 40,
                    "crop": 32,
                    "ext": ".jpg",
                },
                "seq": {
                    "root": str(root),
                    "file": "report.tok",
                    "source": "tgt",
                    "tokenizer_max_len": 12,
                    "processing": "r2gen_clean_report",
                },
                "num_workers": 0,
            },
            "model": {
                "proto": "RRG",
                "decoder": {
                    "proto": None,
                    "hidden_size": 32,
                    "num_hidden_layers": 1,
                    "num_attention_heads": 4,
                    "intermediate_size": 64,
                    "hidden_dropout_prob": 0.1,
                    "max_position_embeddings": 64,
                },
                "cnn": {
                    "proto": "VisualEncoder",
                    "backbone": "vit",
                    "permute": "no_permute",
                    "hidden_size": 32,
                    "num_hidden_layers": 1,
                    "num_attention_heads": 4,
                    "intermediate_size": 64,
                    "patch_size": 16,
                },
            },
            "batch_size": 4,
            "optimizer": "Adam",
            "optim_params": {"lr": 1e-3},
            "lr_decay": "ReduceLROnPlateau",
            "lr_decay_params": {"factor": 0.5, "patience": 1},
            "epochs": 1,
            "early_stop": 5,
            "eval_start": 0,
            "early_stop_metric": "BLEU",
            "beam_width": 2,
            "metrics": ["BLEU", "ROUGEL"],
            "splits": ["validate"],
        }
    )


def test_rrg_end_to_end(workdir, tmp_path):
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    config = _config(workdir, ckpt_dir)
    seed = 424242
    set_logger(str(ckpt_dir), seed)

    trainor = Trainor(config=config, seed=seed)
    evaluator = Validator(
        config=config, models=[trainor.model], train_dl=trainor.dl,
        seed=seed, from_training=True,
    )
    trainor.evaluator = evaluator
    trainor.start()

    # one epoch trained, evaluated, scored, checkpointed
    assert len(evaluator.scores) == 1
    scores = evaluator.scores[0]
    assert "BLEU" in scores and "ROUGEL" in scores
    assert 0.0 <= scores["BLEU"] <= 1.0
    ckpts = glob.glob(str(ckpt_dir / "*.ckpt"))
    assert len(ckpts) == 1, ckpts  # best-only: previous best deleted
    # epochs=1 runs epochs {0, 1} (reference trainor.py:86 range semantics)
    assert f"_{seed}" in ckpts[0] and "_2_" in ckpts[0]
    assert trainor.training_scheduler.iteration_count == 4  # 2 epochs x 2 steps


@pytest.fixture(scope="module")
def trained_ckpt_dir(workdir, tmp_path_factory):
    ckpt_dir = tmp_path_factory.mktemp("ckpt2")
    config = _config(workdir, ckpt_dir)
    config["epochs"] = 1
    seed = 424243
    set_logger(str(ckpt_dir), seed)
    trainor = Trainor(config=config, seed=seed)
    evaluator = Validator(
        config=config, models=[trainor.model], train_dl=trainor.dl,
        seed=seed, from_training=True,
    )
    trainor.evaluator = evaluator
    trainor.start()
    return ckpt_dir, trainor


def test_checkpoint_roundtrip(trained_ckpt_dir):
    from vilmedic_tpu.executors.checkpoint import load_checkpoint, restore_into

    ckpt_dir, trainor = trained_ckpt_dir
    ckpt = glob.glob(str(ckpt_dir / "*.ckpt"))[0]
    state = load_checkpoint(ckpt)
    assert state["config"]["model"]["proto"] == "RRG"
    restored = restore_into(trainor.model.variables, state["model"])
    leaf = next(iter(restored["params"].values()))
    assert leaf is not None


def test_zoo_from_pretrained(trained_ckpt_dir, workdir):
    """AutoModel rebuilds dataset+model from a checkpoint dir and generates
    from raw user input (reference zoo/modeling_auto.py:55-117, ImSeq.py:39-50)."""
    from vilmedic_tpu.models.evaluation_nlg import make_generate_fn
    from vilmedic_tpu.zoo import AutoModel

    ckpt_dir, _ = trained_ckpt_dir
    model, dataset = AutoModel.from_pretrained(str(ckpt_dir))
    assert hasattr(dataset, "inference")

    batch = dataset.inference(
        seq=["no acute disease ."], image=[str(workdir / "im0.jpg")]
    )
    assert batch["images"].shape[1:] == (32, 32, 3)

    generate = make_generate_fn(
        [model], beam_width=2, max_len=12,
        bos_id=model.dec_config.bos_token_id or dataset.tokenizer.cls_token_id,
        eos_id=model.dec_config.eos_token_id or dataset.tokenizer.sep_token_id,
        pad_id=dataset.tokenizer.pad_token_id,
        length_penalty=1.0,
    )
    seqs = generate([model.variables], model.encoder_inputs(batch))
    hyp = dataset.tokenizer.decode(
        list(seqs[0]), skip_special_tokens=True, clean_up_tokenization_spaces=False
    )
    assert isinstance(hyp, str)


def test_indivisible_batch_hard_errors(tmp_path):
    """batch_size not divisible across devices must raise (not silently halve
    throughput) unless allow_device_subset is set (VERDICT r1 weak #4)."""
    import jax
    import pytest as _pytest

    from vilmedic_tpu.config import Config
    from vilmedic_tpu.executors import Trainor
    from vilmedic_tpu.utils import set_logger

    n = len(jax.devices())
    assert n == 8
    root = tmp_path
    for split in ("train", "validate"):
        (root / f"{split}.findings.tok").write_text("\n".join(["a b c ."] * 12))
        (root / f"{split}.impression.tok").write_text("\n".join(["a ."] * 12))
    base = {
        "ckpt_dir": str(tmp_path), "dataset": {"proto": "Seq2Seq",
            "src": {"root": str(root), "file": "findings.tok", "tokenizer_max_len": 8},
            "tgt": {"root": str(root), "file": "impression.tok", "tokenizer_max_len": 8},
            "num_workers": 0},
        "model": {"proto": "RRS",
            "encoder": {"proto": None, "hidden_size": 32, "num_hidden_layers": 1,
                        "num_attention_heads": 4, "intermediate_size": 64,
                        "max_position_embeddings": 32},
            "decoder": {"proto": None, "hidden_size": 32, "num_hidden_layers": 1,
                        "num_attention_heads": 4, "intermediate_size": 64,
                        "max_position_embeddings": 32}},
        "batch_size": 12, "optimizer": "Adam", "optim_params": {"lr": 1e-3},
        "epochs": 0, "early_stop": 1, "eval_start": 0,
        "early_stop_metric": "ROUGEL", "metrics": [], "splits": ["validate"],
    }
    seed = 909090
    set_logger(str(tmp_path), seed)
    with _pytest.raises(ValueError, match="batch_size 12 is not divisible"):
        Trainor(config=Config(base), seed=seed)
    # explicit opt-in restores the subset behavior
    Trainor(config=Config({**base, "allow_device_subset": True}), seed=seed)


def test_nan_loss_skipped_on_device(workdir, tmp_path):
    """A non-finite loss must leave params AND optimizer state untouched
    (reference trainor.py:109-112 checks BEFORE optimizer.step) — enforced
    inside the jitted step, not by a too-late host check; grad accumulation
    resets on a NaN microbatch (reference zero_grad semantics)."""
    import jax
    import jax.numpy as jnp

    ckpt_dir = tmp_path / "ckpt_nan"
    ckpt_dir.mkdir()
    config = _config(workdir, ckpt_dir)
    # white-box: this test re-reads and re-feeds OLD states after a step —
    # that's exactly what donation forbids, so opt out of it here
    config["donate_state"] = False
    set_logger(str(ckpt_dir), 3)
    trainor = Trainor(config=config, seed=3)
    batch = trainor._model_batch(next(iter(trainor.dl)))
    bad = dict(batch)
    bad["images"] = np.full_like(np.asarray(batch["images"]), np.nan)

    lr = jnp.asarray(1e-3, jnp.float32)
    state0 = trainor.state
    new_state, loss = trainor._train_step(state0, bad, lr, trainor.rng)
    assert not np.isfinite(float(loss))
    for a, b in zip(jax.tree.leaves(state0.params), jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # finite step moves params
    new_state2, loss2 = trainor._train_step(new_state, batch, lr, trainor.rng)
    assert np.isfinite(float(loss2))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(new_state.params),
                        jax.tree.leaves(new_state2.params))
    )
    assert moved

    # accumulation path: a NaN microbatch wipes the accumulated grads
    grad_acc = trainor._zero_grads()
    st, l1, grad_acc = trainor._grad_step(state0, batch, trainor.rng, grad_acc)
    assert np.isfinite(float(l1))
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in jax.tree.leaves(grad_acc))
    st, l2, grad_acc = trainor._grad_step(st, bad, trainor.rng, grad_acc)
    assert not np.isfinite(float(l2))
    for g in jax.tree.leaves(grad_acc):
        assert np.abs(np.asarray(g)).sum() == 0

    # NaN on the accumulation BOUNDARY: apply_step gates on that loss — adamw
    # must not move params via decayed momentum/weight decay on zeroed grads
    applied = trainor._apply_step(state0, grad_acc, lr, l2)
    for a, b in zip(jax.tree.leaves(state0.params), jax.tree.leaves(applied.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))



def test_background_checkpoint_error_surfaces(tmp_path):
    """A failed background checkpoint write must raise at the next wait()
    (silently losing the only checkpoint is the worst failure mode of an
    async saver)."""
    import logging

    from vilmedic_tpu.executors.checkpoint import CheckpointSaver

    saver = CheckpointSaver(
        ckpt_dir=str(tmp_path / "missing" / "nested"),  # parent doesn't exist
        logger=logging.getLogger("t"), seed=1,
    )
    saver.save({"model": {"w": np.zeros(2)}}, tag=0.5, current_epoch=1)
    with pytest.raises(RuntimeError, match="background checkpoint write failed"):
        saver.wait()

    # a successful save still round-trips
    ok = CheckpointSaver(ckpt_dir=str(tmp_path), logger=logging.getLogger("t"), seed=1)
    path = ok.save({"model": {"w": np.ones(2)}}, tag=0.5, current_epoch=1)
    ok.wait()
    from vilmedic_tpu.executors.checkpoint import load_checkpoint

    assert np.allclose(load_checkpoint(path)["model"]["w"], 1.0)


def test_single_batch_epoch_logs_finite_loss(tmp_path, workdir):
    """The delayed loss drain syncs at log points: a 1-iteration epoch must
    log the real loss (this regressed to 'Loss nan' when the drain only
    happened after the loop)."""
    import logging

    ckpt_dir = tmp_path / "ckpt_1b"
    ckpt_dir.mkdir()
    config = _config(workdir, ckpt_dir)
    config["batch_size"] = 8  # 8 samples -> exactly 1 iteration per epoch
    config["epochs"] = 1
    config["eval_start"] = 99  # no validator attached
    set_logger(str(ckpt_dir), 11)
    trainor = Trainor(config=config, seed=11)
    # per-seed loggers don't propagate (file+console handlers only) — attach
    # a capturing handler directly
    records = []

    class _Cap(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logging.getLogger("11").addHandler(_Cap())
    trainor.start()
    logs = " ".join(records)
    assert "Loss nan" not in logs
    assert "Loss " in logs


def test_rng_impl_rbg_trains(tmp_path, workdir):
    """rng_impl: rbg swaps the dropout-mask PRNG to the TPU-native RBG
    generator (docs/performance.md): the train loop must run and log a
    finite loss with typed rbg keys threaded through fold_in/dropout."""
    import jax

    ckpt_dir = tmp_path / "ckpt_rbg"
    ckpt_dir.mkdir()
    config = _config(workdir, ckpt_dir)
    config["rng_impl"] = "rbg"
    config["epochs"] = 1
    config["eval_start"] = 99
    set_logger(str(ckpt_dir), 12)
    trainor = Trainor(config=config, seed=12)
    assert "rbg" in str(jax.random.key_impl(trainor.rng))
    trainor.start()
    assert trainor.epoch_losses and np.isfinite(trainor.epoch_losses).all()


def test_frozen_prefixes_optimizer_masking():
    """TaskModel.frozen_prefixes -> optax.multi_transform: frozen subtrees get
    exactly-zero updates AND no adam m/v slots (torch only steps requires_grad
    params; a frozen DINOv2 tower's moments would be ~690 MB). The path-prefix
    semantics keep siblings (visual_projection) trainable, and gated_update /
    set_learning_rate still work through the masked state."""
    import jax
    import jax.numpy as jnp

    from vilmedic_tpu.executors.train_state import (
        create_optimizer, gated_update,
    )

    params = {
        "enc": {"model": {"w": jnp.ones((4,))},
                "visual_projection": {"k": jnp.ones((3,))}},
        "dec": {"w": jnp.ones((2,))},
    }
    tx = create_optimizer("AdamW", {"lr": 1e-2}, None,
                          frozen_prefixes=("enc/model",))
    st = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(grads, st, params)
    assert np.all(np.asarray(upd["enc"]["model"]["w"]) == 0)
    assert np.any(np.asarray(upd["enc"]["visual_projection"]["k"]) != 0)
    assert np.any(np.asarray(upd["dec"]["w"]) != 0)
    # no moment buffers allocated for the frozen (4,) leaf
    assert not any(
        getattr(x, "shape", None) == (4,) for x in jax.tree.leaves(st)
    )

    # finite gate: frozen stays put, trainable moves
    p2, _ = gated_update(tx, params, st, grads, 1e-2, jnp.float32(1.0))
    assert np.all(np.asarray(p2["enc"]["model"]["w"]) == 1.0)
    assert np.any(np.asarray(p2["dec"]["w"]) != 1.0)
    # non-finite gate: nothing moves
    p3, _ = gated_update(tx, params, st, grads, 1e-2, jnp.float32(np.nan))
    for a, b in zip(jax.tree.leaves(p3), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_opt_state_migrates_into_multi_transform():
    """Resume of a checkpoint saved BEFORE frozen_prefixes wrapped the
    optimizer in optax.multi_transform (ADVICE r4): the legacy opt_state
    holds the chain state directly under inner_state; restore must graft it
    into the multi_transform trainable branch (frozen leaves pruned) instead
    of raising — and carry the adam moments + counts through exactly."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from vilmedic_tpu.executors.train_state import (
        create_optimizer, gated_update, restore_opt_state,
    )

    params = {
        "vision": {"w": jnp.ones((4,))},
        "dec": {"w": jnp.full((2,), 2.0)},
    }
    # a legacy run: no freezing, a few real steps so moments are non-trivial
    tx_old = create_optimizer("AdamW", {"lr": 1e-2})
    st_old = tx_old.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    p = params
    for _ in range(3):
        p, st_old = gated_update(tx_old, p, st_old, grads, 1e-2, jnp.float32(1.0))
    legacy_sd = serialization.to_state_dict(st_old)

    # the resumed run: same model now freeze-configured
    tx_new = create_optimizer("AdamW", {"lr": 1e-2}, None,
                              frozen_prefixes=("vision",))
    fresh = tx_new.init(p)
    restored = restore_opt_state(fresh, legacy_sd)

    new_sd = serialization.to_state_dict(restored)
    chain = new_sd["inner_state"]["inner_states"]["trainable"]["inner_state"]
    legacy_chain = legacy_sd["inner_state"]
    # trainable moments + count carried through exactly
    np.testing.assert_array_equal(
        chain["0"]["0"]["mu"]["dec"]["w"], legacy_chain["0"]["0"]["mu"]["dec"]["w"]
    )
    np.testing.assert_array_equal(
        chain["0"]["0"]["nu"]["dec"]["w"], legacy_chain["0"]["0"]["nu"]["dec"]["w"]
    )
    np.testing.assert_array_equal(chain["0"]["0"]["count"], legacy_chain["0"]["0"]["count"])
    # and the restored state steps: frozen stays put, trainable moves
    p2, _ = gated_update(tx_new, p, restored, grads, 1e-2, jnp.float32(1.0))
    assert np.all(np.asarray(p2["vision"]["w"]) == np.asarray(p["vision"]["w"]))
    assert np.any(np.asarray(p2["dec"]["w"]) != np.asarray(p["dec"]["w"]))

    # new-layout checkpoints still round-trip unchanged
    rt = restore_opt_state(fresh, serialization.to_state_dict(restored))
    for a, b in zip(jax.tree.leaves(rt), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
