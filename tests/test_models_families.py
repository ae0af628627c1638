"""Model-family e2e smoke tests: MVQA, ConVIRT, SCST, RRG_FORCE, multi-image."""

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
LABELS = ["normal", "normal", "effusion", "normal", "normal", "cardiomegaly",
          "normal", "normal"]
CONCEPTS = ["pleural", "heart", "effusion", "pneumonia", "lungs", "cardiomegaly",
            "disease", "clear"]

TINY_VIT = {
    "proto": "VisualEncoder",
    "backbone": "vit",
    "permute": "no_permute",
    "hidden_size": 32,
    "num_hidden_layers": 1,
    "num_attention_heads": 4,
    "intermediate_size": 64,
    "patch_size": 16,
}

TINY_TRANSFORMER = {
    "hidden_size": 32,
    "num_hidden_layers": 1,
    "num_attention_heads": 4,
    "intermediate_size": 64,
    "max_position_embeddings": 64,
    "hidden_dropout_prob": 0.0,
}


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("families")
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
        (root / f"{split}.label.tok").write_text("\n".join(LABELS))
        (root / f"{split}.concepts.tok").write_text("\n".join(CONCEPTS))
    return root


def _base_config(root, ckpt_dir, dataset, model, **extra):
    cfg = {
        "ckpt_dir": str(ckpt_dir),
        "dataset": dataset,
        "model": model,
        "batch_size": 4,
        "optimizer": "Adam",
        "optim_params": {"lr": 1e-3},
        "epochs": 0,
        "early_stop": 5,
        "eval_start": 0,
        "early_stop_metric": "validation_loss",
        "metrics": [],
        "splits": ["validate"],
    }
    cfg.update(extra)
    return Config(cfg)


def _run(config, seed):
    set_logger(config.ckpt_dir, seed)
    trainor = Trainor(config=config, seed=seed)
    evaluator = Validator(
        config=config, models=[trainor.model], train_dl=trainor.dl,
        seed=seed, from_training=True,
    )
    trainor.evaluator = evaluator
    trainor.start()
    return trainor, evaluator


def test_mvqa_end_to_end(workdir, tmp_path):
    config = _base_config(
        workdir, tmp_path,
        dataset={
            "proto": "ImLabel",
            "image": {"root": str(workdir), "file": "image.tok", "resize": 40,
                      "crop": 32, "ext": ".jpg"},
            "label": {"root": str(workdir), "file": "label.tok"},
            "num_workers": 0,
        },
        model={
            "proto": "MVQA",
            "cnn": dict(TINY_VIT),
            "adapter": {"input_size": 32, "output_size": 32},
            "transformer": dict(TINY_TRANSFORMER),
            "classifier": {"proto": "Classifier", "num_classes": 3},
            "loss": {"proto": "CrossEntropyLoss"},
        },
        metrics=["accuracy"],
        early_stop_metric="accuracy",
    )
    trainor, evaluator = _run(config, 515151)
    scores = evaluator.scores[0]
    assert "accuracy" in scores and 0 <= scores["accuracy"] <= 100
    assert np.isfinite(scores["validation_loss"])


def test_convirt_end_to_end(workdir, tmp_path):
    config = _base_config(
        workdir, tmp_path,
        dataset={
            "proto": "ImSeq",
            "image": {"root": str(workdir), "file": "image.tok", "resize": 40,
                      "crop": 32, "ext": ".jpg"},
            "seq": {"root": str(workdir), "file": "report.tok", "source": "tgt",
                    "tokenizer_max_len": 12},
            "num_workers": 0,
        },
        model={
            "proto": "ConVIRT",
            "encoder": dict(TINY_TRANSFORMER),
            "cnn": dict(TINY_VIT, permute="batch_first"),
            "projection": {"visual_embedding_dim": 32, "textual_embedding_dim": 32,
                           "projection_dim": 16},
            "loss": {"proto": "ConVIRTLoss", "tau": 0.1, "lambda_": 0.75},
        },
    )
    trainor, evaluator = _run(config, 515152)
    assert np.isfinite(evaluator.scores[0]["validation_loss"])


def test_convirt_visual_encoder_pooled():
    """ConVIRT uses the pooled (B, C) visual output path."""
    # vit backbone returns (B, S, D); ConVIRT projects whatever comes out.
    # This asserts MLPProjection handles the token output by prior mean-pool?
    # -> covered in the e2e above; here check module output shapes.
    import jax
    import jax.numpy as jnp

    from vilmedic_tpu.blocks.transformer import TransformerConfig
    from vilmedic_tpu.blocks.vision.visual_encoder import build_visual_encoder
    from vilmedic_tpu.models.selfsup import ConVIRTModule

    cfg = TransformerConfig(vocab_size=30, **TINY_TRANSFORMER)
    module = ConVIRTModule(
        enc_config=cfg,
        visual=build_visual_encoder(dict(TINY_VIT, permute="batch_first")),
        projection_dim=16,
    )
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    images = jnp.ones((2, 32, 32, 3))
    variables = module.init(jax.random.key(0), ids, mask, images)
    lin, vis = module.apply(variables, ids, mask, images)
    assert lin.shape == (2, 16)
    assert vis.shape[0] == 2 and vis.shape[-1] == 16


def test_gloria_end_to_end(workdir, tmp_path):
    config = _base_config(
        workdir, tmp_path,
        dataset={
            "proto": "ImSeq",
            "image": {"root": str(workdir), "file": "image.tok", "resize": 72,
                      "crop": 64, "ext": ".jpg"},
            "seq": {"root": str(workdir), "file": "report.tok", "source": "tgt",
                    "tokenizer_max_len": 12},
            "num_workers": 0,
        },
        model={
            "proto": "GLoRIA",
            "encoder": dict(TINY_TRANSFORMER),
            "cnn": {"backbone": "resnet18", "feature_dim": 16},
        },
        batch_size=4,
    )
    trainor, evaluator = _run(config, 515153)
    assert np.isfinite(evaluator.scores[0]["validation_loss"])


def test_rrg_scst_iteration(workdir, tmp_path):
    config = _base_config(
        workdir, tmp_path,
        dataset={
            "proto": "ImSeq",
            "image": {"root": str(workdir), "file": "image.tok", "resize": 40,
                      "crop": 32, "ext": ".jpg"},
            "seq": {"root": str(workdir), "file": "report.tok", "source": "tgt",
                    "tokenizer_max_len": 12},
            "num_workers": 0,
        },
        model={
            "proto": "RRG_SCST",
            "decoder": dict(TINY_TRANSFORMER, proto=None),
            "cnn": dict(TINY_VIT),
            "scores": "rougel",
            "top_k": 5,
        },
    )
    trainor, evaluator = _run(config, 515154)
    # SCST ran its own train_iteration path for each batch of the epoch
    assert trainor.training_scheduler.iteration_count == 2
    assert np.isfinite(evaluator.scores[0]["validation_loss"])
    # phase split recorded for observability/bench
    t = trainor.model.timing
    assert t["iters"] == 2 and t["reward_s"] > 0


def test_rrg_scst_overlapped_pipeline(workdir, tmp_path):
    """overlap_rollout: every batch still gets exactly one grad step (the
    trailing rollout flushes through finish_epoch) and losses stay finite."""
    config = _base_config(
        workdir, tmp_path,
        dataset={
            "proto": "ImSeq",
            "image": {"root": str(workdir), "file": "image.tok", "resize": 40,
                      "crop": 32, "ext": ".jpg"},
            "seq": {"root": str(workdir), "file": "report.tok", "source": "tgt",
                    "tokenizer_max_len": 12},
            "num_workers": 0,
        },
        model={
            "proto": "RRG_SCST",
            "decoder": dict(TINY_TRANSFORMER, proto=None),
            "cnn": dict(TINY_VIT),
            "scores": "rougel",
            "top_k": 5,
            "overlap_rollout": True,
        },
    )
    trainor, evaluator = _run(config, 515155)
    assert trainor.training_scheduler.iteration_count == 2
    # both batches grad-stepped: 1 in-loop (pipelined) + 1 epoch-boundary flush
    assert trainor.model.timing["iters"] == 2
    assert trainor.model._pending is None
    # warmup iteration returned no loss; the other two drained finitely
    assert len(trainor.epoch_losses) == 1 and np.isfinite(trainor.epoch_losses[0])
    assert np.isfinite(evaluator.scores[0]["validation_loss"])


def test_rrg_force_constrained_eval(workdir, tmp_path):
    config = _base_config(
        workdir, tmp_path,
        dataset={
            "proto": "ImSeqAny",
            "image": {"root": str(workdir), "file": "image.tok", "resize": 40,
                      "crop": 32, "ext": ".jpg"},
            "seq": {"root": str(workdir), "file": "report.tok", "source": "tgt",
                    "tokenizer_max_len": 12},
            "any": {"root": str(workdir), "file": "concepts.tok",
                    "name": "concepts"},
            "num_workers": 0,
        },
        model={
            "proto": "RRG_FORCE",
            "decoder": dict(TINY_TRANSFORMER, proto=None),
            "cnn": dict(TINY_VIT),
        },
        metrics=["BLEU"],
        early_stop_metric="BLEU",
    )
    trainor, evaluator = _run(config, 515155)
    scores = evaluator.scores[0]
    assert "BLEU" in scores
    # constrained decoding must include the forced concept in each hypothesis
    import glob as _glob

    hyps_files = _glob.glob(str(tmp_path / "*hyps.txt"))
    assert hyps_files
    hyps = open(hyps_files[0]).read().splitlines()
    concepts = CONCEPTS[: len(hyps)]
    included = sum(1 for h, c in zip(hyps, concepts) if c in h)
    assert included >= len(hyps) * 0.5, (hyps, concepts)


def test_rrg_multi_image(workdir, tmp_path):
    """Multi-image path: N images per line, padded with mask (RRG_HF.py:116-152)."""
    multi = workdir / "multi"
    multi.mkdir(exist_ok=True)
    paths = sorted(str(p) for p in workdir.glob("im*.jpg"))
    lines = [",".join(paths[:2]), paths[0], ",".join(paths[:3])]
    reports = REPORTS[:3]
    for split in ("train", "validate"):
        (multi / f"{split}.report.tok").write_text("\n".join(reports))
        (multi / f"{split}.image.tok").write_text("\n".join(lines))

    config = _base_config(
        multi, tmp_path,
        dataset={
            "proto": "ImSeq",
            "image": {"root": str(multi), "file": "image.tok", "resize": 40,
                      "crop": 32, "ext": ".jpg", "multi_image": 2},
            "seq": {"root": str(multi), "file": "report.tok", "source": "tgt",
                    "tokenizer_max_len": 12},
            "num_workers": 0,
        },
        model={
            "proto": "RRG",
            "decoder": dict(TINY_TRANSFORMER, proto=None),
            "cnn": dict(TINY_VIT, permute="batch_first"),
        },
        batch_size=3,
        metrics=["BLEU"],
        early_stop_metric="BLEU",
        beam_width=2,
    )
    trainor, evaluator = _run(config, 515156)
    assert "BLEU" in evaluator.scores[0]


def test_rrg_device_preproc(workdir, tmp_path):
    """u8-transfer device preprocessing path (ops/image_preproc north star)."""
    config = _base_config(
        workdir, tmp_path,
        dataset={
            "proto": "ImSeq",
            "image": {"root": str(workdir), "file": "image.tok", "resize": 40,
                      "crop": 32, "ext": ".jpg", "device_preproc": True},
            "seq": {"root": str(workdir), "file": "report.tok", "source": "tgt",
                    "tokenizer_max_len": 12},
            "num_workers": 0,
        },
        model={
            "proto": "RRG",
            "decoder": dict(TINY_TRANSFORMER, proto=None),
            "cnn": dict(TINY_VIT),
        },
        metrics=["BLEU"],
        early_stop_metric="BLEU",
        beam_width=2,
    )
    trainor, evaluator = _run(config, 515157)
    assert "BLEU" in evaluator.scores[0]
    # collate really produced u8 batches, already host-cropped to crop size
    # (the wire carries 32^2 not 40^2 bytes — H2D is the measured loader
    # floor; the device half is the u8->f32 normalize)
    batch = next(iter(trainor.dl))
    assert batch["images_u8"].dtype.name == "uint8"
    assert batch["images_u8"].shape[1:] == (32, 32, 3)
    assert not batch["preproc_tops"].any()  # offsets consumed on host


def test_gloria_whole_word_aggregation():
    """Subword embeddings sum into whole-word embeddings (reference
    aggregate_tokens, GLoRIA.py:123-181): 'pneumo ##thorax' -> one word whose
    embedding is the sum of the two pieces; [CLS]/[PAD] dropped, [SEP] kept."""
    import jax.numpy as jnp
    import numpy as np

    from vilmedic_tpu import registry

    class _Tok:
        vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
                 "pneumo": 4, "##thorax": 5, "clear": 6}
        cls_token, sep_token, pad_token = "[CLS]", "[SEP]", "[PAD]"
        vocab_size = 7

    class _DS:
        tokenizer = _Tok()

    class _DL:
        dataset = _DS()

    gloria = registry.get("model", "GLoRIA")(
        encoder={"proto": None, "hidden_size": 8, "num_hidden_layers": 1,
                 "num_attention_heads": 2, "intermediate_size": 16,
                 "max_position_embeddings": 16},
        cnn={"backbone": "resnet18", "feature_dim": 8},
        dl=_DL(),
    )
    # [CLS] pneumo ##thorax clear [SEP] [PAD]
    ids = jnp.asarray([[2, 4, 5, 6, 3, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0]], jnp.int32)
    emb = jnp.arange(1 * 6 * 8, dtype=jnp.float32).reshape(1, 6, 8)
    agg, wmask = gloria._aggregate_words(emb, ids, mask)
    # 3 words: pneumothorax (= piece1+piece2), clear, [SEP]
    np.testing.assert_array_equal(np.asarray(wmask[0]), [1, 1, 1, 0, 0, 0])
    np.testing.assert_allclose(
        np.asarray(agg[0, 0]), np.asarray(emb[0, 1] + emb[0, 2]), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(agg[0, 1]), np.asarray(emb[0, 3]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(agg[0, 2]), np.asarray(emb[0, 4]), rtol=1e-6)


def test_scst_chexbert_reward():
    """SCST with the chexbert clinical reward (the flagship RL recipe,
    reference config RRG_SCST + REWARD_COMPLIANT['chexbert']): per-sample
    exact-match reward flows through get_reward with an injected labeler."""
    import numpy as np

    from vilmedic_tpu.blocks.rl.scst import SCST
    from vilmedic_tpu.scorers.chexbert import CONDITIONS

    class _Tok:
        def decode(self, row, **kw):
            return {0: "no acute disease", 1: "cardiomegaly",
                    2: "effusion"}[int(row[0])]

    class _FakeLabeler:
        def get_labels(self, reports, mode="rrg"):
            table = {
                "no acute disease": [0] * 14,
                "cardiomegaly": [0, 1] + [0] * 12,
                "effusion": [0] * 9 + [1] + [0] * 4,
            }
            return [table[r] for r in reports]

    scst = SCST(
        tokenizer=_Tok(), max_length=8, bos_token_id=0, eos_token_id=2,
        pad_token_id=1, scores=["chexbert"],
        scores_args=[{"labeler": _FakeLabeler()}],
    )
    rollout = np.array([[1], [1], [2]])  # cardiomegaly, cardiomegaly, effusion
    refs = np.array([[1], [0], [2]])     # cardiomegaly, no-acute, effusion
    rewards, hyps, ref_list = scst.get_reward(rollout, refs)
    assert len(rewards) == 1
    # exact-match over TOP5 labels: pair0 match, pair1 mismatch, pair2 match
    np.testing.assert_array_equal(rewards[0], [1.0, 0.0, 1.0])


def test_overlap_rollout_staleness_tracks_serial():
    """Behavioral A/B for the one-step-stale ``overlap_rollout`` pipeline
    (VERDICT r4 #5): from identical inits, seeds, and a fixed toy batch, the
    overlapped run's greedy-probe ROUGE-L trajectory must TRACK the strictly
    on-policy run — the evidence that one policy-update of staleness does not
    derail SCST training, which is what justifies ever flipping the flag."""
    import types

    import jax
    import jax.numpy as jnp

    from vilmedic_tpu.blocks.rl.scst import SCST
    from vilmedic_tpu.blocks.transformer import TransformerConfig
    from vilmedic_tpu.blocks.vision.visual_encoder import build_visual_encoder
    from vilmedic_tpu.executors.train_state import TrainState, create_optimizer
    from vilmedic_tpu.models.rrg import RRGModule
    from vilmedic_tpu.models.scst_models import _SCSTBase

    VOCAB, MAXLEN, B, LR, ITERS = 24, 10, 4, 5e-3, 24

    class ToyTok:
        vocab_size = VOCAB
        cls_token_id, sep_token_id, pad_token_id = 0, 2, 1

        def decode(self, row, skip_special_tokens=True,
                   clean_up_tokenization_spaces=False):
            return " ".join(f"w{int(t)}" for t in np.asarray(row) if int(t) > 2)

    def build(overlap):
        enc = build_visual_encoder(dict(TINY_VIT))
        cfg = TransformerConfig(
            vocab_size=VOCAB, add_cross_attention=True, **TINY_TRANSFORMER
        )
        module = RRGModule(enc=enc, dec_config=cfg)
        model = _SCSTBase.__new__(_SCSTBase)
        model.module = module
        model.dec_config = cfg
        model.model = types.SimpleNamespace(
            encoder_inputs=lambda b: {"images": b["images"]},
        )
        model.scst = SCST(
            tokenizer=ToyTok(), max_length=MAXLEN, bos_token_id=0,
            eos_token_id=2, pad_token_id=1, scores="ROUGEL", top_k=5,
        )
        model._rollout_fn = model._grad_fn = None
        model.overlap_rollout = overlap
        model._pending = model._drain_pool = model._host_step = None
        model.timing = {"rollout_s": 0.0, "reward_s": 0.0, "grad_s": 0.0,
                        "iters": 0}
        rng = np.random.default_rng(11)
        images = jnp.asarray(rng.normal(size=(B, 32, 32, 3)), jnp.float32)
        ids = np.tile(
            np.array([0, 5, 6, 7, 8, 9, 2, 1, 1, 1], np.int32), (B, 1)
        )
        batch = {"images": images, "input_ids": ids,
                 "attention_mask": (ids != 1).astype(np.int32)}
        variables = module.init(
            {"params": jax.random.key(3)}, images, ids[:, :2],
            jnp.ones((B, 2), jnp.int32), train=False,
        )
        tx = create_optimizer("adamw", {"lr": LR})
        state = TrainState(
            step=jnp.asarray(0), params=variables["params"],
            opt_state=tx.init(variables["params"]),
            batch_stats=variables.get("batch_stats", {}),
        )
        trainor = types.SimpleNamespace(tx=tx, rng=jax.random.key(9))
        return model, state, trainor, batch, ids

    def probe(model, state, batch, refs):
        """Greedy reward of the CURRENT policy on the fixed batch."""
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        greedy, _ = model._rollout_fn(
            variables, {"images": batch["images"]}, jax.random.key(0)
        )
        r, _, _ = model.scst.get_reward(np.asarray(greedy), refs)
        return float(np.mean(np.concatenate(r)))

    def run(overlap):
        model, state, trainor, batch, refs = build(overlap)
        traj = []
        for _ in range(ITERS):
            state, loss, _ = model.train_iteration(trainor, state, batch, LR)
            traj.append(probe(model, state, batch, refs))
        if model._pending is not None:
            state, loss, _ = model.finish_epoch(trainor, state, LR)
            traj[-1] = probe(model, state, batch, refs)
        return np.asarray(traj)

    serial = run(False)
    overlapped = run(True)
    # same machinery, same seeds: iteration 1's rollout samples from the
    # identical init policy, so early probes must agree almost exactly
    assert abs(serial[0] - overlapped[1]) < 0.05, (serial[:3], overlapped[:3])
    # trajectories track on the robust statistic: BOTH runs climb from the
    # same start to a comparable best policy (the stale sampling does not
    # derail training — it only delays the climb by its one-step lag). Peak
    # reward is compared rather than the tail because this over-driven toy
    # (fixed batch, lr 5e-3) collapses after its peak in BOTH modes, and the
    # post-collapse phase is chaotic; measured trajectories (seeded,
    # deterministic on CPU): serial peaks 0.615 by iter 8, overlapped reaches
    # the same 0.615 by iter 18.
    assert serial.max() > serial[0] + 0.1, serial.tolist()
    assert overlapped.max() > overlapped[1] + 0.1, overlapped.tolist()
    assert abs(serial.max() - overlapped.max()) < 0.15, (
        serial.tolist(), overlapped.tolist()
    )
