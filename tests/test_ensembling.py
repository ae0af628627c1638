"""Ensembling: N models decoded in lockstep with summed logits; resume training."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vilmedic_tpu.config import Config
from vilmedic_tpu.executors import Trainor, Validator
from vilmedic_tpu.utils import set_logger

REPORTS = ["no acute disease .", "lungs are clear .", "heart size normal .",
           "small effusion ."]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ens")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(len(REPORTS)):
        arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        p = root / f"im{i}.jpg"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    for split in ("train", "validate"):
        (root / f"{split}.report.tok").write_text("\n".join(REPORTS))
        (root / f"{split}.image.tok").write_text("\n".join(paths))
    return root


def _config(root, ckpt_dir, **extra):
    cfg = {
        "ckpt_dir": str(ckpt_dir),
        "dataset": {
            "proto": "ImSeq",
            "image": {"root": str(root), "file": "image.tok", "resize": 36,
                      "crop": 32, "ext": ".jpg"},
            "seq": {"root": str(root), "file": "report.tok", "source": "tgt",
                    "tokenizer_max_len": 10},
            "num_workers": 0,
        },
        "model": {
            "proto": "RRG",
            "decoder": {"proto": None, "hidden_size": 32, "num_hidden_layers": 1,
                        "num_attention_heads": 4, "intermediate_size": 64,
                        "max_position_embeddings": 32, "hidden_dropout_prob": 0.0},
            "cnn": {"proto": "VisualEncoder", "backbone": "vit",
                    "permute": "no_permute", "hidden_size": 32,
                    "num_hidden_layers": 1, "num_attention_heads": 4,
                    "intermediate_size": 64, "patch_size": 16},
        },
        "batch_size": 4,
        "optimizer": "Adam",
        "optim_params": {"lr": 1e-3},
        "epochs": 0,
        "early_stop": 5,
        "eval_start": 0,
        "early_stop_metric": "BLEU",
        "metrics": ["BLEU"],
        "beam_width": 2,
        "splits": ["validate"],
    }
    cfg.update(extra)
    return Config(cfg)


def _train_one(root, ckpt_dir, seed):
    config = _config(root, ckpt_dir)
    set_logger(str(ckpt_dir), seed)
    trainor = Trainor(config=config, seed=seed)
    evaluator = Validator(config=config, models=[trainor.model],
                          train_dl=trainor.dl, seed=seed, from_training=True)
    trainor.evaluator = evaluator
    trainor.start()
    return trainor, config


def test_two_model_ensemble_eval(workdir, tmp_path):
    d1, d2 = tmp_path / "m1", tmp_path / "m2"
    d1.mkdir(); d2.mkdir()
    t1, config = _train_one(workdir, d1, 717171)
    t2, _ = _train_one(workdir, d2, 717172)

    evaluator = Validator(
        config=config, models=[t1.model, t2.model], seed=717171,
        from_training=False,
    )
    scores = evaluator.start()
    assert "BLEU" in scores[0]

    # ensembling really sums logits: a model ensembled with itself must
    # reproduce its own single-model hypotheses
    from vilmedic_tpu.models.evaluation_nlg import evaluation

    dl = evaluator.splits[0][1]
    single = evaluation([t1.model], config, dl)
    double = evaluation([t1.model, t1.model], config, dl)
    assert single["hyps"] == double["hyps"]


def test_ensemble_cli_get_ckpts(workdir, tmp_path):
    from bin_tpu.ensemble import get_ckpts

    d = tmp_path / "ck"
    d.mkdir()
    for tag, epoch in [(0.5, 1), (0.8, 3), (0.7, 2)]:
        (d / f"{tag}_{epoch}_999.ckpt").write_bytes(b"x")
    best2 = get_ckpts(str(d), "best-2")
    assert [os.path.basename(p).split("_")[0] for p in best2] == ["0.8", "0.7"]
    assert len(get_ckpts(str(d), "all")) == 3


def test_resume_from_checkpoint(workdir, tmp_path):
    d = tmp_path / "resume"
    d.mkdir()
    trainor, config = _train_one(workdir, d, 717173)
    ckpts = glob.glob(str(d / "*.ckpt"))
    assert ckpts
    best_before = trainor.training_scheduler.current_best_metric

    config2 = _config(workdir, d, ckpt=ckpts[0], epochs=1)
    trainor2 = Trainor(config=config2, seed=717173)
    # scheduler state restored: epoch advanced past 0, best metric carried over
    assert trainor2.training_scheduler.epoch >= 1
    assert trainor2.training_scheduler.current_best_metric == pytest.approx(
        best_before
    )
    # model weights restored: same validation hyps as the saved model
    from vilmedic_tpu.models.evaluation_nlg import evaluation

    evaluator = Validator(config=config2, models=[trainor2.model],
                          train_dl=trainor2.dl, seed=717173, from_training=True)
    dl = evaluator.splits[0][1]
    h_before = evaluation([trainor.model], config2, dl)["hyps"]
    h_after = evaluation([trainor2.model], config2, dl)["hyps"]
    assert h_before == h_after
