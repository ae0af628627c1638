"""CLI smoke tests: train.py + ensemble.py + vilmedic_metrics.py end to end."""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REPORTS = ["no acute disease .", "lungs are clear .", "heart size normal .",
           "small effusion ."]

CONFIG_TMPL = """
name: smoke
ckpt_dir: {ckpt_dir}
dataset:
  proto: ImSeq
  image:
    root: {root}
    file: image.tok
    resize: 36
    crop: 32
    ext: .jpg
  seq:
    root: {root}
    file: report.tok
    source: tgt
    tokenizer_max_len: 10
  num_workers: 0
model:
  proto: RRG
  decoder:
    proto: null
    hidden_size: 32
    num_hidden_layers: 1
    num_attention_heads: 4
    intermediate_size: 64
    max_position_embeddings: 32
    hidden_dropout_prob: 0.0
  cnn:
    proto: VisualEncoder
    backbone: vit
    permute: no_permute
    hidden_size: 32
    num_hidden_layers: 1
    num_attention_heads: 4
    intermediate_size: 64
    patch_size: 16

trainor:
  batch_size: 4
  optimizer: Adam
  optim_params:
    lr: 1e-3
  epochs: 0
  early_stop: 3
  eval_start: 0
  early_stop_metric: BLEU

validator:
  batch_size: 4
  beam_width: 2
  metrics: [BLEU]
  splits: [validate]

ensemblor:
  batch_size: 4
  beam_width: 2
  metrics: [BLEU, ROUGEL]
  splits: [validate]
  mode: best-1
"""


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
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
    ckpt_root = tmp_path_factory.mktemp("cli_ckpt")
    cfg_path = root / "smoke.yml"
    cfg_path.write_text(CONFIG_TMPL.format(ckpt_dir=str(ckpt_root), root=str(root)))
    return root, ckpt_root, cfg_path


def _run(script, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # ignored by the preloaded backend...
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import runpy, sys; sys.argv = [sys.argv[0]] + sys.argv[1:]; "
        f"runpy.run_path({script!r}, run_name='__main__')"
    )
    return subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )


def test_train_cli(setup):
    root, ckpt_root, cfg_path = setup
    result = _run(os.path.join(REPO, "bin_tpu", "train.py"), str(cfg_path))
    assert result.returncode == 0, result.stderr[-3000:]
    run_dir = os.path.join(str(ckpt_root), "smoke")
    assert glob.glob(os.path.join(run_dir, "*.ckpt"))
    assert glob.glob(os.path.join(run_dir, "config_*.json"))
    assert glob.glob(os.path.join(run_dir, "validate_*_hyps.txt"))


def test_ensemble_cli(setup):
    root, ckpt_root, cfg_path = setup
    run_dir = os.path.join(str(ckpt_root), "smoke")
    assert glob.glob(os.path.join(run_dir, "*.ckpt")), "train must run first"
    result = _run(os.path.join(REPO, "bin_tpu", "ensemble.py"), str(cfg_path))
    assert result.returncode == 0, result.stderr[-3000:]


def test_metrics_cli(setup, tmp_path):
    refs = tmp_path / "refs.txt"
    hyps = tmp_path / "hyps.txt"
    refs.write_text("\n".join(REPORTS))
    hyps.write_text("\n".join(REPORTS))
    result = _run(
        os.path.join(REPO, "bin_tpu", "vilmedic_metrics.py"),
        "--refs", str(refs), "--hyps", str(hyps), "--metrics", "BLEU", "ROUGEL",
    )
    assert result.returncode == 0, result.stderr[-2000:]
    scores = json.loads(result.stdout[result.stdout.index("{"):])
    assert scores["BLEU"] == pytest.approx(1.0, abs=1e-6)
