"""Multi-host TRAINING: one jitted step over a global mesh spanning processes.

2-process jax.distributed cluster, each host feeding its strided shard of the
global batch (DataLoader), assembled via host_local_array_to_global_array —
the SPMD realization of Accelerate DDP (reference trainor_accelerate.py:91-144).
Correctness: per-epoch losses must match a single-process run on the same
global batch bit-for-tolerance (mean loss and summed grads are shard-order
invariant with dropout off), early-stop decisions agree via broadcast, and
only rank 0 writes checkpoints.
"""

import glob
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FINDINGS = ["the lungs are well expanded and clear .",
            "heart size is mildly enlarged .",
            "there is a small left pleural effusion .",
            "no pneumothorax is identified .",
            "the cardiomediastinal silhouette is normal .",
            "patchy opacity in the right lower lobe .",
            "lungs are clear without effusion .",
            "stable cardiomegaly without edema ."]
IMPRESSIONS = ["no acute disease .", "cardiomegaly .", "small left effusion .",
               "no pneumothorax .", "normal heart .", "possible pneumonia .",
               "clear lungs .", "stable cardiomegaly ."]

WORKER = '''
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
nproc = int(sys.argv[4])
if nproc > 1:
    jax.distributed.initialize(coordinator_address=sys.argv[1], num_processes=nproc,
                               process_id=int(sys.argv[2]))
sys.path.insert(0, {repo!r})
import numpy as np
from vilmedic_tpu.config import Config
from vilmedic_tpu.executors import Trainor, Validator
from vilmedic_tpu.utils import set_logger

root = sys.argv[3]
ckpt = os.path.join(root, f"ckpt_{{nproc}}p")
os.makedirs(ckpt, exist_ok=True)
cfg = Config({{
    "ckpt_dir": ckpt,
    "dataset": {{"proto": "Seq2Seq",
        "src": {{"root": root, "file": "findings.tok", "tokenizer_max_len": 24}},
        "tgt": {{"root": root, "file": "impression.tok", "tokenizer_max_len": 8}},
        "num_workers": 0}},
    "model": {{"proto": "RRS",
        "encoder": {{"proto": None, "hidden_size": 32, "num_hidden_layers": 1,
                    "num_attention_heads": 4, "intermediate_size": 64,
                    "max_position_embeddings": 32, "hidden_dropout_prob": 0.0}},
        "decoder": {{"proto": None, "hidden_size": 32, "num_hidden_layers": 1,
                    "num_attention_heads": 4, "intermediate_size": 64,
                    "max_position_embeddings": 32, "hidden_dropout_prob": 0.0}}}},
    "batch_size": 8, "optimizer": "Adam", "optim_params": {{"lr": 1e-3}},
    "epochs": 1, "early_stop": 5, "eval_start": 0,
    "early_stop_metric": "ROUGEL", "metrics": ["ROUGEL"],
    "beam_width": 2, "splits": ["validate"],
}})
seed = 881100
set_logger(ckpt, seed)
trainor = Trainor(config=cfg, seed=seed)
ev = Validator(config=cfg, models=[trainor.model], train_dl=trainor.dl,
               seed=seed, from_training=True)
trainor.evaluator = ev
trainor.start()
pid = jax.process_index()
out = {{"pid": pid, "losses": trainor.epoch_losses,
        "scores": ev.scores[-1] if ev.scores else None}}
print("RESULT " + json.dumps(out, default=float), flush=True)
'''


def _run_cluster(tmp_path, nproc, local_devices=1):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    if local_devices > 1:
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), f"localhost:{port}", str(i),
             str(tmp_path), str(nproc)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    results = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}/{nproc} failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
    return results


def test_two_process_training_matches_single(tmp_path):
    for split in ("train", "validate"):
        (tmp_path / f"{split}.findings.tok").write_text("\n".join(FINDINGS))
        (tmp_path / f"{split}.impression.tok").write_text("\n".join(IMPRESSIONS))

    single = _run_cluster(tmp_path, 1)[0]
    multi = _run_cluster(tmp_path, 2)

    # both ranks computed the same global losses, equal to the 1-process run
    # (mean loss over the global batch is shard-order invariant, dropout off)
    import numpy as np

    np.testing.assert_allclose(multi[0]["losses"], multi[1]["losses"], rtol=1e-6)
    np.testing.assert_allclose(multi[0]["losses"], single["losses"], rtol=1e-4)

    # rank-broadcast metrics agree (early-stop decisions are consistent)
    assert multi[0]["scores"]["ROUGEL"] == multi[1]["scores"]["ROUGEL"]

    # rank 0 alone wrote the checkpoint
    ckpts = glob.glob(str(tmp_path / "ckpt_2p" / "*.ckpt"))
    assert len(ckpts) == 1, ckpts


def test_two_process_four_device_training(tmp_path):
    """2 hosts x 4 devices each — the realistic DCN-between / ICI-within
    topology: global mesh of 8, per-host shards assembled into the global
    batch, identical losses on both ranks."""
    for split in ("train", "validate"):
        (tmp_path / f"{split}.findings.tok").write_text("\n".join(FINDINGS))
        (tmp_path / f"{split}.impression.tok").write_text("\n".join(IMPRESSIONS))
    multi = _run_cluster(tmp_path, 2, local_devices=4)
    import numpy as np

    np.testing.assert_allclose(multi[0]["losses"], multi[1]["losses"], rtol=1e-6)
    assert multi[0]["scores"]["ROUGEL"] == multi[1]["scores"]["ROUGEL"]
