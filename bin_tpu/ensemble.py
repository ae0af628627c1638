#!/usr/bin/env python
"""Ensemble / test CLI: re-score saved checkpoints, optionally ensembling.

Parity with reference bin/ensemble.py:13-80: glob ``*.ckpt`` in ckpt_dir, sort by
the score tag in ``{tag}_{epoch}_{seed}.ckpt``, pick ``mode: best-N | all``,
load the N models, run the Validator over the ensemblor splits.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vilmedic_tpu.config import executor_config, get_args
from vilmedic_tpu.executors import Validator
from vilmedic_tpu.executors.checkpoint import load_checkpoint
from vilmedic_tpu.executors.utils import create_data_loader, create_model
from vilmedic_tpu.utils import extract_seed_from_ckpt, get_seed, set_logger


def get_ckpts(ckpt_dir, mode="best-1"):
    ckpts = glob.glob(os.path.join(ckpt_dir, "*.ckpt"))
    assert ckpts, f"No checkpoints in {ckpt_dir}"
    if mode == "all":
        return ckpts

    assert mode.startswith("best-"), f"Unknown ensemblor mode {mode!r}"
    n = int(mode.split("-")[1])

    def tag(path):
        return float(os.path.basename(path).split("_")[0])

    return sorted(ckpts, key=tag, reverse=True)[:n]


def main(argv=None):
    config, override = get_args(argv)
    ens_config = executor_config(config, "ensemblor")
    ckpt_dir = os.path.join(config.ckpt_dir, config.name)
    ens_config.ckpt_dir = ckpt_dir

    ckpts = get_ckpts(ckpt_dir, ens_config.get("mode", "best-1"))
    seed = extract_seed_from_ckpt(ckpts[0])
    logger = set_logger(ckpt_dir, seed)
    logger.settings(f"Ensembling {len(ckpts)} checkpoints: {ckpts}")

    dl = create_data_loader(ens_config, split="train", logger=logger,
                            called_by_validator=True, called_by_ensemblor=True)
    models = []
    for ckpt in ckpts:
        state_dict = load_checkpoint(ckpt)
        models.append(
            create_model(ens_config, dl=dl, logger=logger, from_training=False,
                         state_dict=state_dict, seed=int(seed))
        )

    evaluator = Validator(
        config=ens_config, models=models, seed=seed, from_training=False
    )
    evaluator.start()


if __name__ == "__main__":
    main()
