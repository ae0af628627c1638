#!/usr/bin/env python
"""Train CLI: ``python bin_tpu/train.py config.yml [key=value ...]``.

Parity with reference bin/train.py:13-58: parse config + overrides, create the
checkpoint dir, dump the config json, build Trainor + Validator, start training.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vilmedic_tpu.config import executor_config, get_args
from vilmedic_tpu.executors import Trainor, Validator
from vilmedic_tpu.parallel.mesh import init_distributed
from vilmedic_tpu.utils import extract_seed_from_ckpt, get_seed, set_logger


def main(argv=None):
    init_distributed()
    config, override = get_args(argv)

    train_config = executor_config(config, "trainor")
    val_config = executor_config(config, "validator")

    ckpt_dir = os.path.join(config.ckpt_dir, config.name)
    os.makedirs(ckpt_dir, exist_ok=True)
    train_config.ckpt_dir = ckpt_dir
    val_config.ckpt_dir = ckpt_dir

    seed = (
        extract_seed_from_ckpt(train_config.ckpt)
        if train_config.get("ckpt")
        else get_seed(train_config.get("seed"))
    )
    logger = set_logger(ckpt_dir, seed)
    with open(os.path.join(ckpt_dir, f"config_{seed}.json"), "w") as f:
        json.dump(config.to_dict(), f, indent=4, default=str)
    logger.settings("Override dict")
    logger.info(json.dumps(override.to_dict(), indent=4, default=str))

    trainor = Trainor(config=train_config, seed=seed)
    evaluator = Validator(
        config=val_config,
        models=[trainor.model],
        train_dl=trainor.dl,
        seed=seed,
        from_training=True,
    )
    trainor.evaluator = evaluator
    trainor.start()


if __name__ == "__main__":
    main()
