"""Executor factories: datasets/loaders, models, optimizers, schedulers.

Parity with reference vilmedic/executors/utils.py:97-234 (``create_model``,
``create_data_loader``, ``create_optimizer``, ``create_training_scheduler``) with
registry dispatch instead of ``eval(proto)`` and JAX/optax instead of torch.
"""

from __future__ import annotations

import copy

import jax

from .. import registry
from ..config.config import Config
from ..data.loader import DataLoader
from .checkpoint import restore_into
from .scheduler import TrainingScheduler


def get_eval_func(models):
    dummy = models[0]
    assert hasattr(dummy, "eval_func")
    return dummy.eval_func


def create_data_loader(
    config,
    split: str,
    logger,
    called_by_validator: bool = False,
    called_by_ensemblor: bool = False,
) -> DataLoader:
    dataset_config = copy.deepcopy(config.dataset)
    if isinstance(dataset_config, Config):
        dataset_config = dataset_config.to_dict()
    proto = dataset_config.pop("proto")
    num_workers = dataset_config.pop("num_workers", 4)
    dataset = registry.get("dataset", proto)(
        split=split,
        ckpt_dir=config.get("ckpt_dir"),
        called_by_ensemblor=called_by_ensemblor,
        **dataset_config,
    )

    batch_size = int(config.get("batch_size", 1) or 1)
    is_train = split == "train" and not called_by_validator

    if not called_by_validator or called_by_ensemblor:
        logger.settings("DataLoader")
        logger.info(dataset)

    dl = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=is_train,
        drop_last=is_train,
        num_workers=num_workers,
        seed=int(config.get("seed", 0) or 0),
        shard_index=jax.process_index(),
        num_shards=jax.process_count(),
    )
    dl.batch_size = batch_size
    return dl


def create_model(
    config,
    dl: DataLoader,
    logger,
    from_training: bool = True,
    state_dict=None,
    seed: int = 0,
):
    """Instantiate the model proto, initialize its variables from one sample
    batch, and optionally restore checkpointed weights
    (reference executors/utils.py:97-137)."""
    model_config = copy.deepcopy(config.model)
    if isinstance(model_config, Config):
        model_config = model_config.to_dict()
    proto = model_config.pop("proto")
    model = registry.get("model", proto)(
        **model_config, dl=dl, logger=logger, from_training=from_training
    )
    logger.settings(f"Model {type(model).__name__} created")

    from ..data.image import prepare_batch

    sample_batch = prepare_batch(next(iter(dl)), dl.dataset)
    rng = jax.random.key(seed)
    variables = model.init_variables(rng, sample_batch)
    model.variables = variables
    if state_dict is None:
        # overlay locally cached pretrained HF weights for blocks declared with
        # a pretrained ``proto`` name (reference RRG_HF.py:18-115)
        model.variables = model.load_pretrained(model.variables, logger)

    if state_dict is not None:
        if "model" not in state_dict:
            raise ValueError('This checkpoint is not valid. Key "model" is missing.')
        model.variables = restore_into(variables, state_dict["model"])
        logger.info("Model state loaded")
    else:
        n_params = model.count_params(model.variables)
        logger.info(f"{model} [{n_params:,} params]")
    return model


def create_training_scheduler(config, base_lr, logger, state_dict=None, total_steps=None):
    scheduler = TrainingScheduler(
        lr_decay_func=config.get("lr_decay"),
        base_lr=base_lr,
        early_stop_metric=config.get("early_stop_metric"),
        early_stop_limit=config.get("early_stop"),
        lr_decay_params=_to_dict(config.get("lr_decay_params") or {}),
        total_steps=total_steps,
    )
    logger.settings("Training scheduler created")
    if state_dict is not None and "training_scheduler" in state_dict:
        scheduler.load_state_dict(state_dict["training_scheduler"])
        logger.info("Training scheduler state loaded")
    else:
        logger.info(scheduler)
    return scheduler


def _to_dict(cfg):
    return cfg.to_dict() if isinstance(cfg, Config) else dict(cfg)
