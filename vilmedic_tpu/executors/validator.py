"""Validator: per-split evaluation executor.

Parity with reference vilmedic/executors/validator.py:52-114: builds one
dataloader per split, runs the models' own ``eval_func``, computes
``validation_loss`` + configured metrics via ``compute_scores``, optionally runs
post-processing, and records a scores dict per split in ``self.scores``.
Distributed eval: each host evaluates its shard; refs/hyps are all-gathered
(the SPMD analog of ``gather_for_metrics``, reference validator_accelerate.py:155-162).
"""

from __future__ import annotations

import json
import logging

import jax

from ..parallel.mesh import broadcast_json, gather_string_lists, gather_weighted_mean
from ..scorers.scores import compute_scores
from .utils import create_data_loader, get_eval_func


class Validator:
    def __init__(self, config, models, train_dl=None, seed=None, from_training=True):
        self.seed = seed
        self.config = config
        self.from_training = from_training
        self.train_dl = train_dl
        self.logger = logging.getLogger(str(seed))
        self.models = models
        self.epoch = 0

        metrics = config.get("metrics", []) or []
        if not isinstance(metrics, (list, tuple)):
            metrics = [metrics]
        self.metrics = list(metrics)

        self.post_processing = config.get("post_processing")

        splits = config.get("splits")
        if splits is None:
            self.logger.warning("No splits defined in config, using ['val'] as default")
            splits = ["val"]
        self.splits = [
            (
                split,
                create_data_loader(
                    self.config,
                    split,
                    self.logger,
                    called_by_validator=True,
                    called_by_ensemblor=not from_training,
                ),
            )
            for split in splits
        ]

    def start(self):
        assert isinstance(self.models, list)
        self.scores = []

        for split, dl in self.splits:
            self.logger.info(
                f"Running split: {split} by ensembling {len(self.models)} models."
            )
            eval_func = get_eval_func(self.models)
            results = eval_func(
                models=self.models, config=self.config, dl=dl,
                from_training=self.from_training,
            )
            assert isinstance(results, dict) and any(
                key in results for key in ("loss", "refs", "hyps")
            ), "Evaluation func does not return any evaluation keys"

            refs = results.pop("refs", None)
            hyps = results.pop("hyps", None)
            loss = float(results.pop("loss", 0.0))
            if jax.process_count() > 1:
                # per-host shard results -> global: strings gather as padded
                # uint8 arrays (never trim/pad hypotheses like the reference's
                # workaround, validator_accelerate.py:126-176); loss gathers as
                # a sample-weighted mean.
                loss = gather_weighted_mean(
                    loss, len(refs) if isinstance(refs, list) else 1.0
                )
                import numpy as _np

                from ..parallel.mesh import gather_arrays

                def _gather(x):
                    if isinstance(x, list):
                        return gather_string_lists(x)
                    if isinstance(x, _np.ndarray):  # classifier logits/labels
                        return gather_arrays(x)
                    return x

                refs = _gather(refs)
                hyps = _gather(hyps)
            scores = {"validation_loss": loss}

            if jax.process_index() == 0:
                metrics = compute_scores(
                    metrics=self.metrics, refs=refs, hyps=hyps, split=split,
                    seed=self.seed, config=self.config, epoch=self.epoch,
                    logger=self.logger,
                )
                scores.update(metrics)

                if self.post_processing is not None:
                    from ..scorers.post_processing import post_processing

                    post_processing(
                        post_processing=self.post_processing, results=results,
                        split=split, seed=self.seed,
                        ckpt_dir=self.config.get("ckpt_dir"), epoch=self.epoch, dl=dl,
                    )

                self.logger.info(json.dumps(scores, indent=4, sort_keys=False, default=str))
            if jax.process_count() > 1:
                # all ranks must agree on metrics for early-stop/ckpt decisions
                scores = broadcast_json(scores)
            self.scores.append(scores)
        return self.scores
