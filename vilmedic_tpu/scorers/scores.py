"""Metric dispatch: ``compute_scores`` + the RL-reward-compliant registry.

Parity with reference vilmedic/blocks/scorers/scores.py:17-152:
- name -> scorer dispatch with per-metric error isolation (one broken scorer
  cannot kill a run),
- refs/hyps/metrics dumped as ``{split}_{seed}_{refs,hyps,metrics}.txt`` in the
  logger directory,
- ``REWARD_COMPLIANT`` exposes scorers (name -> (class, output index)) as reward
  functions for SCST.

Neural/clinical scorers that require external model weights (CheXbert, RadGraph,
BERTScore, NLI, GREEN) are dispatched through the same names; when their weights
are not present locally they raise and are error-isolated to ``None`` exactly as
a missing Java jar would be in the reference.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from ..utils.logger import get_logger_directory
from .nlg.bleu import Bleu
from .nlg.ciderd import CiderD, CiderDRL
from .nlg.meteor import Meteor
from .nlg.rouge import Rouge, Rouge1, Rouge2, RougeL


def _reward_compliant():
    """name -> (scorer factory, index of per-sample output)."""
    table = {
        "rougel": (RougeL, 1),
        "rouge2": (Rouge2, 1),
        "rouge1": (Rouge1, 1),
        "bleu": (Bleu, 1),
        "meteor": (Meteor, 1),
        "ciderdrl": (CiderDRL, 1),
    }
    try:
        from .clinical import (
            F1CheXbert, F1RadGraph, BertScore, RadEntityMatchExact, RadEntityNLI,
        )

        table.update(
            {
                "radentitymatchexact": (RadEntityMatchExact, 1),
                "radentitynli": (RadEntityNLI, 1),
                "chexbert": (F1CheXbert, 1),
                "radgraph": (F1RadGraph, 1),
                "bertscore": (BertScore, 1),
            }
        )
    except Exception:  # clinical stack optional
        pass
    return table


REWARD_COMPLIANT = _reward_compliant()


def compute_scores(
    metrics,
    refs: Optional[List[str]],
    hyps: Optional[List[str]],
    split: str,
    seed,
    config,
    epoch,
    logger,
    dump: bool = True,
) -> Dict:
    scores: Dict = {}
    if logger is None:
        import logging

        logger = logging.getLogger("vilmedic_tpu.scorers")
    if metrics is None or not metrics:
        return scores

    assert refs is not None and hyps is not None, (
        "You specified metrics but your evaluation does not return hyps nor refs"
    )
    assert len(refs) == len(hyps), (
        f"refs and hyps must have same length: {len(refs)} vs {len(hyps)}"
    )

    base = None
    if dump:
        base = os.path.join(get_logger_directory(logger), f"{split}_{seed}_{{}}")
        with open(base.format("refs.txt"), "w") as f:
            f.write("\n".join(map(str, refs)))
        with open(base.format("hyps.txt"), "w") as f:
            f.write("\n".join(map(str, hyps)))

    for metric in metrics:
        metric_args: Dict = {}
        metric_name = metric
        if isinstance(metric, dict) or hasattr(metric, "keys"):
            keys = list(metric.keys())
            if len(keys) != 1:
                logger.warning(f"Metric badly formatted: {metric}")
                continue
            metric_name = keys[0]
            metric_args = metric[metric_name] or {}
            if hasattr(metric_args, "to_dict"):
                metric_args = metric_args.to_dict()

        metric_lower = str(metric_name).lower()
        try:
            if metric_lower == "bleu":
                scores["BLEU"] = Bleu()(refs, hyps)[0]
            elif metric_lower == "meteor":
                scores["METEOR"] = Meteor()(refs, hyps)[0]
            elif metric_lower == "ciderd":
                scores["CIDERD"] = CiderD()(refs, hyps)[0]
            elif metric_lower == "spice":
                from .nlg.spice import Spice

                scores["SPICE"] = Spice()(refs, hyps)[0]
            elif metric_lower in ("rouge1", "rouge2", "rougel"):
                scores[str(metric_name).upper()] = Rouge(rouges=[metric_lower])(refs, hyps)[0]
            elif metric_lower == "accuracy":
                scores["accuracy"] = round(
                    float(np.mean(np.asarray(refs) == np.argmax(hyps, axis=-1))) * 100, 2
                )
            elif metric_lower == "f1-score":
                from sklearn.metrics import classification_report

                scores["f1-score"] = classification_report(refs, np.argmax(hyps, axis=-1))
            elif metric_lower == "auroc":
                from sklearn.metrics import roc_auc_score
                from scipy.special import softmax

                scores["auroc"] = roc_auc_score(
                    refs, softmax(np.asarray(hyps), axis=-1), multi_class="ovr"
                )
            elif metric_lower == "chexbert":
                from .clinical import F1CheXbert

                accuracy, accuracy_per_sample, chexbert_all, chexbert_5 = F1CheXbert(
                    refs_filename=base.format("refs.chexbert.txt") if dump else None,
                    hyps_filename=base.format("hyps.chexbert.txt") if dump else None,
                )(hyps, refs)
                scores["chexbert-5_micro avg_f1-score"] = chexbert_5["micro avg"]["f1-score"]
                scores["chexbert-all_micro avg_f1-score"] = chexbert_all["micro avg"]["f1-score"]
                scores["chexbert-5_macro avg_f1-score"] = chexbert_5["macro avg"]["f1-score"]
                scores["chexbert-all_macro avg_f1-score"] = chexbert_all["macro avg"]["f1-score"]
            elif metric_lower == "radgraph":
                from .clinical import F1RadGraph

                results = F1RadGraph(reward_level="all")(refs=refs, hyps=hyps)[0]
                (scores["radgraph_simple"], scores["radgraph_partial"],
                 scores["radgraph_complete"]) = results
            elif metric_lower == "radentitymatchexact":
                from .clinical import RadEntityMatchExact

                scores["radentitymatchexact"] = RadEntityMatchExact()(refs, hyps)[0]
            elif metric_lower == "radentitynli":
                from .clinical import RadEntityNLI

                scores["radentitynli"] = RadEntityNLI()(refs, hyps)[0]
            elif metric_lower == "bertscore":
                from .clinical import BertScore

                scores["bertscore"] = BertScore()(refs, hyps)[0]
            elif metric_lower == "radevalbertscore":
                from .clinical import RadEvalBERTScorer

                scores["radevalbertscore"] = RadEvalBERTScorer().score(refs, hyps)
            elif metric_lower == "stanford_ct_abd_accuracy":
                from .clinical import StanfordCTAbdAcc

                scores["stanford_ct_abd"] = StanfordCTAbdAcc()(refs=refs, hyps=hyps)[0]
            else:
                logger.warning(f"Metric not implemented: {metric_name}")
        except Exception as e:  # error isolation (reference scores.py:141-143)
            logger.error(f"Error computing metric {metric_name}: {e}")
            scores[str(metric_name)] = None

    if dump:
        with open(base.format("metrics.txt"), "a+") as f:
            f.write(json.dumps({"split": split, "epoch": epoch, "scores": scores},
                               indent=4, default=str))
    return scores
