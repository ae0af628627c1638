"""Clinical / neural scorers: CheXbert F1, RadGraph F1, BERTScore, entity metrics.

These scorers require external model weights (reference: the ``f1chexbert`` /
``radgraph`` / ``bert_score`` pip packages plus stanza NER models, scores.py:7-8,
RadEntityMatchExact.py:12-16). In this offline environment the weights cannot be
fetched, so each class:
- uses a locally cached model if one exists under ``$VILMEDIC_TPU_CACHE`` (or the
  HF cache), otherwise
- raises ``ScorerUnavailable`` — which ``compute_scores`` error-isolates to a
  ``None`` metric exactly like a broken scorer in the reference (scores.py:141-143).

The class/return contracts match the reference so configs and SCST rewards work
unchanged once weights are provided.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np


class ScorerUnavailable(RuntimeError):
    pass


def _require(condition: bool, what: str):
    if not condition:
        raise ScorerUnavailable(
            f"{what} requires model weights that are not available in this "
            f"environment; place them under the HF cache or $VILMEDIC_TPU_CACHE."
        )


def _hf_model_cached(name: str) -> bool:
    """True if a HF model is fully cached locally (no network touch)."""
    try:
        from huggingface_hub import try_to_load_from_cache

        return try_to_load_from_cache(name, "config.json") is not None
    except Exception:
        return False


class F1CheXbert:
    """14-label CheXbert classifier micro/macro F1 (top-5 and all).

    Real Flax inference — see ``chexbert.py`` (BERT-base + 14 linear heads,
    converted from the ``chexbert.pth`` torch checkpoint). Contract matches the
    ``f1chexbert`` pip package used at reference scores.py:115-123: call returns
    ``(accuracy, accuracy_per_sample, chexbert_all, chexbert_5)``. Raises
    ``ScorerUnavailable`` only when no weights can be resolved (CHEXBERT_PTH /
    $VILMEDIC_TPU_CACHE/chexbert.pth / HF cache of StanfordAIMI/RRG_scorers).
    """

    from .chexbert import CONDITIONS, TOP5  # class-attr re-export (back-compat)

    def __init__(self, refs_filename=None, hyps_filename=None, labeler=None, **kwargs):
        from .chexbert import F1CheXbertImpl

        self._impl = F1CheXbertImpl(
            refs_filename=refs_filename, hyps_filename=hyps_filename,
            labeler=labeler, **kwargs,
        )

    def __call__(self, hyps: List[str], refs: List[str]):
        return self._impl(hyps, refs)


class F1RadGraph:
    """Entity/relation graph overlap F1 (simple/partial/complete) — exact
    radgraph reward math over annotations from a converted BERT NER head
    (see radgraph.py for the documented DyGIE++-relations approximation).
    Contract matches the radgraph pip package used at reference
    scores.py:131-133."""

    def __init__(self, reward_level: str = "all", model_type: str = "radgraph-xl",
                 annotator=None, **kw):
        from .radgraph import F1RadGraphImpl

        self._impl = F1RadGraphImpl(reward_level=reward_level,
                                    annotator=annotator, **kw)

    def __call__(self, refs: List[str], hyps: List[str]):
        return self._impl(refs=refs, hyps=hyps)


class BertScore:
    """BERTScore F1: distilbert-base layer 5, idf=False, baseline-rescaled
    (exact reference configuration, NLG/bertscore/bertscore.py:10-19)."""

    def __init__(self, model_type: str = "distilbert-base-uncased",
                 idf: bool = False, rescale_with_baseline: bool = True, **kwargs):
        # BERTSCORE_MODEL / $VILMEDIC_WEIGHTS_DIR/bertscore/model: any local
        # HF dir (offline deployments)
        from .weights import resolve

        self.model_type = resolve("BERTSCORE_MODEL", model_type)
        self.idf = idf
        self.rescale_with_baseline = rescale_with_baseline
        if not os.path.isdir(self.model_type):
            _require(_hf_model_cached(self.model_type), "BertScore")

    def __call__(self, refs: List[str], hyps: List[str]) -> Tuple[float, List[float]]:
        from .bertscore_impl import bert_score_f1

        scores = bert_score_f1(
            self.model_type, refs, hyps, idf=self.idf,
            rescale_with_baseline=self.rescale_with_baseline,
        )
        return float(np.mean(scores)), scores


class RadEvalBERTScorer:
    def __init__(self, model_type: str = "IAMJB/RadEvalModernBERT", num_layers: int = 22,
                 **kwargs):
        self.model_type = model_type
        self.num_layers = num_layers
        _require(_hf_model_cached(model_type), "RadEvalBERTScorer")

    def score(self, refs: List[str], hyps: List[str]) -> float:
        from .bertscore_impl import bert_score_f1

        # reference radevalbertscore.py:15: rescale_with_baseline=False
        scores = bert_score_f1(
            self.model_type, refs, hyps, layer=self.num_layers,
            rescale_with_baseline=False,
        )
        return float(np.mean(scores))


class RadEntityMatchExact:
    """Exact radiology-entity precision/recall/F1
    (reference RadEntityMatchExact/RadEntityMatchExact.py:12-50). Entities
    come from the converted BERT NER head (RADNER_MODEL) instead of stanza;
    the match arithmetic — including the upstream recall quirk — is ported
    verbatim (see nli.py)."""

    def __init__(self, ner=None, **kwargs):
        from .nli import RadEntityMatchExactImpl

        self._impl = RadEntityMatchExactImpl(ner=ner)

    def __call__(self, refs, hyps):
        return self._impl(refs=refs, hyps=hyps)


class GREEN:
    """LLM-judge clinical error counter (reference NLG/green/green.py:12-228):
    prompts the StanfordAIMI/GREEN causal LM to count clinical errors and
    regex-parses the counts into a score, with a global pair->reward memo cache."""

    def __init__(self, model_name: str = "StanfordAIMI/GREEN-radllama2-7b",
                 judge_fn=None, **kwargs):
        from .green import GREENImpl

        self._impl = GREENImpl(model_name=model_name, judge_fn=judge_fn, **kwargs)

    def __call__(self, refs: List[str], hyps: List[str]):
        return self._impl(refs, hyps)


class RadEntityNLI:
    """Entity match gated by NLI entailment
    (reference RadEntityNLI/RadEntityNLI.py:17-128): per-sentence BERTScore
    alignment + BERTNLI entailment/contradiction gating over NER entities.
    All three models run as converted Flax/host inference (see nli.py)."""

    def __init__(self, ner=None, nli=None, sentence_scorer=None, **kwargs):
        from .nli import RadEntityNLIImpl

        self._impl = RadEntityNLIImpl(ner=ner, nli=nli,
                                      sentence_scorer=sentence_scorer, **kwargs)

    def __call__(self, refs, hyps):
        return self._impl(refs=refs, hyps=hyps)


class StanfordCTAbdAcc:
    """Rule-based CT-abdomen findings accuracy
    (reference StanfordCTAbdAcc/StanfordCTAbdAcc.py:58): n-gram label lists
    checked per organ system; accuracy = fraction of organ labels agreeing."""

    # organ -> indicative phrases (presence in a report section = positive)
    LABELS = {
        "liver": ["hepatic steatosis", "liver lesion", "hepatomegaly", "cirrhosis"],
        "gallbladder": ["cholelithiasis", "gallstone", "cholecystitis"],
        "kidney": ["hydronephrosis", "renal calculus", "renal cyst", "nephrolithiasis"],
        "pancreas": ["pancreatitis", "pancreatic duct dilation", "pancreatic lesion"],
        "spleen": ["splenomegaly", "splenic lesion"],
        "bowel": ["obstruction", "ileus", "diverticulitis", "appendicitis"],
        "vasculature": ["aneurysm", "dissection", "thrombosis"],
        "ascites": ["ascites", "free fluid"],
    }

    def __call__(self, refs: List[str], hyps: List[str]):
        per_sample = []
        for r, h in zip(refs, hyps):
            r, h = r.lower(), h.lower()
            agree = total = 0
            for phrases in self.LABELS.values():
                r_pos = any(p in r for p in phrases)
                h_pos = any(p in h for p in phrases)
                total += 1
                agree += int(r_pos == h_pos)
            per_sample.append(agree / total)
        return float(np.mean(per_sample)) if per_sample else 0.0, per_sample
