"""ROUGE wrappers over the ``rouge_score`` package (stemmer on).

Parity with reference vilmedic/blocks/scorers/NLG/rouge/rouge.py:7-37:
``Rouge(rouges)(refs, hyps) -> (mean_f1, [per-sample f1])``.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from rouge_score import rouge_scorer

from ...registry import register


@register("scorer", "Rouge")
class Rouge:
    def __init__(self, rouges, **kwargs):
        rouges = [r.replace("rougel", "rougeL") for r in rouges]
        self.scorer = rouge_scorer.RougeScorer(rouges, use_stemmer=True)
        self.rouges = rouges

    def __call__(self, refs: List[str], hyps: List[str]) -> Tuple[float, List[float]]:
        if len(refs) != len(hyps):
            raise ValueError(
                f"refs and hyps must be the same length, got {len(refs)} refs "
                f"vs {len(hyps)} hyps"
            )
        scores = [self.scorer.score(r, h) for r, h in zip(refs, hyps)]
        f1 = [s[self.rouges[0]].fmeasure for s in scores]
        return float(np.mean(f1)), f1


@register("scorer", "Rouge1")
class Rouge1(Rouge):
    def __init__(self, **kwargs):
        super().__init__(rouges=["rouge1"])


@register("scorer", "Rouge2")
class Rouge2(Rouge):
    def __init__(self, **kwargs):
        super().__init__(rouges=["rouge2"])


@register("scorer", "RougeL")
class RougeL(Rouge):
    def __init__(self, **kwargs):
        super().__init__(rouges=["rougeL"])
