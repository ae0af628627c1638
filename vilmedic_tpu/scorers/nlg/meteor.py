"""METEOR: alignment-based metric with exact + Porter-stem matcher stages.

The reference drives the METEOR 1.5 Java jar over a subprocess pipe
(reference vilmedic/blocks/scorers/NLG/meteor/meteor.py:29-126); the jar binaries
are stripped from the snapshot and no WordNet/paraphrase data is available in
this offline environment. This is a self-contained implementation of the METEOR
algorithm (Banerjee & Lavie) with the standard parameters alpha=0.9, beta=3,
gamma=0.5 and the exact -> stem matcher cascade; it differs from the jar only in
the synonym/paraphrase stages (which require external resources).

Call contract parity: ``Meteor()(refs, hyps) -> (corpus_mean, [per-sample])``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from nltk.stem import porter

from ...registry import register

ALPHA = 0.9
BETA = 3.0
GAMMA = 0.5

_STEMMER = porter.PorterStemmer()


def _match_stage(hyp_items, ref_items, key):
    """First-come pairing of equal keys; returns matches [(h_idx, r_idx)] and
    the remaining unmatched items (nltk _match_enums semantics)."""
    matches = []
    ref_pool = list(ref_items)
    rest_hyp = []
    for h_idx, h_word in hyp_items:
        found = None
        for j, (r_idx, r_word) in enumerate(ref_pool):
            if key(h_word) == key(r_word):
                found = j
                break
        if found is None:
            rest_hyp.append((h_idx, h_word))
        else:
            r_idx, _ = ref_pool.pop(found)
            matches.append((h_idx, r_idx))
    return matches, rest_hyp, ref_pool


def _align(hyp: Sequence[str], ref: Sequence[str]):
    hyp_items = list(enumerate(hyp))
    ref_items = list(enumerate(ref))
    exact, hyp_items, ref_items = _match_stage(hyp_items, ref_items, lambda w: w)
    stemmed, _, _ = _match_stage(hyp_items, ref_items, _STEMMER.stem)
    return sorted(exact + stemmed)


def _count_chunks(matches) -> int:
    if not matches:
        return 0
    chunks = 1
    for (h0, r0), (h1, r1) in zip(matches, matches[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            chunks += 1
    return chunks


def single_meteor_score(ref: Sequence[str], hyp: Sequence[str]) -> float:
    matches = _align(hyp, ref)
    m = len(matches)
    if m == 0:
        return 0.0
    precision = m / len(hyp)
    recall = m / len(ref)
    fmean = (precision * recall) / (ALPHA * precision + (1 - ALPHA) * recall)
    chunks = _count_chunks(matches)
    frag = chunks / m
    penalty = GAMMA * frag ** BETA
    return (1 - penalty) * fmean


@register("scorer", "Meteor")
class Meteor:
    def __init__(self, **kwargs):
        pass

    def __call__(self, refs: List[str], hyps: List[str]) -> Tuple[float, List[float]]:
        scores = []
        for ref, hyp in zip(refs, hyps):
            ref_list = ref if isinstance(ref, list) else [ref]
            hyp_tokens = hyp.split()
            scores.append(
                max(single_meteor_score(r.split(), hyp_tokens) for r in ref_list)
            )
        return float(np.mean(scores)) if scores else 0.0, scores

    def method(self):
        return "METEOR"
