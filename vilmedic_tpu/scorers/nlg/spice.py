"""SPICE-equivalent scene-graph scorer.

The reference drives SPICE 1.0 through 15 bundled Java jars incl. the Stanford
SceneGraphParser (reference NLG/spice/spice.py:12-96); the jar binaries are
stripped from the snapshot (.MISSING_LARGE_BLOBS) and no Java parser stack is
reproducible offline. This module implements the SPICE *metric semantics* —
F1 over semantic-proposition tuples extracted from candidate and reference
text — with a dependency-free, lexicon-driven scene-graph extractor tuned for
radiology reports (the framework's domain):

- objects: content nouns (anything that is not a function word, attribute, or
  relation word);
- attributes: a curated modifier lexicon (severity, laterality, extent,
  appearance) attached to the following object — "small left pleural
  effusion" -> (effusion, small), (effusion, left), (effusion, pleural);
- relations: noun PREP noun patterns -> (noun1, prep, noun2);
- negation: "no X" / "without X" -> (X, absent) — clinically load-bearing in
  this domain, where the Stanford parser would attach the dependency.

Tuple matching is exact (lemma-light: trailing-s stripped), optionally widened
by the METEOR synonym table (``METEOR_SYNONYMS``) or WordNet when installed —
mirroring SPICE's WordNet synset matching.

Scores are NOT numerically comparable to the Java SPICE (different parser);
the contract, orientation, and tuple-F1 semantics match. Per-pair
``(mean_f, [per-sample])`` like the other NLG scorers.
"""

from __future__ import annotations

import re
from typing import List, Set, Tuple

import numpy as np

from ...registry import register

ATTRIBUTES = frozenset("""
mild moderate severe small large tiny massive trace minimal extensive
left right bilateral unilateral upper lower central peripheral basal apical
medial lateral anterior posterior superior inferior proximal distal
acute chronic stable unchanged new old interval prior residual recurrent
patchy diffuse focal multifocal scattered streaky linear nodular reticular
coarse fine confluent segmental lobar subsegmental perihilar subpleural
normal abnormal enlarged prominent tortuous calcified degenerative
atherosclerotic ectatic aneurysmal dilated distended collapsed atrophic
hypertrophic thickened edematous consolidative cavitary cystic solid
ground glass groundglass micronodular miliary reticulonodular
pleural pulmonary cardiac mediastinal hilar interstitial vascular osseous
hepatic renal splenic adrenal pancreatic biliary gastric duodenal colonic
bowel mesenteric retroperitoneal pelvic periportal subcapsular
vertebral thoracic lumbar cervical costal rib clavicular humeral
low high increased decreased improved worsened elevated depressed reduced
clear hazy dense lucent opaque blunted obscured sharp indistinct
hyperdense hypodense isodense hyperintense hypointense heterogeneous
homogeneous enhancing nonenhancing rim simple complex loculated free
dependent layering both multiple several few numerous single two
benign malignant metastatic suspicious indeterminate incidental
postsurgical postoperative posttraumatic healed displaced nondisplaced
compressive obstructive emphysematous bronchiectatic fibrotic cicatricial
""".split())

RELATIONS = frozenset("in of at with on within into over under near to from".split())

NEGATIONS = frozenset("no without absent".split())

FUNCTION = frozenset("""
the a an is are was were be been being there this that these those and or
it its has have had by for as than such may can could seen noted identified
present evidence suggest suggests suggesting likely
""".split())

_TOKEN = re.compile(r"[a-z]+")


def _lemma(word: str) -> str:
    if len(word) > 3 and word.endswith("s") and not word.endswith("ss"):
        return word[:-1]
    return word


def extract_tuples(text: str) -> Set[Tuple]:
    """Scene-graph propositions for one report."""
    tuples: Set[Tuple] = set()
    for sentence in re.split(r"[.!?;]", text.lower()):
        words = _TOKEN.findall(sentence)
        nouns = []  # (position, lemma)
        pending_attrs: List[str] = []
        negate = False
        for pos, w in enumerate(words):
            if w in NEGATIONS:
                negate = True
                pending_attrs = []
            elif w in ATTRIBUTES:
                pending_attrs.append(w)
            elif w in RELATIONS:
                pending_attrs = []
                negate = False  # prepositions end the negation scope
            elif w in FUNCTION:
                if w not in ("the", "a", "an", "and", "or"):
                    # determiners/conjunctions keep the attr chain and let
                    # negation distribute ("no edema or effusion")
                    pending_attrs = []
                    negate = False
            else:
                noun = _lemma(w)
                tuples.add((noun,))
                for attr in pending_attrs:
                    tuples.add((noun, attr))
                if negate:
                    tuples.add((noun, "absent"))
                nouns.append((pos, noun))
                pending_attrs = []
        # relations: noun PREP noun with the preposition between them
        for (p1, n1) in nouns:
            for (p2, n2) in nouns:
                if p1 < p2:
                    between = words[p1 + 1: p2]
                    rels = [w for w in between if w in RELATIONS]
                    if len(rels) == 1 and p2 - p1 <= 4:
                        tuples.add((n1, rels[0], n2))
    return tuples


def _synonym_lookup():
    from .meteor import _Matchers

    return _Matchers.get()


def _tuples_match(a: Tuple, b: Tuple, matchers) -> bool:
    if len(a) != len(b):
        return False
    return all(x == y or matchers.are_synonyms(x, y) for x, y in zip(a, b))


def _f1(cand: Set[Tuple], ref: Set[Tuple], matchers) -> float:
    if not cand or not ref:
        return 0.0 if cand != ref else 1.0
    if matchers.has_synonyms:
        matched_c = sum(1 for c in cand if any(_tuples_match(c, r, matchers) for r in ref))
        matched_r = sum(1 for r in ref if any(_tuples_match(r, c, matchers) for c in cand))
        p = matched_c / len(cand)
        r = matched_r / len(ref)
    else:
        inter = len(cand & ref)
        p = inter / len(cand)
        r = inter / len(ref)
    return 2 * p * r / (p + r) if p + r else 0.0


@register("scorer", "Spice")
class Spice:
    """``Spice()(refs, hyps) -> (mean_f, [per-sample f])`` (reference
    NLG/spice/spice.py contract)."""

    def __init__(self, **kwargs):
        self.matchers = _synonym_lookup()

    def __call__(self, refs: List[str], hyps: List[str]) -> Tuple[float, List[float]]:
        scores = []
        for ref, hyp in zip(refs, hyps):
            ref_list = ref if isinstance(ref, list) else [ref]
            hyp_tuples = extract_tuples(hyp)
            scores.append(max(
                _f1(hyp_tuples, extract_tuples(r), self.matchers) for r in ref_list
            ))
        return float(np.mean(scores)) if scores else 0.0, scores

    def method(self):
        return "SPICE"
