"""METEOR 1.5: alignment metric with exact/stem/synonym/paraphrase matchers.

The reference drives the METEOR 1.5 Java jar over a subprocess pipe
(reference vilmedic/blocks/scorers/NLG/meteor/meteor.py:29-126, cmd ``-l en
-norm``); the jar binaries are stripped from the snapshot. This is a
self-contained implementation of the METEOR 1.5 algorithm (Denkowski & Lavie
2014) with the full matcher cascade and weighted scoring:

- matcher stages with 1.5's English weights: exact 1.0, stem 0.6,
  synonym 0.8, paraphrase 0.6;
- content/function word discounting (delta) with a built-in English
  function-word list (the jar ships ``function.words``);
- parameters: alpha=0.85, beta=0.2, gamma=0.6, delta=0.75 (the 1.5 English
  defaults), fragmentation penalty ``gamma * (chunks/m) ** beta``.

Synonym data: nltk WordNet when its corpus is installed, else a user-supplied
synset file (``METEOR_SYNONYMS``: one tab-separated synonym group per line).
Paraphrase data: ``METEOR_PARAPHRASE`` (lines ``phrase1 ||| phrase2``, the
format of the jar's ``paraphrase-en.gz``). Without these resources the
corresponding stages are inert and scores fall back to exact+stem — the same
degradation the jar has when run with ``-m 'exact stem'``.

Call contract parity: ``Meteor()(refs, hyps) -> (corpus_mean, [per-sample])``.
"""

from __future__ import annotations

import gzip
import os
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np
from nltk.stem import porter

from ...registry import register

ALPHA = 0.85
BETA = 0.2
GAMMA = 0.6
DELTA = 0.75
STAGE_WEIGHTS = (1.0, 0.6, 0.8, 0.6)  # exact, stem, synonym, paraphrase

_STEMMER = porter.PorterStemmer()

# compact English function-word list (the jar ships data/function.words)
FUNCTION_WORDS = frozenset("""
a an the this that these those some any each every no all both either neither
i you he she it we they me him her us them my your his its our their mine
yours hers ours theirs myself yourself himself herself itself ourselves
themselves who whom whose which what
am is are was were be been being have has had having do does did doing will
would shall should may might must can could
and or but nor so yet for if then than because although though while whereas
unless until since when where why how as
at by in of on to up off out over under with without within into onto from
about above across after against along among around before behind below
beneath beside between beyond during except inside near outside through
toward towards upon
not only also very too just there here
""".split())


def _load_synonyms() -> Optional[Dict[str, Set[str]]]:
    path = os.environ.get("METEOR_SYNONYMS")
    if path and os.path.exists(path):
        table: Dict[str, Set[str]] = {}
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as f:
            for line in f:
                group = line.strip().lower().split("\t")
                if len(group) < 2:
                    continue
                for w in group:
                    table.setdefault(w, set()).update(group)
        return table
    return None


def _wordnet_or_none():
    try:
        from nltk.corpus import wordnet

        wordnet.synsets("dog")  # raises LookupError when the corpus is absent
        return wordnet
    except Exception:
        return None


def _load_paraphrases() -> Optional[Dict[Tuple[str, ...], Set[Tuple[str, ...]]]]:
    path = os.environ.get("METEOR_PARAPHRASE")
    if path and os.path.exists(path):
        table: Dict[Tuple[str, ...], Set[Tuple[str, ...]]] = {}
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as f:
            for line in f:
                parts = [p.strip() for p in line.lower().split("|||")]
                if len(parts) < 2 or not parts[0] or not parts[1]:
                    continue
                a, b = tuple(parts[0].split()), tuple(parts[1].split())
                table.setdefault(a, set()).add(b)
                table.setdefault(b, set()).add(a)
        return table
    return None


class _Matchers:
    """Lazily-built shared synonym/paraphrase resources."""

    _instance = None

    def __init__(self):
        self.synonyms = _load_synonyms()
        self.wordnet = None if self.synonyms is not None else _wordnet_or_none()
        self.paraphrases = _load_paraphrases()

    @classmethod
    def get(cls) -> "_Matchers":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def are_synonyms(self, a: str, b: str) -> bool:
        if a == b:
            return True
        if self.synonyms is not None:
            return b in self.synonyms.get(a, ())
        if self.wordnet is not None:
            sa = {l.name() for s in self.wordnet.synsets(a) for l in s.lemmas()}
            return b in sa
        return False

    @property
    def has_synonyms(self) -> bool:
        return self.synonyms is not None or self.wordnet is not None


def _match_stage(hyp_items, ref_items, predicate):
    """First-come pairing under ``predicate``; returns matches
    [(h_idx, r_idx)] and the remaining unmatched items."""
    matches = []
    ref_pool = list(ref_items)
    rest_hyp = []
    for h_idx, h_word in hyp_items:
        found = None
        for j, (r_idx, r_word) in enumerate(ref_pool):
            if predicate(h_word, r_word):
                found = j
                break
        if found is None:
            rest_hyp.append((h_idx, h_word))
        else:
            r_idx, _ = ref_pool.pop(found)
            matches.append((h_idx, r_idx))
    return matches, rest_hyp, ref_pool


def _paraphrase_stage(hyp, ref, hyp_items, ref_items, table):
    """Greedy longest-phrase paraphrase matching over unmatched spans.

    Returns phrase matches as lists of aligned word-index pairs (each matched
    phrase contributes its word count to m and behaves as one chunk)."""
    matches = []
    hyp_free = {i for i, _ in hyp_items}
    ref_free = {i for i, _ in ref_items}
    max_len = 4
    for start in range(len(hyp)):
        for length in range(min(max_len, len(hyp) - start), 0, -1):
            span = tuple(range(start, start + length))
            if not all(i in hyp_free for i in span):
                continue
            phrase = tuple(hyp[i] for i in span)
            alts = table.get(phrase)
            if not alts:
                continue
            hit = None
            for r_start in range(len(ref)):
                for alt in alts:
                    r_span = tuple(range(r_start, r_start + len(alt)))
                    if (r_span and all(i in ref_free for i in r_span)
                            and tuple(ref[i] for i in r_span
                                      if i < len(ref)) == alt
                            and r_span[-1] < len(ref)):
                        hit = r_span
                        break
                if hit:
                    break
            if hit:
                pairs = list(zip(span, hit)) or [(span[0], hit[0])]
                matches.append(pairs)
                hyp_free -= set(span)
                ref_free -= set(hit)
                break
    return matches, hyp_free, ref_free


def _align(hyp: Sequence[str], ref: Sequence[str], matchers: _Matchers):
    """-> list of (h_idx, r_idx, stage_weight) word-level matches."""
    hyp_items = list(enumerate(hyp))
    ref_items = list(enumerate(ref))
    out = []

    exact, hyp_items, ref_items = _match_stage(
        hyp_items, ref_items, lambda a, b: a == b
    )
    out += [(h, r, STAGE_WEIGHTS[0]) for h, r in exact]

    stem, hyp_items, ref_items = _match_stage(
        hyp_items, ref_items, lambda a, b: _STEMMER.stem(a) == _STEMMER.stem(b)
    )
    out += [(h, r, STAGE_WEIGHTS[1]) for h, r in stem]

    if matchers.has_synonyms:
        syn, hyp_items, ref_items = _match_stage(
            hyp_items, ref_items, matchers.are_synonyms
        )
        out += [(h, r, STAGE_WEIGHTS[2]) for h, r in syn]

    if matchers.paraphrases is not None:
        phrase_matches, _, _ = _paraphrase_stage(
            list(hyp), list(ref), hyp_items, ref_items, matchers.paraphrases
        )
        for pairs in phrase_matches:
            out += [(h, r, STAGE_WEIGHTS[3]) for h, r in pairs]

    return sorted(out)


def _count_chunks(matches) -> int:
    if not matches:
        return 0
    chunks = 1
    for (h0, r0, _), (h1, r1, _) in zip(matches, matches[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            chunks += 1
    return chunks


def _weighted_len(words: Sequence[str]) -> float:
    """delta-weighted token count: content words delta, function words 1-delta."""
    return sum(DELTA if w not in FUNCTION_WORDS else (1 - DELTA) for w in words)


def single_meteor_score(ref: Sequence[str], hyp: Sequence[str],
                        matchers: Optional[_Matchers] = None) -> float:
    """METEOR 1.5 sentence score (weighted stages + function-word discount)."""
    matchers = matchers or _Matchers.get()
    matches = _align(hyp, ref, matchers)
    m = len(matches)
    if m == 0 or not hyp or not ref:
        return 0.0

    def weighted_matches(side):
        total = 0.0
        for h, r, w in matches:
            word = hyp[h] if side == "h" else ref[r]
            total += w * (DELTA if word not in FUNCTION_WORDS else (1 - DELTA))
        return total

    precision = weighted_matches("h") / max(_weighted_len(hyp), 1e-9)
    recall = weighted_matches("r") / max(_weighted_len(ref), 1e-9)
    if precision <= 0 or recall <= 0:
        return 0.0
    fmean = (precision * recall) / (ALPHA * precision + (1 - ALPHA) * recall)
    chunks = _count_chunks(matches)
    frag = chunks / m
    penalty = GAMMA * frag ** BETA if chunks > 1 else 0.0
    return (1 - penalty) * fmean


@register("scorer", "Meteor")
class Meteor:
    def __init__(self, **kwargs):
        self.matchers = _Matchers.get()

    def __call__(self, refs: List[str], hyps: List[str]) -> Tuple[float, List[float]]:
        scores = []
        for ref, hyp in zip(refs, hyps):
            ref_list = ref if isinstance(ref, list) else [ref]
            hyp_tokens = hyp.lower().split()
            scores.append(
                max(single_meteor_score(r.lower().split(), hyp_tokens,
                                        self.matchers)
                    for r in ref_list)
            )
        return float(np.mean(scores)) if scores else 0.0, scores

    def method(self):
        return "METEOR"
