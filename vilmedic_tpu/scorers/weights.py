"""One-directory weights provisioning for the clinical scorer stack.

``VILMEDIC_WEIGHTS_DIR`` points at a single directory with the layout below;
every scorer resolves its weights from there unless its specific env var
overrides (explicit env > weights-dir entry > caller/default). This replaces
the reference's per-scorer network downloads
(e.g. RadEntityNLI.py:17-40 StanfordAIMI/RRG_scorers, f1chexbert pip's
chexbert.pth fetch) with an air-gapped convention — see
``docs/weights.md`` for exactly which file goes where and
``tests/test_golden_weights.py`` for the one-command validation run.

Layout (entries are optional; a scorer whose entry is absent raises its
normal ScorerUnavailable and is error-isolated by compute_scores)::

    $VILMEDIC_WEIGHTS_DIR/
      chexbert/chexbert.pth        CheXbert classifier checkpoint
      chexbert/vocab.txt           bert-base-uncased vocab file
      radnli/model_medrad_19k.pth  BERTNLI checkpoint (StanfordAIMI/RRG_scorers)
      radnli/vocab.txt             bert-base-uncased vocab file
      radner/                      HF BertForTokenClassification dir (radiology NER)
      bertscore/model/             HF dir for the BERTScore encoder
      bertscore/rescale_baseline.tsv  bert_score baseline tsv (LAYER,P,R,F)
      green/                       HF causal-LM dir for the GREEN judge
"""

from __future__ import annotations

import os
from typing import Optional

#: env var -> path inside $VILMEDIC_WEIGHTS_DIR
LAYOUT = {
    "CHEXBERT_PTH": "chexbert/chexbert.pth",
    "CHEXBERT_VOCAB": "chexbert/vocab.txt",
    "RADNLI_PTH": "radnli/model_medrad_19k.pth",
    "RADNLI_VOCAB": "radnli/vocab.txt",
    "RADNER_MODEL": "radner",
    "BERTSCORE_MODEL": "bertscore/model",
    "BERTSCORE_BASELINE_TSV": "bertscore/rescale_baseline.tsv",
    "GREEN_MODEL": "green",
}


def resolve(env_key: str, default: Optional[str] = None) -> Optional[str]:
    """Explicit env var wins; else the ``VILMEDIC_WEIGHTS_DIR`` entry when it
    exists on disk; else ``default``."""
    explicit = os.environ.get(env_key)
    if explicit:
        return explicit
    root = os.environ.get("VILMEDIC_WEIGHTS_DIR")
    if root and env_key in LAYOUT:
        cand = os.path.join(root, LAYOUT[env_key])
        if os.path.exists(cand):
            return cand
    return default
