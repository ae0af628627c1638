"""BERTScore implementation over a locally cached HF encoder.

Replaces the ``bert_score`` pip package the reference wraps
(reference NLG/bertscore/bertscore.py:6-28: distilbert-base-uncased,
``num_layers=5``, ``idf=False``, ``rescale_with_baseline=True``), matching its
semantics exactly:

- token embeddings from the chosen layer, L2-normalized; pairwise cosine
  similarity; greedy max matching;
- P = (idf-weighted) mean over hypothesis tokens of the best match,
  R = over reference tokens, F1 = harmonic mean;
- **idf weighting** (off by default, as the reference configures): per-token
  ``log((N+1)/(df+1))`` document frequencies over the reference corpus, special
  tokens pinned to 0 — the exact ``bert_score`` formula;
- **baseline rescaling**: ``(s - b) / (1 - b)`` per P/R/F. Baseline constants
  resolve from (1) the caller, (2) an installed ``bert_score`` package's
  shipped tsv, (3) the ``BERTSCORE_BASELINE`` env var ("P,R,F" floats) —
  offline images carry no Common-Crawl baselines, so absent all three the raw
  score is returned with a warning (numbers then comparable to
  ``rescale_with_baseline=False`` only).

Runs on CPU torch (weights must already be in the HF cache — zero egress).
"""

from __future__ import annotations

import logging
import math
import os
from collections import Counter
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

#: reference-matching layer choice per model family (bert_score model2layers)
DEFAULT_LAYERS = {
    "distilbert-base-uncased": 5,
    "bert-base-uncased": 9,
    "roberta-large": 17,
}


def _resolve_baseline(model_type: str, layer: int) -> Optional[Tuple[float, float, float]]:
    env = os.environ.get("BERTSCORE_BASELINE")
    if env:
        p, r, f = (float(x) for x in env.split(","))
        return p, r, f

    def read_tsv(path):
        import csv

        with open(path) as fh:
            for row in csv.DictReader(fh):
                if int(row["LAYER"]) == layer:
                    return float(row["P"]), float(row["R"]), float(row["F"])
        return None

    from .weights import resolve

    tsv = resolve("BERTSCORE_BASELINE_TSV")
    if tsv and os.path.exists(tsv):
        try:
            got = read_tsv(tsv)
            if got:
                return got
        except Exception:
            pass
    try:  # installed bert_score package ships the tsv
        import bert_score

        return read_tsv(os.path.join(
            os.path.dirname(bert_score.__file__), "rescale_baseline", "en",
            f"{model_type}.tsv",
        ))
    except Exception:
        pass
    return None


def compute_idf_dict(refs: List[str], tokenizer) -> Dict[int, float]:
    """bert_score ``get_idf_dict``: smooth idf over the reference corpus."""
    n = len(refs)
    df: Counter = Counter()
    for r in refs:
        ids = set(tokenizer(r, truncation=True)["input_ids"])
        df.update(ids)
    idf = {tid: math.log((n + 1) / (c + 1)) for tid, c in df.items()}
    for special in (tokenizer.cls_token_id, tokenizer.sep_token_id,
                    tokenizer.pad_token_id):
        if special is not None:
            idf[special] = 0.0
    return idf


def bert_score_prf(
    model_type: str,
    refs: List[str],
    hyps: List[str],
    layer: Optional[int] = None,
    batch_size: int = 64,
    idf: bool = False,
    rescale_with_baseline: bool = True,
    baselines: Optional[Tuple[float, float, float]] = None,
) -> Tuple[List[float], List[float], List[float]]:
    """Per-pair (P, R, F1) lists with reference ``bert_score`` semantics."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_type, local_files_only=True)
    model = AutoModel.from_pretrained(
        model_type, local_files_only=True, output_hidden_states=True
    )
    model.eval()
    if layer is None:
        layer = DEFAULT_LAYERS.get(model_type)

    idf_dict = compute_idf_dict(refs, tokenizer) if idf else None
    # unseen-token default: bert_score uses a defaultdict with log((N+1)/1)
    idf_default = math.log(len(refs) + 1) if idf else 1.0

    def embed(sentences):
        embs, weights = [], []
        for start in range(0, len(sentences), batch_size):
            chunk = sentences[start: start + batch_size]
            enc = tokenizer(chunk, return_tensors="pt", padding=True, truncation=True)
            with torch.no_grad():
                hidden = model(**enc).hidden_states
            h = hidden[layer] if layer is not None else hidden[-1]
            h = torch.nn.functional.normalize(h, dim=-1)
            for i in range(len(chunk)):
                mask = enc["attention_mask"][i].bool()
                ids = enc["input_ids"][i][mask][1:-1].tolist()
                embs.append(h[i][mask][1:-1])  # drop [CLS]/[SEP]
                if idf_dict is not None:
                    weights.append(
                        np.array([idf_dict.get(t, idf_default) for t in ids],
                                 np.float64)
                    )
                else:
                    weights.append(np.ones((len(ids),), np.float64))
        return embs, weights

    ref_embs, ref_w = embed(refs)
    hyp_embs, hyp_w = embed(hyps)

    ps, rs, fs = [], [], []
    for r, h, rw, hw in zip(ref_embs, hyp_embs, ref_w, hyp_w):
        if len(r) == 0 or len(h) == 0:
            ps.append(0.0), rs.append(0.0), fs.append(0.0)
            continue
        sim = (h @ r.T).numpy()  # (|hyp|, |ref|)
        hw_sum = hw.sum() or 1.0
        rw_sum = rw.sum() or 1.0
        precision = float((sim.max(axis=1) * hw).sum() / hw_sum)
        recall = float((sim.max(axis=0) * rw).sum() / rw_sum)
        f1 = 2 * precision * recall / max(precision + recall, 1e-8)
        ps.append(precision), rs.append(recall), fs.append(f1)

    if rescale_with_baseline:
        base = baselines or _resolve_baseline(model_type, layer if layer is not None else -1)
        if base is None:
            logger.warning(
                f"BERTScore baseline for {model_type!r} layer {layer} "
                "unavailable (no bert_score tsv / BERTSCORE_BASELINE env); "
                "returning unrescaled scores"
            )
        else:
            bp, br, bf = base
            ps = [(p - bp) / (1 - bp) for p in ps]
            rs = [(r - br) / (1 - br) for r in rs]
            fs = [(f - bf) / (1 - bf) for f in fs]
    return ps, rs, fs


def bert_score_f1(
    model_type: str,
    refs: List[str],
    hyps: List[str],
    layer: Optional[int] = None,
    batch_size: int = 64,
    **kwargs,
) -> List[float]:
    return bert_score_prf(
        model_type, refs, hyps, layer=layer, batch_size=batch_size, **kwargs
    )[2]
