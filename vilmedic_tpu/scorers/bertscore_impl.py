"""BERTScore greedy-matching implementation over a locally cached HF encoder.

Replaces the ``bert_score`` pip package the reference wraps
(reference NLG/bertscore/bertscore.py:6-28): token embeddings from a chosen
layer, pairwise cosine similarity, greedy max matching; P = mean over hypothesis
tokens of best match, R = mean over reference tokens, F1 = harmonic mean.
Runs on CPU torch (weights must already be in the HF cache — zero egress).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def bert_score_f1(
    model_type: str,
    refs: List[str],
    hyps: List[str],
    layer: Optional[int] = None,
    batch_size: int = 16,
) -> List[float]:
    import torch
    from transformers import AutoModel, AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_type, local_files_only=True)
    model = AutoModel.from_pretrained(
        model_type, local_files_only=True, output_hidden_states=True
    )
    model.eval()

    def embed(sentences):
        out = []
        for start in range(0, len(sentences), batch_size):
            chunk = sentences[start: start + batch_size]
            enc = tokenizer(chunk, return_tensors="pt", padding=True, truncation=True)
            with torch.no_grad():
                hidden = model(**enc).hidden_states
            h = hidden[layer] if layer is not None else hidden[-1]
            h = torch.nn.functional.normalize(h, dim=-1)
            for i in range(len(chunk)):
                mask = enc["attention_mask"][i].bool()
                out.append(h[i][mask][1:-1])  # drop [CLS]/[SEP]
        return out

    ref_embs = embed(refs)
    hyp_embs = embed(hyps)

    scores = []
    for r, h in zip(ref_embs, hyp_embs):
        if len(r) == 0 or len(h) == 0:
            scores.append(0.0)
            continue
        sim = (h @ r.T).numpy()  # (|hyp|, |ref|)
        precision = float(np.mean(sim.max(axis=1)))
        recall = float(np.mean(sim.max(axis=0)))
        f1 = 2 * precision * recall / max(precision + recall, 1e-8)
        scores.append(f1)
    return scores
