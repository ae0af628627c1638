"""BERT NLI pair classifier + RadEntity scorers.

TPU-native replacements for the reference stack:
- ``RadEntityMatchExact`` (reference RadEntityMatchExact.py:12-59): stanza
  radiology NER -> exact entity precision/recall/F1. Here entities come from
  :class:`~.ner.RadNER`; the match arithmetic is ported verbatim — including
  the upstream quirk that recall's numerator iterates hypothesis entities
  (``match_r`` == ``match_p``, RadEntityMatchExact.py:41), reproduced for
  score parity with the published self-check (0.7 on the 2-pair toy).
- ``RadEntityNLI`` (reference RadEntityNLI/RadEntityNLI.py:17-128): entity
  match gated per-sentence by an NLI verdict against the BERTScore-aligned
  opposite-report sentence. The NLI model is the reference's BERTNLI
  (BERT + 3-way linear over the pooled [CLS], labels entailment/neutral/
  contradiction, BERTNLI.py:22-36) in Flax, with a torch-checkpoint converter.
"""

from __future__ import annotations

import os
from itertools import chain, product
from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..blocks.transformer import EncoderLayer, TransformerConfig
from ..ops.attention import make_attention_bias
from .chexbert import BertEmbeddings

LABEL_ENTAILMENT, LABEL_NEUTRAL, LABEL_CONTRADICTION = 0, 1, 2
NLI_LABELS = ["entailment", "neutral", "contradiction"]


class BertPairClassifier(nn.Module):
    """BERT + pooler (dense+tanh over [CLS]) + linear head — BERTNLI layout."""

    config: TransformerConfig
    num_labels: int = 3

    def setup(self):
        cfg = self.config
        self.embeddings = BertEmbeddings(cfg, name="embeddings")
        self.layers = [EncoderLayer(cfg, name=f"layer_{i}")
                       for i in range(cfg.num_hidden_layers)]
        self.pooler = nn.Dense(cfg.hidden_size, param_dtype=jnp.float32,
                               dtype=cfg.dtype, name="pooler")
        self.classifier = nn.Dense(self.num_labels, param_dtype=jnp.float32,
                                   dtype=cfg.dtype, name="classifier")

    def __call__(self, input_ids, attention_mask, token_type_ids):
        t = input_ids.shape[1]
        h = self.embeddings(input_ids, token_type_ids=token_type_ids,
                            deterministic=True)
        bias = make_attention_bias(key_mask=attention_mask, query_len=t, key_len=t)
        for layer in self.layers:
            h = layer(h, bias, True)
        pooled = jnp.tanh(self.pooler(h[:, 0, :]))
        return self.classifier(pooled).astype(jnp.float32)


def convert_bertnli(state_dict: Dict) -> Dict:
    """Torch BERTNLI (``bert.* + linear.*``) -> Flax params."""
    from ..zoo.convert import (
        _a, _embeddings_general, _find_base_prefix, _layer_params, _num_layers, _t,
    )

    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in state_dict.items()}
    base = _find_base_prefix(sd)  # "bert."
    params: Dict = {
        "embeddings": _embeddings_general(sd, f"{base}embeddings.", 0, keep_token_type=True)
    }
    for i in range(_num_layers(sd, f"{base}encoder.layer.")):
        params[f"layer_{i}"] = _layer_params(sd, f"{base}encoder.layer.{i}")
    params["pooler"] = {"kernel": _t(sd[f"{base}pooler.dense.weight"]),
                        "bias": _a(sd[f"{base}pooler.dense.bias"])}
    head = "linear" if "linear.weight" in sd else "classifier"
    params["classifier"] = {"kernel": _t(sd[f"{head}.weight"]),
                            "bias": _a(sd[f"{head}.bias"])}
    return params


class NLIPredictor:
    """Batched pair -> label prediction ([CLS] s1 [SEP] s2 [SEP] with segment
    ids, BERTNLI.py:66-91)."""

    def __init__(self, params=None, config=None, tokenizer=None,
                 max_len: int = 128, batch_size: int = 24):
        from .clinical import ScorerUnavailable

        self.max_len = max_len
        self.batch_size = batch_size
        if params is None:
            from .weights import resolve

            pth = resolve("RADNLI_PTH")
            if not pth or not os.path.exists(pth):
                raise ScorerUnavailable(
                    "NLI weights unavailable: set RADNLI_PTH to a BERTNLI "
                    "torch checkpoint (model_medrad_19k)"
                )
            import torch

            sd = torch.load(pth, map_location="cpu", weights_only=False)
            if isinstance(sd, dict) and "model_state_dict" in sd:
                sd = sd["model_state_dict"]
            sd = {k: np.asarray(v) for k, v in sd.items()}
            params = convert_bertnli(sd)
            emb = params["embeddings"]
            config = TransformerConfig(
                vocab_size=emb["word_embeddings"]["embedding"].shape[0],
                hidden_size=emb["word_embeddings"]["embedding"].shape[1],
                num_hidden_layers=sum(1 for k in params if k.startswith("layer_")),
                num_attention_heads=max(
                    1, emb["word_embeddings"]["embedding"].shape[1] // 64
                ),
                intermediate_size=params["layer_0"]["ffn"]["fc1"]["kernel"].shape[1],
                max_position_embeddings=emb["position_embeddings"]["embedding"].shape[0],
            )
        if tokenizer is None:
            from transformers import BertTokenizer

            from .weights import resolve

            vocab = resolve("RADNLI_VOCAB", resolve("CHEXBERT_VOCAB"))
            try:
                if vocab and os.path.exists(vocab):
                    tokenizer = BertTokenizer(vocab_file=vocab)
                else:
                    tokenizer = BertTokenizer.from_pretrained(
                        "bert-base-uncased", local_files_only=True
                    )
            except Exception as e:  # pragma: no cover - env-dependent
                from .clinical import ScorerUnavailable

                raise ScorerUnavailable(f"NLI tokenizer unavailable: {e}")
        self.tokenizer = tokenizer
        self.module = BertPairClassifier(config)
        self.params = jax.device_put(params)
        self._predict = jax.jit(
            lambda p, ids, mask, seg: jnp.argmax(
                self.module.apply({"params": p}, ids, mask, seg), axis=-1
            )
        )

    def predict(self, premises: List[str], hypotheses: List[str]) -> List[str]:
        enc = []
        for s1, s2 in zip(premises, hypotheses):
            t1 = self.tokenizer.encode(s1, add_special_tokens=False)
            t2 = self.tokenizer.encode(s2, add_special_tokens=False)
            ids = ([self.tokenizer.cls_token_id] + t1 +
                   [self.tokenizer.sep_token_id] + t2 +
                   [self.tokenizer.sep_token_id])[: self.max_len]
            seg = ([0] * (len(t1) + 2) + [1] * (len(t2) + 1))[: self.max_len]
            enc.append((ids, seg))
        labels = []
        bs = self.batch_size
        for start in range(0, len(enc), bs):
            chunk = enc[start: start + bs]
            t = max(len(c[0]) for c in chunk)
            ids = np.zeros((len(chunk), t), np.int32)
            mask = np.zeros((len(chunk), t), np.int32)
            seg = np.zeros((len(chunk), t), np.int32)
            for j, (c, sg) in enumerate(chunk):
                ids[j, : len(c)] = c
                mask[j, : len(c)] = 1
                seg[j, : len(sg)] = sg
            pred = np.asarray(self._predict(self.params, ids, mask, seg))
            labels.extend(NLI_LABELS[int(p)] for p in pred[: len(chunk)])
        return labels


TARGET_SUBSTRINGS = ("ANAT", "OBS")  # stanza S-ANATOMY/S-OBSERVATION, radgraph ANAT-/OBS-


def _target_entities(sentence: Dict) -> List[str]:
    return [text for text, label in sentence["entities"]
            if any(t in label.upper() for t in TARGET_SUBSTRINGS)]


class RadEntityMatchExactImpl:
    """Exact entity match (reference RadEntityMatchExact.py:19-50 arithmetic,
    incl. the upstream recall-numerator quirk)."""

    def __init__(self, ner=None, **kwargs):
        if ner is None:
            from .ner import RadNER

            ner = RadNER()
        self.ner = ner

    def __call__(self, refs: List[str], hyps: List[str]):
        docs_h = self.ner.extract(list(hyps))
        docs_r = self.ner.extract(list(refs))
        scores_e = []
        for doc_h, doc_r in zip(docs_h, docs_r):
            ner_h = list(chain.from_iterable(_target_entities(s) for s in doc_h))
            ner_r = list(chain.from_iterable(_target_entities(s) for s in doc_r))
            match_p = sum(1.0 for e in ner_h if e in ner_r)
            pr_e = match_p / len(ner_h) if ner_h else 0.0
            # upstream quirk reproduced: recall numerator also iterates ner_h
            match_r = sum(1.0 for e in ner_h if e in ner_r)
            rc_e = match_r / len(ner_r) if ner_r else 0.0
            score = (2 * pr_e * rc_e / (pr_e + rc_e)
                     if pr_e > 0.0 and rc_e > 0.0 else 0.0)
            scores_e.append(score)
        return float(np.mean(scores_e)) if scores_e else 0.0, scores_e, docs_h, docs_r


class RadEntityNLIImpl:
    """Entity match gated by NLI (reference RadEntityNLI.py:48-128)."""

    def __init__(self, ner=None, nli=None, sentence_scorer=None,
                 bertscore_model: Optional[str] = None, **kwargs):
        self.match_exact = RadEntityMatchExactImpl(ner=ner)
        self.nli = nli if nli is not None else NLIPredictor()
        if sentence_scorer is None:
            from .weights import resolve

            model = bertscore_model or resolve(
                "BERTSCORE_MODEL", "distilbert-base-uncased"
            )

            def sentence_scorer(cands, refs):
                from .bertscore_impl import bert_score_prf

                return bert_score_prf(model, refs, cands)[2]

        self.sentence_scorer = sentence_scorer

    def __call__(self, refs: List[str], hyps: List[str]):
        _, _, docs_h, docs_r = self.match_exact(refs, hyps)
        scores_e = []
        for doc_h, doc_r in zip(docs_h, docs_r):
            hyp_report = [s["text"] for s in doc_h]
            ref_report = [s["text"] for s in doc_r]
            if not hyp_report or not ref_report:
                continue
            ner_h = [_target_entities(s) for s in doc_h]
            ner_r = [_target_entities(s) for s in doc_r]

            pairs = list(product(hyp_report, ref_report))
            f = np.reshape(
                np.asarray(self.sentence_scorer([p[0] for p in pairs],
                                                [p[1] for p in pairs])),
                (len(hyp_report), len(ref_report)),
            )

            def directed(report_a, ents_a, report_b, ents_b_flat, sims):
                match = total = 0
                for sent, ents, row in zip(report_a, ents_a, sims):
                    if not ents:
                        continue
                    aligned = report_b[int(np.argmax(row))]
                    label = self.nli.predict([sent], [aligned])[0]
                    if label == "entailment":
                        match += 1
                    for e in ents:
                        total += 1
                        if label == "contradiction":
                            continue
                        if e in ents_b_flat:
                            match += 1
                return match / total if total > 0 else 0.0

            pr_e = directed(hyp_report, ner_h, ref_report,
                            list(chain.from_iterable(ner_r)), f)
            rc_e = directed(ref_report, ner_r, hyp_report,
                            list(chain.from_iterable(ner_h)), f.T)
            score = (2 * pr_e * rc_e / (pr_e + rc_e)
                     if pr_e > 0.0 and rc_e > 0.0 else 0.0)
            scores_e.append(score)
        return float(np.mean(scores_e)) if scores_e else 0.0, scores_e
