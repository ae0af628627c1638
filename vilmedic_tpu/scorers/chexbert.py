"""CheXbert labeler + F1CheXbert metric, TPU-native (Flax).

Replaces the reference's ``f1chexbert`` pip dependency (used at
reference vilmedic/blocks/scorers/scores.py:8,115-123 and
data/make_datasets/mimic_cxr/get_chexbert_label.py:6-43): a BERT-base encoder
with 14 per-condition linear heads (13 conditions x 4 classes
{blank, positive, negative, uncertain} + "No Finding" x 2 classes), applied to
the [CLS] hidden state.

TPU-first design: instead of the pip package's one-report-at-a-time
``get_label`` loop, the whole eval set is tokenized host-side, padded to a
static bucket length, and classified in one jitted batched forward — the MXU
sees (B, T, H) matmuls, and recompilation is bounded by the fixed bucket sizes.

Weight loading: ``CHEXBERT_PTH`` env var, ``$VILMEDIC_TPU_CACHE/chexbert.pth``,
or the HF cache copy of ``StanfordAIMI/RRG_scorers``'s ``chexbert.pth``. The
torch state dict (DataParallel ``module.``-prefixed, as shipped) is converted
with :func:`convert_chexbert` — the same pattern as ``zoo/convert.py``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..blocks.transformer import EncoderLayer, TransformerConfig
from ..ops.attention import make_attention_bias

CONDITIONS = [
    "Enlarged Cardiomediastinum", "Cardiomegaly", "Lung Opacity", "Lung Lesion",
    "Edema", "Consolidation", "Pneumonia", "Atelectasis", "Pneumothorax",
    "Pleural Effusion", "Pleural Other", "Fracture", "Support Devices",
    "No Finding",
]
TOP5 = ["Cardiomegaly", "Edema", "Consolidation", "Atelectasis", "Pleural Effusion"]
TOP5_INDEX = [CONDITIONS.index(c) for c in TOP5]

# Head class-count layout of the CheXbert checkpoint: 13 four-way heads
# (blank/positive/negative/uncertain) + a two-way "No Finding" head.
HEAD_CLASSES = [4] * 13 + [2]


class BertEmbeddings(nn.Module):
    """BERT embeddings incl. token-type (absent from BertGeneration blocks)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        cfg = self.config
        emb = nn.initializers.normal(cfg.initializer_range)
        t = input_ids.shape[1]
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
                        dtype=cfg.dtype, embedding_init=emb, name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       param_dtype=jnp.float32, dtype=cfg.dtype, embedding_init=emb,
                       name="position_embeddings")(jnp.arange(t)[None, :])
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(2, cfg.hidden_size, param_dtype=jnp.float32, dtype=cfg.dtype,
                       embedding_init=emb, name="token_type_embeddings")(token_type_ids)
        h = word + pos + typ
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln")(h)
        return nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)


class CheXbertModule(nn.Module):
    """BERT encoder + 14 linear heads over [CLS] (the f1chexbert ``BertLabeler``)."""

    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.embeddings = BertEmbeddings(cfg, name="embeddings")
        self.layers = [EncoderLayer(cfg, name=f"layer_{i}")
                       for i in range(cfg.num_hidden_layers)]
        self.heads = [
            nn.Dense(nc, param_dtype=jnp.float32, dtype=cfg.dtype, name=f"head_{i}")
            for i, nc in enumerate(HEAD_CLASSES)
        ]

    def __call__(self, input_ids, attention_mask, deterministic=True):
        t = input_ids.shape[1]
        h = self.embeddings(input_ids, deterministic=deterministic)
        bias = make_attention_bias(key_mask=attention_mask, query_len=t, key_len=t)
        for layer in self.layers:
            h = layer(h, bias, deterministic)
        cls = h[:, 0, :]
        # (B, 4) x13 then (B, 2): ragged head widths -> pad 2-way head to 4 with
        # -inf so one stacked (14, B, 4) argmax stays a single XLA op.
        logits = [head(cls).astype(jnp.float32) for head in self.heads]
        return logits

    def predict_classes(self, input_ids, attention_mask):
        logits = self(input_ids, attention_mask, deterministic=True)
        padded = [
            l if l.shape[-1] == 4
            else jnp.pad(l, ((0, 0), (0, 4 - l.shape[-1])), constant_values=-jnp.inf)
            for l in logits
        ]
        return jnp.argmax(jnp.stack(padded, axis=1), axis=-1)  # (B, 14)


def convert_chexbert(state_dict: Dict) -> Dict:
    """Torch CheXbert (f1chexbert ``BertLabeler``) state dict -> Flax params.

    Handles the shipped DataParallel ``module.`` prefix. Layout:
    ``bert.embeddings.*``, ``bert.encoder.layer.{i}.*`` (standard BERT layer),
    ``linear_heads.{i}.{weight,bias}``.
    """
    from ..zoo.convert import _a, _layer_params, _t

    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in state_dict.items()}
    n_layers = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith("bert.encoder.layer.")
    )
    params: Dict = {
        "embeddings": {
            "word_embeddings": {"embedding": _a(sd["bert.embeddings.word_embeddings.weight"])},
            "position_embeddings": {"embedding": _a(sd["bert.embeddings.position_embeddings.weight"])},
            "token_type_embeddings": {"embedding": _a(sd["bert.embeddings.token_type_embeddings.weight"])},
            "ln": {"scale": _a(sd["bert.embeddings.LayerNorm.weight"]),
                   "bias": _a(sd["bert.embeddings.LayerNorm.bias"])},
        }
    }
    for i in range(n_layers):
        params[f"layer_{i}"] = _layer_params(sd, f"bert.encoder.layer.{i}")
    for i in range(len(HEAD_CLASSES)):
        params[f"head_{i}"] = {"kernel": _t(sd[f"linear_heads.{i}.weight"]),
                               "bias": _a(sd[f"linear_heads.{i}.bias"])}
    return params


def _resolve_chexbert_pth() -> Optional[str]:
    from .weights import resolve

    cand = resolve("CHEXBERT_PTH")
    if cand and os.path.exists(cand):
        return cand
    cache = os.environ.get("VILMEDIC_TPU_CACHE")
    if cache:
        p = os.path.join(cache, "chexbert.pth")
        if os.path.exists(p):
            return p
    try:
        from huggingface_hub import try_to_load_from_cache

        p = try_to_load_from_cache("StanfordAIMI/RRG_scorers", "chexbert.pth")
        if isinstance(p, str) and os.path.exists(p):
            return p
    except Exception:
        pass
    return None


def _bucket_len(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class CheXbert:
    """Batched CheXbert labeler (reference get_chexbert_label.py:6 ``CheXbert``).

    Parameters are injectable for tests: pass ``params``/``config``/``tokenizer``
    to skip checkpoint resolution.
    """

    #: static sequence buckets — one XLA compilation each
    BUCKETS = (64, 128, 256, 512)

    def __init__(self, params=None, config: Optional[TransformerConfig] = None,
                 tokenizer=None, batch_size: int = 64):
        from .clinical import ScorerUnavailable

        self.batch_size = batch_size
        if params is None:
            pth = _resolve_chexbert_pth()
            if pth is None:
                raise ScorerUnavailable(
                    "CheXbert weights not found: set CHEXBERT_PTH or place "
                    "chexbert.pth under $VILMEDIC_TPU_CACHE or the HF cache of "
                    "StanfordAIMI/RRG_scorers."
                )
            import torch

            sd = torch.load(pth, map_location="cpu", weights_only=False)
            if isinstance(sd, dict) and "model_state_dict" in sd:
                sd = sd["model_state_dict"]
            sd = {k: v.numpy() for k, v in sd.items()}
            params = convert_chexbert(sd)
            if config is None:
                emb = params["embeddings"]
                vocab_size, hidden = emb["word_embeddings"]["embedding"].shape
                n_layers = sum(1 for k in params if k.startswith("layer_"))
                config = TransformerConfig(
                    vocab_size=vocab_size,
                    hidden_size=hidden,
                    num_hidden_layers=n_layers,
                    # BERT convention: 64-dim heads (12 for the real BERT-base ckpt)
                    num_attention_heads=max(1, hidden // 64),
                    intermediate_size=params["layer_0"]["ffn"]["fc1"]["kernel"].shape[1],
                    max_position_embeddings=emb["position_embeddings"]["embedding"].shape[0],
                )
        if tokenizer is None:
            from transformers import BertTokenizer

            from .weights import resolve

            vocab = resolve("CHEXBERT_VOCAB")
            try:
                if vocab and os.path.exists(vocab):
                    tokenizer = BertTokenizer(vocab_file=vocab)
                else:
                    tokenizer = BertTokenizer.from_pretrained(
                        "bert-base-uncased", local_files_only=True
                    )
            except Exception as e:  # pragma: no cover - env-dependent
                raise ScorerUnavailable(
                    "bert-base-uncased tokenizer unavailable: set CHEXBERT_VOCAB "
                    f"to a vocab.txt or cache the HF tokenizer ({e})"
                )
        self.tokenizer = tokenizer
        self.config = config or TransformerConfig()
        self.module = CheXbertModule(self.config)
        self.params = jax.device_put(params)
        self._predict = jax.jit(
            lambda p, ids, mask: self.module.apply(
                {"params": p}, ids, mask, method=CheXbertModule.predict_classes
            )
        )

    def predict_classes(self, reports: List[str]) -> np.ndarray:
        """(N, 14) raw class ids in {0 blank, 1 positive, 2 negative, 3 uncertain}
        (the "No Finding" head uses {0, 1} only)."""
        enc = [
            self.tokenizer.encode(r.strip(), max_length=self.BUCKETS[-1],
                                  truncation=True)
            for r in reports
        ]
        out = np.zeros((len(reports), len(CONDITIONS)), np.int64)
        order = np.argsort([len(e) for e in enc], kind="stable")
        bs = self.batch_size
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            chunk = [enc[i] for i in idx]
            t = _bucket_len(max(len(c) for c in chunk), self.BUCKETS)
            ids = np.zeros((bs, t), np.int32)
            mask = np.zeros((bs, t), np.int32)
            for j, c in enumerate(chunk):
                ids[j, :len(c)] = c[:t]
                mask[j, :len(c)] = 1
            pred = np.asarray(self._predict(self.params, ids, mask))
            out[idx] = pred[:len(chunk)]
        return out

    def get_label(self, report: str, mode: str = "rrg"):
        return self.get_labels([report], mode=mode)[0]

    def get_labels(self, reports: List[str], mode: str = "rrg") -> List[list]:
        """Class ids -> per-condition labels (f1chexbert ``get_label`` mapping):
        ``rrg``: binary, uncertain counts negative; ``classification``: keeps
        '' (blank) / 1 (positive) / 0 (negative) / -1 (uncertain)."""
        classes = self.predict_classes(reports)
        rows = []
        for row in classes:
            v = []
            for c in row:
                if c == 0:
                    v.append("")
                elif c == 1:
                    v.append(1)
                elif c == 2:
                    v.append(0)
                else:
                    v.append(-1)
            if mode == "rrg":
                v = [1 if (isinstance(x, int) and x > 0) else 0 for x in v]
            elif mode != "classification":
                raise NotImplementedError(mode)
            rows.append(v)
        return rows


class F1CheXbertImpl:
    """The ``f1chexbert.F1CheXbert`` metric contract
    (reference scores.py:115-123): ``__call__(hyps, refs)`` ->
    ``(accuracy, accuracy_per_sample, chexbert_all, chexbert_5)`` where the
    report dicts are sklearn ``classification_report(output_dict=True)`` trees
    keyed by condition name plus micro/macro/weighted/samples avg."""

    def __init__(self, refs_filename=None, hyps_filename=None, labeler: Optional[CheXbert] = None,
                 **kwargs):
        self.refs_filename = refs_filename
        self.hyps_filename = hyps_filename
        self.labeler = labeler if labeler is not None else CheXbert()

    def __call__(self, hyps: List[str], refs: List[str]):
        from sklearn.metrics import classification_report

        if self.refs_filename and os.path.exists(self.refs_filename):
            # cache lines are repr'd python lists (f1chexbert pip format);
            # literal_eval parses them without executing arbitrary code
            import ast

            refs_chexbert = [
                ast.literal_eval(l.strip()) for l in open(self.refs_filename)
            ]
        else:
            refs_chexbert = self.labeler.get_labels([r.strip() for r in refs])
            if self.refs_filename:
                open(self.refs_filename, "w").write(
                    "\n".join(map(str, refs_chexbert))
                )
        hyps_chexbert = self.labeler.get_labels([h.strip() for h in hyps])
        if self.hyps_filename:
            open(self.hyps_filename, "w").write("\n".join(map(str, hyps_chexbert)))

        refs_arr = np.asarray(refs_chexbert)
        hyps_arr = np.asarray(hyps_chexbert)
        refs_5 = refs_arr[:, TOP5_INDEX]
        hyps_5 = hyps_arr[:, TOP5_INDEX]

        pe_accuracy = (refs_5 == hyps_5).all(axis=1).astype(np.float64)
        accuracy = float(pe_accuracy.mean())

        cr_all = classification_report(
            refs_arr, hyps_arr, target_names=CONDITIONS, output_dict=True,
            zero_division=0,
        )
        cr_5 = classification_report(
            refs_5, hyps_5, target_names=TOP5, output_dict=True, zero_division=0,
        )
        return accuracy, pe_accuracy, cr_all, cr_5
