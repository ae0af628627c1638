"""CheXbert: torch->Flax conversion parity + F1 metric contract.

Validates the VERDICT round-1 gap: F1CheXbert must run real inference. A
random-init torch ``BertLabeler`` (transformers BertModel + 13x4 + 1x2 linear
heads, exactly the f1chexbert architecture) is converted with
``convert_chexbert`` and must reproduce all 14 heads' logits; the metric dict
must match the ``f1chexbert`` pip contract used at reference scores.py:115-123.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vilmedic_tpu.blocks.transformer import TransformerConfig
from vilmedic_tpu.scorers.chexbert import (
    CONDITIONS, TOP5, TOP5_INDEX, CheXbert, CheXbertModule, F1CheXbertImpl,
    convert_chexbert,
)

VOCAB, HIDDEN, LAYERS, HEADS, INTER, MAXPOS = 99, 32, 2, 4, 64, 64


def _torch_chexbert():
    import torch
    from transformers import BertConfig, BertModel

    class BertLabeler(torch.nn.Module):
        def __init__(self):
            super().__init__()
            config = BertConfig(
                vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
                num_attention_heads=HEADS, intermediate_size=INTER,
                max_position_embeddings=MAXPOS,
            )
            self.bert = BertModel(config)
            self.dropout = torch.nn.Dropout(0.1)
            hidden_size = self.bert.pooler.dense.in_features
            self.linear_heads = torch.nn.ModuleList(
                [torch.nn.Linear(hidden_size, 4, bias=True) for _ in range(13)]
            )
            self.linear_heads.append(torch.nn.Linear(hidden_size, 2, bias=True))

        def forward(self, ids, mask):
            out = self.bert(input_ids=ids, attention_mask=mask).last_hidden_state
            cls = self.dropout(out[:, 0, :])
            return [head(cls) for head in self.linear_heads]

    torch.manual_seed(0)
    return BertLabeler().eval()


@pytest.fixture(scope="module")
def converted():
    import torch

    model = _torch_chexbert()
    # the shipped chexbert.pth is DataParallel-saved: "module."-prefixed
    sd = {f"module.{k}": v.numpy() for k, v in model.state_dict().items()}
    params = convert_chexbert(sd)
    cfg = TransformerConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAXPOS,
    )
    return model, params, cfg


def test_converted_logits_match_torch(converted):
    import torch

    model, params, cfg = converted
    rng = np.random.default_rng(0)
    ids = rng.integers(1, VOCAB, (3, 17))
    mask = np.ones((3, 17), np.int64)
    mask[1, 12:] = 0
    mask[2, 5:] = 0
    ids = ids * mask  # pad ids where masked

    with torch.no_grad():
        torch_logits = model(torch.from_numpy(ids), torch.from_numpy(mask))

    module = CheXbertModule(cfg)
    flax_logits = module.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    assert len(flax_logits) == 14
    for i, (tl, fl) in enumerate(zip(torch_logits, flax_logits)):
        np.testing.assert_allclose(
            np.asarray(fl), tl.numpy(), atol=1e-4, rtol=1e-4,
            err_msg=f"head {i}",
        )
    # padded 4-wide argmax path agrees with per-head argmax
    classes = module.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        method=CheXbertModule.predict_classes,
    )
    per_head = np.stack([np.asarray(l).argmax(-1) for l in flax_logits], axis=1)
    np.testing.assert_array_equal(np.asarray(classes), per_head)


class _FixedVocabTokenizer:
    """Minimal BertTokenizer stand-in: whitespace split, fixed word->id map."""

    def __init__(self, vocab):
        self.vocab = vocab

    def encode(self, text, max_length=512, truncation=True):
        ids = [2] + [self.vocab.get(w, 1) for w in text.lower().split()][: max_length - 2] + [3]
        return ids


def test_chexbert_labeler_batched_inference(converted):
    _, params, cfg = converted
    vocab = {w: i + 4 for i, w in enumerate("the lungs are clear cardiomegaly effusion seen".split())}
    labeler = CheXbert(params=params, config=cfg,
                       tokenizer=_FixedVocabTokenizer(vocab), batch_size=4)
    reports = [
        "the lungs are clear",
        "cardiomegaly seen",
        "effusion",
        "the lungs are clear cardiomegaly effusion seen " * 8,  # longer bucket
        "clear",
    ]
    classes = labeler.predict_classes(reports)
    assert classes.shape == (5, 14)
    assert classes[:, 13].max() <= 1  # "No Finding" head is 2-way
    # order-stability: batching sorts by length internally but output order holds
    single = np.stack([labeler.predict_classes([r])[0] for r in reports])
    np.testing.assert_array_equal(classes, single)

    # label mapping (f1chexbert get_label semantics)
    rrg = labeler.get_labels(reports, mode="rrg")
    cls_mode = labeler.get_labels(reports, mode="classification")
    for row_rrg, row_cls, row_raw in zip(rrg, cls_mode, classes):
        for b, c, raw in zip(row_rrg, row_cls, row_raw):
            assert b == (1 if raw == 1 else 0)
            assert c == {0: "", 1: 1, 2: 0, 3: -1}[int(raw)]


class _FakeLabeler:
    def __init__(self, table):
        self.table = table

    def get_labels(self, reports, mode="rrg"):
        return [self.table[r] for r in reports]


def test_f1chexbert_metric_contract(tmp_path):
    refs = ["r0", "r1", "r2"]
    hyps = ["h0", "h1", "h2"]
    zeros = [0] * 14

    def vec(**positives):
        v = list(zeros)
        for name in positives:
            v[CONDITIONS.index(name.replace("_", " "))] = 1
        return v

    table = {
        "r0": vec(Cardiomegaly=1, Edema=1),
        "h0": vec(Cardiomegaly=1),                      # partial match
        "r1": vec(Consolidation=1),
        "h1": vec(Consolidation=1),                     # exact match
        "r2": vec(Atelectasis=1, Pneumonia=1),
        "h2": vec(Edema=1),                             # miss
    }
    metric = F1CheXbertImpl(labeler=_FakeLabeler(table))
    accuracy, pe_accuracy, cr_all, cr_5 = metric(hyps, refs)

    from sklearn.metrics import classification_report

    refs_arr = np.array([table[r] for r in refs])
    hyps_arr = np.array([table[h] for h in hyps])
    expected_all = classification_report(
        refs_arr, hyps_arr, target_names=CONDITIONS, output_dict=True, zero_division=0)
    expected_5 = classification_report(
        refs_arr[:, TOP5_INDEX], hyps_arr[:, TOP5_INDEX], target_names=TOP5,
        output_dict=True, zero_division=0)

    assert cr_all["micro avg"]["f1-score"] == expected_all["micro avg"]["f1-score"]
    assert cr_all["macro avg"]["f1-score"] == expected_all["macro avg"]["f1-score"]
    assert cr_5["micro avg"]["f1-score"] == expected_5["micro avg"]["f1-score"]
    assert cr_5["macro avg"]["f1-score"] == expected_5["macro avg"]["f1-score"]
    # exact-match accuracy over the top-5 slice: r1/h1 only
    assert accuracy == pytest.approx(1 / 3)
    np.testing.assert_array_equal(pe_accuracy, [0.0, 1.0, 0.0])

    # dump files round-trip (reference F1CheXbert refs_filename caching)
    refs_file = tmp_path / "refs.chexbert.txt"
    m2 = F1CheXbertImpl(refs_filename=str(refs_file), labeler=_FakeLabeler(table))
    a2, _, _, _ = m2(hyps, refs)
    assert refs_file.exists() and a2 == accuracy
    # second call reads the cached refs file instead of re-labeling
    m3 = F1CheXbertImpl(refs_filename=str(refs_file),
                        labeler=_FakeLabeler({h: table[h] for h in hyps}))
    a3, _, _, _ = m3(hyps, refs)
    assert a3 == accuracy


def test_scores_dispatch_isolates_missing_weights(tmp_path, monkeypatch):
    """Without weights, the chexbert metric degrades to None (scores.py
    error isolation), never crashing the run."""
    monkeypatch.delenv("CHEXBERT_PTH", raising=False)
    monkeypatch.delenv("VILMEDIC_TPU_CACHE", raising=False)
    from vilmedic_tpu.scorers.scores import compute_scores

    scores = compute_scores(
        metrics=["chexbert"], refs=["no acute disease"], hyps=["clear lungs"],
        split="test", seed=0, config=None, epoch=0, logger=None, dump=False,
    )
    assert set(v for k, v in scores.items() if "chexbert" in k) == {None}
