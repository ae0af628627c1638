"""BERTScore fidelity: idf weighting, layer selection, baseline rescaling
(VERDICT r1 gap #5 — reference NLG/bertscore/bertscore.py:10-19 uses
distilbert layer 5, idf=False, rescale_with_baseline=True)."""

import math

import numpy as np
import pytest

from vilmedic_tpu.scorers.bertscore_impl import (
    bert_score_prf, compute_idf_dict,
)


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    d = tmp_path_factory.mktemp("tiny_bert")
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "lungs", "are",
             "clear", "cardiomegaly", "effusion", "no", "acute", "disease",
             "edema", "mild"]
    (d / "vocab.txt").write_text("\n".join(words))
    tok = BertTokenizer(vocab_file=str(d / "vocab.txt"))
    tok.save_pretrained(d)
    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=len(words), hidden_size=16, num_hidden_layers=3,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=32)
    BertModel(cfg).save_pretrained(d)
    return str(d)


REFS = ["the lungs are clear", "mild cardiomegaly no effusion"]
HYPS = ["lungs are clear no disease", "cardiomegaly with effusion"]


def test_idf_dict_formula(tiny_model_dir):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tiny_model_dir, local_files_only=True)
    idf = compute_idf_dict(REFS, tok)
    n = len(REFS)
    the_id = tok.convert_tokens_to_ids("the")  # appears in 1 of 2 refs
    assert idf[the_id] == pytest.approx(math.log((n + 1) / 2))
    assert idf[tok.cls_token_id] == 0.0 and idf[tok.sep_token_id] == 0.0


def test_rescale_and_idf_paths(tiny_model_dir):
    raw_p, raw_r, raw_f = bert_score_prf(
        tiny_model_dir, REFS, HYPS, rescale_with_baseline=False
    )
    # explicit baseline: exact affine transform per component
    b = (0.3, 0.4, 0.5)
    rp, rr, rf = bert_score_prf(
        tiny_model_dir, REFS, HYPS, rescale_with_baseline=True, baselines=b
    )
    np.testing.assert_allclose(rp, [(p - 0.3) / 0.7 for p in raw_p], rtol=1e-6)
    np.testing.assert_allclose(rr, [(r - 0.4) / 0.6 for r in raw_r], rtol=1e-6)
    np.testing.assert_allclose(rf, [(f - 0.5) / 0.5 for f in raw_f], rtol=1e-6)

    # idf reweights: scores change but stay in [-1, 1]
    ip, ir, if_ = bert_score_prf(
        tiny_model_dir, REFS, HYPS, idf=True, rescale_with_baseline=False
    )
    assert ip != raw_p and all(-1.0 <= x <= 1.0 for x in ip + ir + if_)

    # no baseline resolvable -> warning path returns raw scores unchanged
    up, ur, uf = bert_score_prf(
        tiny_model_dir, REFS, HYPS, rescale_with_baseline=True
    )
    np.testing.assert_allclose(uf, raw_f, rtol=1e-6)

    # layer selection changes the embedding space
    l1 = bert_score_prf(tiny_model_dir, REFS, HYPS, layer=1,
                        rescale_with_baseline=False)[2]
    l3 = bert_score_prf(tiny_model_dir, REFS, HYPS, layer=3,
                        rescale_with_baseline=False)[2]
    assert l1 != l3


def test_env_baseline(tiny_model_dir, monkeypatch):
    raw_f = bert_score_prf(tiny_model_dir, REFS, HYPS,
                           rescale_with_baseline=False)[2]
    monkeypatch.setenv("BERTSCORE_BASELINE", "0.2,0.2,0.2")
    rf = bert_score_prf(tiny_model_dir, REFS, HYPS, rescale_with_baseline=True)[2]
    np.testing.assert_allclose(rf, [(f - 0.2) / 0.8 for f in raw_f], rtol=1e-6)


def test_identical_pair_scores_highest(tiny_model_dir):
    p, r, f = bert_score_prf(
        tiny_model_dir, ["the lungs are clear"], ["the lungs are clear"],
        rescale_with_baseline=False,
    )
    assert f[0] == pytest.approx(1.0, abs=1e-5)
