"""NLG scorer tests: BLEU/ROUGE/CIDEr-D/METEOR sanity and contract checks."""

import numpy as np
import pytest

from vilmedic_tpu.scorers import Bleu, CiderD, Meteor, Rouge, RougeL


REFS = [
    "there is no evidence of pneumonia .",
    "heart size is normal .",
    "small left pleural effusion .",
]
HYPS_PERFECT = list(REFS)
HYPS_PARTIAL = [
    "there is no pneumonia .",
    "the heart size is enlarged .",
    "no pleural effusion .",
]


def test_bleu_perfect_and_partial():
    score, per = Bleu()(REFS, HYPS_PERFECT)
    assert score == pytest.approx(1.0, abs=1e-6)
    assert len(per) == 3 and all(p == pytest.approx(1.0, abs=1e-6) for p in per)

    score2, per2 = Bleu()(REFS, HYPS_PARTIAL)
    assert 0 < score2 < 1
    assert all(0 <= p <= 1 for p in per2)


def test_bleu_brevity_penalty():
    refs = ["a b c d e f g h"]
    short = ["a b c d"]
    long_ = ["a b c d e f g h"]
    s_short, _ = Bleu()(refs, short)
    s_long, _ = Bleu()(refs, long_)
    assert s_short < s_long


def test_rouge_wrapper():
    score, per = RougeL()(REFS, HYPS_PARTIAL)
    assert 0 < score < 1 and len(per) == 3
    # identical -> 1.0
    score_p, _ = RougeL()(REFS, HYPS_PERFECT)
    assert score_p == pytest.approx(1.0)


def test_ciderd_identity_corpus():
    score, per = CiderD()(REFS, HYPS_PERFECT)
    assert score == pytest.approx(10.0, abs=1e-6)
    assert np.allclose(per, 10.0)
    score2, _ = CiderD()(REFS, HYPS_PARTIAL)
    assert score2 < 10.0


def test_meteor_monotonic():
    s_perfect, per = Meteor()(REFS, HYPS_PERFECT)
    s_partial, _ = Meteor()(REFS, HYPS_PARTIAL)
    assert s_perfect > s_partial > 0
    assert s_perfect == pytest.approx(1.0, abs=0.01)
    assert len(per) == 3


def test_compute_scores_dispatch(tmp_path):
    import logging

    from vilmedic_tpu.scorers import compute_scores
    from vilmedic_tpu.utils import set_logger

    logger = set_logger(str(tmp_path), "123456")
    scores = compute_scores(
        metrics=["BLEU", "ROUGEL", "CIDERD", "radgraph"],  # radgraph -> isolated None
        refs=REFS,
        hyps=HYPS_PARTIAL,
        split="validate",
        seed="123456",
        config=None,
        epoch=0,
        logger=logger,
    )
    assert "BLEU" in scores and "ROUGEL" in scores
    assert scores["radgraph"] is None  # error-isolated, not raised
    assert (tmp_path / "validate_123456_refs.txt").exists()
    assert (tmp_path / "validate_123456_hyps.txt").exists()
    assert (tmp_path / "validate_123456_metrics.txt").exists()


def test_spice_scene_graph_tuples_and_scoring():
    from vilmedic_tpu.scorers.nlg.spice import Spice, extract_tuples

    t = extract_tuples("small left pleural effusion. no pneumothorax.")
    assert ("effusion", "small") in t and ("effusion", "left") in t
    assert ("pneumothorax", "absent") in t
    t2 = extract_tuples("opacity in the lobe")
    assert ("opacity", "in", "lobe") in t2

    # broadened lexicon: CT/MR and abdominal modifiers fire as attributes,
    # not phantom objects
    t3 = extract_tuples(
        "hypodense hepatic lesion. loculated free fluid in the pelvis. "
        "ground glass opacity in both lungs."
    )
    assert ("lesion", "hypodense") in t3 and ("lesion", "hepatic") in t3
    assert ("fluid", "loculated") in t3 and ("fluid", "free") in t3
    assert ("opacity", "ground") in t3 and ("opacity", "glass") in t3
    assert ("hypodense",) not in t3 and ("loculated",) not in t3

    refs = ["small left pleural effusion . no pneumothorax .",
            "the heart is enlarged ."]
    perfect = list(refs)
    partial = ["pleural effusion seen", "normal heart"]
    s = Spice()
    mean_p, per = s(refs, perfect)
    mean_q, _ = s(refs, partial)
    assert mean_p == 1.0 and 0 <= mean_q < mean_p
    assert len(per) == 2


def test_spice_cli_dispatch(tmp_path):
    from vilmedic_tpu.scorers.scores import compute_scores

    scores = compute_scores(
        metrics=["SPICE"], refs=["no acute disease ."], hyps=["no acute disease ."],
        split="t", seed=0, config=None, epoch=0, logger=None, dump=False,
    )
    assert scores["SPICE"] == 1.0


def test_rouge_l_native_parity_bit_exact():
    """The C++ LCS fast path (SCST reward hot loop) must be BIT-identical to
    rouge_score's pure-Python scorer — same tokenize+stem feeds both, and the
    P/R/F1 arithmetic uses the same operation order."""
    from vilmedic_tpu.scorers.nlg.native import get_lib
    from vilmedic_tpu.scorers.nlg.rouge import Rouge

    lib = get_lib()
    if lib is None or not hasattr(lib, "rouge_l_batch"):
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(0)
    words = ["pleural", "effusion", "cardiomegaly", "the", "NO", "increased",
             "unchanged", "right-sided", "2", "opacities", "atelectasis,",
             "is", "seen.", "running", "flies", "", "consolidation"]
    refs, hyps = [], []
    for i in range(40):
        refs.append(" ".join(rng.choice(words, rng.integers(0, 60))))
        hyps.append(" ".join(rng.choice(words, rng.integers(0, 60))))
    refs += ["", "only one side", "a b c"]
    hyps += ["nonempty", "", "a b c"]

    scorer = Rouge(rouges=["rougeL"])
    fast = scorer._rouge_l_fast(refs, hyps)
    assert fast is not None
    slow = [scorer.scorer.score(r, h)["rougeL"].fmeasure
            for r, h in zip(refs, hyps)]
    assert fast == slow  # bit-exact, not approx
