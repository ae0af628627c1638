"""METEOR 1.5 matcher cascade: synonym + paraphrase stages, weighted scoring."""

import pytest

from vilmedic_tpu.scorers.nlg import meteor as meteor_mod
from vilmedic_tpu.scorers.nlg.meteor import Meteor, _Matchers, single_meteor_score


@pytest.fixture(autouse=True)
def reset_matchers():
    _Matchers._instance = None
    yield
    _Matchers._instance = None


def test_exact_match_scores_one():
    s = single_meteor_score("the lungs are clear".split(),
                            "the lungs are clear".split(), _Matchers())
    assert s == pytest.approx(1.0)


def test_stem_stage_below_exact():
    exact = single_meteor_score("effusion seen".split(), "effusion seen".split(),
                                _Matchers())
    stem = single_meteor_score("effusions seen".split(), "effusion seen".split(),
                               _Matchers())
    assert 0 < stem < exact


def test_synonym_stage_from_file(tmp_path, monkeypatch):
    syn = tmp_path / "syn.tsv"
    syn.write_text("enlarged\tbig\tcardiomegaly\nsmall\ttiny\n")
    monkeypatch.setenv("METEOR_SYNONYMS", str(syn))
    m = _Matchers()
    assert m.has_synonyms and m.are_synonyms("enlarged", "big")

    # fresh matcher WITHOUT synonyms: construct after clearing env
    monkeypatch.delenv("METEOR_SYNONYMS")
    no_syn = _Matchers()
    base = single_meteor_score("heart is enlarged".split(),
                               "heart is big".split(), no_syn)
    monkeypatch.setenv("METEOR_SYNONYMS", str(syn))
    with_syn = single_meteor_score("heart is enlarged".split(),
                                   "heart is big".split(), _Matchers())
    assert with_syn > base  # synonym stage matched enlarged<->big


def test_paraphrase_stage_from_file(tmp_path, monkeypatch):
    # phrase whose words have no exact/stem/synonym matches in the reference,
    # so only the paraphrase stage can align them
    para = tmp_path / "para.txt"
    para.write_text("zilch found ||| no acute disease\n")
    base = single_meteor_score("there is no acute disease".split(),
                               "there is zilch found".split(), _Matchers())
    monkeypatch.setenv("METEOR_PARAPHRASE", str(para))
    with_para = single_meteor_score("there is no acute disease".split(),
                                    "there is zilch found".split(), _Matchers())
    assert with_para > base


def test_function_words_discounted():
    # matching only function words must score lower than matching content words
    func_only = single_meteor_score("the of and effusion".split(),
                                    "the of and pneumonia".split(), _Matchers())
    content_only = single_meteor_score("xxle of pleural effusion".split(),
                                       "zzle by pleural effusion".split(),
                                       _Matchers())
    assert content_only > func_only


def test_corpus_contract_and_monotonicity():
    refs = ["no acute disease .", "small left effusion ."]
    perfect = list(refs)
    partial = ["no disease", "effusion maybe right"]
    m = Meteor()
    s_perfect, per = m(refs, perfect)
    s_partial, _ = m(refs, partial)
    assert len(per) == 2 and s_perfect > s_partial > 0
