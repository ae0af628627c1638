"""MIMIC-III preprocessing CLI (port of reference
data/make_datasets/mimiciii/preprocess_mimic_iii.ipynb)."""

import importlib.util
import os
import random
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location(
    "preprocess_mimic_iii",
    os.path.join(HERE, "..", "data_tools", "preprocess_mimic_iii.py"),
)
m3 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m3)


def report(findings="Normal heart size.", impression="No acute process.",
           findings_header="FINDINGS", extra=""):
    return (
        "  FINAL REPORT\n"
        f" INDICATION:  pain.\n\n {findings_header}:  {findings}\n\n"
        f" IMPRESSION:  {impression}\n{extra}"
    )


def test_selfcheck(tmp_path):
    m3.selfcheck(str(tmp_path / "OUT"))


def test_final_report_and_pagination():
    assert m3.final_report("no marker here") is None
    text = "junk FINAL REPORT body (Over) dropped (Cont) tail"
    assert m3.final_report(text) == "FINAL REPORT body  tail"


def test_sections_and_typos():
    names, bodies = m3.extract_sections(report(findings_header="FINDNINGS"))
    _, rev, _ = m3.load_tables()
    names = [rev.get(n, n) for n in names]
    assert "findings" in names and "impression" in names
    assert bodies[names.index("findings")] == "normal heart size."


def test_multiple_impressions_dropped():
    _, rev, fm = m3.load_tables()
    reports = [
        report(),
        report(extra=" IMPRESSION:  second study impression.\n"),
        "no final report marker",
    ]
    pairs = m3.extract_pairs(reports, fm["CT_head"], rev)
    assert pairs == [("normal heart size.", "no acute process.")]


def test_findings_priority_order():
    """First non-empty candidate in the frequency-ordered list wins."""
    _, rev, fm = m3.load_tables()
    text = (
        "  FINAL REPORT\n"
        " NON-CONTRAST HEAD CT:  fallback body.\n\n"
        " FINDINGS:  primary body.\n\n"
        " IMPRESSION:  ok.\n"
    )
    pairs = m3.extract_pairs([text], fm["CT_head"], rev)
    assert pairs == [("primary body.", "ok.")]
    # without the primary section, the lower-priority header is used
    text2 = text.replace(" FINDINGS:  primary body.\n\n", "")
    pairs2 = m3.extract_pairs([text2], fm["CT_head"], rev)
    assert pairs2 == [("fallback body.", "ok.")]


def test_quirk_findings_after_impression():
    """UPSTREAM-QUIRK-FAITHFUL: the notebook removes 'impression' from the
    names list but not from the bodies list (cell 16), so a findings candidate
    AFTER the impression section resolves one body slot early. Locked so the
    published splits keep reproducing (preprocess_mimic_iii.py:108)."""
    _, rev, fm = m3.load_tables()
    text = (
        "  FINAL REPORT\n"
        " INDICATION:  fall.\n\n"
        " IMPRESSION:  no acute process.\n\n"
        " FINDINGS:  real findings body.\n"
    )
    pairs = m3.extract_pairs([text], fm["CT_head"], rev)
    # names after remove: [preamble, indication, findings]; bodies unchanged ->
    # index('findings')=2 selects bodies[2] = the impression text (notebook-exact)
    assert pairs == [("no acute process.", "no acute process.")]


def test_anonymization_and_whitespace():
    assert m3.clean("seen [**2150-1-1**] by  [**Doctor**]") == "seen ___ by ___"


def test_split_sizes_and_determinism(tmp_path):
    pairs = [(f"f{i}", f"i{i}") for i in range(20)]
    random.seed(42)
    c1 = m3.split_and_write(str(tmp_path / "a"), "G", pairs, train=True)
    assert c1 == {"train": 16, "validate": 2, "test": 2}
    random.seed(42)
    m3.split_and_write(str(tmp_path / "b"), "G", pairs, train=True)
    for split in ("train", "validate", "test"):
        fa = open(tmp_path / "a" / "G" / f"{split}.findings.tok").read()
        fb = open(tmp_path / "b" / "G" / f"{split}.findings.tok").read()
        assert fa == fb
    # shuffled, not identity order
    assert open(tmp_path / "a" / "G" / "train.findings.tok").read().splitlines() \
        != [f"f{i}" for i in range(16)]


def test_tables_shape():
    mapping, rev, fm = m3.load_tables()
    assert set(mapping) == set(fm) == set(m3.TRAIN_GROUPS) | set(m3.TEST_ONLY_GROUPS)
    # spot checks against the notebook's tables
    assert "CT HEAD W/O CONTRAST" in mapping["CT_head"]
    assert rev["findigns"] == "findings" and rev["impesssion" if False else "impession"] == "impression"
    assert fm["CT_head"][0] == ["findings", 26640]
