"""Build MIMIC-III radiology findings/impression pairs for the RRS recipes.

Port of reference data/make_datasets/mimiciii/preprocess_mimic_iii.ipynb:
reads NOTEEVENTS.csv (physionet MIMIC-III 1.4), keeps Radiology notes whose
DESCRIPTION falls in one of 11 modality_anatomy groups (CT_head, CT_neck,
CT_sinus, CT_spine, CT_chest, CT_abdomen-pelvis, MR_abdomen, MR_pelvis,
MR_spine, MR_head, MR_neck — the curated description lists live in
``mimic_iii_tables.json``), then per report:

- slices from "FINAL REPORT" and stitches out pagination markers
  ``(Over) ... (Cont)`` (notebook cell 9);
- splits into sections on ``\\n (ALL-CAPS HEADER):`` boundaries, lowercased
  and whitespace-flattened (cell 10);
- normalizes ~500 typo'd section headers to canonical names (cell 13);
- skips reports with zero or multiple ``impression`` sections (multiple
  studies in one note — safer to drop, cell 16);
- takes the first non-empty findings section in the group's
  frequency-ordered candidate list (cell 14);
- replaces ``[**anonymized**]`` spans with ``___`` and collapses whitespace.

Then splits each training group 80/10/10 with the notebook's exact seeded
shuffle (random.seed(42) once, groups in notebook order, so the published
split md5s reproduce given the same physionet CSV) and writes
``{split}.{findings,impression}.tok``; the 5 small groups become test-only
sets. Run ``--selfcheck`` for a synthetic smoke test without PHI data.
"""

import argparse
import csv
import json
import os
import random
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# notebook ordering matters: the split shuffle consumes one RNG stream
# (seed 42) across groups in this sequence (cell 21)
TRAIN_GROUPS = ["CT_head", "CT_spine", "CT_chest", "CT_abdomen-pelvis",
                "MR_head", "CT_neck"]
TEST_ONLY_GROUPS = ["CT_sinus", "MR_pelvis", "MR_neck", "MR_abdomen", "MR_spine"]

SECTION_RE = re.compile(r"\n ([A-Z ()/,-]+):\s", re.DOTALL)
ANON_RE = re.compile(r"\[\*\*(.*?)\*\*\]")


def load_tables():
    with open(os.path.join(HERE, "mimic_iii_tables.json")) as f:
        t = json.load(f)
    rev = {}
    for canonical, variants in t["section_typo_map"].items():
        for v in variants:
            rev[v] = canonical
    return t["description_mapping"], rev, t["findings_mapping"]


def final_report(text):
    """Slice from FINAL REPORT; drop (Over)...(Cont) pagination (cell 9)."""
    if "FINAL REPORT" not in text:
        return None
    text = text[text.index("FINAL REPORT"):]
    while "(Over)" in text and "(Cont)" in text:
        text = text[: text.index("(Over)")] + text[text.index("(Cont)") + 6:]
    return text


def extract_sections(text):
    """(names, lowercased flattened bodies) — notebook cell 10 semantics."""
    names, bodies = [], []
    s = SECTION_RE.search(text, 0)
    if not s:
        names, bodies = ["full report"], [text]
    else:
        names.append("preamble")
        bodies.append(text[12:s.start(1)])
        while s:
            name = s.group(1).lower()
            start = s.end()
            skip = text[start:].find("\n")
            if skip == -1:
                skip = 0
            s = SECTION_RE.search(text, start + skip)
            end = s.start() if s else len(text)
            names.append(name)
            bodies.append(text[start:end])
    bodies = [re.sub(" +", " ", re.sub("\n", "", b.strip().lower())) for b in bodies]
    return names, bodies


def clean(text):
    text = ANON_RE.sub("___", text)
    return re.sub(r"\s+", " ", text)


def extract_pairs(reports, findings_candidates, typo_rev):
    """[(findings, impression)] for one modality_anatomy group (cell 16)."""
    pairs = []
    for report in reports:
        text = final_report(report)
        if text is None:
            continue
        names, bodies = extract_sections(text)
        names = [typo_rev.get(n, n) for n in names]
        if names.count("impression") != 1:
            continue
        impression = bodies[names.index("impression")]
        # UPSTREAM-QUIRK-FAITHFUL: the notebook removes "impression" from the
        # names list but not its body (cell 16: ``section_names.remove(...)``
        # then ``sections[section_names.index(m[0])]``), so any findings
        # candidate located AFTER the impression section resolves to the
        # body one slot earlier. Kept bit-exact so the published splits
        # reproduce; locked by test_mimic_iii.py::test_quirk_findings_after_impression.
        names.remove("impression")
        findings = ""
        for cand, _freq in findings_candidates:
            if cand in names:
                findings = bodies[names.index(cand)]
                if findings:
                    break
        if not findings:
            continue
        pairs.append((clean(re.sub(r"\s+", " ", findings)),
                      clean(re.sub(r"\s+", " ", impression))))
    return pairs


def read_noteevents(csv_path):
    """ROW_ID-keyed (DESCRIPTION, TEXT) for Radiology notes."""
    csv.field_size_limit(sys.maxsize)
    out = []
    with open(csv_path, newline="") as f:
        for row in csv.DictReader(f):
            if row.get("CATEGORY") == "Radiology":
                out.append((row["DESCRIPTION"], row["TEXT"]))
    return out


def write_lines(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines))


def split_and_write(out_dir, group, pairs, train=True):
    folder = os.path.join(out_dir, group)
    os.makedirs(folder, exist_ok=True)
    findings = [p[0].strip() for p in pairs]
    impression = [p[1].strip() for p in pairs]
    if not train:
        write_lines(os.path.join(folder, "test.findings.tok"), findings)
        write_lines(os.path.join(folder, "test.impression.tok"), impression)
        return {"test": len(pairs)}
    # the notebook shuffles the zipped pairs in-place with the shared
    # module-level RNG (cell 21) — keep that exact consumption pattern
    temp = list(zip(findings, impression))
    random.shuffle(temp)  # empty/singleton shuffles draw no randomness
    if temp:
        findings, impression = (list(x) for x in zip(*temp))
    total = len(findings)
    eighty, ten = int(0.8 * total), int(0.1 * total)
    cuts = {"train": (0, eighty), "validate": (eighty, eighty + ten),
            "test": (eighty + ten, total)}
    for split, (a, b) in cuts.items():
        write_lines(os.path.join(folder, f"{split}.findings.tok"), findings[a:b])
        write_lines(os.path.join(folder, f"{split}.impression.tok"), impression[a:b])
    return {k: b - a for k, (a, b) in cuts.items()}


def run(csv_path, out_dir):
    mapping, typo_rev, findings_mapping = load_tables()
    notes = read_noteevents(csv_path)
    random.seed(42)
    counts = {}
    groups_pairs = {}
    for group in mapping:
        wanted = set(mapping[group])
        reports = [text for desc, text in notes if desc in wanted]
        pairs = extract_pairs(reports, findings_mapping[group], typo_rev)
        groups_pairs[group] = pairs
        print(f"{group}: {len(reports)} mapped reports, {len(pairs)} suitable")
    for group in TRAIN_GROUPS:
        counts[group] = split_and_write(out_dir, group, groups_pairs[group], train=True)
    for group in TEST_ONLY_GROUPS:
        counts[group] = split_and_write(out_dir, group, groups_pairs[group], train=False)
    print(json.dumps(counts, indent=2))
    return counts


def selfcheck(out_dir):
    """Synthetic NOTEEVENTS-shaped smoke test (no PHI needed)."""
    import tempfile

    body = (
        "ROW_ID,SUBJECT_ID,CATEGORY,DESCRIPTION,TEXT\n"
        '1,10,Radiology,CT HEAD W/O CONTRAST,"  FINAL REPORT\n'
        " INDICATION:  fall.\n\n FINDIGNS:  No acute hemorrhage seen on [**2150-1-1**].\n\n"
        ' IMPRESSION:  No acute intracranial process.\n"\n'
        '2,11,Radiology,CT HEAD W/O CONTRAST,"  FINAL REPORT\n'
        " NON-CONTRAST HEAD CT:  Stable exam.\n\n IMPRESSION:  Stable.\n\n"
        ' IMPRESSION:  Duplicated impression.\n"\n'
        '3,12,Discharge summary,CT HEAD W/O CONTRAST,"not radiology"\n'
        '4,13,Radiology,CT SINUS W/ CONTRAST,"  FINAL REPORT\n'
        " FINDINGS:  Mucosal thickening.\n\n IMPRESSION:  Sinusitis.\n"
        '(Over) page break (Cont)inued text"\n'
    )
    with tempfile.TemporaryDirectory() as td:
        csv_path = os.path.join(td, "NOTEEVENTS.csv")
        with open(csv_path, "w") as f:
            f.write(body)
        counts = run(csv_path, out_dir)
    # row 1: typo'd FINDIGNS normalizes, anonymization masked;
    # row 2: two impressions -> dropped; row 4: test-only group
    assert counts["CT_head"] == {"train": 0, "validate": 0, "test": 1}, counts
    assert counts["CT_sinus"] == {"test": 1}, counts
    got = open(os.path.join(out_dir, "CT_head", "test.findings.tok")).read()
    assert got == "no acute hemorrhage seen on ___.", repr(got)
    print("selfcheck ok")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--csv", default="NOTEEVENTS.csv",
                    help="path to the physionet NOTEEVENTS.csv")
    ap.add_argument("--out", default="OUT", help="output directory")
    ap.add_argument("--selfcheck", action="store_true",
                    help="run on synthetic data and verify the pipeline")
    args = ap.parse_args(argv)
    if args.selfcheck:
        selfcheck(args.out)
    else:
        run(args.csv, args.out)


if __name__ == "__main__":
    main()
