#!/usr/bin/env python
"""MIMIC-CXR dataset preparation: section extraction + split/task file emission.

Behavioral port of reference data/make_datasets/mimic_cxr/{make_mimic_cxr.py,
section_parser.py, create_section_files.py}: parse free-text radiology reports
into sections by their ALL-CAPS headers, extract findings/impression (with the
standard fallback synonyms), order each study's images by DICOM ViewPosition
rank, and emit per-split ``{split}.{findings,impression,image}.tok`` files for
the RRG / RRS / SELFSUP tasks.

Inputs (from physionet MIMIC-CXR-JPG):
  --reports-root  directory of report .txt files (files/pXX/pXXXXXXX/sXXXX.txt)
  --metadata-csv  mimic-cxr-2.0.0-metadata.csv (dicom_id -> ViewPosition, study)
  --splits-csv    mimic-cxr-2.0.0-split.csv    (dicom_id -> train/validate/test)
  --images-root   root of the JPG tree
  --task          rrg | rrs | selfsup
  --out           output directory
"""

from __future__ import annotations

import argparse
import csv
import os
import re
from collections import defaultdict

# ViewPosition priority order (reference make_mimic_cxr.py:27-35)
RANKED_VIEWS = [
    "PA", "AP", "LATERAL", "LL", "AP AXIAL", "AP LLD", "AP RLD", "PA RLD",
    "PA LLD", "LAO", "RAO", "LPO", "XTABLE LATERAL", "SWIMMERS", "",
]

# Section-name fallbacks used by the standard MIMIC-CXR section files
FINDINGS_SYNONYMS = [
    "findings", "findings and impression", "wet read", "last_paragraph",
]
IMPRESSION_SYNONYMS = [
    "impression", "impressions", "impresssion", "conclusion", "conclusions",
    "summary", "findings and impression",
]

_SECTION_RE = re.compile(r"\n ([A-Z ()/,-]+):\s", re.DOTALL)


def section_text(text: str):
    """Split a report into (sections, section_names) by ALL-CAPS headers
    (reference section_parser.py:4-70)."""
    sections, names = [], []
    s = _SECTION_RE.search(text, 0)
    if not s:
        return [text], ["full report"]

    sections.append(text[: s.start(1)])
    names.append("preamble")
    while s:
        name = s.group(1).lower().strip()
        idx_start = s.end()
        skip = text[idx_start:].find("\n")
        if skip == -1:
            skip = 0
        s = _SECTION_RE.search(text, idx_start + skip)
        idx_end = s.start() if s else len(text)
        sections.append(text[idx_start:idx_end])
        names.append(name)
    return sections, names


def extract_sections(text: str):
    """-> (findings, impression), each '' when absent, whitespace-normalized."""
    sections, names = section_text(text)
    by_name = {}
    for sec, name in zip(sections, names):
        by_name.setdefault(name, sec)

    def pick(synonyms):
        for syn in synonyms:
            if syn in by_name:
                return re.sub(r"\s+", " ", by_name[syn]).strip()
        return ""

    findings = pick(FINDINGS_SYNONYMS)
    impression = pick(IMPRESSION_SYNONYMS)
    if not findings and "full report" in by_name:
        # last-paragraph fallback used by the standard section files
        paragraphs = [p for p in by_name["full report"].split("\n\n") if p.strip()]
        if paragraphs:
            findings = re.sub(r"\s+", " ", paragraphs[-1]).strip()
    return findings, impression


def reorder_images(paths, view_of):
    """Rank a study's images by ViewPosition (reference make_mimic_cxr.py:23-35)."""
    out = []
    views = [view_of.get(os.path.splitext(os.path.basename(p))[0], "") for p in paths]
    for rank in RANKED_VIEWS:
        for p, v in zip(paths, views):
            if v == rank:
                out.append(p)
    return out or list(paths)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--reports-root", required=True)
    parser.add_argument("--metadata-csv", required=True)
    parser.add_argument("--splits-csv", required=True)
    parser.add_argument("--images-root", required=True)
    parser.add_argument("--task", required=True, choices=["rrg", "rrs", "selfsup"])
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    with open(args.metadata_csv) as f:
        meta = list(csv.DictReader(f))
    view_of = {row["dicom_id"]: row["ViewPosition"] for row in meta}
    study_images = defaultdict(list)
    study_subject = {}
    for row in meta:
        study_images[row["study_id"]].append(row["dicom_id"])
        study_subject[row["study_id"]] = row["subject_id"]

    with open(args.splits_csv) as f:
        split_of_study = {}
        for row in csv.DictReader(f):
            split_of_study[row["study_id"]] = row["split"].replace("validate", "validate")

    os.makedirs(args.out, exist_ok=True)
    writers = {}

    def emit(split, key, value):
        handle = writers.get((split, key))
        if handle is None:
            handle = open(os.path.join(args.out, f"{split}.{key}.tok"), "w")
            writers[(split, key)] = handle
        handle.write(value + "\n")

    n_kept = n_skipped = 0
    for study_id, dicoms in study_images.items():
        subject = study_subject[study_id]
        split = split_of_study.get(study_id, "train")
        report_path = os.path.join(
            args.reports_root, f"p{subject[:2]}", f"p{subject}", f"s{study_id}.txt"
        )
        if not os.path.exists(report_path):
            n_skipped += 1
            continue
        with open(report_path) as f:
            findings, impression = extract_sections(f.read())

        need = {
            "rrg": impression,
            "rrs": findings and impression,
            "selfsup": impression or findings,
        }[args.task]
        if not need:
            n_skipped += 1
            continue

        image_paths = [
            os.path.join(
                args.images_root, f"p{subject[:2]}", f"p{subject}", f"s{study_id}",
                f"{d}.jpg",
            )
            for d in dicoms
        ]
        image_paths = reorder_images(image_paths, view_of)

        emit(split, "image", ",".join(image_paths))
        if args.task == "rrg":
            emit(split, "impression", impression)
        elif args.task == "rrs":
            emit(split, "findings", findings)
            emit(split, "impression", impression)
        else:
            emit(split, "report", impression or findings)
        n_kept += 1

    for handle in writers.values():
        handle.close()
    print(f"kept {n_kept} studies, skipped {n_skipped}")


if __name__ == "__main__":
    main()
