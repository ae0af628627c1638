"""Build PadChest splits for RRG/RRS/SELFSUP recipes.

Port of reference data/make_datasets/padchest/make_padchest.py:120-199: reads
the PadChest 160K label CSV, filters studies without images/labels and junk
reports (the curated exclusion lists, stored in ``padchest_exclusions.json``),
whitespace-normalizes reports, and writes shuffled 80/10/10
train/validate/test ``{report,image,label}.tok`` files — once over all rows
and once restricted to physician-labeled rows. Seeded shuffle (42) matches the
reference so splits reproduce.
"""

import argparse
import ast
import csv
import json
import os
import random
import re

HERE = os.path.dirname(os.path.abspath(__file__))
CSV_DEFAULT = "PADCHEST_chest_x_ray_images_labels_160K_01.02.19.csv"


def load_exclusions():
    with open(os.path.join(HERE, "padchest_exclusions.json")) as f:
        ex = json.load(f)
    return (set(ex["study_without_image"]) | set(ex["study_without_labels"]),
            set(ex["excluded_reports"]))


def read_rows(csv_path):
    excluded_studies, excluded_reports = load_exclusions()
    rows_all, rows_phys = [], []
    with open(csv_path, newline="") as f:
        for row in csv.DictReader(f):
            if row["StudyID"] in excluded_studies:
                continue
            if row["Report"] in excluded_reports:
                continue
            item = (
                re.sub(r"\s+", " ", row["Report"]),
                row["Labels"].strip(),
                row["ImageID"].strip(),
            )
            rows_all.append(item)
            if row["MethodLabel"] == "Physician":
                rows_phys.append(item)
    return {"all": rows_all, "physician": rows_phys}


def parse_labels(raw: str) -> str:
    """PadChest stores labels as a python-list string; join trimmed entries."""
    return ",".join(w.strip() for w in ast.literal_eval(raw))


def write_splits(rows, out_dir, seed=42):
    rng = random.Random(seed)
    rows = list(rows)
    rng.shuffle(rows)
    n = len(rows)
    cuts = {"train": (0, int(n * 0.8)),
            "validate": (int(n * 0.8), int(n * 0.9)),
            "test": (int(n * 0.9), n)}
    os.makedirs(out_dir, exist_ok=True)
    for split, (lo, hi) in cuts.items():
        chunk = rows[lo:hi]
        with open(os.path.join(out_dir, f"{split}.report.tok"), "w") as f:
            f.write("\n".join(r for r, _, _ in chunk))
        with open(os.path.join(out_dir, f"{split}.image.tok"), "w") as f:
            f.write("\n".join(i for _, _, i in chunk))
        with open(os.path.join(out_dir, f"{split}.label.tok"), "w") as f:
            f.write("\n".join(parse_labels(l) for _, l, _ in chunk))
    return n


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--task", required=True, choices=["rrg", "rrs", "selfsup"])
    parser.add_argument("--csv", default=CSV_DEFAULT,
                        help="PadChest 160K labels CSV")
    parser.add_argument("--out", default="data",
                        help="output root (task/padchest/{all,physician} below)")
    args = parser.parse_args()

    groups = read_rows(args.csv)
    for method_label, rows in groups.items():
        out_dir = os.path.join(args.out, args.task.upper(), "padchest", method_label)
        n = write_splits(rows, out_dir)
        print(f"Method label: {method_label}, num samples: {n} -> {out_dir}")


if __name__ == "__main__":
    main()
