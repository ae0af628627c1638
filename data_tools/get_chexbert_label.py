"""Label a report file with CheXbert conditions.

TPU-native port of reference data/make_datasets/mimic_cxr/get_chexbert_label.py:
reads ``split.report.tok`` (one report per line), runs the Flax CheXbert labeler
in classification mode, and writes ``split.label.tok`` with the positive
condition names per line (``No Finding`` when none) — the label files consumed
by LabelDataset-based recipes.

Unlike the reference's per-report loop, labeling is one batched jitted forward
over the whole file (scorers/chexbert.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vilmedic_tpu.scorers.chexbert import CONDITIONS, CheXbert


def compute_labels(report_file: str) -> str:
    dir_path = os.path.dirname(os.path.realpath(report_file))
    name = os.path.basename(report_file)
    chunks = name.split(".")
    assert len(chunks) == 3, "input file name must be of type 'split.report.tok'"
    split, ext = chunks[0], chunks[2]
    output_file = os.path.join(dir_path, f"{split}.label.{ext}")
    print(f"The labels will be written in {output_file}")

    reports = [l.strip() for l in open(report_file)]
    labeler = CheXbert()
    rows = labeler.get_labels(reports, mode="classification")

    lines = []
    for row in rows:
        labels = [CONDITIONS[i] for i, v in enumerate(row)
                  if isinstance(v, int) and v > 0]
        lines.append(",".join(labels or ["No Finding"]))
    with open(output_file, "w") as f:
        f.write("\n".join(lines))
    return output_file


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("report_file", type=str)
    args, _ = parser.parse_known_args()
    compute_labels(args.report_file)
