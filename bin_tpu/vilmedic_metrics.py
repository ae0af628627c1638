#!/usr/bin/env python
"""Standalone metrics CLI: hyps file + refs file + metric list -> scores.

Parity with reference bin/scripts/vilmedic-metrics:7-40.

Usage: python bin_tpu/vilmedic_metrics.py --hyps h.txt --refs r.txt \
           --metrics BLEU ROUGEL METEOR CIDERD
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vilmedic_tpu.scorers.scores import compute_scores
from vilmedic_tpu.utils import set_logger


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--hyps", required=True)
    parser.add_argument("--refs", required=True)
    parser.add_argument("--metrics", nargs="+", required=True)
    args = parser.parse_args(argv)

    with open(args.hyps) as f:
        hyps = [l.strip() for l in f if l.strip() != ""]
    with open(args.refs) as f:
        refs = [l.strip() for l in f if l.strip() != ""]
    assert len(hyps) == len(refs), (len(hyps), len(refs))

    logger = set_logger(None, "metrics")
    scores = compute_scores(
        metrics=args.metrics, refs=refs, hyps=hyps, split="cli", seed="metrics",
        config=None, epoch=0, logger=logger, dump=False,
    )
    print(json.dumps(scores, indent=4, default=str))


if __name__ == "__main__":
    main()
