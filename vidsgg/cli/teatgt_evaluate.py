"""TEAT-GT qualitative evaluation (the reference's TEATGT_evaluate.py):
inference + triplet JSON + (with ``--viz``) the overlay/heatmap/t-SNE suite
on test-split or synthetic videos. See vidsgg.cli.qualitative."""

from __future__ import annotations

import sys

from vidsgg.cli.qualitative import evaluate_main


def main(argv=None):
    return evaluate_main(list(sys.argv[1:] if argv is None else argv),
                         "teatgt")


if __name__ == "__main__":
    main()
