"""TEMPURA qualitative evaluation (the reference's TEMPURA_evaluate.py):
run test-split (or synthetic) videos through the detector + model and dump
triplet JSON plus — with ``--viz`` — scene-graph overlays, GT-vs-pred
heatmaps, and a contacting-logit t-SNE (tools/utils/visualize.py:135-293).

Usage:
  python -m vidsgg.cli.tempura_evaluate --mode predcls --data_path AG \
      --ckpt output/run --viz --out output/viz
  python -m vidsgg.cli.tempura_evaluate --mode predcls --synthetic 4 --viz
"""

from __future__ import annotations

import sys

from vidsgg.cli.qualitative import evaluate_main


def main(argv=None):
    return evaluate_main(list(sys.argv[1:] if argv is None else argv),
                         "tempura")


if __name__ == "__main__":
    main()
