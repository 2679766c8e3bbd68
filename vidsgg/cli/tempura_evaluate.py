"""TEMPURA qualitative evaluation (the reference's TEMPURA_evaluate.py):
run test-time inference and dump scene-graph overlays + triplet JSON for
the first N videos.

Usage:
  python -m vidsgg.cli.tempura_evaluate --mode predcls --synthetic 4 \
      --out output/viz
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from vidsgg.configs.tempura import TempuraRunConfig
from vidsgg.data.entry import EntryCapacity
from vidsgg.models.tempura import Tempura
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.checkpoint import restore_checkpoint
from vidsgg.train.eval_pipeline import EvalPipeline
from vidsgg.utils.visualize import dump_kcc_predictions, kcc_prediction_json


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    synthetic, out_dir, ckpt = 4, "output/viz", None
    for flag in ("--synthetic", "--out", "--ckpt"):
        if flag in argv:
            i = argv.index(flag)
            val = argv[i + 1]
            del argv[i : i + 2]
            if flag == "--synthetic":
                synthetic = int(val)
            elif flag == "--out":
                out_dir = val
            else:
                ckpt = val
    cfg = TempuraRunConfig.from_args(argv)

    cap = EntryCapacity(max_frames=16, max_objs=48, max_pairs=32)
    from vidsgg.cli.data_source import make_synthetic_source

    src = make_synthetic_source(synthetic, cap, seed=5, shuffle=False)
    model = Tempura(cfg.model_config())
    entry0, _, _ = next(iter(src()))
    state = create_train_state(
        model, cfg.model_config(), entry0, jax.random.PRNGKey(0),
        make_optimizer(steps_per_epoch=1),
    )
    if ckpt:
        state = restore_checkpoint(ckpt, state, "best_recall")

    pipeline = EvalPipeline(cfg.mode, cap)
    os.makedirs(out_dir, exist_ok=True)
    all_json = {}
    for vi, (entry, fmaps, gt) in enumerate(src()):
        pred = pipeline(state, entry, fmaps, gt_entry=entry)
        all_json.update(kcc_prediction_json(f"video_{vi:03d}", pred))
        print(f"video {vi}: {len(pred['im_idx'])} pairs")
    dump_kcc_predictions(os.path.join(out_dir, "predictions.json"), all_json)
    print(f"qualitative predictions written to {out_dir}/predictions.json")


if __name__ == "__main__":
    main()
