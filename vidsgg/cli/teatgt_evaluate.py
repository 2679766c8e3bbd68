"""TEAT-GT qualitative evaluation (the reference's TEATGT_evaluate.py):
inference + triplet JSON dump for the first N videos."""

from __future__ import annotations

import os
import sys

import jax

from vidsgg.configs.teatgt import TeatGTRunConfig
from vidsgg.data.entry import EntryCapacity
from vidsgg.eval.adapter import to_eval_pred
from vidsgg.models.graph_build import ClipCaps
from vidsgg.models.teatgt import TeatGT
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.checkpoint import restore_checkpoint
from vidsgg.utils.visualize import dump_kcc_predictions, kcc_prediction_json


class _MemCfg:
    tracking = False
    num_classes = 37


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    synthetic, out_dir, ckpt = 4, "output/viz_teatgt", None
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
    cfg = TeatGTRunConfig.from_args(argv)

    cap = EntryCapacity(max_frames=16, max_objs=48, max_pairs=32)
    clips = ClipCaps(clip_size=5, n_clips=4, tokens_per_clip=32,
                     edges_per_clip=160, tokens_per_frame=8)
    from vidsgg.cli.data_source import make_synthetic_source

    src = make_synthetic_source(synthetic, cap, seed=5, shuffle=False)
    model = TeatGT(cfg.model_config(clips))
    entry0, _, _ = next(iter(src()))
    state = create_train_state(model, _MemCfg(), entry0, jax.random.PRNGKey(0),
                               make_optimizer(steps_per_epoch=1))
    if ckpt:
        state = restore_checkpoint(ckpt, state, "best_recall")

    fwd = jax.jit(
        lambda s, e: s.apply_fn(
            {"params": s.params, "batch_stats": s.batch_stats}, e, phase="test"
        )
    )
    os.makedirs(out_dir, exist_ok=True)
    all_json = {}
    for vi, (entry, fmaps, gt) in enumerate(src()):
        pred = to_eval_pred(entry, fwd(state, entry), cfg.mode)
        all_json.update(kcc_prediction_json(f"video_{vi:03d}", pred))
        print(f"video {vi}: {len(pred['im_idx'])} pairs")
    dump_kcc_predictions(os.path.join(out_dir, "predictions.json"), all_json)
    print(f"qualitative predictions written to {out_dir}/predictions.json")


if __name__ == "__main__":
    main()
