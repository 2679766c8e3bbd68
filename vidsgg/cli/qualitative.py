"""Shared qualitative-evaluation runner (TEMPURA_evaluate.py /
TEATGT_evaluate.py equivalents).

The reference evaluate scripts run the first ~10 test-split videos through
the frozen detector + relation model (TEMPURA_evaluate.py:52-88) with the
visualization suite attached (tools/utils/visualize.py:135-293; the calls
ship commented out at TEMPURA_evaluate.py:85-91 — here they are flag-gated
and actually wired). Per video this writes:

* triplet JSON (``predictions.json``, the KCC export schema);
* ``--viz``: per-frame scene-graph overlays (``draw_scene_graph``) on the
  denormalized frames, a GT-vs-pred distribution heatmap
  (``gt_vs_pred_matrix``), and one t-SNE of contacting logits across all
  evaluated pairs (``tsne_contact_logits``).

Sources mirror the test CLIs: ``--data_path`` (AG-format pickles + frames,
predcls/sgcls via GT boxes, sgdet via the detection frontend) or
``--synthetic N``.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from vidsgg import constants as C
from vidsgg.data.entry import EntryCapacity
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.checkpoint import restore_checkpoint
from vidsgg.train.eval_pipeline import EvalPipeline
from vidsgg.utils.visualize import (
    draw_gt_scene_graph,
    draw_scene_graph,
    dump_kcc_predictions,
    gt_vs_pred_matrix,
    kcc_prediction_json,
    temporal_consistency_plot,
    tsne_contact_logits,
)


def _parse(argv, family):
    ap = argparse.ArgumentParser(
        prog=f"{family}_evaluate", add_help=True,
        description="Qualitative evaluation: triplet JSON + visualizations.")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="use N synthetic videos instead of --data_path")
    ap.add_argument("--out", default=None, help="output directory")
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    ap.add_argument("--ckpt_name", default="best_recall")
    ap.add_argument("--max_videos", type=int, default=10,
                    help="videos to evaluate (reference: first ~10, "
                         "TEMPURA_evaluate.py:67)")
    ap.add_argument("--viz", action="store_true",
                    help="write overlay/heatmap/t-SNE PNGs")
    ap.add_argument("--viz_frames", type=int, default=2,
                    help="overlay PNGs per video")
    args, rest = ap.parse_known_args(argv)
    if args.out is None:
        args.out = f"output/viz_{family}"
    return args, rest


def _denorm_frames(frames: np.ndarray) -> np.ndarray:
    """Undo the detector preprocessing (BGR mean subtraction) for display."""
    return np.clip(np.asarray(frames) + np.asarray(C.PIXEL_MEANS_BGR), 0, 255)


def _viz_video(out_dir, name, pred, frames, viz_frames, gt=None):
    vdir = os.path.join(out_dir, name)
    for f in sorted(np.unique(np.asarray(pred["im_idx"]).astype(int)))[:viz_frames]:
        if frames is not None and f >= len(frames):
            continue
        frame = (frames[f] if frames is not None
                 else np.full((480, 640, 3), 127.0))
        draw_scene_graph(frame, pred, int(f),
                         os.path.join(vdir, f"frame_{int(f):04d}.png"))
        if gt is not None and f < len(gt):
            # GT-side overlay (reference Viz_GT_Scene_Graph,
            # tools/utils/visualize.py:53-78)
            draw_gt_scene_graph(
                frame, gt[int(f)],
                os.path.join(vdir, f"gt_frame_{int(f):04d}.png"))
    if "spatial_gt" in pred and len(pred.get("spatial_gt", [])):
        gt_vs_pred_matrix(pred, os.path.join(vdir, "gt_vs_pred.png"))
    if "contacting_gt" in pred and len(pred.get("contacting_gt", [])):
        temporal_consistency_plot(pred, vdir)


def evaluate_main(argv, family: str):
    args, rest = _parse(argv, family)

    if family == "tempura":
        from vidsgg.configs.tempura import TempuraRunConfig
        from vidsgg.models.tempura import Tempura

        cfg = TempuraRunConfig.from_args(rest)
    else:
        from vidsgg.configs.teatgt import TeatGTRunConfig

        cfg = TeatGTRunConfig.from_args(rest)

    cap = EntryCapacity(max_frames=16, max_objs=48, max_pairs=32)
    ds = None
    if args.synthetic:
        from vidsgg.cli.data_source import make_synthetic_source

        base = make_synthetic_source(args.synthetic, cap, seed=5,
                                     shuffle=False, stable=True)
        src = lambda: ((None, e, f, g) for e, f, g in base())
    else:
        from vidsgg.cli.data_source import (
            build_detector,
            default_buckets,
            make_ag_source,
            make_sgdet_source,
        )
        from vidsgg.data.action_genome import ActionGenome

        buckets = default_buckets(max_frames=cfg.bucket_frames)
        cap = buckets[-1]
        ds = ActionGenome("test", cfg.datasize, cfg.data_path,
                          filter_small_box=cfg.mode != "predcls",
                          target_min_side=cfg.frame_size)
        det, det_vars, canvases = build_detector(
            getattr(cfg, "model_path", None), tiny=cfg.tiny_detector,
            frame_size=cfg.frame_size)
        if cfg.mode == "sgdet":
            from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend

            frontend = SgdetFrontend(det, det_vars, SgdetCaps(), cap)
            src = make_sgdet_source(ds, cap, frontend, shuffle=False,
                                    max_videos=args.max_videos,
                                    canvases=canvases, yield_index=True)
        else:
            src = make_ag_source(ds, cap, det, det_vars, shuffle=False,
                                 max_videos=args.max_videos, buckets=buckets,
                                 canvases=canvases, yield_index=True)

    if family == "tempura":
        model_cfg = cfg.model_config()
        model = Tempura(model_cfg)
        pipeline_kw = dict(
            union_pairs_per_frame=32 if cfg.mode == "sgdet" else None)
    else:
        from vidsgg.models.graph_build import ClipCaps
        from vidsgg.models.teatgt import TeatGT

        clips = ClipCaps(clip_size=5, n_clips=-(-cap.max_frames // 5),
                         tokens_per_clip=5 * 8,
                         edges_per_clip=160 if args.synthetic else 320,
                         tokens_per_frame=8)
        model = TeatGT(cfg.model_config(clips))

        class _MemCfg:
            tracking = False
            num_classes = 37

        model_cfg = _MemCfg()
        pipeline_kw = dict(needs_union=False)

    it = iter(src())
    first = next(it)
    import itertools

    stream = itertools.chain([first], it)
    entry0 = first[1]
    state = create_train_state(model, model_cfg, entry0, jax.random.PRNGKey(0),
                               make_optimizer(steps_per_epoch=1))
    if args.ckpt:
        state = restore_checkpoint(args.ckpt, state, args.ckpt_name)
        print(f"restored checkpoint {args.ckpt_name} from {args.ckpt}")

    pipeline = EvalPipeline(cfg.mode, cap, **pipeline_kw)
    os.makedirs(args.out, exist_ok=True)
    all_json = {}
    tsne_rows, tsne_gt = [], []
    n = 0
    for item in stream:
        if n >= args.max_videos:
            break
        idx, entry, fmaps, gt = item
        pred = pipeline(state, entry, fmaps, gt_entry=entry)
        name = f"video_{n:03d}"
        all_json.update(kcc_prediction_json(name, pred))
        if args.viz:
            frames = None
            if ds is not None and idx is not None:
                frames = _denorm_frames(ds.load_video_frames(idx)[0])
            _viz_video(args.out, name, pred, frames, args.viz_frames, gt=gt)
        if "contacting_gt" in pred and len(pred.get("contacting_gt", [])):
            tsne_rows.append(np.asarray(pred["contacting_distribution"]))
            tsne_gt.extend(pred["contacting_gt"])
        print(f"{name}: {len(pred['im_idx'])} pairs")
        n += 1

    dump_kcc_predictions(os.path.join(args.out, "predictions.json"), all_json)
    if args.viz and tsne_rows and sum(len(r) for r in tsne_rows) >= 8:
        tsne_contact_logits(
            {"contacting_distribution": np.concatenate(tsne_rows),
             "contacting_gt": tsne_gt},
            os.path.join(args.out, "tsne_contact.png"))
    print(f"qualitative evaluation for {n} videos written to {args.out}")
    return args.out
