"""KCC demo CLI — scene-graph inference on arbitrary user videos.

The reference's deploy/serve surface (KCC_TEMPURA.py / KCC_TEATGT.py):
ffmpeg-extracted frames -> sgdet detection -> relation model -> per-frame
triplet JSON (visualize.py:135-174).

Usage:
  python -m vidsgg.cli.kcc_demo --data_path kcc_demo/ --out predictions.json \
      [--model tempura|teatgt] [--ckpt DIR] [--detector faster_rcnn_ag.pth]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.data.entry import EntryCapacity
from vidsgg.data.kcc import KCCDataset
from vidsgg.detector.faster_rcnn import FasterRCNN
from vidsgg.detector.rpn import RPNConfig
from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend
from vidsgg.eval.adapter import to_eval_pred
from vidsgg.models.tempura import Tempura, TempuraConfig
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.checkpoint import restore_checkpoint
from vidsgg.train.eval_pipeline import EvalPipeline
from vidsgg.utils.visualize import dump_kcc_predictions, kcc_prediction_json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="kcc_demo/")
    p.add_argument("--out", default="output/kcc_predictions.json")
    p.add_argument("--model", default="tempura", choices=["tempura", "teatgt"])
    p.add_argument("--ckpt", default=None)
    p.add_argument("--detector", default=None, help="faster_rcnn_ag.pth path")
    p.add_argument("--max_frames", type=int, default=32)
    p.add_argument("--pair_detect", type=int, default=1,
                   help="same-shape videos per fused relation dispatch "
                        "(detection stays per-video here: the demo's "
                        "capacity admits the fully-fused detect path only "
                        "for short videos; see docs/PERF.md)")
    # rehearsal hooks (shrunk detector + small frames; same code path)
    p.add_argument("--tiny_detector", action="store_true")
    p.add_argument("--frame_size", type=int, default=600)
    p.add_argument("--int8", action="store_true",
                   help="serve the detector convs in int8 (PTQ calibrated "
                        "on the first --int8_calib demo videos)")
    p.add_argument("--int8_calib", type=int, default=2)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture the run as one jax.profiler (XProf) trace")
    args = p.parse_args(argv)

    ds = KCCDataset(args.data_path)
    if len(ds) == 0:
        raise SystemExit(f"no videos under {args.data_path}/dataset/<name>/frame/")
    print(f"KCC demo: {len(ds)} videos")

    from vidsgg.cli.data_source import scale_canvases

    canvases = scale_canvases(args.frame_size)
    if args.tiny_detector:
        from vidsgg.cli.data_source import build_detector

        det, det_vars, canvases = build_detector(
            args.detector, tiny=True, frame_size=args.frame_size
        )
    else:
        det = FasterRCNN(
            rpn_cfg=RPNConfig(pre_nms_top_n=2000, post_nms_top_n=128)
        )
        if args.detector:
            from vidsgg.detector.convert import load_faster_rcnn_checkpoint

            det_vars = load_faster_rcnn_checkpoint(args.detector)
        else:
            det_vars = jax.jit(det.init)(
                jax.random.PRNGKey(0), jnp.zeros((4, 608, 1008, 3)),
                jnp.array([608.0, 1008.0]),
            )
            print("WARNING: random detector weights (no --detector given)")

    if args.int8:
        from vidsgg.cli.data_source import quantize_detector_int8

        det, det_vars = quantize_detector_int8(
            det, det_vars, ds, canvases, num_videos=args.int8_calib,
            target_min_side=args.frame_size, max_frames=args.max_frames,
        )

    cap = EntryCapacity(max_frames=args.max_frames, max_objs=128, max_pairs=128)
    frontend = SgdetFrontend(det, det_vars, SgdetCaps(dets_per_frame=10), cap)

    if args.model == "teatgt":
        from vidsgg.models.graph_build import ClipCaps
        from vidsgg.models.teatgt import TeatGT, TeatGTConfig

        clip_caps = ClipCaps(
            clip_size=5, n_clips=-(-args.max_frames // 5),
            tokens_per_clip=64, edges_per_clip=256, tokens_per_frame=12,
        )
        cfg = TeatGTConfig.for_mode("sgdet", caps=clip_caps)
        model = TeatGT(cfg)
        pipeline = EvalPipeline("sgdet", cap, needs_union=False)
    else:
        cfg = TempuraConfig.for_mode("sgdet", obj_head="gmm", rel_head="gmm")
        model = Tempura(cfg)
        pipeline = EvalPipeline("sgdet", cap)

    paired = None
    if args.pair_detect > 1:
        from vidsgg.train.pair_eval import PairedSgdetEval

        paired = PairedSgdetEval(pipeline, group=args.pair_detect)

    all_preds = {}
    state = None
    from vidsgg.cli.data_source import pick_canvas

    def emit(pred, tag):
        name, f = tag
        all_preds.update(kcc_prediction_json(name, pred))
        print(f"  {name}: {f} frames -> "
              f"{len(pred['im_idx'])} triplet rows")

    from vidsgg.utils.profiling import maybe_trace

    with maybe_trace(args.profile):  # --profile DIR: one jax.profiler trace
        for vi in range(len(ds)):
            frames, scale, name = ds.load_video_frames(
                vi, target_min_side=args.frame_size
            )
            frames = frames[: args.max_frames]
            f, h, w, _ = frames.shape
            # canvas + frame buckets bound the detector compile set across
            # the demo's arbitrary video resolutions/lengths
            canvas = pick_canvas(h, w, canvases) or (
                -(-h // 16) * 16, -(-w // 16) * 16
            )
            fpad = next(
                (b for b in (8, 16, 32, 64) if f <= b <= args.max_frames), f
            )
            pad = np.zeros((fpad, canvas[0], canvas[1], 3), np.float32)
            pad[:f, :h, :w] = frames
            entry, fmaps = frontend(
                jnp.asarray(pad), jnp.array([float(h), float(w)]), scale,
                is_train=False, video_size=(w / scale, h / scale),
                num_frames=f,
            )
            if state is None:
                state = create_train_state(
                    model, cfg, entry, jax.random.PRNGKey(0),
                    make_optimizer(steps_per_epoch=1),
                )
                if args.ckpt:
                    state = restore_checkpoint(args.ckpt, state, "best_recall")
            if paired is not None:  # same-shape videos share one dispatch
                for pred, tag in paired.add(state, entry, jnp.asarray(fmaps),
                                            payload=(name, f)):
                    emit(pred, tag)
                continue
            emit(pipeline(state, entry, jnp.asarray(fmaps)), (name, f))
        if paired is not None:
            for pred, tag in paired.flush(state):
                emit(pred, tag)

    dump_kcc_predictions(args.out, all_preds)
    print(f"predictions written to {args.out}")


if __name__ == "__main__":
    main()
