"""TEAT-GT evaluation CLI (the reference's TEATGT_test.py; the 10-video
truncation there is opt-in here via --max_videos)."""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

from vidsgg.configs.teatgt import TeatGTRunConfig
from vidsgg.data.entry import EntryCapacity
from vidsgg.eval import get_ag_evaluators
from vidsgg.eval.temporal import (
    evaluate_temporal_consistency,
    temporal_consistency_summary,
)
from vidsgg.models.graph_build import ClipCaps
from vidsgg.models.teatgt import TeatGT
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.checkpoint import restore_checkpoint


class _MemCfg:
    tracking = False
    num_classes = 37


def main(argv=None):
    from vidsgg.cli.flags import take_flag

    argv = list(sys.argv[1:] if argv is None else argv)
    synthetic = take_flag(argv, "--synthetic", int, 0)
    max_videos = take_flag(argv, "--max_videos", int)
    ckpt = take_flag(argv, "--ckpt")
    ckpt_name = take_flag(argv, "--ckpt_name", str, "best_recall")
    profile_dir = take_flag(argv, "--profile")
    cfg = TeatGTRunConfig.from_args(argv)
    if max_videos is not None and cfg.pair_detect > 1:
        # pairing reorders and advances in group steps; exact first-N
        # truncation is only well-defined unpaired (see tempura_test)
        print("NOTE: --max_videos disables --pair_detect (exact truncation)")
        cfg.pair_detect = 1
    # multi-chip serving (see tempura_test): shard pair groups over a mesh
    serve_mesh = None
    if cfg.mode == "sgdet":
        from vidsgg.cli.data_source import setup_serve_mesh

        serve_mesh, cfg.pair_detect = setup_serve_mesh(
            cfg.data_parallel, cfg.pair_detect, max_videos
        )
    elif cfg.data_parallel > 1:
        print("NOTE: --data_parallel shards sgdet serving only on the "
              "test CLI (predcls/sgcls eval is single-device here)")
    print(f">>> TEAT-GT test: mode={cfg.mode}")

    cap = EntryCapacity(max_frames=16, max_objs=48, max_pairs=32)
    clips = ClipCaps(clip_size=5, n_clips=4, tokens_per_clip=32,
                     edges_per_clip=160, tokens_per_frame=8)
    if synthetic:
        from vidsgg.cli.data_source import make_synthetic_source

        src = make_synthetic_source(synthetic, cap, seed=99, shuffle=False, stable=True)
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
        clips = ClipCaps(clip_size=5, n_clips=-(-cap.max_frames // 5),
                         tokens_per_clip=5 * 8, edges_per_clip=320,
                         tokens_per_frame=8)
        ds = ActionGenome("test", cfg.datasize, cfg.data_path,
                          filter_small_box=cfg.mode != "predcls",
                          target_min_side=cfg.frame_size)
        det, det_vars, canvases = build_detector(
            getattr(cfg, "model_path", None), tiny=cfg.tiny_detector,
            frame_size=cfg.frame_size,
        )
        if cfg.int8:
            from vidsgg.cli.data_source import quantize_detector_int8

            det, det_vars = quantize_detector_int8(
                det, det_vars, ds, canvases, num_videos=cfg.int8_calib,
                max_frames=cap.max_frames,
            )
        if cfg.mode == "sgdet":
            from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend

            frontend = SgdetFrontend(det, det_vars, SgdetCaps(), cap,
                                     mesh=serve_mesh)
            src = make_sgdet_source(ds, cap, frontend, shuffle=False,
                                    max_videos=max_videos, canvases=canvases,
                                    pair_detect=cfg.pair_detect,
                                    pair_grouped=cfg.pair_detect > 1)
        else:
            src = make_ag_source(ds, cap, det, det_vars, shuffle=False,
                                 max_videos=max_videos, buckets=buckets,
                                 canvases=canvases)

    model = TeatGT(cfg.model_config(clips))
    import itertools

    from vidsgg.cli.data_source import PairGroup

    # probe the first item for shapes, then chain it back into the stream
    # (see tempura_test)
    _src_it = iter(src())
    first = next(_src_it)
    entry0 = (jax.tree.map(lambda a: a[0], first.entry)
              if isinstance(first, PairGroup) else first[0])
    stream = itertools.chain([first], _src_it)
    state = create_train_state(model, _MemCfg(), entry0, jax.random.PRNGKey(0),
                               make_optimizer(steps_per_epoch=1))
    if ckpt:
        state = restore_checkpoint(ckpt, state, ckpt_name)

    from vidsgg.train.eval_pipeline import EvalPipeline

    pipeline = EvalPipeline(cfg.mode, cap, needs_union=False)
    paired = None
    if cfg.mode == "sgdet" and cfg.pair_detect > 1:
        from vidsgg.train.pair_eval import PairedSgdetEval

        paired = PairedSgdetEval(pipeline, group=cfg.pair_detect,
                                 mesh=serve_mesh)
        if serve_mesh is not None:
            from vidsgg.runtime.mesh import replicate_sharding

            state = jax.device_put(state, replicate_sharding(serve_mesh))
    evs = get_ag_evaluators(cfg.mode)
    tc_s, tc_c = [], []
    t0, n = time.time(), 0

    def consume(pred, gt):
        nonlocal n
        for ev in evs:
            ev.evaluate_scene_graph(gt, pred)
        if cfg.mode != "sgdet":
            s, c = evaluate_temporal_consistency(pred, cfg.mode)
            if s is not None:
                tc_s.extend(s)
                tc_c.extend(c)
        n += 1

    from vidsgg.utils.profiling import maybe_trace

    with maybe_trace(profile_dir):  # --profile DIR: one jax.profiler trace
        for item in stream:
            if max_videos is not None and n >= max_videos:
                break
            if isinstance(item, PairGroup):  # batched off the detector
                for pred, g in paired.run_batched(state, item.entry,
                                                  item.fmaps, item.anns):
                    consume(pred, g)
                continue
            entry, fmaps, gt = item
            if paired is not None:
                for pred, g in paired.add(state, entry, fmaps, gt_entry=entry,
                                          payload=gt):
                    consume(pred, g)
                continue
            consume(pipeline(state, entry, fmaps, gt_entry=entry), gt)
        if paired is not None:
            for pred, g in paired.flush(state):
                consume(pred, g)
    print(f"evaluated {n} videos in {time.time() - t0:.1f}s")
    for name, ev in zip(("with", "semi", "no"), evs):
        ev.print_stats(metric=name)
    if tc_s:
        tc = temporal_consistency_summary(np.array(tc_s), np.array(tc_c))
        print(
            f"Temporal Consistency: spatial={tc['spatial']:.4f} "
            f"contacting={tc['contacting']:.4f} combined={tc['combined']:.4f}"
        )
    return evs


if __name__ == "__main__":
    main()
