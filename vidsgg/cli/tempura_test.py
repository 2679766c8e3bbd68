"""TEMPURA evaluation CLI (the reference's TEMPURA_test.py).

Runs the test split through the mode-aware EvalPipeline and prints the full
R@K/mR@K grid under the three constraint regimes plus the temporal-
consistency score. NOTE: the reference test scripts truncate after 10
videos (``if b >= 10: break``, TEMPURA_test.py:72) — full-split evaluation
here is the default; pass --max_videos 10 to reproduce the truncation.
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

from vidsgg.configs.tempura import TempuraRunConfig
from vidsgg.data.entry import EntryCapacity
from vidsgg.eval import get_ag_evaluators
from vidsgg.eval.temporal import (
    evaluate_temporal_consistency,
    temporal_consistency_summary,
)
from vidsgg.models.tempura import Tempura
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.checkpoint import restore_checkpoint
from vidsgg.train.eval_pipeline import EvalPipeline


def main(argv=None):
    from vidsgg.cli.flags import take_flag, take_switch

    argv = list(sys.argv[1:] if argv is None else argv)
    bf16 = take_switch(argv, "--bf16")
    synthetic = take_flag(argv, "--synthetic", int, 0)
    max_videos = take_flag(argv, "--max_videos", int)
    ckpt = take_flag(argv, "--ckpt")
    ckpt_name = take_flag(argv, "--ckpt_name", str, "best_recall")
    profile_dir = take_flag(argv, "--profile")
    cfg = TempuraRunConfig.from_args(argv)
    if max_videos is not None and cfg.pair_detect > 1:
        # pairing reorders videos (groups flush when filled) and advances
        # in group steps, so an exact first-N truncation is only
        # well-defined unpaired
        print("NOTE: --max_videos disables --pair_detect (exact truncation)")
        cfg.pair_detect = 1
    # multi-chip SERVING: --data_parallel N shards each pair group over an
    # N-device mesh — the detect jit along the video/frame axis (each chip
    # detects its own video) and the fused relation stage along the video
    # axis, params replicated.
    serve_mesh = None
    if cfg.mode == "sgdet":
        from vidsgg.cli.data_source import setup_serve_mesh

        serve_mesh, cfg.pair_detect = setup_serve_mesh(
            cfg.data_parallel, cfg.pair_detect, max_videos
        )
    elif cfg.data_parallel > 1:
        print("NOTE: --data_parallel shards sgdet serving only on the "
              "test CLI (predcls/sgcls eval is single-device here)")
    print(f">>> TEMPURA test: mode={cfg.mode}")

    cap = EntryCapacity(max_frames=16, max_objs=48, max_pairs=32)
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

        ds = ActionGenome("test", cfg.datasize, cfg.data_path,
                          filter_small_box=cfg.mode != "predcls",
                          target_min_side=cfg.frame_size)
        det, det_vars, canvases = build_detector(
            cfg.model_path, tiny=cfg.tiny_detector, frame_size=cfg.frame_size
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

    model_cfg = cfg.model_config()
    model = Tempura(model_cfg)
    import itertools

    from vidsgg.cli.data_source import PairGroup

    # probe the first item for shapes, then chain it back into the stream
    # so its (possibly whole-group) detector work is consumed, not redone
    _src_it = iter(src())
    first = next(_src_it)
    entry0 = (jax.tree.map(lambda a: a[0], first.entry)
              if isinstance(first, PairGroup) else first[0])
    stream = itertools.chain([first], _src_it)
    state = create_train_state(
        model, model_cfg, entry0, jax.random.PRNGKey(0),
        make_optimizer(steps_per_epoch=1),
    )
    if ckpt:
        state = restore_checkpoint(ckpt, state, ckpt_name)
        print(f"restored checkpoint {ckpt_name} from {ckpt} (incl. memory banks)")

    import jax.numpy as jnp

    pipeline = EvalPipeline(
        cfg.mode, cap, compute_dtype=jnp.bfloat16 if bf16 else None,
        # sgdet device postprocess expands the object axis 2x, so pairs per
        # frame are bounded by 2*dets_per_frame - 1 -> grouped union pooling
        union_pairs_per_frame=32 if cfg.mode == "sgdet" else None,
    )
    # sgdet + --pair_detect: the fused relation stage also runs vmapped
    # over the paired group (one dispatch amortizes its fixed latency)
    paired = None
    if cfg.mode == "sgdet" and cfg.pair_detect > 1:
        from vidsgg.train.pair_eval import PairedSgdetEval

        paired = PairedSgdetEval(pipeline, group=cfg.pair_detect,
                                 mesh=serve_mesh)
        if serve_mesh is not None:
            from vidsgg.runtime.mesh import replicate_sharding

            state = jax.device_put(state, replicate_sharding(serve_mesh))
    # per-class recall pickles land in output_path (the reference dumps
    # them from print_stats, evaluation_recall.py:79-83)
    evs = get_ag_evaluators(cfg.mode, output_dir=cfg.output_path)
    tc_s, tc_c = [], []
    t0 = time.time()
    n = 0

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
    dt = time.time() - t0
    print(f"evaluated {n} videos in {dt:.1f}s")
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
