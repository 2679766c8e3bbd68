"""TEAT-GT training CLI (the reference's TEATGT_train.py).

Example:
  python -m vidsgg.cli.teatgt_train --mode predcls --synthetic 16 --nepoch 1 \
      --use_cons_str_loss --use_cons_sem_loss
"""

from __future__ import annotations

import sys

import jax

from vidsgg.configs.teatgt import TeatGTRunConfig
from vidsgg.data.entry import EntryCapacity
from vidsgg.models.graph_build import ClipCaps
from vidsgg.models.teatgt import TeatGT
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.loop import TrainLoopConfig, run_training
from vidsgg.train.metrics import MetricsWriter


class _MemCfg:
    tracking = False
    num_classes = 37


def main(argv=None):
    import os

    from vidsgg.cli.flags import take_flag

    argv = list(sys.argv[1:] if argv is None else argv)
    synthetic = take_flag(argv, "--synthetic", int, 0)
    profile_dir = take_flag(argv, "--profile")
    word_vectors = take_flag(argv, "--word_vectors")
    if word_vectors:  # models resolve the asset through the env var
        os.environ["VIDSGG_WORD_VECTORS"] = word_vectors
    cfg = TeatGTRunConfig.from_args(argv)
    print(f">>> TEAT-GT train: mode={cfg.mode} synthetic={synthetic or 'off'}")

    from vidsgg.models.embeddings import word_vectors_available

    wv_ok, wv_path = word_vectors_available()
    if wv_ok:
        print(f"word vectors: {wv_path}")
    else:
        print("WARNING: no GloVe word-vector asset (--word_vectors / "
              "VIDSGG_WORD_VECTORS unset); label-embedding tables "
              "pseudo-init — from-scratch training differs from the "
              "reference's glove.6B.200d init")

    cap = EntryCapacity(max_frames=16, max_objs=48, max_pairs=32)
    clips = ClipCaps(clip_size=5, n_clips=4, tokens_per_clip=32,
                     edges_per_clip=160, tokens_per_frame=8)
    if synthetic:
        from vidsgg.cli.data_source import make_synthetic_source

        train_src = make_synthetic_source(synthetic, cap, seed=cfg.seed)
        val_src = make_synthetic_source(max(4, synthetic // 4), cap,
                                        seed=cfg.seed + 1, shuffle=False)
        steps_per_epoch = synthetic
    else:
        from vidsgg.cli.data_source import (
            build_detector, default_buckets, make_ag_source,
        )
        from vidsgg.data.action_genome import ActionGenome

        # bucket the data pipeline; clip buffers are sized for the largest
        # bucket (ClipCaps is a static model capacity, so TEAT-GT compute
        # specializes per bucket only through the detector/base stage)
        buckets = default_buckets(max_frames=cfg.bucket_frames)
        cap = buckets[-1]
        clips = ClipCaps(
            clip_size=5,
            n_clips=-(-cap.max_frames // 5),
            tokens_per_clip=5 * 8,
            edges_per_clip=320,
            tokens_per_frame=8,
        )

        train_ds = ActionGenome("train", cfg.datasize, cfg.data_path,
                                filter_small_box=cfg.mode != "predcls",
                                target_min_side=cfg.frame_size)
        test_ds = ActionGenome("test", cfg.datasize, cfg.data_path,
                               filter_small_box=cfg.mode != "predcls",
                               target_min_side=cfg.frame_size)
        det, det_vars, canvases = build_detector(
            getattr(cfg, "model_path", None), tiny=cfg.tiny_detector,
            frame_size=cfg.frame_size,
        )
        if cfg.int8:
            # frozen detector -> int8 is sound on the train path too (see
            # cli/tempura_train.py); calibrated on the train split
            from vidsgg.cli.data_source import quantize_detector_int8

            det, det_vars = quantize_detector_int8(
                det, det_vars, train_ds, canvases,
                num_videos=cfg.int8_calib, max_frames=cap.max_frames,
            )
        if cfg.mode == "sgdet":
            # detector boxes + GT assignment + SUPPLY for training (the
            # reference trains sgdet through the detector front-end,
            # object_detector.py:57-302)
            from vidsgg.cli.data_source import make_sgdet_source
            from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend

            frontend = SgdetFrontend(det, det_vars, SgdetCaps(), cap)
            train_src = make_sgdet_source(
                train_ds, cap, frontend, is_train=True, seed=cfg.seed,
                canvases=canvases, pair_detect=cfg.pair_detect,
            )
            val_src = make_sgdet_source(test_ds, cap, frontend, shuffle=False,
                                        canvases=canvases,
                                        pair_detect=cfg.pair_detect)
        else:
            train_src = make_ag_source(train_ds, cap, det, det_vars,
                                       seed=cfg.seed, buckets=buckets,
                                       canvases=canvases)
            val_src = make_ag_source(test_ds, cap, det, det_vars,
                                     shuffle=False, buckets=buckets,
                                     canvases=canvases)
        steps_per_epoch = len(train_ds)

    model_cfg = cfg.model_config(clips)
    model = TeatGT(model_cfg)
    # epoch-indexed reference schedule vs optax step count: one optimizer
    # step per N-video group under --data_parallel N (see tempura_train)
    steps_per_epoch = max(1, -(-steps_per_epoch // max(cfg.data_parallel, 1)))
    tx = make_optimizer(base_lr=cfg.lr, warmup_period=cfg.warmup,
                        steps_per_epoch=steps_per_epoch)
    entry0, _, _ = next(iter(train_src()))
    state = create_train_state(model, _MemCfg(), entry0,
                               jax.random.PRNGKey(cfg.seed), tx)
    from vidsgg.runtime.prefetch import prefetch

    train_src = prefetch(train_src, depth=2)
    writer = MetricsWriter(cfg.save_path)
    loop_cfg = TrainLoopConfig(
        mode=cfg.mode, nepoch=cfg.nepoch, log_iter=cfg.log_iter,
        save_path=cfg.save_path, mem_enabled=False,
        data_parallel=cfg.data_parallel,
    )
    if cfg.data_parallel > 1:
        print(f">>> data-parallel over {cfg.data_parallel} devices "
              f"({jax.device_count()} visible)")
    from vidsgg.utils.profiling import maybe_trace

    with maybe_trace(profile_dir):  # --profile DIR: one jax.profiler trace
        state = run_training(
            state, cfg.loss_flags(), loop_cfg, train_src, val_src, cap, writer,
            jax.random.PRNGKey(cfg.seed + 1),
        )
    writer.close()
    print(">>> TEAT-GT train complete")
    return state


if __name__ == "__main__":
    main()
