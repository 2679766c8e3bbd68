"""TEMPURA training CLI (the reference's TEMPURA_train.py).

Usage mirrors the reference flags (tempura_config.py), plus:
  --synthetic N   train on N synthetic videos (no dataset/detector needed)

Example:
  python -m vidsgg.cli.tempura_train --mode predcls --synthetic 32 --nepoch 2
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from vidsgg.configs.tempura import TempuraRunConfig
from vidsgg.data.entry import EntryCapacity
from vidsgg.models.tempura import Tempura
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.loop import TrainLoopConfig, run_training
from vidsgg.train.metrics import MetricsWriter


def main(argv=None):
    import os

    from vidsgg.cli.flags import take_flag

    argv = list(sys.argv[1:] if argv is None else argv)
    synthetic = take_flag(argv, "--synthetic", int, 0)
    resume = take_flag(argv, "--resume")
    profile_dir = take_flag(argv, "--profile")
    word_vectors = take_flag(argv, "--word_vectors")
    if word_vectors:  # models resolve the asset through the env var
        os.environ["VIDSGG_WORD_VECTORS"] = word_vectors
    cfg = TempuraRunConfig.from_args(argv)
    print(f">>> TEMPURA train: mode={cfg.mode} synthetic={synthetic or 'off'}")

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
    if synthetic:
        from vidsgg.cli.data_source import make_synthetic_source

        train_src = make_synthetic_source(synthetic, cap, seed=cfg.seed)
        val_src = make_synthetic_source(max(4, synthetic // 4), cap, seed=cfg.seed + 1,
                                        shuffle=False)
        steps_per_epoch = synthetic
    else:
        from vidsgg.cli.data_source import (
            build_detector, default_buckets, make_ag_source,
        )
        from vidsgg.data.action_genome import ActionGenome

        # ascending per-video-size buckets: one jit specialization each,
        # bounded padding waste, no silent drops below the largest bucket
        buckets = default_buckets(max_frames=cfg.bucket_frames)
        cap = buckets[-1]

        train_ds = ActionGenome(
            "train", cfg.datasize, cfg.data_path,
            filter_small_box=cfg.mode != "predcls",
            target_min_side=cfg.frame_size,
        )
        test_ds = ActionGenome(
            "test", cfg.datasize, cfg.data_path,
            filter_small_box=cfg.mode != "predcls",
            target_min_side=cfg.frame_size,
        )
        det, det_vars, canvases = build_detector(
            cfg.model_path, tiny=cfg.tiny_detector, frame_size=cfg.frame_size
        )
        if cfg.int8:
            # the detector is frozen during relation training (the reference
            # keeps Faster R-CNN in eval mode with no grads,
            # object_detector.py:85-94), so int8 detect/featurize is sound
            # on the train path too; calibration uses the train split
            # (target_min_side is baked into the ActionGenome constructor)
            from vidsgg.cli.data_source import quantize_detector_int8

            det, det_vars = quantize_detector_int8(
                det, det_vars, train_ds, canvases,
                num_videos=cfg.int8_calib, max_frames=cap.max_frames,
            )
        if cfg.mode == "sgdet":
            # full-detection training: detector boxes + IoU GT assignment +
            # SUPPLY (object_detector.py:57-302, consumed at
            # TEMPURA_train.py:160-161) — NOT the GT-box featurization
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

    model_cfg = cfg.model_config()
    model = Tempura(model_cfg)
    # the reference schedule is EPOCH-indexed (warmup epochs, 0.8^epoch
    # decay) but optax counts OPTIMIZER steps; under --data_parallel N each
    # N-video group is one step, so scale steps_per_epoch accordingly or
    # the decay/warmup would run N times too slowly
    steps_per_epoch = max(1, -(-steps_per_epoch // max(cfg.data_parallel, 1)))
    tx = make_optimizer(
        base_lr=cfg.lr, warmup_period=cfg.warmup, steps_per_epoch=steps_per_epoch
    )
    entry0, _, _ = next(iter(train_src()))
    state = create_train_state(
        model, model_cfg, entry0, jax.random.PRNGKey(cfg.seed), tx
    )
    if resume:
        # proper train-resume (the reference ships it disabled behind
        # ``if False:``, TEMPURA_train.py:79-83) — restores params,
        # optimizer state, step, and memory banks
        from vidsgg.train.checkpoint import restore_checkpoint

        state = restore_checkpoint(resume, state, "best_recall")
        print(f"resumed from {resume} at step {int(state.step)}")
    from vidsgg.runtime.prefetch import prefetch

    train_src = prefetch(train_src, depth=2)
    writer = MetricsWriter(cfg.save_path)
    loop_cfg = TrainLoopConfig(
        mode=cfg.mode,
        nepoch=cfg.nepoch,
        log_iter=cfg.log_iter,
        save_path=cfg.save_path,
        rel_mem_weight_type=cfg.rel_mem_weight_type,
        obj_mem_weight_type=cfg.obj_mem_weight_type,
        obj_mem_compute=cfg.obj_mem_compute,
        mem_enabled=cfg.rel_mem_compute is not None,
        data_parallel=cfg.data_parallel,
    )
    if cfg.data_parallel > 1:
        print(f">>> data-parallel over {cfg.data_parallel} devices "
              f"({jax.device_count()} visible)")
    from vidsgg.utils.profiling import maybe_trace

    with maybe_trace(profile_dir):  # --profile DIR: one jax.profiler trace
        state = run_training(
            state, cfg.loss_flags(), loop_cfg, train_src, val_src, cap, writer,
            jax.random.PRNGKey(cfg.seed + 1), model_cfg=model_cfg,
        )
    writer.close()
    print(">>> TEMPURA train complete")
    return state


if __name__ == "__main__":
    main()
