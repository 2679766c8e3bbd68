"""Measure the SGDet TRAIN path on the real chip: full frontend (detect ->
IoU assignment -> SUPPLY re-pool -> GT pairs -> union featurize) + the
relation train step, at AG shapes (16-frame video, 608x1008, ResNet-101
bf16, random weights — the FLOP/host profile is weight-independent).

Round-2 baseline (docs/PERF.md "SGDet training path"): frontend 256 ms,
relation step 23 ms -> ~57 fps. Round 3 vectorized the host assembly
(per-object Python appends -> masked compaction + scatter).

Run from /root/repo with the tunnel free:  python scripts/bench_train_frontend.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FRAMES, H, W = 16, 608, 1008


def main():
    from vidsgg.data import EntryCapacity, synthetic_video_annotation
    from vidsgg.detector.faster_rcnn import FasterRCNN
    from vidsgg.detector.rpn import RPNConfig
    from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend
    from vidsgg.models import Tempura, TempuraConfig
    from vidsgg.train import create_train_state, make_optimizer
    from vidsgg.train.steps import LossFlags, make_train_step

    det = FasterRCNN(
        rpn_cfg=RPNConfig(pre_nms_top_n=1000, post_nms_top_n=128),
        dtype=jnp.bfloat16,
    )
    im_hw = jnp.array([float(H), float(W)])
    det_vars = jax.jit(det.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), im_hw
    )
    # worst case: every detection slot full (16*8) + every GT row SUPPLYed
    # (16 frames * 4 GT rows) = 192 objects
    cap = EntryCapacity(max_frames=FRAMES, max_objs=192, max_pairs=64)
    frontend = SgdetFrontend(det, det_vars, SgdetCaps(dets_per_frame=8), cap)
    ann = synthetic_video_annotation(
        num_frames=FRAMES, objs_per_frame=3, seed=0, image_wh=(W, H)
    )
    video = jnp.asarray(
        np.random.RandomState(0).rand(FRAMES, H, W, 3).astype(np.float32)
    )

    def sync(x):
        return float(jnp.asarray(x).sum())

    def frontend_once():
        return frontend(video, im_hw, 1.0, gt_annotation=ann, is_train=True)

    entry, fmaps = frontend_once()  # warm/compile
    sync(entry.features)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        entry, fmaps = frontend_once()
    sync(entry.features)
    dt_frontend = (time.perf_counter() - t0) / iters

    # paired train frontend (--pair_detect 2): one detect dispatch + ONE
    # grouped small-array transfer for two videos
    video_b = jnp.asarray(
        np.random.RandomState(1).rand(FRAMES, H, W, 3).astype(np.float32)
    )
    ann_b = synthetic_video_annotation(
        num_frames=FRAMES, objs_per_frame=3, seed=1, image_wh=(W, H)
    )
    hw_t = (float(H), float(W))
    vs_t = (float(W), float(H))
    pair_vids = [
        (video, hw_t, 1.0, vs_t, FRAMES),
        (video_b, hw_t, 1.0, vs_t, FRAMES),
    ]

    def frontend_pair_once():
        return frontend.train_pair(pair_vids, [ann, ann_b])

    res = frontend_pair_once()  # warm/compile
    sync(res[-1][0].features)
    t0 = time.perf_counter()
    for _ in range(5):
        res = frontend_pair_once()
    sync(res[-1][0].features)
    dt_frontend_pair = (time.perf_counter() - t0) / 5 / 2  # per video

    # group of 4: the one batched transfer and detect dispatch amortize
    # 4 ways
    quad_vids = pair_vids + pair_vids
    quad_anns = [ann, ann_b, ann, ann_b]

    def frontend_quad_once():
        return frontend.train_pair(quad_vids, quad_anns)

    res = frontend_quad_once()
    sync(res[-1][0].features)
    t0 = time.perf_counter()
    for _ in range(3):
        res = frontend_quad_once()
    sync(res[-1][0].features)
    dt_frontend_quad = (time.perf_counter() - t0) / 3 / 4  # per video

    # int8 train frontend (--int8 on the train CLIs): the detector is
    # frozen during relation training, so PTQ detect drives the train path
    # too. Scale VALUES don't affect speed — fill unit scales and skip the
    # calibration compiles, like bench.py's serving probe.
    det8 = det.clone(quant="int8")
    qshapes = jax.eval_shape(
        det.clone(quant="record").init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.array([64.0, 64.0]),
    )
    vars8 = dict(det_vars)
    vars8["quant"] = jax.tree.map(
        lambda s: jnp.ones(s.shape, s.dtype), qshapes["quant"]
    )
    frontend8 = SgdetFrontend(det8, vars8, SgdetCaps(dets_per_frame=8), cap)

    def frontend8_pair_once():
        return frontend8.train_pair(pair_vids, [ann, ann_b])

    res = frontend8_pair_once()
    sync(res[-1][0].features)
    t0 = time.perf_counter()
    for _ in range(5):
        res = frontend8_pair_once()
    sync(res[-1][0].features)
    dt_frontend8_pair = (time.perf_counter() - t0) / 5 / 2  # per video

    cfg = TempuraConfig.for_mode("sgdet", obj_head="gmm", rel_head="gmm")
    model = Tempura(cfg)
    state = create_train_state(
        model, cfg, entry, jax.random.PRNGKey(0),
        make_optimizer(steps_per_epoch=100),
    )
    step = make_train_step(LossFlags(mode="sgdet", obj_con_loss="euc_con"))
    rng = jax.random.PRNGKey(1)
    state, m = step(state, entry, rng)  # warm/compile
    sync(m["total_loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, entry, jax.random.fold_in(rng, i))
    sync(m["total_loss"])
    dt_step = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "train_frontend_ms_per_video": round(dt_frontend * 1e3, 1),
        "train_frontend_pair2_ms_per_video": round(dt_frontend_pair * 1e3, 1),
        "train_frontend_pair4_ms_per_video": round(dt_frontend_quad * 1e3, 1),
        "train_frontend_int8_pair2_ms_per_video": round(
            dt_frontend8_pair * 1e3, 1
        ),
        "relation_train_step_ms_per_video": round(dt_step * 1e3, 1),
        "sgdet_train_fps": round(FRAMES / (dt_frontend + dt_step), 1),
        "sgdet_train_fps_pair2": round(
            FRAMES / (dt_frontend_pair + dt_step), 1
        ),
        "sgdet_train_fps_pair4": round(
            FRAMES / (dt_frontend_quad + dt_step), 1
        ),
        "sgdet_train_fps_int8_pair2": round(
            FRAMES / (dt_frontend8_pair + dt_step), 1
        ),
    }))


if __name__ == "__main__":
    main()
