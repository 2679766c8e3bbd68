"""One-off probe: does pair_detect scale past 2?

Measures the paired serving path (eval_pair_batched -> vmapped fused
stage) at group sizes 1/2/3/4 on AG-scale shapes. Informs the default
--pair_detect recommendation (docs/PERF.md). Run standalone on the TPU;
prints one JSON line.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = 20
H, W = 608, 1008
DETS_PER_FRAME = 8


def main():
    from vidsgg.data import EntryCapacity
    from vidsgg.detector.faster_rcnn import FasterRCNN
    from vidsgg.detector.rpn import RPNConfig
    from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend
    from vidsgg.models import Tempura, TempuraConfig
    from vidsgg.train import create_train_state, make_optimizer
    from vidsgg.train.pair_eval import sgdet_fused_pair_stage

    rng = jax.random.PRNGKey(0)
    det_model = FasterRCNN(
        rpn_cfg=RPNConfig(pre_nms_top_n=1000, post_nms_top_n=128),
        dtype=jnp.bfloat16,
    )
    im_hw = jnp.array([float(H), float(W)])
    det_vars = jax.jit(det_model.init)(
        rng, jnp.zeros((1, H, W, 3), jnp.float32), im_hw
    )
    cap = EntryCapacity(max_frames=FRAMES, max_objs=FRAMES * DETS_PER_FRAME,
                        max_pairs=48)
    frontend = SgdetFrontend(
        det_model, det_vars, SgdetCaps(dets_per_frame=DETS_PER_FRAME), cap
    )
    cfg = TempuraConfig.for_mode("sgdet", obj_head="gmm", rel_head="gmm")
    videos = [
        jnp.asarray(np.random.RandomState(s).rand(FRAMES, H, W, 3)
                    .astype(np.float32))
        for s in range(4)
    ]
    entry, _ = frontend(videos[0], im_hw, 1.0, is_train=False)
    state = create_train_state(
        Tempura(cfg), cfg, entry, rng, make_optimizer(steps_per_epoch=1)
    )
    hw_t, vs_t = (float(H), float(W)), (float(W), float(H))

    def sync(x):
        return float(jnp.asarray(x).sum())

    out = {}
    for g in (1, 2, 3, 4):
        args = [(videos[i], hw_t, 1.0, vs_t, FRAMES) for i in range(g)]

        def run():
            e_b, bf_b, _ = frontend.eval_pair_batched(args)
            _, o, _ = sgdet_fused_pair_stage(state, e_b, bf_b, True,
                                             2 * DETS_PER_FRAME)
            return o["contacting_distribution"]

        sync(run())  # compile
        iters = max(2, 6 // g)
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = run()
        sync(r)
        dt = (time.perf_counter() - t0) / iters / g
        out[f"group{g}_ms_per_video"] = round(dt * 1e3, 1)
        out[f"group{g}_fps"] = round(FRAMES / dt, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
