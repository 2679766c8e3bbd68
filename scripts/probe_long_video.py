"""One-off probe: long-video sgdet serving in the COMPACT regime.

The CLI's default buckets give EntryCapacity(64, 256, 192) while the
detector keeps up to 16 detections/frame, so 64-frame videos run the
compact device pack (capacity < frames x dets_per_frame). Measures the
end-to-end fused path at a 64-frame video, single and --pair_detect 2,
including the per-group detection-count fetch. Prints one JSON line.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = 64
H, W = 608, 1008


def main():
    from vidsgg.data import EntryCapacity
    from vidsgg.detector.faster_rcnn import FasterRCNN
    from vidsgg.detector.rpn import RPNConfig
    from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend
    from vidsgg.models import Tempura, TempuraConfig
    from vidsgg.train import create_train_state, make_optimizer
    from vidsgg.train.eval_pipeline import sgdet_fused_stage
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
    # the CLI's default_buckets(64) capacities: compact regime
    # (256 < 64 * 16 detection slots)
    cap = EntryCapacity(max_frames=FRAMES, max_objs=256, max_pairs=192)
    caps = SgdetCaps()  # dets_per_frame=16, CLI default
    frontend = SgdetFrontend(det_model, det_vars, caps, cap)
    assert not frontend.eval_full_capacity(FRAMES)

    cfg = TempuraConfig.for_mode("sgdet", obj_head="gmm", rel_head="gmm")
    videos = [
        jnp.asarray(np.random.RandomState(s).rand(FRAMES, H, W, 3)
                    .astype(np.float32))
        for s in range(2)
    ]
    try:
        entry, fmaps = frontend(videos[0], im_hw, 1.0, is_train=False)
        frontend(videos[1], im_hw, 1.0, is_train=False)
    except ValueError as e:
        # the product path SKIPS over-capacity videos; with random weights
        # the detection count is workload-dependent, so report and exit
        # instead of measuring a path the data wouldn't take
        print(json.dumps({"skipped": str(e)}))
        return
    state = create_train_state(
        Tempura(cfg), cfg, entry, rng, make_optimizer(steps_per_epoch=1)
    )
    hw_t, vs_t = (float(H), float(W)), (float(W), float(H))
    UNION_PPF = 2 * caps.dets_per_frame

    def sync(x):
        return float(jnp.asarray(x).sum())

    def e2e_single():
        e, fm = frontend(videos[0], im_hw, 1.0, is_train=False)
        _, out, _ = sgdet_fused_stage(state, e, fm, True, UNION_PPF)
        return out["contacting_distribution"]

    pair_args = [(videos[i], hw_t, 1.0, vs_t, FRAMES) for i in range(2)]

    def e2e_pair():
        e_b, bf_b, n = frontend.eval_pair_batched(pair_args)
        # the per-group count fetch the product path pays (over-capacity
        # videos would be skipped there; here both fixtures fit — checked
        # by the single-path warmup above)
        _ = np.asarray(n) <= cap.max_objs
        _, out_b, _ = sgdet_fused_pair_stage(state, e_b, bf_b, True,
                                             UNION_PPF)
        return out_b["contacting_distribution"]

    out = {}
    for name, fn, iters, per in (("single", e2e_single, 4, 1),
                                 ("pair2", e2e_pair, 3, 2)):
        sync(fn())  # compile
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = fn()
        sync(r)
        dt = (time.perf_counter() - t0) / iters / per
        out[f"{name}_ms_per_video"] = round(dt * 1e3, 1)
        out[f"{name}_fps"] = round(FRAMES / dt, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
