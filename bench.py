"""Benchmark: SGDet frames/sec/chip, end-to-end honest, plus MFU.

v2 (round 2): measures the REAL serving path, not just the two device jit
regions —

  end-to-end: raw frames -> SgdetFrontend (full ResNet-101 Faster R-CNN
  forward, per-class NMS grid, host packing of the padded detections into a
  relation Entry) -> fused sgdet eval stage (OSPU classify + on-device
  clean_class/NMS/relabel/pair-rebuild + union ROIAlign + STTran + GMM
  heads) — one video at a time, exactly like the eval CLI.

Also reported: the device-only fps of the two jit regions (detection,
relation) and MFU = analytic XLA FLOPs per video / wall time / bf16 peak.

Weights are random (the AG-finetuned detector checkpoint is external data),
which does not change the FLOP/bandwidth profile being measured.

Baseline: the reference publishes no throughput numbers (BASELINE.md); its
train loop prints only seconds/batch. STTran-lineage SGDet stacks run at
roughly ~5 frames/s on the single consumer GPU the reference targets, so
vs_baseline is reported against a 5 fps estimate — the driver's >=5x target
corresponds to vs_baseline >= 5.

Prints exactly one JSON line (primary metric = end-to-end fps).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS_ESTIMATE = 5.0
V5E_BF16_PEAK = 197e12  # flops/s per chip

FRAMES = 20
H, W = 608, 1008     # min-side-600 AG resolution, padded to /16
DETS_PER_FRAME = 8   # detections kept per frame (AG sgdet-scale load)
MAX_OBJS = FRAMES * DETS_PER_FRAME  # random weights fill every slot
MAX_PAIRS = 48
# structural per-frame pair bound after the sgdet postprocess 2x expansion
# (pairs/frame <= 2*dets_per_frame - 1) -> grouped per-frame union pooling
UNION_PPF = 2 * DETS_PER_FRAME


def _flops(jitted, *args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def build():
    from vidsgg.data import EntryCapacity
    from vidsgg.detector.faster_rcnn import FasterRCNN
    from vidsgg.detector.rpn import RPNConfig
    from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend
    from vidsgg.models import Tempura, TempuraConfig
    from vidsgg.train import create_train_state, make_optimizer
    from vidsgg.train.eval_pipeline import sgdet_fused_stage

    rng = jax.random.PRNGKey(0)
    det_model = FasterRCNN(
        rpn_cfg=RPNConfig(pre_nms_top_n=1000, post_nms_top_n=128),
        dtype=jnp.bfloat16,
    )
    chunk0 = jnp.zeros((FRAMES, H, W, 3), jnp.float32)
    im_hw = jnp.array([float(H), float(W)])
    det_vars = jax.jit(det_model.init)(rng, chunk0[:1], im_hw)

    cap = EntryCapacity(max_frames=FRAMES, max_objs=MAX_OBJS, max_pairs=MAX_PAIRS)
    frontend = SgdetFrontend(
        det_model, det_vars, SgdetCaps(dets_per_frame=DETS_PER_FRAME), cap
    )

    cfg = TempuraConfig.for_mode("sgdet", obj_head="gmm", rel_head="gmm")
    rel_model = Tempura(cfg)

    video = jnp.asarray(
        np.random.RandomState(0).rand(FRAMES, H, W, 3).astype(np.float32)
    )

    # one frontend pass to get a representative entry (also warms detect)
    entry, fmaps = frontend(video, im_hw, 1.0, is_train=False)
    state = create_train_state(
        rel_model, cfg, entry, rng, make_optimizer(steps_per_epoch=1)
    )

    def e2e_video():
        e, fm = frontend(video, im_hw, 1.0, is_train=False)
        e2, out, overflow = sgdet_fused_stage(state, e, fm, True, UNION_PPF)
        return out["contacting_distribution"]

    def detect_only():
        return frontend.detect(det_vars, video, im_hw, jnp.asarray(1.0))["scores"]

    def relation_only():
        _, out, _ = sgdet_fused_stage(state, entry, fmaps, True, UNION_PPF)
        return out["contacting_distribution"]

    def sync(x):
        # under the axon tunnel block_until_ready does not synchronize; a
        # host transfer does. One sync per measurement window (a per-call
        # sync would add a ~25-30 ms tunnel round trip to every video).
        return float(jnp.asarray(x).sum())

    # batched-detect probe: 2 videos (2*FRAMES frames) through ONE detect
    # dispatch — answers whether a bigger conv batch amortizes the
    # thin-channel ResNet stages that cap MFU (docs/PERF.md roofline note)
    video2 = jnp.concatenate([video, video], axis=0)

    def detect_batch2():
        return frontend.detect(det_vars, video2, im_hw, jnp.asarray(1.0))["scores"]

    # the REAL paired serving path (--pair_detect 2): eval_pair packs both
    # videos through one detect dispatch, then the fused relation stage runs
    # VMAPPED over the pair (one dispatch amortizes its fixed latency) —
    # exactly what make_sgdet_source(pair_detect=2) + PairedSgdetEval drive
    from vidsgg.runtime.parallel import stack_entries
    from vidsgg.train.pair_eval import sgdet_fused_pair_stage

    video_b = jnp.asarray(
        np.random.RandomState(1).rand(FRAMES, H, W, 3).astype(np.float32)
    )
    hw_t = (float(H), float(W))
    vs_t = (float(W), float(H))
    pair_args = [
        (video, hw_t, 1.0, vs_t, FRAMES),
        (video_b, hw_t, 1.0, vs_t, FRAMES),
    ]

    def e2e_pair():
        # batched end-to-end: the detect jit emits the video batch, the
        # vmapped fused stage consumes it — no per-video slice/restack
        # dispatches in between (they measurably outweigh the vmap win)
        e_b, bf_b, _ = frontend.eval_pair_batched(pair_args)
        _, out_b, _ = sgdet_fused_pair_stage(state, e_b, bf_b, True,
                                             UNION_PPF)
        return out_b["contacting_distribution"]

    entry_b = stack_entries([entry, entry])
    fmaps_b = jnp.stack([jnp.asarray(fmaps)] * 2)

    def relation_pair2():
        _, out_b, _ = sgdet_fused_pair_stage(state, entry_b, fmaps_b, True,
                                             UNION_PPF)
        return out_b["contacting_distribution"]

    # int8 serving probe (--int8): PTQ detector convs — s8 x s8 -> s32 runs
    # at 2x the bf16 MXU rate on v5e and halves activation HBM bytes on the
    # thin-channel stages. Scale VALUES don't affect speed, so the bench
    # skips the record-mode calibration pass (saves two slow remote
    # compiles) and fills unit scales; the CLI path calibrates for real
    # (vidsgg/cli/data_source.py:quantize_detector_int8).
    det8 = det_model.clone(quant="int8")
    qshapes = jax.eval_shape(
        det_model.clone(quant="record").init, rng, chunk0[:1], im_hw
    )
    vars8 = dict(det_vars)
    vars8["quant"] = jax.tree.map(
        lambda s: jnp.ones(s.shape, s.dtype), qshapes["quant"]
    )
    frontend8 = SgdetFrontend(
        det8, vars8, SgdetCaps(dets_per_frame=DETS_PER_FRAME), cap
    )

    def e2e_pair_int8():
        e_b, bf_b, _ = frontend8.eval_pair_batched(pair_args)
        _, out_b, _ = sgdet_fused_pair_stage(state, e_b, bf_b, True,
                                             UNION_PPF)
        return out_b["contacting_distribution"]

    flops_detect = _flops(frontend.detect, det_vars, video, im_hw, jnp.asarray(1.0))
    flops_rel = _flops(sgdet_fused_stage, state, entry, fmaps, True, UNION_PPF)

    return (e2e_video, detect_only, relation_only, detect_batch2, e2e_pair,
            relation_pair2, e2e_pair_int8, sync, flops_detect + flops_rel)


def _time_window(fn, sync, iters):
    sync(fn())  # warmup/compile
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    (e2e_video, detect_only, relation_only, detect_batch2, e2e_pair,
     relation_pair2, e2e_pair_int8, sync, flops_video) = build()

    dt_detect = _time_window(detect_only, sync, 10)
    dt_rel = _time_window(relation_only, sync, 10)
    dt_rel_p2 = _time_window(relation_pair2, sync, 10) / 2   # per video
    dt_detect_b2 = _time_window(detect_batch2, sync, 5) / 2  # per video
    dt_e2e = _time_window(e2e_video, sync, 6)
    dt_e2e_pair = _time_window(e2e_pair, sync, 5) / 2        # per video
    try:
        dt_e2e_int8 = _time_window(e2e_pair_int8, sync, 5) / 2  # per video
    except Exception as exc:  # the int8 probe must never cost the headline
        import sys

        print(f"int8 probe failed: {type(exc).__name__}: {exc}",
              file=sys.stderr)
        dt_e2e_int8 = None

    fps_e2e = FRAMES / dt_e2e
    fps_pair = FRAMES / dt_e2e_pair
    # headline = best CLI-reachable serving config (--pair_detect 2 when it
    # wins, the default single-video path otherwise)
    fps_best = max(fps_e2e, fps_pair)
    fps_device = FRAMES / (dt_detect + dt_rel)
    mfu = (
        flops_video * fps_best / FRAMES / V5E_BF16_PEAK
        if flops_video else None
    )
    print(
        json.dumps(
            {
                "metric": "sgdet_frames_per_sec_per_chip",
                "value": round(fps_best, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps_best / BASELINE_FPS_ESTIMATE, 2),
                "e2e_fps_single": round(fps_e2e, 2),
                "e2e_fps_pair_detect2": round(fps_pair, 2),
                # --int8 serving (PTQ detector); reported alongside, not as
                # the headline: quantization changes numerics and the
                # accuracy gate needs the real AG checkpoint to score
                "e2e_fps_pair_int8": (
                    round(FRAMES / dt_e2e_int8, 2) if dt_e2e_int8 else None
                ),
                "device_only_fps": round(fps_device, 2),
                "detect_ms_per_video": round(dt_detect * 1e3, 1),
                "detect_ms_per_video_batch2": round(dt_detect_b2 * 1e3, 1),
                "relation_ms_per_video": round(dt_rel * 1e3, 1),
                "relation_ms_per_video_pair2": round(dt_rel_p2 * 1e3, 1),
                "host_overhead_ms_per_video": round(
                    (dt_e2e - dt_detect - dt_rel) * 1e3, 1
                ),
                "mfu": round(mfu, 4) if mfu is not None else None,
                "analytic_tflops_per_video": round(flops_video / 1e12, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
