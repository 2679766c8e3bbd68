"""Video sources for the training/eval loops.

Two front-ends produce the same (entry, fmaps, gt_annotation) stream:

* synthetic — cached-feature bring-up mode (SURVEY.md §7.2 step 2): random
  base feature maps + a fixed random head stand in for the frozen detector,
  so the relation stack trains end-to-end without the AG dataset or the
  external Faster R-CNN checkpoint;
* action-genome — real frames through the Flax Faster R-CNN base (weights
  via vidsgg.detector.convert when the AG checkpoint is available).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.data import EntryCapacity, build_gt_entry, synthetic_video_annotation
from vidsgg.data.gt_entries import video_counts
from vidsgg.data.synthetic import synthetic_base_fmaps
from vidsgg.detector.featurize import featurize_gt_entry


@dataclasses.dataclass
class PairGroup:
    """A ``pair_detect`` group kept batched end-to-end (leading video axis
    on ``entry``/``fmaps``): emitted by ``make_sgdet_source(...,
    pair_grouped=True)`` for consumers that feed the vmapped fused stage
    directly (``PairedSgdetEval.run_batched``). Slicing per video and
    restacking later costs a chain of eager dispatches that outweighs the
    batching win through the device tunnel."""

    entry: object
    fmaps: object
    anns: list


@dataclasses.dataclass
class SourceStats:
    """Honest per-epoch accounting: how many videos flowed vs were dropped
    for exceeding every bucket (silent drops were a round-1 weakness)."""

    yielded: int = 0
    skipped: int = 0
    bucket_counts: dict = dataclasses.field(default_factory=dict)

    def reset(self):
        self.yielded = 0
        self.skipped = 0
        self.bucket_counts.clear()

    @property
    def skip_rate(self) -> float:
        total = self.yielded + self.skipped
        return self.skipped / total if total else 0.0


# Spatial canvases (multiples of 16) covering AG's min-side-600 resize:
# landscape, near-square and portrait aspect ratios. Each distinct canvas is
# ONE detector jit specialization — without them every distinct video
# resolution costs a full recompile (minutes per shape on a remote-compile
# TPU tunnel). Proposals still clip to the true (h, w), so the zero padding
# beyond the image edge contributes nothing.
DEFAULT_CANVASES = (
    (608, 816), (608, 1008), (608, 1152),
    (816, 608), (1008, 608), (816, 816),
)


def scale_canvases(frame_size: int, canvases=DEFAULT_CANVASES,
                   base: int = 600):
    """Canvas set for a non-default min-side resize target (--frame_size):
    each default canvas scaled by frame_size/600 and rounded up to /16.
    frame_size == 600 returns the defaults unchanged."""
    if frame_size == base:
        return canvases
    s = frame_size / base
    return tuple(
        (-(-int(round(ch * s)) // 16) * 16, -(-int(round(cw * s)) // 16) * 16)
        for ch, cw in canvases
    )


def pick_canvas(h: int, w: int, canvases=DEFAULT_CANVASES):
    """Smallest-area canvas covering (h, w); None if none fits (the caller
    falls back to the exact /16-padded shape, paying one compile)."""
    best = None
    for ch, cw in canvases:
        if h <= ch and w <= cw and (best is None or ch * cw < best[0] * best[1]):
            best = (ch, cw)
    return best


def default_buckets(
    max_frames: int = 64, objs_per_frame: int = 4, pairs_per_frame: int = 3
) -> list[EntryCapacity]:
    """Ascending video-size buckets (16/32/.../max frames). Each distinct
    bucket is one jit specialization; short videos stop paying the padding
    of long ones, and videos up to ``max_frames`` are admitted rather than
    dropped."""
    buckets = []
    f = 16
    while f < max_frames:
        buckets.append(
            EntryCapacity(f, objs_per_frame * f, pairs_per_frame * f)
        )
        f *= 2
    buckets.append(
        EntryCapacity(max_frames, objs_per_frame * max_frames,
                      pairs_per_frame * max_frames)
    )
    return buckets


def make_synthetic_source(
    n_videos: int,
    cap: EntryCapacity,
    seed: int = 0,
    num_frames: int = 6,
    objs_per_frame: int = 2,
    shuffle: bool = True,
    stable: bool = False,
):
    """Callable returning an iterator of (entry, fmaps, gt_annotation)."""
    w = jax.random.normal(jax.random.PRNGKey(7), (1024, 2048)) * 0.02
    head = lambda p: p.mean(axis=(1, 2)) @ w
    featurize = jax.jit(lambda e, f: featurize_gt_entry(e, f, head))

    videos = []
    for i in range(n_videos):
        ann = synthetic_video_annotation(
            num_frames=num_frames, objs_per_frame=objs_per_frame,
            seed=seed * 10007 + i, stable=stable,
        )
        entry = build_gt_entry(ann, cap)
        fmaps = jnp.array(
            synthetic_base_fmaps(cap.max_frames, hw=(12, 20), seed=seed * 31 + i)
        )
        entry = featurize(entry, fmaps)
        # detector-style class scores biased toward GT (sgcls/sgdet input)
        rng = np.random.RandomState(i)
        logits = rng.randn(cap.max_objs, 36).astype(np.float32)
        lbl = np.asarray(entry.labels)
        logits[np.arange(cap.max_objs), np.clip(lbl - 1, 0, 35)] += 4.0
        dist = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        dist *= np.asarray(entry.obj_mask)[:, None]
        entry = entry.replace(distribution=jnp.asarray(dist))
        videos.append((entry, fmaps, ann))

    def source():
        order = np.random.permutation(n_videos) if shuffle else np.arange(n_videos)
        for i in order:
            yield videos[i]

    return source


def pick_bucket(buckets: list[EntryCapacity], f: int, nb: int, p: int):
    """Smallest bucket covering a video (buckets sorted ascending); None if
    none fits. Distinct buckets give distinct jit specializations, bounding
    padding waste on short videos while still admitting long ones."""
    for b in buckets:
        if f <= b.max_frames and nb <= b.max_objs and p <= b.max_pairs:
            return b
    return None


def make_ag_source(
    dataset,
    cap: EntryCapacity,
    detector_model=None,
    detector_variables=None,
    shuffle: bool = True,
    seed: int = 1123,
    max_videos: int | None = None,
    buckets: list[EntryCapacity] | None = None,
    canvases=DEFAULT_CANVASES,
    yield_index: bool = False,
):
    """Action Genome source (predcls/sgcls GT-box path).

    With ``yield_index``, items are ``(dataset_index, entry, fmaps, ann)`` —
    the qualitative-evaluation CLI uses the index to reload display frames
    for scene-graph overlays.

    With ``buckets`` (ascending capacities), each video is padded to the
    smallest covering bucket; otherwise everything uses ``cap`` and
    over-capacity videos are skipped. Either way the returned callable
    carries a ``stats`` :class:`SourceStats` with honest yield/skip counts.

    Without a detector model, a fixed random base map + projection head
    stand in (cached-feature bring-up, SURVEY.md §7.2 step 2).
    """
    if detector_model is not None:
        base_fn = jax.jit(
            lambda v, x: detector_model.apply(v, x, method="base_features")
        )
        head_fn = lambda pooled: detector_model.apply(
            detector_variables, pooled, method="head_to_tail"
        )
    else:
        w = jax.random.normal(jax.random.PRNGKey(7), (1024, 2048)) * 0.02
        base_fn = jax.jit(
            lambda _v, x: jax.random.normal(
                jax.random.PRNGKey(11),
                (x.shape[0], max(x.shape[1] // 16, 1), max(x.shape[2] // 16, 1), 1024),
            )
        )
        head_fn = lambda pooled: pooled.mean(axis=(1, 2)) @ w
    featurize = jax.jit(lambda e, f: featurize_gt_entry(e, f, head_fn))

    rng = np.random.RandomState(seed)
    stats = SourceStats()

    def source():
        stats.reset()
        n = len(dataset) if max_videos is None else min(max_videos, len(dataset))
        order = rng.permutation(len(dataset))[:n] if shuffle else np.arange(n)
        for i in order:
            ann = dataset.gt_annotations[i]
            f, nb, p = video_counts(ann)
            vid_cap = (
                pick_bucket(buckets, f, nb, p)
                if buckets
                else (cap if (f <= cap.max_frames and nb <= cap.max_objs
                              and p <= cap.max_pairs) else None)
            )
            if vid_cap is None:
                stats.skipped += 1
                continue
            frames, scale = dataset.load_video_frames(i)
            h, w = frames.shape[1:3]
            canvas = pick_canvas(h, w, canvases) or (
                -(-h // 16) * 16, -(-w // 16) * 16
            )
            pad_f = np.zeros(
                (vid_cap.max_frames, canvas[0], canvas[1], 3), np.float32
            )
            pad_f[: frames.shape[0], :h, :w] = frames
            fmaps = base_fn(detector_variables, jnp.asarray(pad_f))
            entry = build_gt_entry(ann, vid_cap)
            entry = entry.replace(im_scale=jnp.float32(scale))
            entry = featurize(entry, fmaps)
            stats.yielded += 1
            key = vid_cap.max_frames
            stats.bucket_counts[key] = stats.bucket_counts.get(key, 0) + 1
            yield (int(i), entry, fmaps, ann) if yield_index else (entry, fmaps, ann)
        if stats.skipped:
            print(
                f"[ag_source] skipped {stats.skipped} over-capacity videos "
                f"({100 * stats.skip_rate:.1f}%)"
            )

    source.stats = stats
    return source


def setup_serve_mesh(data_parallel: int, pair_detect: int,
                     max_videos=None):
    """Multi-chip sgdet SERVING setup shared by the test CLIs.

    Returns ``(mesh | None, group_size)``: a mesh over
    min(data_parallel, available devices) and the pair-group size rounded
    up to a multiple of the mesh size (groups shard evenly). Degrades
    loudly: fewer devices than requested prints the actual count;
    ``--max_videos`` disables sharding (pairing reorders videos, so exact
    first-N truncation is only well-defined unpaired)."""
    if data_parallel <= 1:
        return None, pair_detect
    if max_videos is not None:
        print("NOTE: --max_videos disables --data_parallel serving "
              "(exact truncation)")
        return None, pair_detect
    from vidsgg.runtime.mesh import make_mesh

    n = min(data_parallel, jax.device_count())
    if n < data_parallel:
        print(f"NOTE: only {n} devices available; "
              f"--data_parallel {data_parallel} -> {n}")
    if n <= 1:
        return None, pair_detect
    group = -(-max(pair_detect, 1) // n) * n
    print(f">>> serving sharded over {n} devices (group size {group})")
    return make_mesh(n), group


def build_detector(model_path: str | None = None, tiny: bool = False,
                   frame_size: int = 600):
    """Shared CLI detector construction: (model, variables, canvases).

    ``tiny=True`` builds the shrunk Faster R-CNN (1-block stages, small RPN
    top-n) used for end-to-end rehearsal without the external AG checkpoint;
    ``frame_size`` scales the spatial canvas set to match a non-default
    min-side resize target."""
    from vidsgg.detector.faster_rcnn import FasterRCNN

    if tiny:
        from vidsgg.detector.rpn import RPNConfig

        det = FasterRCNN(
            rpn_cfg=RPNConfig(pre_nms_top_n=64, post_nms_top_n=16),
            base_blocks=(1, 1, 1), head_blocks=1,
        )
    else:
        det = FasterRCNN()
    canvases = scale_canvases(frame_size)
    if model_path:
        from vidsgg.detector.convert import load_faster_rcnn_checkpoint

        det_vars = load_faster_rcnn_checkpoint(model_path)
    else:
        h, w = canvases[0]
        det_vars = jax.jit(det.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
            jnp.array([float(h), float(w)]),
        )
        print("WARNING: no detector checkpoint; random detector weights")
    return det, det_vars, canvases


def quantize_detector_int8(det, det_vars, dataset, canvases,
                           num_videos: int = 2,
                           frame_buckets: tuple = (8, 16, 32, 64),
                           target_min_side: int | None = None,
                           max_frames: int | None = None):
    """Post-training int8 quantization of the serving detector.

    Records abs-max activation scales over the first ``num_videos`` dataset
    videos (``quant="record"`` forward passes at the same (canvas, bucket)
    shapes serving uses, so the record compiles are shared shapes), then
    returns the ``quant="int8"`` model + calibrated variables.
    ``target_min_side`` / ``max_frames`` must mirror the serving loader's
    settings (per-call on KCC, baked into the AG dataset constructor) so
    calibration compiles land on the serving (canvas, bucket) grid and
    the recorded scales see serving-scale pixels. v5e runs
    s8 x s8 -> s32 at 2x the bf16 MXU rate and int8 activations halve the
    HBM bytes of the thin-channel ResNet stages that bound the detect jit
    (vidsgg/detector/quant.py, docs/PERF.md).
    """
    from vidsgg.detector.quant import calibrate

    rec = det.clone(quant="record")
    if "quant" not in det_vars:
        # synthesize the zero-initialized scale collection without running
        # the model (eval_shape is abstract — no compile, no compute)
        shapes = jax.eval_shape(
            rec.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.array([64.0, 64.0]),
        )
        det_vars = dict(det_vars)
        det_vars["quant"] = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes["quant"]
        )

    inputs = []
    for i in range(min(num_videos, len(dataset))):
        # ActionGenome yields (frames, scale); KCC (frames, scale, name)
        if target_min_side is not None:
            frames = dataset.load_video_frames(
                i, target_min_side=target_min_side
            )[0]
        else:
            frames = dataset.load_video_frames(i)[0]
        if max_frames is not None:
            frames = frames[:max_frames]
            # serving's frame buckets are capped by the entry capacity too
            # (make_sgdet_source picks fpad from buckets <= max_frames), so
            # calibration compiles must land on the same filtered grid
            buckets_eff = tuple(
                b for b in frame_buckets if b <= max_frames
            ) or (max_frames,)
        else:
            buckets_eff = frame_buckets
        # never compile a one-off shape for an over-long calibration video:
        # scale calibration doesn't need more frames than the largest
        # serving bucket — truncate instead
        frames = frames[: buckets_eff[-1]]
        f, h, w, _ = frames.shape
        canvas = pick_canvas(h, w, canvases)
        if canvas is None:
            canvas = (-(-h // 16) * 16, -(-w // 16) * 16)
        fpad = next((b for b in buckets_eff if f <= b), buckets_eff[-1])
        pad = np.zeros((fpad, canvas[0], canvas[1], 3), np.float32)
        pad[:f, :h, :w] = frames
        inputs.append((jnp.asarray(pad), jnp.array([float(h), float(w)])))
    print(f">>> int8 serving: calibrated on {len(inputs)} videos")
    det_vars = calibrate(rec, det_vars, inputs)
    return det.clone(quant="int8"), det_vars


def make_sgdet_source(
    dataset,
    entry_cap: EntryCapacity,
    frontend,
    is_train: bool = False,
    shuffle: bool = True,
    seed: int = 1123,
    max_videos: int | None = None,
    canvases=DEFAULT_CANVASES,
    frame_buckets: tuple = (8, 16, 32, 64),
    pair_detect: int = 1,
    pair_grouped: bool = False,
    yield_index: bool = False,
):
    """Full-detection source: raw frames -> SgdetFrontend -> (entry, fmaps, gt).

    ``dataset`` provides gt_annotations + load_video_frames (ActionGenome).
    Frames pad spatially to a fixed canvas (``pick_canvas``) and temporally
    to a frame-count bucket, so the detector compiles once per
    (canvas, bucket) pair instead of once per video shape; the true (h, w)
    still bounds proposal clipping and ``num_frames`` masks the padding
    frames' detections.

    ``pair_detect`` > 1 batches that many same-(canvas, bucket) videos
    through ONE detect dispatch (``SgdetFrontend.eval_pair`` /
    ``train_pair``) — the larger conv batch amortizes the detector's
    thin-channel ResNet stages (measured ~13% off detect time at 2), and on
    the train side the ONE grouped small-array transfer also amortizes the
    tunnel round trip (docs/PERF.md). Bucket remainders fall back to the
    single-video frontend.

    ``yield_index`` (single-video path only) yields
    ``(dataset_index, entry, fmaps, ann)`` for the qualitative CLI.
    """
    if yield_index and pair_detect > 1:
        raise ValueError("yield_index requires pair_detect == 1 "
                         "(pairing reorders videos)")
    rng = np.random.RandomState(seed)
    stats = SourceStats()

    def run_single(pad, h, w, scale, f, ann):
        return frontend(
            jnp.asarray(pad), jnp.array([float(h), float(w)]),
            scale, gt_annotation=ann, is_train=is_train,
            video_size=(w / scale, h / scale), num_frames=f,
        )

    def source():
        stats.reset()
        n = len(dataset) if max_videos is None else min(max_videos, len(dataset))
        order = rng.permutation(len(dataset))[:n] if shuffle else np.arange(n)
        pending: dict[tuple, list] = {}
        for i in order:
            ann = dataset.gt_annotations[i]
            if len(ann) > entry_cap.max_frames:
                stats.skipped += 1
                continue
            frames, scale = dataset.load_video_frames(i)
            f, h, w, _ = frames.shape
            canvas = pick_canvas(h, w, canvases)
            if canvas is None:
                canvas = (-(-h // 16) * 16, -(-w // 16) * 16)
            fpad = next(
                (b for b in frame_buckets
                 if f <= b <= entry_cap.max_frames), f,
            )
            pad = np.zeros((fpad, canvas[0], canvas[1], 3), np.float32)
            pad[:f, :h, :w] = frames
            if pair_detect > 1:
                buf = pending.setdefault((canvas, fpad), [])
                buf.append(
                    ((pad, (float(h), float(w)), scale,
                      (w / scale, h / scale), f), ann)
                )
                if len(buf) == pair_detect:
                    if is_train:
                        results = frontend.train_pair(
                            [b[0] for b in buf], [b[1] for b in buf]
                        )
                        for res, (_, a) in zip(results, buf):
                            if res is None:  # over-capacity video in group
                                stats.skipped += 1
                                continue
                            stats.yielded += 1
                            yield res[0], res[1], a
                    elif pair_grouped:
                        # zero-restack serving path: the batch goes to the
                        # consumer intact (PairedSgdetEval.run_batched);
                        # compact-regime videos over capacity get a None
                        # ann marker, which run_batched skips
                        e_b, bf_b, ns = frontend.eval_pair_batched(
                            [b[0] for b in buf]
                        )
                        keep = frontend.eval_keep_mask(ns, fpad, len(buf))
                        anns = [
                            b[1] if k else None for b, k in zip(buf, keep)
                        ]
                        stats.skipped += keep.count(False)
                        stats.yielded += keep.count(True)
                        if any(keep):
                            yield PairGroup(e_b, bf_b, anns)
                    else:
                        results = frontend.eval_pair([b[0] for b in buf])
                        for res, (_, a) in zip(results, buf):
                            if res is None:  # over-capacity video in group
                                stats.skipped += 1
                                continue
                            stats.yielded += 1
                            yield res[0], res[1], a
                    buf.clear()
                else:
                    # bound host memory: each buffered pad is a full padded
                    # frame array (up to ~0.5 GB at the 64-frame bucket);
                    # past the cap, drain the oldest buffer through the
                    # single-video path (same as end-of-epoch remainders)
                    while (
                        sum(len(b) for b in pending.values())
                        > 3 * pair_detect
                    ):
                        key = next(k for k, b in pending.items() if b)
                        for (opad, ohw, osc, _ov, of), oann in pending[key]:
                            try:
                                oe, ofm = run_single(
                                    opad, ohw[0], ohw[1], osc, of, oann
                                )
                            except ValueError:
                                stats.skipped += 1
                                continue
                            stats.yielded += 1
                            yield oe, jnp.asarray(ofm), oann
                        del pending[key]
                continue
            try:
                entry, fmaps = run_single(pad, h, w, scale, f, ann)
            except ValueError:  # over-capacity detections
                stats.skipped += 1
                continue
            stats.yielded += 1
            fmaps = jnp.asarray(fmaps)
            yield (int(i), entry, fmaps, ann) if yield_index else (entry, fmaps, ann)
        # bucket remainders that never filled a pair: single-video frontend
        for buf in pending.values():
            for (pad, hw, scale, _vsize, f), ann in buf:
                try:
                    entry, fmaps = run_single(pad, hw[0], hw[1], scale, f, ann)
                except ValueError:
                    stats.skipped += 1
                    continue
                stats.yielded += 1
                yield entry, jnp.asarray(fmaps), ann
        if stats.skipped:
            print(
                f"[sgdet_source] skipped {stats.skipped} over-capacity videos "
                f"({100 * stats.skip_rate:.1f}%)"
            )

    source.stats = stats
    return source
