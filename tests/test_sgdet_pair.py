"""Paired sgdet eval frontend: several same-canvas videos through ONE
detect dispatch must reproduce the single-video device frontend exactly —
including videos whose TRUE resolutions/scales differ under the shared
padded canvas (per-frame im_hw/im_scale thread through proposal clipping,
object_detector.py:106, and box rescaling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsgg.data import EntryCapacity
from vidsgg.detector.faster_rcnn import FasterRCNN
from vidsgg.detector.rpn import RPNConfig
from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend

CAP = EntryCapacity(max_frames=4, max_objs=32, max_pairs=16)
H, W = 64, 96
F = 2


@pytest.fixture(scope="module")
def frontend():
    model = FasterRCNN(
        rpn_cfg=RPNConfig(pre_nms_top_n=64, post_nms_top_n=16),
        base_blocks=(1, 1, 1), head_blocks=1,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), jnp.array([float(H), float(W)])
    )
    return SgdetFrontend(
        model, variables, SgdetCaps(dets_per_frame=8, supply_cap=16), CAP
    )


def _videos():
    rng = np.random.RandomState(7)
    vids = []
    # two videos on the same (H, W) canvas with DIFFERENT true sizes/scales
    for true_hw, scale in (((H, W), 1.0), ((48, 80), 1.25)):
        frames = np.zeros((F, H, W, 3), np.float32)
        frames[:, : true_hw[0], : true_hw[1]] = rng.rand(
            F, true_hw[0], true_hw[1], 3
        )
        vids.append(
            (
                jnp.asarray(frames),
                (float(true_hw[0]), float(true_hw[1])),
                scale,
                (true_hw[1] / scale, true_hw[0] / scale),
                F,
            )
        )
    return vids


def test_pair_matches_single(frontend):
    vids = _videos()
    paired = frontend.eval_pair(vids)
    for (frames, hw, scale, vsize, nf), (pe, pbf) in zip(vids, paired):
        se, sbf = frontend(
            frames, jnp.asarray(hw), scale, is_train=False,
            video_size=vsize, num_frames=nf,
        )
        np.testing.assert_allclose(
            np.asarray(pbf), np.asarray(sbf), rtol=2e-5, atol=1e-5
        )
        for name in (
            "boxes", "scores", "distribution", "features", "obj_mask",
            "pred_labels", "im_scale", "num_frames", "video_size",
        ):
            np.testing.assert_allclose(
                np.asarray(getattr(pe, name)),
                np.asarray(getattr(se, name)),
                rtol=2e-5, atol=1e-5, err_msg=name,
            )


class _FakeDataset:
    """Three same-resolution videos -> one pair + one remainder at
    pair_detect=2."""

    def __init__(self, n=3):
        rng = np.random.RandomState(11)
        self.gt_annotations = [
            [[{"person_bbox": np.array([[2.0, 2.0, 20.0, 30.0]])},
              {"bbox": np.array([5.0, 5.0, 25.0, 25.0]), "class": 3,
               "attention_relationship": [0], "spatial_relationship": [1],
               "contacting_relationship": [2]}]
             for _ in range(F)]
            for _ in range(n)
        ]
        self._frames = [
            rng.rand(F, H, W, 3).astype(np.float32) for _ in range(n)
        ]

    def __len__(self):
        return len(self._frames)

    def load_video_frames(self, i):
        return self._frames[i], 1.0


def test_source_pairing_matches_single(frontend):
    from vidsgg.cli.data_source import make_sgdet_source

    ds = _FakeDataset(3)
    cv = ((H, W),)
    single = make_sgdet_source(
        ds, CAP, frontend, shuffle=False, canvases=cv, frame_buckets=(F,)
    )
    paired = make_sgdet_source(
        ds, CAP, frontend, shuffle=False, canvases=cv, frame_buckets=(F,),
        pair_detect=2,
    )
    got_s = {id_: e for id_, (e, _, _) in enumerate(single())}
    got_p = list(paired())
    assert len(got_p) == 3 and paired.stats.yielded == 3
    # pairing reorders (pairs flush when filled, remainders at the end);
    # match each paired entry to a single-path entry by its box content
    for e, fm, _ in got_p:
        match = min(
            got_s,
            key=lambda k: float(
                np.abs(np.asarray(got_s[k].boxes) - np.asarray(e.boxes)).sum()
            ),
        )
        se = got_s.pop(match)
        for name in ("boxes", "scores", "distribution", "features",
                     "obj_mask", "pred_labels"):
            np.testing.assert_allclose(
                np.asarray(getattr(e, name)), np.asarray(getattr(se, name)),
                rtol=2e-5, atol=1e-5, err_msg=name,
            )


def test_train_pair_matches_single(frontend):
    """train_pair (one detect dispatch + one grouped small transfer) must
    reproduce the single-video train frontend exactly."""
    from vidsgg.data import synthetic_video_annotation

    rng = np.random.RandomState(3)
    vids, anns = [], []
    for seed in (0, 1):
        anns.append(
            synthetic_video_annotation(
                num_frames=F, objs_per_frame=2, seed=seed, image_wh=(W, H)
            )
        )
        frames = jnp.asarray(rng.rand(F, H, W, 3), jnp.float32)
        vids.append(
            (frames, (float(H), float(W)), 1.0, (float(W), float(H)), F)
        )
    paired = frontend.train_pair(vids, anns)
    for (frames, hw, scale, vsize, nf), ann, res in zip(vids, anns, paired):
        assert res is not None
        pe, pbf = res
        se, sbf = frontend(
            frames, jnp.asarray(hw), scale, gt_annotation=ann,
            is_train=True, video_size=vsize, num_frames=nf,
        )
        np.testing.assert_allclose(
            np.asarray(pbf), np.asarray(sbf), rtol=2e-5, atol=1e-5
        )
        for name in (
            "boxes", "labels", "scores", "distribution", "features",
            "obj_mask", "im_idx", "pair_idx", "pair_mask", "attention_gt",
            "spatial_gt", "contacting_gt", "union_feat", "spatial_masks",
            "human_idx",
        ):
            np.testing.assert_allclose(
                np.asarray(getattr(pe, name)),
                np.asarray(getattr(se, name)),
                rtol=2e-5, atol=1e-5, err_msg=name,
            )


def test_per_frame_hw_scale_detect_matches_per_video(frontend):
    """make_detect_fn with [F,2]/[F] operands == two scalar-operand calls."""
    vids = _videos()
    frames = jnp.concatenate([v[0] for v in vids], axis=0)
    hw_pf = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(v[1]), (F, 2)) for v in vids]
    )
    sc_pf = jnp.concatenate([jnp.full((F,), v[2], jnp.float32) for v in vids])
    batched = frontend.detect(frontend.variables, frames, hw_pf, sc_pf)
    for i, v in enumerate(vids):
        single = frontend.detect(
            frontend.variables, v[0], jnp.asarray(v[1]), jnp.asarray(v[2])
        )
        for k in ("boxes", "scores", "mask", "dists"):
            np.testing.assert_allclose(
                np.asarray(batched[k][i * F : (i + 1) * F]),
                np.asarray(single[k]),
                rtol=2e-5, atol=1e-5, err_msg=k,
            )


def test_eval_pair_batched_is_unsliced_eval_pair(frontend):
    """eval_pair == eval_pair_batched sliced per video (the batched form
    feeds the vmapped fused stage with zero restack dispatches)."""
    vids = _videos()
    e_b, bf_b, n_b = frontend.eval_pair_batched(vids)
    sliced = frontend.eval_pair(vids)
    assert np.asarray(bf_b).shape[0] == len(vids)
    assert np.asarray(n_b).shape == (len(vids),)
    for i, (e_i, bf_i) in enumerate(sliced):
        np.testing.assert_allclose(
            np.asarray(bf_b)[i], np.asarray(bf_i), rtol=1e-6, atol=1e-6
        )
        for name in ("boxes", "scores", "distribution", "features",
                     "obj_mask", "pred_labels"):
            np.testing.assert_allclose(
                np.asarray(getattr(e_b, name))[i],
                np.asarray(getattr(e_i, name)),
                rtol=1e-6, atol=1e-6, err_msg=name,
            )


def test_source_pair_grouped_yields_batches(frontend):
    """pair_grouped=True emits PairGroup batches whose slices equal the
    sliced-mode stream (same videos, same content)."""
    from vidsgg.cli.data_source import PairGroup, make_sgdet_source

    ds = _FakeDataset(3)
    cv = ((H, W),)
    sliced = make_sgdet_source(
        ds, CAP, frontend, shuffle=False, canvases=cv, frame_buckets=(F,),
        pair_detect=2,
    )
    grouped = make_sgdet_source(
        ds, CAP, frontend, shuffle=False, canvases=cv, frame_buckets=(F,),
        pair_detect=2, pair_grouped=True,
    )
    flat = list(sliced())
    items = list(grouped())
    assert grouped.stats.yielded == 3
    groups = [it for it in items if isinstance(it, PairGroup)]
    singles = [it for it in items if not isinstance(it, PairGroup)]
    assert len(groups) == 1 and len(singles) == 1  # 2+1 remainder
    g = groups[0]
    assert len(g.anns) == 2
    for i in range(2):
        e_s, _, _ = flat[i]
        for name in ("boxes", "scores", "features", "pred_labels"):
            np.testing.assert_allclose(
                np.asarray(getattr(g.entry, name))[i],
                np.asarray(getattr(e_s, name)),
                rtol=1e-6, atol=1e-6, err_msg=name,
            )


def test_pending_buffer_bound_drains_oldest(frontend):
    """With many never-filling (canvas, bucket) keys, the source drains the
    oldest buffer through the single path once 3*pair_detect videos are
    pending (each buffered entry pins a full padded frame array on host) —
    and still yields every video exactly once."""
    from vidsgg.cli.data_source import make_sgdet_source

    class _RaggedDataset:
        """7 videos: 7 distinct (canvas, frame-bucket) keys."""

        def __init__(self):
            rng = np.random.RandomState(5)
            specs = [((H, W), f) for f in (1, 2, 3, 4)] + \
                    [((32, 48), f) for f in (1, 2, 3)]
            self._frames = [
                rng.rand(f, hw[0], hw[1], 3).astype(np.float32)
                for hw, f in specs
            ]
            self.gt_annotations = [
                [[{"person_bbox": np.array([[2.0, 2.0, 20.0, 28.0]])},
                  {"bbox": np.array([5.0, 5.0, 25.0, 25.0]), "class": 3,
                   "attention_relationship": [0], "spatial_relationship": [1],
                   "contacting_relationship": [2]}]
                 for _ in range(f)]
                for _, f in specs
            ]

        def __len__(self):
            return len(self._frames)

        def load_video_frames(self, i):
            return self._frames[i], 1.0

    src = make_sgdet_source(
        _RaggedDataset(), CAP, frontend, shuffle=False,
        canvases=((32, 48), (H, W)), frame_buckets=(1, 2, 3, 4),
        pair_detect=2,
    )
    got = list(src())
    assert len(got) == 7 and src.stats.yielded == 7
    assert src.stats.skipped == 0
    # each yielded entry is a plain per-video tuple (no PairGroup — no
    # group ever filled), with finite contents
    for entry, fmaps, ann in got:
        assert np.isfinite(np.asarray(entry.boxes)).all()


def test_compact_eval_matches_host_or_both_overflow(frontend):
    """Compact regime (max_objs < frames*dets_per_frame): the device pack
    keeps detections on device and must agree with the host-packing path —
    either both produce the same entry or both reject the video as
    over-capacity (ValueError)."""
    from vidsgg.detector.sgdet import SgdetFrontend

    for max_objs in (4, 8, 12):
        small = EntryCapacity(max_frames=4, max_objs=max_objs, max_pairs=16)
        fe = SgdetFrontend(frontend.model, frontend.variables,
                           frontend.caps, small)
        assert not fe.eval_full_capacity(F)
        frames, hw, scale, vsize, nf = _videos()[0]
        dev = host = None
        try:
            dev = fe(frames, jnp.asarray(hw), scale, is_train=False,
                     video_size=vsize, num_frames=nf)
        except ValueError:
            pass
        try:
            host = fe(frames, jnp.asarray(hw), scale, is_train=False,
                      video_size=vsize, num_frames=nf, device_pack=False)
        except ValueError:
            pass
        assert (dev is None) == (host is None), f"max_objs={max_objs}"
        if dev is None:
            continue
        de, dbf = dev
        he, hbf = host
        np.testing.assert_allclose(np.asarray(dbf), np.asarray(hbf),
                                   rtol=2e-5, atol=1e-5)
        for name in ("boxes", "scores", "distribution", "features",
                     "obj_mask", "pred_labels"):
            np.testing.assert_allclose(
                np.asarray(getattr(de, name)), np.asarray(getattr(he, name)),
                rtol=2e-5, atol=1e-5, err_msg=f"max_objs={max_objs}: {name}",
            )


def test_compact_pair_source_keeps_fitting_videos(frontend):
    """pair_detect now applies in the compact regime too: videos whose
    detections fit the small capacity flow through the paired path, and
    the paired stream matches the single-video stream."""
    from vidsgg.cli.data_source import make_sgdet_source
    from vidsgg.detector.sgdet import SgdetFrontend

    small = EntryCapacity(max_frames=4, max_objs=12, max_pairs=16)
    fe = SgdetFrontend(frontend.model, frontend.variables,
                       frontend.caps, small)
    ds = _FakeDataset(4)
    cv = ((H, W),)
    single = make_sgdet_source(ds, small, fe, shuffle=False, canvases=cv,
                               frame_buckets=(F,))
    paired = make_sgdet_source(ds, small, fe, shuffle=False, canvases=cv,
                               frame_buckets=(F,), pair_detect=2)
    got_s = list(single())
    got_p = list(paired())
    assert single.stats.yielded == paired.stats.yielded
    assert single.stats.skipped == paired.stats.skipped
    # same surviving videos (match by box content; pairing may reorder)
    remaining = list(got_s)
    for e, fm, _ in got_p:
        j = min(
            range(len(remaining)),
            key=lambda k: float(np.abs(
                np.asarray(remaining[k][0].boxes) - np.asarray(e.boxes)
            ).sum()),
        )
        se = remaining.pop(j)[0]
        np.testing.assert_allclose(
            np.asarray(e.boxes), np.asarray(se.boxes), rtol=2e-5, atol=1e-5
        )
