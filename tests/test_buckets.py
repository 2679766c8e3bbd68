"""Bucketed capacities: mixed-length videos are padded to the smallest
covering bucket (distinct jit specializations), nothing below the largest
bucket is dropped, and the source reports honest skip statistics."""

import numpy as np
import pytest

from vidsgg.cli.data_source import (
    SourceStats,
    default_buckets,
    make_ag_source,
    pick_bucket,
)
from vidsgg.data import EntryCapacity, synthetic_video_annotation


class FakeDataset:
    """Mimics ActionGenome: gt_annotations + load_video_frames."""

    def __init__(self, frame_counts, objs_per_frame=2):
        self.gt_annotations = [
            synthetic_video_annotation(
                num_frames=f, objs_per_frame=objs_per_frame, seed=i,
                image_wh=(64, 48),
            )
            for i, f in enumerate(frame_counts)
        ]

    def __len__(self):
        return len(self.gt_annotations)

    def load_video_frames(self, i):
        f = len(self.gt_annotations[i])
        return np.zeros((f, 48, 64, 3), np.float32), 1.0


def test_default_buckets_ascending():
    buckets = default_buckets(max_frames=64)
    frames = [b.max_frames for b in buckets]
    assert frames == [16, 32, 64]
    assert all(
        a.max_objs < b.max_objs and a.max_pairs < b.max_pairs
        for a, b in zip(buckets, buckets[1:])
    )


def test_pick_bucket_smallest_cover():
    buckets = default_buckets(max_frames=64)
    assert pick_bucket(buckets, 10, 20, 15).max_frames == 16
    assert pick_bucket(buckets, 17, 20, 15).max_frames == 32
    # dense short video overflows the small bucket's obj capacity
    assert pick_bucket(buckets, 10, 80, 15).max_frames == 32
    assert pick_bucket(buckets, 100, 20, 15) is None


def test_mixed_lengths_no_silent_drops():
    buckets = default_buckets(max_frames=64)
    # 4 videos spanning all three buckets + one over-capacity (80 frames)
    ds = FakeDataset([6, 14, 20, 40, 80])
    src = make_ag_source(ds, buckets[-1], shuffle=False, buckets=buckets)
    got = list(src())
    assert len(got) == 4  # only the 80-frame video is out of range
    shapes = [e.boxes.shape[0] for e, _, _ in got]
    # distinct bucket specializations: 16-frame videos -> 64-obj buffers etc.
    assert shapes == [64, 64, 128, 256]
    stats = src.stats
    assert isinstance(stats, SourceStats)
    assert stats.yielded == 4 and stats.skipped == 1
    assert stats.bucket_counts == {16: 2, 32: 1, 64: 1}
    assert 0.19 < stats.skip_rate < 0.21
    # entries are fully featurized per bucket
    for e, fmaps, ann in got:
        n = int(np.asarray(e.obj_mask).sum())
        assert np.isfinite(np.asarray(e.features)[:n]).all()
        assert fmaps.shape[0] == e.boxes.shape[0] // 4  # max_frames


def test_stats_reset_between_epochs():
    buckets = default_buckets(max_frames=64)
    ds = FakeDataset([6, 80])
    src = make_ag_source(ds, buckets[-1], shuffle=False, buckets=buckets)
    list(src())
    list(src())
    assert src.stats.yielded == 1 and src.stats.skipped == 1


def test_prefetch_forwards_stats():
    from vidsgg.runtime.prefetch import prefetch

    buckets = default_buckets(max_frames=64)
    ds = FakeDataset([6])
    src = make_ag_source(ds, buckets[-1], shuffle=False, buckets=buckets)
    wrapped = prefetch(src, depth=1)
    list(wrapped())
    assert wrapped.stats is src.stats
    assert wrapped.stats.yielded == 1


def test_pick_canvas():
    from vidsgg.cli.data_source import DEFAULT_CANVASES, pick_canvas

    # smallest covering canvas by area
    assert pick_canvas(600, 800) == (608, 816)
    assert pick_canvas(608, 816) == (608, 816)
    assert pick_canvas(600, 1000) == (608, 1008)
    assert pick_canvas(700, 500) == (816, 608)
    assert pick_canvas(810, 810) == (816, 816)
    # nothing fits -> caller falls back to exact /16 padding
    assert pick_canvas(2000, 2000) is None
    # every canvas is /16 aligned (a detector stride invariant)
    for ch, cw in DEFAULT_CANVASES:
        assert ch % 16 == 0 and cw % 16 == 0
