"""The ``Entry`` structure — the contract between detector and relation models.

The reference passes a Python dict of ragged CUDA tensors between stages
(``entry`` built at tools/utils/object_detector.py:268-302/382-455 and mutated
in place by the models). On TPU every shape must be static, so ``Entry`` is a
frozen flax pytree of fixed-capacity arrays plus validity masks:

* object axis ``N`` — all boxes of a video, padded to ``max_objs``;
* pair axis ``P`` — all (human, object) pairs, padded to ``max_pairs``;
* frame axis ``F`` — padded to ``max_frames``.

Capacities come from :class:`EntryCapacity` buckets so XLA compiles one
program per bucket rather than per video. Masked entries are defined to be
zero so padded reductions need no special-casing.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct

from vidsgg import constants as C


@dataclasses.dataclass(frozen=True)
class EntryCapacity:
    """Static padding capacities (one jit specialization per distinct value)."""

    max_frames: int = 16
    max_objs: int = 48     # all boxes across the video (person + objects)
    max_pairs: int = 32    # (human, object) pairs across the video

    def bucket_for(self, num_frames: int, num_objs: int, num_pairs: int) -> "EntryCapacity":
        """Smallest power-of-two-ish bucket covering the given sizes."""

        def up(x, base):
            c = base
            while c < x:
                c *= 2
            return c

        return EntryCapacity(
            max_frames=up(num_frames, self.max_frames),
            max_objs=up(num_objs, self.max_objs),
            max_pairs=up(num_pairs, self.max_pairs),
        )


class Entry(struct.PyTreeNode):
    """Detector -> relation-model interface (fixed shapes, masked).

    Mirrors the reference entry dict keys (object_detector.py:382-455):
    ``boxes/labels/scores/distribution/pred_labels/features`` on the object
    axis, ``im_idx/pair_idx/union_feat/spatial_masks`` + the three GT
    predicate sets on the pair axis.
    """

    # object axis [N]
    boxes: jnp.ndarray          # [N, 5] (frame_idx, x1, y1, x2, y2), image scale
    labels: jnp.ndarray         # [N] GT class (0 where unknown)
    scores: jnp.ndarray         # [N]
    distribution: jnp.ndarray   # [N, num_classes-1] detector class scores (no bg)
    pred_labels: jnp.ndarray    # [N]
    features: jnp.ndarray       # [N, 2048] ROI head features
    obj_mask: jnp.ndarray       # [N] bool

    # pair axis [P]
    im_idx: jnp.ndarray         # [P] frame index of each pair
    pair_idx: jnp.ndarray       # [P, 2] (human, object) indices into object axis
    union_feat: jnp.ndarray     # [P, 7, 7, 1024] union-box ROI features (NHWC)
    spatial_masks: jnp.ndarray  # [P, 2, S, S] rasterized pair masks (-0.5 centered)
    pair_mask: jnp.ndarray      # [P] bool

    # GT predicates on the pair axis (multi-hot; attention also as index)
    attention_gt: jnp.ndarray   # [P] int index
    spatial_gt: jnp.ndarray     # [P, 6] multi-hot float
    contacting_gt: jnp.ndarray  # [P, 17] multi-hot float

    # frame axis [F]
    human_idx: jnp.ndarray      # [F] object index of the person box per frame
    frame_mask: jnp.ndarray     # [F] bool

    # scalars
    im_scale: jnp.ndarray       # [] image scale factor (im_info[0, 2])
    num_frames: jnp.ndarray     # [] int
    video_size: jnp.ndarray     # [2] original (w, h) of the video

    @property
    def num_objs_cap(self) -> int:
        return self.boxes.shape[0]

    @property
    def num_pairs_cap(self) -> int:
        return self.im_idx.shape[0]

    @classmethod
    def zeros(cls, cap: EntryCapacity, num_classes: int = C.NUM_OBJ_CLASSES,
              mask_size: int = C.SPATIAL_MASK_SIZE, feat_dim: int = 2048,
              union_ch: int = 1024, union_hw: int = C.ROI_ALIGN_OUT) -> "Entry":
        n, p, f = cap.max_objs, cap.max_pairs, cap.max_frames
        return cls(
            boxes=jnp.zeros((n, 5), jnp.float32),
            labels=jnp.zeros((n,), jnp.int32),
            scores=jnp.zeros((n,), jnp.float32),
            distribution=jnp.zeros((n, num_classes - 1), jnp.float32),
            pred_labels=jnp.zeros((n,), jnp.int32),
            features=jnp.zeros((n, feat_dim), jnp.float32),
            obj_mask=jnp.zeros((n,), bool),
            im_idx=jnp.zeros((p,), jnp.int32),
            pair_idx=jnp.zeros((p, 2), jnp.int32),
            union_feat=jnp.zeros((p, union_hw, union_hw, union_ch), jnp.float32),
            spatial_masks=jnp.zeros((p, 2, mask_size, mask_size), jnp.float32),
            pair_mask=jnp.zeros((p,), bool),
            attention_gt=jnp.zeros((p,), jnp.int32),
            spatial_gt=jnp.zeros((p, C.NUM_SPATIAL), jnp.float32),
            contacting_gt=jnp.zeros((p, C.NUM_CONTACTING), jnp.float32),
            human_idx=jnp.zeros((f,), jnp.int32),
            frame_mask=jnp.zeros((f,), bool),
            im_scale=jnp.ones((), jnp.float32),
            num_frames=jnp.zeros((), jnp.int32),
            video_size=jnp.ones((2,), jnp.float32),
        )
