"""VidVRD dataset loader.

The reference *declares* VidVRD support (dataloader/VidVRD/ exists, TokenGT
carries a "VidVRD: 30" lap-k comment at tokengt.py:52 and a frame-index
rebase for it at tokenizer.py:242) but its loader is an empty 0-LoC stub
(dataloader/VidVRD/vidvrd.py — SURVEY.md §2.1). This module implements the
published VidVRD release format so the capability actually exists here:

``<root>/{train,test}/*.json`` per-video annotations with
``subject/objects`` (tid -> category), ``trajectories`` (per frame: list of
{tid, bbox{xmin,ymin,xmax,ymax}}), and ``relation_instances``
({subject_tid, object_tid, predicate, begin_fid, end_fid}); frames decoded
from ``<root>/videos/<vid>.mp4`` (or pre-extracted frames).

Videos are long (hundreds of frames) with ragged object counts — the stress
case for the padded clip pipeline; use larger EntryCapacity buckets and the
clip-chunked TEAT-GT path.
"""

from __future__ import annotations

import json
import os

import numpy as np


class VidVRD:
    def __init__(self, mode: str, data_path: str, max_frames: int | None = None):
        self.data_path = data_path
        ann_dir = os.path.join(data_path, mode)
        self.video_ids, self.annotations = [], []
        if os.path.isdir(ann_dir):
            for fn in sorted(os.listdir(ann_dir)):
                if fn.endswith(".json"):
                    with open(os.path.join(ann_dir, fn)) as f:
                        ann = json.load(f)
                    self.video_ids.append(ann.get("video_id", fn[:-5]))
                    self.annotations.append(ann)
        self.max_frames = max_frames

        # category vocabulary across the split
        cats = set()
        preds = set()
        for ann in self.annotations:
            for obj in ann.get("subject/objects", []):
                cats.add(obj["category"])
            for rel in ann.get("relation_instances", []):
                preds.add(rel["predicate"])
        self.object_classes = ["__background__"] + sorted(cats)
        self.predicate_classes = sorted(preds)

    def __len__(self):
        return len(self.video_ids)

    def video_annotation(self, index: int):
        """Per-frame object tracks + active relations, in a schema analogous
        to the AG gt_annotation (subject-object pairs with predicate lists)."""
        ann = self.annotations[index]
        tid_to_cat = {
            o["tid"]: self.object_classes.index(o["category"])
            for o in ann.get("subject/objects", [])
        }
        rels = ann.get("relation_instances", [])
        frames = []
        traj = ann.get("trajectories", [])
        if self.max_frames:
            traj = traj[: self.max_frames]
        for fid, frame_objs in enumerate(traj):
            boxes = {}
            for o in frame_objs:
                bb = o["bbox"]
                boxes[o["tid"]] = np.array(
                    [bb["xmin"], bb["ymin"], bb["xmax"], bb["ymax"]], np.float32
                )
            active = [
                r for r in rels if r["begin_fid"] <= fid < r["end_fid"]
                and r["subject_tid"] in boxes and r["object_tid"] in boxes
            ]
            frames.append(
                {
                    "boxes": boxes,
                    "classes": {t: tid_to_cat[t] for t in boxes},
                    "relations": [
                        (
                            r["subject_tid"],
                            r["object_tid"],
                            self.predicate_classes.index(r["predicate"]),
                        )
                        for r in active
                    ],
                }
            )
        return frames


def synthetic_vidvrd_annotation(
    num_frames: int,
    num_tracks: int = 4,
    num_classes: int = 10,
    num_predicates: int = 8,
    seed: int = 0,
) -> dict:
    """One release-format VidVRD annotation dict with smooth random tracks.

    Predicates are made *learnable from class geometry*: predicate id
    depends on (subject class + object class) mod num_predicates, so a
    model that reads labels + boxes can fit it — the shape of supervision
    a train-smoke test needs.
    """
    rng = np.random.RandomState(seed)
    objs = [
        {"tid": t, "category": f"cat{rng.randint(1, num_classes)}"}
        for t in range(num_tracks)
    ]
    pos = rng.rand(num_tracks, 2) * 400
    vel = rng.randn(num_tracks, 2) * 3
    trajectories = []
    for _ in range(num_frames):
        pos = np.clip(pos + vel, 0, 500)
        frame = []
        for t in range(num_tracks):
            if rng.rand() < 0.9:  # tracks flicker like real detections
                x, y = pos[t]
                w, h = 30 + 20 * rng.rand(2)
                frame.append(
                    {
                        "tid": t,
                        "bbox": {
                            "xmin": float(x), "ymin": float(y),
                            "xmax": float(x + w), "ymax": float(y + h),
                        },
                    }
                )
        trajectories.append(frame)
    cat_of = {o["tid"]: int(o["category"][3:]) for o in objs}
    relations = []
    for s in range(num_tracks):
        for o in range(num_tracks):
            if s == o or rng.rand() < 0.5:
                continue
            pred = (cat_of[s] + cat_of[o]) % num_predicates
            begin = rng.randint(0, max(num_frames - 2, 1))
            end = rng.randint(begin + 1, num_frames + 1)
            relations.append(
                {
                    "subject_tid": s,
                    "object_tid": o,
                    "predicate": f"pred{pred}",
                    "begin_fid": int(begin),
                    "end_fid": int(end),
                }
            )
    return {
        "video_id": f"synth{seed:04d}",
        "subject/objects": objs,
        "trajectories": trajectories,
        "relation_instances": relations,
    }
