"""Action Genome dataset loader.

NumPy/host re-implementation of ``dataloader/AG/action_genome.py`` (class
AG): parses ``annotations/person_bbox.pkl`` + ``object_bbox_and_relationship.pkl``,
applies the class-name remaps (:27-54), splits the predicate taxonomy 3/6/17
(:57-59), filters frames without a person box and videos with < 3 valid
frames (:124-160), converts xywh GT boxes to xyxy (:144), and exposes
per-video frame lists + GT annotations. ``datasize='mini'`` truncates to the
first 80k frame records (:80-87).

Frame decoding (``__getitem__`` in the reference: cv2 imread, BGR mean
subtraction, min-side-600 resize, zero-pad to the per-video max H/W,
:175-254) is provided by :func:`load_video_frames`; the preprocessing math
is shared with the C++ fast path when built (vidsgg.data.native).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from vidsgg import constants as C


class ActionGenome:
    def __init__(self, mode: str, datasize: str = "large",
                 data_path: str = "/data/AG/",
                 filter_nonperson_box_frame: bool = True,
                 filter_small_box: bool = False,
                 target_min_side: int = C.TARGET_MIN_SIDE):
        self.mode = mode
        self.data_path = data_path
        self.frames_path = os.path.join(data_path, "frames/")
        # min-side resize target; the reference hardcodes 600
        # (action_genome.py:176). Smaller values shrink every downstream
        # shape — the CLI --frame_size hook for cheap end-to-end rehearsal.
        self.target_min_side = int(target_min_side)

        try:  # opportunistic native fast path for frame preprocessing
            from vidsgg.data import native

            native.build()
        except Exception:
            pass

        # class lists from the dataset when available, constants otherwise
        obj_file = os.path.join(data_path, "annotations/object_classes.txt")
        rel_file = os.path.join(data_path, "annotations/relationship_classes.txt")
        if os.path.exists(obj_file):
            self.object_classes = ["__background__"]
            with open(obj_file) as f:
                self.object_classes += [l.strip("\n") for l in f if l.strip()]
            for i, name in (
                (9, "closet/cabinet"), (11, "cup/glass/bottle"),
                (23, "paper/notebook"), (24, "phone/camera"), (31, "sofa/couch"),
            ):
                self.object_classes[i] = name
        else:
            self.object_classes = list(C.AG_OBJECT_CLASSES)
        if os.path.exists(rel_file):
            rel = []
            with open(rel_file) as f:
                rel += [l.strip("\n") for l in f if l.strip()]
            for i, name in (
                (0, "looking_at"), (1, "not_looking_at"), (5, "in_front_of"),
                (7, "on_the_side_of"), (10, "covered_by"), (11, "drinking_from"),
                (13, "have_it_on_the_back"), (15, "leaning_on"), (16, "lying_on"),
                (17, "not_contacting"), (18, "other_relationship"),
                (19, "sitting_on"), (20, "standing_on"), (25, "writing_on"),
            ):
                rel[i] = name
            self.relationship_classes = rel
        else:
            self.relationship_classes = list(C.AG_RELATIONSHIP_CLASSES)
        self.attention_relationships = self.relationship_classes[0:3]
        self.spatial_relationships = self.relationship_classes[3:9]
        self.contacting_relationships = self.relationship_classes[9:]

        with open(os.path.join(data_path, "annotations/person_bbox.pkl"), "rb") as f:
            person_bbox = pickle.load(f)
        obj_pkl = (
            "annotations/object_bbox_and_relationship_filtersmall.pkl"
            if filter_small_box
            else "annotations/object_bbox_and_relationship.pkl"
        )
        obj_path = os.path.join(data_path, obj_pkl)
        if not os.path.exists(obj_path):
            obj_path = os.path.join(
                data_path, "annotations/object_bbox_and_relationship.pkl"
            )
        with open(obj_path, "rb") as f:
            object_bbox = pickle.load(f)

        if datasize == "mini":
            keys = list(person_bbox.keys())[:80000]
            person_bbox = {k: person_bbox[k] for k in keys}
            object_bbox = {k: object_bbox[k] for k in keys}

        # collect valid frames per video (a frame is valid if any object is
        # visible; reference :90-105)
        video_dict: dict[str, list[str]] = {}
        for key in person_bbox.keys():
            if object_bbox[key][0]["metadata"]["set"] != mode:
                continue
            if any(o["visible"] for o in object_bbox[key]):
                video_dict.setdefault(key.split("/")[0], []).append(key)

        self.video_list: list[list[str]] = []
        self.video_size: list = []
        self.gt_annotations: list = []
        self.non_gt_human_nums = 0
        self.non_person_video = 0
        self.one_frame_video = 0
        self.valid_nums = 0

        for vid, keys in video_dict.items():
            video, gt_video = [], []
            last_key = keys[-1]
            for key in keys:
                if filter_nonperson_box_frame and person_bbox[key]["bbox"].shape[0] == 0:
                    self.non_gt_human_nums += 1
                    continue
                video.append(key)
                self.valid_nums += 1
                frame_gt = [
                    {"person_bbox": person_bbox[key]["bbox"], "frame": key}
                ]
                for o in object_bbox[key]:
                    if not o["visible"]:
                        continue
                    assert o["bbox"] is not None, "visible object without bbox"
                    item = dict(o)
                    item["class"] = self.object_classes.index(o["class"])
                    b = o["bbox"]
                    item["bbox"] = np.array(
                        [b[0], b[1], b[0] + b[2], b[1] + b[3]], np.float32
                    )
                    item["attention_relationship"] = [
                        self.attention_relationships.index(r)
                        for r in o["attention_relationship"]
                    ]
                    item["spatial_relationship"] = [
                        self.spatial_relationships.index(r)
                        for r in o["spatial_relationship"]
                    ]
                    item["contacting_relationship"] = [
                        self.contacting_relationships.index(r)
                        for r in o["contacting_relationship"]
                    ]
                    frame_gt.append(item)
                gt_video.append(frame_gt)
            if len(video) > 2:
                self.video_list.append(video)
                self.video_size.append(person_bbox[last_key]["bbox_size"])
                self.gt_annotations.append(gt_video)
            elif len(video) == 1:
                self.one_frame_video += 1
            else:
                self.non_person_video += 1

    def __len__(self):
        return len(self.video_list)

    def load_video_frames(self, index: int):
        """Decode + preprocess all frames of one video.

        Returns (frames [F, Hmax, Wmax, 3] float32 BGR mean-subtracted,
        im_scale). Mirrors prep_im_for_blob / im_list_to_blob
        (action_genome.py:219-254). When the native C++ library is built
        and the video's frames share one raw resolution (the common case),
        resize+subtract+pad runs multi-threaded in C++."""
        import cv2

        raw = [
            cv2.imread(os.path.join(self.frames_path, name), cv2.IMREAD_UNCHANGED)
            for name in self.video_list[index]
        ]
        try:
            from vidsgg.data import native

            if native.available() and len({im.shape for im in raw}) == 1:
                h, w = raw[0].shape[:2]
                scale = float(self.target_min_side) / float(min(h, w))
                out_h = int(round(h * scale))
                out_w = int(round(w * scale))
                blob, scale = native.prep_frames(
                    np.stack(raw), self.target_min_side, C.PIXEL_MEANS_BGR,
                    out_h, out_w,
                )
                return blob, scale
        except Exception:
            pass

        ims, scales = [], []
        for im in raw:
            im, scale = prep_im_for_blob(im, self.target_min_side)
            ims.append(im)
            scales.append(scale)
        return im_list_to_blob(ims), scales[0]


def prep_im_for_blob(im, target_size: int = C.TARGET_MIN_SIDE):
    """BGR mean subtraction + min-side resize (action_genome.py:235-254)."""
    import cv2

    im = im.astype(np.float32, copy=False)
    im -= np.asarray(C.PIXEL_MEANS_BGR)[None, None, :]
    scale = float(target_size) / float(min(im.shape[0], im.shape[1]))
    im = cv2.resize(im, None, None, fx=scale, fy=scale, interpolation=cv2.INTER_LINEAR)
    return im, scale


def im_list_to_blob(ims):
    """Zero-pad to the per-video max H/W (action_genome.py:219-233)."""
    max_h = max(im.shape[0] for im in ims)
    max_w = max(im.shape[1] for im in ims)
    blob = np.zeros((len(ims), max_h, max_w, 3), np.float32)
    for i, im in enumerate(ims):
        blob[i, : im.shape[0], : im.shape[1]] = im
    return blob
