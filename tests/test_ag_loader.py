"""Action Genome loader against synthetic pickle fixtures matching the
dataset's on-disk schema (person_bbox.pkl / object_bbox_and_relationship.pkl)."""

import os
import pickle

import numpy as np
import pytest

from vidsgg import constants as C
from vidsgg.data.action_genome import ActionGenome


@pytest.fixture(scope="module")
def ag_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ag")
    os.makedirs(root / "annotations")
    os.makedirs(root / "frames")

    person, objects = {}, {}
    rng = np.random.RandomState(0)

    def add_frame(vid, f, with_person=True, visible=True, split="train"):
        key = f"{vid}/{f:06d}.png"
        person[key] = {
            "bbox": (
                rng.rand(1, 4).astype(np.float32) * 100
                if with_person
                else np.zeros((0, 4), np.float32)
            ),
            "bbox_size": (480, 270),
        }
        objects[key] = [
            {
                "class": "chair",
                "bbox": [10.0, 20.0, 30.0, 40.0],  # xywh
                "attention_relationship": ["looking_at"],
                "spatial_relationship": ["in_front_of"],
                "contacting_relationship": ["sitting_on", "touching"],
                "visible": visible,
                "metadata": {"set": split},
            }
        ]

    # video A: 4 valid frames (train)
    for f in range(4):
        add_frame("A.mp4", f)
    # video B: only 1 person frame -> filtered as one_frame_video
    add_frame("B.mp4", 0)
    add_frame("B.mp4", 1, with_person=False)
    # video C: test split
    for f in range(3):
        add_frame("C.mp4", f, split="test")

    with open(root / "annotations/person_bbox.pkl", "wb") as fh:
        pickle.dump(person, fh)
    with open(root / "annotations/object_bbox_and_relationship.pkl", "wb") as fh:
        pickle.dump(objects, fh)
    return str(root)


def test_train_split_filtering(ag_root):
    ds = ActionGenome("train", "large", ag_root)
    assert len(ds) == 1  # only video A survives (>2 valid frames)
    assert ds.one_frame_video == 1
    assert ds.non_gt_human_nums == 1
    ann = ds.gt_annotations[0]
    assert len(ann) == 4
    frame = ann[0]
    assert "person_bbox" in frame[0]
    obj = frame[1]
    # xywh -> xyxy
    np.testing.assert_allclose(obj["bbox"], [10, 20, 40, 60])
    assert obj["class"] == ds.object_classes.index("chair")
    assert obj["attention_relationship"] == [0]
    assert obj["spatial_relationship"] == [C.AG_SPATIAL_RELATIONSHIPS.index("in_front_of")]
    assert sorted(obj["contacting_relationship"]) == sorted(
        [C.AG_CONTACTING_RELATIONSHIPS.index("sitting_on"),
         C.AG_CONTACTING_RELATIONSHIPS.index("touching")]
    )


def test_test_split(ag_root):
    ds = ActionGenome("test", "large", ag_root)
    assert len(ds) == 1
    assert ds.video_list[0][0].startswith("C.mp4/")


def test_class_lists_fall_back_to_constants(ag_root):
    ds = ActionGenome("train", "large", ag_root)
    assert tuple(ds.object_classes) == C.AG_OBJECT_CLASSES
    assert tuple(ds.relationship_classes) == C.AG_RELATIONSHIP_CLASSES
    assert len(ds.attention_relationships) == 3
    assert len(ds.spatial_relationships) == 6
    assert len(ds.contacting_relationships) == 17
