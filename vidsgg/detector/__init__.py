"""Detector front-end: Flax ResNet-101 Faster R-CNN plus the entry
featurization stages that replace tools/utils/object_detector.py."""

from vidsgg.detector.featurize import featurize_gt_entry, pair_union_features  # noqa: F401
