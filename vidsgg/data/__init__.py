"""Data layer: Action Genome annotation parsing, frame preprocessing, the
padded/masked ``Entry`` structure that flows through detector and relation
models, synthetic data for tests, and the KCC / VidVRD loaders."""

from vidsgg.data.entry import Entry, EntryCapacity  # noqa: F401
from vidsgg.data.gt_entries import build_gt_entry  # noqa: F401
from vidsgg.data.synthetic import synthetic_video_annotation  # noqa: F401
