"""Numeric kernels: box utilities, union-mask rasterizer, ROIAlign, NMS,
masked Laplacian eigendecomposition.

These replace the reference's native components (CUDA ROIAlign/NMS, Cython
draw_union_boxes / bbox_overlaps — SURVEY.md §2.3) with jit-able JAX ops and
Pallas TPU kernels operating on fixed-shape padded buffers.
"""

from vidsgg.ops.boxes import (  # noqa: F401
    bbox_overlaps,
    bbox_transform_inv,
    box_union,
    center_size,
    clip_boxes,
)
from vidsgg.ops.union_masks import draw_union_masks  # noqa: F401
from vidsgg.ops.roi_align import roi_align  # noqa: F401
from vidsgg.ops.nms import batched_class_nms, nms_mask  # noqa: F401
from vidsgg.ops.laplacian import masked_laplacian_eig  # noqa: F401
