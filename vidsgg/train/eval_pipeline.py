"""Mode-aware evaluation pipelines.

predcls: one jit region (full model forward).

sgcls / sgdet: three stages, mirroring where the reference's data-dependent
control flow sits (lib/tempura.py:257-423):

  1. jit  — OSPU object classification (test phase);
  2. host — relabel / dedup / (sgdet: clean_class + NMS) / pair rebuild
            (:mod:`vidsgg.models.postprocess`);
  3. jit  — union-feature ROIAlign + spatial masks for the rebuilt pairs,
            then the relation transformer + heads.

The final pred dict is evaluator-ready NumPy.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.data.entry import Entry, EntryCapacity
from vidsgg.detector.featurize import pair_union_features
from vidsgg.eval.adapter import to_eval_pred
from vidsgg.models.postprocess import ObjectsView, sgcls_postprocess, sgdet_postprocess
from vidsgg.train.state import TrainState


def _cast_floating(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def cast_state_for_serving(state: TrainState, dtype) -> TrainState:
    """Serving-precision cast: float params / stats / memory banks to
    ``dtype`` (bf16 halves HBM traffic and doubles MXU rate). Flax layers
    infer compute dtype from operands, so this turns the whole relation
    stack bf16 without touching module code. Opt-in: predictions shift at
    bf16 rounding scale (~3 decimal digits), so the default stays f32."""
    return state.replace(
        params=_cast_floating(state.params, dtype),
        batch_stats=_cast_floating(state.batch_stats, dtype),
        rel_memory=_cast_floating(state.rel_memory, dtype),
        obj_memory=_cast_floating(state.obj_memory, dtype),
    )


def _predcls_stage(state: TrainState, entry: Entry):
    """Whole predcls test forward as one jit region (GT boxes + labels ->
    predicate distributions). Unjitted, this path dispatches thousands of
    ops through the device transport per video (~2 s/video measured on the
    v5e tunnel vs ~10 ms jitted)."""
    return state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        entry,
        phase="test",
        rel_memory=state.rel_memory,
        obj_memory=state.obj_memory,
        mem_active=state.mem_active,
    )


def _classify_stage(state: TrainState, entry: Entry):
    return state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        entry,
        phase="test",
        obj_memory=state.obj_memory,
        mem_active=state.mem_active,
        method="classify_objects",
    )


def _relation_stage(state: TrainState, entry: Entry, obj_mem_features, fmaps):
    union_feat, _, spatial_masks = pair_union_features(entry, fmaps)
    entry = entry.replace(union_feat=union_feat, spatial_masks=spatial_masks)
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        entry,
        obj_mem_features,
        phase="test",
        rel_memory=state.rel_memory,
        mem_active=state.mem_active,
        method="relation_forward",
    )
    return entry, out


def _relation_stage_no_union(state: TrainState, entry: Entry, obj_mem_features, fmaps):
    """TEAT-GT consumes object features + pairs only — no union ROIAlign."""
    del fmaps
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        entry,
        obj_mem_features,
        phase="test",
        method="relation_forward",
    )
    return entry, out


def _sgcls_fused(state: TrainState, entry: Entry, fmaps, needs_union: bool):
    """Whole sgcls test step as ONE jit region: OSPU classify -> on-device
    relabel/dedup/pair rebuild -> union refeaturize -> relation forward."""
    from vidsgg.models.postprocess_device import sgcls_postprocess_device

    aux = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        entry,
        phase="test",
        obj_memory=state.obj_memory,
        mem_active=state.mem_active,
        method="classify_objects",
    )
    entry2 = sgcls_postprocess_device(entry, aux["distribution"])
    if needs_union:
        union_feat, _, spatial_masks = pair_union_features(entry2, fmaps)
        entry2 = entry2.replace(union_feat=union_feat, spatial_masks=spatial_masks)
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        entry2,
        aux.get("object_mem_features"),
        phase="test",
        rel_memory=state.rel_memory,
        mem_active=state.mem_active,
        method="relation_forward",
    )
    return entry2, out


def _sgdet_fused(state: TrainState, entry: Entry, fmaps, needs_union: bool,
                 union_ppf: int | None = None):
    """Whole sgdet test step as ONE jit region: OSPU classify -> on-device
    clean_class + grouped NMS + relabel + pair rebuild (expanded object
    axis) -> union refeaturize -> relation forward. Returns an overflow
    flag; the caller re-runs the exact host path on (rare) truncation.

    ``union_ppf``: optional static per-frame pair bound enabling the
    grouped per-frame union pooling (one fused ROIAlign GEMM per frame
    instead of the batch-embedded general path); frames holding more pairs
    raise the overflow flag and fall back like any other truncation."""
    from vidsgg.models.postprocess_device import sgdet_postprocess_device

    aux = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        entry,
        phase="test",
        obj_memory=state.obj_memory,
        mem_active=state.mem_active,
        method="classify_objects",
    )
    entry2, mem2, overflow = sgdet_postprocess_device(
        entry, aux["distribution"], aux["object_mem_features"]
    )
    if needs_union:
        if union_ppf is not None:
            from vidsgg.detector.featurize import pair_union_features_grouped

            union_feat, _, spatial_masks, u_ovf = pair_union_features_grouped(
                entry2, fmaps, union_ppf
            )
            overflow |= u_ovf
        else:
            union_feat, _, spatial_masks = pair_union_features(entry2, fmaps)
        entry2 = entry2.replace(union_feat=union_feat, spatial_masks=spatial_masks)
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        entry2,
        mem2,
        phase="test",
        rel_memory=state.rel_memory,
        mem_active=state.mem_active,
        method="relation_forward",
    )
    return entry2, out, overflow


predcls_stage = jax.jit(_predcls_stage)
classify_stage = jax.jit(_classify_stage)
relation_stage = jax.jit(_relation_stage)
relation_stage_no_union = jax.jit(_relation_stage_no_union)
sgcls_fused_stage = jax.jit(_sgcls_fused, static_argnums=(3,))
sgdet_fused_stage = jax.jit(_sgdet_fused, static_argnums=(3, 4))


def _pad_rows(arr: np.ndarray, cap: int) -> np.ndarray:
    out = np.zeros((cap,) + arr.shape[1:], arr.dtype)
    out[: len(arr)] = arr
    return out


def _rebuild_entry(
    entry: Entry, o: ObjectsView, human_idx, im_idx, pairs, cap: EntryCapacity
) -> tuple[Entry, np.ndarray]:
    """Pack the postprocessed host view back into a padded Entry.

    Returns (entry, mem_features_padded); GT predicate fields are aligned to
    the rebuilt pair list only where a rebuilt pair coincides with a GT pair
    (they are not used by the evaluator for sgcls/sgdet test)."""
    n = len(o.boxes)
    p = len(im_idx)
    if n > cap.max_objs or p > cap.max_pairs:
        raise ValueError(
            f"postprocessed video ({n} objs, {p} pairs) exceeds capacity {cap}"
        )
    base = Entry.zeros(cap, num_classes=entry.distribution.shape[1] + 1)
    new = base.replace(
        boxes=_pad_rows(o.boxes.astype(np.float32), cap.max_objs),
        labels=_pad_rows(o.labels.astype(np.int32), cap.max_objs),
        scores=_pad_rows(o.pred_scores.astype(np.float32), cap.max_objs),
        distribution=_pad_rows(o.distribution.astype(np.float32), cap.max_objs),
        pred_labels=_pad_rows(o.pred_labels.astype(np.int32), cap.max_objs),
        features=_pad_rows(o.features.astype(np.float32), cap.max_objs),
        obj_mask=np.arange(cap.max_objs) < n,
        im_idx=_pad_rows(im_idx.astype(np.int32), cap.max_pairs),
        pair_idx=_pad_rows(pairs.astype(np.int32), cap.max_pairs),
        pair_mask=np.arange(cap.max_pairs) < p,
        human_idx=_pad_rows(human_idx.astype(np.int32), cap.max_frames),
        frame_mask=entry.frame_mask,
        im_scale=entry.im_scale,
        num_frames=entry.num_frames,
        video_size=entry.video_size,
    )
    mem = _pad_rows(o.mem_features.astype(np.float32), cap.max_objs)
    return new, mem


@dataclasses.dataclass
class EvalPipeline:
    mode: str
    cap: EntryCapacity
    needs_union: bool = True  # False for TEAT-GT (no union visual stream)
    device_postprocess: bool = True  # sgcls relabeling fused into one jit
    compute_dtype: object = None  # e.g. jnp.bfloat16 serving-precision mode
    union_pairs_per_frame: int | None = None  # grouped per-frame union pooling

    def __call__(self, state: TrainState, entry: Entry, fmaps, gt_entry: Entry | None = None):
        """Run test-time inference for one video.

        Args:
          state: trained state.
          entry: featurized entry (GT boxes for predcls/sgcls; detector
            output for sgdet).
          fmaps: [F, H, W, 1024] base feature maps for union re-pooling.
          gt_entry: unused for predcls; kept for symmetry.

        Returns an evaluator-ready pred dict (NumPy).
        """
        if self.compute_dtype is not None:
            state = cast_state_for_serving(state, self.compute_dtype)
            entry = _cast_floating(entry, self.compute_dtype)
            if fmaps is not None:
                fmaps = _cast_floating(fmaps, self.compute_dtype)

        if self.mode == "predcls":
            out = predcls_stage(state, entry)
            return to_eval_pred(entry, out, "predcls")

        if self.mode == "sgcls" and self.device_postprocess:
            entry2, out = sgcls_fused_stage(state, entry, fmaps, self.needs_union)
            pred = to_eval_pred(entry2, out, self.mode)
            return self._attach_gt(pred, gt_entry)

        if self.mode == "sgdet" and self.device_postprocess:
            entry2, out, overflow = sgdet_fused_stage(
                state, entry, fmaps, self.needs_union,
                self.union_pairs_per_frame,
            )
            if not bool(overflow):  # rare clean_class blow-up -> host path
                pred = to_eval_pred(entry2, out, self.mode)
                return self._attach_gt(pred, gt_entry)

        aux = _classify_jit(state, entry)
        n = int(np.asarray(entry.obj_mask).sum())
        num_frames = int(np.asarray(entry.num_frames))
        dist = np.asarray(aux["distribution"])[:n]
        o = ObjectsView(
            boxes=np.asarray(entry.boxes)[:n],
            distribution=dist.copy(),
            features=np.asarray(entry.features)[:n],
            mem_features=np.asarray(aux["object_mem_features"])[:n],
            # sgdet's clean_class reads the *detector's* labels before OSPU
            # relabeling (lib/tempura.py:331-333 uses entry['pred_labels']
            # from the detector entry)
            pred_labels=np.asarray(entry.pred_labels)[:n].astype(np.int64),
            pred_scores=np.zeros(n, np.float32),
            labels=np.asarray(entry.labels)[:n],
        )
        if self.mode == "sgcls":
            o, human_idx, im_idx, pairs = sgcls_postprocess(o, num_frames)
        else:
            o, human_idx, im_idx, pairs = sgdet_postprocess(o, num_frames)

        eval_cap = EntryCapacity(
            self.cap.max_frames, self.cap.max_objs, max(self.cap.max_objs, self.cap.max_pairs)
        )
        entry2, mem = _rebuild_entry(entry, o, human_idx, im_idx, pairs, eval_cap)
        stage = relation_stage if self.needs_union else relation_stage_no_union
        entry2, out = stage(state, entry2, mem, fmaps)
        pred = to_eval_pred(entry2, out, self.mode)
        return self._attach_gt(pred, gt_entry)

    @staticmethod
    def _attach_gt(pred, gt_entry):
        """The temporal-consistency metric reads the GT predicate lists in
        the *original* GT pair order (the reference keeps them from the
        detector entry even after pairs are rebuilt, lib/tempura.py:302-316
        + temporal_consistency.py:34-37)."""
        if gt_entry is None:
            return pred
        pm, att, sp, con = jax.device_get((  # one transfer, not four
            gt_entry.pair_mask, gt_entry.attention_gt,
            gt_entry.spatial_gt, gt_entry.contacting_gt,
        ))
        pgt = int(np.asarray(pm).sum())
        pred["attention_gt"] = [[int(x)] for x in np.asarray(att)[:pgt]]
        pred["spatial_gt"] = [
            np.where(r > 0)[0].tolist() for r in np.asarray(sp)[:pgt]
        ]
        pred["contacting_gt"] = [
            np.where(r > 0)[0].tolist() for r in np.asarray(con)[:pgt]
        ]
        return pred


_classify_jit = classify_stage
