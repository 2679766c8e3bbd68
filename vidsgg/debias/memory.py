"""Uncertainty-weighted memory banks, single-pass and device-resident.

The reference pipeline (tools/utils/Uncertainty.py + tools/utils/Memory.py)
dumps relation/object embeddings to ``.npy`` every step and re-reads the
whole epoch's files at epoch end, normalizing uncertainties with per-class
exp-sums (``stats2``, Uncertainty.py:55-67) before a weighted aggregation
(Memory.py:53-117). Algebraically the epoch-end bank is

* weight_type 'simple':   mem[c] = mean of embeddings labeled c
  (indicator weights, final division by counts — Memory.py:72-84, 119-131);
* 'al' / 'ep':            mem[c] = sum_i exp(u_ic) f_i / (sum_i exp(u_ic) + 1e-12)
  (normalize_batch_uncertainty divides each weight by the per-class exp-sum,
  Uncertainty.py:225/242; Memory.py then sums without further division);
* 'both':                 numerator weights are exp(al+ep), but the
  DENOMINATOR carries two reference quirks from ``stats2``
  (Uncertainty.py:55-67), where ``+`` concatenates the python lists instead
  of adding the arrays: relations divide by **2 * sum_i exp(al_ic)**
  (``np.exp(al + al)`` — al twice), objects by
  **sum_i exp(al_ic) + sum_i exp(ep_ic)**. Both reproduced exactly (the
  bank scale feeds the memory attention, so it is part of the trained
  function); gated by the torch-oracle test against Memory.py itself.

Both forms are single-pass streamable: accumulate (weighted feature sums,
weight sums) per class on device and divide once at epoch end. No disk I/O,
no second pass. Background objects are excluded (include_bg_mem=False
default, Memory.py:20-21).

Bank layout: relation rows are [attention(3); spatial(6); contacting(17)] —
the dict-insertion order of the reference's rel_memory
(TEMPURA_train.py:362-364) concatenated by the joint hallucinator
(transformer.py:156).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from vidsgg import constants as C
from vidsgg.data.entry import Entry


class MemoryAccumulator(struct.PyTreeNode):
    rel_wsum: jnp.ndarray   # [26, Dr] weighted feature sums
    rel_w: jnp.ndarray      # [26] weight sums
    obj_wsum: jnp.ndarray   # [C-1, Do]
    obj_w: jnp.ndarray      # [C-1]
    # per-class uncertainty statistics (observability, Uncertainty.stats):
    rel_al_sum: jnp.ndarray  # [26]
    rel_ep_sum: jnp.ndarray  # [26]
    rel_cnt: jnp.ndarray     # [26]
    obj_al_sum: jnp.ndarray  # [C-1]
    obj_ep_sum: jnp.ndarray  # [C-1]
    obj_cnt: jnp.ndarray     # [C-1]
    # per-class exp-sums (the stats2 normalizers, Uncertainty.py:55-67):
    rel_expal: jnp.ndarray   # [26]  sum_i exp(al_ic) over labeled slots
    rel_expep: jnp.ndarray   # [26]
    obj_expal: jnp.ndarray   # [C-1]
    obj_expep: jnp.ndarray   # [C-1]

    @classmethod
    def zeros(cls, rel_dim: int = 1936, obj_dim: int = 1024,
              num_obj_classes: int = C.NUM_OBJ_CLASSES) -> "MemoryAccumulator":
        nr, no = C.NUM_PREDICATES, num_obj_classes - 1
        return cls(
            rel_wsum=jnp.zeros((nr, rel_dim)),
            rel_w=jnp.zeros(nr),
            obj_wsum=jnp.zeros((no, obj_dim)),
            obj_w=jnp.zeros(no),
            rel_al_sum=jnp.zeros(nr),
            rel_ep_sum=jnp.zeros(nr),
            rel_cnt=jnp.zeros(nr),
            obj_al_sum=jnp.zeros(no),
            obj_ep_sum=jnp.zeros(no),
            obj_cnt=jnp.zeros(no),
            rel_expal=jnp.zeros(nr),
            rel_expep=jnp.zeros(nr),
            obj_expal=jnp.zeros(no),
            obj_expep=jnp.zeros(no),
        )


def _rel_label_matrix(entry: Entry) -> jnp.ndarray:
    """[P, 26] multi-hot over the joint predicate space, masked."""
    att = jnp.eye(C.NUM_ATTENTION)[entry.attention_gt]
    lab = jnp.concatenate([att, entry.spatial_gt, entry.contacting_gt], axis=1)
    return lab * entry.pair_mask[:, None]


def _weights(lab, al, ep, weight_type):
    """Per-sample per-class aggregation weights on labeled slots."""
    if weight_type == "simple" or al is None:
        return lab
    if weight_type == "al":
        u = al
    elif weight_type == "ep":
        u = ep
    else:  # 'both'
        u = al + ep
    return lab * jnp.exp(u)


def accumulate_memory(
    acc: MemoryAccumulator,
    entry: Entry,
    out: dict,
    rel_weight_type: str = "simple",
    obj_weight_type: str = "simple",
    obj_mem: bool = False,
) -> MemoryAccumulator:
    """Fold one video's uncertainty pass (``unc=True`` forward output) into
    the accumulator. Fully jit-able; call under jit inside the train loop."""
    lab = _rel_label_matrix(entry)  # [P, 26]
    rel_feats = out["rel_features"]  # [P, 1936]

    if "attention_al_uc" in out:
        al = jnp.concatenate(
            [out["attention_al_uc"], out["spatial_al_uc"], out["contacting_al_uc"]],
            axis=1,
        )
        ep = jnp.concatenate(
            [out["attention_ep_uc"], out["spatial_ep_uc"], out["contacting_ep_uc"]],
            axis=1,
        )
    else:
        al = ep = None

    w = _weights(lab, al, ep, rel_weight_type)  # [P, 26]
    acc = acc.replace(
        rel_wsum=acc.rel_wsum + w.T @ rel_feats,
        rel_w=acc.rel_w + w.sum(0),
    )
    if al is not None:
        acc = acc.replace(
            rel_al_sum=acc.rel_al_sum + (lab * al).sum(0),
            rel_ep_sum=acc.rel_ep_sum + (lab * ep).sum(0),
            rel_cnt=acc.rel_cnt + lab.sum(0),
            rel_expal=acc.rel_expal + (lab * jnp.exp(al)).sum(0),
            rel_expep=acc.rel_expep + (lab * jnp.exp(ep)).sum(0),
        )

    if obj_mem and "object_features" in out:
        # object axis: exclude background; class c occupies row c-1
        valid = entry.obj_mask & (entry.labels != 0)
        olab = (
            jnp.eye(acc.obj_w.shape[0] + 1)[entry.labels][:, 1:]
            * valid[:, None]
        )  # [N, C-1]
        if obj_weight_type != "simple" and "obj_al_uc" in out:
            # obj uncertainties are over the full class axis; take the
            # labeled column (Uncertainty.py:115-119)
            oal = jnp.take_along_axis(
                out["obj_al_uc"], entry.labels[:, None], axis=1
            )
            oep = jnp.take_along_axis(
                out["obj_ep_uc"], entry.labels[:, None], axis=1
            )
            u = {"al": oal, "ep": oep}.get(obj_weight_type, oal + oep)
            ow = olab * jnp.exp(u)
        else:
            ow = olab
        acc = acc.replace(
            obj_wsum=acc.obj_wsum + ow.T @ out["object_features"],
            obj_w=acc.obj_w + ow.sum(0),
        )
        if "obj_al_uc" in out:
            oal = jnp.take_along_axis(out["obj_al_uc"], entry.labels[:, None], axis=1)[:, 0]
            oep = jnp.take_along_axis(out["obj_ep_uc"], entry.labels[:, None], axis=1)[:, 0]
            acc = acc.replace(
                obj_al_sum=acc.obj_al_sum + (olab * oal[:, None]).sum(0),
                obj_ep_sum=acc.obj_ep_sum + (olab * oep[:, None]).sum(0),
                obj_cnt=acc.obj_cnt + olab.sum(0),
                obj_expal=acc.obj_expal + (olab * jnp.exp(oal)[:, None]).sum(0),
                obj_expep=acc.obj_expep + (olab * jnp.exp(oep)[:, None]).sum(0),
            )
    return acc


def _denominator(weight_type, w, expal, expep, joint_quirk):
    """The reference's per-class normalizer for each weight type.

    'simple' divides the indicator sums by the counts with a nonzero guard
    (Memory.py:119-131); the weighted types divide each sample weight by
    the stats2 exp-sum + 1e-12 (Uncertainty.py:225/242). 'both' uses the
    quirk normalizers documented in the module docstring: 2*sum(exp(al))
    for relations (joint_quirk=True), sum(exp(al)) + sum(exp(ep)) for
    objects."""
    if weight_type == "simple":
        return jnp.where(w > 0, w, jnp.inf)  # zero-sample rows stay zero
    if weight_type == "al":
        return expal + 1e-12
    if weight_type == "ep":
        return expep + 1e-12
    if joint_quirk:  # 'both', relations: stats2's np.exp(al + al)
        return 2.0 * expal + 1e-12
    return expal + expep + 1e-12  # 'both', objects: exp(al) ++ exp(ep)


def finalize_memory(acc: MemoryAccumulator, rel_weight_type: str = "simple",
                    obj_weight_type: str = "simple"):
    """(rel_memory [26, Dr], obj_memory [C-1, Do]) — classes with no samples
    stay zero (matching the reference's zero-initialized banks)."""
    rel_den = _denominator(rel_weight_type, acc.rel_w, acc.rel_expal,
                           acc.rel_expep, joint_quirk=True)
    obj_den = _denominator(obj_weight_type, acc.obj_w, acc.obj_expal,
                           acc.obj_expep, joint_quirk=False)
    rel = acc.rel_wsum / rel_den[:, None]
    obj = acc.obj_wsum / obj_den[:, None]
    return rel, obj


def uncertainty_stats(acc: MemoryAccumulator) -> dict:
    """Per-class mean uncertainties (the reference's unc_vals.stats view)."""
    rel_c = jnp.maximum(acc.rel_cnt, 1.0)
    obj_c = jnp.maximum(acc.obj_cnt, 1.0)
    return {
        "rel_al_mean": acc.rel_al_sum / rel_c,
        "rel_ep_mean": acc.rel_ep_sum / rel_c,
        "rel_count": acc.rel_cnt,
        "obj_al_mean": acc.obj_al_sum / obj_c,
        "obj_ep_mean": acc.obj_ep_sum / obj_c,
        "obj_count": acc.obj_cnt,
    }
