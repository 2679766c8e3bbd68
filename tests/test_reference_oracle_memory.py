"""Torch-oracle parity for the epoch-end memory banks: the reference's own
``tools/utils/Memory.py`` + ``Uncertainty.py`` (stats2 + per-class
normalization + weighted aggregation over .npy dumps) vs our single-pass
device accumulator (``vidsgg.debias.memory``), fed identical uncertainty
passes for three videos, across all four relation weight types.

This gates the 'both' quirk normalizers in particular: stats2 concatenates
python lists with ``+``, so relations normalize by 2*sum(exp(al)) and
objects by sum(exp(al)) + sum(exp(ep)) — NOT sum(exp(al+ep)).

Object-memory notes (two reference landmines, both pinned by tests):

* the weighted object branch reads ``obj_features`` that only the 'simple'
  branch loads (Memory.py:57-59 vs :96-103) — ``obj_weight_type !=
  'simple'`` with ``obj_mem=True`` NameErrors on the first video;
* with a WEIGHTED rel type, the else-branch iterates ``obj_all_u`` even
  when the object type is 'simple' (``obj_all_u=None`` -> TypeError,
  Memory.py:92) — so object memory coexists only with rel 'simple'.

The reference's only working object-memory configuration is therefore
(rel 'simple', obj 'simple'); weighted rel types run with obj_mem=False.
Our accumulator supports every combination as an extension.

Tolerance note: the reference accumulates its banks into float32
``torch.zeros`` buffers (Memory.py:23-29), so agreement is asserted at
float32 resolution against our float64 accumulator.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vidsgg import constants as C  # noqa: E402
from vidsgg.data import (  # noqa: E402
    EntryCapacity,
    build_gt_entry,
    synthetic_video_annotation,
)
from vidsgg.debias import (  # noqa: E402
    MemoryAccumulator,
    accumulate_memory,
    finalize_memory,
)

CAP = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)
RELS = ("attention", "spatial", "contacting")
REL_N = {"attention": 3, "spatial": 6, "contacting": 17}


@pytest.fixture(scope="module", autouse=True)
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)
    jax.clear_caches()


def _video(seed):
    ann = synthetic_video_annotation(num_frames=4, objs_per_frame=2,
                                     seed=seed)
    entry = build_gt_entry(ann, CAP)
    rng = np.random.RandomState(seed)
    p = CAP.max_pairs
    out = {
        "rel_features": jnp.asarray(rng.randn(p, 1936)),
        "object_features": jnp.asarray(rng.randn(CAP.max_objs, 1024)),
        "obj_al_uc": jnp.asarray(rng.rand(CAP.max_objs, C.NUM_OBJ_CLASSES)),
        "obj_ep_uc": jnp.asarray(rng.rand(CAP.max_objs, C.NUM_OBJ_CLASSES)),
    }
    for rel in RELS:
        out[f"{rel}_al_uc"] = jnp.asarray(rng.rand(p, REL_N[rel]))
        out[f"{rel}_ep_uc"] = jnp.asarray(rng.rand(p, REL_N[rel]))
    return entry, out


def _rel_lab(entry, rel):
    p = np.asarray(entry.pair_mask)
    if rel == "attention":
        lab = np.eye(3)[np.asarray(entry.attention_gt)]
    elif rel == "spatial":
        lab = np.asarray(entry.spatial_gt)
    else:
        lab = np.asarray(entry.contacting_gt)
    return lab * p[:, None]


def _fill_reference_inputs(unc_vals, videos, tmpdir):
    """Replicate what uncertainty_computation records per video
    (Uncertainty.py:70-187, background_mem=False)."""
    rel_dir = tmpdir / "rel_embeddings"
    obj_dir = tmpdir / "obj_embeddings"
    rel_dir.mkdir(exist_ok=True)
    obj_dir.mkdir(exist_ok=True)
    for i, (entry, out) in enumerate(videos):
        np.save(rel_dir / f"{i}.npy", np.asarray(out["rel_features"]))
        labels = np.asarray(entry.labels)
        keep = np.asarray(entry.obj_mask) & (labels != 0)
        np.save(obj_dir / f"{i}.npy",
                np.asarray(out["object_features"])[keep])

        rel_dict = {}
        for rel in RELS:
            lab = _rel_lab(entry, rel)
            rel_dict[rel] = {}
            for u in ("al", "ep"):
                arr = np.asarray(out[f"{rel}_al_uc" if u == "al"
                                     else f"{rel}_ep_uc"])
                rel_dict[rel][u] = lab * arr  # values at labeled slots only
                for j, k in zip(*np.nonzero(lab)):
                    unc_vals.cls_rel_uc[rel][int(k)][u].append(
                        float(arr[j, k]))
        unc_vals.unc_list_rel[i] = rel_dict

        obj_dict = {}
        lab36 = np.eye(C.NUM_OBJ_CLASSES)[labels][:, 1:] * keep[:, None]
        for u in ("al", "ep"):
            full = np.asarray(out[f"obj_{u}_uc"])
            col = full[np.arange(len(labels)), labels]
            batch = lab36 * col[:, None]
            obj_dict[u] = batch[keep]  # bg rows dropped like the reference
            for cls in np.unique(labels[keep]):
                sel = np.where(labels == cls)[0]
                sel = sel[keep[sel]]
                unc_vals.cls_obj_uc[int(cls)][u] += col[sel].tolist()
        unc_vals.unc_list_obj[i] = obj_dict


@pytest.mark.parametrize("rel_wt", ["simple", "al", "ep", "both"])
def test_memory_banks_match_reference(rel_wt, tmp_path):
    from tools.utils.Memory import memory_computation
    from tools.utils.Uncertainty import uncertainty_values

    videos = [_video(s) for s in range(3)]
    obj_mem_on = rel_wt == "simple"  # the only reference-reachable combo

    unc_vals = uncertainty_values(
        obj_classes=C.NUM_OBJ_CLASSES, attention_class_num=3,
        spatial_class_num=6, contact_class_num=17)
    _fill_reference_inputs(unc_vals, videos, tmp_path)
    rel_mem_ref, obj_mem_ref = memory_computation(
        unc_vals, str(tmp_path) + "/", REL_N, C.NUM_OBJ_CLASSES,
        obj_feature_dim=1024, rel_feature_dim=1936,
        obj_weight_type="simple", rel_weight_type=rel_wt,
        obj_mem=obj_mem_on, obj_unc=obj_mem_on, include_bg_mem=False)

    acc = MemoryAccumulator.zeros()
    for entry, out in videos:
        acc = accumulate_memory(acc, entry, out, rel_wt, "simple",
                                obj_mem=obj_mem_on)
    rel_mem, obj_mem = finalize_memory(acc, rel_wt, "simple")

    bases = {"attention": 0, "spatial": 3, "contacting": 9}
    for rel in RELS:
        ours = np.asarray(rel_mem)[bases[rel]: bases[rel] + REL_N[rel]]
        np.testing.assert_allclose(
            ours, rel_mem_ref[rel].numpy(), atol=5e-7, rtol=5e-5,
            err_msg=f"rel bank {rel} ({rel_wt})")
    if obj_mem_on:
        np.testing.assert_allclose(
            np.asarray(obj_mem), obj_mem_ref.numpy(), atol=5e-7, rtol=5e-5,
            err_msg="obj bank")


@pytest.mark.parametrize("rel_wt,obj_wt,err", [
    ("both", "both", (NameError, UnboundLocalError)),  # Memory.py:96-103
    ("both", "simple", TypeError),                     # Memory.py:92
])
def test_reference_weighted_obj_memory_is_unreachable(rel_wt, obj_wt, err,
                                                      tmp_path):
    """Pin the two reference landmines the module docstring documents."""
    from tools.utils.Memory import memory_computation
    from tools.utils.Uncertainty import uncertainty_values

    videos = [_video(0)]
    unc_vals = uncertainty_values(
        obj_classes=C.NUM_OBJ_CLASSES, attention_class_num=3,
        spatial_class_num=6, contact_class_num=17)
    _fill_reference_inputs(unc_vals, videos, tmp_path)
    with pytest.raises(err):
        memory_computation(
            unc_vals, str(tmp_path) + "/", REL_N, C.NUM_OBJ_CLASSES,
            obj_weight_type=obj_wt, rel_weight_type=rel_wt,
            obj_mem=True, obj_unc=True, include_bg_mem=False)
