"""COMPOSED test-pipeline torch-oracle: the reference's whole test loop vs
our serving pipeline, gated on the FINAL printed numbers.

Every stage — entry building, model forward, the three-constraint
evaluator, the temporal-consistency metric — is oracle-gated separately at
1e-8 elsewhere; this module runs the glue.  It reproduces the reference's
test-loop semantics (TEMPURA_test.py:70-99: entry -> TEMPURA forward ->
{with, semi, no} ``evaluate_scene_graph`` -> ``evaluate_temp_cons`` ->
``print_stats`` / ``print_temp_cons_score``) end-to-end on several
synthetic AG-format videos with converted seeded weights, against OUR
real serving path (``EvalPipeline`` -> ``to_eval_pred`` ->
``get_ag_evaluators`` -> ``evaluate_temporal_consistency`` — exactly what
``cli/tempura_test.py`` executes per video), and asserts the full
R@{10,20,50,100}/mR grid under all three constraints AND the
temporal-consistency score are identical.  Glue bugs (pair ordering into
the evaluator, distribution key mapping, padding trims) live exactly
between the separately-gated pieces; this is the number the driver would
compare for parity, produced by both stacks.

predcls runs the one-jit serving stage; sgcls runs the fused
classify->relabel->relation stage including the tracking OSPU and the
reference's own ``get_sequence`` + test-postprocess branch.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")


def _stub(name, **attrs):
    m = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _unused(*_a, **_k):
    raise AssertionError("stubbed native op reached in this forward")


class _ROIAlignStub:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        _unused()


def _bbox_overlaps_pyx(boxes, query_boxes):
    """tools/utils/fpn/box_intersections_cpu/bbox.pyx semantics (see
    test_reference_oracle_evaluator for the lineage argument)."""
    boxes = np.asarray(boxes, np.float64)
    query = np.asarray(query_boxes, np.float64)
    iw = (np.minimum(boxes[:, None, 2], query[None, :, 2])
          - np.maximum(boxes[:, None, 0], query[None, :, 0]) + 1)
    ih = (np.minimum(boxes[:, None, 3], query[None, :, 3])
          - np.maximum(boxes[:, None, 1], query[None, :, 1]) + 1)
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    area_b = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    area_q = (query[:, 2] - query[:, 0] + 1) * (query[:, 3] - query[:, 1] + 1)
    return inter / (area_b[:, None] + area_q[None, :] - inter)


for _name in ("tools.fasterRCNN", "tools.fasterRCNN.lib",
              "tools.fasterRCNN.lib.model"):
    _stub(_name)
_stub("tools.fasterRCNN.lib.model.roi_layers",
      ROIAlign=_ROIAlignStub, nms=_unused)
_stub("tools.utils.draw_rectangles")
_stub("tools.utils.draw_rectangles.draw_rectangles", draw_union_boxes=_unused)
_stub("h5py")
_stub("dill")
for _name in ("tools.utils.fpn", "tools.utils.fpn.box_intersections_cpu"):
    _stub(_name)
_stub("tools.utils.fpn.box_intersections_cpu.bbox",
      bbox_overlaps=_bbox_overlaps_pyx)
_stub("tools.utils.fpn.box_utils", bbox_overlaps=_bbox_overlaps_pyx,
      center_size=_unused)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vidsgg import constants as C  # noqa: E402
from vidsgg.data import EntryCapacity, build_gt_entry  # noqa: E402
from vidsgg.data.synthetic import synthetic_video_annotation  # noqa: E402
from vidsgg.eval import get_ag_evaluators  # noqa: E402
from vidsgg.eval.adapter import to_eval_pred  # noqa: E402
from vidsgg.eval.temporal import (  # noqa: E402
    evaluate_temporal_consistency,
    temporal_consistency_summary,
)
from vidsgg.models.convert_relation import (  # noqa: E402
    convert_tempura_state_dict,
)
from vidsgg.models.tempura import Tempura, TempuraConfig  # noqa: E402
from vidsgg.train import create_train_state, make_optimizer  # noqa: E402
from vidsgg.train.eval_pipeline import EvalPipeline  # noqa: E402

KS = (10, 20, 50, 100)


@pytest.fixture(scope="module", autouse=True)
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)
    jax.clear_caches()


@pytest.fixture(autouse=True)
def _f64_torch():
    old = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(old)


def _torch_center_size(boxes):
    wh = boxes[:, 2:] - boxes[:, :2] + 1.0
    return torch.cat((boxes[:, :2] + 0.5 * (wh - 1.0), wh), 1)


def _build_reference(cfg, *, mode, tracking):
    """Reference TEMPURA in EVAL mode (the test scripts'), float64,
    perturbed off init with GMM logits kept O(1) — the same recipe as the
    gradient oracle (test_reference_oracle_grad)."""
    import lib.tempura as ref_mod

    ref_mod.center_size = _torch_center_size
    torch.manual_seed(42)
    ref_mod.obj_edge_vectors = lambda names, **kw: torch.randn(
        len(names), 200)
    names = list(C.AG_OBJECT_CLASSES)[: cfg.num_classes]
    rels = list(C.AG_RELATIONSHIP_CLASSES)
    model = ref_mod.TEMPURA(
        mode=mode, attention_class_num=cfg.attention_class_num,
        spatial_class_num=cfg.spatial_class_num,
        contact_class_num=cfg.contact_class_num,
        obj_classes=names, rel_classes=rels,
        enc_layer_num=cfg.enc_layers, dec_layer_num=cfg.dec_layers,
        obj_mem_compute=None, rel_mem_compute=True,
        mem_fusion="late", selection="manual", selection_lambda=0.5,
        take_obj_mem_feat=False, obj_head="gmm", rel_head="gmm",
        K=cfg.k, tracking=tracking,
    ).double().eval()
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.add_(0.1 * torch.randn_like(p))
            if "rel_compress" in name or "decoder_lin" in name:
                p.mul_(0.1)
    return model


def _make_video(cap, seed, num_frames, stable, sgcls=False, objs=2):
    """(ann, padded Entry with synthetic features, n, p)."""
    rng = np.random.default_rng(seed)
    ann = synthetic_video_annotation(num_frames=num_frames,
                                     objs_per_frame=objs, seed=seed,
                                     stable=stable)
    if stable:
        # the stable helper still salts spatial_relationship with one random
        # extra label per frame; the temporal metric keys runs on gt[0], so
        # pin it — otherwise find_consecutive_duplicates never reaches its
        # 6-row window
        for frame in ann:
            for o in frame[1:]:
                o["spatial_relationship"] = [2]
    entry = build_gt_entry(ann, cap)
    n = int(np.asarray(entry.obj_mask).sum())
    p = int(np.asarray(entry.pair_mask).sum())
    feats = np.zeros((cap.max_objs, 2048))
    feats[:n] = rng.standard_normal((n, 2048))
    union = np.zeros((cap.max_pairs, 7, 7, 1024))
    union[:p] = rng.standard_normal((p, 7, 7, 1024))
    masks = np.zeros((cap.max_pairs, 2, 27, 27))
    masks[:p] = rng.standard_normal((p, 2, 27, 27)) * 0.5
    entry = entry.replace(
        features=jnp.asarray(feats),
        union_feat=jnp.asarray(union),
        spatial_masks=jnp.asarray(masks),
    )
    if sgcls:
        # detector-style class scores biased toward GT so the OSPU argmax
        # chain sees realistic (mostly-right, sometimes-wrong) labels
        logits = rng.standard_normal((cap.max_objs, 36))
        lbl = np.asarray(entry.labels)
        logits[np.arange(cap.max_objs), np.clip(lbl - 1, 0, 35)] += 3.0
        dist = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        dist[n:] = 0.0
        entry = entry.replace(distribution=jnp.asarray(dist))
    return ann, entry, n, p


def _torch_entry(entry, n, p, sgcls=False):
    t = lambda a: torch.from_numpy(np.asarray(a, np.float64))
    ti = lambda a: torch.from_numpy(np.asarray(a, np.int64))
    d = {
        "boxes": t(entry.boxes[:n]),
        "labels": ti(entry.labels[:n]),
        "scores": t(entry.scores[:n]),
        "features": t(entry.features[:n]),
        "union_feat": t(entry.union_feat[:p]).permute(0, 3, 1, 2).contiguous(),
        "spatial_masks": t(entry.spatial_masks[:p]),
        "pair_idx": ti(entry.pair_idx[:p]),
        "im_idx": t(entry.im_idx[:p]),
        "attention_gt": [[int(x)] for x in np.asarray(entry.attention_gt)[:p]],
        "spatial_gt": [list(np.nonzero(row)[0])
                       for row in np.asarray(entry.spatial_gt)[:p]],
        "contacting_gt": [list(np.nonzero(row)[0])
                          for row in np.asarray(entry.contacting_gt)[:p]],
    }
    if sgcls:
        d["distribution"] = t(entry.distribution[:n])
    return d


def _np_roi_align_f64(fmaps_nhwc, rois, out=7, scale=1.0 / 16.0):
    """The torchvision/Caffe2 adaptive-sampling ROIAlign semantics behind
    the reference's CUDA op (lib/tempura.py:72), float64 end-to-end;
    bilinear kernel shared with the ROIAlign oracle (test_roi_align)."""
    import test_roi_align as ora

    n = len(rois)
    c = fmaps_nhwc.shape[-1]
    res = np.zeros((n, out, out, c), np.float64)
    for r, (b, rx1, ry1, rx2, ry2) in enumerate(rois):
        f = fmaps_nhwc[int(b)]
        x1, y1, x2, y2 = rx1 * scale, ry1 * scale, rx2 * scale, ry2 * scale
        bw = max(x2 - x1, 1.0) / out
        bh = max(y2 - y1, 1.0) / out
        gy, gx = int(np.ceil(bh)), int(np.ceil(bw))
        count = max(gy * gx, 1)
        for ph in range(out):
            for pw in range(out):
                acc = np.zeros(c, np.float64)
                for iy in range(gy):
                    y = y1 + ph * bh + (iy + 0.5) * bh / gy
                    for ix in range(gx):
                        x = x1 + pw * bw + (ix + 0.5) * bw / gx
                        acc += ora._bilinear(f, y, x)
                res[r, ph, pw] = acc / count
    return res


def _shim_union_ops(ref, monkeypatch):
    """Supply the reference's two native union ops (absent from the
    checkout): ROIAlign via the float64 torchvision transcription above,
    draw_union_boxes via our per-pixel-oracle-gated mask kernel
    (tests/test_union_masks.py pins its Cython-coverage semantics)."""
    import lib.tempura as ref_mod

    from vidsgg.ops.union_masks import draw_union_masks

    def roi_shim(fmaps_t, rois_t):
        fm = fmaps_t.detach().numpy().transpose(0, 2, 3, 1).astype(np.float64)
        out = _np_roi_align_f64(fm, rois_t.detach().numpy())
        return torch.from_numpy(np.ascontiguousarray(
            out.transpose(0, 3, 1, 2)))

    monkeypatch.setattr(ref.object_classifier, "RCNN_roi_align", roi_shim,
                        raising=True)
    monkeypatch.setattr(
        ref_mod, "draw_union_boxes",
        lambda pair_rois, s: np.asarray(
            draw_union_masks(jnp.asarray(np.asarray(pair_rois, np.float64)),
                             s)))


def _pretrain_sgcls(ref, videos, steps=25):
    """A few dozen torch AdamW steps on the fixture (the train scripts'
    loss assembly, TEMPURA_train.py:190-218) so the OSPU actually
    classifies and the sgcls grid is non-degenerate — zero-recall-equals-
    zero-recall would gate nothing.  Training runs torch-only; parity is
    asserted on the converter-mapped result."""
    from tools.utils.ds_track import get_sequence

    ref.train()
    weights = torch.ones(37)
    weights[0] = 0.3
    ce_obj = torch.nn.CrossEntropyLoss(weight=weights)
    ce_rel = torch.nn.CrossEntropyLoss()
    bce = torch.nn.BCELoss()
    opt = torch.optim.AdamW(ref.parameters(), lr=1e-3)
    prepped = []
    for tentry in videos:
        tentry = dict(tentry)
        get_sequence(tentry, None, None, "sgcls")
        prepped.append(tentry)
    for _ in range(steps):
        for tentry in prepped:
            opt.zero_grad()
            pred = ref(dict(tentry), phase="train", unc=False)
            att_label = torch.tensor(
                [a[0] for a in pred["attention_gt"]], dtype=torch.long)
            sp_label = torch.zeros(len(pred["spatial_gt"]), 6)
            con_label = torch.zeros(len(pred["contacting_gt"]), 17)
            for i, (s, c) in enumerate(zip(pred["spatial_gt"],
                                           pred["contacting_gt"])):
                sp_label[i, s] = 1
                con_label[i, c] = 1
            loss = (ce_obj(pred["distribution"], pred["labels"])
                    + ce_rel(pred["attention_distribution"], att_label)
                    + bce(pred["spatial_distribution"].clamp(0, 1), sp_label)
                    + bce(pred["contacting_distribution"].clamp(0, 1),
                          con_label))
            loss.backward()
            opt.step()
    ref.eval()


def _torch_gt(ann):
    """The annotation as the reference dataloader yields it: relationship
    index lists as torch tensors (evaluation_recall.py:117-123 calls
    ``.numpy()`` on them)."""
    out = []
    for frame in ann:
        new = [dict(frame[0])]
        for o in frame[1:]:
            o = dict(o)
            o["attention_relationship"] = torch.tensor(
                o["attention_relationship"])
            o["spatial_relationship"] = torch.tensor(
                o["spatial_relationship"])
            o["contacting_relationship"] = torch.tensor(
                o["contacting_relationship"])
            new.append(o)
        out.append(new)
    return out


def _ref_evaluators(mode):
    from tools.utils.evaluation_recall import BasicSceneGraphEvaluator

    mk = lambda constraint, semi=None: BasicSceneGraphEvaluator(
        mode=mode,
        AG_object_classes=list(C.AG_OBJECT_CLASSES),
        AG_all_predicates=list(C.AG_RELATIONSHIP_CLASSES),
        AG_attention_predicates=list(C.AG_ATTENTION_RELATIONSHIPS),
        AG_spatial_predicates=list(C.AG_SPATIAL_RELATIONSHIPS),
        AG_contacting_predicates=list(C.AG_CONTACTING_RELATIONSHIPS),
        iou_threshold=0.5, constraint=constraint, semithreshold=semi,
        output_dir=None,
    )
    return mk("with"), mk("semi", 0.9), mk("no")


def _printed_grid(evaluator, mode):
    """The exact numbers print_stats emits (evaluation_recall.py:54-77):
    R@K = np.mean of the per-frame list, mR@K = mean over the 26 predicates
    of hit/(count + 1e-10)."""
    grid = {}
    rd = evaluator.result_dict
    for k in KS:
        grid[f"R@{k}"] = float(np.mean(rd[mode + "_recall"][k]))
        hit = rd.get(mode + "_recall_hit", {}).get(k, [0] * 26)
        cnt = rd.get(mode + "_recall_count", {}).get(k, [0] * 26)
        grid[f"mR@{k}"] = float(
            sum(float(h) / float(c + 1e-10) for h, c in zip(hit, cnt)) / 26)
    return grid


# (seed, num_frames, stable, objs_per_frame): the stable single-object
# video yields >= 6-row same-class runs for the temporal metric (interleaved
# multi-object rows always break find_consecutive_duplicates' runs — the
# reference resets its counter on every class change, which in pair order
# means every other row)
VIDEOS = ((11, 8, True, 1), (12, 4, False, 2), (13, 5, False, 2))


@pytest.mark.parametrize("mode", ["predcls", "sgcls"])
def test_full_test_pipeline_matches_reference(mode, monkeypatch):
    import tools.utils.temporal_consistency as ref_tc

    monkeypatch.setattr(ref_tc, "device", torch.device("cpu"))
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=True)

    sgcls = mode == "sgcls"
    cap = EntryCapacity(max_frames=8, max_objs=26, max_pairs=16)
    cfg = TempuraConfig(mode=mode, enc_layers=1, dec_layers=2,
                        obj_head="gmm", rel_head="gmm", k=2,
                        rel_mem_compute="joint", mem_fusion="late",
                        selection="manual", selection_lambda=0.5,
                        tracking=sgcls)
    ref = _build_reference(cfg, mode=mode, tracking=sgcls)

    videos = []
    for seed, num_frames, stable, objs in VIDEOS:
        ann, entry, n, p = _make_video(cap, seed, num_frames, stable,
                                       sgcls=sgcls, objs=objs)
        videos.append((ann, entry, n, p,
                       _torch_entry(entry, n, p, sgcls=sgcls)))
    if sgcls:
        # random OSPU weights classify nothing -> R@K would be 0 on both
        # sides (a vacuous gate); teach the torch reference the fixture
        # first, then convert the trained weights
        _pretrain_sgcls(ref, [v[4] for v in videos])

    # ---- our serving state with the converter-mapped reference weights ----
    model = Tempura(cfg)
    entry0 = videos[0][1]
    tx = make_optimizer(base_lr=1e-4, steps_per_epoch=10)
    state = create_train_state(model, cfg, entry0, jax.random.PRNGKey(0), tx)
    variables = convert_tempura_state_dict(
        {k: v.numpy().copy() for k, v in ref.state_dict().items()}, cfg)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    pipe = EvalPipeline(mode, cap)

    ref_with, ref_semi, ref_no = _ref_evaluators(mode)
    our_with, our_semi, our_no = get_ag_evaluators(mode)
    ref_tc_sp = torch.tensor([])
    ref_tc_con = torch.tensor([])
    our_sp, our_con = [], []

    if sgcls:
        _shim_union_ops(ref, monkeypatch)

    for (ann, entry, n, p, tentry), (seed, *_rest) in zip(videos, VIDEOS):
        tentry = dict(tentry)
        gt = _torch_gt(ann)
        fmaps = None
        if sgcls:
            # shared conv4 maps: the sgcls test branch re-pools union
            # features from them after the pair rebuild (lib/tempura.py
            # :306-316); ours does the same inside the fused stage
            fm = (np.random.default_rng(700 + seed)
                  .standard_normal((cap.max_frames, 20, 32, 1024)) * 0.1)
            fmaps = jnp.asarray(fm)
            tentry["fmaps"] = torch.from_numpy(
                np.ascontiguousarray(fm.transpose(0, 3, 1, 2)))
            tentry["im_info"] = torch.tensor(1.0, dtype=torch.float64)

        # ---- reference test loop (TEMPURA_test.py:70-99) ----
        if sgcls:
            from tools.utils.ds_track import get_sequence

            get_sequence(tentry, ann, None, "sgcls")
        with torch.no_grad():
            pred = ref(dict(tentry), phase="test", unc=False)
        ref_with.evaluate_scene_graph(gt, dict(pred))
        ref_semi.evaluate_scene_graph(gt, dict(pred))
        ref_no.evaluate_scene_graph(gt, dict(pred))
        ref_tc_sp, ref_tc_con = ref_tc.evaluate_temp_cons(
            pred, ref_tc_sp, ref_tc_con, mode)

        # ---- our test loop (cli/tempura_test.py per-video body) ----
        our_pred = pipe(state, entry, fmaps, gt_entry=entry if sgcls else None)
        our_with.evaluate_scene_graph(gt, our_pred)
        our_semi.evaluate_scene_graph(gt, our_pred)
        our_no.evaluate_scene_graph(gt, our_pred)
        sp, con = evaluate_temporal_consistency(our_pred, mode)
        our_sp.extend(sp.tolist())
        our_con.extend(con.tolist())

    # ---- the printed grid: R@K / mR@K x 3 constraints ----
    for name, r, o in (("with", ref_with, our_with),
                       ("semi", ref_semi, our_semi),
                       ("no", ref_no, our_no)):
        ref_grid = _printed_grid(r, mode)
        our_grid = _printed_grid(o, mode)
        assert set(ref_grid) == set(our_grid)
        for key in ref_grid:
            np.testing.assert_allclose(
                our_grid[key], ref_grid[key], atol=1e-12, rtol=1e-12,
                err_msg=f"{name} constraint {key}")

    # the grid must be non-trivial: all-zeros == all-zeros gates nothing
    assert _printed_grid(ref_no, mode)["R@20"] > 0.0, "degenerate fixture"
    assert _printed_grid(ref_with, mode)["R@20"] < 1.0, "degenerate fixture"

    # ---- the printed temporal-consistency score ----
    summ = temporal_consistency_summary(np.array(our_sp), np.array(our_con))
    assert summ["num_spatial_intervals"] == len(ref_tc_sp)
    assert summ["num_contacting_intervals"] == len(ref_tc_con)
    assert len(ref_tc_sp) > 0, "fixture produced no stable intervals"
    # the reference log_softmaxes the one-hot GT in float32
    # (temporal_consistency.py:54,67) while we stay float64 — 1e-7-level
    # dtype noise; exact-dtype parity is gated by test_temporal_metric
    np.testing.assert_allclose(
        summ["spatial"], float(ref_tc_sp.mean()) * 100, rtol=1e-5)
    np.testing.assert_allclose(
        summ["contacting"], float(ref_tc_con.mean()) * 100, rtol=1e-5)
    combined = (float(ref_tc_sp.mean()) * 100
                + float(ref_tc_con.mean()) * 100) / 2
    np.testing.assert_allclose(summ["combined"], combined, rtol=1e-5)
