"""VidVRD end-to-end: loader -> chunked generic entries -> relation model
-> tagging eval (SURVEY.md §7.4 parity gate 5 — reference has a 0-LoC stub,
so these tests define the capability rather than mirror one)."""

import json
import os

import jax
import numpy as np
import pytest

from vidsgg.data.entry import EntryCapacity
from vidsgg.data.vidvrd import VidVRD, synthetic_vidvrd_annotation
from vidsgg.data.vidvrd_entry import ChunkStats, build_vidvrd_entries
from vidsgg.eval.vidvrd_eval import VidVRDEvaluator, chunk_outputs
from vidsgg.models.generic_rel import GenericRelModel, predicate_bce_loss

NP = 8  # predicates
NC = 10  # object classes


def _write_split(tmpdir, anns, mode="train"):
    os.makedirs(os.path.join(tmpdir, mode), exist_ok=True)
    for a in anns:
        with open(os.path.join(tmpdir, mode, a["video_id"] + ".json"), "w") as f:
            json.dump(a, f)


def test_loader_roundtrip(tmp_path):
    anns = [synthetic_vidvrd_annotation(12, seed=s) for s in range(3)]
    _write_split(str(tmp_path), anns)
    ds = VidVRD("train", str(tmp_path))
    assert len(ds) == 3
    frames = ds.video_annotation(0)
    assert len(frames) == 12
    # every relation's endpoints exist in the frame it is active in
    for fr in frames:
        for s, o, p in fr["relations"]:
            assert s in fr["boxes"] and o in fr["boxes"]
            assert 0 <= p < len(ds.predicate_classes)


def test_chunking_accounts_for_every_frame_and_pair(tmp_path):
    """Ragged stress: a 300-frame video must split into many chunks with
    zero silent drops (capacities sized generously)."""
    ann = synthetic_vidvrd_annotation(300, num_tracks=5, seed=7)
    _write_split(str(tmp_path), [ann])
    ds = VidVRD("train", str(tmp_path))
    frames = ds.video_annotation(0)

    cap = EntryCapacity(max_frames=16, max_objs=96, max_pairs=256)
    stats = ChunkStats()
    entries = build_vidvrd_entries(frames, cap, NP, stats)

    assert stats.chunks == len(entries) and stats.chunks >= 300 // 16
    assert stats.frames == 300
    assert stats.dropped_objs == 0 and stats.dropped_pairs == 0
    # chunk frame offsets tile the video exactly
    spans = sorted(
        (int(e.frame_offset), int(e.num_frames)) for e in entries
    )
    cursor = 0
    for off, nf in spans:
        assert off == cursor
        cursor += nf
    assert cursor == 300
    # totals match the raw annotation
    n_objs = sum(len(fr["boxes"]) for fr in frames)
    n_pairs = sum(
        len({(s, o) for s, o, _ in fr["relations"]}) for fr in frames
    )
    assert stats.objs == n_objs and stats.pairs == n_pairs


def test_overfull_chunks_are_counted_not_silent():
    ann = synthetic_vidvrd_annotation(4, num_tracks=6, seed=3)
    frames = [
        {
            "boxes": fr["boxes"],
            "classes": fr["classes"],
            "relations": fr["relations"],
        }
        for fr in ann_frames(ann)
    ]
    tiny = EntryCapacity(max_frames=4, max_objs=3, max_pairs=2)
    stats = ChunkStats()
    build_vidvrd_entries(frames, tiny, NP, stats)
    assert stats.dropped_objs + stats.dropped_pairs > 0


def ann_frames(ann):
    """Expand a release-format dict without going through the file system."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        _write_split(d, [ann])
        return VidVRD("train", d).video_annotation(0)


def test_generic_rel_trains_and_eval_improves(tmp_path):
    """A few steps on learnable synthetic supervision: loss decreases and
    tagging recall beats the untrained model."""
    anns = [
        synthetic_vidvrd_annotation(10, seed=s, num_classes=NC, num_predicates=NP)
        for s in range(2)
    ]
    _write_split(str(tmp_path), anns)
    ds = VidVRD("train", str(tmp_path))
    cap = EntryCapacity(max_frames=10, max_objs=48, max_pairs=64)
    videos = [
        build_vidvrd_entries(ds.video_annotation(i), cap, NP, ChunkStats())
        for i in range(len(ds))
    ]
    entries = [e for chunks in videos for e in chunks]
    assert entries and all(int(e.pair_mask.sum()) > 0 for e in entries)

    model = GenericRelModel(num_obj_classes=NC + 1, num_predicates=NP)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, entries[0])["params"]

    import optax

    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, e, rng):
        def loss_fn(p):
            logits = model.apply(
                {"params": p}, e, deterministic=False, rngs={"dropout": rng}
            )
            return predicate_bce_loss(logits, e)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    def evaluate(p):
        ev = VidVRDEvaluator(ks=(5,), frame_ks=(10,))
        for chunks in videos:
            outs = []
            for e in chunks:
                logits = model.apply({"params": p}, e, deterministic=True)
                outs.append(chunk_outputs(e, jax.nn.sigmoid(logits)))
            ev.add_video(outs)
        return ev.summarize()

    before = evaluate(params)
    losses = []
    for it in range(30):
        for e in entries:
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, e, sub)
            losses.append(float(loss))
    after = evaluate(params)

    assert np.mean(losses[-4:]) < np.mean(losses[:4]) * 0.8
    assert after["tag_R@5"] >= before["tag_R@5"]
    assert after["frame_R@10"] > before["frame_R@10"]


def test_evaluator_hand_case():
    """Hand-computed tagging P/R and frame recall."""
    scores = np.zeros((3, 4), np.float32)
    scores[0] = [0.9, 0.1, 0.0, 0.0]   # pair 0: predicts pred 0
    scores[1] = [0.0, 0.8, 0.0, 0.0]   # pair 1: predicts pred 1
    scores[2] = [0.0, 0.0, 0.0, 0.0]   # padded
    gt = np.zeros((3, 4), np.float32)
    gt[0, 0] = 1.0                      # pair 0 truly pred 0
    gt[1, 2] = 1.0                      # pair 1 truly pred 2 (missed)
    chunk = {
        "scores": scores,
        "pair_mask": np.array([True, True, False]),
        "im_idx": np.array([0, 0, 0]),
        "frame_offset": np.array(0),
        "subj_cls": np.array([1, 2, 0]),
        "obj_cls": np.array([3, 4, 0]),
        "predicate_gt": gt,
    }
    ev = VidVRDEvaluator(ks=(1, 2), frame_ks=(2,))
    ev.add_video([chunk])
    s = ev.summarize()
    # GT triplets: (1,0,3) and (2,2,4). Top-1 prediction = (1,0,3) hit.
    assert s["tag_P@1"] == pytest.approx(1.0)
    assert s["tag_R@1"] == pytest.approx(0.5)
    assert s["tag_R@2"] == pytest.approx(0.5)  # 2nd-ranked is (2,1,4), miss
    # frame: top-2 (pair,pred) = (0,0) hit, (1,1) miss -> recall 1/2
    assert s["frame_R@2"] == pytest.approx(0.5)
