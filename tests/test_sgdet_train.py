"""sgdet TRAINING end-to-end through the detector front-end: raw frames ->
detect -> assign_relations -> fixed-capacity SUPPLY -> entry (with union
features) -> TEMPURA train steps with decreasing loss.

Covers the reference wiring object_detector.py:57-302 consumed at
TEMPURA_train.py:160-161, plus the single-compile SUPPLY guarantee.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsgg.data import EntryCapacity, synthetic_video_annotation
from vidsgg.detector.faster_rcnn import FasterRCNN
from vidsgg.detector.rpn import RPNConfig
from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend
from vidsgg.models import Tempura, TempuraConfig
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.steps import LossFlags, make_train_step

CAP = EntryCapacity(max_frames=4, max_objs=32, max_pairs=16)


@pytest.fixture(scope="module")
def sgdet_train_setup():
    model = FasterRCNN(
        rpn_cfg=RPNConfig(pre_nms_top_n=64, post_nms_top_n=16),
        base_blocks=(1, 1, 1), head_blocks=1,
    )
    frames0 = jnp.zeros((2, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), frames0, jnp.array([64.0, 96.0]))
    frontend = SgdetFrontend(
        model, variables, SgdetCaps(dets_per_frame=8, supply_cap=16), CAP
    )

    rng = np.random.RandomState(0)
    entries = []
    for seed, objs in ((2, 2), (3, 3), (4, 2)):  # varying SUPPLY counts
        ann = synthetic_video_annotation(
            num_frames=2, objs_per_frame=objs, seed=seed, image_wh=(96, 64)
        )
        frames = jnp.asarray(rng.rand(2, 64, 96, 3), jnp.float32)
        entry, fmaps = frontend(
            frames, jnp.array([64.0, 96.0]), 1.0,
            gt_annotation=ann, is_train=True,
        )
        entries.append(entry)
    return frontend, entries


def test_supply_compiles_once(sgdet_train_setup):
    frontend, entries = sgdet_train_setup
    # three videos with different SUPPLY counts went through; the fused
    # train_pack jit (SUPPLY re-pool at fixed capacity + row gather + union
    # featurize) must have specialized exactly once
    assert frontend.train_pack._cache_size() == 1
    # SUPPLY rows (score == 1.0 sentinel) received real re-pooled features
    for entry in entries:
        n = int(np.asarray(entry.obj_mask).sum())
        scores = np.asarray(entry.scores)[:n]
        feats = np.asarray(entry.features)[:n]
        sup = scores == 1.0
        assert sup.any()  # random detector misses GT -> SUPPLY kicks in
        assert np.isfinite(feats[sup]).all()
        assert (np.abs(feats[sup]).sum(1) > 0).all()


def test_train_entry_has_union_features(sgdet_train_setup):
    _, entries = sgdet_train_setup
    for entry in entries:
        p = int(np.asarray(entry.pair_mask).sum())
        assert p >= 2
        uf = np.asarray(entry.union_feat)[:p]
        sm = np.asarray(entry.spatial_masks)[:p]
        assert uf.shape[1:] == (7, 7, 1024)
        assert np.abs(uf).sum() > 0
        # mask channels are (fractional box coverage - 0.5) in [-0.5, 0.5]
        assert sm.min() >= -0.5 - 1e-6 and sm.max() <= 0.5 + 1e-6
        assert (sm > 0.25).any()  # some interior pixels covered
        # padded pairs stay zero
        assert np.abs(np.asarray(entry.union_feat)[p:]).sum() == 0


def test_sgdet_training_loss_decreases(sgdet_train_setup):
    _, entries = sgdet_train_setup
    cfg = TempuraConfig.for_mode("sgdet", rel_head="gmm", enc_layers=1, dec_layers=1)
    assert cfg.tracking and cfg.k == 4
    model = Tempura(cfg)
    tx = make_optimizer(base_lr=1e-4, steps_per_epoch=1000)
    state = create_train_state(model, cfg, entries[0], jax.random.PRNGKey(0), tx)
    flags = LossFlags(mode="sgdet", obj_con_loss="euc_con", eos_coef=1.0)
    step = make_train_step(flags)
    rng = jax.random.PRNGKey(5)
    losses = []
    for i in range(9):
        rng, sub = jax.random.split(rng)
        state, m = step(state, entries[i % len(entries)], sub)
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(losses))
    assert "object_loss" in m
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
