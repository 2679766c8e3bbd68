"""End-to-end TEMPURA PredCls on a synthetic video: init, train steps with
decreasing loss, eval through the exact-semantics evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsgg.data import EntryCapacity, build_gt_entry, synthetic_video_annotation
from vidsgg.data.synthetic import synthetic_base_fmaps
from vidsgg.detector import featurize_gt_entry
from vidsgg.eval import SceneGraphEvaluator
from vidsgg.eval.adapter import to_eval_pred
from vidsgg.models import Tempura, TempuraConfig
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.steps import LossFlags, eval_step, make_train_step

CAP = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)


def _featurized_entry(seed=0, num_frames=4, objs=2):
    ann = synthetic_video_annotation(num_frames=num_frames, objs_per_frame=objs, seed=seed)
    entry = build_gt_entry(ann, CAP)
    fmaps = jnp.array(synthetic_base_fmaps(CAP.max_frames, hw=(12, 20), seed=seed))
    rngh = jax.random.PRNGKey(7)
    w = jax.random.normal(rngh, (1024, 2048)) * 0.02
    head = lambda pooled: pooled.mean(axis=(1, 2)) @ w
    entry = jax.jit(lambda e, f: featurize_gt_entry(e, f, head))(entry, fmaps)
    return ann, entry


@pytest.fixture(scope="module")
def predcls_setup():
    cfg = TempuraConfig.for_mode("predcls", rel_head="gmm", k=4)
    model = Tempura(cfg)
    ann, entry = _featurized_entry()
    tx = make_optimizer(base_lr=2e-4, steps_per_epoch=1000)
    state = create_train_state(model, cfg, entry, jax.random.PRNGKey(0), tx)
    return cfg, model, ann, entry, state


def test_init_shapes(predcls_setup):
    _, _, _, entry, state = predcls_setup
    out = eval_step(state, entry)
    p = entry.pair_mask.shape[0]
    assert out["attention_distribution"].shape == (p, 3)
    assert out["spatial_distribution"].shape == (p, 6)
    assert out["contacting_distribution"].shape == (p, 17)
    # probabilities in range; padded rows zeroed
    a = np.asarray(out["attention_distribution"])
    assert (a >= 0).all() and (a <= 1.001).all()
    assert np.allclose(a[int(entry.pair_mask.sum()):], 0)


def test_training_reduces_loss(predcls_setup):
    _, _, _, entry, state = predcls_setup
    flags = LossFlags(mode="predcls")
    step = make_train_step(flags)
    rng = jax.random.PRNGKey(1)
    # the train step donates its input state; keep the shared fixture intact
    state = jax.tree.map(jnp.copy, state)
    first = None
    for i in range(25):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, entry, sub)
        if i == 0:
            first = float(metrics["total_loss"])
    last = float(metrics["total_loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"
    # keep the trained state for the eval test
    predcls_setup_state["state"] = state


predcls_setup_state = {}


def test_eval_through_evaluator(predcls_setup):
    _, _, ann, entry, state = predcls_setup
    state = predcls_setup_state.get("state", state)
    out = eval_step(state, entry)
    pred = to_eval_pred(entry, out, "predcls")
    ev = SceneGraphEvaluator("predcls", constraint="with")
    ev.evaluate_scene_graph(ann, pred)
    r20 = ev.recall_at(20)
    assert 0.0 <= r20 <= 1.0
    assert len(ev.result_dict["predcls_recall"][20]) == len(ann)


def test_unc_pass_returns_uncertainties(predcls_setup):
    _, _, _, entry, state = predcls_setup
    out = eval_step(state, entry, unc=True)
    assert out["attention_al_uc"].shape == (entry.pair_mask.shape[0], 3)
    assert out["contacting_ep_uc"].shape == (entry.pair_mask.shape[0], 17)
    assert np.isfinite(np.asarray(out["attention_al_uc"])).all()


def test_gmm_sampling_is_stochastic_in_train_phase(predcls_setup):
    _, _, _, entry, state = predcls_setup
    def fwd(rng):
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            entry, phase="train",
            rel_memory=state.rel_memory, obj_memory=state.obj_memory,
            mem_active=state.mem_active,
            rngs={"dropout": rng, "gmm": jax.random.fold_in(rng, 1)},
            mutable=["batch_stats"],
        )[0]
    o1 = fwd(jax.random.PRNGKey(0))
    o2 = fwd(jax.random.PRNGKey(5))
    assert not np.allclose(
        np.asarray(o1["attention_distribution"]),
        np.asarray(o2["attention_distribution"]),
    )
