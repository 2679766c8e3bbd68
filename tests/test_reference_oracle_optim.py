"""Torch-oracle parity for the training recipe: the reference's OWN
``tools/utils/AdamW.py`` + torch ``ExponentialLR(0.8)`` + grad clipping at
5.0, vs our optax chain (``vidsgg.train.optim.make_optimizer``), stepped in
lock-step on identical seeded gradients in float64.

Covers the recipe detail ``optax.adamw`` gets wrong: the reference adds eps
to the UNCORRECTED ``sqrt(v)`` and folds bias correction into the step size
(AdamW.py:106-113), so early steps differ from the torch-native/optax
epsilon placement. ``scale_by_reference_adam`` reproduces it exactly.

The warmup damping (pytorch_warmup, not installed here) is neutralized by
``warmup_period=1`` — our schedule's ``min(1, exp((e+1)/period - 1))`` is
identically 1 there — so this oracle gates AdamW + per-epoch ExponentialLR
+ clipping; the warmup formula itself stays documented against
TEMPURA_train.py:114,355.
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

from vidsgg.train.optim import make_optimizer  # noqa: E402

LR, GAMMA, WD, CLIP = 1e-3, 0.8, 0.1, 5.0
SHAPES = ((7, 5), (11,), (3, 2, 4))
STEPS_PER_EPOCH = 3
EPOCHS = 4


@pytest.fixture(scope="module", autouse=True)
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)
    jax.clear_caches()


def test_adamw_exponential_lr_matches_reference():
    from tools.utils.AdamW import AdamW as RefAdamW

    rng = np.random.default_rng(5)
    init = [rng.standard_normal(s) for s in SHAPES]
    # one huge-gradient step so clip_by_global_norm actually engages
    grads = [[rng.standard_normal(s) * (40.0 if t == 2 else 1.0)
              for s in SHAPES]
             for t in range(STEPS_PER_EPOCH * EPOCHS)]

    # ---- torch side: the reference's own training-loop recipe ----
    tparams = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in init]
    opt = RefAdamW(tparams, lr=LR, betas=(0.9, 0.999), eps=1e-8,
                   weight_decay=WD)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=GAMMA)
    torch_traj = []
    for t, g in enumerate(grads):
        for p, gi in zip(tparams, g):
            p.grad = torch.from_numpy(gi.copy())
        torch.nn.utils.clip_grad_norm_(tparams, CLIP)  # TEMPURA_train.py:224
        opt.step()
        opt.zero_grad()
        if (t + 1) % STEPS_PER_EPOCH == 0:
            sched.step()  # per-epoch decay (TEMPURA_train.py:353-358)
        torch_traj.append([p.detach().numpy().copy() for p in tparams])

    # ---- our side ----
    tx = make_optimizer(base_lr=LR, gamma=GAMMA, warmup_period=1,
                        steps_per_epoch=STEPS_PER_EPOCH, weight_decay=WD,
                        clip_norm=CLIP)
    params = [jnp.asarray(p) for p in init]
    state = tx.init(params)
    step = jax.jit(
        lambda g, s, p: tx.update(g, s, p)
    )
    for t, g in enumerate(grads):
        updates, state = step([jnp.asarray(x) for x in g], state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        for ours, theirs in zip(params, torch_traj[t]):
            np.testing.assert_allclose(
                np.asarray(ours), theirs, atol=1e-13, rtol=1e-12,
                err_msg=f"step {t}")


def test_optax_adamw_would_fail_this_oracle():
    """Regression guard on the guard: plain optax.adamw (eps after bias
    correction) measurably diverges from the reference on early steps, so
    this oracle genuinely distinguishes the two epsilon placements."""
    import optax

    from tools.utils.AdamW import AdamW as RefAdamW
    from vidsgg.train.optim import reference_lr_schedule

    rng = np.random.default_rng(6)
    init = [rng.standard_normal((5, 5)) * 1e-4]  # small params -> v ~ eps
    grads = [[rng.standard_normal((5, 5)) * 1e-4] for _ in range(3)]

    tparams = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in init]
    opt = RefAdamW(tparams, lr=LR, betas=(0.9, 0.999), eps=1e-8,
                   weight_decay=WD)
    for g in grads:
        tparams[0].grad = torch.from_numpy(g[0].copy())
        opt.step()
        opt.zero_grad()

    tx = optax.chain(
        optax.clip_by_global_norm(CLIP),
        optax.adamw(
            learning_rate=reference_lr_schedule(LR, GAMMA, 1, 100),
            b1=0.9, b2=0.999, eps=1e-8, weight_decay=WD),
    )
    params = [jnp.asarray(p) for p in init]
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update([jnp.asarray(g[0])], state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    diff = np.abs(np.asarray(params[0]) - tparams[0].detach().numpy()).max()
    assert diff > 1e-9, "expected optax.adamw epsilon placement to diverge"


# ---------------------------------------------------------------------------
# loss assembly (TEMPURA_train.py:97-212) vs vidsgg.train.steps.assemble_losses
# ---------------------------------------------------------------------------

def test_loss_assembly_matches_reference_script():
    """The train scripts' inline loss math run verbatim in torch —
    eos_coef-weighted CrossEntropyLoss(reduction='none').mean() over the
    object axis (NO weight renormalization, the quirk masked_ce documents),
    CE applied to the already-softmaxed attention probabilities, BCELoss on
    the sigmoid outputs — vs assemble_losses on the same padded Entry.
    (The pml ContrastiveLoss terms need the external pytorch_metric_learning
    package and are gated separately against infoNCE.py's own classes.)"""
    from vidsgg import constants as C
    from vidsgg.data import (
        EntryCapacity,
        build_gt_entry,
        synthetic_video_annotation,
    )
    from vidsgg.train.steps import LossFlags, assemble_losses

    cap = EntryCapacity(max_frames=6, max_objs=16, max_pairs=12)
    ann = synthetic_video_annotation(num_frames=4, objs_per_frame=2, seed=11)
    entry = build_gt_entry(ann, cap)
    n = int(np.asarray(entry.obj_mask).sum())
    p = int(np.asarray(entry.pair_mask).sum())
    rng = np.random.default_rng(12)

    att = rng.dirichlet(np.ones(3), cap.max_pairs)          # softmaxed probs
    spa = rng.uniform(0.01, 0.99, (cap.max_pairs, 6))        # sigmoid probs
    con = rng.uniform(0.01, 0.99, (cap.max_pairs, 17))
    obj_logits = rng.standard_normal((cap.max_objs, 37))
    out = {
        "attention_distribution": jnp.asarray(att),
        "spatial_distribution": jnp.asarray(spa),
        "contacting_distribution": jnp.asarray(con),
        "distribution": jnp.asarray(obj_logits),
    }

    # ---- torch, exactly as the script builds it ----
    eos = 0.3
    weights = torch.ones(37, dtype=torch.float64)
    weights[0] = eos
    ce_obj = torch.nn.CrossEntropyLoss(weight=weights, reduction="none")
    ce_rel = torch.nn.CrossEntropyLoss(reduction="none")
    bce = torch.nn.BCELoss(reduction="none")

    att_label = torch.from_numpy(
        np.asarray(entry.attention_gt)[:p].astype(np.int64))
    spa_label = torch.from_numpy(np.asarray(entry.spatial_gt, np.float64)[:p])
    con_label = torch.from_numpy(np.asarray(entry.contacting_gt, np.float64)[:p])
    labels = torch.from_numpy(np.asarray(entry.labels)[:n].astype(np.int64))

    ref = {
        "object_loss": ce_obj(
            torch.from_numpy(obj_logits[:n]), labels).mean().item(),
        "attention_relation_loss": ce_rel(
            torch.from_numpy(att[:p]), att_label).mean().item(),
        "spatial_relation_loss": bce(
            torch.from_numpy(spa[:p]), spa_label).mean().item(),
        "contacting_relation_loss": bce(
            torch.from_numpy(con[:p]), con_label).mean().item(),
    }

    flags = LossFlags(mode="sgdet", num_classes=37, eos_coef=eos)
    ours = assemble_losses(out, entry, flags)
    for k, v in ref.items():
        np.testing.assert_allclose(float(ours[k]), v, rtol=1e-10,
                                   err_msg=k)
