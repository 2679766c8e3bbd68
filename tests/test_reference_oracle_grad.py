"""BACKWARD-PASS torch-oracle parity: reference gradients vs ``jax.grad``.

Every other reference oracle is forward-only (and the optimizer oracle steps
on synthetic seeded gradients).  This module closes the loop on *training*:
with converted seeded weights and shared reparameterization noise, both
stacks compute the train scripts' total loss (TEMPURA_train.py:190-218
assembly on a train-phase forward), torch runs ``loss.backward()``, we run
``jax.grad``, and the torch per-parameter gradients are mapped through the
REAL checkpoint converter (``convert_tempura_state_dict`` — every transform
it applies is a transpose/reshape/concat, all gradient-equivariant) onto our
parameter tree for a float64 comparison.

Covered: predcls (pair features incl. train-mode masked BN, STTran, three
GMM relation heads) and sgcls (plus the tracking OSPU chain, train-mode
BatchNorm, and the eos_coef-weighted object CE).  A final lock-step test
composes N full train steps — grads -> clip 5.0 -> the reference's AdamW ->
per-epoch ExponentialLR (TEMPURA_train.py:219-226,353-358) — and asserts the
parameter trajectories track, so a wiring bug in loss weighting, a stray
stop-gradient, or a BN train-mode mismatch can no longer pass the forward
gates and still train to a different model.

Dropout is a no-op in both stacks (torch modules get ``p=0``, flax Dropout is
identity-patched): the compared quantity is the deterministic gradient, not
a shared dropout mask.  GMM reparameterization noise IS shared, dispatched
by class count (attention 3 / spatial 6 / contacting 17 / objects 37), the
same scheme the forward oracles use.
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


for _name in ("tools.fasterRCNN", "tools.fasterRCNN.lib",
              "tools.fasterRCNN.lib.model"):
    _stub(_name)
_stub("tools.fasterRCNN.lib.model.roi_layers",
      ROIAlign=_ROIAlignStub, nms=_unused)
_stub("tools.utils.fpn")
_stub("tools.utils.fpn.box_utils", center_size=_unused)
_stub("tools.utils.draw_rectangles")
_stub("tools.utils.draw_rectangles.draw_rectangles", draw_union_boxes=_unused)

import flax.linen as fnn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vidsgg import constants as C  # noqa: E402
from vidsgg.data import EntryCapacity, build_gt_entry  # noqa: E402
from vidsgg.data.synthetic import synthetic_video_annotation  # noqa: E402
from vidsgg.models.convert_relation import (  # noqa: E402
    convert_tempura_state_dict,
)
from vidsgg.models.tempura import Tempura, TempuraConfig  # noqa: E402
from vidsgg.train.state import obj_memory_dim  # noqa: E402
from vidsgg.train.steps import LossFlags, assemble_losses  # noqa: E402

EOS_COEF = 0.3


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
    """tools/utils/fpn/box_utils lineage formula (absent from the checkout);
    supplied identically to both stacks — see test_reference_oracle_full."""
    wh = boxes[:, 2:] - boxes[:, :2] + 1.0
    return torch.cat((boxes[:, :2] + 0.5 * (wh - 1.0), wh), 1)


def _build_reference(cfg, *, mode, tracking):
    """Reference TEMPURA in TRAIN mode, float64, dropout p=0 everywhere
    (lib/tempura.py:425-510); perturbed off init like the forward oracles."""
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
    ).double().train()
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.add_(0.1 * torch.randn_like(p))
            if "rel_compress" in name or "decoder_lin" in name:
                # keep GMM logits ~O(1): at xavier+0.1-randn scale over the
                # 1936-d transformer output, sigmoid saturates to exactly
                # 1.0 in f64 and the pi-weighted sum then crosses 1.0 by an
                # ulp depending on reduction order — torch BCELoss hard-
                # rejects input>1 and saturated heads carry no gradient
                # signal anyway
                p.mul_(0.1)
    for m in model.modules():  # deterministic gradients: dropout off
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        elif isinstance(m, torch.nn.MultiheadAttention):
            # MHA applies dropout FUNCTIONALLY from its float attr, not via
            # an nn.Dropout child — zero it too or train mode stays random
            m.dropout = 0.0
    if mode == "predcls":
        # TEMPURA_train.py:106-110 freezes the (never-run) object classifier
        for name, value in model.named_parameters():
            if "object_classifier" in name:
                value.requires_grad = False
    return model


def _make_entry(cap, seed=3, sgcls=False):
    rng = np.random.default_rng(seed)
    ann = synthetic_video_annotation(num_frames=4, objs_per_frame=2,
                                     seed=seed)
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
        # detector-style class scores biased toward GT, several shared
        # argmax classes so the tracking encoder sees real sequences
        logits = rng.standard_normal((cap.max_objs, 36))
        lbl = np.asarray(entry.labels)
        logits[np.arange(cap.max_objs), np.clip(lbl - 1, 0, 35)] += 3.0
        dist = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        dist[n:] = 0.0
        entry = entry.replace(distribution=jnp.asarray(dist))
    return entry, n, p


def _torch_entry(entry, n, p, sgcls=False):
    t = lambda a: torch.from_numpy(np.asarray(a, np.float64))
    ti = lambda a: torch.from_numpy(np.asarray(a, np.int64))
    d = {
        "boxes": t(entry.boxes[:n]),
        "labels": ti(entry.labels[:n]),
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


class _SharedNoise:
    """Deterministic eps tensors dispatched by class count, shared between
    torch.randn (per-component [rows, C] calls) and jax.random.normal (one
    fused [pad, k, C] draw per head). ``advance()`` re-seeds for the next
    lock-step training step."""

    def __init__(self, pads, k, seed=77):
        self.pads, self.k = dict(pads), k
        self.base = seed
        self.advance(0)

    def advance(self, step):
        rng = np.random.default_rng(self.base + 1000 * step)
        self.eps = {c: rng.standard_normal((pad, self.k, c))
                    for c, pad in self.pads.items()}
        self.calls = {c: 0 for c in self.pads}

    def torch_randn(self, *shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, torch.Size)):
            shape = tuple(shape[0])
        rows, c = shape
        i = self.calls[c]
        self.calls[c] += 1
        return torch.from_numpy(self.eps[c][:rows, i % self.k, :])

    def jax_normal(self, key, shape, dtype=None):
        pad, k, c = shape
        assert k == self.k and pad == self.pads[c], shape
        return jnp.asarray(self.eps[c], dtype)


def _torch_loss(pred, mode):
    """TEMPURA_train.py:190-218 verbatim (contrastive terms need the
    external pytorch_metric_learning package — gated separately against
    infoNCE.py by test_contrastive_oracle; obj_con_loss=None here)."""
    weights = torch.ones(37)
    weights[0] = EOS_COEF
    ce_obj = torch.nn.CrossEntropyLoss(weight=weights, reduction="none")
    ce_rel = torch.nn.CrossEntropyLoss(reduction="none")
    bce = torch.nn.BCELoss(reduction="none")

    att = pred["attention_distribution"]
    attention_label = torch.tensor(
        pred["attention_gt"], dtype=torch.long).squeeze()
    spatial_label = torch.zeros(len(pred["spatial_gt"]), 6)
    contact_label = torch.zeros(len(pred["contacting_gt"]), 17)
    for i in range(len(pred["spatial_gt"])):
        spatial_label[i, pred["spatial_gt"][i]] = 1
        contact_label[i, pred["contacting_gt"][i]] = 1

    losses = {}
    if mode in ("sgcls", "sgdet"):
        losses["object_loss"] = ce_obj(
            pred["distribution"], pred["labels"]).mean()
    losses["attention_relation_loss"] = ce_rel(att, attention_label).mean()
    losses["spatial_relation_loss"] = bce(
        pred["spatial_distribution"], spatial_label).mean()
    losses["contacting_relation_loss"] = bce(
        pred["contacting_distribution"], contact_label).mean()
    return sum(losses.values())


def _grad_state_dict(model):
    return {name: p.grad.detach().numpy()
            for name, p in model.named_parameters()
            if p.grad is not None}


def _our_loss_fn(model, entry, flags, batch_stats, rel_memory=None,
                 mem_active=False):
    if rel_memory is None:
        rel_memory = jnp.zeros((C.NUM_PREDICATES, 1936))

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            entry, phase="train", unc=False,
            rel_memory=rel_memory,
            obj_memory=jnp.zeros((36, obj_memory_dim(model.cfg))),
            mem_active=jnp.asarray(mem_active),
            deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0),
                  "gmm": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
        losses = assemble_losses(out, entry, flags)
        return sum(losses.values()), mut["batch_stats"]
    return loss_fn


def _compare_grad_trees(our_grads, torch_grads_tree, atol=1e-8):
    """Every leaf of OUR gradient tree must equal the converter-mapped torch
    gradient; leaves the torch model never touched (no .grad) must be 0."""
    flat_ours = jax.tree_util.tree_flatten_with_path(our_grads)[0]
    flat_ref = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(
            torch_grads_tree)[0]
    }
    assert flat_ours, "empty gradient tree"
    compared = 0
    for kp, ours in flat_ours:
        name = jax.tree_util.keystr(kp)
        ours = np.asarray(ours)
        if name in flat_ref:
            np.testing.assert_allclose(
                ours, np.asarray(flat_ref[name]), atol=atol, rtol=1e-8,
                err_msg=name)
            compared += 1
        else:
            np.testing.assert_allclose(
                ours, 0.0, atol=atol,
                err_msg=f"{name}: grad on a param the reference never used")
    assert compared >= len(flat_ours) * 0.8, (
        f"only {compared}/{len(flat_ours)} leaves had torch counterparts")
    return compared


def _identity_dropout(monkeypatch):
    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        lambda self, x, deterministic=None, rng=None: x)


@pytest.mark.parametrize("mode", ["predcls", "predcls-mem", "sgcls"])
def test_tempura_gradients_match_reference(mode, monkeypatch):
    mem = mode == "predcls-mem"  # ACTIVE banks: grads through the
    mode = "predcls" if mem else mode  # hallucinator/selection path too
    sgcls = mode == "sgcls"
    cap = EntryCapacity(max_frames=6, max_objs=16, max_pairs=10)
    cfg = TempuraConfig(mode=mode, enc_layers=1, dec_layers=2,
                        obj_head="gmm", rel_head="gmm", k=2,
                        rel_mem_compute="joint", mem_fusion="late",
                        selection="manual", selection_lambda=0.5,
                        tracking=sgcls)
    ref = _build_reference(cfg, mode=mode, tracking=sgcls)
    entry, n, p = _make_entry(cap, sgcls=sgcls)
    tentry = _torch_entry(entry, n, p, sgcls=sgcls)
    our_mem, mem_active = None, False
    if mem:
        mem_rng = np.random.default_rng(55)
        banks = {k_: mem_rng.standard_normal((m, 1936))
                 for k_, m in (("attention", 3), ("spatial", 6),
                               ("contacting", 17))}
        ref.rel_memory = {k_: torch.from_numpy(v)
                          for k_, v in banks.items()}
        our_mem = jnp.asarray(np.concatenate(list(banks.values())))
        mem_active = True
    if sgcls:
        from tools.utils.ds_track import get_sequence
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self, raising=True)
        get_sequence(tentry, None, None, "sgcls")

    noise = _SharedNoise(
        {3: cap.max_pairs, 6: cap.max_pairs, 17: cap.max_pairs,
         37: cap.max_objs}, k=cfg.k)
    monkeypatch.setattr(torch, "randn", noise.torch_randn)
    monkeypatch.setattr(jax.random, "normal", noise.jax_normal)
    _identity_dropout(monkeypatch)

    pred = ref(dict(tentry), phase="train", unc=False)
    loss_ref = _torch_loss(pred, mode)
    loss_ref.backward()

    variables = convert_tempura_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg)
    flags = LossFlags(mode=mode, num_classes=37, eos_coef=EOS_COEF)
    noise.advance(0)  # reset per-head call counters for our forward
    loss_fn = _our_loss_fn(Tempura(cfg), entry, flags,
                           variables["batch_stats"],
                           rel_memory=our_mem, mem_active=mem_active)
    (loss_ours, _), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])

    np.testing.assert_allclose(float(loss_ours), float(loss_ref),
                               rtol=1e-10, err_msg="total train loss")

    grad_tree = convert_tempura_state_dict(_grad_state_dict(ref), cfg,
                                           strict=True)
    compared = _compare_grad_trees(grads, grad_tree["params"])
    assert compared > 40  # the whole model, not a token subset


def test_lockstep_train_steps_match_reference(monkeypatch):
    """Compose it: N train steps of grads -> clip 5.0 -> the reference's OWN
    AdamW -> per-epoch ExponentialLR(0.8) (TEMPURA_train.py:219-226,353-358)
    in both stacks, asserting the parameter trajectories track in float64.
    predcls; 2 epochs x 2 steps."""
    from tools.utils.AdamW import AdamW as RefAdamW

    from vidsgg.train.optim import make_optimizer

    # lr: near the reference recipe (1e-5). At 1e-3 the fixture trains
    # itself into saturated heads within 2 steps, where log-clamp
    # boundaries and the grad-norm clip make the trajectory chaotically
    # sensitive to 1-ulp reduction noise; at 1e-4 all four steps stay in
    # the healthy regime and the trajectories track tightly.
    lr, gamma, wd, clip = 1e-4, 0.8, 0.1, 5.0
    steps_per_epoch, epochs = 2, 2

    cap = EntryCapacity(max_frames=6, max_objs=16, max_pairs=10)
    cfg = TempuraConfig(mode="predcls", enc_layers=1, dec_layers=1,
                        obj_head="gmm", rel_head="gmm", k=2,
                        rel_mem_compute="joint", mem_fusion="late",
                        selection="manual", selection_lambda=0.5)
    ref = _build_reference(cfg, mode="predcls", tracking=False)
    entry, n, p = _make_entry(cap)
    tentry = _torch_entry(entry, n, p)

    # memory OFF, the reference's epoch-0 reality: torch leaves the
    # hallucinator params untouched (grad None -> AdamW's skip), and our
    # optimizer now reproduces that skip from the all-zero-grad mask
    # (optim.py scale_by_reference_adam) — so the trajectory check covers
    # the freeze semantics too. Memory-ACTIVE gradients are gated by the
    # predcls-mem case of the single-step test above.
    noise = _SharedNoise(
        {3: cap.max_pairs, 6: cap.max_pairs, 17: cap.max_pairs,
         37: cap.max_objs}, k=cfg.k)
    monkeypatch.setattr(torch, "randn", noise.torch_randn)
    monkeypatch.setattr(jax.random, "normal", noise.jax_normal)
    _identity_dropout(monkeypatch)

    # ---- torch: the script's optimizer recipe on trainable params ----
    learned = [prm for prm in ref.parameters() if prm.requires_grad]
    opt = RefAdamW(learned, lr=lr, betas=(0.9, 0.999), eps=1e-8,
                   weight_decay=wd)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=gamma)

    # .numpy() SHARES storage with the torch tensors and jnp.asarray is
    # zero-copy on CPU — without .copy() the torch opt.step() would mutate
    # OUR param tree in place between the lock-step halves
    variables = convert_tempura_state_dict(
        {k: v.numpy().copy() for k, v in ref.state_dict().items()}, cfg)
    params, batch_stats = variables["params"], variables["batch_stats"]
    flags = LossFlags(mode="predcls", num_classes=37, eos_coef=EOS_COEF)
    tx = make_optimizer(base_lr=lr, gamma=gamma, warmup_period=1,
                        steps_per_epoch=steps_per_epoch, weight_decay=wd,
                        clip_norm=clip)
    opt_state = tx.init(params)

    step = 0
    for _epoch in range(epochs):
        for _ in range(steps_per_epoch):
            noise.advance(step)
            opt.zero_grad()
            loss = _torch_loss(ref(dict(tentry), phase="train", unc=False),
                               "predcls")
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=5,
                                           norm_type=2)
            opt.step()

            noise.advance(step)
            loss_fn = _our_loss_fn(Tempura(cfg), entry, flags, batch_stats)
            (loss_ours, batch_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            # step 0 compares converted-initial weights (tight); later steps
            # accumulate unavoidable reduction-order noise (torch vs XLA sum
            # different orders, ~1e-16 per grad) amplified by clip/AdamW and
            # the network's conditioning — a real recipe bug (eps placement,
            # decay, schedule) shows at 1e-3+
            np.testing.assert_allclose(float(loss_ours), float(loss),
                                       rtol=1e-9 if step == 0 else 1e-5,
                                       err_msg=f"loss at step {step}")
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda a, u: a + u, params, updates)
            step += 1
        sched.step()

        # trajectory check once per epoch: converter-map the torch params
        ref_now = convert_tempura_state_dict(
            {k: v.numpy().copy() for k, v in ref.state_dict().items()}, cfg)
        flat_ref = {
            jax.tree_util.keystr(kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(
                ref_now["params"])[0]
        }
        for kp, ours in jax.tree_util.tree_flatten_with_path(params)[0]:
            if "['k_proj']['bias']" in jax.tree_util.keystr(kp):
                # softmax shift-invariance makes the key-projection bias
                # mathematically inert (q_i . b_k is constant over keys), so
                # OUR separate k_proj.bias has exactly-zero grad and the
                # optimizer's torch-faithful None-grad skip freezes it —
                # while torch's FUSED in_proj_bias tensor is touched (q/v
                # slices) and weight decay moves its dead k slice. The
                # models are functionally identical; the dead weight's
                # decay trajectory is torch tensor-granularity trivia.
                continue
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(flat_ref[jax.tree_util.keystr(kp)]),
                # reduction-order noise amplified by AdamW's 1/(sqrt(v)+eps)
                # on near-zero-v entries: observed a SINGLE element of 4M at
                # 1.2e-7 after 2 steps; a recipe bug moves whole tensors at
                # 1e-3+
                atol=1e-6, rtol=1e-4,
                err_msg=f"epoch {_epoch} param {jax.tree_util.keystr(kp)}")
