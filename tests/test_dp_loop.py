"""CLI-reachable data-parallel training (round-3 headline item).

The multi-chip step machinery (runtime/parallel.py) is wired into the
training loop behind TrainLoopConfig.data_parallel / --data_parallel:
same-bucket videos group into N-video batches through
make_parallel_train_step, memory/uncertainty accumulation folds the batched
unc pass in, epoch remainders flush through the single-device step, and
predcls validation shards whole-video batches over the same mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.loop import TrainLoopConfig, run_training
from vidsgg.train.steps import LossFlags, make_train_step


def _tiny_videos(n, seed0=0):
    import __graft_entry__ as g

    videos = []
    for s in range(n):
        cfg, model, entry, cap = g._example_setup(seed=seed0 + s, tiny=True)
        videos.append(entry)
    return cfg, model, cap, videos


def _state(model, cfg, entry, tx=None):
    return create_train_state(
        model, cfg, entry, jax.random.PRNGKey(0),
        tx if tx is not None else make_optimizer(base_lr=1e-3, steps_per_epoch=10),
    )


def test_parallel_step_equals_single_step_on_replicated_video():
    """A dp=2 group holding the same video twice with the same rng must
    produce the single-device update: mean of two identical per-video
    gradients == the one gradient. Compared under SGD so the parameter
    delta is linear in the gradient (AdamW's eps-normalization would
    amplify vmap's ~1e-8 reduction-order noise into lr-scale sign flips on
    zero-gradient dims)."""
    import optax

    from vidsgg.runtime.mesh import make_mesh
    from vidsgg.runtime.parallel import make_parallel_train_step, stack_entries

    cfg, model, cap, (entry,) = _tiny_videos(1)
    flags = LossFlags(mode="predcls")
    r = jax.random.PRNGKey(3)
    tx = optax.sgd(1e-2)

    s_single = make_train_step(flags)(
        _state(model, cfg, entry, tx), entry, r
    )[0]

    mesh = make_mesh(2)
    with mesh:
        step = make_parallel_train_step(flags, mesh)
        s_par, metrics = step(
            _state(model, cfg, entry, tx), stack_entries([entry, entry]),
            jnp.stack([r, r]),
        )
    flat_a = jax.tree.leaves(jax.device_get(s_single.params))
    flat_b = jax.tree.leaves(jax.device_get(s_par.params))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    assert np.isfinite(float(metrics["total_loss"]))


def test_run_training_data_parallel_end_to_end(tmp_path):
    """Full loop on the virtual CPU mesh: 5 videos at dp=2 -> 2 grouped
    steps + 1 remainder step, memory banks filled from the batched unc pass,
    sharded predcls validation, checkpointing."""
    from vidsgg.train.metrics import MetricsWriter

    cfg, model, cap, videos = _tiny_videos(5)
    state = _state(model, cfg, videos[0])
    loop_cfg = TrainLoopConfig(
        mode="predcls", nepoch=1, log_iter=2, save_path=str(tmp_path),
        mem_enabled=True, data_parallel=2,
        compute_temporal_consistency=False,
    )
    writer = MetricsWriter(str(tmp_path))
    state = run_training(
        state, LossFlags(mode="predcls"), loop_cfg,
        lambda: iter([(v, None, _ann(i)) for i, v in enumerate(videos)]),
        lambda: iter([(v, None, _ann(i)) for i, v in enumerate(videos[:4])]),
        cap, writer, jax.random.PRNGKey(9), model_cfg=cfg,
    )
    writer.close()
    assert int(state.step) == 3  # 2 parallel groups + 1 remainder
    # memory banks were accumulated through the scan fold and finalized
    assert float(jnp.abs(state.rel_memory).sum()) > 0


_ANN_CACHE = {}


def _ann(i):
    from vidsgg.data import synthetic_video_annotation

    if i not in _ANN_CACHE:
        _ANN_CACHE[i] = synthetic_video_annotation(
            num_frames=3, objs_per_frame=2, seed=i
        )
    return _ANN_CACHE[i]


def test_batched_memory_fold_matches_sequential():
    """The scan-based batched accumulate equals per-video accumulation."""
    from vidsgg.debias import MemoryAccumulator
    from vidsgg.runtime.parallel import stack_entries
    from vidsgg.train.loop import (
        accumulate_memory_batch_jit, accumulate_memory_jit,
    )
    from vidsgg.train.steps import eval_step_jit

    cfg, model, cap, videos = _tiny_videos(3)
    state = _state(model, cfg, videos[0])
    outs = [eval_step_jit(state, v, True) for v in videos]

    acc_seq = MemoryAccumulator.zeros(obj_dim=1024)
    for v, o in zip(videos, outs):
        acc_seq = accumulate_memory_jit(acc_seq, v, o, "simple", "simple", False)

    batch = stack_entries(videos)
    out_b = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    acc_b = accumulate_memory_batch_jit(
        MemoryAccumulator.zeros(obj_dim=1024), batch, out_b,
        "simple", "simple", False,
    )
    for a, b in zip(jax.tree.leaves(acc_seq), jax.tree.leaves(acc_b)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_config_surfaces_accept_data_parallel():
    from vidsgg.configs.tempura import TempuraRunConfig
    from vidsgg.configs.teatgt import TeatGTRunConfig

    assert TempuraRunConfig.from_args(
        ["--data_parallel", "4"]
    ).data_parallel == 4
    assert TeatGTRunConfig.from_args(
        ["--data_parallel", "2"]
    ).data_parallel == 2
    # 0 resolves to every local device
    assert TempuraRunConfig.from_args(
        ["--data_parallel", "0"]
    ).data_parallel == jax.device_count()


def _sgcls_videos(n, seed0=0):
    import __graft_entry__ as g
    from vidsgg.data.synthetic import synthetic_base_fmaps

    videos = []
    for s in range(n):
        cfg, model, entry, cap = g._example_setup(
            seed=seed0 + s, tiny=True, variant="tempura-sgcls"
        )
        fmaps = jnp.array(
            synthetic_base_fmaps(cap.max_frames, hw=(6, 10), seed=seed0 + s)
        )
        videos.append((entry, fmaps))
    return cfg, model, cap, videos


def test_parallel_sgcls_eval_matches_per_video():
    """The vmapped sgcls fused eval stage (classify -> device postprocess ->
    union refeaturize -> relation) equals the per-video jit on a 2-mesh."""
    from vidsgg.runtime.mesh import make_mesh
    from vidsgg.runtime.parallel import (
        make_parallel_sgcls_eval_step, stack_entries,
    )
    from vidsgg.train.eval_pipeline import sgcls_fused_stage

    cfg, model, cap, videos = _sgcls_videos(2)
    state = _state(model, cfg, videos[0][0])

    singles = [sgcls_fused_stage(state, e, f, True) for e, f in videos]

    mesh = make_mesh(2)
    with mesh:
        step = make_parallel_sgcls_eval_step(mesh)
        e2_b, out_b = step(
            state, stack_entries([e for e, _ in videos]),
            jnp.stack([f for _, f in videos]),
        )
    for i, (e2, out) in enumerate(singles):
        for key in ("attention_distribution", "spatial_distribution",
                    "contacting_distribution"):
            np.testing.assert_allclose(
                np.asarray(out[key]), np.asarray(out_b[key])[i],
                rtol=1e-4, atol=1e-5,
            )
        np.testing.assert_array_equal(
            np.asarray(e2.pred_labels), np.asarray(e2_b.pred_labels)[i]
        )


def test_run_training_sgcls_data_parallel(tmp_path):
    """Full sgcls loop at dp=2: grouped train steps (tracking + BN under
    vmap), batched unc/memory fold, and sharded sgcls validation through
    the vmapped fused stage."""
    from vidsgg.train.metrics import MetricsWriter

    cfg, model, cap, videos = _sgcls_videos(4)
    state = _state(model, cfg, videos[0][0])
    loop_cfg = TrainLoopConfig(
        mode="sgcls", nepoch=1, log_iter=2, save_path=str(tmp_path),
        mem_enabled=True, data_parallel=2,
        compute_temporal_consistency=False,
    )
    writer = MetricsWriter(str(tmp_path))
    flags = LossFlags(mode="sgcls", obj_con_loss="euc_con")
    stream = [(e, f, _ann(i)) for i, (e, f) in enumerate(videos)]
    state = run_training(
        state, flags, loop_cfg,
        lambda: iter(stream), lambda: iter(stream),
        cap, writer, jax.random.PRNGKey(9), model_cfg=cfg,
    )
    writer.close()
    assert int(state.step) == 2  # two full dp=2 groups, no remainder
    assert float(jnp.abs(state.rel_memory).sum()) > 0


def test_vidvrd_cli_data_parallel():
    """The VidVRD CLI trains data-parallel end-to-end (synthetic data,
    4 videos at dp=2) and still reports sane eval numbers."""
    from vidsgg.cli.vidvrd_train import main

    summary = main([
        "--synthetic", "4", "--nepoch", "1", "--data_parallel", "2",
        "--seed", "5",
    ])
    assert all(np.isfinite(v) for v in summary.values())


def _sgdet_videos(n, seed0=3):
    """sgdet-style entries: GT-featurized boxes wearing detector-style
    class distributions + pred_labels (what the sgdet frontend emits)."""
    from vidsgg.data import EntryCapacity, build_gt_entry
    from vidsgg.data.synthetic import synthetic_base_fmaps
    from vidsgg.detector import featurize_gt_entry
    from vidsgg.models import Tempura, TempuraConfig

    cap = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)
    w = jax.random.normal(jax.random.PRNGKey(7), (1024, 2048)) * 0.02
    feat = jax.jit(
        lambda e, f: featurize_gt_entry(e, f, lambda p: p.mean(axis=(1, 2)) @ w)
    )
    videos, anns = [], []
    for s in range(n):
        ann = _ann(seed0 + s)
        entry = build_gt_entry(ann, cap)
        fmaps = jnp.array(
            synthetic_base_fmaps(cap.max_frames, hw=(6, 10), seed=seed0 + s)
        )
        entry = feat(entry, fmaps)
        rng = np.random.RandomState(seed0 + s)
        dist = rng.rand(cap.max_objs, 36).astype(np.float32)
        dist = dist / dist.sum(1, keepdims=True)
        dist *= np.asarray(entry.obj_mask)[:, None]
        det_labels = rng.randint(1, 37, cap.max_objs)
        det_labels = (det_labels * np.asarray(entry.obj_mask)).astype(np.int32)
        entry = entry.replace(
            distribution=jnp.asarray(dist), pred_labels=jnp.asarray(det_labels)
        )
        videos.append((entry, fmaps))
        anns.append(ann)
    cfg = TempuraConfig.for_mode("sgdet", rel_head="gmm", enc_layers=1,
                                 dec_layers=1)
    return cfg, Tempura(cfg), cap, videos, anns


def test_parallel_sgdet_eval_matches_per_video():
    """The vmapped sgdet fused eval stage (classify -> device clean_class/
    NMS/relabel/pair rebuild -> union refeaturize -> relation) equals the
    per-video jit on a 2-mesh, overflow flags included."""
    from vidsgg.runtime.mesh import make_mesh
    from vidsgg.runtime.parallel import (
        make_parallel_sgdet_eval_step, stack_entries,
    )
    from vidsgg.train.eval_pipeline import sgdet_fused_stage

    cfg, model, cap, videos, _ = _sgdet_videos(2)
    state = _state(model, cfg, videos[0][0])

    singles = [sgdet_fused_stage(state, e, f, True, None) for e, f in videos]

    mesh = make_mesh(2)
    with mesh:
        step = make_parallel_sgdet_eval_step(mesh)
        e2_b, out_b, ovf_b = step(
            state, stack_entries([e for e, _ in videos]),
            jnp.stack([f for _, f in videos]),
        )
    for i, (e2, out, ovf) in enumerate(singles):
        assert bool(np.asarray(ovf_b)[i]) == bool(ovf)
        for key in ("attention_distribution", "spatial_distribution",
                    "contacting_distribution"):
            np.testing.assert_allclose(
                np.asarray(out[key]), np.asarray(out_b[key])[i],
                rtol=1e-4, atol=1e-5,
            )
        np.testing.assert_array_equal(
            np.asarray(e2.pred_labels), np.asarray(e2_b.pred_labels)[i]
        )


def test_run_training_sgdet_data_parallel(tmp_path):
    """Full sgdet loop at dp=2: grouped train steps plus sharded sgdet
    validation through the vmapped fused stage (overflow fallback path
    compiled in)."""
    from vidsgg.train.metrics import MetricsWriter

    cfg, model, cap, videos, anns = _sgdet_videos(4)
    state = _state(model, cfg, videos[0][0])
    loop_cfg = TrainLoopConfig(
        mode="sgdet", nepoch=1, log_iter=2, save_path=str(tmp_path),
        mem_enabled=True, data_parallel=2,
        compute_temporal_consistency=False,
    )
    writer = MetricsWriter(str(tmp_path))
    flags = LossFlags(mode="sgdet")
    stream = [(e, f, anns[i]) for i, (e, f) in enumerate(videos)]
    state = run_training(
        state, flags, loop_cfg,
        lambda: iter(stream), lambda: iter(stream),
        cap, writer, jax.random.PRNGKey(9), model_cfg=cfg,
    )
    writer.close()
    assert int(state.step) == 2  # two full dp=2 groups, no remainder
    assert float(jnp.abs(state.rel_memory).sum()) > 0
