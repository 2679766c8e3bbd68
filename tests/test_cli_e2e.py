"""CLI-level end-to-end rehearsal on an AG-format disk fixture.

The reference's train/test scripts ARE the product
(TEMPURA_train.py:134-379 + TEMPURA_test.py:70-112); this executes the full
composition as one program against on-disk assets: annotation pickles +
real frame images -> ActionGenome -> canvas pick -> detector base features
-> bucketed entries -> train loop -> orbax checkpoint -> test CLI restore
-> evaluator + per-class pickles. The --frame_size / --tiny_detector /
--bucket_frames rehearsal hooks shrink every shape so the whole path runs
on the CPU test host; the composition is identical to the real-data run.
"""

import os
import pickle

import numpy as np
import pytest

FRAME_H, FRAME_W = 48, 64


@pytest.fixture(scope="module")
def ag_root(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("ag_e2e")
    os.makedirs(root / "annotations")

    person, objects = {}, {}
    rng = np.random.RandomState(7)

    def add_frame(vid, f, split, objs=("chair",)):
        key = f"{vid}/{f:06d}.png"
        person[key] = {
            "bbox": np.array([[4.0, 4.0, 36.0, 44.0]], np.float32),
            "bbox_size": (FRAME_W, FRAME_H),
        }
        rows = []
        for k, cls in enumerate(objs):
            rows.append({
                "class": cls,
                # xywh within the 64x48 frame
                "bbox": [14.0 + 6 * k, 8.0 + 4 * k, 22.0, 24.0],
                "attention_relationship": ["looking_at"],
                "spatial_relationship": ["in_front_of"],
                "contacting_relationship": ["sitting_on", "touching"],
                "visible": True,
                "metadata": {"set": split},
            })
        objects[key] = rows
        frame_dir = root / "frames" / vid
        os.makedirs(frame_dir, exist_ok=True)
        img = rng.randint(0, 255, (FRAME_H, FRAME_W, 3), np.uint8)
        assert cv2.imwrite(str(root / "frames" / key), img)

    for f in range(4):  # train video, two objects on later frames
        add_frame("A.mp4", f, "train",
                  objs=("chair",) if f < 2 else ("chair", "food"))
    for f in range(3):  # second train video
        add_frame("B.mp4", f, "train")
    for f in range(3):  # test-split video
        add_frame("C.mp4", f, "test")
    for f in range(3):  # second test-split video (same canvas -> pairs)
        add_frame("D.mp4", f, "test", objs=("chair", "food"))

    with open(root / "annotations/person_bbox.pkl", "wb") as fh:
        pickle.dump(person, fh)
    with open(root / "annotations/object_bbox_and_relationship.pkl", "wb") as fh:
        pickle.dump(objects, fh)
    return str(root)


def _common_flags(ag_root):
    return [
        "--data_path", ag_root, "--frame_size", str(FRAME_H),
        "--tiny_detector", "--bucket_frames", "16",
        "-enc_layer", "1", "-dec_layer", "1", "-K", "2",
    ]


def test_tempura_predcls_train_then_test_cli(ag_root, tmp_path):
    from vidsgg.cli import tempura_test, tempura_train

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    trace_dir = str(tmp_path / "trace")
    tempura_train.main(
        ["--mode", "predcls", "--nepoch", "1", "-log_iter", "2",
         "--save_path", ckpt, "--profile", trace_dir] + _common_flags(ag_root)
    )
    # --profile wraps the run in one jax.profiler trace (utils/profiling.py)
    assert any(
        f.endswith(".xplane.pb")
        for _, _, fs in os.walk(trace_dir) for f in fs
    )
    # orbax checkpoint + metrics files written by the loop
    assert os.path.isdir(os.path.join(ckpt, "checkpoint_0"))
    assert os.path.getsize(os.path.join(ckpt, "log_train.txt")) > 0
    assert os.path.getsize(os.path.join(ckpt, "log_val.txt")) > 0
    assert os.path.getsize(os.path.join(ckpt, "metrics.jsonl")) > 0

    evs = tempura_test.main(
        ["--mode", "predcls", "--ckpt", ckpt, "--ckpt_name", "checkpoint_0",
         "--output_path", out] + _common_flags(ag_root)
    )
    for ev in evs:
        for k in ev.KS:
            assert np.isfinite(ev.recall_at(k))
    # per-class recall pickles (reference evaluation_recall.py:79-83)
    pkls = [f for f in os.listdir(out) if f.endswith(".pkl")]
    assert len(pkls) == 3 * len(evs[0].KS)
    with open(os.path.join(out, pkls[0]), "rb") as f:
        per_cls = pickle.load(f)
    assert all(np.isfinite(v) for v in per_cls.values())

    # the restored checkpoint carries the memory banks (the reference
    # silently re-defaults them at test time, SURVEY.md §5.4)
    import jax
    from vidsgg.train.checkpoint import restore_checkpoint

    class _Probe:
        pass

    # restore into a fresh template built the same way the test CLI does
    # and check the banks round-tripped (train ran with rel_mem_compute on)
    from vidsgg.configs.tempura import TempuraRunConfig
    from vidsgg.models.tempura import Tempura
    from vidsgg.train import create_train_state, make_optimizer
    from vidsgg.cli.data_source import build_detector, make_ag_source, default_buckets
    from vidsgg.data.action_genome import ActionGenome

    cfg = TempuraRunConfig.from_args(
        ["--mode", "predcls"] + _common_flags(ag_root)
    )
    ds = ActionGenome("test", cfg.datasize, cfg.data_path,
                      target_min_side=cfg.frame_size)
    det, det_vars, canvases = build_detector(None, tiny=True,
                                             frame_size=cfg.frame_size)
    buckets = default_buckets(max_frames=cfg.bucket_frames)
    src = make_ag_source(ds, buckets[-1], det, det_vars, shuffle=False,
                         buckets=buckets, canvases=canvases)
    entry0, _, _ = next(iter(src()))
    model_cfg = cfg.model_config()
    state = create_train_state(Tempura(model_cfg), model_cfg, entry0,
                               jax.random.PRNGKey(0),
                               make_optimizer(steps_per_epoch=1))
    # checkpoint_final is written after the last epoch's memory
    # finalization (the reference's epoch checkpoints predate the bank
    # computation, so banks never reach disk there)
    restored = restore_checkpoint(ckpt, state, "checkpoint_final")
    assert float(np.abs(np.asarray(restored.rel_memory)).sum()) > 0


def test_teatgt_predcls_train_then_test_cli(ag_root, tmp_path):
    """The TEAT-GT pair of scripts as one program from disk assets (tiny
    encoder; consistency regularizer on)."""
    from vidsgg.cli import teatgt_test, teatgt_train

    ckpt = str(tmp_path / "ckpt_tg")
    flags = [
        "--data_path", ag_root, "--frame_size", str(FRAME_H),
        "--tiny_detector", "--bucket_frames", "16",
        "--encoder_layers", "2", "--encoder_attention_heads", "4",
    ]
    teatgt_train.main(
        ["--mode", "predcls", "--nepoch", "1", "--log_iter", "2",
         "--use_cons_str_loss", "--save_path", ckpt] + flags
    )
    assert os.path.isdir(os.path.join(ckpt, "checkpoint_final"))
    # the checkpoint carries the consistency-regularizer params, so the
    # test CLI must build the same model config (the reference's
    # load_state_dict(strict=True) contract, TEMPURA_test.py:58-59)
    evs = teatgt_test.main(
        ["--mode", "predcls", "--ckpt", ckpt, "--use_cons_str_loss",
         "--ckpt_name", "checkpoint_final"] + flags
    )
    for ev in evs:
        assert np.isfinite(ev.recall_at(20))


def test_tempura_sgdet_train_cli(ag_root, tmp_path):
    """--mode sgdet routes training through the detector front-end (boxes +
    IoU assignment + SUPPLY) end-to-end from disk."""
    from vidsgg.cli import tempura_train

    ckpt = str(tmp_path / "ckpt_sgdet")
    tempura_train.main(
        ["--mode", "sgdet", "--nepoch", "1", "-log_iter", "2",
         "--save_path", ckpt] + _common_flags(ag_root)
    )
    assert os.path.isdir(os.path.join(ckpt, "checkpoint_0"))
    assert os.path.getsize(os.path.join(ckpt, "log_val.txt")) > 0

    # serving: --pair_detect 2 (paired detect dispatch + vmapped fused
    # relation stage) must reproduce the single-video test CLI's metrics
    from vidsgg.cli import tempura_test

    test_flags = ["--mode", "sgdet", "--ckpt", ckpt,
                  "--ckpt_name", "checkpoint_0",
                  "--output_path", str(tmp_path / "out_sgdet")
                  ] + _common_flags(ag_root)
    evs_single = tempura_test.main(test_flags)
    evs_paired = tempura_test.main(test_flags + ["--pair_detect", "2"])
    # multi-chip serving: the pair group sharded over a 2-device mesh
    # (virtual CPU devices) must reproduce the same metrics too
    evs_dp = tempura_test.main(
        test_flags + ["--pair_detect", "2", "--data_parallel", "2"]
    )
    for ev_s, ev_p, ev_d in zip(evs_single, evs_paired, evs_dp):
        for k in ev_s.KS:
            assert np.isfinite(ev_p.recall_at(k))
            np.testing.assert_allclose(
                ev_p.recall_at(k), ev_s.recall_at(k), atol=1e-6
            )
            np.testing.assert_allclose(
                ev_d.recall_at(k), ev_s.recall_at(k), atol=1e-6
            )


def test_tempura_sgdet_int8_train_and_test_cli(ag_root, tmp_path):
    """--int8 on BOTH CLIs: the detector is frozen during relation training
    (object_detector.py:85-94 keeps Faster R-CNN in eval mode with no
    grads), so the quantized detect path drives sgdet training as well as
    serving. Calibration -> quantized train -> checkpoint -> quantized test
    runs as one program (metric equality with f32 is not asserted —
    quantization legitimately perturbs detection top-k under tiny random
    weights)."""
    from vidsgg.cli import tempura_test, tempura_train

    ckpt = str(tmp_path / "ckpt_sgdet8")
    flags = _common_flags(ag_root) + ["--int8", "--int8_calib", "1"]
    tempura_train.main(
        ["--mode", "sgdet", "--nepoch", "1", "-log_iter", "2",
         "--save_path", ckpt] + flags
    )
    assert os.path.isdir(os.path.join(ckpt, "checkpoint_0"))
    assert os.path.getsize(os.path.join(ckpt, "log_train.txt")) > 0

    evs = tempura_test.main(
        ["--mode", "sgdet", "--ckpt", ckpt, "--ckpt_name", "checkpoint_0",
         "--output_path", str(tmp_path / "out_sgdet8")] + flags
    )
    for ev in evs:
        for k in ev.KS:
            assert np.isfinite(ev.recall_at(k))
