"""CLI config surfaces: flag parsing, mode-derived overrides, sentinel
normalization (reference tempura_config.py:25-38, teatgt_config.py:11-14)."""

import pytest

from vidsgg.configs.teatgt import TeatGTRunConfig
from vidsgg.configs.tempura import TempuraRunConfig


def test_tempura_defaults_and_predcls():
    cfg = TempuraRunConfig.from_args(["--mode", "predcls"])
    assert cfg.K == 6 and cfg.tracking is False
    assert cfg.rel_head == "gmm" and cfg.obj_head == "linear"
    assert cfg.seed == 1123
    mc = cfg.model_config()
    assert mc.mode == "predcls" and mc.k == 6


def test_tempura_mode_overrides():
    cfg = TempuraRunConfig.from_args(["--mode", "sgcls"])
    # tempura_config.py:25-28
    assert cfg.K == 4 and cfg.tracking is True and cfg.obj_con_loss == "euc_con"


def test_tempura_none_sentinels():
    cfg = TempuraRunConfig.from_args(
        ["--mode", "predcls", "-rel_mem_compute", "None", "-obj_loss_weighting", "None"]
    )
    assert cfg.rel_mem_compute is None
    assert cfg.obj_loss_weighting is None
    flags = cfg.loss_flags()
    assert flags.mode == "predcls"


def test_teatgt_mode_overrides():
    cfg = TeatGTRunConfig.from_args(["--mode", "sgdet"])
    # teatgt_config.py:11-14
    assert cfg.tracking is True
    assert cfg.encoder_layers == 6 and cfg.encoder_attention_heads == 16
    mc = cfg.model_config()
    assert mc.encoder_layers == 6

    cfg_p = TeatGTRunConfig.from_args(["--mode", "predcls"])
    assert cfg_p.encoder_layers == 12 and cfg_p.encoder_attention_heads == 32


def test_reference_style_command_lines_parse():
    # docker_cmd.txt-style invocations port over
    TempuraRunConfig.from_args(
        "--mode sgcls --datasize large --lr 1e-5 --nepoch 10 -obj_head gmm "
        "-rel_head gmm -K 4 -rel_mem_compute joint -obj_mem_compute "
        "-rel_unc -obj_unc --use_ctl_loss".split()
    )
    TeatGTRunConfig.from_args(
        "--mode predcls --lap_node_id --lap_node_id_k 50 "
        "--lap_node_id_sign_flip --use_cons_str_loss --use_cons_sem_loss".split()
    )


@pytest.mark.parametrize(
    "mod",
    [
        "vidsgg.cli.tempura_train",
        "vidsgg.cli.tempura_test",
        "vidsgg.cli.tempura_evaluate",
        "vidsgg.cli.teatgt_train",
        "vidsgg.cli.teatgt_evaluate",
        "vidsgg.cli.teatgt_test",
        "vidsgg.cli.kcc_demo",
    ],
)
def test_cli_modules_import(mod):
    __import__(mod)


def test_maybe_trace_helper(tmp_path):
    # no-op without a dir; writes an xplane trace with one (--profile DIR)
    import os

    import jax
    import jax.numpy as jnp

    from vidsgg.utils.profiling import maybe_trace

    with maybe_trace(None):
        pass

    d = str(tmp_path / "trace")
    with maybe_trace(d):
        float(jax.jit(lambda x: x * 2)(jnp.ones(4)).sum())
    assert any(
        f.endswith(".xplane.pb") for _, _, fs in os.walk(d) for f in fs
    )
