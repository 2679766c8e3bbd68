"""Convert a reference-trained checkpoint to a servable one.

The reference saves torch ``.tar`` files: TEMPURA as ``{"state_dict",
"object_memory", "rel_memory"}`` (TEMPURA_train.py:308-310), TEAT-GT as
``{"state_dict"}`` (TEATGT_train.py:273-289). This CLI maps one onto this
repo's orbax checkpoint layout so the test/evaluate CLIs serve
reference-trained weights on TPU directly:

    python -m vidsgg.cli.convert_checkpoint \
        --torch_ckpt /path/best_recall_model.tar --out runs/converted \
        --mode sgdet -obj_head gmm -rel_head gmm \
        [any other tempura model flag the original training run used]

    python -m vidsgg.cli.tempura_test --mode sgdet --ckpt runs/converted \
        --ckpt_name converted ...

    python -m vidsgg.cli.convert_checkpoint --model teatgt \
        --torch_ckpt /path/best_Mrecall_model.tar --out runs/conv_teatgt \
        --mode predcls

    python -m vidsgg.cli.teatgt_test --mode predcls --ckpt runs/conv_teatgt \
        --ckpt_name converted ...

Model flags must match the original run — the converter validates exact
coverage (every torch tensor consumed, every Flax leaf written) and fails
loudly on any mismatch rather than serving half-initialized weights. The
reference's own TEMPURA test script silently DROPS the saved memory banks
(TEMPURA_test.py:58-59 restores state_dict only); here they are converted
into the train state, so a memory-trained model actually serves with its
banks (pass --drop_memory to reproduce the reference behavior bit-for-bit).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from vidsgg.data.entry import EntryCapacity
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.checkpoint import save_checkpoint


def _merge(init, conv):
    """Converted leaves override the freshly-initialized tree; subtrees the
    converter never writes (TEAT-GT's regularizer modules) stay at init."""
    if not isinstance(conv, dict):
        return conv
    out = dict(init) if isinstance(init, dict) else {}
    for k, v in conv.items():
        out[k] = _merge(out.get(k, {}), v)
    return out


def _template_entry(seed=0):
    # any template works — parameter shapes don't depend on capacity
    from vidsgg.cli.data_source import make_synthetic_source

    cap = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)
    return next(iter(make_synthetic_source(1, cap, seed=seed, shuffle=False)()))[0]


def _apply_converted(state, variables):
    return state.replace(
        params=jax.tree.map(
            jnp.asarray, _merge(state.params, variables["params"])),
        batch_stats=jax.tree.map(
            jnp.asarray,
            _merge(state.batch_stats, variables.get("batch_stats", {}))),
    )


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from vidsgg.cli.flags import take_flag, take_switch

    drop_memory = take_switch(argv, "--drop_memory")
    torch_ckpt = take_flag(argv, "--torch_ckpt")
    out = take_flag(argv, "--out")
    name = take_flag(argv, "--name", str, "converted")
    which = take_flag(argv, "--model", str, "tempura")
    if not torch_ckpt or not out:
        raise SystemExit("usage: convert_checkpoint [--model tempura|teatgt] "
                         "--torch_ckpt X.tar --out DIR [--name converted] "
                         "[model flags]")
    entry0 = _template_entry()

    if which == "teatgt":
        from vidsgg.configs.teatgt import TeatGTRunConfig
        from vidsgg.models.convert_teatgt import load_teatgt_checkpoint
        from vidsgg.models.teatgt import TeatGT

        class _MemCfg:  # memory-bank geometry only (TEAT-GT has no banks)
            tracking = False
            num_classes = 37

        cfg = TeatGTRunConfig.from_args(argv)
        model_cfg = cfg.model_config()
        variables = load_teatgt_checkpoint(
            torch_ckpt, model_cfg, entry_template=entry0, validate=True)
        state = create_train_state(
            TeatGT(model_cfg), _MemCfg(), entry0, jax.random.PRNGKey(cfg.seed),
            make_optimizer(steps_per_epoch=1),
        )
        state = _apply_converted(state, variables)
        save_checkpoint(out, state, name)
        n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
        print(f"converted {torch_ckpt} -> {out}/{name} "
              f"({n_params:,} params, teatgt mode={cfg.mode}, "
              f"{model_cfg.encoder_layers}L x "
              f"{model_cfg.encoder_attention_heads}H)")
        return state

    from vidsgg.configs.tempura import TempuraRunConfig
    from vidsgg.models.convert_relation import load_tempura_checkpoint
    from vidsgg.models.tempura import Tempura

    cfg = TempuraRunConfig.from_args(argv)
    model_cfg = cfg.model_config()
    variables, obj_mem, rel_mem, mem_active = load_tempura_checkpoint(
        torch_ckpt, model_cfg, entry_template=entry0, validate=True
    )
    state = create_train_state(
        Tempura(model_cfg), model_cfg, entry0, jax.random.PRNGKey(cfg.seed),
        make_optimizer(steps_per_epoch=1),
    )
    state = _apply_converted(state, variables)
    if mem_active and not drop_memory:
        state = state.with_memory(
            jnp.asarray(rel_mem),
            jnp.asarray(obj_mem) if obj_mem is not None else state.obj_memory,
        )
        print("memory banks converted (the reference test script drops "
              "these; pass --drop_memory to reproduce that)")
    save_checkpoint(out, state, name)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"converted {torch_ckpt} -> {out}/{name} "
          f"({n_params:,} params, mode={cfg.mode}, "
          f"obj_head={cfg.obj_head}, rel_head={cfg.rel_head}, K={cfg.K})")
    return state


if __name__ == "__main__":
    main()
