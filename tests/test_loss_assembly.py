"""Loss assembly parity: the two reference train scripts build the
relation-contrastive ('ctl') losses differently —

* TEMPURA (TEMPURA_train.py:209-212): 0.2x spatial_con + contact_con, the
  attention term is commented out;
* TEAT-GT (TEATGT_train.py:176-179): 0.25x attention_con + spatial_con +
  contact_con, with the attention term keyed on the raw class index.

`assemble_losses` must reproduce both via LossFlags.ctl_variant, and the
config surfaces must select the right variant.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vidsgg.data.entry import Entry, EntryCapacity
from vidsgg.losses import contrastive_loss, masked_bce, masked_ce
from vidsgg.train.steps import LossFlags, assemble_losses


def _setup():
    cap = EntryCapacity(max_frames=4, max_objs=8, max_pairs=6)
    rng = np.random.RandomState(0)
    entry = Entry.zeros(cap).replace(
        pair_mask=jnp.asarray([True, True, True, True, False, False]),
        attention_gt=jnp.asarray([0, 1, 2, 0, 0, 0], jnp.int32),
        spatial_gt=jnp.asarray(
            (rng.rand(cap.max_pairs, 6) > 0.5).astype(np.float32)
        ),
        contacting_gt=jnp.asarray(
            (rng.rand(cap.max_pairs, 17) > 0.5).astype(np.float32)
        ),
    )
    out = {
        "attention_distribution": jnp.asarray(rng.randn(6, 3), jnp.float32),
        "spatial_distribution": jnp.asarray(rng.randn(6, 6), jnp.float32),
        "contacting_distribution": jnp.asarray(rng.randn(6, 17), jnp.float32),
    }
    return entry, out


def _base_expected(out, entry):
    pm = entry.pair_mask
    return {
        "attention_relation_loss": masked_ce(
            out["attention_distribution"], entry.attention_gt, pm
        ),
        "spatial_relation_loss": masked_bce(
            out["spatial_distribution"], entry.spatial_gt, pm
        ),
        "contacting_relation_loss": masked_bce(
            out["contacting_distribution"], entry.contacting_gt, pm
        ),
    }


def test_tempura_ctl_variant():
    entry, out = _setup()
    losses = assemble_losses(
        out, entry, LossFlags(mode="predcls", use_ctl_loss=True)
    )
    pm = entry.pair_mask
    assert "attention_con_loss" not in losses  # commented out in the ref
    np.testing.assert_allclose(
        losses["spatial_con_loss"],
        0.2 * contrastive_loss(
            out["spatial_distribution"], jnp.argmax(entry.spatial_gt, 1), pm
        ),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        losses["contact_con_loss"],
        0.2 * contrastive_loss(
            out["contacting_distribution"],
            jnp.argmax(entry.contacting_gt, 1), pm,
        ),
        rtol=1e-6,
    )
    for k, v in _base_expected(out, entry).items():
        np.testing.assert_allclose(losses[k], v, rtol=1e-6)


def test_teatgt_ctl_variant():
    entry, out = _setup()
    losses = assemble_losses(
        out, entry,
        LossFlags(mode="predcls", use_ctl_loss=True, ctl_variant="teatgt"),
    )
    pm = entry.pair_mask
    np.testing.assert_allclose(
        losses["attention_con_loss"],
        0.25 * contrastive_loss(
            out["attention_distribution"], entry.attention_gt, pm
        ),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        losses["spatial_con_loss"],
        0.25 * contrastive_loss(
            out["spatial_distribution"], jnp.argmax(entry.spatial_gt, 1), pm
        ),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        losses["contact_con_loss"],
        0.25 * contrastive_loss(
            out["contacting_distribution"],
            jnp.argmax(entry.contacting_gt, 1), pm,
        ),
        rtol=1e-6,
    )


def test_configs_select_variant():
    from vidsgg.configs.tempura import TempuraRunConfig
    from vidsgg.configs.teatgt import TeatGTRunConfig

    assert TempuraRunConfig().loss_flags().ctl_variant == "tempura"
    assert TeatGTRunConfig().loss_flags().ctl_variant == "teatgt"


@pytest.mark.parametrize("variant", ["tempura", "teatgt"])
def test_ctl_off_has_no_con_losses(variant):
    entry, out = _setup()
    losses = assemble_losses(
        out, entry, LossFlags(mode="predcls", ctl_variant=variant)
    )
    assert not any(k.endswith("_con_loss") for k in losses)


def test_metric_window_bounded():
    from vidsgg.train.loop import MetricWindow

    w = MetricWindow(5)
    for i in range(40):
        w.push({"total_loss": i})
    assert len(w) == 5
    assert [m["total_loss"] for m in w] == list(range(35, 40))
