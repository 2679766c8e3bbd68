"""Cross-framework golden test: vidsgg's MultiheadAttention vs
torch.nn.MultiheadAttention with identical weights — the primitive under
every attention site in the reference (STTran, OSPU tracking, memory
hallucinator, TokenGT)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vidsgg.models.attention import MultiheadAttention  # noqa: E402

D, HEADS, T = 16, 4, 9


def test_matches_torch_mha_with_key_padding_mask():
    rng = np.random.RandomState(0)
    x = rng.randn(T, D).astype(np.float32)
    pad = np.array([False] * 7 + [True] * 2)  # torch: True = ignore

    model = MultiheadAttention(D, HEADS, dropout=0.0)
    allowed = (~pad)[None, :] & (~pad)[:, None]
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
        jnp.asarray(allowed),
    )
    p = jax.tree.map(np.asarray, variables["params"])

    tm = torch.nn.MultiheadAttention(D, HEADS, dropout=0.0, batch_first=True)
    with torch.no_grad():
        in_proj = np.concatenate(
            [p["q_proj"]["kernel"].T, p["k_proj"]["kernel"].T, p["v_proj"]["kernel"].T]
        )
        tm.in_proj_weight.copy_(torch.from_numpy(in_proj))
        tm.in_proj_bias.copy_(
            torch.from_numpy(
                np.concatenate(
                    [p["q_proj"]["bias"], p["k_proj"]["bias"], p["v_proj"]["bias"]]
                )
            )
        )
        tm.out_proj.weight.copy_(torch.from_numpy(p["out_proj"]["kernel"].T))
        tm.out_proj.bias.copy_(torch.from_numpy(p["out_proj"]["bias"]))
        want, _ = tm(
            torch.from_numpy(x)[None],
            torch.from_numpy(x)[None],
            torch.from_numpy(x)[None],
            key_padding_mask=torch.from_numpy(pad)[None],
        )
    got = model.apply(
        variables, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
        jnp.asarray(allowed),
    )
    # padded QUERY rows differ (torch emits NaN/garbage there; ours are
    # defined) — compare valid query rows only, like the pipelines do
    np.testing.assert_allclose(
        np.asarray(got)[:7], want[0, :7].numpy(), atol=2e-5
    )


def test_matches_torch_cross_attention():
    rng = np.random.RandomState(1)
    q = rng.randn(5, D).astype(np.float32)
    kv = rng.randn(T, D).astype(np.float32)

    model = MultiheadAttention(D, HEADS, dropout=0.0)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), None
    )
    p = jax.tree.map(np.asarray, variables["params"])

    tm = torch.nn.MultiheadAttention(D, HEADS, dropout=0.0, batch_first=True)
    with torch.no_grad():
        in_proj = np.concatenate(
            [p["q_proj"]["kernel"].T, p["k_proj"]["kernel"].T, p["v_proj"]["kernel"].T]
        )
        tm.in_proj_weight.copy_(torch.from_numpy(in_proj))
        tm.in_proj_bias.copy_(
            torch.from_numpy(
                np.concatenate(
                    [p["q_proj"]["bias"], p["k_proj"]["bias"], p["v_proj"]["bias"]]
                )
            )
        )
        tm.out_proj.weight.copy_(torch.from_numpy(p["out_proj"]["kernel"].T))
        tm.out_proj.bias.copy_(torch.from_numpy(p["out_proj"]["bias"]))
        want, _ = tm(
            torch.from_numpy(q)[None],
            torch.from_numpy(kv)[None],
            torch.from_numpy(kv)[None],
        )
    got = model.apply(
        variables, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), None
    )
    np.testing.assert_allclose(np.asarray(got), want[0].numpy(), atol=2e-5)
