"""Masked-correctness properties of the TokenGT encoder: growing the
padding (node or edge capacity) must not change valid-token outputs, and
edge-token *order* must not matter (attention over a set)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsgg.models.tokengt import TokenGTEncoder

D = 64


def _problem(tn, te, n_valid, e_valid, seed=0):
    rng = np.random.RandomState(seed)
    node_data = rng.randn(1, tn, 32).astype(np.float32)
    node_mask = np.arange(tn) < n_valid
    node_data *= node_mask[None, :, None]
    frame_idx = (rng.randint(0, 3, (1, tn)) * node_mask).astype(np.int32)
    edge_index = rng.randint(0, n_valid, (1, te, 2)).astype(np.int32)
    edge_type = rng.randint(0, 2, (1, te)).astype(np.int32)
    edge_mask = np.arange(te) < e_valid
    edge_index *= edge_mask[None, :, None]
    edge_type *= edge_mask[None, :]
    eig = rng.randn(1, tn, tn).astype(np.float32) * node_mask[None, :, None]
    return (
        jnp.asarray(node_data), jnp.asarray(node_mask[None]),
        jnp.asarray(frame_idx), jnp.asarray(edge_index),
        jnp.asarray(edge_type), jnp.asarray(edge_mask[None]), jnp.asarray(eig),
    )


@pytest.fixture(scope="module")
def encoder():
    model = TokenGTEncoder(
        num_atoms=32, num_output=26, embed_dim=D, layers=2, heads=4,
        ffn_dim=D, lap_node_id_k=8,
    )
    args = _problem(6, 8, 5, 6)
    variables = model.init(jax.random.PRNGKey(0), *args)
    return model, variables


def test_padding_invariance(encoder):
    model, variables = encoder
    args_small = _problem(6, 8, 5, 6)
    logits_s, hidden_s, _ = model.apply(variables, *args_small)

    # same problem with double the padding
    (nd, nm, fi, ei, et, em, eig) = args_small
    tn2, te2 = 12, 20
    nd2 = jnp.zeros((1, tn2, 32)).at[:, :6].set(nd)
    nm2 = jnp.zeros((1, tn2), bool).at[:, :6].set(nm)
    fi2 = jnp.zeros((1, tn2), jnp.int32).at[:, :6].set(fi)
    ei2 = jnp.zeros((1, te2, 2), jnp.int32).at[:, :8].set(ei)
    et2 = jnp.zeros((1, te2), jnp.int32).at[:, :8].set(et)
    em2 = jnp.zeros((1, te2), bool).at[:, :8].set(em)
    eig2 = jnp.zeros((1, tn2, tn2)).at[:, :6, :6].set(eig)
    logits_l, hidden_l, _ = model.apply(variables, nd2, nm2, fi2, ei2, et2, em2, eig2)

    np.testing.assert_allclose(
        np.asarray(logits_s)[0, :5], np.asarray(logits_l)[0, :5], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(hidden_s)[0, :5], np.asarray(hidden_l)[0, :5], atol=1e-4
    )
    # padded node rows are zeroed
    assert np.allclose(np.asarray(logits_l)[0, 6:], 0.0)


def test_edge_order_invariance(encoder):
    model, variables = encoder
    args = _problem(6, 8, 5, 6, seed=3)
    logits_a, _, _ = model.apply(variables, *args)
    (nd, nm, fi, ei, et, em, eig) = args
    perm = np.array([5, 2, 0, 4, 1, 3, 6, 7])  # permute valid edges (+pads)
    logits_b, _, _ = model.apply(
        variables, nd, nm, fi, ei[:, perm], et[:, perm], em[:, perm], eig
    )
    np.testing.assert_allclose(
        np.asarray(logits_a)[0, :5], np.asarray(logits_b)[0, :5], atol=1e-4
    )


def test_reference_padding_idx_quirks(encoder):
    """The reference's Embedding(padding_idx=0) quirks are part of the
    trained function (tokenizer.py:44-45, 242-247): the clip's first frame
    gets a ZERO temporal embedding and spatial edges (type id 0) get a ZERO
    edge embedding."""
    model, variables = encoder
    params = variables["params"]
    # craft two problems differing only in a frame index 0 vs 1 for a node
    args = list(_problem(6, 8, 5, 6, seed=5))
    fi = np.asarray(args[2]).copy()
    fi[0, 0] = 0
    a0 = model.apply(variables, args[0], args[1], jnp.asarray(fi), *args[3:])[0]
    # node embedding for frame 0 must not include any temp_encoder row:
    # manually verify via the parameter table — perturbing row 0 of the
    # temporal table must not change outputs (row 0 is never added)
    import jax as _jax

    p2 = _jax.tree_util.tree_map(lambda x: x, params)
    p2 = dict(p2)
    p2["temp_encoder"] = p2["temp_encoder"].at[0].add(100.0)
    b0 = model.apply({"params": p2}, args[0], args[1], jnp.asarray(fi), *args[3:])[0]
    np.testing.assert_allclose(np.asarray(a0), np.asarray(b0), atol=1e-5)

    # perturbing edge_encoder row 0 (spatial id) must not change outputs
    p3 = dict(params)
    p3["edge_encoder"] = p3["edge_encoder"].at[0].add(100.0)
    c0 = model.apply({"params": p3}, args[0], args[1], jnp.asarray(fi), *args[3:])[0]
    np.testing.assert_allclose(np.asarray(a0), np.asarray(c0), atol=1e-5)

    # but row 1 (temporal edges) DOES matter when temporal edges exist
    # (perturb non-uniformly: a constant shift would be erased by the
    # pre-norm LayerNorm before attention)
    et = np.asarray(args[4]).copy()
    et[0, :3] = 1
    p4 = dict(params)
    p4["edge_encoder"] = p4["edge_encoder"].at[1].add(
        jnp.linspace(-2.0, 2.0, p4["edge_encoder"].shape[1])
    )
    base = model.apply(variables, args[0], args[1], jnp.asarray(fi),
                       args[3], jnp.asarray(et), args[5], args[6])[0]
    pert = model.apply({"params": p4}, args[0], args[1], jnp.asarray(fi),
                       args[3], jnp.asarray(et), args[5], args[6])[0]
    assert not np.allclose(np.asarray(base), np.asarray(pert), atol=1e-5)


def test_alternative_node_ids_and_performer():
    """ORF/random node identifiers and the FAVOR+ attention backend
    (reference's dead-by-default config paths) run and stay finite."""
    args = _problem(6, 8, 5, 6, seed=7)
    for mode in ("orf", "rand"):
        m = TokenGTEncoder(
            num_atoms=32, num_output=26, embed_dim=D, layers=1, heads=4,
            ffn_dim=D, lap_node_id_k=8, node_id_mode=mode,
        )
        v = m.init(jax.random.PRNGKey(0), *args)
        logits, hidden, _ = m.apply(v, *args)
        assert np.isfinite(np.asarray(logits)).all(), mode
        assert np.allclose(np.asarray(logits)[0, 5:], 0.0)

    mp = TokenGTEncoder(
        num_atoms=32, num_output=26, embed_dim=D, layers=2, heads=4,
        ffn_dim=D, lap_node_id_k=8, performer=True, performer_nb_features=64,
    )
    v = mp.init(jax.random.PRNGKey(1), *args)
    logits, hidden, _ = mp.apply(v, *args)
    # no extra variable collections: the random-feature projection is a
    # compile-time constant, so the standard TrainState carries everything
    assert set(v.keys()) == {"params"}
    assert np.isfinite(np.asarray(logits)).all()
    # masked (padding) keys must not influence valid outputs: grow padding
    (nd, nm, fi, ei, et, em, eig) = args
    nd2 = jnp.concatenate([nd, jnp.ones((1, 3, 32)) * 50.0], axis=1)
    nm2 = jnp.concatenate([nm, jnp.zeros((1, 3), bool)], axis=1)
    fi2 = jnp.concatenate([fi, jnp.zeros((1, 3), jnp.int32)], axis=1)
    eig2 = jnp.zeros((1, 9, 9)).at[:, :6, :6].set(eig)
    logits2, _, _ = mp.apply(v, nd2, nm2, fi2, ei, et, em, eig2)
    np.testing.assert_allclose(
        np.asarray(logits)[0, :5], np.asarray(logits2)[0, :5], atol=1e-4
    )
