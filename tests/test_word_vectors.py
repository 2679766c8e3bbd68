"""GloVe ingestion: txt -> npz conversion and the reference's exact
lookup-with-fallback semantics (word_vectors.py:15-35)."""

import numpy as np
import pytest

from vidsgg import constants as C
from vidsgg.models.embeddings import (
    build_npz_from_glove_txt,
    obj_edge_vectors,
    required_glove_vocab,
)


@pytest.fixture()
def glove_npz(tmp_path):
    txt = tmp_path / "glove.txt"
    words = {
        "sofa": 1.0, "cup": 2.0, "table": 3.0, "switch": 4.0,
        "light": 5.0, "person": 6.0,
    }
    lines = []
    for w, base in words.items():
        vec = np.full(200, base, np.float32)
        lines.append(w + " " + " ".join(f"{x:.1f}" for x in vec))
    txt.write_text("\n".join(lines) + "\n")
    out = tmp_path / "wv.npz"
    n = build_npz_from_glove_txt(str(txt), str(out))
    assert n == len(words)
    return str(out)


def test_split_slash_primary_lookup(glove_npz):
    # merged class names always look up the pre-'/' segment
    v = obj_edge_vectors(["sofa/couch", "cup/glass/bottle"], wv_path=glove_npz)
    assert np.allclose(v[0], 1.0)
    assert np.allclose(v[1], 2.0)


def test_longest_word_fallback(glove_npz):
    # 'light switch' misses as a token; the longest space-separated word
    # ('switch', 6 letters > 'light', 5) is tried next
    v = obj_edge_vectors(["light switch"], wv_path=glove_npz)
    assert np.allclose(v[0], 4.0)


def test_total_miss_uses_deterministic_init(glove_npz):
    a = obj_edge_vectors(["floobargle"], wv_path=glove_npz)
    b = obj_edge_vectors(["floobargle"], wv_path=glove_npz)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a).sum() > 0


def test_exact_word_hits(glove_npz):
    v = obj_edge_vectors(["table", "person"], wv_path=glove_npz)
    assert np.allclose(v[0], 3.0)
    assert np.allclose(v[1], 6.0)


def test_vocab_restriction(tmp_path):
    txt = tmp_path / "glove.txt"
    txt.write_text(
        "sofa " + " ".join(["1.0"] * 200) + "\n"
        + "zzz " + " ".join(["9.0"] * 200) + "\n"
    )
    out = tmp_path / "wv.npz"
    n = build_npz_from_glove_txt(str(txt), str(out), vocab={"sofa"})
    assert n == 1
    data = np.load(str(out))
    assert data.files == ["sofa"]


def test_required_vocab_covers_ag_classes():
    vocab = required_glove_vocab()
    for name in list(C.AG_OBJECT_CLASSES) + list(C.AG_RELATIONSHIP_CLASSES):
        assert name.split("/")[0] in vocab
        for w in name.split(" "):
            assert w in vocab


def test_dim_mismatch_raises(tmp_path):
    txt = tmp_path / "bad.txt"
    txt.write_text("sofa 1.0 2.0\n")
    with pytest.raises(ValueError, match="dims"):
        build_npz_from_glove_txt(str(txt), str(tmp_path / "o.npz"))
