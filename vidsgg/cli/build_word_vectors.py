"""Build the GloVe ``.npz`` asset from the public glove.6B.200d.txt.

The reference consumes a torch-pickled cache of the same data
(tools/utils/word_vectors.py:45-111, gitignored). Usage:

  python -m vidsgg.cli.build_word_vectors glove.6B.200d.txt word_vectors.npz
  python -m vidsgg.cli.build_word_vectors glove.6B.200d.txt wv.npz --full

By default only the words reachable from the AG class-name lookup are kept
(a few-KB asset); --full keeps the whole vocabulary. Point
``VIDSGG_WORD_VECTORS`` (or configs' wv_path) at the output.
"""

from __future__ import annotations

import argparse

from vidsgg.models.embeddings import (
    WV_DIM,
    build_npz_from_glove_txt,
    required_glove_vocab,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("txt_path")
    p.add_argument("out_path")
    p.add_argument("--wv_dim", type=int, default=WV_DIM)
    p.add_argument("--full", action="store_true",
                   help="keep the full vocabulary instead of the AG subset")
    args = p.parse_args(argv)
    vocab = None if args.full else required_glove_vocab()
    n = build_npz_from_glove_txt(args.txt_path, args.out_path, args.wv_dim, vocab)
    print(f"wrote {n} word vectors to {args.out_path}")
    return n


if __name__ == "__main__":
    main()
