"""Regenerate tests/fixtures/checkpoint_glove — the GloVe-initialized
fixture checkpoint (reference default path EP1: train FROM pretrained
embeddings, src/entity_lstm.py::load_pretrained_token_embeddings).

Writes:
- glove.16d.txt — fixture embedding file covering a deterministic subset of
  the training vocabulary, with entries placed to exercise every M7 cascade
  category (exact / lower / digits / miss)
- model.npz + vocab.json — checkpoint trained with GloVe init
- embedding_stats.json — the A5 match-category telemetry from training

Run from the repo root: python tools/make_glove_fixture.py
No Ray needed (training is driver-side, as in the reference).
"""

from __future__ import annotations

import json
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neuroner_ray.sources.glove import load_embeddings, write_fixture_embeddings
from neuroner_ray.state.checkpoint import save_checkpoint
from neuroner_ray.state.train import make_corpus, train

OUT = os.path.join("tests", "fixtures", "checkpoint_glove")
DIM = 16


def main() -> None:
    train_sents, train_labels = make_corpus(60)
    valid_sents, valid_labels = make_corpus(15, first_conv=5000)

    import re

    vocab_toks = sorted({t for s in train_sents for t in s})
    glove_toks: list[str] = []
    for tok in vocab_toks:
        h = zlib.crc32(tok.encode("utf-8")) % 3
        zeroed = re.sub(r"\d", "0", tok)
        if h == 0:
            glove_toks.append(tok)  # exact hit
        elif h == 1 and tok.lower() != tok:
            glove_toks.append(tok.lower())  # hits via the lower cascade
        elif h == 2 and zeroed != tok:
            glove_toks.append(zeroed)  # hits via the digits→0 cascade
        # otherwise left out → miss / random init
    os.makedirs(OUT, exist_ok=True)
    glove_path = os.path.join(OUT, "glove.16d.txt")
    write_fixture_embeddings(glove_path, sorted(set(glove_toks)), dim=DIM)

    emb = load_embeddings(glove_path, dim=DIM)
    params, vocab, info = train(
        train_sents,
        train_labels,
        valid_sents,
        valid_labels,
        pretrained_embeddings=emb,
        verbose=True,
    )
    save_checkpoint(OUT, params, vocab)
    with open(os.path.join(OUT, "embedding_stats.json"), "w") as f:
        json.dump(info["embedding_stats"], f, indent=1)
    print("best F1:", info["best_f1"])
    print("embedding stats:", info["embedding_stats"])


if __name__ == "__main__":
    main()
