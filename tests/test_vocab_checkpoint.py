"""Vocab fit, embedding cascade (M7/M8/J1), checkpoint remap (T5/J2)."""

from __future__ import annotations

import numpy as np

from neuroner_ray.state.checkpoint import (
    load_checkpoint,
    restore_with_remap,
    save_checkpoint,
)
from neuroner_ray.state.model import init_params
from neuroner_ray.state.vocab import (
    UNK,
    Vocab,
    build_embedding_matrix,
    build_vocab,
    embedding_cascade,
)


def test_vocab_ordering_reference_semantics():
    sents = [["b", "a", "a", "c"], ["a", "b"]]
    labels = [["O", "B-PER", "I-PER", "O"], ["O", "O"]]
    v = build_vocab(sents, labels)
    # UNK first, then by count desc / token asc: a(3), b(2), c(1)
    assert v.token_to_index == {UNK: 0, "a": 1, "b": 2, "c": 3}
    assert v.label_to_index == {"B-PER": 0, "I-PER": 1, "O": 2}
    assert 0 not in v.character_to_index.values()  # 0 reserved for padding
    assert v.token_index("zzz") == 0  # M8 OOV → UNK


def test_embedding_cascade_m7():
    emb = {"acme": np.ones(4), "r0d0": np.full(4, 2.0), "Exact": np.full(4, 3.0)}
    assert embedding_cascade("Exact", emb)[1] == "exact"
    assert embedding_cascade("ACME", emb)[1] == "lower"
    assert embedding_cascade("r1d2", emb)[1] == "digits"
    assert embedding_cascade("R1D2", emb)[1] == "lower+digits"
    assert embedding_cascade("nope", emb)[1] == "miss"


def test_embedding_matrix_telemetry():
    sents = [["Acme", "r2d2", "zzz"]]
    v = build_vocab(sents, [["O", "O", "O"]])
    emb = {"acme": np.arange(4, dtype=float), "r0d0": np.full(4, 2.0)}
    M, stats = build_embedding_matrix(v, emb, dim=4)
    assert stats["lower"] == 1 and stats["digits"] == 1
    assert np.allclose(M[v.token_to_index["Acme"]], np.arange(4))


def test_checkpoint_round_trip(tmp_path):
    p = init_params(n_chars=5, n_tokens=6, n_labels=3,
                    char_dim=2, char_hidden=2, token_dim=3, token_hidden=3,
                    ff_dim=3)
    v = build_vocab([["x", "y"]], [["O", "B-PER"]])
    save_checkpoint(str(tmp_path / "ck"), p, v)
    p2, v2 = load_checkpoint(str(tmp_path / "ck"))
    assert set(p2) == set(p)
    for k in p:
        assert np.allclose(p[k], p2[k])
    assert v2.token_to_index == v.token_to_index


def test_restore_with_remap_joins_embeddings():
    old_v = build_vocab([["alpha", "beta"]], [["O", "O"]])
    new_v = build_vocab([["beta", "gamma"]], [["O", "O"]])
    old_p = init_params(n_chars=old_v.n_chars, n_tokens=old_v.n_tokens,
                        n_labels=1, char_dim=2, char_hidden=2, token_dim=3,
                        token_hidden=3, ff_dim=3, seed=1)
    new_p = init_params(n_chars=new_v.n_chars, n_tokens=new_v.n_tokens,
                        n_labels=1, char_dim=2, char_hidden=2, token_dim=3,
                        token_hidden=3, ff_dim=3, seed=2)
    merged = restore_with_remap(old_p, old_v, new_v, new_p)
    # 'beta' row carried over through the string join
    assert np.allclose(
        merged["tok_emb"][new_v.token_to_index["beta"]],
        old_p["tok_emb"][old_v.token_to_index["beta"]],
    )
    # 'gamma' unseen → keeps the fresh row
    assert np.allclose(
        merged["tok_emb"][new_v.token_to_index["gamma"]],
        new_p["tok_emb"][new_v.token_to_index["gamma"]],
    )
    # LSTM weights copied
    assert np.allclose(merged["tok_Wx_f"], old_p["tok_Wx_f"])


def test_build_vocab_distributed_matches_counter():
    import ray.data as rd
    from collections import Counter

    from neuroner_ray.functions.tokenize import tokenize_batch
    from neuroner_ray.state.vocab import build_vocab_distributed

    texts = ["a b b c", "b c d", "", "a a"]
    ds = rd.from_items([{"text": t} for t in texts]).map_batches(
        tokenize_batch, batch_format="pyarrow"
    )
    got = build_vocab_distributed(ds)
    want = Counter()
    for t in texts:
        want.update(t.split())
    assert got == want


def test_glove_fixture_cascade_integration(tmp_path):
    """FIXTURES.md F4: fixture embeddings cover part of the checkpoint vocab;
    the cascade resolves case/digit variants and misses fall to random."""
    from neuroner_ray.sources.glove import load_embeddings, write_fixture_embeddings
    from neuroner_ray.state.checkpoint import load_checkpoint
    from neuroner_ray.state.vocab import build_embedding_matrix

    _, vocab = load_checkpoint("tests/fixtures/checkpoint")
    toks = sorted(vocab.token_to_index)
    covered = [t.lower() for t in toks[: int(len(toks) * 0.7)]]
    p = str(tmp_path / "glove.mini.txt")
    write_fixture_embeddings(p, sorted(set(covered)), dim=10)
    emb = load_embeddings(p)
    M, stats = build_embedding_matrix(vocab, emb, dim=10)
    assert M.shape == (vocab.n_tokens, 10)
    assert stats["exact"] + stats["lower"] + stats["digits"] + stats["lower+digits"] > 0
    assert stats["miss"] > 0  # 30% uncovered exercises the UNK/random path


def test_glove_initialized_fixture_checkpoint():
    """M7/J1 exercised END-TO-END (round-1 NOTES gap): the committed
    checkpoint_glove fixture was trained FROM pretrained embeddings through
    the lookup cascade (the reference's default EP1 path). Asserts the A5
    match-category stats recorded at training time, that they reproduce
    from the committed GloVe file + vocab (drift guard), and that the
    checkpoint tags held-out text at reference-level F1."""
    import json
    import os

    from neuroner_ray.functions.conlleval import evaluate
    from neuroner_ray.functions.labels import bioes_to_bio
    from neuroner_ray.sources.glove import load_embeddings
    from neuroner_ray.state.checkpoint import load_checkpoint
    from neuroner_ray.state.train import make_corpus, predict
    from neuroner_ray.state.vocab import build_embedding_matrix

    ckpt = os.path.join(os.path.dirname(__file__), "fixtures", "checkpoint_glove")
    with open(os.path.join(ckpt, "embedding_stats.json")) as f:
        stats = json.load(f)
    assert stats["exact"] > 0
    assert stats["lower"] > 0
    assert stats["digits"] > 0
    assert stats["miss"] > 0

    params, vocab = load_checkpoint(ckpt)
    emb = load_embeddings(os.path.join(ckpt, "glove.16d.txt"), dim=16)
    _, recomputed = build_embedding_matrix(vocab, emb, dim=16)
    assert recomputed == stats  # cascade behavior drifted if this fails

    sents, gold = make_corpus(20, first_conv=30000)  # held-out conversations
    preds = [bioes_to_bio(predict(params, vocab, s)) for s in sents]
    assert evaluate(gold, preds)["fb1"] >= 99.0
