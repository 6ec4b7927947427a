"""Model-core tests (SURVEY.md §5): numerical gradient check of the full
BiLSTM-CRF loss, Viterbi vs brute-force enumeration, and batched-inference
parity with the per-sequence path."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from neuroner_ray.state.model import (
    crf_log_likelihood,
    char_features_unique,
    forward_scores,
    forward_scores_batch,
    init_params,
    sequence_loss_and_grads,
    viterbi_decode,
    viterbi_decode_batch,
)


def _tiny_params(seed=0):
    return init_params(
        n_chars=6, n_tokens=8, n_labels=4,
        char_dim=3, char_hidden=3, token_dim=4, token_hidden=4, ff_dim=4,
        seed=seed,
    )


def _tiny_input(rng):
    T = 5
    tok_ids = rng.randint(0, 8, size=T)
    char_ids = [rng.randint(0, 6, size=rng.randint(1, 5)) for _ in range(T)]
    y = rng.randint(0, 4, size=T)
    return tok_ids, char_ids, y


def test_gradient_check_full_model():
    rng = np.random.RandomState(1)
    p = _tiny_params()
    tok_ids, char_ids, y = _tiny_input(rng)
    _, grads = sequence_loss_and_grads(p, tok_ids, char_ids, y)
    eps = 1e-6
    for name in p:
        g_num = np.zeros_like(p[name])
        flat = p[name].ravel()
        gflat = g_num.ravel()
        idxs = rng.choice(flat.size, size=min(10, flat.size), replace=False)
        for i in idxs:
            old = flat[i]
            flat[i] = old + eps
            lp, _ = _loss_only(p, tok_ids, char_ids, y)
            flat[i] = old - eps
            lm, _ = _loss_only(p, tok_ids, char_ids, y)
            flat[i] = old
            gflat[i] = (lp - lm) / (2 * eps)
        ana = grads[name].ravel()[idxs]
        num = g_num.ravel()[idxs]
        denom = np.maximum(1e-6, np.abs(ana) + np.abs(num))
        rel = np.abs(ana - num) / denom
        assert rel.max() < 1e-4, (name, rel.max(), ana, num)


def _loss_only(p, tok_ids, char_ids, y):
    U, _ = forward_scores(p, tok_ids, char_ids)
    nll, _, _ = crf_log_likelihood(U, p["crf_A"], y)
    return nll, U


def test_crf_partition_is_logsumexp_of_all_paths():
    rng = np.random.RandomState(2)
    T, C = 4, 3
    U = rng.randn(T, C)
    A = rng.randn(C + 2, C + 2)
    y = rng.randint(0, C, size=T)
    nll, _, _ = crf_log_likelihood(U, A, y)
    # brute force logZ and gold score
    scores = []
    for path in itertools.product(range(C), repeat=T):
        s = A[C, path[0]] + U[0, path[0]]
        for t in range(1, T):
            s += A[path[t - 1], path[t]] + U[t, path[t]]
        s += A[path[T - 1], C + 1]
        scores.append(s)
    logZ = np.log(np.exp(scores - np.max(scores)).sum()) + np.max(scores)
    gold = A[C, y[0]] + U[0, y[0]]
    for t in range(1, T):
        gold += A[y[t - 1], y[t]] + U[t, y[t]]
    gold += A[y[T - 1], C + 1]
    assert nll == pytest.approx(logZ - gold, rel=1e-10)


def test_viterbi_vs_brute_force():
    rng = np.random.RandomState(3)
    for _ in range(20):
        T, C = rng.randint(1, 6), rng.randint(2, 5)
        U = rng.randn(T, C)
        A = rng.randn(C + 2, C + 2)
        best_path, best_score = None, -np.inf
        for path in itertools.product(range(C), repeat=T):
            s = A[C, path[0]] + U[0, path[0]]
            for t in range(1, T):
                s += A[path[t - 1], path[t]] + U[t, path[t]]
            s += A[path[T - 1], C + 1]
            if s > best_score:
                best_score, best_path = s, path
        got = viterbi_decode(U, A)
        assert tuple(got) == best_path


def test_batched_inference_matches_sequential():
    rng = np.random.RandomState(4)
    p = _tiny_params(seed=5)
    seqs = []
    for _ in range(7):
        T = rng.randint(1, 9)
        tok_ids = rng.randint(0, 8, size=T)
        char_ids = [rng.randint(0, 6, size=rng.randint(1, 5)) for _ in range(T)]
        seqs.append((tok_ids, char_ids))
    # sequential
    seq_paths = []
    for tok_ids, char_ids in seqs:
        U, _ = forward_scores(p, tok_ids, char_ids)
        seq_paths.append(viterbi_decode(U, p["crf_A"]))
    # batched
    lengths = np.array([len(s[0]) for s in seqs])
    Tmax = lengths.max()
    Hc2 = 2 * p["char_Wh_f"].shape[0]
    tok_pad = np.zeros((len(seqs), Tmax), dtype=np.int64)
    char_feat_pad = np.zeros((len(seqs), Tmax, Hc2))
    for i, (tok_ids, char_ids) in enumerate(seqs):
        tok_pad[i, : len(tok_ids)] = tok_ids
        char_feat_pad[i, : len(tok_ids)] = char_features_unique(p, char_ids)
    U = forward_scores_batch(p, tok_pad, char_feat_pad, lengths)
    paths = viterbi_decode_batch(U, p["crf_A"], lengths)
    for i, sp in enumerate(seq_paths):
        assert list(paths[i, : lengths[i]]) == list(sp)
