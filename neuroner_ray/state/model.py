"""NumPy reimplementation of the reference's BiLSTM-CRF sequence tagger.

Reference: src/entity_lstm.py::EntityLSTM (≈L15–L250) — character BiLSTM
(final fwd/bwd states concatenated) + token embedding → dropout → token
BiLSTM → tanh feed-forward → linear unary scores → CRF with start/end
states; decode via Viterbi (src/train.py::prediction_step ≈L60–L160 using
tf.contrib.crf.viterbi_decode). No TF/torch exists in this environment, so
forward, analytic gradients (for the fixture trainer) and Viterbi are
implemented directly in numpy; gradients are verified against numerical
differentiation in tests/test_model.py.

Two forward paths:
- per-sequence (training; exact gradients)
- batched/padded (inference; used by the actor-pool tagger — sequences are
  processed in lockstep so the inner loop is T matmuls of [B,·] arrays,
  with a per-unique-token cache for the char BiLSTM)
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# LSTM primitive (single sequence)
# ---------------------------------------------------------------------------


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -50, 50)))


def lstm_forward(X: np.ndarray, Wx: np.ndarray, Wh: np.ndarray, b: np.ndarray):
    """X:[T,D] → hs:[T,H]; gate order (i, f, o, g) along the 4H axis."""
    T, D = X.shape
    H = Wh.shape[0]
    hs = np.zeros((T, H))
    cs = np.zeros((T, H))
    cache = []
    h = np.zeros(H)
    c = np.zeros(H)
    for t in range(T):
        z = X[t] @ Wx + h @ Wh + b
        i = _sigmoid(z[:H])
        f = _sigmoid(z[H : 2 * H])
        o = _sigmoid(z[2 * H : 3 * H])
        g = np.tanh(z[3 * H :])
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        cache.append((X[t], h, c, i, f, o, g, c_new))
        h, c = h_new, c_new
        hs[t] = h
        cs[t] = c
    return hs, (cache, Wx, Wh, b)


def lstm_backward(dhs: np.ndarray, fwd_cache):
    """dhs:[T,H] grads wrt each h_t → (dX, dWx, dWh, db)."""
    cache, Wx, Wh, b = fwd_cache
    T = len(cache)
    H = dhs.shape[1]
    D = Wx.shape[0]
    dX = np.zeros((T, D))
    dWx = np.zeros_like(Wx)
    dWh = np.zeros_like(Wh)
    db = np.zeros_like(b)
    dh_next = np.zeros(H)
    dc_next = np.zeros(H)
    for t in range(T - 1, -1, -1):
        x, h_prev, c_prev, i, f, o, g, c_new = cache[t]
        dh = dhs[t] + dh_next
        tanh_c = np.tanh(c_new)
        do = dh * tanh_c
        dc = dh * o * (1 - tanh_c**2) + dc_next
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dz = np.concatenate(
            [
                di * i * (1 - i),
                df * f * (1 - f),
                do * o * (1 - o),
                dg * (1 - g**2),
            ]
        )
        dX[t] = dz @ Wx.T
        dWx += np.outer(x, dz)
        dWh += np.outer(h_prev, dz)
        db += dz
        dh_next = dz @ Wh.T
        dc_next = dc * f
    return dX, dWx, dWh, db


# ---------------------------------------------------------------------------
# CRF (start/end augmented, as in tf.contrib.crf usage by the reference)
# ---------------------------------------------------------------------------


def _logsumexp(a: np.ndarray, axis: int = -1) -> np.ndarray:
    m = a.max(axis=axis, keepdims=True)
    return (m + np.log(np.exp(a - m).sum(axis=axis, keepdims=True))).squeeze(axis)


def crf_log_likelihood(U: np.ndarray, A: np.ndarray, y: np.ndarray):
    """U:[T,C] unary, A:[C+2,C+2] transitions (row→col; index C = start,
    C+1 = end), y:[T] gold. Returns (nll, dU, dA) — gradients of the NLL.
    """
    T, C = U.shape
    start, end = C, C + 1
    # forward
    alpha = np.zeros((T, C))
    alpha[0] = U[0] + A[start, :C]
    for t in range(1, T):
        alpha[t] = U[t] + _logsumexp(alpha[t - 1][:, None] + A[:C, :C], axis=0)
    logZ = _logsumexp(alpha[T - 1] + A[:C, end], axis=0)
    # gold score
    score = U[np.arange(T), y].sum() + A[start, y[0]] + A[y[T - 1], end]
    score += A[y[:-1], y[1:]].sum() if T > 1 else 0.0
    nll = logZ - score
    # backward (beta) for marginals
    beta = np.zeros((T, C))
    beta[T - 1] = A[:C, end]
    for t in range(T - 2, -1, -1):
        beta[t] = _logsumexp(A[:C, :C] + (U[t + 1] + beta[t + 1])[None, :], axis=1)
    # unary marginals
    logp = alpha + beta - logZ
    P = np.exp(logp)  # [T, C]
    dU = P.copy()
    dU[np.arange(T), y] -= 1.0
    # transition marginals
    dA = np.zeros_like(A)
    for t in range(T - 1):
        M = (
            alpha[t][:, None]
            + A[:C, :C]
            + U[t + 1][None, :]
            + beta[t + 1][None, :]
            - logZ
        )
        dA[:C, :C] += np.exp(M)
    if T > 1:
        np.add.at(dA, (y[:-1], y[1:]), -1.0)
    dA[start, :C] += P[0]
    dA[start, y[0]] -= 1.0
    dA[:C, end] += np.exp(alpha[T - 1] + A[:C, end] - logZ)
    dA[y[T - 1], end] -= 1.0
    return nll, dU, dA


def viterbi_decode(U: np.ndarray, A: np.ndarray) -> np.ndarray:
    """Max-product decode with start/end transitions. U:[T,C] → path [T]."""
    T, C = U.shape
    start, end = C, C + 1
    delta = U[0] + A[start, :C]
    back = np.zeros((T, C), dtype=np.int64)
    for t in range(1, T):
        scores = delta[:, None] + A[:C, :C]
        back[t] = scores.argmax(axis=0)
        delta = U[t] + scores.max(axis=0)
    delta = delta + A[:C, end]
    path = np.zeros(T, dtype=np.int64)
    path[T - 1] = delta.argmax()
    for t in range(T - 1, 0, -1):
        path[t - 1] = back[t, path[t]]
    return path


def viterbi_decode_batch(U: np.ndarray, A: np.ndarray, lengths: np.ndarray):
    """Vectorized-across-batch Viterbi. U:[B,Tmax,C]; returns [B,Tmax] paths
    (valid up to each length)."""
    B, Tmax, C = U.shape
    start, end = C, C + 1
    delta = U[:, 0, :] + A[start, :C][None, :]
    back = np.zeros((B, Tmax, C), dtype=np.int64)
    deltas = np.zeros((B, Tmax, C))
    deltas[:, 0] = delta
    for t in range(1, Tmax):
        scores = delta[:, :, None] + A[:C, :C][None, :, :]  # [B, C_prev, C]
        amax = scores.argmax(axis=1)
        back[:, t] = amax
        # max gathered at the argmax — one pass over [B,C,C] instead of two
        best = np.take_along_axis(scores, amax[:, None, :], axis=1)[:, 0, :]
        delta = U[:, t, :] + best
        active = (lengths > t)[:, None]
        delta = np.where(active, delta, deltas[:, t - 1])  # freeze finished rows
        deltas[:, t] = delta
    # backtrace vectorized across the batch: each row's path starts at its
    # own L-1 (final-transition argmax), then every earlier step gathers
    # back-pointers for all rows still inside their sequence
    paths = np.zeros((B, Tmax), dtype=np.int64)
    nz = lengths > 0
    if not nz.any():
        return paths
    idx_last = np.maximum(lengths - 1, 0)
    final = deltas[np.arange(B), idx_last] + A[:C, end][None, :]
    last = final.argmax(axis=1)
    paths[np.flatnonzero(nz), idx_last[nz]] = last[nz]
    for t in range(Tmax - 1, 0, -1):
        rows = np.flatnonzero(lengths - 1 >= t)
        if rows.size == 0:
            continue
        paths[rows, t - 1] = back[rows, t, paths[rows, t]]
    return paths


# ---------------------------------------------------------------------------
# The full model
# ---------------------------------------------------------------------------


def init_params(
    n_chars: int,
    n_tokens: int,
    n_labels: int,
    char_dim: int = 8,
    char_hidden: int = 8,
    token_dim: int = 16,
    token_hidden: int = 16,
    ff_dim: int = 16,
    seed: int = 42,
) -> dict[str, np.ndarray]:
    """Glorot-ish init of every weight (matching the reference's parameter
    groups: char embeddings/LSTM, token embeddings/LSTM, feedforward, CRF)."""
    rng = np.random.RandomState(seed)

    def W(*shape):
        lim = np.sqrt(6.0 / sum(shape))
        return rng.uniform(-lim, lim, size=shape)

    tok_in = 2 * char_hidden + token_dim
    p = {
        "char_emb": W(n_chars, char_dim),
        "char_Wx_f": W(char_dim, 4 * char_hidden),
        "char_Wh_f": W(char_hidden, 4 * char_hidden),
        "char_b_f": np.zeros(4 * char_hidden),
        "char_Wx_b": W(char_dim, 4 * char_hidden),
        "char_Wh_b": W(char_hidden, 4 * char_hidden),
        "char_b_b": np.zeros(4 * char_hidden),
        "tok_emb": W(n_tokens, token_dim),
        "tok_Wx_f": W(tok_in, 4 * token_hidden),
        "tok_Wh_f": W(token_hidden, 4 * token_hidden),
        "tok_b_f": np.zeros(4 * token_hidden),
        "tok_Wx_b": W(tok_in, 4 * token_hidden),
        "tok_Wh_b": W(token_hidden, 4 * token_hidden),
        "tok_b_b": np.zeros(4 * token_hidden),
        "ff_W": W(2 * token_hidden, ff_dim),
        "ff_b": np.zeros(ff_dim),
        "out_W": W(ff_dim, n_labels),
        "out_b": np.zeros(n_labels),
        "crf_A": np.zeros((n_labels + 2, n_labels + 2)),
    }
    return p


def char_features(p: dict, char_ids: list[np.ndarray]) -> tuple[np.ndarray, list]:
    """Per-token char BiLSTM: final fwd state ++ final bwd state."""
    feats = []
    caches = []
    H = p["char_Wh_f"].shape[0]
    for ids in char_ids:
        if len(ids) == 0:
            feats.append(np.zeros(2 * H))
            caches.append(None)
            continue
        E = p["char_emb"][ids]
        hf, cf = lstm_forward(E, p["char_Wx_f"], p["char_Wh_f"], p["char_b_f"])
        hb, cb = lstm_forward(E[::-1], p["char_Wx_b"], p["char_Wh_b"], p["char_b_b"])
        feats.append(np.concatenate([hf[-1], hb[-1]]))
        caches.append((ids, E, cf, cb))
    return np.stack(feats) if feats else np.zeros((0, 2 * H)), caches


def forward_scores(
    p: dict,
    token_ids: np.ndarray,
    char_ids: list[np.ndarray],
    dropout_mask: np.ndarray | None = None,
):
    """One sequence → (U unary scores [T, C], cache for backward)."""
    CH, caches = char_features(p, char_ids)
    TE = p["tok_emb"][token_ids]
    X = np.concatenate([CH, TE], axis=1)
    if dropout_mask is not None:
        X = X * dropout_mask
    hf, cf = lstm_forward(X, p["tok_Wx_f"], p["tok_Wh_f"], p["tok_b_f"])
    hb, cb = lstm_forward(X[::-1], p["tok_Wx_b"], p["tok_Wh_b"], p["tok_b_b"])
    Hcat = np.concatenate([hf, hb[::-1]], axis=1)
    Z = np.tanh(Hcat @ p["ff_W"] + p["ff_b"])
    U = Z @ p["out_W"] + p["out_b"]
    cache = (token_ids, char_ids, caches, X, cf, cb, Hcat, Z, dropout_mask)
    return U, cache


def backward_scores(p: dict, dU: np.ndarray, cache) -> dict[str, np.ndarray]:
    """Grads of loss wrt every parameter given dLoss/dU."""
    token_ids, char_ids, ch_caches, X, cf, cb, Hcat, Z, dropout_mask = cache
    grads = {k: np.zeros_like(v) for k, v in p.items() if k != "crf_A"}
    dZ = dU @ p["out_W"].T
    grads["out_W"] = Z.T @ dU
    grads["out_b"] = dU.sum(axis=0)
    dHcat = (dZ * (1 - Z**2)) @ p["ff_W"].T
    grads["ff_W"] = Hcat.T @ (dZ * (1 - Z**2))
    grads["ff_b"] = (dZ * (1 - Z**2)).sum(axis=0)
    Ht = p["tok_Wh_f"].shape[0]
    dhf = dHcat[:, :Ht]
    dhb_rev = dHcat[:, Ht:][::-1]
    dXf, dWxf, dWhf, dbf = lstm_backward(dhf, cf)
    dXb_rev, dWxb, dWhb, dbb = lstm_backward(dhb_rev, cb)
    grads["tok_Wx_f"], grads["tok_Wh_f"], grads["tok_b_f"] = dWxf, dWhf, dbf
    grads["tok_Wx_b"], grads["tok_Wh_b"], grads["tok_b_b"] = dWxb, dWhb, dbb
    dX = dXf + dXb_rev[::-1]
    if dropout_mask is not None:
        dX = dX * dropout_mask
    Hc2 = 2 * p["char_Wh_f"].shape[0]
    dCH = dX[:, :Hc2]
    dTE = dX[:, Hc2:]
    np.add.at(grads["tok_emb"], token_ids, dTE)
    Hc = p["char_Wh_f"].shape[0]
    for ti, ch_cache in enumerate(ch_caches):
        if ch_cache is None:
            continue
        ids, E, cfc, cbc = ch_cache
        L = len(ids)
        dh_f = np.zeros((L, Hc))
        dh_f[-1] = dCH[ti, :Hc]
        dh_b = np.zeros((L, Hc))
        dh_b[-1] = dCH[ti, Hc:]
        dEf, dWxf, dWhf, dbf = lstm_backward(dh_f, cfc)
        dEb_rev, dWxb, dWhb, dbb = lstm_backward(dh_b, cbc)
        grads["char_Wx_f"] += dWxf
        grads["char_Wh_f"] += dWhf
        grads["char_b_f"] += dbf
        grads["char_Wx_b"] += dWxb
        grads["char_Wh_b"] += dWhb
        grads["char_b_b"] += dbb
        dE = dEf + dEb_rev[::-1]
        np.add.at(grads["char_emb"], ids, dE)
    return grads


def sequence_loss_and_grads(
    p: dict,
    token_ids: np.ndarray,
    char_ids: list[np.ndarray],
    y: np.ndarray,
    dropout_mask: np.ndarray | None = None,
):
    """Full BiLSTM-CRF negative log-likelihood + grads for one sequence."""
    U, cache = forward_scores(p, token_ids, char_ids, dropout_mask)
    nll, dU, dA = crf_log_likelihood(U, p["crf_A"], y)
    grads = backward_scores(p, dU, cache)
    grads["crf_A"] = dA
    return nll, grads


# ---------------------------------------------------------------------------
# Batched inference (lockstep over padded sequences)
# ---------------------------------------------------------------------------


def _lstm_forward_batch(X: np.ndarray, mask: np.ndarray, Wx, Wh, b) -> np.ndarray:
    """X:[B,T,D], mask:[B,T] → hs:[B,T,H]; finished rows keep state frozen.
    Computes in the weights' dtype (float32 at inference — half the memory
    bandwidth, which is what caps multi-core numpy throughput)."""
    B, T, D = X.shape
    H = Wh.shape[0]
    dt = Wx.dtype
    h = np.zeros((B, H), dtype=dt)
    c = np.zeros((B, H), dtype=dt)
    hs = np.zeros((B, T, H), dtype=dt)
    # input projection hoisted out of the time loop: one [B*T, D] matmul
    # instead of T small ones (the X@Wx term is the majority of the flops)
    Zx = (X.reshape(B * T, D) @ Wx).reshape(B, T, 4 * H) + b
    for t in range(T):
        z = Zx[:, t, :] + h @ Wh
        # i, f, o are contiguous along the gate axis — ONE sigmoid over
        # z[:, :3H] is bit-identical to three slice-wise calls and saves
        # two exp/clip dispatches per step (measurable at small H)
        ifo = _sigmoid(z[:, : 3 * H])
        i = ifo[:, :H]
        f = ifo[:, H : 2 * H]
        o = ifo[:, 2 * H : 3 * H]
        g = np.tanh(z[:, 3 * H :])
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        m = mask[:, t][:, None]
        h = np.where(m, h_new, h)
        c = np.where(m, c_new, c)
        hs[:, t, :] = h
    return hs


def char_features_unique(
    p: dict, unique_char_ids: list[np.ndarray]
) -> np.ndarray:
    """Char BiLSTM over a batch of (unique) tokens, padded to max length."""
    H = p["char_Wh_f"].shape[0]
    dt = p["char_emb"].dtype
    n = len(unique_char_ids)
    if n == 0:
        return np.zeros((0, 2 * H), dtype=dt)
    lens = np.array([len(c) for c in unique_char_ids], dtype=np.int64)
    Tmax = max(1, int(lens.max()))
    D = p["char_emb"].shape[1]
    Xf = np.zeros((n, Tmax, D), dtype=dt)
    Xb = np.zeros((n, Tmax, D), dtype=dt)
    mask = np.arange(Tmax)[None, :] < lens[:, None]
    for i, ids in enumerate(unique_char_ids):
        if len(ids) == 0:
            continue
        E = p["char_emb"][ids]
        Xf[i, : len(ids)] = E
        Xb[i, : len(ids)] = E[::-1]
    hf = _lstm_forward_batch(Xf, mask, p["char_Wx_f"], p["char_Wh_f"], p["char_b_f"])
    hb = _lstm_forward_batch(Xb, mask, p["char_Wx_b"], p["char_Wh_b"], p["char_b_b"])
    idx = np.maximum(lens - 1, 0)
    out = np.concatenate([hf[np.arange(n), idx], hb[np.arange(n), idx]], axis=1)
    out[lens == 0] = 0.0
    return out


def forward_scores_batch(
    p: dict,
    token_ids_padded: np.ndarray,
    char_feat_padded: np.ndarray,
    lengths: np.ndarray,
) -> np.ndarray:
    """Padded batch → unary scores [B, Tmax, C] (no dropout at inference)."""
    B, Tmax = token_ids_padded.shape
    dt = p["tok_emb"].dtype
    mask = np.arange(Tmax)[None, :] < lengths[:, None]
    TE = p["tok_emb"][token_ids_padded]
    X = np.concatenate([char_feat_padded.astype(dt, copy=False), TE], axis=2)
    hf = _lstm_forward_batch(X, mask, p["tok_Wx_f"], p["tok_Wh_f"], p["tok_b_f"])
    # backward direction: per-row reversal within each length, vectorized —
    # the index map t → L-1-t (t < L) is an involution, so it both builds
    # the reversed input and un-reverses the output
    ar = np.arange(Tmax)
    rev = np.where(
        ar[None, :] < lengths[:, None], lengths[:, None] - 1 - ar[None, :], ar[None, :]
    )
    Xb = np.take_along_axis(X, rev[:, :, None], axis=1)
    hb_rev = _lstm_forward_batch(
        Xb, mask, p["tok_Wx_b"], p["tok_Wh_b"], p["tok_b_b"]
    )
    hb = np.take_along_axis(hb_rev, rev[:, :, None], axis=1)
    Hcat = np.concatenate([hf, hb], axis=2)
    Z = np.tanh(Hcat @ p["ff_W"] + p["ff_b"])
    return Z @ p["out_W"] + p["out_b"]
