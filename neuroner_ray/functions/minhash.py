"""Stable hashing primitives: shingles, MinHash, LSH bands, SimHash.

Used by entity linking (SURVEY.md J4 — "MinHash-blocked candidate
generation") and by the document near-dedup suite. No external sketch
library exists in this environment; MinHash is the permutation construction
with an (a*h + b) mixing family vectorized in numpy over one stable 61-bit
base hash per shingle (blake2b — process-independent, unlike Python's
``hash``). NB: the uint64 product wraps mod 2^64 BEFORE the mod-p, so this
is a deterministic mixing family, not the strict universal family mod the
Mersenne prime — adequate for near-dup estimation (estimate-vs-exact
agreement is pinned by tests and by the exact-Jaccard cluster oracles),
chosen over object-int arithmetic for vectorization.

All sketches are mergeable / order-independent, so per-batch computation in
``map_batches`` composes with groupby reduction (ray_guide: "Aggregation at
scale").
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAXH = np.uint64((1 << 61) - 1)


def stable_hash64(s: str) -> int:
    """Deterministic 61-bit hash of a string (blake2b, cross-process stable)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    ) & ((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def char_shingles(text: str, k: int = 3) -> set[str]:
    """Character k-grams (the J4 blocking unit for surface forms)."""
    if len(text) < k:
        return {text} if text else set()
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def word_shingles(tokens: list[str], k: int = 3) -> set[str]:
    """Word k-grams (the document near-dedup unit)."""
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def minhash_signature(
    shingles: set[str], num_perm: int = 32, seed: int = 42
) -> np.ndarray:
    """MinHash signature (uint64[num_perm]); empty set → all-max sentinel."""
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    a, b = _PERM_CACHE[key]
    if not shingles:
        return np.full(num_perm, _MAXH, dtype=np.uint64)
    base = np.fromiter(
        (stable_hash64(s) for s in shingles), dtype=np.uint64, count=len(shingles)
    )
    # (num_perm, n_shingles) universal hashes, min over shingles
    hashed = (a[:, None] * base[None, :] + b[:, None]) % _MAXH
    return hashed.min(axis=1)


def minhash_signatures_batch(
    shingle_sets: list[set[str]], num_perm: int = 32, seed: int = 42
) -> np.ndarray:
    """Batched ``minhash_signature`` over many documents — bit-identical
    output (pinned by tests), ~2× less Python work in the hot loop:

    - each UNIQUE shingle in the batch is blake2b-hashed once (docs share
      n-grams, so uniques ≈ 60% of totals on prose);
    - digests are decoded in one ``frombuffer`` instead of per-item
      ``int.from_bytes`` boxing;
    - the (a*h+b) mixing runs as ONE (uniques × num_perm) matrix op, and
      per-doc minima come from a single segmented ``minimum.reduceat``
      over row-major gathered rows.

    Returns uint64[len(shingle_sets), num_perm]; empty sets get the
    all-max sentinel row.
    """
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    a, b = _PERM_CACHE[key]
    out = np.full((len(shingle_sets), num_perm), _MAXH, dtype=np.uint64)

    idx_of: dict[str, int] = {}
    flat: list[int] = []
    lens = np.empty(len(shingle_sets), dtype=np.int64)
    for d, ss in enumerate(shingle_sets):
        lens[d] = len(ss)
        for s in ss:
            i = idx_of.get(s)
            if i is None:
                i = idx_of[s] = len(idx_of)
            flat.append(i)
    if not idx_of:
        return out
    b2b = hashlib.blake2b
    buf = b"".join(
        [b2b(s.encode("utf-8"), digest_size=8).digest() for s in idx_of]
    )
    base = np.frombuffer(buf, dtype="<u8") & _MAXH
    hashed = (base[:, None] * a[None, :] + b[None, :]) % _MAXH  # (U, P)
    nz_idx = np.flatnonzero(lens)
    starts = np.zeros(len(nz_idx), dtype=np.int64)
    np.cumsum(lens[nz_idx][:-1], out=starts[1:])
    flat_arr = np.asarray(flat, dtype=np.int64)
    # chunk the gather along document boundaries: the gathered matrix is
    # (#shingles-in-chunk × num_perm) — capped so a worker batch never
    # allocates more than ~32 MB here regardless of batch_size
    max_shingles = max(1 << 16, int(lens.max()))
    d0 = 0
    while d0 < len(nz_idx):
        d1 = d0 + 1
        while (
            d1 < len(nz_idx)
            and (starts[d1] - starts[d0]) + lens[nz_idx[d1]] <= max_shingles
        ):
            d1 += 1
        lo = starts[d0]
        hi = starts[d1] if d1 < len(nz_idx) else len(flat_arr)
        out[nz_idx[d0:d1]] = np.minimum.reduceat(
            hashed[flat_arr[lo:hi]], starts[d0:d1] - lo, axis=0
        )
        d0 = d1
    return out


def band_keys(
    sig: np.ndarray, bands: int, prefix: str = ""
) -> list[str]:
    """LSH banding: signature → ``bands`` bucket keys (rows = len(sig)//bands)."""
    rows = len(sig) // bands
    keys = []
    for bi in range(bands):
        chunk = sig[bi * rows : (bi + 1) * rows]
        digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
        keys.append(f"{prefix}b{bi}:{digest}")
    return keys


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def simhash64(features: set[str]) -> int:
    """64-bit SimHash over feature strings (near-dup by Hamming distance).

    Feature hash = first 8 bytes of md5, little-endian — the one 64-bit
    hash DuckDB can reproduce (``md5_number_upper``), so the fingerprint is
    SQL-oracle-checkable end to end.
    """
    if not features:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for f in features:
        h = int.from_bytes(hashlib.md5(f.encode("utf-8")).digest()[:8], "little")
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
