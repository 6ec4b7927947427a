"""Document deduplication suite (target-only; first-class per the brief).

Five near/exact-dup strategies over a (id, text) / (id, embedding) corpus,
each expressed Ray-Data-first:

- exact: content-hash groupby (see ``pipelines.queries.dedup_exact``)
- MinHash-LSH: shingle → minhash → band → bucket groupby → candidate pairs
  → signature-estimate verify → connected components
- SimHash: 64-bit simhash, 8×8-bit band blocking, Hamming-distance verify
- n-gram Jaccard: MinHash blocking (id-only band rows) + EXACT word-shingle
  Jaccard verify in a second candidate-bounded pass — no text ever enters
  the band shuffle
- embedding-cosine: random-hyperplane LSH buckets → exact cosine verify

All pair generators cap bucket size deterministically (sorted, truncated,
``block_capped`` flag emitted — never silent). Clustering reuses the
distributed union-find (``canonicalize.connected_components``); cluster id
is the minimum member id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Count as AggCount, Sum as AggSum

from ..functions.minhash import (
    band_keys,
    hamming64,
    jaccard,
    minhash_signatures_batch,
    simhash64,
    word_shingles,
)
from ..functions.rounding import round_half_away
from ..functions.tokenize import tokenize_text
from .canonicalize import connected_components
from ..runtime.hashing import hash_buckets


def _id_key(v) -> str:
    """Zero-padded id string: lexicographic order == numeric order, so the
    union-find's lexicographic-min representative IS the numeric-min id."""
    return f"{int(v):020d}"


def _ids_as_nodes(ds: Dataset, id_col: str) -> Dataset:
    return ds.map_batches(
        lambda t: pa.table(
            {"node": pa.array([_id_key(v) for v in t[id_col].to_pylist()], pa.string())}
        ),
        batch_format="pyarrow",
    )


def _cluster(pairs: Dataset, ids: Dataset, id_col: str) -> Dataset:
    """pairs(a,b as strings) + id universe → (id_col, cluster_id)."""
    labels = connected_components(pairs, _ids_as_nodes(ids, id_col))
    return labels.map_batches(
        lambda t: pa.table(
            {
                id_col: pa.array(
                    [int(v) for v in t["node"].to_pylist()], pa.int64()
                ),
                "cluster_id": pa.array(
                    [int(v) for v in t["label"].to_pylist()], pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------- MinHash-LSH
def minhash_lsh_dedup(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    shingle_k: int = 3,
    cap: int = 500,
) -> Dataset:
    """Near-dup clusters: (id_col, cluster_id); cluster_id = min member id.

    Verify = signature-estimate Jaccard (fraction of equal minhash slots),
    the standard LSH design: candidates from band collisions, estimate from
    the full signature — no second pass over text.
    """

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = [_id_key(d) for d in batch[id_col].to_pylist()]
        shingle_sets = [
            word_shingles(
                [t for t, _, _ in tokenize_text((text or "").lower())], shingle_k
            )
            for text in batch[text_col].to_pylist()
        ]
        sigs = minhash_signatures_batch(shingle_sets, num_perm)
        out_id, out_block, out_sig = [], [], []
        for key, sig in zip(ids, sigs):
            s64 = sig.astype(np.int64)
            for bk in band_keys(sig, bands):
                out_id.append(key)
                out_block.append(bk)
                out_sig.append(s64)
        # int bucket key: a string-key sort shuffle over tens of thousands
        # of tiny band blocks is the slow path (NOTES.md); hashing blocks
        # into a bounded number of int buckets moves the same rows through
        # ONE int64 sort and lets each task sweep many blocks vectorized
        buckets = hash_buckets(out_block, 64)
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "block": pa.array(out_block, pa.string()),
                "bucket": pa.array(buckets, pa.int64()),
                "sig": pa.array([s.tolist() for s in out_sig], pa.list_(pa.int64())),
            }
        )

    def pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("id").sort_values("id")
        capped = len(g) > cap
        if capped:
            g = g.head(cap)
        ids = g["id"].to_numpy()
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"a": [], "b": [], "block_capped": []})
        S = np.stack([np.asarray(s) for s in g["sig"]])  # [m, num_perm]
        est = (S[:, None, :] == S[None, :, :]).mean(axis=2)
        iu, ju = np.triu_indices(m, 1)
        keep = est[iu, ju] >= threshold
        return pd.DataFrame(
            {
                "a": ids[iu[keep]],
                "b": ids[ju[keep]],
                "block_capped": [capped] * int(keep.sum()),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # most band blocks are singletons on a mostly-unique corpus; the
        # per-block pandas calls (drop_duplicates/sort/stack) were the
        # measured hot spot (6.8 of 9.5 s at sf0.1) — one vectorized size
        # census keeps only blocks that can emit a pair
        sizes = g["block"].value_counts()
        g = g[g["block"].isin(sizes.index[sizes.ge(2)])]
        outs = [pairs_in_block(gb) for _, gb in g.groupby("block", sort=False)]
        out = pd.concat(outs, ignore_index=True) if outs else pairs_in_block(g)
        return out.astype(
            {"a": "object", "b": "object", "block_capped": "bool"}
        )

    blocked = docs.map_batches(sig_rows, batch_format="pyarrow")
    pairs = blocked.groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    return _cluster(pairs, docs, id_col)


# ------------------------------------------------------------------- SimHash
def simhash_fingerprints(
    docs: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """(id, simhash) — 64-bit fingerprint over lowercased word features."""

    def fp(batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            toks = {t for t, _, _ in tokenize_text((text or "").lower())}
            h = simhash64(toks)
            ids.append(did)
            hashes.append(h - (1 << 64) if h >= (1 << 63) else h)  # two's-complement int64
        return pa.table(
            {
                id_col: pa.array(ids),
                "simhash": pa.array(hashes, pa.int64()),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow")


def simhash_dedup(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 7,
    cap: int = 500,
) -> Dataset:
    """Near-dup clusters by SimHash: block on each of the 8 8-bit bands —
    by pigeonhole a pair with Hamming distance <= 7 over 64 bits always
    collides on at least one band — then verify exact Hamming distance."""
    fps = simhash_fingerprints(docs, id_col, text_col)

    def blocks(batch: pa.Table) -> pa.Table:
        ids, blk, sh = [], [], []
        for did, h in zip(batch[id_col].to_pylist(), batch["simhash"].to_pylist()):
            u = h & 0xFFFFFFFFFFFFFFFF
            for bi in range(8):
                chunk = (u >> (8 * bi)) & 0xFF
                ids.append(_id_key(did))
                blk.append(f"b{bi}:{chunk:02x}")
                sh.append(h)
        return pa.table(
            {
                "id": pa.array(ids, pa.string()),
                "block": pa.array(blk, pa.string()),
                "simhash": pa.array(sh, pa.int64()),
            }
        )

    def pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("id").sort_values("id")
        capped = len(g) > cap
        if capped:
            g = g.head(cap)
        ids = g["id"].tolist()
        hs = [h & 0xFFFFFFFFFFFFFFFF for h in g["simhash"]]
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if hamming64(hs[i], hs[j]) <= max_hamming:
                    a.append(ids[i])
                    b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b, "block_capped": [capped] * len(a)})

    blocked = fps.map_batches(blocks, batch_format="pyarrow")
    pairs = blocked.groupby("block").map_groups(pairs_in_block, batch_format="pandas")
    return _cluster(pairs, docs, id_col)


# ----------------------------------------------------------- n-gram Jaccard
def ngram_jaccard_pairs(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    cap: int = 500,
) -> Dataset:
    """Exact-verified near-dup pairs: (a, b, jac) with word-k-gram Jaccard
    >= threshold; candidate generation via MinHash bands.

    Scale shape (two passes, neither ships text through a shuffle):
    1. band rows carry ONLY (id, block) → per-block candidate id pairs,
       deduped across bands. Band rows are a few bytes each; the old design
       carried the full text in every band row (16 copies/doc).
    2. exact verify joins the candidate ids back to their shingle sets,
       size-adaptively: under ``NGRAM_BROADCAST_MAX_PAIRS`` candidates the
       shingle table (candidate-bounded, NOT corpus-bounded) is broadcast
       via ``ray.put`` and each pair verified map-side; above it, a fully
       distributed hash-join path (``_verify_pairs_join``) keeps every
       candidate-scale structure off the driver.
    Ids are zero-padded strings inside the blocking so lexicographic order
    == numeric order → emitted pairs always have a < b numerically.
    """

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = [_id_key(d) for d in batch[id_col].to_pylist()]
        shingle_sets = [
            word_shingles(
                [t for t, _, _ in tokenize_text((text or "").lower())], shingle_k
            )
            for text in batch[text_col].to_pylist()
        ]
        sigs = minhash_signatures_batch(shingle_sets, num_perm)
        out_id, out_block = [], []
        for key, sig in zip(ids, sigs):
            for bk in band_keys(sig, bands):
                out_id.append(key)
                out_block.append(bk)
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "block": pa.array(out_block, pa.string()),
                "bucket": pa.array(hash_buckets(out_block, 64), pa.int64()),
            }
        )

    def pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("id").sort_values("id")
        if len(g) > cap:
            g = g.head(cap)
        ids = g["id"].to_numpy()
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"a": [], "b": []})
        iu, ju = np.triu_indices(m, 1)
        return pd.DataFrame({"a": ids[iu], "b": ids[ju]})

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one task sweeps every block hashed into this bucket (NOTES.md:
        # int-bucket beats a string-key sort over tens of thousands of tiny
        # blocks); within-bucket dedup shrinks the pair-dedup shuffle.
        # Singleton blocks (the vast majority on a mostly-unique corpus)
        # are dropped by one vectorized size census before the per-block
        # pandas sweep — the measured hot spot of the minhash variant.
        sizes = g["block"].value_counts()
        g = g[g["block"].isin(sizes.index[sizes.ge(2)])]
        outs = [pairs_in_block(gb) for _, gb in g.groupby("block", sort=False)]
        out = (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame({"a": [], "b": []})
        )
        out = out.drop_duplicates(["a", "b"])
        # pair-bucket for the cross-band dedup: same pair → same bucket
        # (vectorized string concat + siphash, no per-row loop)
        if len(out):
            out["pb"] = hash_buckets(
                (out["a"].astype(str) + "|" + out["b"].astype(str)).to_numpy(),
                64,
            )
        else:
            out["pb"] = np.array([], dtype=np.int64)
        return out.astype({"a": "object", "b": "object", "pb": "int64"})

    def _norm_pairs(df: pd.DataFrame) -> pa.Table:
        # empty map_groups partitions emit schema-less pandas blocks, which
        # the hash-join operator rejects — pin the Arrow schema explicitly
        return pa.table(
            {
                "a": pa.array(df["a"] if "a" in df else [], pa.string()),
                "b": pa.array(df["b"] if "b" in df else [], pa.string()),
            }
        )

    blocked = docs.map_batches(sig_rows, batch_format="pyarrow")
    cand = (
        blocked.groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby("pb")  # same pair surfaces from several bands/buckets
        .map_groups(
            lambda g: g.drop_duplicates(["a", "b"]), batch_format="pandas"
        )
        .map_batches(_norm_pairs, batch_format="pandas")
        # map_groups' empty sort partitions emit schema-less pandas blocks
        # that BYPASS map fns (Ray skips zero-row blocks) — coalescing by
        # row count drops them so every downstream block is typed
        .repartition(target_num_rows_per_block=65536)
        .materialize()  # candidate-pair-sized (output-bounded), not corpus
    )
    n_pairs = cand.count()
    if n_pairs == 0:  # no near-dup candidates → typed empty (stable schema)
        import ray.data as rd

        return rd.from_arrow(_PAIRS_SCHEMA.empty_table())
    if n_pairs <= NGRAM_BROADCAST_MAX_PAIRS:
        return _verify_pairs_broadcast(cand, docs, id_col, text_col, shingle_k, threshold)
    return _verify_pairs_join(cand, docs, id_col, text_col, shingle_k, threshold)


_PAIRS_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("jac", pa.float64())]
)

# Candidate pairs under which the verify broadcasts a driver-built shingle
# dict (each avoided shuffle ≈ seconds of setup); above it, the fully
# distributed join path — nothing candidate-scale touches the driver.
NGRAM_BROADCAST_MAX_PAIRS = 1_000_000

# '\n' is whitespace, which the token pattern excludes from BOTH of its
# alternatives — so it can never appear inside a shingle (unlike \x1f,
# which the punctuation alternative WOULD emit as a token). Shingles are
# serialized to one string so they stay a flat string column / dict value.
_SHINGLE_SEP = "\n"


def _shingle_str(text: str | None, shingle_k: int) -> str:
    toks = [t for t, _, _ in tokenize_text((text or "").lower())]
    return _SHINGLE_SEP.join(sorted(word_shingles(toks, shingle_k)))


def _split_shingles(s) -> set:
    return set(s.split(_SHINGLE_SEP)) if isinstance(s, str) and s else set()


def _verify_pairs_broadcast(
    cand: Dataset,
    docs: Dataset,
    id_col: str,
    text_col: str,
    shingle_k: int,
    threshold: float,
) -> Dataset:
    """Small-candidate-set verify: broadcast the candidate id set, compute
    shingles for candidate docs in one map-only corpus pass, broadcast the
    (candidate-bounded) shingle dict, verify each pair map-side."""
    cand_ids: set[str] = set()
    for t in cand.iter_batches(batch_size=None, batch_format="pyarrow"):
        cand_ids.update(t["a"].to_pylist())
        cand_ids.update(t["b"].to_pylist())
    ids_ref = ray.put(frozenset(cand_ids))

    def cand_shingles(batch: pa.Table) -> pa.Table:
        members = ray.get(ids_ref)
        out_id, out_sh = [], []
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            key = _id_key(did)
            if key not in members:
                continue
            out_id.append(key)
            out_sh.append(_shingle_str(text, shingle_k))
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "sh": pa.array(out_sh, pa.string()),
            }
        )

    shingle_map: dict[str, str] = {}
    for t in docs.map_batches(cand_shingles, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        shingle_map.update(zip(t["id"].to_pylist(), t["sh"].to_pylist()))
    sh_ref = ray.put(shingle_map)

    def verify(batch: pa.Table) -> pa.Table:
        sm: dict[str, str] = ray.get(sh_ref)
        a_out, b_out, jac_out = [], [], []
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            jv = jaccard(_split_shingles(sm.get(a)), _split_shingles(sm.get(b)))
            if jv >= threshold:
                a_out.append(int(a))
                b_out.append(int(b))
                jac_out.append(float(round_half_away(jv)))
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "jac": pa.array(jac_out, pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


def _verify_pairs_join(
    cand: Dataset,
    docs: Dataset,
    id_col: str,
    text_col: str,
    shingle_k: int,
    threshold: float,
) -> Dataset:
    """Large-candidate-set verify, fully distributed — no driver-side
    collection of ids or shingles (VERDICT r2 #2):

    1. distinct candidate ids as a Dataset (pair explode + groupby dedup)
    2. hash-join the (id, text) corpus against the id set — the inner join
       IS the semi-join; corpus text moves through one shuffle, which is
       the price of exact verify without driver state
    3. explode pairs to (pair, id) sides, join to candidate shingles,
       groupby(pair) computes exact Jaccard with both sides in hand
    """
    from ..runtime.partitions import join_partitions

    def explode_ids(t: pa.Table) -> pa.Table:
        return pa.table(
            {"id": pa.array(t["a"].to_pylist() + t["b"].to_pylist(), pa.string())}
        )

    ids_ds = (
        cand.map_batches(explode_ids, batch_format="pyarrow")
        .groupby("id")
        .aggregate(AggCount())
        .select_columns(["id"])
    )

    def keyed_shingles(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": pa.array(
                    [_id_key(v) for v in batch[id_col].to_pylist()], pa.string()
                ),
                "sh": pa.array(
                    [
                        _shingle_str(text, shingle_k)
                        for text in batch[text_col].to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    sh_cand = docs.map_batches(keyed_shingles, batch_format="pyarrow").join(
        ids_ds, join_type="inner", num_partitions=join_partitions(64), on=("id",)
    )

    def explode_sides(t: pa.Table) -> pa.Table:
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        pair = [f"{x}|{y}" for x, y in zip(a, b)]
        return pa.table(
            {
                "pair": pa.array(pair + pair, pa.string()),
                "id": pa.array(a + b, pa.string()),
            }
        )

    sides = cand.map_batches(explode_sides, batch_format="pyarrow")
    # left_outer: a candidate id missing from the corpus keeps its pair row
    # (empty shingle set) instead of silently dropping the pair
    joined = sides.join(
        sh_cand, join_type="left_outer", num_partitions=join_partitions(64), on=("id",)
    )

    def pair_jac(g: pd.DataFrame) -> pd.DataFrame:
        shs = [_split_shingles(v) for v in g["sh"]]
        jv = jaccard(shs[0], shs[1]) if len(shs) == 2 else 0.0
        if jv >= threshold:
            a_s, b_s = g["pair"].iloc[0].split("|")
            return pd.DataFrame(
                {
                    "a": [int(a_s)],
                    "b": [int(b_s)],
                    "jac": [float(round_half_away(jv))],
                }
            )
        return pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "jac": pd.Series([], dtype="float64"),
            }
        )

    out = joined.groupby("pair").map_groups(pair_jac, batch_format="pandas")

    def _pin(df: pd.DataFrame) -> pa.Table:  # schema-stable over empty frames
        return pa.table(
            {
                "a": pa.array(df["a"] if "a" in df else [], pa.int64()),
                "b": pa.array(df["b"] if "b" in df else [], pa.int64()),
                "jac": pa.array(df["jac"] if "jac" in df else [], pa.float64()),
            }
        )

    return out.map_batches(_pin, batch_format="pandas")


# ------------------------------------------------------- embedding cosine
def embedding_cosine_dedup(
    embeddings: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    cap: int = 2000,
) -> Dataset:
    """Near-dup clusters by embedding cosine: random-hyperplane LSH buckets
    (vectors with cosine >= threshold almost always share a bucket for small
    n_planes), exact cosine verify inside each bucket."""

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        dim = mat.shape[1] if mat.ndim == 2 else 0
        rng = np.random.RandomState(seed)
        planes = rng.randn(dim, n_planes)
        signs = (mat @ planes) >= 0
        keys = [
            "".join("1" if s else "0" for s in row) for row in signs
        ]
        return pa.table(
            {
                "id": pa.array(
                    [_id_key(v) for v in batch[id_col].to_pylist()], pa.string()
                ),
                "block": pa.array(keys, pa.string()),
                "vec": batch[vec_col],
            }
        )

    def pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("id").sort_values("id")
        capped = len(g) > cap
        if capped:
            g = g.head(cap)
        ids = g["id"].tolist()
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in g["vec"]])
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "block_capped": []})
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        cos = mat @ mat.T
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if cos[i, j] >= threshold:
                    a.append(ids[i])
                    b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b, "block_capped": [capped] * len(a)})

    blocked = embeddings.map_batches(bucketize, batch_format="pyarrow")
    pairs = blocked.groupby("block").map_groups(pairs_in_block, batch_format="pandas")
    return _cluster(pairs, embeddings, id_col)


# ---------------------------------------------------- shingle containment
CONTAIN_BLOCK_MAX = 5_000  # docs sharing ONE shingle before the loud raise


def containment_pairs(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> Dataset:
    r"""Asymmetric near-dup detection: ORDERED pairs (a, b) with shingle
    CONTAINMENT |S(a) ∩ S(b)| / |S(a)| ≥ threshold — "a is (mostly)
    contained in b", the subset/quotation case Jaccard misses when the
    container is much larger.

    Candidate generation is PREFIX-FILTERED (the PPJoin family, exact
    recall — not the probabilistic minhash bands): if cont(a→b) ≥ θ then
    |S(a) \ S(b)| ≤ (1−θ)·|S(a)|, so among a's ⌊(1−θ)·|S(a)|⌋+1
    globally-RAREST shingles (df order, ties by shingle) at least one is
    in S(b). Doc a therefore posts only that prefix as PROBE rows while
    posting all shingles as INDEX rows; candidates are probe×index
    co-occurrences, already directional, pre-pruned by the exact-integer
    size bound 5·|S(b)| ≥ 4·|S(a)| (θ=0.8 ⇒ |S(b)| ≥ θ·|S(a)|). The
    naive all-shingle × all-shingle blocking measured 288 s at sf0.1 on
    this corpus (its 31-token vocabulary makes every shingle common —
    1.13 M candidates); the prefix filter cuts candidate mass by the
    probe/df selectivity and keeps the broadcast verify in play.

    Distribution shape — four corpus passes, nothing driver-resident:
    1. (id, shingle) post rows;
    2. shingle-bucket cogroup stamps each post with its exact global df;
    3. doc-bucket cogroup selects each doc's prefix (df, shingle)-order
       and emits probe + index rows (sizes carried as int64);
    4. shingle-block sweep emits size-filtered ordered candidates, pb-
       bucket dedup, then the size-adaptive broadcast / distributed-join
       verify scores the single a→b direction per candidate. Empty
       shingle sets are never contained (containment 0, oracle-mirrored).
    """

    def post_rows(batch: pa.Table) -> pa.Table:
        out_id, out_s = [], []
        for did, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            key = _id_key(did)
            for sng in word_shingles(
                [t for t, _, _ in tokenize_text((text or "").lower())],
                shingle_k,
            ):
                out_id.append(key)
                out_s.append(sng)
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "s": pa.array(out_s, pa.string()),
                "bucket": pa.array(hash_buckets(out_s, 64), pa.int64()),
            }
        )

    def stamp_df(g: pd.DataFrame) -> pd.DataFrame:
        # every post of a shingle lands in this group → exact df
        d = g.groupby("s")["id"].transform("size")
        return pd.DataFrame(
            {
                "id": g["id"].to_numpy(dtype=object),
                "s": g["s"].to_numpy(dtype=object),
                "df": d.to_numpy(dtype=np.int64),
                "dbucket": hash_buckets(g["id"].to_numpy(dtype=object), 64),
            }
        )

    def emit_roles(g: pd.DataFrame, threshold=threshold) -> pd.DataFrame:
        outs = []
        for did, gd in g.groupby("id", sort=False):
            gd = gd.drop_duplicates("s")
            sz = len(gd)
            p = int((1.0 - threshold) * sz) + 1
            pref = gd.sort_values(["df", "s"], kind="mergesort").head(p)
            outs.append(
                pd.DataFrame(
                    {
                        "s": np.concatenate(
                            [
                                pref["s"].to_numpy(dtype=object),
                                gd["s"].to_numpy(dtype=object),
                            ]
                        ),
                        "kind": np.concatenate(
                            [
                                np.zeros(len(pref), np.int64),  # probe
                                np.ones(sz, np.int64),  # index
                            ]
                        ),
                        "id": np.full(len(pref) + sz, did, dtype=object),
                        "sz": np.full(len(pref) + sz, sz, dtype=np.int64),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "s": pd.Series([], dtype="object"),
                    "kind": pd.Series([], dtype="int64"),
                    "id": pd.Series([], dtype="object"),
                    "sz": pd.Series([], dtype="int64"),
                }
            )
        out = pd.concat(outs, ignore_index=True)
        out.insert(
            0, "sbucket", hash_buckets(out["s"].to_numpy(dtype=object), 64)
        )
        return out

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, gb in g.groupby("s", sort=False):
            pr = gb[gb["kind"] == 0]
            ix = gb[gb["kind"] == 1]
            if pr.empty or ix.empty:
                continue
            pa_ids = pr["id"].to_numpy(dtype=object)
            pa_sz = pr["sz"].to_numpy(dtype=np.int64)
            ib_ids = ix["id"].to_numpy(dtype=object)
            ib_sz = ix["sz"].to_numpy(dtype=np.int64)
            ii, jj = np.meshgrid(
                np.arange(len(pa_ids)), np.arange(len(ib_ids)), indexing="ij"
            )
            ii, jj = ii.ravel(), jj.ravel()
            keep = (pa_ids[ii] != ib_ids[jj]) & (
                5 * ib_sz[jj] >= 4 * pa_sz[ii]
            )
            if not keep.any():
                continue
            outs.append(
                pd.DataFrame(
                    {"a": pa_ids[ii[keep]], "b": ib_ids[jj[keep]]}
                )
            )
        out = (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame({"a": [], "b": []})
        )
        out = out.drop_duplicates(["a", "b"])
        if len(out):
            out["pb"] = hash_buckets(
                (out["a"].astype(str) + "|" + out["b"].astype(str)).to_numpy(),
                64,
            )
        else:
            out["pb"] = np.array([], dtype=np.int64)
        return out.astype({"a": "object", "b": "object", "pb": "int64"})

    def _norm_pairs(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "a": pa.array(df["a"] if "a" in df else [], pa.string()),
                "b": pa.array(df["b"] if "b" in df else [], pa.string()),
            }
        )

    cand = (
        docs.map_batches(post_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(stamp_df, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(emit_roles, batch_format="pandas")
        .groupby("sbucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby("pb")
        .map_groups(
            lambda g: g.drop_duplicates(["a", "b"]), batch_format="pandas"
        )
        .map_batches(_norm_pairs, batch_format="pandas")
        .repartition(target_num_rows_per_block=65536)
        .materialize()  # candidate-pair-bounded, not corpus-bounded
    )
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "containment": pa.array([], pa.float64()),
        }
    )
    n_pairs = cand.count()
    if n_pairs == 0:
        import ray.data as rd

        return rd.from_arrow(empty)
    if n_pairs <= NGRAM_BROADCAST_MAX_PAIRS:
        return _verify_containment_broadcast(
            cand, docs, id_col, text_col, shingle_k, threshold
        )
    return _verify_containment_join(
        cand, docs, id_col, text_col, shingle_k, threshold
    )


def _containment_rows(
    sa: set, sb: set, a: str, b: str, threshold: float
) -> list[tuple[int, int, float]]:
    """Score for one ORDERED candidate (a = contained side): at most one
    output row (a, b, containment). The prefix-filtered generation emits
    each qualifying direction as its own candidate, so the verify never
    needs the reverse direction."""
    if not sa:
        return []
    ca = len(sa & sb) / len(sa)
    if ca >= threshold:
        return [(int(a), int(b), float(round_half_away(ca)))]
    return []


def _verify_containment_broadcast(
    cand: Dataset,
    docs: Dataset,
    id_col: str,
    text_col: str,
    shingle_k: int,
    threshold: float,
) -> Dataset:
    """Small-candidate-set verify (same staging as
    ``_verify_pairs_broadcast``): candidate-bounded shingle dict broadcast
    once, both containment directions scored map-side."""
    cand_ids: set[str] = set()
    for t in cand.iter_batches(batch_size=None, batch_format="pyarrow"):
        cand_ids.update(t["a"].to_pylist())
        cand_ids.update(t["b"].to_pylist())
    ids_ref = ray.put(frozenset(cand_ids))

    def cand_shingles(batch: pa.Table) -> pa.Table:
        members = ray.get(ids_ref)
        out_id, out_sh = [], []
        for did, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            key = _id_key(did)
            if key not in members:
                continue
            out_id.append(key)
            out_sh.append(_shingle_str(text, shingle_k))
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "sh": pa.array(out_sh, pa.string()),
            }
        )

    shingle_map: dict[str, str] = {}
    for t in docs.map_batches(
        cand_shingles, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        shingle_map.update(zip(t["id"].to_pylist(), t["sh"].to_pylist()))
    sh_ref = ray.put(shingle_map)

    def verify(batch: pa.Table) -> pa.Table:
        sm: dict[str, str] = ray.get(sh_ref)
        a_out, b_out, c_out = [], [], []
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            for ca, cb, cv in _containment_rows(
                _split_shingles(sm.get(a)),
                _split_shingles(sm.get(b)),
                a,
                b,
                threshold,
            ):
                a_out.append(ca)
                b_out.append(cb)
                c_out.append(cv)
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "containment": pa.array(c_out, pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


def _verify_containment_join(
    cand: Dataset,
    docs: Dataset,
    id_col: str,
    text_col: str,
    shingle_k: int,
    threshold: float,
) -> Dataset:
    """Large-candidate-set verify, fully distributed (the
    ``_verify_pairs_join`` staging with a directional scorer)."""
    from ..runtime.partitions import join_partitions

    def explode_ids(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": pa.array(
                    t["a"].to_pylist() + t["b"].to_pylist(), pa.string()
                )
            }
        )

    ids_ds = (
        cand.map_batches(explode_ids, batch_format="pyarrow")
        .groupby("id")
        .aggregate(AggCount())
        .select_columns(["id"])
    )

    def keyed_shingles(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": pa.array(
                    [_id_key(v) for v in batch[id_col].to_pylist()],
                    pa.string(),
                ),
                "sh": pa.array(
                    [
                        _shingle_str(text, shingle_k)
                        for text in batch[text_col].to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    sh_cand = docs.map_batches(keyed_shingles, batch_format="pyarrow").join(
        ids_ds, join_type="inner",
        num_partitions=join_partitions(64), on=("id",),
    )

    def explode_sides(t: pa.Table) -> pa.Table:
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        pair = [f"{x}|{y}" for x, y in zip(a, b)]
        return pa.table(
            {
                "pair": pa.array(pair + pair, pa.string()),
                "id": pa.array(a + b, pa.string()),
                "side": pa.array(
                    [0] * len(a) + [1] * len(b), pa.int64()
                ),
            }
        )

    sides = cand.map_batches(explode_sides, batch_format="pyarrow")
    joined = sides.join(
        sh_cand, join_type="left_outer",
        num_partitions=join_partitions(64), on=("id",),
    )

    def pair_cont(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("side")
        shs = [_split_shingles(v) for v in g["sh"]]
        rows = []
        if len(shs) == 2:
            a_s, b_s = g["pair"].iloc[0].split("|")
            rows = _containment_rows(shs[0], shs[1], a_s, b_s, threshold)
        return pd.DataFrame(
            {
                "a": pd.Series([r[0] for r in rows], dtype="int64"),
                "b": pd.Series([r[1] for r in rows], dtype="int64"),
                "containment": pd.Series(
                    [r[2] for r in rows], dtype="float64"
                ),
            }
        )

    out = joined.groupby("pair").map_groups(pair_cont, batch_format="pandas")

    def _pin(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "a": pa.array(df["a"] if "a" in df else [], pa.int64()),
                "b": pa.array(df["b"] if "b" in df else [], pa.int64()),
                "containment": pa.array(
                    df["containment"] if "containment" in df else [],
                    pa.float64(),
                ),
            }
        )

    return out.map_batches(_pin, batch_format="pandas")


# --------------------------------------------------- sketch-accuracy audit
def minhash_estimate_audit(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    cap: int = 500,
) -> "Dataset | pa.Table":
    """SKETCH-ACCURACY AUDIT for the MinHash family: for every LSH band
    candidate pair, the signature-estimated Jaccard (fraction of equal
    minhash slots — what ``minhash_lsh_dedup`` thresholds on) next to the
    EXACT word-shingle Jaccard, plus the absolute error. The operational
    question it answers before trusting a sketch-only dedup at scale: how
    far off is the estimate on the pairs the bands actually surface?

    Output: (a, b, est, jac, err), a < b numerically, floats at 6 dp.
    ``est`` = nmatch/num_perm is a dyadic rational (num_perm = 2^6), so
    6 dp is EXACT — no float-parity risk on the estimate side.

    Scale shape mirrors ``ngram_jaccard_pairs``: band rows carry only
    (id, block); the integer slot-match count rides the candidate pair
    rows (one int — never the signatures) into the exact verify, which is
    size-adaptive (broadcast shingle dict under
    ``NGRAM_BROADCAST_MAX_PAIRS``, distributed hash-join above it).

    RETURN CONTRACT (union type, deliberate — ADVICE r4): a ``Dataset``
    of audit rows normally, but the typed ``pa.Table``
    ``_AUDIT_SCHEMA.empty_table()`` when NO candidate pair exists — an
    empty Dataset built via ``rd.from_arrow(typed_empty)`` LOSES its
    schema at ``to_pandas()`` (NOTES.md empty-stream rule), which would
    break the driver's schema compare on a legitimately-empty result.
    A driver-side collect instead would break the scale shape (the
    audit is candidate-pair-sized, not driver-sized). Callers must
    branch on ``isinstance(result, pa.Table)`` — both registry
    consumers (``queries.doc_minhash_estimate_audit``,
    ``queries.corpus_dedup_threshold_curve``) do.
    """

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = [_id_key(d) for d in batch[id_col].to_pylist()]
        shingle_sets = [
            word_shingles(
                [t for t, _, _ in tokenize_text((text or "").lower())], shingle_k
            )
            for text in batch[text_col].to_pylist()
        ]
        sigs = minhash_signatures_batch(shingle_sets, num_perm)
        out_id, out_block, out_sig = [], [], []
        for key, sig in zip(ids, sigs):
            s64 = sig.astype(np.int64)
            for bk in band_keys(sig, bands):
                out_id.append(key)
                out_block.append(bk)
                out_sig.append(s64)
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "block": pa.array(out_block, pa.string()),
                "bucket": pa.array(hash_buckets(out_block, 64), pa.int64()),
                "sig": pa.array(
                    [s.tolist() for s in out_sig], pa.list_(pa.int64())
                ),
            }
        )

    def pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("id").sort_values("id")
        if len(g) > cap:
            g = g.head(cap)
        ids = g["id"].to_numpy()
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"a": [], "b": [], "nmatch": []})
        S = np.stack([np.asarray(s) for s in g["sig"]])  # [m, num_perm]
        nm = (S[:, None, :] == S[None, :, :]).sum(axis=2)
        iu, ju = np.triu_indices(m, 1)
        return pd.DataFrame(
            {"a": ids[iu], "b": ids[ju], "nmatch": nm[iu, ju].astype(np.int64)}
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g["block"].value_counts()
        g = g[g["block"].isin(sizes.index[sizes.ge(2)])]
        outs = [pairs_in_block(gb) for _, gb in g.groupby("block", sort=False)]
        out = (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame({"a": [], "b": [], "nmatch": []})
        )
        # nmatch is a pure function of the full signatures, so duplicates
        # from several bands carry the SAME count — plain (a, b) dedup
        out = out.drop_duplicates(["a", "b"])
        if len(out):
            out["pb"] = hash_buckets(
                (out["a"].astype(str) + "|" + out["b"].astype(str)).to_numpy(),
                64,
            )
        else:
            out["pb"] = np.array([], dtype=np.int64)
        return out.astype(
            {"a": "object", "b": "object", "nmatch": "int64", "pb": "int64"}
        )

    def _norm_cand(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "a": pa.array(df["a"] if "a" in df else [], pa.string()),
                "b": pa.array(df["b"] if "b" in df else [], pa.string()),
                "nmatch": pa.array(
                    df["nmatch"] if "nmatch" in df else [], pa.int64()
                ),
            }
        )

    blocked = docs.map_batches(sig_rows, batch_format="pyarrow")
    cand = (
        blocked.groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby("pb")  # same pair surfaces from several bands/buckets
        .map_groups(
            lambda g: g.drop_duplicates(["a", "b"]), batch_format="pandas"
        )
        .map_batches(_norm_cand, batch_format="pandas")
        .repartition(target_num_rows_per_block=65536)
        .materialize()  # candidate-pair-sized (output-bounded), not corpus
    )
    if cand.count() == 0:
        # NOTES.md empty-stream rule: rd.from_arrow(typed_empty) LOSES its
        # schema at to_pandas(); a legitimately-empty result must return
        # the typed pa.Table itself (the driver contract accepts it)
        return _AUDIT_SCHEMA.empty_table()
    if cand.count() <= NGRAM_BROADCAST_MAX_PAIRS:
        return _audit_verify_broadcast(cand, docs, id_col, text_col, shingle_k, num_perm)
    return _audit_verify_join(cand, docs, id_col, text_col, shingle_k, num_perm)


_AUDIT_SCHEMA = pa.schema(
    [
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("est", pa.float64()),
        ("jac", pa.float64()),
        ("err", pa.float64()),
    ]
)


def _audit_row_table(
    a: list[int], b: list[int], nmatch: list[int], jv: list[float], num_perm: int
) -> pa.Table:
    est = np.asarray(nmatch, dtype=np.float64) / float(num_perm)
    jac6 = round_half_away(np.asarray(jv, dtype=np.float64), 6)
    err = round_half_away(np.abs(est - jac6), 6)
    return pa.table(
        {
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            # est is k/2^6: exact at 6 dp by construction
            "est": pa.array(round_half_away(est, 6), pa.float64()),
            "jac": pa.array(jac6, pa.float64()),
            "err": pa.array(err, pa.float64()),
        },
        schema=_AUDIT_SCHEMA,
    )


def _audit_verify_broadcast(
    cand: Dataset,
    docs: Dataset,
    id_col: str,
    text_col: str,
    shingle_k: int,
    num_perm: int,
) -> Dataset:
    """Candidate-bounded broadcast verify (the ``_verify_pairs_broadcast``
    shape, carrying the slot-match count through to the output)."""
    cand_ids: set[str] = set()
    for t in cand.iter_batches(batch_size=None, batch_format="pyarrow"):
        cand_ids.update(t["a"].to_pylist())
        cand_ids.update(t["b"].to_pylist())
    ids_ref = ray.put(frozenset(cand_ids))

    def cand_shingles(batch: pa.Table) -> pa.Table:
        members = ray.get(ids_ref)
        out_id, out_sh = [], []
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            key = _id_key(did)
            if key not in members:
                continue
            out_id.append(key)
            out_sh.append(_shingle_str(text, shingle_k))
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "sh": pa.array(out_sh, pa.string()),
            }
        )

    shingle_map: dict[str, str] = {}
    for t in docs.map_batches(cand_shingles, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        shingle_map.update(zip(t["id"].to_pylist(), t["sh"].to_pylist()))
    sh_ref = ray.put(shingle_map)

    def verify(batch: pa.Table) -> pa.Table:
        sm: dict[str, str] = ray.get(sh_ref)
        a_out, b_out, nm_out, jv_out = [], [], [], []
        for a, b, nm in zip(
            batch["a"].to_pylist(),
            batch["b"].to_pylist(),
            batch["nmatch"].to_pylist(),
        ):
            jv = jaccard(_split_shingles(sm.get(a)), _split_shingles(sm.get(b)))
            a_out.append(int(a))
            b_out.append(int(b))
            nm_out.append(int(nm))
            jv_out.append(jv)
        return _audit_row_table(a_out, b_out, nm_out, jv_out, num_perm)

    return cand.map_batches(verify, batch_format="pyarrow")


def _audit_verify_join(
    cand: Dataset,
    docs: Dataset,
    id_col: str,
    text_col: str,
    shingle_k: int,
    num_perm: int,
) -> Dataset:
    """Distributed verify above the broadcast cap — the
    ``_verify_pairs_join`` shape; the integer slot-match count rides
    inside the pair key so no extra join column is needed."""
    from ..runtime.partitions import join_partitions

    def explode_ids(t: pa.Table) -> pa.Table:
        return pa.table(
            {"id": pa.array(t["a"].to_pylist() + t["b"].to_pylist(), pa.string())}
        )

    ids_ds = (
        cand.map_batches(explode_ids, batch_format="pyarrow")
        .groupby("id")
        .aggregate(AggCount())
        .select_columns(["id"])
    )

    def keyed_shingles(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": pa.array(
                    [_id_key(v) for v in batch[id_col].to_pylist()], pa.string()
                ),
                "sh": pa.array(
                    [
                        _shingle_str(text, shingle_k)
                        for text in batch[text_col].to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    sh_cand = docs.map_batches(keyed_shingles, batch_format="pyarrow").join(
        ids_ds, join_type="inner", num_partitions=join_partitions(64), on=("id",)
    )

    def explode_sides(t: pa.Table) -> pa.Table:
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        nm = t["nmatch"].to_pylist()
        pair = [f"{x}|{y}|{k}" for x, y, k in zip(a, b, nm)]
        return pa.table(
            {
                "pair": pa.array(pair + pair, pa.string()),
                "id": pa.array(a + b, pa.string()),
            }
        )

    sides = cand.map_batches(explode_sides, batch_format="pyarrow")
    joined = sides.join(
        sh_cand, join_type="left_outer", num_partitions=join_partitions(64), on=("id",)
    )

    def pair_audit(g: pd.DataFrame) -> pd.DataFrame:
        shs = [_split_shingles(v) for v in g["sh"]]
        jv = jaccard(shs[0], shs[1]) if len(shs) == 2 else 0.0
        a_s, b_s, nm_s = g["pair"].iloc[0].split("|")
        t = _audit_row_table([int(a_s)], [int(b_s)], [int(nm_s)], [jv], num_perm)
        return t.to_pandas()

    out = joined.groupby("pair").map_groups(pair_audit, batch_format="pandas")

    def _pin(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "a": pa.array(df["a"] if "a" in df else [], pa.int64()),
                "b": pa.array(df["b"] if "b" in df else [], pa.int64()),
                "est": pa.array(df["est"] if "est" in df else [], pa.float64()),
                "jac": pa.array(df["jac"] if "jac" in df else [], pa.float64()),
                "err": pa.array(df["err"] if "err" in df else [], pa.float64()),
            }
        )

    return out.map_batches(_pin, batch_format="pandas")


# -------------------------------------------------- blocking-quality audit
# Per pair-key group, (|lo side| × |hi side|) exact comparisons; at the
# default 8 chunks a group holds (S/8)² pairs — raise the chunk count or
# pass sample_mod > 1 before lifting this cap.
BLOCKING_AUDIT_GROUP_PAIRS_MAX = 4_000_000


def blocking_quality(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    cap: int = 500,
    n_chunks: int = 8,
    sample_mod: int = 1,
) -> pa.Table:
    """ER BLOCKING-QUALITY audit: the two standard metrics that say
    whether a blocking scheme can be trusted before running a
    sketch-only dedup at scale — PAIR COMPLETENESS (what fraction of the
    TRUE near-dup pairs, exact word-shingle Jaccard ≥ threshold, does
    the MinHash band blocking surface?) and REDUCTION RATIO (what
    fraction of the all-pairs comparison space does it prune?).

    Ground truth needs exact all-pairs Jaccard, so the audit runs on a
    deterministic id sample (``id % sample_mod == 0``; default = the
    whole corpus at test scales — at 100-TB pass a sample_mod that
    brings S down to audit size). The all-pairs pass is the chunk-pair
    cogroup (the mutual-NN shape): every sampled doc's shingle set
    replicates to its ``n_chunks`` chunk-pair keys, one task per pair
    key sweeps its (S/B)²-bounded comparison block (LOUD cap
    ``BLOCKING_AUDIT_GROUP_PAIRS_MAX``), so no all-pairs structure ever
    materializes in one place. Candidates reuse the band-blocking
    shapes; the intersection is one (a, b) cogroup with 0/1 tags and
    the summary is a fixed-width single row of exact ints + two 6-dp
    divisions."""
    if sample_mod > 1:
        def keep_sample(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.filter(pa.array(ids % sample_mod == 0, pa.bool_()))

        docs = docs.map_batches(keep_sample, batch_format="pyarrow")

    schema = pa.schema(
        [
            ("n_docs", pa.int64()),
            ("n_all_pairs", pa.int64()),
            ("n_true", pa.int64()),
            ("n_cand", pa.int64()),
            ("n_cand_true", pa.int64()),
            ("pair_completeness", pa.float64()),
            ("reduction_ratio", pa.float64()),
        ]
    )
    n_docs = docs.count()
    if n_docs == 0:
        return schema.empty_table()

    # ---- TRUE pairs: exact all-pairs Jaccard via chunk-pair cogroup
    def shingle_rows(t: pa.Table, B=n_chunks) -> pa.Table:
        ids, shs = [], []
        for did, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            ids.append(_id_key(did))
            shs.append(_shingle_str(text, shingle_k))
        chunk = np.asarray(
            [int(i) % B for i in t[id_col].to_pylist()], dtype=np.int64
        )
        pk, side, idx = [], [], []
        for c in range(B):
            rows = np.nonzero(chunk == c)[0]
            if len(rows) == 0:
                continue
            for d_ in range(B):
                lo, hi = min(c, d_), max(c, d_)
                pk.append(np.full(len(rows), lo * B + hi, np.int64))
                side.append(np.full(len(rows), c, np.int64))
                idx.append(rows)
        if not idx:
            return pa.table(
                {
                    "pk": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int64()),
                    "id": pa.array([], pa.string()),
                    "sh": pa.array([], pa.string()),
                }
            )
        idx = np.concatenate(idx)
        return pa.table(
            {
                "pk": pa.array(np.concatenate(pk), pa.int64()),
                "side": pa.array(np.concatenate(side), pa.int64()),
                "id": pa.array([ids[i] for i in idx], pa.string()),
                "sh": pa.array([shs[i] for i in idx], pa.string()),
            }
        )

    def true_pairs_in_group(g: pd.DataFrame, B=n_chunks) -> pd.DataFrame:
        g = g.drop_duplicates("id")
        pk = int(g["pk"].iloc[0])
        lo, hi = pk // B, pk % B
        if lo == hi:
            left = right = g
            n_pairs = len(g) * (len(g) - 1) // 2
        else:
            left = g[g["side"] == lo]
            right = g[g["side"] == hi]
            n_pairs = len(left) * len(right)
        if n_pairs > BLOCKING_AUDIT_GROUP_PAIRS_MAX:
            raise ValueError(
                f"blocking_quality: chunk-pair group {pk} holds {n_pairs} "
                f"comparisons > BLOCKING_AUDIT_GROUP_PAIRS_MAX "
                f"({BLOCKING_AUDIT_GROUP_PAIRS_MAX}); raise n_chunks or "
                f"pass a larger sample_mod"
            )
        a_out, b_out = [], []
        if lo == hi:
            ids = left["id"].tolist()
            sets = [_split_shingles(v) for v in left["sh"]]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if jaccard(sets[i], sets[j]) >= threshold:
                        x, y = sorted((ids[i], ids[j]))
                        a_out.append(x)
                        b_out.append(y)
        else:
            lids = left["id"].tolist()
            lsets = [_split_shingles(v) for v in left["sh"]]
            rids = right["id"].tolist()
            rsets = [_split_shingles(v) for v in right["sh"]]
            for i in range(len(lids)):
                for j in range(len(rids)):
                    if jaccard(lsets[i], rsets[j]) >= threshold:
                        x, y = sorted((lids[i], rids[j]))
                        a_out.append(x)
                        b_out.append(y)
        return pd.DataFrame({"a": a_out, "b": b_out}).astype(
            {"a": "object", "b": "object"}
        )

    trues = (
        docs.map_batches(shingle_rows, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(true_pairs_in_group, batch_format="pandas")
    )

    # ---- CANDIDATE pairs: the band-blocking shape (ids only)
    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = [_id_key(d) for d in batch[id_col].to_pylist()]
        shingle_sets = [
            word_shingles(
                [t for t, _, _ in tokenize_text((text or "").lower())], shingle_k
            )
            for text in batch[text_col].to_pylist()
        ]
        sigs = minhash_signatures_batch(shingle_sets, num_perm)
        out_id, out_block = [], []
        for key, sig in zip(ids, sigs):
            for bk in band_keys(sig, bands):
                out_id.append(key)
                out_block.append(bk)
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "block": pa.array(out_block, pa.string()),
                "bucket": pa.array(hash_buckets(out_block, 64), pa.int64()),
            }
        )

    def cand_in_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("id").sort_values("id")
        if len(g) > cap:
            g = g.head(cap)
        ids = g["id"].to_numpy()
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"a": [], "b": []})
        iu, ju = np.triu_indices(m, 1)
        return pd.DataFrame({"a": ids[iu], "b": ids[ju]})

    def cand_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g["block"].value_counts()
        g = g[g["block"].isin(sizes.index[sizes.ge(2)])]
        outs = [cand_in_block(gb) for _, gb in g.groupby("block", sort=False)]
        out = (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame({"a": [], "b": []})
        )
        out = out.drop_duplicates(["a", "b"])
        return out.astype({"a": "object", "b": "object"})

    cands = (
        docs.map_batches(sig_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cand_in_bucket, batch_format="pandas")
    )

    # ---- metrics: tag, union, (a, b) cogroup, fixed-width partial sums
    def tag(flag: str):
        def fn(df: pd.DataFrame) -> pa.Table:
            return pa.table(
                {
                    "a": pa.array(df["a"] if "a" in df else [], pa.string()),
                    "b": pa.array(df["b"] if "b" in df else [], pa.string()),
                    "t": pa.array(
                        np.full(len(df), 1 if flag == "t" else 0, np.int64)
                    ),
                    "c": pa.array(
                        np.full(len(df), 1 if flag == "c" else 0, np.int64)
                    ),
                }
            )

        return fn

    tagged = trues.map_batches(tag("t"), batch_format="pandas").union(
        cands.map_batches(tag("c"), batch_format="pandas")
    )
    per_pair = tagged.groupby(["a", "b"]).aggregate(
        AggSum("t", alias_name="t"), AggSum("c", alias_name="c")
    )

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "nt": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                    "nb": pa.array([], pa.int64()),
                }
            )
        # clamp to presence flags: candidates surface once PER BAND, so
        # the per-pair sums arrive > 1 — the (a, b) cogroup is the dedup
        tt = (
            t["t"].to_numpy(zero_copy_only=False).astype(np.int64) > 0
        ).astype(np.int64)
        cc = (
            t["c"].to_numpy(zero_copy_only=False).astype(np.int64) > 0
        ).astype(np.int64)
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "nt": pa.array([int(tt.sum())], pa.int64()),
                "nc": pa.array([int(cc.sum())], pa.int64()),
                "nb": pa.array([int((tt * cc).sum())], pa.int64()),
            }
        )

    from ..runtime.combine import group_sum_merge as _gsm, tree_combine as _tc

    cen = pa.concat_tables(
        [
            pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "nt": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                    "nb": pa.array([], pa.int64()),
                }
            )
        ]
        + list(
            _tc(
                per_pair.map_batches(count_partial, batch_format="pyarrow"),
                _gsm(("k",), ("nt", "nc", "nb")),
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        ),
        promote_options="default",
    ).to_pandas()
    n_true = int(cen["nt"].sum()) if not cen.empty else 0
    n_cand = int(cen["nc"].sum()) if not cen.empty else 0
    n_both = int(cen["nb"].sum()) if not cen.empty else 0
    n_all = n_docs * (n_docs - 1) // 2
    pc = 1.0 if n_true == 0 else n_both / float(n_true)
    rr = 1.0 if n_docs < 2 else 1.0 - n_cand / float(n_all)
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_all_pairs": pa.array([n_all], pa.int64()),
            "n_true": pa.array([n_true], pa.int64()),
            "n_cand": pa.array([n_cand], pa.int64()),
            "n_cand_true": pa.array([n_both], pa.int64()),
            "pair_completeness": pa.array(
                round_half_away(np.array([pc]), 6), pa.float64()
            ),
            "reduction_ratio": pa.array(
                round_half_away(np.array([rr]), 6), pa.float64()
            ),
        },
        schema=schema,
    )
