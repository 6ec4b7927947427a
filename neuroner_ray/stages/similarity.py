"""Approximate nearest-neighbor search over an embedding column.

Two paths (the brief's similarity-search requirement):
- brute-force cosine top-k: broadcast query matrix, numpy matmul per batch,
  per-batch local top-k, tiny global sort (``pipelines.queries.similarity_topk``
  is the single-query specialization)
- multi-table random-hyperplane LSH as the scale path: T independent
  tables of m planes each; a vector is indexed under one signature per
  table, and a query probes each table's buckets within Hamming radius r of
  its own signature. Multiple tables are the standard fix for
  sign-random-projection LSH's low single-table recall when true neighbors
  are weak (near-orthogonal) — recall is measured against brute force in
  tests/test_dedup_similarity.py and in the similarity_topk_lsh probe.

Candidate filtering happens inside the scan (vectorized ``isin`` per
batch): only candidate vectors are cosine-scored, and per-batch local
top-k keeps the shuffle tiny.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions.rounding import round_half_away, top_by_score_then_id
from ..runtime.combine import topk_merge, tree_combine

N_TABLES = 8
N_PLANES = 8


def _topk_cut(scored: Dataset, k: int, id_col: str) -> Dataset:
    """Global (cos DESC, id ASC) top-k over per-batch local top-k rows:
    associative tree merge instead of ``sort().limit()`` — no sort shuffle
    and no schema-less empty sort partitions (see runtime.combine)."""
    return tree_combine(scored, topk_merge(k, "cos", [id_col]))


def _planes(dim: int, n_tables: int, n_planes: int, seed: int) -> np.ndarray:
    """[n_tables, dim, n_planes] — one independent plane set per table."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_tables, dim, n_planes)


def _signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """[N, D] × [T, D, m] → int signatures [N, T]."""
    n_tables, _, n_planes = planes.shape
    out = np.zeros((len(mat), n_tables), dtype=np.int64)
    for t in range(n_tables):
        bits = (mat @ planes[t]) >= 0
        sig = np.zeros(len(mat), dtype=np.int64)
        for i in range(n_planes):
            sig |= bits[:, i].astype(np.int64) << i
        out[:, t] = sig
    return out


def build_lsh_index(
    embeddings: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
    seed: int = 42,
) -> Dataset:
    """Add a ``buckets: list<int64>`` column (one signature per table)."""

    def tag(batch: pa.Table) -> pa.Table:
        mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        planes = _planes(mat.shape[1], n_tables, n_planes, seed)
        sigs = _signatures(mat, planes)
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "buckets": pa.array(sigs.tolist(), pa.list_(pa.int64())),
            }
        )

    return embeddings.map_batches(tag, batch_format="pyarrow")


def _probe_set(sig: int, n_planes: int, radius: int) -> list[int]:
    out = {sig}
    for r in range(1, radius + 1):
        for flip in combinations(range(n_planes), r):
            s = sig
            for f in flip:
                s ^= 1 << f
            out.add(s)
    return sorted(out)


def ann_search_lsh(
    indexed: Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
    seed: int = 42,
    radius: int = 2,
) -> Dataset:
    """Top-k by cosine among the union of per-table probe candidates."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    planes = _planes(len(q), n_tables, n_planes, seed)
    qsigs = _signatures(qn[None, :], planes)[0]  # [T]
    probes = [
        np.array(_probe_set(int(qsigs[t]), n_planes, radius), dtype=np.int64)
        for t in range(n_tables)
    ]
    q_ref = ray.put(qn)
    probes_ref = ray.put(probes)

    class Score:
        def __init__(self, q_ref, probes_ref):
            self.q = ray.get(q_ref)
            self.probes = ray.get(probes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            sigs = np.asarray(batch["buckets"].to_pylist(), dtype=np.int64)  # [N, T]
            keep = np.zeros(len(sigs), dtype=bool)
            for t, probe in enumerate(self.probes):
                keep |= np.isin(sigs[:, t], probe)
            if not keep.any():
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "cos": pa.array([], pa.float64()),
                    }
                )
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)[keep]
            mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)[keep]
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            # round first, cut by the oracle's (cos DESC, id ASC) order so
            # rounded ties at the k boundary survive exactly
            cos = round_half_away((mat @ self.q) / norms)
            part = top_by_score_then_id(cos, ids, k)
            ids, cos = ids[part], cos[part]
            return pa.table(
                {
                    id_col: pa.array(ids, pa.int64()),
                    "cos": pa.array(cos, pa.float64()),
                }
            )

    scored = indexed.map_batches(
        Score,
        fn_constructor_args=(q_ref, probes_ref),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return _topk_cut(scored, k, id_col)


def brute_force_topk(
    embeddings: Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """Exact cosine top-k (baseline; the recall oracle for the LSH path)."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    class Score:
        def __init__(self, q_ref):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            # round first, cut by the oracle's (cos DESC, id ASC) order so
            # rounded ties at the k boundary survive exactly
            cos = round_half_away((mat @ self.q) / norms)
            part = top_by_score_then_id(cos, ids, k)
            ids, cos = ids[part], cos[part]
            return pa.table(
                {
                    id_col: pa.array(ids, pa.int64()),
                    "cos": pa.array(cos, pa.float64()),
                }
            )

    scored = embeddings.map_batches(
        Score, fn_constructor_args=(q_ref,), batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return _topk_cut(scored, k, id_col)


# ---------------------------------------------------------------- IVF variant
def kmeans_centroids(
    sample: np.ndarray, k: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Plain numpy k-means (deterministic seed) for the IVF coarse quantizer.
    Runs on a driver-side SAMPLE of the corpus (standard IVF training)."""
    rng = np.random.RandomState(seed)
    k = min(k, len(sample))
    cent = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
    return cent


def build_ivf_index(
    embeddings: Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """Assign each vector to its nearest centroid (``list`` partition id).

    The centroid matrix is tiny → broadcast; assignment is one vectorized
    map pass. At scale the ``list_id`` column doubles as the partition key
    for clustered storage (read only the probed partitions).
    """
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "list_id": pa.array(d.argmin(axis=1), pa.int64()),
            }
        )

    return embeddings.map_batches(assign, batch_format="pyarrow")


def ann_search_ivf(
    indexed: Dataset,
    centroids: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """Score only vectors in the ``n_probe`` centroid lists nearest the
    query (classic IVF-flat): candidate fraction ≈ n_probe / n_lists."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    cent = np.asarray(centroids, dtype=np.float64)
    # probe by distance in the RAW data space (the space centroids were fit
    # in); normalizing here would put the query in a different geometry
    d = ((q[None, :] - cent) ** 2).sum(axis=1)
    probe = np.argsort(d)[:n_probe].astype(np.int64)
    q_ref = ray.put(qn)
    probe_ref = ray.put(probe)

    class Score:
        def __init__(self, q_ref, probe_ref):
            self.q = ray.get(q_ref)
            self.probe = ray.get(probe_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lists = np.asarray(batch["list_id"].to_pylist(), dtype=np.int64)
            keep = np.isin(lists, self.probe)
            if not keep.any():
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "cos": pa.array([], pa.float64()),
                    }
                )
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)[keep]
            mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)[keep]
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            # round first, cut by the oracle's (cos DESC, id ASC) order so
            # rounded ties at the k boundary survive exactly
            cos = round_half_away((mat @ self.q) / norms)
            part = top_by_score_then_id(cos, ids, k)
            ids, cos = ids[part], cos[part]
            return pa.table(
                {
                    id_col: pa.array(ids, pa.int64()),
                    "cos": pa.array(cos, pa.float64()),
                }
            )

    scored = indexed.map_batches(
        Score,
        fn_constructor_args=(q_ref, probe_ref),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return _topk_cut(scored, k, id_col)


def brute_force_topk_many(
    embeddings: Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """Multi-query exact top-k: ONE broadcast query matrix [Q, D], one
    matmul per batch, per-batch local top-k per query, tiny global
    sort-within-query. Returns (query_idx, vec_id, cos)."""
    Q = np.asarray(queries, dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put(Qn)

    class Score:
        def __init__(self, q_ref):
            self.Q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            # round before the local top-k (oracle tie-break safety); the
            # local cut is exact because it uses the same (cos DESC, id ASC)
            # total order as the global per-query sort — no margin needed
            cos = round_half_away((mat / norms[:, None]) @ self.Q.T)  # [N, Qn]
            qi_out, id_out, cos_out = [], [], []
            for qi in range(cos.shape[1]):
                col = cos[:, qi]
                take = top_by_score_then_id(col, ids, k)
                qi_out.extend([qi] * len(take))
                id_out.extend(ids[take])
                cos_out.extend(col[take])
            return pa.table(
                {
                    "query_idx": pa.array(qi_out, pa.int64()),
                    id_col: pa.array(id_out, pa.int64()),
                    "cos": pa.array(cos_out, pa.float64()),
                }
            )

    scored = embeddings.map_batches(
        Score, fn_constructor_args=(q_ref,), batch_format="pyarrow",
        concurrency=(1, 4),
    )

    return tree_combine(
        scored, topk_merge(k, "cos", [id_col], group_cols=["query_idx"])
    )


# ------------------------------------------------------------------ k-means
# Deterministic Lloyd k-means over an embedding column, shaped so a DuckDB
# oracle can replay it exactly: centroids are initialized from the k
# smallest ids (no RNG), every updated centroid component is rounded
# half-away to KMEANS_ROUND decimals, and assignment uses distances rounded
# to the same precision with ties broken by smallest cluster index. All
# corpus-sized work streams (one map pass per iteration producing K-row
# partial sums); only K×D centroid state ever reaches the driver.
KMEANS_ROUND = 6


def _vectors_of(batch: pa.Table, vec_col: str) -> np.ndarray:
    arr = batch[vec_col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64).reshape(len(arr), -1)


def _kmeans_assign_ids(X: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Rounded-distance argmin; ties → smallest cluster index (mirrors the
    oracle's ORDER BY round(dist, 6), cluster / row_number() = 1)."""
    # (N,K) Euclidean distances via the subtraction form — numerically the
    # same shape as DuckDB's list_distance (sum of squared diffs, sqrt)
    d = np.sqrt(((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2))
    return round_half_away(d, KMEANS_ROUND).argmin(axis=1)


def kmeans_assign(
    embeddings: Dataset,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> Dataset:
    """Distributed Lloyd k-means; returns the final (id, cluster) table.

    Per iteration: ONE streaming pass emits K-row partial sums per batch
    (cluster, count, component sums); an associative tree merge reduces
    them to K rows; the driver recomputes the K×D centroid matrix (rounded)
    and re-broadcasts it via ray.put. A final pass emits assignments. No
    corpus-sized collect anywhere; per-batch work is one vectorized (N,K,D)
    distance kernel."""

    # init: embeddings of the k smallest ids — associative keep-k merge,
    # no sort shuffle (same pattern as doc_sample_per_source)
    def keep_k_smallest(t: pa.Table) -> pa.Table:
        t = t.select([id_col, vec_col])
        if t.num_rows <= k:
            return t
        order = pa.compute.sort_indices(t[id_col])
        return t.take(order[:k])

    seed = tree_combine(
        embeddings.map_batches(keep_k_smallest, batch_format="pyarrow"),
        keep_k_smallest,
    ).take_all()
    if not seed:  # empty input → typed empty assignment table
        import ray.data as rd

        cols = {
            id_col: pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
        }
        if keep_vec:
            cols[vec_col] = pa.array([], pa.list_(pa.float64()))
        return rd.from_arrow(pa.table(cols))
    seed.sort(key=lambda r: r[id_col])
    centroids = np.asarray([r[vec_col] for r in seed], dtype=np.float64)
    kk, dim = centroids.shape  # kk may be < k when the corpus is tiny

    def partial_sums(t: pa.Table, cref) -> pa.Table:
        c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        X = _vectors_of(t, vec_col)
        a = _kmeans_assign_ids(X, c)
        counts = np.bincount(a, minlength=kk)
        sums = np.zeros((kk, dim), dtype=np.float64)
        np.add.at(sums, a, X)
        return pa.table(
            {
                "cluster": pa.array(np.arange(kk), pa.int32()),
                "count": pa.array(counts, pa.int64()),
                "sums": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )

    def merge_sums(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        cl = t["cluster"].to_numpy()
        cnt = t["count"].to_numpy()
        S = _vectors_of(t, "sums")
        counts = np.zeros(kk, dtype=np.int64)
        np.add.at(counts, cl, cnt)
        sums = np.zeros((kk, dim), dtype=np.float64)
        np.add.at(sums, cl, S)
        return pa.table(
            {
                "cluster": pa.array(np.arange(kk), pa.int32()),
                "count": pa.array(counts, pa.int64()),
                "sums": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )

    for _ in range(iters):
        cref = ray.put(centroids)
        merged = tree_combine(
            embeddings.map_batches(
                lambda t, cref=cref: partial_sums(t, cref),
                batch_format="pyarrow",
            ),
            merge_sums,
        ).take_all()
        counts = np.zeros(kk, dtype=np.int64)
        sums = np.zeros((kk, dim), dtype=np.float64)
        for r in merged:
            counts[r["cluster"]] += r["count"]
            sums[r["cluster"]] += np.asarray(r["sums"])
        nonempty = counts > 0
        new = centroids.copy()  # empty cluster keeps its previous centroid
        new[nonempty] = round_half_away(
            sums[nonempty] / counts[nonempty, None], KMEANS_ROUND
        )
        centroids = new

    cref = ray.put(centroids)

    def assign(t: pa.Table, cref=cref) -> pa.Table:
        c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        a = _kmeans_assign_ids(_vectors_of(t, vec_col), c)
        cols = {
            id_col: t[id_col],
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
        }
        if keep_vec:  # callers that post-process per cluster (SemDedup)
            cols[vec_col] = t[vec_col]
        return pa.table(cols)

    return embeddings.map_batches(assign, batch_format="pyarrow")
