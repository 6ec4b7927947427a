"""J5 / O5 / A7 / S9 — entity resolution, edge aggregation, graph materialize.

- **build_nodes** (A6 tail): cluster labels + surface census → canonical
  entity nodes. One groupby on the cluster label (vocabulary-sized input).
- **resolve_triples** (J5): triple surfaces → canonical ``entity_id``. The
  canonical map is vocabulary-sized → broadcast once via ``ray.put`` and
  looked up per batch (ray_guide: broadcast small sides, never reship per
  batch, never shuffle-join a small side). A ``Dataset.join`` fallback
  exists for maps too large to broadcast.
- **aggregate_edges** (O5+A7): exact dedup of (src,dst,pred,conv,turn) and
  weight/provenance aggregation in ONE groupby shuffle on (src,dst,pred);
  provenance is a deterministically capped sample (cap recorded, not
  silent).
- **materialize_graph** (S9): partitioned Parquet, ``bucket =
  crc32(key) % B`` directories + per-bucket lineage manifests → resume unit
  (SURVEY.md §4.4).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .linker import node_key

PROVENANCE_CAP = 5
NUM_BUCKETS_DEFAULT = 16  # output partition count (shared by all writers)


def resolve_entity_id(
    mapping: dict[str, tuple[str, str]], ent_type: str, surface: str
) -> str:
    """Canonical-map lookup with the unresolved-surface policy in ONE place:
    surfaces missing from the map keep a synthetic ``ent_type:surface`` id
    (format must match ``_node_rows``' entity_id) so nothing drops silently.
    Used by every resolution site (J5, streamed finalize, driver finalize).
    """
    return mapping.get(node_key(ent_type, surface), (f"{ent_type}:{surface}", surface))[0]


def _node_rows(group: pd.DataFrame) -> pd.DataFrame:
    """One cluster → one canonical node row (NODES schema)."""
    # canonical = highest mention_count, ties → lexicographically smallest
    g = group.sort_values(["mention_count", "surface"], ascending=[False, True])
    canonical = g["surface"].iloc[0]
    ent_type = g["ent_type"].iloc[0]
    return pd.DataFrame(
        {
            "entity_id": [f"{ent_type}:{canonical}"],
            "canonical": [canonical],
            "ent_type": [ent_type],
            "surfaces": [sorted(g["surface"].tolist())],
            "mention_count": [int(g["mention_count"].sum())],
        }
    )


BROADCAST_JOIN_MAX_ROWS = 2_000_000


def build_nodes(
    labels: Dataset,
    surfaces: Dataset,
    broadcast_max_rows: int = BROADCAST_JOIN_MAX_ROWS,
) -> Dataset:
    """(node,label) × (ent_type,surface,mention_count) → canonical NODES.

    Both inputs are vocabulary-sized. Size-adaptive join: below
    ``broadcast_max_rows`` the label map is broadcast (``ray.put`` once,
    dict lookup per batch — no shuffle); above it, the native hash join.
    Then one groupby(label) builds each cluster's node row.
    """
    labels = labels.materialize()

    def _with_node(t: pa.Table) -> pa.Table:
        return t.append_column(
            "node",
            pa.array(
                [
                    node_key(e, s)
                    for e, s in zip(
                        t["ent_type"].to_pylist(), t["surface"].to_pylist()
                    )
                ],
                pa.string(),
            ),
        )

    keyed = surfaces.map_batches(_with_node, batch_format="pyarrow")
    if labels.count() <= broadcast_max_rows:
        label_map: dict[str, str] = {}
        for b in labels.iter_batches(batch_format="pyarrow"):
            label_map.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))
        ref = ray.put(label_map)

        def _attach(t: pa.Table) -> pa.Table:
            lm = ray.get(ref)
            labs = [lm.get(n, n) for n in t["node"].to_pylist()]
            return t.append_column("label", pa.array(labs, pa.string()))

        joined = keyed.map_batches(_attach, batch_format="pyarrow")
    else:
        # LEFT outer + coalesce(label, node): the broadcast path keeps
        # label-table misses as self-labeled singletons (lm.get(n, n)); an
        # inner join would silently DROP those census rows, making the two
        # size-adaptive paths disagree on incomplete label tables
        from ..runtime.partitions import join_partitions

        joined = keyed.join(
            labels,
            join_type="left_outer",
            num_partitions=join_partitions(64),
            on=("node",),
        ).map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("label"),
                "label",
                pa.compute.coalesce(t["label"], t["node"]),
            ),
            batch_format="pyarrow",
        )
    return joined.groupby("label").map_groups(_node_rows, batch_format="pandas")


def canonical_map(nodes: Dataset) -> dict[str, tuple[str, str]]:
    """node_key(ent_type|surface) → (entity_id, canonical). Driver-side dict
    intended for ``ray.put`` broadcast; vocabulary-sized by construction."""
    mapping: dict[str, tuple[str, str]] = {}
    for batch in nodes.iter_batches(batch_format="pyarrow"):
        for eid, canon, etype, surfs in zip(
            batch["entity_id"].to_pylist(),
            batch["canonical"].to_pylist(),
            batch["ent_type"].to_pylist(),
            batch["surfaces"].to_pylist(),
        ):
            for s in surfs:
                mapping[node_key(etype, s)] = (eid, canon)
    return mapping


def resolve_triples(triples: Dataset, mapping: dict[str, tuple[str, str]]) -> Dataset:
    """J5: broadcast canonical map, map-side lookup (stateless tasks).

    The map lives in the object store once (``ray.put``); each task fetches
    it zero-copy from the local store — never reshipped per batch.
    Unresolvable surfaces keep a synthetic ``ent_type:surface`` id, so no
    triple is dropped silently.
    """
    map_ref = ray.put(mapping)

    def resolve(batch: pa.Table) -> pa.Table:
        m: dict[str, tuple[str, str]] = ray.get(map_ref)
        src_ids = [
            resolve_entity_id(m, st, s)
            for s, st in zip(
                batch["subj"].to_pylist(), batch["subj_type"].to_pylist()
            )
        ]
        dst_ids = [
            resolve_entity_id(m, ot, o)
            for o, ot in zip(
                batch["obj"].to_pylist(), batch["obj_type"].to_pylist()
            )
        ]
        batch = batch.append_column("src_id", pa.array(src_ids, pa.string()))
        return batch.append_column("dst_id", pa.array(dst_ids, pa.string()))

    return triples.map_batches(resolve, batch_format="pyarrow")


def _edge_partials(batch: pa.Table) -> pa.Table:
    """Map-side combiner: per-batch (src,dst,pred) partial weight+provenance.

    O5's (conv_id, turn_idx) dedup is EXACT here: a duplicate triple from
    the same turn lives in the same row/batch by construction, so
    within-batch dedup removes it and cross-batch merging just sums.
    """
    agg: dict[tuple[str, str, str], dict] = {}
    for s, d, p, c, t in zip(
        batch["src_id"].to_pylist(),
        batch["dst_id"].to_pylist(),
        batch["pred"].to_pylist(),
        batch["conv_id"].to_pylist(),
        batch["turn_idx"].to_pylist(),
    ):
        key = (s, d, p)
        e = agg.setdefault(key, {"seen": set()})
        e["seen"].add((c, t))
    srcs, dsts, preds, ws, provs = [], [], [], [], []
    for (s, d, p), e in agg.items():
        srcs.append(s)
        dsts.append(d)
        preds.append(p)
        ws.append(len(e["seen"]))
        # smallest-(conv,turn) sample → batching-invariant deterministic cap
        provs.append(
            [
                {"conv_id": c, "turn_idx": int(t)}
                for c, t in sorted(e["seen"])[:PROVENANCE_CAP]
            ]
        )
    from ..schemas import PROVENANCE_STRUCT

    return pa.table(
        {
            "src_id": pa.array(srcs, pa.string()),
            "dst_id": pa.array(dsts, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "weight": pa.array(ws, pa.int64()),
            "provenance": pa.array(provs, pa.list_(PROVENANCE_STRUCT)),
        }
    )


def _merge_edge_partials(group: pd.DataFrame) -> pd.DataFrame:
    prov: list[dict] = []
    for p in group["provenance"]:
        prov.extend(p)
    prov = sorted(
        ({"conv_id": x["conv_id"], "turn_idx": int(x["turn_idx"])} for x in prov),
        key=lambda x: (x["conv_id"], x["turn_idx"]),
    )[:PROVENANCE_CAP]
    return pd.DataFrame(
        {
            "src_id": [group["src_id"].iloc[0]],
            "dst_id": [group["dst_id"].iloc[0]],
            "pred": [group["pred"].iloc[0]],
            "weight": [int(group["weight"].sum())],
            "provenance": [prov],
        }
    )


def tagged_to_edges(tagged: Dataset, mapping: dict[str, tuple[str, str]]) -> Dataset:
    """Fused M11+J5+O5/A7 map side: tagged turns → edge partials in ONE pass
    (extract triples, resolve against the broadcast canonical map, and
    partial-aggregate per batch), then the single (src,dst,pred) merge
    shuffle. Equivalent to triples_of → resolve_triples → aggregate_edges
    with two fewer corpus passes."""
    from .triples import extract_triples_row

    map_ref = ray.put(mapping)

    def fused(batch: pa.Table) -> pa.Table:
        m: dict[str, tuple[str, str]] = ray.get(map_ref)
        agg: dict[tuple[str, str, str], set] = {}
        for cid, ti, text, ms in zip(
            batch["conv_id"].to_pylist(),
            batch["turn_idx"].to_pylist(),
            batch["text"].to_pylist(),
            batch["mentions"].to_pylist(),
        ):
            for s, p, o, st, ot in extract_triples_row(text, ms):
                src = resolve_entity_id(m, st, s)
                dst = resolve_entity_id(m, ot, o)
                agg.setdefault((src, dst, p), set()).add((cid, ti))
        srcs, dsts, preds, ws, provs = [], [], [], [], []
        for (s, d, p), seen in agg.items():
            srcs.append(s)
            dsts.append(d)
            preds.append(p)
            ws.append(len(seen))
            provs.append(
                [
                    {"conv_id": c, "turn_idx": int(t)}
                    for c, t in sorted(seen)[:PROVENANCE_CAP]
                ]
            )
        from ..schemas import PROVENANCE_STRUCT

        return pa.table(
            {
                "src_id": pa.array(srcs, pa.string()),
                "dst_id": pa.array(dsts, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "weight": pa.array(ws, pa.int64()),
                "provenance": pa.array(provs, pa.list_(PROVENANCE_STRUCT)),
            }
        )

    partials = tagged.select_columns(
        ["conv_id", "turn_idx", "text", "mentions"]
    ).map_batches(fused, batch_format="pyarrow")
    return partials.groupby(["src_id", "dst_id", "pred"]).map_groups(
        _merge_edge_partials, batch_format="pandas"
    )


def aggregate_edges(resolved: Dataset) -> Dataset:
    """Resolved triples → EDGES (O5 + A7).

    Map-side partial aggregation first (one row per (src,dst,pred) per
    batch), so the single shuffle on (src_id, dst_id, pred) moves
    edge-count-sized partials, not raw triples."""
    slim = resolved.select_columns(
        ["src_id", "dst_id", "pred", "conv_id", "turn_idx"]
    )
    partials = slim.map_batches(_edge_partials, batch_format="pyarrow")
    return partials.groupby(["src_id", "dst_id", "pred"]).map_groups(
        _merge_edge_partials, batch_format="pandas"
    )


def add_bucket(ds: Dataset, key: str, num_buckets: int) -> Dataset:
    """Append ``bucket = crc32(key) % B`` (the partition / resume unit)."""

    def _bucketize(t: pa.Table) -> pa.Table:
        vals = [
            zlib.crc32(v.encode("utf-8")) % num_buckets
            for v in t[key].to_pylist()
        ]
        return t.append_column("bucket", pa.array(vals, pa.int32()))

    return ds.map_batches(_bucketize, batch_format="pyarrow")


def materialize_graph(
    nodes: Dataset,
    edges: Dataset,
    out_dir: str,
    num_buckets: int = NUM_BUCKETS_DEFAULT,
) -> dict[str, str]:
    """S9: write node/edge tables as bucket-partitioned Parquet."""
    paths = {"nodes": f"{out_dir}/nodes", "edges": f"{out_dir}/edges"}
    add_bucket(nodes, "entity_id", num_buckets).write_parquet(
        paths["nodes"], partition_cols=["bucket"]
    )
    add_bucket(edges, "src_id", num_buckets).write_parquet(
        paths["edges"], partition_cols=["bucket"]
    )
    return paths


# ------------------------------------------------------------- analytics
# Driver-side rank vectors are entity-vocabulary-sized (same bound as the
# canonical-map broadcasts above); the cap makes the assumption loud
# instead of an OOM.
PAGERANK_MAX_NODES = 2_000_000


def pagerank(
    edges: Dataset, damping: float = 0.85, iters: int = 10
) -> pa.Table:
    """Weighted PageRank over the canonical edge table (power method,
    fixed iteration count, deterministic).

    Distributed shape: the edge table is STREAMED once per iteration
    (``map_batches`` partials + fan-in tree combine — no sort shuffle);
    only the rank vector (entity-vocabulary-sized, ≤ PAGERANK_MAX_NODES)
    lives on the driver and is re-broadcast via ``ray.put`` each
    iteration. Parallel (src, dst, pred) edges need no pre-collapse:
    contributions are linear in edge weight, so their weights sum
    naturally. Dangling mass (nodes with no out-edges) redistributes
    uniformly, per the standard formulation.
    """
    from ..functions.rounding import round_half_away
    from ..runtime.combine import group_sum_merge, tree_combine

    g = edges.select_columns(["src_id", "dst_id", "weight"]).materialize()

    # out-weight per src + node census (both vocabulary-sized)
    owm = group_sum_merge(("id",), ("ow", "is_src"))

    def endpoints(t: pa.Table) -> pa.Table:
        n = t.num_rows
        w = t["weight"].cast(pa.float64()).to_pylist()
        return owm(
            pa.table(
                {
                    "id": pa.concat_arrays(
                        [
                            t["src_id"].combine_chunks(),
                            t["dst_id"].combine_chunks(),
                        ]
                    ),
                    "ow": pa.array(w + [0.0] * n, pa.float64()),
                    "is_src": pa.array([1] * n + [0] * n, pa.int64()),
                }
            )
        )

    census = pa.concat_tables(
        tree_combine(
            g.map_batches(endpoints, batch_format="pyarrow"), owm
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if census.num_rows > PAGERANK_MAX_NODES:
        raise ValueError(
            f"pagerank rank vector {census.num_rows} nodes exceeds "
            f"PAGERANK_MAX_NODES={PAGERANK_MAX_NODES}; shard the rank "
            "vector (e.g. bucket by id hash) before raising the cap"
        )
    node_ids = census["id"].to_pylist()
    ow = dict(zip(node_ids, census["ow"].to_numpy(zero_copy_only=False)))
    n_nodes = len(node_ids)
    rank = {v: 1.0 / n_nodes for v in node_ids}

    cmerge = group_sum_merge(("id",), ("contrib",))
    for _ in range(iters):
        # broadcast ONE per-node factor rank/out_weight (dangling nodes
        # never appear as src, so only ow>0 entries are needed)
        factor_ref = ray.put(
            pd.Series(
                {v: rank[v] / ow[v] for v in node_ids if ow[v] > 0.0}
            )
        )

        def contribs(t: pa.Table, factor_ref=factor_ref) -> pa.Table:
            f = ray.get(factor_ref)
            w = t["weight"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            src = pd.Series(t["src_id"].to_pylist())
            return cmerge(
                pa.table(
                    {
                        "id": t["dst_id"],
                        "contrib": pa.array(
                            src.map(f).to_numpy(dtype=np.float64) * w,
                            pa.float64(),
                        ),
                    }
                )
            )

        ctab = pa.concat_tables(
            tree_combine(
                g.map_batches(contribs, batch_format="pyarrow"), cmerge
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        )
        c = dict(
            zip(
                ctab["id"].to_pylist(),
                ctab["contrib"].to_numpy(zero_copy_only=False),
            )
        )
        dangling = sum(rank[v] for v in node_ids if ow[v] == 0.0)
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes
        rank = {v: base + damping * c.get(v, 0.0) for v in node_ids}

    order = sorted(node_ids)
    return pa.table(
        {
            "entity_id": pa.array(order, pa.string()),
            "rank": pa.array(
                [float(round_half_away(rank[v])) for v in order], pa.float64()
            ),
        }
    )


def degree_table(edges: Dataset) -> Dataset:
    """Per-entity degree census over the canonical edge table:
    ``out_degree`` / ``in_degree`` = number of distinct out/in edge-table
    rows (i.e. (neighbor, pred) pairs), ``w_degree`` = total incident
    weight (out + in).

    Map-side partials (each edge row contributes one src and one dst row)
    + associative tree combine — entity-vocabulary-sized output, no sort
    shuffle.
    """
    from ..runtime.combine import group_sum_merge, tree_combine

    merge = group_sum_merge(
        ("entity_id",), ("out_degree", "in_degree", "w_degree")
    )

    def partials(t: pa.Table) -> pa.Table:
        n = t.num_rows
        w = t["weight"].cast(pa.int64()).to_pylist()
        one0 = [1] * n + [0] * n
        return merge(
            pa.table(
                {
                    "entity_id": pa.concat_arrays(
                        [
                            t["src_id"].combine_chunks(),
                            t["dst_id"].combine_chunks(),
                        ]
                    ),
                    "out_degree": pa.array(one0, pa.int64()),
                    "in_degree": pa.array(one0[n:] + one0[:n], pa.int64()),
                    "w_degree": pa.array(w + w, pa.int64()),
                }
            )
        )

    return tree_combine(
        edges.select_columns(["src_id", "dst_id", "weight"]).map_batches(
            partials, batch_format="pyarrow"
        ),
        merge,
    )


def components(edges: Dataset) -> Dataset:
    """Connected components of the (undirected) canonical entity graph:
    (entity_id, component) where ``component`` is the lexicographically
    smallest entity_id in the component.

    Reuses the size-adaptive union-find / distributed min-label-propagation
    machinery from canonicalization (``canonicalize.connected_components``)
    — the edge pairs stream straight in; the node set is the
    entity-vocabulary-sized degree census.
    """
    from .canonicalize import connected_components

    edges = edges.select_columns(["src_id", "dst_id", "weight"]).materialize()
    pairs = edges.map_batches(
        lambda t: pa.table(
            {"a": t["src_id"], "b": t["dst_id"]}
        ),
        batch_format="pyarrow",
    )
    nodes = degree_table(edges).select_columns(["entity_id"]).rename_columns(
        {"entity_id": "node"}
    )
    return connected_components(pairs, nodes).rename_columns(
        {"node": "entity_id", "label": "component"}
    )


# Adjacency broadcast bound for triangle counting: the SIMPLE undirected
# edge set (distinct endpoint pairs), not the corpus — entity-vocabulary²
# bounded in this KG and far smaller in practice. The cap makes the
# assumption loud; past it, switch to the 2-round shuffle formulation
# (edge ⋈ wedge) instead of raising it.
TRIANGLE_MAX_EDGES = 5_000_000


def _simple_edges(edges: Dataset, caller: str) -> pa.Table:
    """Distinct undirected (a < b) pair set of the canonical entity graph
    (self-loops dropped, parallel edges/predicates collapsed) — the shared
    input of the broadcast-adjacency analytics (triangles, k-core,
    neighbor Jaccard). Entity-vocabulary²-bounded; the loud cap makes the
    assumption explicit — past it, switch to the 2-round shuffle
    formulation (edge ⋈ wedge) instead of raising it."""
    empty = pa.schema([("a", pa.string()), ("b", pa.string())]).empty_table()
    simple = pa.concat_tables(
        [empty]  # typed empty anchor: an all-empty stream still concats
        + list(
            edges.select_columns(["src_id", "dst_id"])
            .map_batches(
                lambda t: pa.table(
                    {
                        "a": pa.compute.min_element_wise(
                            t["src_id"], t["dst_id"]
                        ),
                        "b": pa.compute.max_element_wise(
                            t["src_id"], t["dst_id"]
                        ),
                    }
                )
                .filter(pa.compute.not_equal(t["src_id"], t["dst_id"]))
                .group_by(["a", "b"])
                .aggregate([]),
                batch_format="pyarrow",
            )
            .iter_batches(batch_size=None, batch_format="pyarrow")
        ),
        promote_options="default",
    ).group_by(["a", "b"]).aggregate([])
    if simple.num_rows > TRIANGLE_MAX_EDGES:
        raise ValueError(
            f"{caller} simple edge set {simple.num_rows} exceeds "
            f"TRIANGLE_MAX_EDGES={TRIANGLE_MAX_EDGES}; use a shuffle-based "
            "wedge join instead of the broadcast adjacency"
        )
    return simple


def triangle_count(edges: Dataset) -> pa.Table:
    """Global triangle count of the undirected simple entity graph
    (self-loops dropped, parallel edges/predicates collapsed).

    Node-iterator formulation with a total order: for each simple edge
    (u, v), u < v, count common neighbors w > v — every triangle
    a < b < c is counted exactly once, at its (a, b) edge. The adjacency
    map is broadcast once (``ray.put``); per-batch counting is
    ``np.intersect1d`` over sorted neighbor arrays.
    """
    simple = _simple_edges(edges, "triangle_count")
    adj: dict[str, list[str]] = {}
    for a, b in zip(simple["a"].to_pylist(), simple["b"].to_pylist()):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    adj_np = {k: np.sort(np.asarray(v, dtype=object)) for k, v in adj.items()}
    adj_ref = ray.put(adj_np)

    import ray.data as rd

    def count_batch(t: pa.Table, adj_ref=adj_ref) -> pa.Table:
        A = ray.get(adj_ref)
        total = 0
        for u, v in zip(t["a"].to_pylist(), t["b"].to_pylist()):
            common = np.intersect1d(A[u], A[v], assume_unique=True)
            total += int((common > v).sum())
        return pa.table({"n_triangles": pa.array([total], pa.int64())})

    parts = rd.from_arrow(simple).map_batches(
        count_batch, batch_format="pyarrow"
    )
    total = sum(
        b["n_triangles"].to_pylist()[0]
        for b in parts.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    return pa.table({"n_triangles": pa.array([total], pa.int64())})


def bfs_levels(edges: Dataset, max_levels: int = 10) -> Dataset:
    """Undirected BFS hop levels from the lexicographically smallest
    entity: (entity_id, level) for every node reachable within
    ``max_levels`` hops (the seed at level 0).

    Per level: the frontier (entity-vocabulary bounded — the same
    driver-state class as pagerank's rank vector, ≤ PAGERANK_MAX_NODES) is
    broadcast via ray.put; ONE streaming pass over the edge table filters
    frontier-incident edges with vectorized ``is_in`` kernels and emits
    their opposite endpoints; an associative distinct merge reduces them to
    a vocabulary-sized candidate set. At most ``max_levels`` passes — the
    loop exits early when the frontier empties. Oracle:
    ``kg_oracle.kg_bfs_levels_sql`` (recursive CTE, same level cap).
    """
    import pyarrow.compute as pc

    import ray.data as rd

    from ..runtime.combine import tree_combine

    edges = edges.select_columns(["src_id", "dst_id"]).materialize()

    def min_node(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.string())})
        vals = [
            v
            for v in (
                pc.min(t.column(c)).as_py() if c in t.schema.names else None
                for c in ("src_id", "dst_id", "node")
            )
            if v is not None
        ]
        return pa.table({"node": pa.array([min(vals)], pa.string())})

    seed_rows = tree_combine(
        edges.map_batches(min_node, batch_format="pyarrow"), min_node
    ).take_all()
    empty = pa.table(
        {"entity_id": pa.array([], pa.string()), "level": pa.array([], pa.int64())}
    )
    if not seed_rows:
        return rd.from_arrow(empty)
    seed = seed_rows[0]["node"]
    levels: dict[str, int] = {seed: 0}
    frontier = [seed]

    def distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return pa.table({"node": pc.unique(t["node"])})

    for lvl in range(1, max_levels + 1):
        if len(levels) > PAGERANK_MAX_NODES:
            raise ValueError(
                f"bfs_levels driver state exceeds {PAGERANK_MAX_NODES} nodes; "
                "switch to the shuffle (join-per-level) formulation"
            )
        fref = ray.put(pa.array(sorted(frontier), pa.string()))

        def neighbors(t: pa.Table, fref=fref) -> pa.Table:
            f = ray.get(fref) if isinstance(fref, ray.ObjectRef) else fref
            src, dst = t["src_id"], t["dst_id"]
            out = pa.concat_arrays(
                [
                    dst.filter(pc.is_in(src, value_set=f)).combine_chunks(),
                    src.filter(pc.is_in(dst, value_set=f)).combine_chunks(),
                ]
            )
            return pa.table({"node": pc.unique(out)})

        reached = tree_combine(
            edges.map_batches(neighbors, batch_format="pyarrow"), distinct
        ).take_all()
        frontier = [r["node"] for r in reached if r["node"] not in levels]
        if not frontier:
            break
        for n in frontier:
            levels[n] = lvl

    ids = sorted(levels)
    return rd.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(ids, pa.string()),
                "level": pa.array([levels[i] for i in ids], pa.int64()),
            }
        )
    )


KCORE_ROUNDS = 12


def kcore(edges: Dataset, k: int = 2, rounds: int = KCORE_ROUNDS) -> Dataset:
    """Fixed-round k-core peel of the undirected simple entity graph:
    repeatedly drop nodes with fewer than ``k`` distinct surviving
    neighbors, ``rounds`` times (exact k-core once converged; the oracle
    unrolls the SAME round count, so the two sides agree even on a graph
    that has not converged yet). Output: surviving (entity_id, deg) where
    ``deg`` counts distinct surviving neighbors — nodes whose last
    neighbor was peeled drop out with them.

    The simple pair set is entity-vocabulary²-bounded and collected under
    the same loud cap as triangle_count; the peel itself is integer set
    arithmetic on that bounded state (early exit when a round is stable —
    peeling is monotone, so stopping early equals running all rounds).
    """
    import ray.data as rd

    simple = _simple_edges(edges, "kcore")
    a = simple["a"].to_pylist()
    b = simple["b"].to_pylist()
    alive = set(a) | set(b)
    for _ in range(rounds):
        deg: dict[str, int] = {}
        for u, v in zip(a, b):
            if u in alive and v in alive:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
        nxt = {n for n, d in deg.items() if d >= k}
        if nxt == alive:
            break
        alive = nxt
    deg = {}
    for u, v in zip(a, b):
        if u in alive and v in alive:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
    ids = sorted(deg)
    return rd.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(ids, pa.string()),
                "deg": pa.array([deg[i] for i in ids], pa.int64()),
            }
        )
    )


def neighbor_jaccard_topk(edges: Dataset, k: int = 20) -> Dataset:
    """Top-k node pairs by neighborhood Jaccard similarity over the
    undirected simple entity graph: J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)| for
    pairs u < v sharing at least one common neighbor, rounded to 4
    decimals, cut by (jac DESC, u ASC, v ASC).

    Same distribution shape as triangle_count: adjacency broadcast once
    (vocabulary-bounded, loud cap), candidate pairs generated per node
    batch (two-hop closure), LOCAL top-k per batch with the oracle's total
    order, associative top-k merge — no all-pairs, no sort shuffle.
    """
    from ..functions.rounding import round_half_away
    from ..runtime.combine import topk_merge, tree_combine

    import ray.data as rd

    simple = _simple_edges(edges, "neighbor_jaccard_topk")
    adj: dict[str, set[str]] = {}
    for u, v in zip(simple["a"].to_pylist(), simple["b"].to_pylist()):
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    adj_ref = ray.put(adj)
    nodes = rd.from_arrow(
        pa.table({"u": pa.array(sorted(adj), pa.string())})
    )
    cut = topk_merge(k, "jac", ["u", "v"])

    def pairs_batch(t: pa.Table, adj_ref=adj_ref) -> pa.Table:
        A = ray.get(adj_ref) if isinstance(adj_ref, ray.ObjectRef) else adj_ref
        us, vs, js = [], [], []
        for u in t["u"].to_pylist():
            nu = A[u]
            cands = set()
            for w in nu:
                cands.update(x for x in A[w] if x > u)
            for v in sorted(cands):
                nv = A[v]
                inter = len(nu & nv)
                if inter:
                    us.append(u)
                    vs.append(v)
                    js.append(inter / (len(nu) + len(nv) - inter))
        return cut(
            pa.table(
                {
                    "u": pa.array(us, pa.string()),
                    "v": pa.array(vs, pa.string()),
                    "jac": pa.array(round_half_away(js, 4), pa.float64()),
                }
            )
        )

    return tree_combine(
        nodes.map_batches(pairs_batch, batch_format="pyarrow"), cut
    )


LPA_ROUNDS = 8


def label_propagation(edges: Dataset, rounds: int = LPA_ROUNDS) -> Dataset:
    """Synchronous label-propagation communities over the undirected
    simple entity graph: every node starts as its own label; each round,
    every node adopts the most frequent label among its neighbors (ties →
    lexicographically smallest), keeping its own when it has none. Exactly
    ``rounds`` rounds on BOTH sides (synchronous LPA can oscillate, so the
    fixed round count — not convergence — defines the result; the oracle
    unrolls the same rounds). Output: (entity_id, community).

    Distribution shape: labels are an entity-vocabulary-sized driver map
    broadcast per round (pagerank's state class); each round streams the
    simple pair set once, emitting (node, neighbor_label) rows reduced by
    an associative (node, label) count merge; the argmax runs on the
    vocabulary-sized count table.
    """
    import pyarrow.compute as pc  # noqa: F401 (parity with sibling ops)

    import ray.data as rd

    from ..runtime.combine import group_sum_merge, tree_combine

    simple = _simple_edges(edges, "label_propagation")
    a = simple["a"].to_pylist()
    b = simple["b"].to_pylist()
    und = rd.from_arrow(
        pa.table(
            {
                "a": pa.array(a + b, pa.string()),
                "b": pa.array(b + a, pa.string()),
            }
        )
    )
    labels = {n: n for n in set(a) | set(b)}
    if len(labels) > PAGERANK_MAX_NODES:
        raise ValueError(
            f"label_propagation driver state exceeds {PAGERANK_MAX_NODES} "
            "nodes; switch to a shuffle (join-per-round) formulation"
        )
    merge = group_sum_merge(("node", "lbl"), ("c",))
    for _ in range(rounds):
        lref = ray.put(labels)

        def nbr_labels(t: pa.Table, lref=lref) -> pa.Table:
            lm = ray.get(lref) if isinstance(lref, ray.ObjectRef) else lref
            return merge(
                pa.table(
                    {
                        "node": t["a"],
                        "lbl": pa.array(
                            [lm[x] for x in t["b"].to_pylist()], pa.string()
                        ),
                        "c": pa.array([1] * t.num_rows, pa.int64()),
                    }
                )
            )

        counts = tree_combine(
            und.map_batches(nbr_labels, batch_format="pyarrow"), merge
        ).take_all()
        best: dict[str, tuple[int, str]] = {}
        for r in counts:
            key = (-r["c"], r["lbl"])
            if r["node"] not in best or key < best[r["node"]]:
                best[r["node"]] = key
        labels = {n: best[n][1] if n in best else l for n, l in labels.items()}
    ids = sorted(labels)
    return rd.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(ids, pa.string()),
                "community": pa.array([labels[i] for i in ids], pa.string()),
            }
        )
    )
