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

import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .linker import node_key

PROVENANCE_CAP = 5


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
        joined = keyed.join(
            labels, join_type="inner", num_partitions=64, on=("node",)
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


class TripleResolver:
    """J5 as an actor-pool stage: broadcast canonical map, map-side lookup.

    ``map_ref`` is a ``ray.ObjectRef`` to the dict — fetched once per actor
    in ``__init__`` (zero-copy from the local object store), NOT per batch.
    Unresolvable surfaces keep their surface form with a synthetic id
    (``ent_type:surface``), so no triple is dropped silently.
    """

    def __init__(self, map_ref):
        self.mapping: dict[str, tuple[str, str]] = ray.get(map_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src_ids, dst_ids = [], []
        for s, st in zip(batch["subj"].to_pylist(), batch["subj_type"].to_pylist()):
            src_ids.append(self.mapping.get(node_key(st, s), (f"{st}:{s}", s))[0])
        for o, ot in zip(batch["obj"].to_pylist(), batch["obj_type"].to_pylist()):
            dst_ids.append(self.mapping.get(node_key(ot, o), (f"{ot}:{o}", o))[0])
        batch = batch.append_column("src_id", pa.array(src_ids, pa.string()))
        return batch.append_column("dst_id", pa.array(dst_ids, pa.string()))


def resolve_triples(triples: Dataset, mapping: dict[str, tuple[str, str]]) -> Dataset:
    map_ref = ray.put(mapping)
    return triples.map_batches(
        TripleResolver,
        fn_constructor_args=(map_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def _edge_rows(group: pd.DataFrame) -> pd.DataFrame:
    """One (src,dst,pred) group → O5 dedup + A7 weight/provenance."""
    dedup = group.drop_duplicates(["conv_id", "turn_idx"]).sort_values(
        ["conv_id", "turn_idx"]
    )
    prov = [
        {"conv_id": c, "turn_idx": int(t)}
        for c, t in zip(
            dedup["conv_id"].head(PROVENANCE_CAP), dedup["turn_idx"].head(PROVENANCE_CAP)
        )
    ]
    return pd.DataFrame(
        {
            "src_id": [group["src_id"].iloc[0]],
            "dst_id": [group["dst_id"].iloc[0]],
            "pred": [group["pred"].iloc[0]],
            "weight": [len(dedup)],
            "provenance": [prov],
        }
    )


def aggregate_edges(resolved: Dataset) -> Dataset:
    """Resolved triples → EDGES. Single shuffle on (src_id, dst_id, pred)."""
    slim = resolved.select_columns(
        ["src_id", "dst_id", "pred", "conv_id", "turn_idx"]
    )
    return slim.groupby(["src_id", "dst_id", "pred"]).map_groups(
        _edge_rows, batch_format="pandas"
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
    num_buckets: int = 16,
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
