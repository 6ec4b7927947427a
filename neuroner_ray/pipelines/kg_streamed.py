"""Single-pass streamed KG pipeline — the 100 TB execution shape.

``kg.run_pipeline`` materializes the tagged corpus once so several
consumers can share it; at full scale even one corpus-sized materialization
is a cost. This variant streams the corpus through ONE fused stage that
emits only *partials* (census counts + surface-keyed edge partials — both
vocabulary/edge-count sized), so the corpus itself is never stored:

    read → [tag → census-partials + triple-extract + edge-partials]  (1 pass)
         → tiny groupbys → linking (driver/distributed) → canonical remap
         → final edge merge → partitioned write

Equivalence with the classic pipeline is pinned by
tests/test_streamed_pipeline.py (identical nodes and edges).
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..schemas import PROVENANCE_STRUCT
from ..stages.graph import (
    NUM_BUCKETS_DEFAULT,
    _merge_edge_partials_exact,
    materialize_graph,
    resolve_entity_id,
)
from ..stages.tagger import RuleTagger
from ..stages.triples import extract_triples_row
from .kg import _link_from_census, read_transcripts

_PARTIAL_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # "c" census | "e" edge partial
        ("ent_type", pa.string()),
        ("surface", pa.string()),
        ("n", pa.int64()),
        ("s_surf", pa.string()),
        ("s_type", pa.string()),
        ("pred", pa.string()),
        ("o_surf", pa.string()),
        ("o_type", pa.string()),
        ("weight", pa.int64()),
        ("provenance", pa.list_(PROVENANCE_STRUCT)),
    ]
)


def _partials_from_annotations(
    rows: list[tuple[str, int, str, list[dict]]]
) -> pa.Table:
    """(conv_id, turn_idx, text, mentions) per row → partials union table."""
    from collections import Counter

    census: Counter = Counter()
    eagg: dict[tuple, set] = {}
    for cid, ti, text, mentions in rows:
        census.update((m["ent_type"], m["surface"]) for m in mentions)
        for s, p, o, st, ot in extract_triples_row(text, mentions):
            eagg.setdefault((s, st, p, o, ot), set()).add((cid, ti))
    cols: dict[str, list] = {name: [] for name in _PARTIAL_SCHEMA.names}

    def emit(kind, **kw):
        cols["kind"].append(kind)
        for name in _PARTIAL_SCHEMA.names[1:]:
            cols[name].append(kw.get(name))

    for (et, surf), n in census.items():
        emit("c", ent_type=et, surface=surf, n=n)
    for (s, st, p, o, ot), seen in eagg.items():
        # FULL distinct (conv, turn) set — the post-resolution merge must
        # dedup turns shared by surface variants of one canonical triple
        # (O5); weight is recomputed there, so no cap here
        emit(
            "e",
            s_surf=s,
            s_type=st,
            pred=p,
            o_surf=o,
            o_type=ot,
            weight=len(seen),
            provenance=[
                {"conv_id": c, "turn_idx": int(t)} for c, t in sorted(seen)
            ],
        )
    return pa.Table.from_pydict(cols, schema=_PARTIAL_SCHEMA)


class FusedAnnotator:
    """Actor-pool stage wrapping any tagger: batch of raw turns → partials."""

    def __init__(self, tagger_cls: Any = RuleTagger, tagger_args: tuple = ()):
        self.tagger = tagger_cls(*tagger_args)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tagged = self.tagger(batch)
        rows = list(
            zip(
                tagged["conv_id"].to_pylist(),
                tagged["turn_idx"].to_pylist(),
                tagged["text"].to_pylist(),
                tagged["mentions"].to_pylist(),
            )
        )
        return _partials_from_annotations(rows)


SMALL_PARTIALS_MAX = 5_000_000  # partial rows under which finalize runs driver-side


def _finalize_small(partials: Dataset, out_dir: str | None) -> dict[str, Dataset]:
    """Driver finalize: census groupby, linking, canonical remap and edge
    merge in pandas — the partials are already collected-scale, and each
    avoided Ray execution saves more setup time than the compute costs.
    Uses the SAME merge/link/node functions as the distributed path."""
    from ..stages.canonicalize import union_find  # noqa: F401 (via _link_from_census)
    from ..stages.graph import canonical_map

    batches = list(partials.iter_batches(batch_format="pyarrow"))
    if not batches:  # mention-free corpus (pa.concat_tables([]) raises)
        batches = [_PARTIAL_SCHEMA.empty_table()]
    tab = pa.concat_tables(batches).combine_chunks()
    df = tab.to_pandas()
    cdf = df[df["kind"] == "c"]
    census_df = (
        cdf.groupby(["ent_type", "surface"], as_index=False)["n"]
        .sum()
        .rename(columns={"n": "mention_count"})
    )
    census = rd.from_pandas(census_df)
    nodes, _labels = _link_from_census(census.materialize())
    nodes = nodes.materialize()
    mapping = canonical_map(nodes)

    edf = df[df["kind"] == "e"].copy()
    edf["src_id"] = [
        resolve_entity_id(mapping, st, s)
        for s, st in zip(edf["s_surf"], edf["s_type"])
    ]
    edf["dst_id"] = [
        resolve_entity_id(mapping, ot, o)
        for o, ot in zip(edf["o_surf"], edf["o_type"])
    ]
    groups = [
        _merge_edge_partials_exact(g)
        for _, g in edf.groupby(["src_id", "dst_id", "pred"])
    ]
    if groups:
        merged = pd.concat(groups, ignore_index=True)
    else:  # edge-free corpus (pd.concat([]) raises); typed empty
        merged = pd.DataFrame(
            {
                "src_id": pd.Series([], dtype=object),
                "dst_id": pd.Series([], dtype=object),
                "pred": pd.Series([], dtype=object),
                "weight": pd.Series([], dtype="int64"),
                "provenance": pd.Series([], dtype=object),
            }
        )
    edges = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array(merged["src_id"], pa.string()),
                "dst_id": pa.array(merged["dst_id"], pa.string()),
                "pred": pa.array(merged["pred"], pa.string()),
                "weight": pa.array(merged["weight"], pa.int64()),
                "provenance": pa.array(
                    merged["provenance"].map(list), pa.list_(PROVENANCE_STRUCT)
                ),
            }
        )
    )
    out = {"nodes": nodes, "edges": edges}
    if out_dir is not None:
        _write_graph_small(nodes, edges, out_dir)
    return out


def _write_graph_small(
    nodes: Dataset,
    edges: Dataset,
    out_dir: str,
    num_buckets: int = NUM_BUCKETS_DEFAULT,
) -> None:
    """Driver-side bucket-partitioned writes for collected-scale tables —
    same on-disk layout as ``materialize_graph`` (same shared bucket count)
    without two Ray executions."""
    import os
    import zlib

    import pyarrow.parquet as pq

    for name, ds, key in (("nodes", nodes, "entity_id"), ("edges", edges, "src_id")):
        tab = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
        buckets = pa.array(
            [zlib.crc32(v.encode()) % num_buckets for v in tab[key].to_pylist()],
            pa.int32(),
        )
        tab = tab.append_column("bucket", buckets)
        for b in sorted(set(buckets.to_pylist())):
            sub = tab.filter(pa.compute.equal(tab["bucket"], b))
            d = os.path.join(out_dir, name, f"bucket={b}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(sub.drop_columns(["bucket"]), os.path.join(d, "part-0.parquet"))


def run_pipeline_streamed(
    transcripts_path: str,
    out_dir: str | None = None,
    tagger: Any = RuleTagger,
    tagger_args: tuple = (),
    concurrency: Any = (1, 8),
    batch_size: int = 2048,
) -> dict[str, Dataset]:
    """One corpus pass; returns {"nodes", "edges"} Datasets."""
    transcripts = read_transcripts(transcripts_path)
    partials = transcripts.map_batches(
        FusedAnnotator,
        fn_constructor_args=(tagger, tagger_args),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).materialize()  # vocabulary+edge-count sized, NOT corpus sized

    if partials.count() <= SMALL_PARTIALS_MAX:
        return _finalize_small(partials, out_dir)

    census = (
        partials.filter(expr="kind == 'c'")
        .select_columns(["ent_type", "surface", "n"])
        .groupby(["ent_type", "surface"])
        .aggregate(Sum("n", alias_name="mention_count"))
    )
    nodes, _labels = _link_from_census(census.materialize())
    nodes = nodes.materialize()

    from ..stages.graph import canonical_map

    mapping = canonical_map(nodes)
    map_ref = ray.put(mapping)

    def finalize(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        src = [
            resolve_entity_id(m, st, s)
            for s, st in zip(batch["s_surf"].to_pylist(), batch["s_type"].to_pylist())
        ]
        dst = [
            resolve_entity_id(m, ot, o)
            for o, ot in zip(batch["o_surf"].to_pylist(), batch["o_type"].to_pylist())
        ]
        return pa.table(
            {
                "src_id": pa.array(src, pa.string()),
                "dst_id": pa.array(dst, pa.string()),
                "pred": batch["pred"],
                "weight": batch["weight"],
                "provenance": batch["provenance"],
            }
        )

    edges = (
        partials.filter(expr="kind == 'e'")
        .map_batches(finalize, batch_format="pyarrow")
        .groupby(["src_id", "dst_id", "pred"])
        .map_groups(_merge_edge_partials_exact, batch_format="pandas")
    )
    out = {"nodes": nodes, "edges": edges}
    if out_dir is not None:
        materialize_graph(nodes, edges, out_dir)
    return out
