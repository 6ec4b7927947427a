"""Fan-in tree combine for enumerable-key aggregates and top-k cuts.

Ray's ``groupby().aggregate()`` / ``sort().limit()`` are sort-based
shuffles: every block is sampled, range-partitioned and exchanged, and an
empty partition range emits a SCHEMA-LESS empty block (the "Operator
produced a RefBundle with a different schema" warning in the streaming
executor — streaming_executor_state.py:dedupe_schemas_with_validation).
For aggregates whose key domain is ENUMERABLE (price bands, market
segments, return flags, time windows, per-query top-k: k × #blocks partial
rows, fixed width), that shuffle is also wasted work: the map-side
partials already fit a handful of blocks.

``tree_combine`` replaces the shuffle with a two-level fan-in merge over
the typed partials stream:

    partials ── map_batches(merge, batch_size=fanin_rows)   (level 1)
             ── repartition(1) ── merge                     (final)

Level 1 fans in by ROW-COUNT BUNDLING: ``map_batches`` with a large
``batch_size`` coalesces many small partial blocks into one merge task's
batch, so — unlike ``repartition(n)``, which splits a handful of rows
into mostly-empty (schema-less) partitions — no empty block is ever
created. ``merge_fn`` must be ASSOCIATIVE over row-concatenation
(group-sum, top-k keep, histogram add...). Every intermediate stays a
typed Arrow table — zero-row slices keep their schema — so no schema-less
blocks ever reach the executor, and the only data movement is the
coalesce of partial rows.

Partitioning assumption (documented per the custom-operator rule): rows
reaching the final task ≈ (#input-blocks × #distinct-keys) / fanin_rows
× #distinct-keys must fit one task's heap. At 100 TB / 1e6 blocks and
≤1e3 keys, level 1 sees ≤1e9 slim rows in 64k-row chunks (~15k merge
tasks) and the final task ≤15k × 1e3 rows — comfortably bounded. Raise
``fanin_rows`` (or add a level) for wider key domains, or fall back to
``groupby`` for non-enumerable domains.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pyarrow as pa

from ray.data import Dataset


def tree_combine(
    partials: Dataset,
    merge_fn: Callable[[pa.Table], pa.Table],
    *,
    fanin_rows: int = 65536,
) -> Dataset:
    """Two-level associative merge of a map-side partials stream."""
    lvl1 = partials.map_batches(
        merge_fn, batch_size=fanin_rows, batch_format="pyarrow"
    )
    return lvl1.repartition(1).map_batches(
        merge_fn, batch_size=None, batch_format="pyarrow"
    )


def group_agg_merge(
    keys: Sequence[str],
    sums: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
) -> Callable[[pa.Table], pa.Table]:
    """Merge fn: group by ``keys``, sum/min/max the value columns,
    preserving column names (so the merge is idempotent across tree
    levels). Output sorted by keys — the order Ray's sort-based aggregate
    used to produce."""
    keys = list(keys)
    cols = list(sums) + list(mins) + list(maxs)
    aggs = (
        [(c, "sum") for c in sums]
        + [(c, "min") for c in mins]
        + [(c, "max") for c in maxs]
    )

    def merge(t: pa.Table) -> pa.Table:
        t = t.select(keys + cols)
        if t.num_rows == 0:
            return t  # typed empty: slice keeps schema
        g = pa.TableGroupBy(t, keys).aggregate(aggs)
        g = g.rename_columns(keys + cols)  # pyarrow emits keys + "{c}_{op}"
        return g.sort_by([(k, "ascending") for k in keys])

    return merge


def group_sum_merge(
    keys: Sequence[str], sums: Sequence[str]
) -> Callable[[pa.Table], pa.Table]:
    """Sum-only specialization of ``group_agg_merge``."""
    return group_agg_merge(keys, sums=sums)


def topk_merge(
    k: int,
    score_col: str,
    id_cols: Sequence[str],
    group_cols: Sequence[str] = (),
) -> Callable[[pa.Table], pa.Table]:
    """Merge fn: keep the top-k rows by (score DESC, id ASC) — per
    ``group_cols`` group if given. Top-k keep is associative, so the tree
    replaces ``sort(desc).limit(k)`` / per-group ``map_groups(head(k))``
    with no global sort shuffle. Ties cut by the same total order the
    global sort used, so the cut is exact."""
    id_cols = list(id_cols)
    group_cols = list(group_cols)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        df = t.to_pandas()  # partials are k × fanin rows — tiny by design
        order = group_cols + [score_col] + id_cols
        asc = [True] * len(group_cols) + [False] + [True] * len(id_cols)
        df = df.sort_values(order, ascending=asc, kind="mergesort")
        if group_cols:
            df = df.groupby(group_cols, sort=False).head(k)
        else:
            df = df.head(k)
        out = pa.Table.from_pandas(df, schema=t.schema, preserve_index=False)
        # from_pandas attaches pandas metadata even with an explicit schema;
        # a schema WITH metadata is unhashable (pyarrow 16), which makes
        # Ray's schema-dedup log "Failed to hash the schemas" per reduce
        return out.replace_schema_metadata(None)

    return merge


def anchor(ds: Dataset) -> Dataset:
    """Materialize a Dataset and re-anchor it on its block OBJECT REFS,
    cutting the logical plan. Ray 2.49's ``Dataset.union`` keeps the
    logical plan of a MaterializedDataset input and RE-EXECUTES it on
    every downstream execution — an iterative algorithm that unions its
    own state (sharded pagerank/BFS/LPA) re-runs all prior rounds and
    goes exponential (measured ×1.7 per round before this cut). Blocks
    stay in the object store — no driver transfer."""
    import ray.data as rd

    m = ds.materialize()
    return rd.from_arrow_refs(m.to_arrow_refs())
