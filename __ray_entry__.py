"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

from neuroner_ray.functions.tokenize import TOKEN_PATTERN
from neuroner_ray.pipelines import queries as q
from neuroner_ray.pipelines import curate
from neuroner_ray.pipelines import kg
from neuroner_ray.sources.synth_transcripts import transcripts_dir_for


def entry() -> Any:
    """Flagship KG pipeline on the sf0.001-scale transcripts corpus."""
    tdir = transcripts_dir_for("/root/testdata/sf0.001")
    tables = kg.run_pipeline(tdir)
    return tables["edges"]


# ---------------------------------------------------------------- KG queries
_KG_CACHE: dict[str, dict] = {}


def _kg_tables(sf_dir: str) -> dict:
    """One pipeline run shared by every kg_* query in this session (the
    pipeline is deterministic, so memoizing only saves repeated work)."""
    if sf_dir not in _KG_CACHE:
        tables = kg.run_pipeline(transcripts_dir_for(sf_dir))
        _KG_CACHE[sf_dir] = {
            "mentions": tables["mentions"].materialize(),
            "triples": tables["triples"].materialize(),
            "nodes": tables["nodes"],
            "edges": tables["edges"].materialize(),
        }
    return _KG_CACHE[sf_dir]


def kg_mentions(sf_dir: str) -> Any:
    return _kg_tables(sf_dir)["mentions"]


def kg_triples(sf_dir: str) -> Any:
    return _kg_tables(sf_dir)["triples"]


def kg_nodes(sf_dir: str) -> Any:
    return _kg_tables(sf_dir)["nodes"].drop_columns(["surfaces"])


def kg_edges(sf_dir: str) -> Any:
    return _kg_tables(sf_dir)["edges"].drop_columns(["provenance"])


def kg_top_entities(sf_dir: str) -> Any:
    """Graph analytics on the produced edge table: top 20 entities by
    weighted degree (out + in)."""
    import pyarrow as pa

    from neuroner_ray.runtime.combine import (
        group_sum_merge,
        topk_merge,
        tree_combine,
    )

    edges = _kg_tables(sf_dir)["edges"]
    merge = group_sum_merge(("entity_id",), ("degree",))

    def degree_rows(t: pa.Table) -> pa.Table:
        # each endpoint of an edge receives the edge weight; partial
        # group-sum in place so the combine moves entity-vocab-sized rows
        ids = t["src_id"].to_pylist() + t["dst_id"].to_pylist()
        return merge(
            pa.table(
                {
                    "entity_id": pa.array(ids, pa.string()),
                    "degree": pa.array(t["weight"].to_pylist() * 2, pa.int64()),
                }
            )
        )

    # degree census is entity-vocabulary-sized (canonical ids, gazetteer-
    # bounded) — tree_combine + in-place top-20, no sort shuffle
    counts = tree_combine(
        edges.map_batches(degree_rows, batch_format="pyarrow"), merge
    )
    return counts.map_batches(
        topk_merge(20, "degree", ["entity_id"]),
        batch_size=None,
        batch_format="pyarrow",
    )


def kg_pagerank(sf_dir: str) -> Any:
    """Graph analytics: weighted PageRank over the produced edge table
    (power method, 10 iterations, damping 0.85 — deterministic, so the
    DuckDB oracle unrolls the same iterations)."""
    from neuroner_ray.stages.graph import pagerank

    return pagerank(_kg_tables(sf_dir)["edges"])


def kg_degree(sf_dir: str) -> Any:
    """Graph analytics: per-entity out/in/weighted degree census
    (map-side partials + tree combine, no sort shuffle)."""
    from neuroner_ray.stages.graph import degree_table

    return degree_table(_kg_tables(sf_dir)["edges"])


def kg_assortativity(sf_dir: str) -> Any:
    """Graph analytics: directed degree assortativity (Pearson r of
    (out_degree(src), in_degree(dst)) over edge rows — one fixed-width
    six-moment partial per batch against a broadcast vocabulary-sized
    degree map, tree-combined)."""
    from neuroner_ray.stages.graph import assortativity

    return assortativity(_kg_tables(sf_dir)["edges"])


def kg_mention_density_hist(sf_dir: str) -> Any:
    """Flagship-pipeline diagnostic: MENTIONS-PER-TURN histogram
    (including zero-mention turns from the transcript universe) — the
    extraction-density profile that says whether the tagger finds
    anything at all and whether density is uniform or spiky.

    Scale shape (VERDICT r4 item 2): the per-(conv_id, turn_idx) mention
    census is corpus-sized, so it stays in Ray — map-side pre-aggregate
    per batch, ONE turn-key groupby to merge cross-block splits, then a
    map-side histogram + ``tree_combine``; only the count-histogram
    (domain-bounded: distinct mentions-per-turn values) reaches the
    driver."""
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from neuroner_ray.functions.rounding import round_half_away
    from neuroner_ray.runtime.combine import group_sum_merge, tree_combine
    from neuroner_ray.sources.parquet import read_parquet_clean
    from neuroner_ray.sources.synth_transcripts import transcripts_dir_for

    mentions = _kg_tables(sf_dir)["mentions"]
    schema = pa.schema(
        [
            ("n_mentions", pa.int64()),
            ("n_turns", pa.int64()),
            ("share", pa.float64()),
        ]
    )
    total_turns = read_parquet_clean(
        transcripts_dir_for(sf_dir), columns=["conv_id"]
    ).count()
    if total_turns == 0:
        return schema.empty_table()

    def turn_partial(t: pa.Table) -> pa.Table:
        df = t.select(["conv_id", "turn_idx"]).to_pandas()
        g = df.groupby(["conv_id", "turn_idx"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table(
            {
                "conv_id": pa.array(idx["conv_id"], pa.string()),
                "turn_idx": pa.array(
                    idx["turn_idx"].to_numpy("int64"), pa.int64()
                ),
                "n": pa.array(g.to_numpy("int64"), pa.int64()),
            }
        )

    per_turn = (
        mentions.select_columns(["conv_id", "turn_idx"])
        .map_batches(turn_partial, batch_format="pyarrow")
        .groupby(["conv_id", "turn_idx"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        vc = pd.Series(t["n"].to_numpy(zero_copy_only=False)).value_counts()
        return pa.table(
            {
                "n_mentions": pa.array(
                    vc.index.to_numpy("int64"), pa.int64()
                ),
                "n_turns": pa.array(vc.to_numpy("int64"), pa.int64()),
            }
        )

    hist_df = tree_combine(
        per_turn.map_batches(hist_partial, batch_format="pyarrow"),
        group_sum_merge(("n_mentions",), ("n_turns",)),
    ).to_pandas()
    if hist_df.empty:
        hist_df = pd.DataFrame({"n_mentions": [], "n_turns": []})
    hist_df = hist_df.sort_values("n_mentions")
    zero = total_turns - int(hist_df["n_turns"].sum())
    ks = ([0] if zero > 0 else []) + [
        int(k) for k in hist_df["n_mentions"]
    ]
    ns = ([zero] if zero > 0 else []) + [int(v) for v in hist_df["n_turns"]]
    return pa.table(
        {
            "n_mentions": pa.array(ks, pa.int64()),
            "n_turns": pa.array(ns, pa.int64()),
            "share": pa.array(
                round_half_away(
                    pd.Series(ns).to_numpy("int64") / float(total_turns), 6
                ),
                pa.float64(),
            ),
        },
        schema=schema,
    )


def kg_transcript_profile(sf_dir: str) -> Any:
    """Dataset card for the flagship INPUT: per transcript role, turn
    count and share — the profile a pipeline run logs before
    construction.

    Scale shape (VERDICT r4 item 2): the role census is a map-side
    partial per batch merged by ``tree_combine`` — no shuffle, no
    corpus-sized driver pull; only the role-domain-bounded census (a
    handful of rows) reaches the driver."""
    import pandas as pd
    import pyarrow as pa

    from neuroner_ray.functions.rounding import round_half_away
    from neuroner_ray.runtime.combine import group_sum_merge, tree_combine
    from neuroner_ray.sources.parquet import read_parquet_clean
    from neuroner_ray.sources.synth_transcripts import transcripts_dir_for

    tdir = transcripts_dir_for(sf_dir)
    ds = read_parquet_clean(tdir, columns=["role"])
    schema = pa.schema(
        [
            ("role", pa.string()),
            ("n_turns", pa.int64()),
            ("share", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        c = pd.Series(t["role"].to_pylist()).value_counts()
        return pa.table(
            {
                "role": pa.array(c.index.tolist(), pa.string()),
                "n_turns": pa.array(c.to_numpy("int64"), pa.int64()),
            }
        )

    census = tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_sum_merge(("role",), ("n_turns",)),
    ).to_pandas()
    if census.empty:
        return schema.empty_table()
    vc = census.set_index("role")["n_turns"].sort_index()
    tot = int(vc.sum())
    return pa.table(
        {
            "role": pa.array(vc.index.tolist(), pa.string()),
            "n_turns": pa.array(vc.to_numpy("int64"), pa.int64()),
            "share": pa.array(
                round_half_away(vc.to_numpy("int64") / float(tot), 6),
                pa.float64(),
            ),
        },
        schema=schema,
    )


def kg_surface_variety(sf_dir: str) -> Any:
    """Graph analytics: SURFACE-FORM VARIETY histogram — per distinct
    alias count, how many canonical entities carry that many surface
    forms (the ER-richness profile: everything at 1 means linking did
    nothing; a heavy tail means heavy canonicalization)."""
    import pandas as pd
    import pyarrow as pa

    nodes = _kg_tables(sf_dir)["nodes"]
    schema = pa.schema(
        [("n_surfaces", pa.int64()), ("n_entities", pa.int64())]
    )
    import pyarrow.compute as pc

    parts = [
        pc.list_value_length(b["surfaces"]).to_numpy(zero_copy_only=False)
        for b in nodes.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return schema.empty_table()
    import numpy as np

    hist = (
        pd.Series(np.concatenate(parts)).value_counts().rename_axis("k")
        .reset_index(name="n").sort_values("k")
    )
    return pa.table(
        {
            "n_surfaces": pa.array(hist["k"].to_numpy("int64"), pa.int64()),
            "n_entities": pa.array(hist["n"].to_numpy("int64"), pa.int64()),
        },
        schema=schema,
    )


def kg_edge_hygiene_audit(sf_dir: str) -> Any:
    """Graph analytics: edge-HYGIENE audit (the release checklist a KG
    ships with): self-loop count, parallel-edge groups (same src→dst
    under different predicates), and the largest parallel bundle — one
    pandas sweep over the vocabulary-bounded edge table."""
    import pandas as pd
    import pyarrow as pa

    edges = _kg_tables(sf_dir)["edges"]
    schema = pa.schema(
        [
            ("n_edges", pa.int64()),
            ("n_self_loops", pa.int64()),
            ("n_parallel_groups", pa.int64()),
            ("max_parallel", pa.int64()),
        ]
    )
    parts = [
        pd.DataFrame(
            {
                "s": b["src_id"].to_pylist(),
                "d": b["dst_id"].to_pylist(),
            }
        )
        for b in edges.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return schema.empty_table()
    df = pd.concat(parts)
    g = df.groupby(["s", "d"]).size()
    return pa.table(
        {
            "n_edges": pa.array([len(df)], pa.int64()),
            "n_self_loops": pa.array(
                [int((df["s"] == df["d"]).sum())], pa.int64()
            ),
            "n_parallel_groups": pa.array(
                [int((g > 1).sum())], pa.int64()
            ),
            "max_parallel": pa.array([int(g.max())], pa.int64()),
        },
        schema=schema,
    )


def kg_node_type_census(sf_dir: str) -> Any:
    """Graph analytics: entity-TYPE profile of the node table (PER/ORG/
    LOC... counts, mention totals, shares) — the node-side companion to
    the predicate census."""
    import pandas as pd
    import pyarrow as pa

    from neuroner_ray.functions.rounding import round_half_away

    nodes = _kg_tables(sf_dir)["nodes"]
    schema = pa.schema(
        [
            ("ent_type", pa.string()),
            ("n_entities", pa.int64()),
            ("total_mentions", pa.int64()),
            ("mention_share", pa.float64()),
        ]
    )
    parts = [
        pd.DataFrame(
            {
                "t": b["ent_type"].to_pylist(),
                "m": b["mention_count"].to_numpy(zero_copy_only=False),
            }
        )
        for b in nodes.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return schema.empty_table()
    df = (
        pd.concat(parts)
        .assign(one=1)
        .groupby("t", sort=True)
        .agg(n=("one", "sum"), m=("m", "sum"))
        .reset_index()
    )
    tot = int(df["m"].sum())
    return pa.table(
        {
            "ent_type": pa.array(df["t"].tolist(), pa.string()),
            "n_entities": pa.array(df["n"].to_numpy("int64"), pa.int64()),
            "total_mentions": pa.array(df["m"].to_numpy("int64"), pa.int64()),
            "mention_share": pa.array(
                round_half_away(df["m"].to_numpy("int64") / float(tot), 6),
                pa.float64(),
            ),
        },
        schema=schema,
    )


def kg_predicate_census(sf_dir: str) -> Any:
    """Graph analytics: per-PREDICATE profile of the edge table (the
    relation-type census a KG release ships): edge count, total weight,
    and weight share — exact ints + one 6-dp division per row over the
    predicate-cardinality census."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neuroner_ray.functions.rounding import round_half_away

    edges = _kg_tables(sf_dir)["edges"]
    schema = pa.schema(
        [
            ("pred", pa.string()),
            ("n_edges", pa.int64()),
            ("total_weight", pa.int64()),
            ("weight_share", pa.float64()),
        ]
    )
    parts = [
        pd.DataFrame(
            {
                "pred": b["pred"].to_pylist(),
                "w": b["weight"].to_numpy(zero_copy_only=False),
            }
        )
        for b in edges.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return schema.empty_table()
    df = (
        pd.concat(parts)
        .assign(one=1)
        .groupby("pred", sort=True)
        .agg(n=("one", "sum"), w=("w", "sum"))
        .reset_index()
    )
    tot = int(df["w"].sum())
    return pa.table(
        {
            "pred": pa.array(df["pred"].tolist(), pa.string()),
            "n_edges": pa.array(df["n"].to_numpy("int64"), pa.int64()),
            "total_weight": pa.array(df["w"].to_numpy("int64"), pa.int64()),
            "weight_share": pa.array(
                round_half_away(
                    df["w"].to_numpy("int64") / float(tot), 6
                ),
                pa.float64(),
            ),
        },
        schema=schema,
    )


def kg_component_sizes(sf_dir: str) -> Any:
    """Graph analytics: component-SIZE distribution — per distinct
    component size, how many components (the fragmentation profile next
    to the CCDF; a giant component + dust is the healthy KG shape).
    Composes the oracled connected components with two tiny censuses
    (component -> size -> histogram) — label-vocabulary-sized
    throughout."""
    import pandas as pd
    import pyarrow as pa

    labels = kg_components(sf_dir)
    labels = labels.to_pandas() if hasattr(labels, "to_pandas") else labels
    schema = pa.schema(
        [("size", pa.int64()), ("n_components", pa.int64())]
    )
    if labels.empty:
        return schema.empty_table()
    sizes = labels.groupby("component").size()
    hist = (
        sizes.value_counts().rename_axis("size").reset_index(name="n")
        .sort_values("size")
    )
    return pa.table(
        {
            "size": pa.array(hist["size"].to_numpy("int64"), pa.int64()),
            "n_components": pa.array(
                hist["n"].to_numpy("int64"), pa.int64()
            ),
        },
        schema=schema,
    )


def kg_degree_ccdf(sf_dir: str) -> Any:
    """Graph analytics: total-degree CCDF — the plot-ready degree
    distribution next to assortativity/rich-club: per distinct total
    degree (out + in over the simple directed edge set), node count and
    P(D >= d). Degree census from the oracled degree_table; CCDF is an
    integer suffix sum over the ≤ #distinct-degree rows + one 6-dp
    division per row."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neuroner_ray.functions.rounding import round_half_away
    from neuroner_ray.stages.graph import degree_table

    deg = degree_table(_kg_tables(sf_dir)["edges"]).to_pandas()
    schema = pa.schema(
        [
            ("degree", pa.int64()),
            ("n_nodes", pa.int64()),
            ("ccdf", pa.float64()),
        ]
    )
    if deg.empty:
        return schema.empty_table()
    total = (
        deg["out_degree"].to_numpy("int64")
        + deg["in_degree"].to_numpy("int64")
    )
    cen = (
        pd.DataFrame({"d": total})
        .groupby("d", sort=True)
        .size()
        .reset_index(name="n")
        .sort_values("d", ascending=False)
    )
    n = cen["n"].to_numpy("int64")
    cum = np.cumsum(n)  # nodes with degree >= d (descending order)
    N = int(cum[-1])
    cen = cen.assign(ge=cum).sort_values("d")
    return pa.table(
        {
            "degree": pa.array(cen["d"].to_numpy("int64"), pa.int64()),
            "n_nodes": pa.array(cen["n"].to_numpy("int64"), pa.int64()),
            "ccdf": pa.array(
                round_half_away(
                    cen["ge"].to_numpy("int64") / float(N), 6
                ),
                pa.float64(),
            ),
        },
        schema=schema,
    )


def kg_edge_weight_gini(sf_dir: str) -> Any:
    """Graph analytics: Gini coefficient of the edge-weight
    distribution — "is the graph's mass concentrated on a few hot
    relations?" (the inequality-family member on the KG side). One
    (weight, multiplicity) census over the edge table (weight-domain-
    bounded) + the events_user_gini closed form on the driver."""
    import numpy as np
    import pyarrow as pa

    from neuroner_ray.functions.rounding import round_half_away
    from neuroner_ray.runtime.combine import group_sum_merge, tree_combine

    edges = _kg_tables(sf_dir)["edges"]
    cen = pa.concat_tables(
        [pa.table({"v": pa.array([], pa.int64()),
                   "m": pa.array([], pa.int64())})]
        + list(
            tree_combine(
                edges.map_batches(
                    lambda t: pa.table(
                        {
                            "v": t["weight"].cast(pa.int64()),
                            "m": pa.array(
                                np.ones(t.num_rows, np.int64)
                            ),
                        }
                    ),
                    batch_format="pyarrow",
                ),
                group_sum_merge(("v",), ("m",)),
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        ),
        promote_options="default",
    ).to_pandas()
    schema = pa.schema(
        [
            ("n_edges", pa.int64()),
            ("total_weight", pa.int64()),
            ("gini", pa.float64()),
        ]
    )
    if cen.empty:
        return schema.empty_table()
    cen = cen.sort_values("v")
    v = cen["v"].to_numpy("int64")
    m = cen["m"].to_numpy("int64")
    offsets = np.concatenate([[0], np.cumsum(m)[:-1]])
    A = int(np.sum(v * (m * offsets + m * (m + 1) // 2)))
    B = int(np.sum(v * m))
    n = int(m.sum())
    gini = 2.0 * A / (n * B) - (n + 1.0) / n
    return pa.table(
        {
            "n_edges": pa.array([n], pa.int64()),
            "total_weight": pa.array([B], pa.int64()),
            "gini": pa.array(round_half_away([gini], 4), pa.float64()),
        },
        schema=schema,
    )


def kg_edge_reciprocity(sf_dir: str) -> Any:
    """Graph analytics: mutual-edge fraction of the distinct directed
    edge set (two edge-bounded shuffles + one fixed-width scalar row)."""
    from neuroner_ray.stages.graph import edge_reciprocity

    return edge_reciprocity(_kg_tables(sf_dir)["edges"])


def kg_hits(sf_dir: str) -> Any:
    """Graph analytics: weighted HITS hubs/authorities (5 iterations,
    L1 normalization — deterministic, so the DuckDB oracle unrolls the
    same arithmetic; size-adaptive driver/streamed/sharded regimes)."""
    from neuroner_ray.stages.graph import hits

    return hits(_kg_tables(sf_dir)["edges"])


def kg_sssp(sf_dir: str) -> Any:
    """Graph analytics: weighted single-source shortest paths from the
    lexicographically smallest entity (synchronous Bellman-Ford, 10-round
    budget — deterministic integer distances, so the DuckDB oracle unrolls
    the same min-plus rounds; size-adaptive driver/streamed/sharded
    regimes)."""
    from neuroner_ray.stages.graph import sssp

    return sssp(_kg_tables(sf_dir)["edges"])


def kg_ppr(sf_dir: str) -> Any:
    """Graph analytics: PERSONALIZED PageRank — seeded relevance from the
    lexicographically smallest entity ((1−d) teleport and dangling mass
    restart at the seed, rank₀ = seed indicator) vs kg_pagerank's global
    centrality. Same three size-adaptive regimes, same unrolled-CTE
    oracle machinery (personalized=True)."""
    from neuroner_ray.stages.graph import pagerank

    return pagerank(_kg_tables(sf_dir)["edges"], personalized=True)


def kg_richclub(sf_dir: str) -> Any:
    """Graph analytics: rich-club coefficient profile (do hubs connect
    to each other more than chance?) — φ(k) over degree thresholds
    1/2/4/8 on the simple undirected graph."""
    from neuroner_ray.stages.graph import richclub

    return richclub(_kg_tables(sf_dir)["edges"])


def kg_components(sf_dir: str) -> Any:
    """Graph analytics: connected components of the undirected entity
    graph (size-adaptive union-find / distributed min-label propagation);
    component label = lexicographic min member."""
    from neuroner_ray.stages.graph import components

    return components(_kg_tables(sf_dir)["edges"])


def kg_triangles(sf_dir: str) -> Any:
    """Graph analytics: global triangle count of the undirected simple
    entity graph (ordered node-iterator over a broadcast adjacency)."""
    from neuroner_ray.stages.graph import triangle_count

    return triangle_count(_kg_tables(sf_dir)["edges"])


def kg_bfs_levels(sf_dir: str) -> Any:
    """Graph analytics: undirected BFS hop levels from the
    lexicographically smallest entity (level cap 10; frontier broadcast
    per level, one streaming edge pass per level)."""
    from neuroner_ray.stages.graph import bfs_levels

    return bfs_levels(_kg_tables(sf_dir)["edges"])


def kg_kcore(sf_dir: str) -> Any:
    """Graph analytics: fixed-round 2-core peel of the undirected simple
    entity graph (surviving nodes + surviving-neighbor degree)."""
    from neuroner_ray.stages.graph import kcore

    return kcore(_kg_tables(sf_dir)["edges"])


def kg_neighbor_jaccard(sf_dir: str) -> Any:
    """Graph analytics: top-20 node pairs by neighborhood Jaccard
    similarity (broadcast adjacency + per-batch local top-k, tie-exact)."""
    from neuroner_ray.stages.graph import neighbor_jaccard_topk

    return neighbor_jaccard_topk(_kg_tables(sf_dir)["edges"])


def kg_adamic_adar(sf_dir: str) -> Any:
    """Graph analytics: top-20 non-adjacent entity pairs by Adamic-Adar
    link-prediction score (broadcast adjacency + per-batch local top-k;
    weighted-wedge shuffle past the cap — see
    stages.graph.adamic_adar_topk)."""
    from neuroner_ray.stages.graph import adamic_adar_topk

    return adamic_adar_topk(_kg_tables(sf_dir)["edges"])


def kg_twohop_reach(sf_dir: str) -> Any:
    """Graph analytics: distinct ≤2-hop reach per entity (adjacency
    broadcast / wedge-dedup shuffle past the cap — see
    stages.graph.twohop_reach)."""
    from neuroner_ray.stages.graph import twohop_reach

    return twohop_reach(_kg_tables(sf_dir)["edges"])


def kg_clustering(sf_dir: str) -> Any:
    """Graph analytics: local clustering coefficient per deg≥2 entity
    (broadcast adjacency with a driver fast path below
    SMALL_GRAPH_EDGES_MAX; the degree-oriented wedge cogroup past the
    TRIANGLE_MAX_EDGES cap — see stages.graph.clustering_coeff)."""
    from neuroner_ray.stages.graph import clustering_coeff

    return clustering_coeff(_kg_tables(sf_dir)["edges"])


def kg_ktruss(sf_dir: str) -> Any:
    """Graph analytics: fixed-round 3-truss of the undirected simple
    entity graph (edges in >= 1 triangle after the monotone peel, final
    support recomputed on the survivors; driver set arithmetic under the
    loud cap, per-round wedge-cogroup shuffle past it — see
    stages.graph.ktruss)."""
    from neuroner_ray.stages.graph import ktruss

    return ktruss(_kg_tables(sf_dir)["edges"])


def kg_communities_lpa(sf_dir: str) -> Any:
    """Graph analytics: synchronous label-propagation communities (fixed
    8 rounds; labels broadcast per round, one streamed pair pass each)."""
    from neuroner_ray.stages.graph import label_propagation

    return label_propagation(_kg_tables(sf_dir)["edges"])


def kg_incremental_edges(sf_dir: str) -> Any:
    """Incremental-ingest proof: build the KG as two conversation-disjoint
    arrival batches through the resumable bucket machinery (per-increment
    manifest namespaces + a global re-finalize after each arrival). The
    result is guaranteed equal to the from-scratch build, so its oracle is
    the SAME SQL as kg_edges — incremental == full rebuild == DuckDB."""
    import hashlib

    tdir = transcripts_dir_for(sf_dir)
    work = os.path.join(
        "/tmp/neuroner_ray_data",
        "incr-" + hashlib.blake2b(tdir.encode(), digest_size=6).hexdigest(),
    )
    tables = kg.run_incremental(tdir, work, num_increments=2, num_buckets=2)
    return tables["edges"].drop_columns(["provenance"])


def kg_incremental_edges3(sf_dir: str) -> Any:
    """Incremental ingest at a second increment count (VERDICT r3 item 7):
    three arrival batches over three buckets — a different resplit shape
    than the n=2 variant, same invariant (incremental == full rebuild), so
    it shares the kg_edges oracle."""
    import hashlib

    tdir = transcripts_dir_for(sf_dir)
    work = os.path.join(
        "/tmp/neuroner_ray_data",
        "incr3-" + hashlib.blake2b(tdir.encode(), digest_size=6).hexdigest(),
    )
    tables = kg.run_incremental(tdir, work, num_increments=3, num_buckets=3)
    return tables["edges"].drop_columns(["provenance"])


def _mention_heavy_hitters_cached(sf_dir: str) -> Any:
    """O6 census over the (cached) pipeline mentions: top-10 surfaces."""
    import pyarrow as pa

    import ray.data as rd
    from neuroner_ray.runtime.skew import heavy_hitters

    top = heavy_hitters(_kg_tables(sf_dir)["mentions"], "surface", top_k=10)
    return rd.from_arrow(
        pa.table(
            {
                "surface": pa.array([k for k, _ in top], pa.string()),
                "n": pa.array([n for _, n in top], pa.int64()),
            }
        )
    )


# ROUND-5 DRIVER WINDOW ROTATION (VERDICT r4 item 1).  The driver's
# correctness gate checks the FIRST 50 entries of queries().  Rounds 1-4
# accumulated driver rows for 103 distinct entries (union of
# CORRECTNESS_r01..r04); this list rotates the window so round 5 verifies
# 50 entries with the OLDEST (or no) prior driver coverage:
#   - positions 0-2: similarity_topk_lsh / ivf / multi — last driver row
#     round 2 (VERDICT r4 names them explicitly as the rotation leads);
#   - positions 3-49: the 47 oldest NEVER-driver-verified entries, in
#     registry order (round-4 continuation batches: robust stats, splits,
#     audits, physical-design, quality/agreement metrics).
# Everything displaced below the window has a green round-4 driver row
# (CORRECTNESS_r04) or a green row in the committed full-registry replica
# sweeps (docs/CHECK_ORACLES_r4*.txt, union covers all 335 with 0 fails).
# After round 5 lands, all-time driver coverage reaches ~150/335 distinct
# entries.
_ROUND5_WINDOW = [
    "similarity_topk_lsh", "similarity_topk_ivf", "similarity_topk_multi",
    "doc_dedup_keep_longest", "events_value_mannwhitney",
    "events_hourly_xcorr", "events_hourly_holt", "doc_split_stratified",
    "corpus_phrase_hits", "events_user_rrf_top20", "lineitem_zonemap_skip",
    "events_value_winsorized_mean", "doc_kanonymity_audit", "orders_skyline",
    "orders_price_cume_dist", "events_value_equidepth", "embedding_dim_stats",
    "lineitem_weighted_median", "events_type_venn3", "events_type_decayed_top",
    "events_wow_contribution", "doc_split_leakage", "events_conversion_wilson",
    "events_raking_weights", "customer_share_of_region",
    "doc_sample_allocation", "join_plan_advisor", "events_user_spearman",
    "events_type_target_encoding", "events_user_cv_folds",
    "orders_basket_poisson_gof", "events_value_auc", "events_type_shrunk_rate",
    "events_type_value_mi", "events_value_quantiles_cont", "doc_langid_kappa",
    "events_user_hill_terms", "bloom_fpr_audit",
    "events_hour_value_binscatter", "events_gap_expfit_ks",
    "events_did_estimate", "corpus_oov_rate", "doc_cluster_purity",
    "kg_richclub", "corpus_token_coverage", "events_hourly_fano",
    "events_cuped_adjust", "events_late_arrival_audit", "part_jw_rescored",
    "events_km_factors",
]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.

    ORDERING CONTRACT: the driver's correctness gate checks the FIRST 50
    entries.  Round 5 rotates the window to the 50 entries with the oldest
    or no prior driver coverage — see _ROUND5_WINDOW above for the list and
    rationale.  The dict literal below keeps the round-4 curated order
    (its historical rationale follows); queries() moves _ROUND5_WINDOW to
    the front at the end, preserving relative order of everything else.

    Round-4 ordering rationale (historical): the driver's correctness gate
    checks the FIRST 50 of these entries. Priority order:
    (1) positions 0-11: never driver-verified AND judge-flagged (the r3
    graph-analytics suite, incremental ingest x2, TF-IDF, audio);
    (2) positions 12-22: the flagship KG core / multimodal / similarity
    variants whose last driver row is round 2 (kg_mentions/triples/nodes/
    edges/top_entities, media_image/video, mention_heavy_hitters,
    similarity_topk_lsh/ivf/multi) — VERDICT's done-criterion names them
    explicitly, so they ride inside the window ahead of the relational
    continuation batches;
    (3) positions 23-49: the oldest never-driver-verified round-4
    continuation entries (rollup/funnel/range-join/MG-sketch/corr/
    star-join/pivot/co-occurrence/unigram-LM/fuzzy-join/transitions/
    posting-lists/CMS/cube/chunks/redact/BPE/PMI/...);
    (4) positions 50+: the remaining round-4 batches (every one
    replica-gated at sf0.001 + sf0.01 AND replayed in the pytest suite —
    see tests/test_doc_oracle.py test_batch*_queries_match_oracles and
    the test_round4_* replays), then the long-green r2/r3 relational and
    text tail. Every entry past position 50 has a green row in
    CORRECTNESS_r03/r02 or in the committed full-registry replica logs
    (docs/CHECK_ORACLES_r4c.txt is a round-4 full sweep, 0 failures at
    sf0.01; docs/CHECK_ORACLES_r4d.txt covers the grown registry; the
    batch 21-24 additions are gated by their test replays and the
    per-batch replica runs recorded in SURVEY §18).
    """
    base = {
        # ---- driver correctness window (first 50): every kg_* and
        # ---- media_* entry (VERDICT r3 item 1) + the newest operator
        # ---- classes with no driver row yet. Everything below the
        # ---- window is covered by the committed full-registry replica
        # ---- artifact (tools/check_oracles.py at sf0.01) and pytest.
        "kg_pagerank": kg_pagerank,
        "kg_degree": kg_degree,
        "kg_components": kg_components,
        "kg_triangles": kg_triangles,
        "kg_bfs_levels": kg_bfs_levels,
        "kg_kcore": kg_kcore,
        "kg_neighbor_jaccard": kg_neighbor_jaccard,
        "kg_communities_lpa": kg_communities_lpa,
        "kg_hits": kg_hits,
        "kg_incremental_edges": kg_incremental_edges,
        "kg_incremental_edges3": kg_incremental_edges3,
        "kg_assortativity": kg_assortativity,
        "kg_edge_reciprocity": kg_edge_reciprocity,
        "kg_edge_weight_gini": kg_edge_weight_gini,
        "kg_twohop_reach": kg_twohop_reach,
        "kg_adamic_adar": kg_adamic_adar,
        "kg_clustering": kg_clustering,
        "kg_ktruss": kg_ktruss,
        "kg_mentions": kg_mentions,
        "kg_triples": kg_triples,
        "kg_nodes": kg_nodes,
        "kg_edges": kg_edges,
        "kg_top_entities": kg_top_entities,
        "media_image_features": q.media_image_features,
        "media_video_frames": q.media_video_frames,
        "media_audio_energy": q.media_audio_energy,
        "mention_heavy_hitters": _mention_heavy_hitters_cached,
        # window curation: kg_sssp/kg_ppr/snapshot_diff are NEVER
        # driver-verified, so they take the slots of the r2-green
        # similarity_topk_lsh/ivf/multi (now below the window)
        "kg_sssp": kg_sssp,
        "kg_ppr": kg_ppr,
        "events_snapshot_diff": q.events_snapshot_diff,
        "doc_tfidf_top50": q.doc_tfidf_top50,
        "token_freq_top100_mg": q.token_freq_top100_mg,
        "events_user_freq_cms": q.events_user_freq_cms,
        "events_user_count_kmv": q.events_user_count_kmv,
        "corpus_bpe_merges": q.corpus_bpe_merges,
        "doc_containment_pairs": q.doc_containment_pairs,
        "doc_winnowing_fp": q.doc_winnowing_fp,
        "doc_bm25_topk": q.doc_bm25_topk,
        "doc_bigram_logprob": q.doc_bigram_logprob,
        "embedding_semdedup": q.embedding_semdedup,
        "embedding_pq_codes": q.embedding_pq_codes,
        "embedding_sq8": q.embedding_sq8,
        "events_windowed_funnel": q.events_windowed_funnel,
        "events_attribution_linear": q.events_attribution_linear,
        "events_user_lifecycle": q.events_user_lifecycle,
        "events_markov_stationary": q.events_markov_stationary,
        "part_mincost_supplier_q2": q.part_mincost_supplier_q2,
        "corpus_zipf_fit": q.corpus_zipf_fit,
        "corpus_temperature_weights": q.corpus_temperature_weights,
        "events_funnel_window_sweep": q.events_funnel_window_sweep,
        "doc_dedup_keep_longest": q.doc_dedup_keep_longest,
        # ---- below the driver window: long-green relational/text ops
        # (new never-driver-checked entries queue here, first in line for
        # the round-5 window reorder)
        "similarity_topk_lsh": q.similarity_topk_lsh,
        "similarity_topk_ivf": q.similarity_topk_ivf,
        "similarity_topk_multi": q.similarity_topk_multi,
        "events_value_mannwhitney": q.events_value_mannwhitney,
        "events_hourly_xcorr": q.events_hourly_xcorr,
        "events_hourly_holt": q.events_hourly_holt,
        "doc_split_stratified": q.doc_split_stratified,
        "corpus_phrase_hits": q.corpus_phrase_hits,
        "events_user_rrf_top20": q.events_user_rrf_top20,
        "lineitem_zonemap_skip": q.lineitem_zonemap_skip,
        "events_value_winsorized_mean": q.events_value_winsorized_mean,
        "doc_kanonymity_audit": q.doc_kanonymity_audit,
        "orders_skyline": q.orders_skyline,
        "orders_price_cume_dist": q.orders_price_cume_dist,
        "events_value_equidepth": q.events_value_equidepth,
        "embedding_dim_stats": q.embedding_dim_stats,
        "lineitem_weighted_median": q.lineitem_weighted_median,
        "events_type_venn3": q.events_type_venn3,
        "events_type_decayed_top": q.events_type_decayed_top,
        "events_wow_contribution": q.events_wow_contribution,
        "doc_split_leakage": q.doc_split_leakage,
        "events_conversion_wilson": q.events_conversion_wilson,
        "events_raking_weights": q.events_raking_weights,
        "customer_share_of_region": q.customer_share_of_region,
        "doc_sample_allocation": q.doc_sample_allocation,
        "join_plan_advisor": q.join_plan_advisor,
        "events_user_spearman": q.events_user_spearman,
        "events_type_target_encoding": q.events_type_target_encoding,
        "events_user_cv_folds": q.events_user_cv_folds,
        "orders_basket_poisson_gof": q.orders_basket_poisson_gof,
        "events_value_auc": q.events_value_auc,
        "events_type_shrunk_rate": q.events_type_shrunk_rate,
        "events_type_value_mi": q.events_type_value_mi,
        "events_value_quantiles_cont": q.events_value_quantiles_cont,
        "doc_langid_kappa": q.doc_langid_kappa,
        "events_user_hill_terms": q.events_user_hill_terms,
        "bloom_fpr_audit": q.bloom_fpr_audit,
        "events_hour_value_binscatter": q.events_hour_value_binscatter,
        "events_gap_expfit_ks": q.events_gap_expfit_ks,
        "events_did_estimate": q.events_did_estimate,
        "corpus_oov_rate": q.corpus_oov_rate,
        "doc_cluster_purity": q.doc_cluster_purity,
        "kg_richclub": kg_richclub,
        "corpus_token_coverage": q.corpus_token_coverage,
        "events_hourly_fano": q.events_hourly_fano,
        "events_cuped_adjust": q.events_cuped_adjust,
        "events_late_arrival_audit": q.events_late_arrival_audit,
        "part_jw_rescored": q.part_jw_rescored,
        "events_km_factors": q.events_km_factors,
        "embedding_mutual_nn": q.embedding_mutual_nn,
        "events_pit_features": q.events_pit_features,
        "corpus_heaps_fit": q.corpus_heaps_fit,
        "doc_gopher_rules": q.doc_gopher_rules,
        "doc_minhash_estimate_audit": q.doc_minhash_estimate_audit,
        "events_l_diversity": q.events_l_diversity,
        "events_zorder_skip": q.events_zorder_skip,
        "doc_blocking_quality": q.doc_blocking_quality,
        "embedding_hard_negatives": q.embedding_hard_negatives,
        "embedding_mmr_topk": q.embedding_mmr_topk,
        "events_sortedness_audit": q.events_sortedness_audit,
        "embedding_retrieval_ndcg": q.embedding_retrieval_ndcg,
        "events_quantile_sketch_audit": q.events_quantile_sketch_audit,
        "events_fd_audit": q.events_fd_audit,
        "lineitem_encoding_advisor": q.lineitem_encoding_advisor,
        "events_voptimal_hist": q.events_voptimal_hist,
        "corpus_dedup_threshold_curve": q.corpus_dedup_threshold_curve,
        "lineitem_join_pruning_audit": q.lineitem_join_pruning_audit,
        "events_hourly_lttb": q.events_hourly_lttb,
        "embedding_ivf_recall_audit": q.embedding_ivf_recall_audit,
        "cluster_agreement_lex_sem": q.cluster_agreement_lex_sem,
        "doc_curriculum_order": q.doc_curriculum_order,
        "nation_customer_hhi": q.nation_customer_hhi,
        "events_user_burstiness": q.events_user_burstiness,
        "events_type_simpson": q.events_type_simpson,
        "events_type_load_factor": q.events_type_load_factor,
        "events_value_lorenz": q.events_value_lorenz,
        "events_dataset_card": q.events_dataset_card,
        "events_ab_srm_check": q.events_ab_srm_check,
        "events_type_cond_entropy_terms": q.events_type_cond_entropy_terms,
        "doc_compression_ratio": q.doc_compression_ratio,
        "doc_dedup_savings": q.doc_dedup_savings,
        "lineitem_selectivity_audit": q.lineitem_selectivity_audit,
        "lineitem_linenumber_gap_audit": q.lineitem_linenumber_gap_audit,
        "events_purchase_first_click": q.events_purchase_first_click,
        "events_value_anova_terms": q.events_value_anova_terms,
        "corpus_source_vocab_overlap": q.corpus_source_vocab_overlap,
        "orders_total_reconciliation": q.orders_total_reconciliation,
        "lineitem_price_qty_elasticity": q.lineitem_price_qty_elasticity,
        "doc_langid_confusion": q.doc_langid_confusion,
        "events_ab_power_mde": q.events_ab_power_mde,
        "orders_aging_report": q.orders_aging_report,
        "events_props_key_census": q.events_props_key_census,
        "events_churn_threshold_sweep": q.events_churn_threshold_sweep,
        "embedding_pair_cosine_hist": q.embedding_pair_cosine_hist,
        "corpus_hapax_rate": q.corpus_hapax_rate,
        "events_price_point_census": q.events_price_point_census,
        "events_type_session_position": q.events_type_session_position,
        "lineitem_return_rate_monthly": q.lineitem_return_rate_monthly,
        "events_runs_test": q.events_runs_test,
        "corpus_sentence_dup_census": q.corpus_sentence_dup_census,
        "corpus_bursty_terms_top20": q.corpus_bursty_terms_top20,
        "embedding_norm_hist": q.embedding_norm_hist,
        "events_attribution_time_decay": q.events_attribution_time_decay,
        "kg_degree_ccdf": kg_degree_ccdf,
        "kg_component_sizes": kg_component_sizes,
        "kg_predicate_census": kg_predicate_census,
        "kg_node_type_census": kg_node_type_census,
        "kg_edge_hygiene_audit": kg_edge_hygiene_audit,
        "kg_surface_variety": kg_surface_variety,
        "kg_transcript_profile": kg_transcript_profile,
        "kg_mention_density_hist": kg_mention_density_hist,
        "orders_rollup": q.orders_rollup,
        "events_funnel": q.events_funnel,
        "events_purchase_click_window": q.events_purchase_click_window,
        "events_moving_avg3": q.events_moving_avg3,
        "lineitem_profile": q.lineitem_profile,
        "events_props_k_by_type": q.events_props_k_by_type,
        "lineitem_corr": q.lineitem_corr,
        "profit_by_nation_year": q.profit_by_nation_year,
        "events_pivot_type_counts": q.events_pivot_type_counts,
        "events_type_cooccurrence": q.events_type_cooccurrence,
        "doc_unigram_logprob": q.doc_unigram_logprob,
        "part_fuzzy_pairs": q.part_fuzzy_pairs,
        "events_type_transitions": q.events_type_transitions,
        "corpus_posting_lists": q.corpus_posting_lists,
        "orders_cube": q.orders_cube,
        "doc_redact_terms": q.doc_redact_terms,
        "events_user_daily_gapfill": q.events_user_daily_gapfill,
        "events_value_ntile": q.events_value_ntile,
        "doc_sample_weighted": q.doc_sample_weighted,
        "doc_entropy": q.doc_entropy,
        "corpus_skipgram_top50": q.corpus_skipgram_top50,
        "events_type_user_hll": q.events_type_user_hll,
        "corpus_pmi_top50": q.corpus_pmi_top50,
        "doc_chunks": q.doc_chunks,
        "dedup_normalized": q.dedup_normalized,
        "events_time_to_next": q.events_time_to_next,
        "lineitem_qty_mad": q.lineitem_qty_mad,
        "events_type_value_quantiles": q.events_type_value_quantiles,
        "events_click_purchase_setops": q.events_click_purchase_setops,
        "events_user_dense_rank": q.events_user_dense_rank,
        "orders_above_customer_avg": q.orders_above_customer_avg,
        "nation_segments": q.nation_segments,
        "lineitem_charges_unpivot": q.lineitem_charges_unpivot,
        "events_click_no_purchase": q.events_click_no_purchase,
        "events_value_hist": q.events_value_hist,
        "events_value_outliers": q.events_value_outliers,
        "orders_monthly_mom": q.orders_monthly_mom,
        "events_user_window_1h": q.events_user_window_1h,
        "events_latest_per_user": q.events_latest_per_user,
        "fk_orphan_audit": q.fk_orphan_audit,
        "events_audience_overlap_hll": q.events_audience_overlap_hll,
        "nation_balance_full_outer": q.nation_balance_full_outer,
        "orders_priority_share": q.orders_priority_share,
        "events_user_rank_top3": q.events_user_rank_top3,
        "events_user_max_streak": q.events_user_max_streak,
        "events_selfjoin_size_cms": q.events_selfjoin_size_cms,
        "part_name_clusters": q.part_name_clusters,
        "events_user_gini": q.events_user_gini,
        "events_value_ks_drift": q.events_value_ks_drift,
        "events_sliding_distinct_users": q.events_sliding_distinct_users,
        "events_session_conversion": q.events_session_conversion,
        "events_table_fingerprint": q.events_table_fingerprint,
        "events_type_dow_chi2": q.events_type_dow_chi2,
        "events_cohort_retention": q.events_cohort_retention,
        "events_user_max_drawdown": q.events_user_max_drawdown,
        "events_value_trend_ols": q.events_value_trend_ols,
        "events_ab_conversion_ztest": q.events_ab_conversion_ztest,
        "events_session_paths_top20": q.events_session_paths_top20,
        "events_user_burst_max": q.events_user_burst_max,
        "events_rolling_zscore": q.events_rolling_zscore,
        "events_user_twa": q.events_user_twa,
        "events_user_hourly_locf": q.events_user_hourly_locf,
        "basket_brand_lift_top20": q.basket_brand_lift_top20,
        "orders_top20_diversified": q.orders_top20_diversified,
        "events_value_psi": q.events_value_psi,
        "events_user_rfm_segments": q.events_user_rfm_segments,
        "events_user_scd2": q.events_user_scd2,
        "events_value_benford": q.events_value_benford,
        "orders_fulfillment_lag": q.orders_fulfillment_lag,
        "events_duplicate_payments": q.events_duplicate_payments,
        "events_hourly_mase": q.events_hourly_mase,
        "events_hourly_acf24": q.events_hourly_acf24,
        "events_hourly_changepoint": q.events_hourly_changepoint,
        "events_quality_audit": q.events_quality_audit,
        "events_ltv_weekly": q.events_ltv_weekly,
        "events_purchase_survival": q.events_purchase_survival,
        "doc_top_terms": q.doc_top_terms,
        "events_new_behavior_adoption": q.events_new_behavior_adoption,
        "events_calibration_curve": q.events_calibration_curve,
        "corpus_top_terms_by_source": q.corpus_top_terms_by_source,
        "events_power_users_pareto": q.events_power_users_pareto,
        "events_dau_wau_stickiness": q.events_dau_wau_stickiness,
        "orders_order_gap_days": q.orders_order_gap_days,
        "part_abc_classification": q.part_abc_classification,
        "supplier_scorecard": q.supplier_scorecard,
        "events_error_rate_control": q.events_error_rate_control,
        "orders_shipping_priority_q3": q.orders_shipping_priority_q3,
        "events_concurrent_sessions": q.events_concurrent_sessions,
        "doc_pack_bins": q.doc_pack_bins,
        "revenue_by_nation_q5": q.revenue_by_nation_q5,
        "events_user_entropy_topk": q.events_user_entropy_topk,
        "lineitem_promo_share_q14": q.lineitem_promo_share_q14,
        "orders_large_volume_q18": q.orders_large_volume_q18,
        "doc_readability": q.doc_readability,
        "doc_jaccard_clusters": q.doc_jaccard_clusters,
        "corpus_keyness_g2": q.corpus_keyness_g2,
        "orders_returned_q10": q.orders_returned_q10,
        "events_hourly_ewma": q.events_hourly_ewma,
        "revenue_two_nation_q7": q.revenue_two_nation_q7,
        "doc_shingle_novelty": q.doc_shingle_novelty,
        "orders_custdist_q13": q.orders_custdist_q13,
        "events_value_bootstrap": q.events_value_bootstrap,
        "orders_waiting_supplier_q21": q.orders_waiting_supplier_q21,
        "part_supplier_cnt_q16": q.part_supplier_cnt_q16,
        "customers_lapsed_rich_q22": q.customers_lapsed_rich_q22,
        "nation_market_share_q8": q.nation_market_share_q8,
        "part_important_value_q11": q.part_important_value_q11,
        "orders_priority_late_q4": q.orders_priority_late_q4,
        "supplier_top_quarter_q15": q.supplier_top_quarter_q15,
        "part_smallqty_revenue_q17": q.part_smallqty_revenue_q17,
        "lineitem_forecast_revenue_q6": q.lineitem_forecast_revenue_q6,
        "lineitem_shipmode_q12": q.lineitem_shipmode_q12,
        "lineitem_disjunctive_q19": q.lineitem_disjunctive_q19,
        "events_hour_dow_seasonality": q.events_hour_dow_seasonality,
        "events_seasonal_anomaly": q.events_seasonal_anomaly,
        "users_all_event_types": q.users_all_event_types,
        "events_conversion_delay": q.events_conversion_delay,
        "embedding_centroid_outliers": q.embedding_centroid_outliers,
        "events_bounce_rate_weekly": q.events_bounce_rate_weekly,
        "orders_cohort_repeat_rate": q.orders_cohort_repeat_rate,
        "supplier_promo_stock_q20": q.supplier_promo_stock_q20,
        "events_type_trigrams_top20": q.events_type_trigrams_top20,
        "events_bot_users": q.events_bot_users,
        "token_freq_top100": q.token_freq_top100,
        "doc_token_counts": q.doc_token_counts,
        "doc_fingerprints": q.doc_fingerprints,
        "doc_quality": q.doc_quality,
        "dedup_exact": q.dedup_exact,
        "events_hourly": q.events_hourly,
        "events_top_types": q.events_top_types,
        "events_recent100": q.events_recent100,
        "events_user_count": q.events_user_count,
        "lineitem_pricing": q.lineitem_pricing,
        "lineitem_qty_stats": q.lineitem_qty_stats,
        "orders_by_nation": q.orders_by_nation,
        "similarity_topk": q.similarity_topk,
        "events_first_per_user_type": q.events_first_per_user_type,
        "events_sessions": q.events_sessions,
        "events_purchase_last_click": q.events_purchase_last_click,
        "lineitem_qty_quantiles": q.lineitem_qty_quantiles,
        "events_sliding_hourly": q.events_sliding_hourly,
        "lineitem_price_bands": q.lineitem_price_bands,
        "customers_with_orders_by_nation": q.customers_with_orders_by_nation,
        "customers_without_orders": q.customers_without_orders,
        "customers_without_orders_bloom": q.customers_without_orders_bloom,
        "customer_segments": q.customer_segments,
        "docs_by_lang_source": q.docs_by_lang_source,
        "orders_monthly": q.orders_monthly,
        "user_top_event_type": q.user_top_event_type,
        "account_balance_union": q.account_balance_union,
        "events_daily_retention": q.events_daily_retention,
        "events_cum_value": q.events_cum_value,
        "events_user_count_hll": q.events_user_count_hll,
        "events_value_quantiles": q.events_value_quantiles,
        "orders_top3_customers_by_nation": q.orders_top3_customers_by_nation,
        "doc_subword_counts": q.doc_subword_counts,
        "doc_rolling_fp": q.doc_rolling_fp,
        "doc_langid": q.doc_langid,
        "doc_simhash": q.doc_simhash,
        "doc_minhash_dedup": q.doc_minhash_dedup,
        "doc_ngram_jaccard_pairs": q.doc_ngram_jaccard_pairs,
        "doc_repetition": q.doc_repetition,
        "doc_split_assign": q.doc_split_assign,
        "doc_sample_per_source": q.doc_sample_per_source,
        "doc_contamination": q.doc_contamination,
        "corpus_bigram_top50": q.corpus_bigram_top50,
        "curated_shard_counts": curate.curated_shard_counts,
        "corpus_dup_shingles": q.corpus_dup_shingles,
        "lang_fertility": q.lang_fertility,
        "embedding_near_dup": q.embedding_near_dup,
        "embedding_kmeans": q.embedding_kmeans,
        "embedding_label_centroids": q.embedding_label_centroids,
        "embedding_pca_top1": q.embedding_pca_top1,
    }
    # Round-5 rotation: move the never/oldest-verified window to the front
    # (see _ROUND5_WINDOW).  Relative order of everything else is kept.
    out = {name: base[name] for name in _ROUND5_WINDOW}
    out.update((name, fn) for name, fn in base.items() if name not in out)
    return out


def _funnel_sweep_sql() -> str:
    """Three-window UNION of the windowed-funnel EXISTS SQL (mirrors
    queries.events_funnel_window_sweep's single-shuffle sweep)."""
    arms = []
    for w_s, iv in ((900, "15 MINUTE"), (3600, "1 HOUR"),
                    (21600, "6 HOUR")):
        arms.append(f"""
            SELECT {w_s} AS window_s, stage, count(*)::BIGINT AS n_users
            FROM (
                WITH u AS (SELECT DISTINCT user_id FROM events),
                v AS (SELECT DISTINCT user_id FROM events
                      WHERE event_type = 'view'),
                rc AS (SELECT DISTINCT e2.user_id, e2.ts
                       FROM events e1 JOIN events e2
                         ON e2.user_id = e1.user_id
                        AND e1.event_type = 'view'
                        AND e2.event_type = 'click'
                        AND e1.ts < e2.ts
                        AND e2.ts <= e1.ts + INTERVAL {iv}),
                rp AS (SELECT DISTINCT e3.user_id
                       FROM rc JOIN events e3
                         ON e3.user_id = rc.user_id
                        AND e3.event_type = 'purchase'
                        AND rc.ts < e3.ts
                        AND e3.ts <= rc.ts + INTERVAL {iv})
                SELECT u.user_id,
                       CASE WHEN rp.user_id IS NOT NULL THEN 3
                            WHEN rcu.user_id IS NOT NULL THEN 2
                            WHEN v.user_id IS NOT NULL THEN 1
                            ELSE 0 END AS stage
                FROM u
                LEFT JOIN rp ON rp.user_id = u.user_id
                LEFT JOIN (SELECT DISTINCT user_id FROM rc) rcu
                       ON rcu.user_id = u.user_id
                LEFT JOIN v ON v.user_id = u.user_id)
            GROUP BY stage""")
    return " UNION ALL ".join(arms)


_TOK = TOKEN_PATTERN  # the pattern is RE2-compatible as-is (SQL single-quoted)


def _zorder16_sql(u8: str, d8: str) -> str:
    """16-term integer expression mirroring ``queries._zorder16`` — the
    8+8-bit interleave (u bits odd, d bits even) in pure // and %
    arithmetic, so the oracle computes the identical Z-order key."""
    terms = []
    for i in range(8):
        terms.append(f"(({u8} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({d8} // {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def _markov_stationary_sql(iters: int = 12) -> str:
    """Unrolled-CTE mirror of ``q.events_markov_stationary`` (the
    kg_pagerank oracle precedent): pivot the transition census into 25
    exact-int scalars, derive the row-stochastic matrix with the same
    int/int divisions and zero-row identity self-loops, then unroll the
    power iteration with the identical left-associated add chains."""
    types = ("click", "error", "purchase", "signup", "view")
    ab = {t: t[0] for t in types}
    n_cols = ",\n                   ".join(
        f"coalesce(max(CASE WHEN prev_type = '{i}' AND next_type = '{j}' "
        f"THEN n END), 0) AS n_{ab[i]}{ab[j]}"
        for i in types
        for j in types
    )
    tot_cols = ",\n                   ".join(
        " + ".join(f"n_{ab[i]}{ab[j]}" for j in types) + f" AS t_{ab[i]}"
        for i in types
    )
    p_cols = ",\n                   ".join(
        f"CASE WHEN t_{ab[i]} = 0 THEN {'1.0' if i == j else '0.0'} "
        f"ELSE CAST(n_{ab[i]}{ab[j]} AS DOUBLE) / t_{ab[i]} END "
        f"AS p_{ab[i]}{ab[j]}"
        for i in types
        for j in types
    )
    iter_ctes = []
    prev = "i0"
    for k in range(1, iters + 1):
        cols = ",\n                   ".join(
            " + ".join(
                f"{prev}.v_{ab[i]} * p.p_{ab[i]}{ab[j]}" for i in types
            )
            + f" AS v_{ab[j]}"
            for j in types
        )
        iter_ctes.append(f"i{k} AS (SELECT {cols} FROM {prev}, pm p)")
        prev = f"i{k}"
    case_final = " ".join(f"WHEN '{t}' THEN {prev}.v_{ab[t]}" for t in types)
    values = ", ".join(f"('{t}')" for t in types)
    joined = ",\n            ".join(iter_ctes)
    return f"""
            WITH s AS (
                SELECT user_id, event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_type
                FROM events),
            tr AS (SELECT prev_type, event_type AS next_type, count(*) AS n
                   FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
            m AS (SELECT {n_cols},
                   count(*) AS nrows FROM tr),
            tm AS (SELECT *, {tot_cols} FROM m),
            pm AS (SELECT *, {p_cols} FROM tm),
            i0 AS (SELECT 0.2 AS v_c, 0.2 AS v_e, 0.2 AS v_p,
                          0.2 AS v_s, 0.2 AS v_v),
            {joined}
            SELECT t.event_type,
                   round(CASE t.event_type {case_final} END, 4) AS stationary
            FROM {prev}, pm, (VALUES {values}) AS t(event_type)
            WHERE pm.nrows > 0
            ORDER BY t.event_type
    """


def _langid_confusion_sql() -> str:
    """Confusion-matrix wrapper over the doc_langid oracle SQL."""
    from neuroner_ray.pipelines import doc_oracle as _do

    return f"""
        WITH pred AS ({_do.doc_langid_sql()})
        SELECT d.lang, p.lang_pred, count(*)::BIGINT AS n
        FROM documents d JOIN pred p ON p.doc_id = d.doc_id
        GROUP BY 1, 2 ORDER BY 1, 2
    """


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents (same column names, same rounding).

    The kg_* oracles run over the synthetic transcripts Parquet (the same
    input the kg_* queries read); the driver checks at sf0.01, so the SQL
    embeds that scale's cache path (override with GRAFT_ORACLE_SF_DIR for
    local checks at other scales). ``transcripts_dir_for`` materializes the
    cache if missing, so the oracle is runnable before any query.
    """
    from neuroner_ray.pipelines import doc_oracle as do
    from neuroner_ray.pipelines import kg_oracle as ko

    oracle_sf = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    tglob = transcripts_dir_for(oracle_sf) + "/*.parquet"
    stop_list = ", ".join(f"'{w}'" for w in q.STOPWORDS)
    return {
        "corpus_bpe_merges": do.corpus_bpe_merges_sql(),
        "doc_rolling_fp": do.doc_rolling_fp_sql(),
        "doc_langid": do.doc_langid_sql(),
        "doc_simhash": do.doc_simhash_sql(),
        "doc_minhash_dedup": do.doc_minhash_dedup_sql(),
        "doc_ngram_jaccard_pairs": do.doc_ngram_jaccard_pairs_sql(),
        "doc_containment_pairs": do.doc_containment_pairs_sql(),
        "doc_winnowing_fp": do.doc_winnowing_fp_sql(),
        "doc_dedup_keep_longest": do.doc_dedup_keep_longest_sql(),
        "embedding_centroid_outliers": do.embedding_centroid_outliers_sql(),
        "embedding_near_dup": do.embedding_near_dup_sql(),
        "embedding_kmeans": do.embedding_kmeans_sql(),
        "embedding_semdedup": do.embedding_semdedup_sql(),
        "embedding_pq_codes": do.embedding_pq_codes_sql(),
        "events_value_bootstrap": """
            WITH b AS (SELECT unnest(range(0, 8)) AS replica),
            e AS (
                SELECT CAST(round(value * 10000) AS BIGINT) AS v_e4,
                       md5_number_upper(event_id::VARCHAR) AS hu,
                       md5_number_lower(event_id::VARCHAR) AS hl
                FROM events),
            -- replica b reads the b-th 16-bit LE slice of md5(event_id);
            -- thresholds = floor(Poisson(1) CDF * 65536), count capped at 5
            u AS (
                SELECT b.replica, e.v_e4,
                       CASE WHEN b.replica < 4
                            THEN (e.hu >> (16 * b.replica)) & 65535
                            ELSE (e.hl >> (16 * (b.replica - 4))) & 65535
                       END AS u16
                FROM e, b),
            w AS (
                SELECT replica, v_e4,
                       CASE WHEN u16 < 24109 THEN 0
                            WHEN u16 < 48218 THEN 1
                            WHEN u16 < 60273 THEN 2
                            WHEN u16 < 64291 THEN 3
                            WHEN u16 < 65296 THEN 4
                            ELSE 5 END AS cnt
                FROM u)
            SELECT replica::BIGINT AS replica,
                   round(sum(cnt * v_e4)::DOUBLE / (10000.0 * sum(cnt)), 4)
                       AS boot_mean
            FROM w GROUP BY replica HAVING sum(cnt) > 0
        """,
        "orders_waiting_supplier_q21": """
            WITH l AS (
                SELECT l_orderkey, l_suppkey,
                       max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                           AS has_r
                FROM lineitem GROUP BY 1, 2),
            f AS (
                SELECT l.* FROM l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                            AND o.o_orderstatus = 'F'),
            g AS (
                SELECT l_orderkey, count(*) AS n_supp, sum(has_r) AS n_failed,
                       max(CASE WHEN has_r = 1 THEN l_suppkey END)
                           AS failed_supp
                FROM f GROUP BY 1)
            SELECT s.s_name, count(*)::BIGINT AS numwait
            FROM g JOIN supplier s ON s.s_suppkey = g.failed_supp
            WHERE g.n_supp >= 2 AND g.n_failed = 1
            GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20
        """,
        "doc_bigram_logprob": """
            WITH t AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9_]+') AS ws
                FROM documents),
            inst AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(ws)),
                                  i -> ws[i] || ' ' || ws[i+1])) AS bg,
                       unnest(list_transform(range(1, len(ws)),
                                  i -> ws[i])) AS w1
                FROM t WHERE len(ws) > 1),
            bgc AS (
                SELECT doc_id, bg, w1, count(*)::BIGINT AS cnt
                FROM inst GROUP BY 1, 2, 3),
            c12 AS (SELECT bg, sum(cnt)::BIGINT AS c FROM bgc GROUP BY bg),
            uni AS (
                SELECT w, count(*)::BIGINT AS c FROM (
                    SELECT unnest(ws) AS w FROM t) GROUP BY w),
            v AS (SELECT count(*)::BIGINT AS nv FROM uni)
            SELECT b.doc_id, sum(b.cnt)::BIGINT AS n_bigrams,
                   round(sum(b.cnt * ln(c12.c + 1))
                         - sum(b.cnt * ln(uni.c + v.nv)), 4) AS logprob
            FROM bgc b JOIN c12 USING (bg)
                 JOIN uni ON uni.w = b.w1 CROSS JOIN v
            GROUP BY b.doc_id
        """,
        "part_supplier_cnt_q16": """
            WITH ps AS (
                SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
                WHERE l_suppkey % 5 <> 0),
            j AS (
                SELECT p.p_brand, p.p_type, p.p_size, ps.l_suppkey
                FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
                WHERE p.p_brand <> 'Brand#13'
                  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49))
            SELECT p_brand, p_type, p_size::BIGINT AS p_size,
                   count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
            FROM j GROUP BY 1, 2, 3
        """,
        "customers_lapsed_rich_q22": """
            WITH pos AS (
                SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                FROM customer WHERE c_acctbal > 0),
            thr AS (SELECT sum(cents) AS sc, count(*)::BIGINT AS n FROM pos),
            cutoff AS (
                SELECT max(o_orderdate) - INTERVAL 365 DAY AS cut
                FROM orders),
            cand AS (
                SELECT c_custkey, c_mktsegment,
                       CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                FROM customer, thr
                WHERE CAST(round(c_acctbal * 100) AS BIGINT) * thr.n
                      > thr.sc),
            idle AS (
                SELECT * FROM cand
                WHERE NOT EXISTS (
                    SELECT 1 FROM orders o, cutoff
                    WHERE o.o_custkey = cand.c_custkey
                      AND o.o_orderdate >= cutoff.cut))
            SELECT c_mktsegment, count(*)::BIGINT AS numcust,
                   round(sum(cents) / 100.0, 4) AS totacctbal
            FROM idle GROUP BY 1
        """,
        "embedding_pca_top1": do.embedding_pca_top1_sql(),
        "similarity_topk_lsh": do.similarity_topk_sql(),
        "similarity_topk_ivf": do.similarity_topk_ivf_sql(oracle_sf),
        "media_image_features": do.media_image_features_sql(),
        "kg_mentions": ko.kg_mentions_sql(tglob),
        "kg_triples": ko.kg_triples_sql(tglob),
        "kg_nodes": ko.kg_nodes_sql(tglob),
        "kg_edges": ko.kg_edges_sql(tglob),
        # incremental build must equal the from-scratch build exactly
        "kg_incremental_edges": ko.kg_edges_sql(tglob),
        "kg_incremental_edges3": ko.kg_edges_sql(tglob),
        "kg_top_entities": ko.kg_top_entities_sql(tglob),
        "kg_pagerank": ko.kg_pagerank_sql(tglob),
        "kg_degree": ko.kg_degree_sql(tglob),
        "kg_assortativity": ko.kg_assortativity_sql(tglob),
        "kg_edge_reciprocity": ko.kg_edge_reciprocity_sql(tglob),
        "kg_edge_weight_gini": ko.kg_edge_weight_gini_sql(tglob),
        "doc_jaccard_clusters": do.doc_jaccard_clusters_sql(),
        "kg_components": ko.kg_components_sql(tglob),
        "kg_triangles": ko.kg_triangles_sql(tglob),
        "kg_bfs_levels": ko.kg_bfs_levels_sql(tglob),
        "kg_kcore": ko.kg_kcore_sql(tglob),
        "kg_neighbor_jaccard": ko.kg_neighbor_jaccard_sql(tglob),
        "kg_twohop_reach": ko.kg_twohop_sql(tglob),
        "kg_adamic_adar": ko.kg_adamic_adar_sql(tglob),
        "nation_market_share_q8": """
            WITH rev AS (
                SELECT l.l_orderkey,
                       CAST(round(l.l_extendedprice * 100) AS BIGINT) *
                       (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                           AS units,
                       CASE WHEN s.s_nationkey =
                                 (SELECT n_nationkey FROM nation
                                  WHERE n_name = 'NATION_19')
                            THEN 1 ELSE 0 END AS is_t
                FROM lineitem l
                JOIN supplier s ON s.s_suppkey = l.l_suppkey)
            SELECT year(o.o_orderdate)::BIGINT AS o_year,
                   round(sum(r.units * r.is_t)::DOUBLE / sum(r.units), 4)
                       AS mkt_share
            FROM rev r JOIN orders o ON o.o_orderkey = r.l_orderkey
            GROUP BY 1
        """,
        "orders_priority_late_q4": """
            WITH late AS (
                SELECT l_orderkey, max(l_shipdate) AS mx
                FROM lineitem GROUP BY 1)
            SELECT o.o_orderpriority, count(*)::BIGINT AS order_count
            FROM orders o JOIN late ON late.l_orderkey = o.o_orderkey
            WHERE late.mx > o.o_orderdate + INTERVAL 60 DAY
            GROUP BY 1
        """,
        "supplier_top_quarter_q15": """
            WITH rev AS (
                SELECT l_suppkey,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                           (100 - CAST(round(l_discount * 100) AS BIGINT)))
                           AS units
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY 1),
            mx AS (SELECT max(units) AS m FROM rev)
            SELECT s.s_name, round(r.units / 10000.0, 4) AS total_rev
            FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey, mx
            WHERE r.units = mx.m
        """,
        "part_smallqty_revenue_q17": """
            WITH pq AS (
                SELECT l.l_partkey,
                       sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS sq,
                       count(*)::BIGINT AS n
                FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                WHERE p.p_brand = 'Brand#2' GROUP BY 1)
            SELECT round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                          / 700.0, 4) AS avg_yearly
            FROM lineitem l JOIN pq ON pq.l_partkey = l.l_partkey
            WHERE CAST(round(l.l_quantity * 100) AS BIGINT) * 5 * pq.n < pq.sq
            HAVING count(*) > 0
        """,
        "part_important_value_q11": """
            WITH v AS (
                SELECT l_partkey,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                           (100 - CAST(round(l_discount * 100) AS BIGINT)))
                           AS units
                FROM lineitem GROUP BY l_partkey),
            tot AS (SELECT sum(units) AS t, count(*)::BIGINT AS n FROM v)
            SELECT l_partkey, round(units / 10000.0, 4) AS value
            FROM v, tot WHERE units * tot.n > tot.t
        """,
        "lineitem_forecast_revenue_q6": """
            SELECT round(coalesce(sum(
                       CAST(round(l_extendedprice * 100) AS BIGINT) *
                       CAST(round(l_discount * 100) AS BIGINT)), 0)
                   / 10000.0, 4) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
              AND CAST(round(l_quantity * 100) AS BIGINT) < 2400
        """,
        "lineitem_shipmode_q12": """
            SELECT l.l_returnflag,
                   sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
                   sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END)::BIGINT AS low_line_count
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
            GROUP BY 1
        """,
        "lineitem_disjunctive_q19": """
            WITH b AS (
                SELECT p_partkey,
                       CASE p_brand WHEN 'Brand#1' THEN 100
                                    WHEN 'Brand#2' THEN 1000
                                    ELSE 2000 END AS qlo,
                       CASE p_brand WHEN 'Brand#1' THEN 1100
                                    WHEN 'Brand#2' THEN 2000
                                    ELSE 3000 END AS qhi
                FROM part
                WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5)
                   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10)
                   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15))
            SELECT round(coalesce(sum(
                       CAST(round(l.l_extendedprice * 100) AS BIGINT) *
                       (100 - CAST(round(l.l_discount * 100) AS BIGINT))), 0)
                   / 10000.0, 4) AS revenue
            FROM lineitem l JOIN b ON b.p_partkey = l.l_partkey
            WHERE CAST(round(l.l_quantity * 100) AS BIGINT)
                      BETWEEN b.qlo AND b.qhi
        """,
        "kg_clustering": ko.kg_clustering_sql(tglob),
        "kg_hits": ko.kg_hits_sql(tglob),
        "kg_ktruss": ko.kg_ktruss_sql(tglob),
        "kg_sssp": ko.kg_sssp_sql(tglob),
        "kg_ppr": ko.kg_pagerank_sql(tglob, personalized=True),
        "kg_richclub": ko.kg_richclub_sql(tglob),
        "corpus_token_coverage": f"""
            WITH toks AS (
                SELECT unnest(regexp_extract_all(coalesce(text, ''),
                                                 '{_TOK}')) AS token
                FROM documents),
            cen AS (SELECT token, count(*)::BIGINT AS n
                    FROM toks GROUP BY 1),
            r AS (SELECT n,
                         sum(n) OVER (ORDER BY n DESC, token
                             ROWS UNBOUNDED PRECEDING) AS cum,
                         row_number() OVER (ORDER BY n DESC, token)
                             AS rk
                  FROM cen),
            t AS (SELECT sum(n) AS total FROM cen),
            p AS (SELECT unnest([50, 90, 99]) AS pct)
            SELECT p.pct::BIGINT AS pct,
                   min(r.rk)::BIGINT AS n_tokens,
                   min(r.cum)::BIGINT AS covered
            FROM p JOIN r ON 100 * r.cum >= p.pct * (SELECT total FROM t)
            GROUP BY 1
        """,
        "events_hourly_fano": """
            WITH c AS (SELECT epoch_us(ts) // 3600000000 AS h,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1),
            t AS (SELECT max(h) - min(h) + 1 AS span,
                         sum(n) AS s1, sum(n * n) AS s2
                  FROM c)
            SELECT span::BIGINT AS n_hours,
                   round(s1 / CAST(span AS DOUBLE), 4) AS mean_per_hour,
                   CASE WHEN s1 = 0 THEN NULL
                        ELSE round((s2 / CAST(span AS DOUBLE)
                               - (s1 / CAST(span AS DOUBLE))
                                 * (s1 / CAST(span AS DOUBLE)))
                              / (s1 / CAST(span AS DOUBLE)), 4)
                   END AS fano
            FROM t WHERE span IS NOT NULL
        """,
        "events_cuped_adjust": """
            WITH b AS (SELECT min(epoch_us(ts)) AS tmin,
                              max(epoch_us(ts)) AS tmax FROM events),
            cut AS (SELECT tmin + (tmax - tmin) // 2 AS t1 FROM b),
            u AS (SELECT user_id,
                         sum(CASE WHEN event_type = 'purchase'
                                   AND epoch_us(ts) <= (SELECT t1 FROM cut)
                                  THEN CAST(round(value * 100) AS BIGINT)
                                  ELSE 0 END)::BIGINT AS x,
                         sum(CASE WHEN event_type = 'purchase'
                                   AND epoch_us(ts) > (SELECT t1 FROM cut)
                                  THEN CAST(round(value * 100) AS BIGINT)
                                  ELSE 0 END)::BIGINT AS y
                  FROM events GROUP BY 1),
            a AS (SELECT md5_number_upper(user_id::VARCHAR) % 2 AS arm,
                         count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                         sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
                         sum(x * x)::BIGINT AS sx2
                  FROM u GROUP BY 1),
            g AS (SELECT sum(n)::BIGINT AS n, sum(sx)::BIGINT AS sx,
                         sum(sy)::BIGINT AS sy, sum(sxy)::BIGINT AS sxy,
                         sum(sx2)::BIGINT AS sx2
                  FROM a),
            s AS (SELECT sx / n AS mxc, sy / n AS myc,
                         sx2 / n - (sx / n) * (sx / n) AS var FROM g),
            t AS (SELECT mxc,
                         (( SELECT sxy / n FROM g) - mxc * myc) / var
                             AS theta
                  FROM s),
            m AS (SELECT (SELECT sx / n FROM a WHERE arm = 0) AS mx0,
                         (SELECT sy / n FROM a WHERE arm = 0) AS my0,
                         (SELECT sx / n FROM a WHERE arm = 1) AS mx1,
                         (SELECT sy / n FROM a WHERE arm = 1) AS my1,
                         (SELECT theta FROM t) AS theta,
                         (SELECT mxc FROM t) AS mxc)
            SELECT round(theta, 6) AS theta,
                   round(my0 / 100.0, 4) AS m_ctrl,
                   round(my1 / 100.0, 4) AS m_treat,
                   round((my0 - theta * (mx0 - mxc)) / 100.0, 4) AS adj_ctrl,
                   round((my1 - theta * (mx1 - mxc)) / 100.0, 4) AS adj_treat,
                   round((my1 - my0) / 100.0, 4) AS lift_naive,
                   round(((my1 - theta * (mx1 - mxc))
                          - (my0 - theta * (mx0 - mxc))) / 100.0, 4)
                       AS lift_cuped
            FROM m
            WHERE (SELECT count(*) FROM a) = 2
              AND (SELECT var FROM s) <> 0
        """,
        "events_late_arrival_audit": """
            WITH s AS (SELECT epoch_us(ts) AS us,
                              max(epoch_us(ts)) OVER (
                                  PARTITION BY user_id ORDER BY event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) AS wm
                       FROM events)
            SELECT count(*)::BIGINT AS n_events,
                   sum(CASE WHEN us < wm THEN 1 ELSE 0 END)::BIGINT
                       AS n_late,
                   round(sum(CASE WHEN us < wm THEN 1 ELSE 0 END)
                         / CAST(count(*) AS DOUBLE), 6) AS late_rate,
                   coalesce(max(CASE WHEN us < wm THEN wm - us END),
                            0)::BIGINT AS max_lateness_us,
                   coalesce(sum(CASE WHEN us < wm THEN wm - us ELSE 0 END),
                            0)::BIGINT AS sum_lateness_us
            FROM s HAVING count(*) > 0
        """,
        "part_jw_rescored": """
            WITH nm AS (SELECT DISTINCT p_name FROM part),
            pr AS (SELECT a.p_name AS name_a, b.p_name AS name_b,
                          levenshtein(a.p_name, b.p_name)::BIGINT AS dist
                   FROM nm a JOIN nm b ON a.p_name < b.p_name
                   WHERE levenshtein(a.p_name, b.p_name) <= 2)
            SELECT name_a, name_b, dist,
                   round(jaro_winkler_similarity(name_a, name_b), 6) AS jw
            FROM pr
            ORDER BY round(jaro_winkler_similarity(name_a, name_b), 6) DESC,
                     name_a, name_b
            LIMIT 50
        """,
        "events_km_factors": """
            WITH pu AS (SELECT user_id,
                               min(epoch_us(ts)) AS t0,
                               max(epoch_us(ts)) AS tl,
                               min(CASE WHEN event_type = 'purchase'
                                        THEN epoch_us(ts) END) AS tp
                        FROM events GROUP BY 1),
            d AS (SELECT CASE WHEN tp IS NOT NULL
                              THEN (tp - t0) // 86400000000
                              ELSE (tl - t0) // 86400000000 END AS t,
                         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
                  FROM pu),
            cen AS (SELECT t, sum(ev)::BIGINT AS d, count(*)::BIGINT AS n
                    FROM d GROUP BY 1),
            r AS (SELECT t, d, n,
                         sum(n) OVER (ORDER BY t DESC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS n_risk
                  FROM cen)
            SELECT t::BIGINT AS day, n_risk::BIGINT AS n_risk,
                   d::BIGINT AS n_events, (n - d)::BIGINT AS n_censored,
                   round((n_risk - d) / CAST(n_risk AS DOUBLE), 6)
                       AS km_factor
            FROM r WHERE d > 0 ORDER BY day
        """,
        "embedding_mutual_nn": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            s AS (SELECT a.vec_id AS i, b.vec_id AS j,
                         round(list_cosine_similarity(a.v, b.v), 6) AS c
                  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
            nn AS (SELECT i, j, c FROM (
                     SELECT i, j, c,
                            row_number() OVER (PARTITION BY i
                                               ORDER BY c DESC, j ASC) AS rn
                     FROM s) WHERE rn = 1),
            p AS (SELECT least(i, j) AS lo, greatest(i, j) AS hi,
                         max(c) AS cos, count(*) AS n
                  FROM nn GROUP BY 1, 2)
            SELECT lo::BIGINT AS id_a, hi::BIGINT AS id_b,
                   round(cos, 6) AS cos
            FROM p WHERE n = 2 ORDER BY id_a, id_b
        """,
        "events_pit_features": """
            WITH s AS (SELECT event_id, event_type,
                              sum(CASE WHEN event_type = 'click'
                                       THEN 1 ELSE 0 END) OVER w AS pcl,
                              sum(CASE WHEN event_type = 'purchase'
                                       THEN CAST(round(value * 100)
                                                 AS BIGINT)
                                       ELSE 0 END) OVER w AS pce
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING))
            SELECT event_id,
                   coalesce(pcl, 0)::BIGINT AS prior_clicks,
                   coalesce(pce, 0)::BIGINT AS prior_purchase_cents
            FROM s WHERE event_type = 'purchase' ORDER BY event_id
        """,
        "corpus_heaps_fit": f"""
            WITH mx AS (SELECT max(doc_id) AS m FROM documents),
            tok AS (
                SELECT (doc_id * 256) // ((SELECT m FROM mx) + 1) AS bucket,
                       unnest(regexp_extract_all(coalesce(text, ''),
                                                 '{_TOK}')) AS token
                FROM documents),
            tb AS (SELECT token, bucket, count(*)::BIGINT AS n
                   FROM tok GROUP BY 1, 2),
            bt AS (SELECT bucket, sum(n)::BIGINT AS nt FROM tb GROUP BY 1),
            fb AS (SELECT token, min(bucket) AS fbk FROM tb GROUP BY 1),
            nv AS (SELECT fbk AS bucket, count(*)::BIGINT AS nnew
                   FROM fb GROUP BY 1),
            cur AS (
                SELECT bt.bucket,
                       sum(bt.nt) OVER (ORDER BY bt.bucket) AS cum_n,
                       sum(coalesce(nv.nnew, 0)) OVER (ORDER BY bt.bucket)
                           AS cum_v
                FROM bt LEFT JOIN nv ON nv.bucket = bt.bucket),
            r AS (SELECT ln(cum_n::DOUBLE) AS x, ln(cum_v::DOUBLE) AS y
                  FROM cur),
            s AS (SELECT count(*)::BIGINT AS k, sum(x) AS sx, sum(y) AS sy,
                         sum(x * x) AS sxx, sum(y * y) AS syy,
                         sum(x * y) AS sxy
                  FROM r)
            SELECT k AS n_points,
                   round((k * sxy - sx * sy) / (k * sxx - sx * sx), 4)
                       AS beta,
                   round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx)
                          * sx) / k, 4) AS ln_k,
                   round(CASE WHEN k * syy - sy * sy = 0 THEN 1.0
                         ELSE ((k * sxy - sx * sy) * (k * sxy - sx * sy))
                              / ((k * sxx - sx * sx) * (k * syy - sy * sy))
                         END, 4) AS r2
            FROM s WHERE k >= 2
        """,
        "doc_gopher_rules": f"""
            WITH w AS (
                SELECT doc_id, coalesce(text, '') AS txt,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9_]+') AS ws
                FROM documents),
            f AS (
                SELECT doc_id, ws, len(ws)::BIGINT AS nw,
                       len(regexp_extract_all(txt, '[^A-Za-z0-9_\\s]'))::BIGINT
                           AS n_punct
                FROM w),
            r AS (
                SELECT doc_id,
                       CASE WHEN nw BETWEEN 20 AND 80 THEN 1 ELSE 0 END
                           AS r_word_count,
                       CASE WHEN list_sum(list_transform(ws,
                                      x -> length(x)))
                                 / CAST(nullif(nw, 0) AS DOUBLE)
                                 BETWEEN 3.0 AND 10.0
                            THEN 1 ELSE 0 END AS r_mean_word_len,
                       CASE WHEN n_punct / CAST(nullif(nw, 0) AS DOUBLE)
                                 <= 0.15
                            THEN 1 ELSE 0 END AS r_symbol_ratio,
                       CASE WHEN len(list_filter(ws,
                                      x -> regexp_matches(x, '[a-z]')))
                                 / CAST(nullif(nw, 0) AS DOUBLE) > 0.8
                            THEN 1 ELSE 0 END AS r_alpha_frac,
                       CASE WHEN len(list_intersect(list_distinct(ws),
                                      [{stop_list}])) >= 2
                            THEN 1 ELSE 0 END AS r_stopwords
                FROM f)
            SELECT doc_id,
                   r_word_count::BIGINT AS r_word_count,
                   r_mean_word_len::BIGINT AS r_mean_word_len,
                   r_symbol_ratio::BIGINT AS r_symbol_ratio,
                   r_alpha_frac::BIGINT AS r_alpha_frac,
                   r_stopwords::BIGINT AS r_stopwords,
                   (r_word_count * r_mean_word_len * r_symbol_ratio
                    * r_alpha_frac * r_stopwords)::BIGINT AS pass_all
            FROM r
        """,
        "doc_minhash_estimate_audit": do.minhash_estimate_audit_sql(oracle_sf),
        "events_l_diversity": """
            WITH b AS (SELECT event_type AS et,
                              (epoch_us(ts) // 3600000000) % 24 AS hod,
                              CAST(round(value * 100) AS BIGINT) // 5000
                                  AS vb,
                              user_id
                       FROM events),
            qu AS (SELECT et, hod, vb, user_id, count(*) AS n
                   FROM b GROUP BY 1, 2, 3, 4),
            c AS (SELECT et, hod, vb, count(*)::BIGINT AS nu,
                         sum(n)::BIGINT AS nr
                  FROM qu GROUP BY 1, 2, 3)
            SELECT count(*)::BIGINT AS n_classes,
                   min(nu)::BIGINT AS min_user_diversity,
                   sum(CASE WHEN nu < 3 THEN 1 ELSE 0 END)::BIGINT
                       AS n_classes_below_l,
                   sum(CASE WHEN nu < 3 THEN nr ELSE 0 END)::BIGINT
                       AS n_rows_at_risk
            FROM c
        """,
        "events_zorder_skip": f"""
            WITH base AS (SELECT user_id AS u, epoch_us(ts) AS us,
                                 epoch_us(ts) // 86400000000 AS day
                          FROM events),
            zb AS (SELECT u, us, day, u % 256 AS u8, day % 256 AS d8
                   FROM base),
            z AS (SELECT u, us, day,
                         ({_zorder16_sql("u8", "d8")}) AS zval
                  FROM zb),
            zc AS (SELECT zval, min(u) AS mnu, max(u) AS mxu,
                          min(us) AS mnt, max(us) AS mxt,
                          count(*)::BIGINT AS n
                   FROM z GROUP BY 1),
            zf AS (SELECT (coalesce(sum(n) OVER (ORDER BY zval
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) * 64)
                              // (SELECT count(*) FROM base) AS fid,
                          mnu, mxu, mnt, mxt, n
                   FROM zc),
            f AS (
                SELECT 'day_clustered' AS layout, day AS fid, u, us FROM z
                UNION ALL
                SELECT 'user_mod', u % 64, u, us FROM z),
            zm AS (SELECT layout, fid, min(u) AS mnu, max(u) AS mxu,
                          min(us) AS mnt, max(us) AS mxt,
                          count(*)::BIGINT AS n
                   FROM f GROUP BY 1, 2
                   UNION ALL
                   SELECT 'zorder', fid, min(mnu), max(mxu), min(mnt),
                          max(mxt), sum(n)::BIGINT
                   FROM zf GROUP BY 2),
            probe AS (SELECT (min(us) // 86400000000 + 10) * 86400000000
                                 AS lo,
                             (min(us) // 86400000000 + 20) * 86400000000
                                 AS hi,
                             min(u) + (max(u) - min(u) + 1) // 3 AS ulo,
                             min(u) + (2 * (max(u) - min(u) + 1)) // 3
                                 AS uhi
                      FROM base)
            SELECT layout, count(*)::BIGINT AS n_files,
                   sum(CASE WHEN mxu < (SELECT ulo FROM probe)
                                 OR mnu >= (SELECT uhi FROM probe)
                                 OR mxt < (SELECT lo FROM probe)
                                 OR mnt >= (SELECT hi FROM probe)
                            THEN 1 ELSE 0 END)::BIGINT AS n_skippable,
                   sum(CASE WHEN mxu < (SELECT ulo FROM probe)
                                 OR mnu >= (SELECT uhi FROM probe)
                                 OR mxt < (SELECT lo FROM probe)
                                 OR mnt >= (SELECT hi FROM probe)
                            THEN n ELSE 0 END)::BIGINT AS n_rows_skipped
            FROM zm GROUP BY layout ORDER BY layout
        """,
        "doc_blocking_quality": do.doc_blocking_quality_sql(oracle_sf),
        "embedding_hard_negatives": """
            WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                       FROM embeddings),
            s AS (SELECT a.vec_id AS i, b.vec_id AS j,
                         round(list_cosine_similarity(a.v, b.v), 6) AS c
                  FROM e a JOIN e b ON a.label <> b.label),
            nn AS (SELECT i, j, c FROM (
                     SELECT i, j, c,
                            row_number() OVER (PARTITION BY i
                                               ORDER BY c DESC, j ASC) AS rn
                     FROM s) WHERE rn = 1)
            SELECT i::BIGINT AS vec_id, j::BIGINT AS neg_id, c AS cos
            FROM nn ORDER BY vec_id
        """,
        "embedding_mmr_topk": do.embedding_mmr_topk_sql(oracle_sf),
        "embedding_retrieval_ndcg": """
            WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                       FROM embeddings),
            q AS (SELECT v, label FROM e WHERE vec_id = 0),
            s AS (SELECT e.vec_id,
                         CASE WHEN e.label = (SELECT label FROM q)
                              THEN 1 ELSE 0 END AS rel,
                         round(list_cosine_similarity(
                             e.v, (SELECT v FROM q)), 6) AS c
                  FROM e WHERE e.vec_id <> 0),
            rk AS (SELECT vec_id, rel, c,
                          row_number() OVER (ORDER BY c DESC, vec_id ASC)
                              AS rnk
                   FROM s),
            nr AS (SELECT sum(rel)::BIGINT AS n FROM s)
            SELECT rnk::BIGINT AS rank, vec_id, rel::BIGINT AS rel,
                   round(rel / log2(rnk + 1.0), 6) AS gain,
                   round(CASE WHEN rnk <= (SELECT n FROM nr)
                              THEN 1.0 / log2(rnk + 1.0) ELSE 0.0 END, 6)
                       AS ideal_gain
            FROM rk WHERE rnk <= 10 ORDER BY rank
        """,
        "events_quantile_sketch_audit": """
            WITH mm AS (SELECT min(value) AS lo, max(value) AS hi,
                               count(*)::BIGINT AS n
                        FROM events),
            b AS (SELECT CASE WHEN mm.hi = mm.lo THEN 0.0
                              ELSE least(floor((e.value - mm.lo) * 20.0
                                               / (mm.hi - mm.lo)), 19.0)
                         END AS fbin
                  FROM events e, mm),
            h AS (SELECT fbin::BIGINT AS bin, count(*)::BIGINT AS bn
                  FROM b GROUP BY 1),
            c AS (SELECT bin, bn,
                         sum(bn) OVER (ORDER BY bin) - bn AS cb
                  FROM h),
            ps(p) AS (VALUES (0.5), (0.9), (0.99)),
            r AS (SELECT p, ceil(p * (SELECT n FROM mm))::BIGINT AS rk
                  FROM ps),
            pick AS (SELECT r.p, r.rk, c.bin, c.bn, c.cb
                     FROM r JOIN c ON c.cb < r.rk AND c.cb + c.bn >= r.rk),
            est AS (SELECT p,
                           (SELECT lo FROM mm)
                           + ((SELECT hi FROM mm) - (SELECT lo FROM mm))
                             / 20.0
                             * (bin + (rk - cb) * 1.0 / bn) AS e
                    FROM pick),
            ex AS (SELECT quantile_disc(value, 0.5) AS e50,
                          quantile_disc(value, 0.9) AS e90,
                          quantile_disc(value, 0.99) AS e99
                   FROM events)
            SELECT p,
                   round(CASE p WHEN 0.5 THEN e50 WHEN 0.9 THEN e90
                         ELSE e99 END, 4) AS exact,
                   round(e, 4) AS est,
                   round(abs(e - CASE p WHEN 0.5 THEN e50
                                 WHEN 0.9 THEN e90 ELSE e99 END), 4)
                       AS err
            FROM est, ex ORDER BY p
        """,
        "lineitem_encoding_advisor": """
            WITH nn AS (SELECT count(*)::BIGINT AS n FROM lineitem),
            arms AS (
                SELECT 'l_linestatus' AS col, 'varchar' AS kind,
                       count(DISTINCT l_linestatus)::BIGINT AS nd,
                       (sum(length(l_linestatus))
                        + 4 * count(*))::BIGINT AS raw,
                       (SELECT sum(length(v))::BIGINT FROM
                        (SELECT DISTINCT l_linestatus AS v FROM lineitem))
                           AS dlen
                FROM lineitem
                UNION ALL
                SELECT 'l_orderkey', 'fixed8',
                       count(DISTINCT l_orderkey)::BIGINT,
                       8 * (SELECT n FROM nn), 0
                FROM lineitem
                UNION ALL
                SELECT 'l_quantity', 'fixed8',
                       count(DISTINCT l_quantity)::BIGINT,
                       8 * (SELECT n FROM nn), 0
                FROM lineitem
                UNION ALL
                SELECT 'l_returnflag', 'varchar',
                       count(DISTINCT l_returnflag)::BIGINT,
                       (sum(length(l_returnflag))
                        + 4 * count(*))::BIGINT,
                       (SELECT sum(length(v))::BIGINT FROM
                        (SELECT DISTINCT l_returnflag AS v FROM lineitem))
                FROM lineitem),
            d AS (SELECT col, kind, nd, raw,
                         (CASE WHEN kind = 'varchar' THEN dlen + 4 * nd
                               ELSE 8 * nd END)
                         + (CASE WHEN nd <= 256 THEN 1
                                 WHEN nd <= 65536 THEN 2 ELSE 4 END)
                           * (SELECT n FROM nn) AS dict_bytes
                  FROM arms)
            SELECT col AS "column", (SELECT n FROM nn) AS n_rows,
                   nd AS n_distinct, raw AS raw_bytes, dict_bytes,
                   round(dict_bytes / CAST(raw AS DOUBLE), 6) AS ratio,
                   (CASE WHEN dict_bytes < raw THEN 1 ELSE 0 END)::BIGINT
                       AS use_dict
            FROM d ORDER BY col
        """,
        "events_voptimal_hist": do.events_voptimal_hist_sql(oracle_sf),
        "corpus_dedup_threshold_curve":
            do.corpus_dedup_threshold_curve_sql(oracle_sf),
        "lineitem_join_pruning_audit": """
            WITH fm AS (SELECT min(year(o_orderdate) * 12
                                   + month(o_orderdate) - 1) AS m
                        FROM orders),
            fk AS (SELECT DISTINCT o_orderkey AS key FROM orders
                   WHERE year(o_orderdate) * 12 + month(o_orderdate) - 1
                         = (SELECT m FROM fm)),
            kb AS (SELECT min(key) AS kmin, max(key) AS kmax FROM fk),
            mk AS (SELECT max(l_orderkey) AS mx FROM lineitem),
            f AS (
                SELECT 'orderkey_range' AS layout,
                       l_orderkey * 64 // ((SELECT mx FROM mk) + 1) AS fid,
                       l_orderkey AS k,
                       CASE WHEN l_orderkey IN (SELECT key FROM fk)
                            THEN 1 ELSE 0 END AS m
                FROM lineitem
                UNION ALL
                SELECT 'shipdate_clustered',
                       year(l_shipdate) * 12 + month(l_shipdate) - 1,
                       l_orderkey,
                       CASE WHEN l_orderkey IN (SELECT key FROM fk)
                            THEN 1 ELSE 0 END
                FROM lineitem),
            zm AS (SELECT layout, fid, count(*)::BIGINT AS n,
                          min(k) AS mnk, max(k) AS mxk,
                          sum(m)::BIGINT AS nm
                   FROM f GROUP BY 1, 2)
            SELECT layout, count(*)::BIGINT AS n_files,
                   sum(CASE WHEN mxk < (SELECT kmin FROM kb)
                                 OR mnk > (SELECT kmax FROM kb)
                            THEN 1 ELSE 0 END)::BIGINT AS zm_skippable,
                   sum(CASE WHEN nm = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS perfect_skippable,
                   sum(CASE WHEN mxk < (SELECT kmin FROM kb)
                                 OR mnk > (SELECT kmax FROM kb)
                            THEN 0 ELSE n END)::BIGINT AS rows_scanned_zm,
                   sum(CASE WHEN nm = 0 THEN 0 ELSE n END)::BIGINT
                       AS rows_scanned_perfect
            FROM zm GROUP BY layout ORDER BY layout
        """,
        "events_hourly_lttb": do.events_hourly_lttb_sql(oracle_sf),
        "cluster_agreement_lex_sem": do.cluster_agreement_sql(),
        "doc_curriculum_order": """
            WITH w AS (SELECT doc_id, coalesce(text, '') AS txt,
                              regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z0-9_]+') AS ws
                       FROM documents),
            dw AS (SELECT doc_id, unnest(list_distinct(ws)) AS tok FROM w),
            dfc AS (SELECT tok, count(*)::BIGINT AS df FROM dw GROUP BY 1),
            rare AS (SELECT d.doc_id, count(*)::BIGINT AS nd,
                            sum(CASE WHEN f.df < 3 THEN 1 ELSE 0 END)::BIGINT
                                AS nr
                     FROM dw d JOIN dfc f ON f.tok = d.tok GROUP BY 1),
            base AS (SELECT w.doc_id, len(ws)::BIGINT AS nw,
                            len(regexp_extract_all(txt,
                                '[^A-Za-z0-9_\\s]'))::BIGINT AS n_punct,
                            coalesce(r.nd, 0) AS nd, coalesce(r.nr, 0) AS nr
                     FROM w LEFT JOIN rare r ON r.doc_id = w.doc_id),
            s AS (SELECT doc_id, nw,
                         CASE WHEN nd = 0 THEN 0.0
                              ELSE nr / CAST(nd AS DOUBLE) END AS rare_f,
                         least(nw, 100) / 100.0 AS len_c,
                         CASE WHEN nw = 0 THEN 0.0
                              ELSE least(n_punct / CAST(nw AS DOUBLE), 1.0)
                         END AS punct_c
                  FROM base)
            SELECT doc_id, nw AS n_words, round(rare_f, 6) AS rare_frac,
                   round(0.4 * len_c + 0.3 * punct_c + 0.3 * rare_f, 6)
                       AS difficulty
            FROM s
        """,
        "events_user_burstiness": """
            WITH l AS (SELECT user_id,
                              epoch_us(ts) // 1000000 AS s,
                              lag(epoch_us(ts) // 1000000) OVER (
                                  PARTITION BY user_id ORDER BY ts) AS ps
                       FROM events),
            g AS (SELECT user_id, s - ps AS gp FROM l
                  WHERE ps IS NOT NULL),
            a AS (SELECT user_id, count(*)::BIGINT AS n,
                         sum(gp)::BIGINT AS s, sum(gp * gp)::BIGINT AS ss
                  FROM g GROUP BY 1),
            m AS (SELECT user_id, n, s / CAST(n AS DOUBLE) AS mu,
                         ss / CAST(n AS DOUBLE)
                         - (s / CAST(n AS DOUBLE))
                           * (s / CAST(n AS DOUBLE)) AS var
                  FROM a WHERE n >= 2)
            SELECT user_id, n AS n_gaps, round(mu, 4) AS mean_gap_s,
                   round(CASE WHEN sqrt(greatest(var, 0)) + mu > 0
                              THEN (sqrt(greatest(var, 0)) - mu)
                                   / (sqrt(greatest(var, 0)) + mu)
                              ELSE 0.0 END, 6) AS burstiness
            FROM m ORDER BY user_id
        """,
        "events_type_cond_entropy_terms": """
            WITH s AS (
                SELECT user_id, event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_type
                FROM events),
            c AS (SELECT prev_type, event_type AS next_type,
                         count(*)::BIGINT AS n_pn
                  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT prev_type, sum(n_pn)::BIGINT AS n_p
                    FROM c GROUP BY 1)
            SELECT c.prev_type, c.next_type, c.n_pn, tot.n_p,
                   round(c.n_pn * log2(tot.n_p / CAST(c.n_pn AS DOUBLE)),
                         6) AS term
            FROM c JOIN tot ON tot.prev_type = c.prev_type
            ORDER BY c.prev_type, c.next_type
        """,
        "doc_compression_ratio": do.doc_compression_ratio_sql(oracle_sf),
        "doc_dedup_savings": do.doc_dedup_savings_sql(),
        "lineitem_linenumber_gap_audit": """
            WITH g AS (SELECT l_orderkey, count(*)::BIGINT AS n,
                              count(DISTINCT l_linenumber)::BIGINT AS nd,
                              max(l_linenumber)::BIGINT AS mx,
                              min(l_linenumber)::BIGINT AS mn
                       FROM lineitem GROUP BY 1)
            SELECT count(*)::BIGINT AS n_orders,
                   sum(CASE WHEN nd < n THEN 1 ELSE 0 END)::BIGINT
                       AS n_dup_lines,
                   sum(CASE WHEN mn <> 1 OR mx <> nd THEN 1 ELSE 0 END)
                       ::BIGINT AS n_gapped,
                   sum(CASE WHEN nd = n AND mn = 1 AND mx = nd
                            THEN 1 ELSE 0 END)::BIGINT AS n_contiguous
            FROM g
        """,
        "events_attribution_time_decay": """
            SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                   (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS delta_s,
                   round(pow(2.0,
                         -(((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000)
                           / 86400.0)), 6) AS w_raw
            FROM events p JOIN events c ON c.user_id = p.user_id
            WHERE p.event_type = 'purchase' AND c.event_type = 'click'
              AND c.ts < p.ts
              AND epoch_us(p.ts) - epoch_us(c.ts) <= 604800000000
            ORDER BY purchase_id, click_id
        """,
        "kg_degree_ccdf": ko.kg_degree_ccdf_sql(tglob),
        "kg_component_sizes": ko.kg_component_sizes_sql(tglob),
        "kg_predicate_census": ko.kg_predicate_census_sql(tglob),
        "kg_node_type_census": ko.kg_node_type_census_sql(tglob),
        "kg_edge_hygiene_audit": ko.kg_edge_hygiene_audit_sql(tglob),
        "kg_surface_variety": ko.kg_surface_variety_sql(tglob),
        "kg_mention_density_hist": ko.kg_mention_density_hist_sql(tglob),
        "kg_transcript_profile": f"""
            WITH c AS (SELECT role, count(*)::BIGINT AS n
                       FROM read_parquet('{tglob}') GROUP BY 1),
            t AS (SELECT sum(n)::BIGINT AS tot FROM c)
            SELECT role, n AS n_turns,
                   round(n / CAST((SELECT tot FROM t) AS DOUBLE), 6)
                       AS share
            FROM c ORDER BY role
        """,
        "doc_langid_confusion": _langid_confusion_sql(),
        "embedding_norm_hist": """
            WITH n AS (SELECT round(sqrt(list_sum(list_transform(
                           embedding::DOUBLE[], x -> x * x))), 6) AS v
                       FROM embeddings),
            mm AS (SELECT min(v) AS lo, max(v) AS hi FROM n),
            h AS (SELECT CASE WHEN mm.hi = mm.lo THEN 0
                         ELSE least(floor((n.v - mm.lo) * 20.0
                                          / (mm.hi - mm.lo)), 19)
                         END::BIGINT AS bin
                  FROM n, mm)
            SELECT bin,
                   round((SELECT lo FROM mm)
                         + bin * (((SELECT hi FROM mm)
                                   - (SELECT lo FROM mm)) / 20.0), 6)
                       AS bin_lo,
                   count(*)::BIGINT AS n_vecs
            FROM h GROUP BY bin ORDER BY bin
        """,
        "corpus_bursty_terms_top20": f"""
            WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(
                             coalesce(text, ''), '{_TOK}')) AS token
                         FROM documents),
            c AS (SELECT token, count(*)::BIGINT AS cf,
                         count(DISTINCT doc_id)::BIGINT AS df
                  FROM tok GROUP BY 1),
            k AS (SELECT token, cf, df FROM c WHERE df >= 5),
            m AS (SELECT max(df) AS mdf FROM k)
            SELECT token, cf, df,
                   round(cf / CAST(df AS DOUBLE), 6) AS burstiness
            FROM k, m
            -- exact rational order (mirrors the engine's Fraction sort):
            -- two ratios cf1/df1 <> cf2/df2 differ by >= 1/(df1*df2)
            -- >= 1/mdf^2, so their floors of cf*mdf^2/df differ too —
            -- no float collision possible; HUGEINT avoids overflow
            ORDER BY (CAST(cf AS HUGEINT) * mdf * mdf) // df DESC,
                     token ASC
            LIMIT 20
        """,
        "corpus_sentence_dup_census": """
            WITH s AS (
                SELECT trim(u.sent) AS sent
                FROM documents d,
                     unnest(regexp_split_to_array(
                         coalesce(d.text, ''), '[.!?]+')) AS u(sent)
                WHERE trim(u.sent) <> ''),
            c AS (SELECT sent, count(*)::BIGINT AS n FROM s GROUP BY 1),
            a AS (SELECT sum(n)::BIGINT AS total,
                         count(*)::BIGINT AS nd,
                         sum(n - 1)::BIGINT AS dup
                  FROM c)
            SELECT total AS n_occurrences, nd AS n_distinct,
                   dup AS n_dup_occurrences,
                   round(dup / CAST(total AS DOUBLE), 6) AS dup_share
            FROM a
        """,
        "events_runs_test": """
            WITH s AS (SELECT CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS b,
                              lag(CASE WHEN event_type = 'purchase'
                                       THEN 1 ELSE 0 END)
                                  OVER (ORDER BY event_id) AS pb
                       FROM events),
            c AS (SELECT sum(b)::BIGINT AS n1,
                         sum(1 - b)::BIGINT AS n2,
                         (1 + sum(CASE WHEN pb IS NOT NULL AND b <> pb
                                       THEN 1 ELSE 0 END))::BIGINT AS r
                  FROM s),
            m AS (SELECT n1, n2, r, n1 + n2 AS nn,
                         1.0 + 2.0 * n1 * n2 / (n1 + n2) AS mu,
                         2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                         / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                            * (n1 + n2 - 1)) AS var
                  FROM c)
            SELECT n1 AS n_purchase, n2 AS n_other, r AS n_runs,
                   round(CASE WHEN n1 = 0 OR n2 = 0 OR nn < 2
                              OR var <= 0 THEN 0.0
                         ELSE (r - mu) / sqrt(var) END, 4) AS z_stat
            FROM m
        """,
        "lineitem_return_rate_monthly": """
            WITH c AS (SELECT year(l_shipdate) * 12 + month(l_shipdate) - 1
                              AS m,
                              count(*)::BIGINT AS n,
                              sum(CASE WHEN l_returnflag = 'R'
                                       THEN 1 ELSE 0 END)::BIGINT AS r
                       FROM lineitem GROUP BY 1)
            SELECT m AS month_id, n AS n_lines, r AS n_returned,
                   round(r / CAST(n AS DOUBLE), 6) AS return_rate
            FROM c ORDER BY month_id
        """,
        "events_type_session_position": """
            WITH gaps AS (
                SELECT user_id, ts, event_id, event_type,
                       CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            numbered AS (
                SELECT user_id, event_type, ts, event_id,
                       sum(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM gaps),
            ranked AS (
                SELECT user_id, sid, event_type,
                       row_number() OVER (
                           PARTITION BY user_id, sid
                           ORDER BY ts, event_id) - 1 AS idx,
                       count(*) OVER (PARTITION BY user_id, sid) AS slen
                FROM numbered),
            k AS (SELECT event_type, idx, slen - 1 AS lm1
                  FROM ranked WHERE slen >= 2),
            c AS (SELECT event_type, count(*)::BIGINT AS n,
                         sum(idx)::BIGINT AS si, sum(lm1)::BIGINT AS sl
                  FROM k GROUP BY 1)
            SELECT event_type, n AS n_events, si AS sum_idx,
                   sl AS sum_len_minus1,
                   round(si / CAST(sl AS DOUBLE), 6) AS position_share
            FROM c ORDER BY event_type
        """,
        "corpus_hapax_rate": f"""
            WITH c AS (
                SELECT token, count(*)::BIGINT AS n
                FROM (SELECT unnest(regexp_extract_all(
                          coalesce(text, ''), '{_TOK}')) AS token
                      FROM documents)
                GROUP BY token)
            SELECT count(*)::BIGINT AS n_types,
                   sum(n)::BIGINT AS n_tokens,
                   sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_hapax,
                   round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                         / CAST(count(*) AS DOUBLE), 6) AS hapax_rate
            FROM c
        """,
        "events_price_point_census": """
            WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) % 100
                              AS e
                       FROM events),
            t AS (SELECT count(*)::BIGINT AS tot FROM c),
            arms(ending, e) AS (VALUES ('.00', 0), ('.50', 50),
                                       ('.99', 99))
            SELECT a.ending,
                   (SELECT count(*) FROM c WHERE c.e = a.e)::BIGINT AS n,
                   round((SELECT count(*) FROM c WHERE c.e = a.e)
                         / CAST((SELECT tot FROM t) AS DOUBLE), 6)
                       AS share
            FROM arms a ORDER BY a.ending
        """,
        "embedding_pair_cosine_hist": """
            WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings WHERE vec_id % 5 = 0),
            p AS (SELECT round(list_cosine_similarity(a.v, b.v), 6) AS c
                  FROM s a JOIN s b ON a.vec_id < b.vec_id),
            h AS (SELECT least(floor((c + 1.0) * 10.0), 19)::BIGINT AS bin
                  FROM p)
            SELECT bin, round(-1.0 + bin * 0.1, 6) AS bin_lo,
                   count(*)::BIGINT AS n_pairs
            FROM h GROUP BY 1 ORDER BY bin
        """,
        "events_churn_threshold_sweep": """
            WITH pu AS (SELECT user_id,
                               max(epoch_us(ts)) // 86400000000 AS lastd
                        FROM events GROUP BY 1),
            a AS (SELECT max(lastd) AS anchor,
                         count(*)::BIGINT AS total
                  FROM pu),
            t(thr) AS (VALUES (7), (14), (30))
            SELECT thr::BIGINT AS threshold_days,
                   (SELECT total FROM a) AS n_users,
                   (SELECT count(*) FROM pu
                    WHERE lastd < (SELECT anchor FROM a) - t.thr)::BIGINT
                       AS n_churned,
                   round((SELECT count(*) FROM pu
                          WHERE lastd < (SELECT anchor FROM a) - t.thr)
                         / CAST((SELECT total FROM a) AS DOUBLE), 6)
                       AS churn_rate
            FROM t ORDER BY threshold_days
        """,
        "events_props_key_census": """
            WITH k AS (SELECT DISTINCT event_id, unnest(
                           regexp_extract_all(coalesce(props, ''),
                               '"([A-Za-z0-9_]+)"\\s*:', 1)) AS key
                       FROM events),
            c AS (SELECT key, count(*)::BIGINT AS n FROM k GROUP BY 1),
            t AS (SELECT count(*)::BIGINT AS tot FROM events)
            SELECT key, n AS n_rows,
                   round(n / CAST((SELECT tot FROM t) AS DOUBLE), 6)
                       AS presence_rate
            FROM c ORDER BY key
        """,
        "orders_aging_report": """
            WITH mx AS (SELECT max(epoch_us(o_orderdate)) // 86400000000
                               AS anchor
                        FROM orders),
            b AS (SELECT o_orderstatus AS st,
                         (SELECT anchor FROM mx)
                         - epoch_us(o_orderdate) // 86400000000 AS days
                  FROM orders),
            c AS (SELECT st,
                         CASE WHEN days <= 30 THEN '0-30'
                              WHEN days <= 90 THEN '31-90'
                              WHEN days <= 365 THEN '91-365'
                              ELSE '>365' END AS band
                  FROM b)
            SELECT st AS o_orderstatus, band AS age_band,
                   count(*)::BIGINT AS n_orders
            FROM c GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_ab_power_mde": """
            WITH u AS (
                SELECT user_id,
                       CASE WHEN md5_number_upper(user_id::VARCHAR) % 2 = 0
                            THEN 'A' ELSE 'B' END AS arm,
                       max(CASE WHEN event_type = 'purchase'
                                 AND value >= 150 THEN 1 ELSE 0
                           END) AS conv
                FROM events GROUP BY user_id),
            a AS (
                SELECT
                    sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)::BIGINT AS n1,
                    sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END)::BIGINT
                        AS c1,
                    sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)::BIGINT AS n2,
                    sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END)::BIGINT
                        AS c2
                FROM u),
            z AS (SELECT CAST(1.96 AS DOUBLE) AS za,
                         CAST(0.8416 AS DOUBLE) AS zb),
            m AS (SELECT n1, n2,
                         (c1 + c2) / CAST(n1 + n2 AS DOUBLE) AS pb
                  FROM a WHERE n1 > 0 AND n2 > 0)
            SELECT n1 AS n_users_a, n2 AS n_users_b,
                   round(pb, 6) AS pooled_rate,
                   round(((SELECT za FROM z) + (SELECT zb FROM z))
                         * sqrt(pb * (1.0 - pb)
                                * (1.0 / n1 + 1.0 / n2)), 6) AS mde_abs,
                   round(CASE WHEN pb > 0
                         THEN ((SELECT za FROM z) + (SELECT zb FROM z))
                              * sqrt(pb * (1.0 - pb)
                                     * (1.0 / n1 + 1.0 / n2)) / pb
                         ELSE 0.0 END, 6) AS mde_rel
            FROM m
        """,
        "lineitem_price_qty_elasticity": """
            WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                              // l_quantity::BIGINT AS up,
                              l_quantity::BIGINT AS q,
                              count(*)::BIGINT AS n
                       FROM lineitem WHERE l_quantity > 0
                       GROUP BY 1, 2),
            r AS (SELECT ln(up::DOUBLE) AS x, ln(q::DOUBLE) AS y,
                         n::DOUBLE AS w
                  FROM c),
            s AS (SELECT sum(w) AS nn, sum(w * x) AS sx, sum(w * y) AS sy,
                         sum(w * x * x) AS sxx, sum(w * y * y) AS syy,
                         sum(w * x * y) AS sxy, count(*)::BIGINT AS cells
                  FROM r)
            SELECT cells AS n_cells, nn::BIGINT AS n_rows,
                   round((nn * sxy - sx * sy) / (nn * sxx - sx * sx), 4)
                       AS elasticity,
                   round(CASE WHEN nn * syy - sy * sy = 0 THEN 1.0
                         ELSE ((nn * sxy - sx * sy) * (nn * sxy - sx * sy))
                              / ((nn * sxx - sx * sx)
                                 * (nn * syy - sy * sy))
                         END, 4) AS r2
            FROM s WHERE cells >= 2 AND nn * sxx - sx * sx <> 0
        """,
        "orders_total_reconciliation": """
            WITH lp AS (SELECT l_orderkey AS ok,
                               sum(CAST(round(l_extendedprice * 100)
                                        AS BIGINT)
                                   * (100 - CAST(round(l_discount * 100)
                                                 AS BIGINT))
                                   * (100 + CAST(round(l_tax * 100)
                                                 AS BIGINT)))::BIGINT AS sc
                        FROM lineitem GROUP BY 1),
            j AS (SELECT o.o_orderkey,
                         CAST(round(o.o_totalprice * 100) AS BIGINT)
                             * 10000 AS tgt,
                         lp.sc
                  FROM orders o LEFT JOIN lp ON lp.ok = o.o_orderkey)
            SELECT sum(CASE WHEN sc IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                       AS n_orders_checked,
                   sum(CASE WHEN sc IS NULL THEN 1 ELSE 0 END)::BIGINT
                       AS n_orders_no_lines,
                   sum(CASE WHEN sc = tgt THEN 1 ELSE 0 END)::BIGINT
                       AS n_exact_match,
                   (coalesce(max(CASE WHEN sc IS NOT NULL
                                      THEN abs(sc - tgt) END), 0)
                    // 10000)::BIGINT AS max_abs_diff_cents
            FROM j
        """,
        "events_value_anova_terms": """
            WITH c AS (SELECT event_type AS et,
                              count(*)::BIGINT AS n,
                              sum(CAST(round(value * 100) AS BIGINT))
                                  ::BIGINT AS s,
                              sum(CAST(round(value * 100) AS BIGINT)
                                  * CAST(round(value * 100) AS BIGINT))
                                  ::BIGINT AS ss
                       FROM events GROUP BY 1)
            SELECT et AS event_type, n, s AS sum_cents, ss AS sumsq_cents,
                   round(CAST(s AS DOUBLE) * s / n, 4) AS between_term,
                   round(ss - CAST(s AS DOUBLE) * s / n, 4) AS within_term
            FROM c ORDER BY event_type
        """,
        "corpus_source_vocab_overlap": f"""
            WITH p AS (SELECT DISTINCT d.source, tok
                       FROM documents d,
                            unnest(regexp_extract_all(
                                coalesce(d.text, ''), '{_TOK}')) AS u(tok)),
            tc AS (SELECT tok, count(*)::BIGINT AS ns FROM p GROUP BY 1),
            s AS (SELECT p.source, count(*)::BIGINT AS nt,
                         sum(CASE WHEN tc.ns = 1 THEN 1 ELSE 0 END)::BIGINT
                             AS nx
                  FROM p JOIN tc ON tc.tok = p.tok GROUP BY 1)
            SELECT source, nt AS n_types, nx AS n_exclusive,
                   round(nx / CAST(nt AS DOUBLE), 6) AS exclusive_frac
            FROM s ORDER BY source
        """,
        "events_purchase_first_click": """
            WITH c AS (SELECT user_id, min(ts) AS fc FROM events
                       WHERE event_type = 'click' GROUP BY 1)
            SELECT e.event_id, e.user_id, e.ts, c.fc AS first_click_ts
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.fc
        """,
        "lineitem_selectivity_audit": """
            WITH f AS (SELECT CASE WHEN l_quantity < 25 THEN 1 ELSE 0 END
                              AS a,
                              CASE WHEN l_discount > 0.02 THEN 1 ELSE 0 END
                              AS b,
                              CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                              AS c
                       FROM lineitem),
            s AS (SELECT count(*)::BIGINT AS n, sum(a)::BIGINT AS na,
                         sum(b)::BIGINT AS nb, sum(c)::BIGINT AS nc,
                         sum(a * b)::BIGINT AS nab,
                         sum(a * c)::BIGINT AS nac,
                         sum(b * c)::BIGINT AS nbc
                  FROM f),
            arms AS (
                SELECT 'qty_and_disc' AS pair, na AS n_i, nb AS n_j,
                       nab AS n_ij, n FROM s
                UNION ALL
                SELECT 'qty_and_flag', na, nc, nac, n FROM s
                UNION ALL
                SELECT 'disc_and_flag', nb, nc, nbc, n FROM s)
            SELECT pair, n_i, n_j, n_ij,
                   round(n_ij / CAST(n AS DOUBLE), 6) AS sel_observed,
                   round((n_i / CAST(n AS DOUBLE))
                         * (n_j / CAST(n AS DOUBLE)), 6) AS sel_predicted,
                   round(CASE WHEN n_i = 0 OR n_j = 0 THEN 0.0
                         ELSE (n_ij / CAST(n AS DOUBLE))
                              / ((n_i / CAST(n AS DOUBLE))
                                 * (n_j / CAST(n AS DOUBLE)))
                         END, 6) AS correlation_ratio
            FROM arms ORDER BY pair
        """,
        "events_ab_srm_check": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            a AS (SELECT md5_number_upper(user_id::VARCHAR) % 2 AS arm
                  FROM u),
            c AS (SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT
                             AS na,
                         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT
                             AS nb
                  FROM a)
            SELECT na AS n_users_a, nb AS n_users_b,
                   round((na - nb) * (na - nb)
                         / CAST(na + nb AS DOUBLE), 6) AS srm_chi2
            FROM c
        """,
        "events_dataset_card": """
            SELECT count(*)::BIGINT AS n_rows,
                   count(DISTINCT user_id)::BIGINT AS n_users,
                   count(DISTINCT event_type)::BIGINT AS n_types,
                   min(epoch_us(ts))::BIGINT AS ts_min_us,
                   max(epoch_us(ts))::BIGINT AS ts_max_us,
                   (max(epoch_us(ts)) // 86400000000
                    - min(epoch_us(ts)) // 86400000000 + 1)::BIGINT
                       AS span_days,
                   sum(CAST(round(value * 100) AS BIGINT))::BIGINT
                       AS value_sum_cents,
                   sum(CASE WHEN CAST(round(value * 100) AS BIGINT) = 0
                            THEN 1 ELSE 0 END)::BIGINT AS n_zero_value
            FROM events
        """,
        "events_value_lorenz": """
            WITH pu AS (SELECT user_id,
                               sum(CAST(round(value * 100) AS BIGINT))
                                   ::BIGINT AS c
                        FROM events GROUP BY 1),
            r AS (SELECT c,
                         row_number() OVER (ORDER BY c ASC, user_id ASC)
                             AS rn,
                         sum(c) OVER (ORDER BY c ASC, user_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS cum
                  FROM pu),
            u AS (SELECT count(*)::BIGINT AS nu, sum(c)::BIGINT AS tot
                  FROM pu),
            d(dec) AS (VALUES (1), (2), (3), (4), (5),
                              (6), (7), (8), (9), (10)),
            pick AS (SELECT dec, (dec * (SELECT nu FROM u)) // 10 AS k
                     FROM d)
            SELECT dec::BIGINT AS decile, k AS cum_users,
                   coalesce((SELECT cum FROM r WHERE rn = pick.k), 0)
                       ::BIGINT AS cum_value_cents,
                   round(coalesce((SELECT cum FROM r WHERE rn = pick.k), 0)
                         / CAST((SELECT tot FROM u) AS DOUBLE), 6)
                       AS cum_value_share
            FROM pick ORDER BY decile
        """,
        "events_type_load_factor": """
            WITH c AS (SELECT event_type AS et,
                              epoch_us(ts) // 3600000000 AS h,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
            a AS (SELECT et, sum(n)::BIGINT AS total, max(n)::BIGINT AS peak,
                         (max(h) - min(h) + 1)::BIGINT AS span
                  FROM c GROUP BY 1)
            SELECT et AS event_type, total AS n_events,
                   span AS span_hours, peak AS peak_hour_events,
                   round(peak * span / CAST(total AS DOUBLE), 6)
                       AS load_factor
            FROM a ORDER BY event_type
        """,
        "events_type_simpson": """
            WITH c AS (SELECT event_type AS et,
                              CAST(round(value * 100) AS BIGINT) // 5000
                                  AS vb,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
            a AS (SELECT et, sum(n)::BIGINT AS ne, count(*)::BIGINT AS nb,
                         sum(n * (n - 1))::BIGINT AS num
                  FROM c GROUP BY 1)
            SELECT et AS event_type, ne AS n_events, nb AS n_bands,
                   round(num / CAST(ne * (ne - 1) AS DOUBLE), 6) AS simpson
            FROM a WHERE ne >= 2 ORDER BY event_type
        """,
        "nation_customer_hhi": """
            WITH rev AS (SELECT o_custkey,
                                sum(CAST(round(o_totalprice) AS BIGINT))
                                    ::BIGINT AS r
                         FROM orders GROUP BY 1),
            j AS (SELECT cu.c_nationkey AS nk, rev.r
                  FROM rev JOIN customer cu ON cu.c_custkey = rev.o_custkey),
            agg AS (SELECT nk, count(*)::BIGINT AS nc,
                           sum(r)::BIGINT AS s, sum(r * r)::BIGINT AS ss
                    FROM j GROUP BY 1)
            SELECT n.n_name, agg.nc AS n_customers,
                   round(agg.ss / (CAST(agg.s AS DOUBLE)
                                   * CAST(agg.s AS DOUBLE)), 6) AS hhi
            FROM agg JOIN nation n ON n.n_nationkey = agg.nk
            WHERE agg.s <> 0
            ORDER BY n_name
        """,
        "embedding_ivf_recall_audit": f"""
            WITH exact_r AS (
                SELECT vec_id,
                       row_number() OVER (ORDER BY cos DESC, vec_id ASC)
                           AS rn
                FROM ({do.similarity_topk_sql()})),
            ivf_r AS (
                SELECT vec_id,
                       row_number() OVER (ORDER BY cos DESC, vec_id ASC)
                           AS rn
                FROM ({do.similarity_topk_ivf_sql(oracle_sf)})),
            ks(k) AS (VALUES (1), (5), (10))
            SELECT k::BIGINT AS k,
                   (SELECT count(*) FROM exact_r e
                    JOIN ivf_r i ON e.vec_id = i.vec_id
                    WHERE e.rn <= ks.k AND i.rn <= ks.k)::BIGINT
                       AS n_overlap,
                   round((SELECT count(*) FROM exact_r e
                          JOIN ivf_r i ON e.vec_id = i.vec_id
                          WHERE e.rn <= ks.k AND i.rn <= ks.k)
                         / CAST(k AS DOUBLE), 6) AS recall
            FROM ks ORDER BY k
        """,
        "events_fd_audit": """
            WITH base AS (SELECT event_id, user_id, event_type,
                                 CAST(round(value * 100) AS BIGINT) // 5000
                                     AS vb
                          FROM events),
            pairs AS (
                SELECT 'event_id->user_id' AS fd, event_id::VARCHAR AS lhs,
                       user_id::VARCHAR AS rhs FROM base
                UNION
                SELECT 'user_id->event_type', user_id::VARCHAR, event_type
                FROM base
                UNION
                SELECT 'event_type->value_band', event_type, vb::VARCHAR
                FROM base),
            per_lhs AS (SELECT fd, lhs, count(*)::BIGINT AS nr
                        FROM pairs GROUP BY 1, 2),
            c AS (SELECT fd, count(*)::BIGINT AS nk,
                         sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END)::BIGINT
                             AS nv
                  FROM per_lhs GROUP BY 1)
            SELECT fd, nk AS n_lhs_keys, nv AS n_violating,
                   round(nv / CAST(nk AS DOUBLE), 6) AS violation_rate,
                   CASE WHEN nv = 0 THEN 1 ELSE 0 END::BIGINT AS holds
            FROM c ORDER BY fd
        """,
        "events_sortedness_audit": """
            WITH o AS (SELECT event_id, epoch_us(ts) AS t, user_id AS u
                       FROM events),
            l AS (SELECT t, u,
                         lag(t) OVER (ORDER BY event_id) AS pt,
                         lag(u) OVER (ORDER BY event_id) AS pu
                  FROM o),
            s AS (SELECT count(*)::BIGINT AS n,
                         sum(CASE WHEN pt IS NOT NULL AND t >= pt
                                  THEN 1 ELSE 0 END)::BIGINT AS nd_t,
                         sum(CASE WHEN pu IS NOT NULL AND u >= pu
                                  THEN 1 ELSE 0 END)::BIGINT AS nd_u
                  FROM l)
            SELECT 'ts' AS col, n AS n_rows, (n - 1)::BIGINT AS n_pairs,
                   nd_t AS n_nondec,
                   round(nd_t / CAST(n - 1 AS DOUBLE), 6) AS sortedness,
                   (n - nd_t)::BIGINT AS n_runs,
                   round(n / CAST(n - nd_t AS DOUBLE), 4) AS avg_run_len
            FROM s WHERE n > 0
            UNION ALL
            SELECT 'user_id', n, (n - 1)::BIGINT, nd_u,
                   round(nd_u / CAST(n - 1 AS DOUBLE), 6),
                   (n - nd_u)::BIGINT,
                   round(n / CAST(n - nd_u AS DOUBLE), 4)
            FROM s WHERE n > 0
            ORDER BY col
        """,
        "lineitem_zonemap_skip": f"""
            WITH b AS (SELECT l_orderkey, epoch_us(l_shipdate) AS us,
                              year(l_shipdate) * 12 + month(l_shipdate) - 1
                                  AS mid
                       FROM lineitem),
            z AS (
                SELECT 'unclustered' AS layout,
                       l_orderkey % {q.ZONEMAP_FILES} AS fid,
                       min(us) AS mn, max(us) AS mx, count(*)::BIGINT AS n
                FROM b GROUP BY 2
                UNION ALL
                SELECT 'date_clustered', mid,
                       min(us), max(us), count(*)::BIGINT
                FROM b GROUP BY 2)
            SELECT layout, count(*)::BIGINT AS n_files,
                   sum(CASE WHEN mx < {q.ZONEMAP_LO_US}
                              OR mn >= {q.ZONEMAP_HI_US}
                            THEN 1 ELSE 0 END)::BIGINT AS n_skippable,
                   sum(CASE WHEN mx < {q.ZONEMAP_LO_US}
                              OR mn >= {q.ZONEMAP_HI_US}
                            THEN n ELSE 0 END)::BIGINT AS n_rows_skipped
            FROM z GROUP BY 1
        """,
        "events_value_winsorized_mean": f"""
            WITH c AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS v
                       FROM events),
            qs AS (SELECT event_type,
                          quantile_disc(v, {q.WINSOR_LO_Q}) AS lo,
                          quantile_disc(v, {q.WINSOR_HI_Q}) AS hi
                   FROM c GROUP BY 1),
            w AS (SELECT c.event_type, qs.lo, qs.hi,
                         least(greatest(c.v, qs.lo), qs.hi) AS cv
                  FROM c JOIN qs ON qs.event_type = c.event_type)
            SELECT event_type, count(*)::BIGINT AS n_events,
                   min(lo)::BIGINT AS lo_cents, min(hi)::BIGINT AS hi_cents,
                   round(CAST(sum(cv) AS DOUBLE) / (count(*) * 100.0), 4)
                       AS winsorized_mean
            FROM w GROUP BY 1
        """,
        "doc_kanonymity_audit": f"""
            WITH qi AS (SELECT lang, source,
                               n_chars // {q.KANON_CHAR_BUCKET} AS cb,
                               count(*)::BIGINT AS n
                        FROM documents GROUP BY 1, 2, 3)
            SELECT count(*)::BIGINT AS n_classes,
                   min(n)::BIGINT AS min_class_size,
                   sum(CASE WHEN n < {q.KANON_K} THEN 1 ELSE 0 END)::BIGINT
                       AS n_classes_below_k,
                   sum(CASE WHEN n < {q.KANON_K} THEN n ELSE 0 END)::BIGINT
                       AS n_docs_at_risk
            FROM qi
        """,
        "doc_split_leakage": do.doc_split_leakage_sql(),
        "doc_cluster_purity": do.doc_cluster_purity_sql(),
        "events_did_estimate": """
            WITH b AS (SELECT min(epoch_us(ts)) AS tmin,
                              max(epoch_us(ts)) AS tmax FROM events),
            cut AS (SELECT tmin + (tmax - tmin) // 2 AS t1 FROM b),
            p AS (SELECT md5_number_upper(user_id::VARCHAR) % 2 AS arm,
                         CASE WHEN epoch_us(ts) > (SELECT t1 FROM cut)
                              THEN 1 ELSE 0 END AS post,
                         CAST(round(value * 100) AS BIGINT) AS c
                  FROM events WHERE event_type = 'purchase'),
            cen AS (SELECT arm, post, sum(c) AS s,
                           count(*)::BIGINT AS n
                    FROM p GROUP BY 1, 2)
            SELECT round((SELECT s / (n * 100.0) FROM cen
                          WHERE arm = 0 AND post = 0), 4) AS m_ctrl_pre,
                   round((SELECT s / (n * 100.0) FROM cen
                          WHERE arm = 0 AND post = 1), 4) AS m_ctrl_post,
                   round((SELECT s / (n * 100.0) FROM cen
                          WHERE arm = 1 AND post = 0), 4) AS m_treat_pre,
                   round((SELECT s / (n * 100.0) FROM cen
                          WHERE arm = 1 AND post = 1), 4)
                       AS m_treat_post,
                   round(((SELECT s / (n * 100.0) FROM cen
                           WHERE arm = 1 AND post = 1)
                          - (SELECT s / (n * 100.0) FROM cen
                             WHERE arm = 1 AND post = 0))
                         - ((SELECT s / (n * 100.0) FROM cen
                             WHERE arm = 0 AND post = 1)
                            - (SELECT s / (n * 100.0) FROM cen
                               WHERE arm = 0 AND post = 0)), 4) AS did
            WHERE (SELECT count(*) FROM cen) = 4
        """,
        "corpus_oov_rate": f"""
            WITH toks AS (
                SELECT CASE WHEN md5_number_upper(doc_id::VARCHAR) % 10
                                 < 8 THEN 1 ELSE 0 END AS is_train,
                       unnest(regexp_extract_all(coalesce(text, ''),
                                                 '{_TOK}')) AS token
                FROM documents),
            tr AS (SELECT DISTINCT token FROM toks WHERE is_train = 1),
            ev AS (SELECT token, count(*)::BIGINT AS n
                   FROM toks WHERE is_train = 0 GROUP BY 1),
            t AS (SELECT sum(n) AS n_tot,
                         coalesce(sum(CASE WHEN token NOT IN
                                      (SELECT token FROM tr)
                                      THEN n ELSE 0 END), 0) AS n_oov
                  FROM ev)
            SELECT n_tot::BIGINT AS n_eval_tokens,
                   n_oov::BIGINT AS n_oov,
                   round(n_oov / CAST(n_tot AS DOUBLE), 6) AS oov_rate
            FROM t WHERE n_tot > 0
        """,
        "bloom_fpr_audit": f"""
            WITH ok AS (SELECT DISTINCT o_custkey AS k FROM orders),
            ii AS (SELECT unnest(range(0, {q.BLOOM_K})) AS i),
            pos AS (SELECT DISTINCT
                        (CAST(md5_number_upper(k::VARCHAR) AS HUGEINT)
                         + ii.i * CAST((md5_number_lower(k::VARCHAR) | 1)
                                       AS HUGEINT))
                        % {q.BLOOM_BITS} AS p
                    FROM ok, ii),
            no_ord AS (SELECT c_custkey AS k FROM customer
                       WHERE c_custkey NOT IN (SELECT k FROM ok)),
            hits AS (SELECT n.k FROM no_ord n WHERE NOT EXISTS (
                SELECT 1 FROM ii
                WHERE (CAST(md5_number_upper(n.k::VARCHAR) AS HUGEINT)
                       + ii.i
                         * CAST((md5_number_lower(n.k::VARCHAR) | 1)
                                AS HUGEINT)) % {q.BLOOM_BITS}
                      NOT IN (SELECT p FROM pos))),
            t AS (SELECT count(*)::BIGINT AS nk FROM ok),
            th AS (SELECT 1.0 - exp(-(({q.BLOOM_K} * nk)
                       / CAST({q.BLOOM_BITS} AS DOUBLE))) AS p1 FROM t)
            SELECT (SELECT count(*) FROM no_ord)::BIGINT AS n_no_orders,
                   (SELECT count(*) FROM hits)::BIGINT AS n_bloom_fp,
                   CASE WHEN (SELECT count(*) FROM no_ord) = 0 THEN NULL
                        ELSE round((SELECT count(*) FROM hits)
                             / CAST((SELECT count(*) FROM no_ord)
                                    AS DOUBLE), 6) END AS fpr_actual,
                   round((SELECT p1 * p1 * p1 * p1 FROM th), 6)
                       AS fpr_theory
        """,
        "events_hour_value_binscatter": """
            WITH c AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS h,
                              CAST(round(value * 100) AS BIGINT) AS v
                       FROM events)
            SELECT h::BIGINT AS hour, count(*)::BIGINT AS n,
                   round(sum(v) / (count(*) * 100.0), 4) AS mean_value,
                   round(quantile_disc(v, 0.5) / 100.0, 4)
                       AS median_value
            FROM c GROUP BY 1
        """,
        "events_gap_expfit_ks": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
            g AS (SELECT (us - lag(us) OVER (PARTITION BY user_id
                                             ORDER BY us)) // 1000000
                      AS v
                  FROM e),
            cen AS (SELECT v, count(*)::BIGINT AS n FROM g
                    WHERE v IS NOT NULL GROUP BY 1),
            t AS (SELECT sum(n) AS n, sum(v * n) AS tot FROM cen),
            mu AS (SELECT tot / CAST(n AS DOUBLE) AS m FROM t),
            r AS (SELECT v, sum(n) OVER (ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum
                  FROM cen)
            SELECT (SELECT n FROM t)::BIGINT AS n_gaps,
                   round((SELECT m FROM mu), 4) AS mu_seconds,
                   round(max(abs(cum / CAST((SELECT n FROM t) AS DOUBLE)
                             - (1.0 - exp(-(v / (SELECT m FROM mu)))))),
                         6) AS ks
            FROM r
            HAVING count(*) > 0 AND (SELECT tot FROM t) > 0
        """,
        "events_value_quantiles_cont": """
            WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS v
                       FROM events),
            qs AS (SELECT quantile_cont(v, [0.5, 0.9, 0.99]) AS lst
                   FROM c),
            i AS (SELECT unnest(range(1, 4)) AS idx)
            SELECT CAST(CASE idx WHEN 1 THEN 0.5 WHEN 2 THEN 0.9
                        ELSE 0.99 END AS DOUBLE) AS q,
                   round(lst[idx] / 100.0, 4) AS value_cont
            FROM i, qs WHERE lst IS NOT NULL
        """,
        "doc_langid_kappa": f"""
            WITH pred AS (SELECT * FROM ({do.doc_langid_sql()}) AS p),
            j AS (SELECT d.lang, pred.lang_pred
                  FROM documents d JOIN pred USING (doc_id)),
            c AS (SELECT lang, lang_pred, count(*)::BIGINT AS n
                  FROM j GROUP BY 1, 2),
            t AS (SELECT sum(n) AS nn,
                         sum(CASE WHEN lang = lang_pred THEN n ELSE 0
                             END) AS d
                  FROM c),
            m AS (SELECT coalesce(sum(r.rn * co.cn), 0) AS s FROM
                  (SELECT lang, sum(n) AS rn FROM c GROUP BY 1) r
                  JOIN (SELECT lang_pred, sum(n) AS cn
                        FROM c GROUP BY 1) co
                    ON co.lang_pred = r.lang)
            SELECT (SELECT nn FROM t)::BIGINT AS n_docs,
                   (SELECT d FROM t)::BIGINT AS n_agree,
                   round((SELECT d FROM t)
                         / CAST((SELECT nn FROM t) AS DOUBLE), 4)
                       AS accuracy,
                   CASE WHEN (SELECT nn FROM t) * (SELECT nn FROM t)
                             - (SELECT s FROM m) = 0 THEN NULL
                        ELSE round(
                            CAST((SELECT d FROM t) * (SELECT nn FROM t)
                                 - (SELECT s FROM m) AS DOUBLE)
                            / CAST((SELECT nn FROM t)
                                   * (SELECT nn FROM t)
                                   - (SELECT s FROM m) AS DOUBLE), 4)
                   END AS kappa
            FROM t WHERE (SELECT nn FROM t) > 0
        """,
        "events_user_hill_terms": f"""
            WITH u AS (SELECT user_id, count(*)::BIGINT AS m
                       FROM events GROUP BY 1),
            r AS (SELECT user_id, m,
                         row_number() OVER (ORDER BY m DESC, user_id)
                             AS rk
                  FROM u),
            t AS (SELECT count(*) AS nu FROM u),
            kk AS (SELECT least({q.HILL_K},
                               (SELECT nu FROM t) - 1) AS k),
            ref AS (SELECT m AS cref FROM r
                    WHERE rk = (SELECT k FROM kk) + 1)
            SELECT rk::BIGINT AS rank, m AS n_events,
                   round(ln(m / CAST((SELECT cref FROM ref) AS DOUBLE)),
                         6) AS ln_ratio
            FROM r
            WHERE rk <= (SELECT k FROM kk) AND (SELECT nu FROM t) >= 2
        """,
        "events_value_auc": """
            WITH f AS (SELECT event_type AS t,
                              CAST(round(value * 100) AS BIGINT) AS c
                       FROM events
                       WHERE event_type IN ('click', 'purchase')),
            cen AS (SELECT c,
                       sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0
                           END)::BIGINT AS n1,
                       sum(CASE WHEN t = 'click' THEN 1 ELSE 0
                           END)::BIGINT AS n2
                    FROM f GROUP BY 1),
            r AS (SELECT c, n1, n2, n1 + n2 AS m,
                         sum(n1 + n2) OVER (ORDER BY c
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS cb
                  FROM cen),
            s AS (SELECT
                    sum(CAST(n1 AS HUGEINT)
                        * (2 * coalesce(cb, 0) + m + 1)) AS r1x2,
                    sum(n1)::BIGINT AS n1t, sum(n2)::BIGINT AS n2t
                  FROM r)
            SELECT n2t AS n_click, n1t AS n_purchase,
                   round(CAST(r1x2 - CAST(n1t AS HUGEINT) * (n1t + 1)
                              AS DOUBLE)
                         / (2.0 * CAST(n1t AS DOUBLE)
                            * CAST(n2t AS DOUBLE)), 4) AS auc
            FROM s WHERE n1t > 0 AND n2t > 0
        """,
        "events_type_shrunk_rate": f"""
            WITH g AS (SELECT sum(CAST(round(value * 100) AS BIGINT))
                           AS s, count(*)::BIGINT AS n FROM events),
            c AS (SELECT event_type, count(*)::BIGINT AS n,
                     sum(CASE WHEN CAST(round(value * 100) AS BIGINT)
                                   * (SELECT n FROM g) > (SELECT s FROM g)
                              THEN 1 ELSE 0 END)::BIGINT AS n_hi
                  FROM events GROUP BY 1),
            kt AS (SELECT sum(n_hi) AS k_tot FROM c)
            SELECT event_type, n, n_hi,
                   round(n_hi / CAST(n AS DOUBLE), 4) AS raw_rate,
                   round((n_hi + {q.SHRINK_ALPHA}
                          * ((SELECT k_tot FROM kt)
                             / CAST((SELECT n FROM g) AS DOUBLE)))
                         / (n + {q.SHRINK_ALPHA}), 4) AS shrunk_rate
            FROM c
        """,
        "events_type_value_mi": f"""
            WITH vc AS (SELECT CAST(round(value * 100) AS BIGINT) AS v
                        FROM events),
            qs AS (SELECT quantile_disc(v, [0.1, 0.2, 0.3, 0.4, 0.5,
                                            0.6, 0.7, 0.8, 0.9, 1.0])
                       AS bs
                   FROM vc),
            cells AS (SELECT event_type,
                             1 + len(list_filter((SELECT bs FROM qs),
                                 x -> x < CAST(round(value * 100)
                                               AS BIGINT)))::BIGINT AS d,
                             count(*)::BIGINT AS n
                      FROM events GROUP BY 1, 2),
            tots AS (SELECT sum(n) AS nn FROM cells),
            nt AS (SELECT event_type, sum(n) AS n_t FROM cells GROUP BY 1),
            nd AS (SELECT d, sum(n) AS n_d FROM cells GROUP BY 1)
            SELECT c.event_type, c.d, c.n,
                   round((c.n / CAST((SELECT nn FROM tots) AS DOUBLE))
                         * ln((c.n * (SELECT nn FROM tots))
                              / CAST(nt.n_t * nd.n_d AS DOUBLE)), 6)
                       AS mi_term
            FROM cells c JOIN nt USING (event_type) JOIN nd USING (d)
        """,
        "events_type_target_encoding": """
            WITH g AS (SELECT sum(CAST(round(value * 100) AS BIGINT))
                           AS s, count(*)::BIGINT AS n FROM events),
            e AS (SELECT event_type,
                         CASE WHEN CAST(round(value * 100) AS BIGINT)
                                   * (SELECT n FROM g) > (SELECT s FROM g)
                              THEN 1 ELSE 0 END AS y
                  FROM events),
            c AS (SELECT event_type, y, count(*)::BIGINT AS n_rows
                  FROM e GROUP BY 1, 2),
            tt AS (SELECT event_type, sum(n_rows) AS n_t,
                          sum(CASE WHEN y = 1 THEN n_rows ELSE 0 END)
                              AS k_t
                   FROM c GROUP BY 1)
            SELECT c.event_type, c.y::BIGINT AS y, c.n_rows,
                   CASE WHEN tt.n_t <= 1 THEN NULL
                        ELSE round((tt.k_t - c.y)
                                   / CAST(tt.n_t - 1 AS DOUBLE), 4)
                   END AS encoding
            FROM c JOIN tt USING (event_type)
        """,
        "events_user_cv_folds": f"""
            WITH u AS (SELECT user_id, count(*)::BIGINT AS n
                       FROM events GROUP BY 1)
            SELECT (md5_number_upper(user_id::VARCHAR)
                    % {q.CV_FOLDS})::BIGINT AS fold,
                   count(*)::BIGINT AS n_users,
                   sum(n)::BIGINT AS n_events
            FROM u GROUP BY 1
        """,
        "orders_basket_poisson_gof": """
            WITH RECURSIVE sz AS (SELECT l_orderkey,
                                         count(*)::BIGINT AS s
                                  FROM lineitem GROUP BY 1),
            cen AS (SELECT s AS k, count(*)::BIGINT AS n
                    FROM sz GROUP BY 1),
            t AS (SELECT sum(k * n) AS tl, sum(n) AS no, max(k) AS kmax
                  FROM cen),
            lam AS (SELECT tl / CAST(no AS DOUBLE) AS l FROM t),
            p AS (SELECT 0::BIGINT AS k,
                         exp(-(SELECT l FROM lam)) AS pk
                  UNION ALL
                  SELECT k + 1, pk * (SELECT l FROM lam) / (k + 1)
                  FROM p WHERE k < (SELECT kmax FROM t))
            SELECT c.k::BIGINT AS k, c.n AS observed,
                   round((SELECT no FROM t) * p.pk, 4) AS expected,
                   round((c.n - (SELECT no FROM t) * p.pk)
                         * (c.n - (SELECT no FROM t) * p.pk)
                         / ((SELECT no FROM t) * p.pk), 4) AS chi2_term
            FROM cen c JOIN p ON p.k = c.k
        """,
        "doc_sample_allocation": f"""
            WITH c AS (SELECT source, count(*)::BIGINT AS n
                       FROM documents GROUP BY 1),
            t AS (SELECT sum(n) AS total FROM c),
            b AS (SELECT source, n,
                         ({q.ALLOC_SEATS} * n) // (SELECT total FROM t)
                             AS base,
                         ({q.ALLOC_SEATS} * n) % (SELECT total FROM t)
                             AS rem
                  FROM c),
            l AS (SELECT {q.ALLOC_SEATS} - sum(base) AS left_ FROM b),
            r AS (SELECT source, n, base,
                         row_number() OVER (ORDER BY rem DESC, source)
                             AS rk
                  FROM b)
            SELECT source, n AS n_docs,
                   (base + CASE WHEN rk <= (SELECT left_ FROM l)
                                THEN 1 ELSE 0 END)::BIGINT AS seats
            FROM r
        """,
        "join_plan_advisor": f"""
            WITH t AS (
                SELECT 'orders->customer' AS relation,
                       (SELECT count(*) FROM orders)::BIGINT AS fact_rows,
                       (SELECT count(*) FROM customer)::BIGINT AS dim_rows,
                       ((SELECT count(*) FROM customer) * 56)::BIGINT
                           AS dim_bytes_est
                UNION ALL
                SELECT 'lineitem->orders',
                       (SELECT count(*) FROM lineitem)::BIGINT,
                       (SELECT count(*) FROM orders)::BIGINT,
                       ((SELECT count(*) FROM orders) * 64)::BIGINT
                UNION ALL
                SELECT 'customer->nation',
                       (SELECT count(*) FROM customer)::BIGINT,
                       (SELECT count(*) FROM nation)::BIGINT,
                       ((SELECT count(*) FROM nation) * 32)::BIGINT)
            SELECT relation, fact_rows, dim_rows, dim_bytes_est,
                   CASE WHEN dim_bytes_est <= {q.BROADCAST_BYTES_MAX}
                        THEN 'broadcast' ELSE 'hash_shuffle' END
                       AS strategy
            FROM t
        """,
        "events_user_spearman": """
            WITH u AS (SELECT user_id,
                    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                        END)::BIGINT AS nc,
                    sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END)::BIGINT AS sp
                  FROM events GROUP BY 1),
            b AS (SELECT * FROM u WHERE nc > 0 AND sp > 0),
            xc AS (SELECT nc, count(*)::BIGINT AS m FROM b GROUP BY 1),
            xr AS (SELECT nc,
                          2 * coalesce(sum(m) OVER (ORDER BY nc
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) + m + 1 AS dr
                   FROM xc),
            yc AS (SELECT sp, count(*)::BIGINT AS m FROM b GROUP BY 1),
            yr AS (SELECT sp,
                          2 * coalesce(sum(m) OVER (ORDER BY sp
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) + m + 1 AS dr
                   FROM yc),
            j AS (SELECT xr.dr AS rx, yr.dr AS ry
                  FROM b JOIN xr ON xr.nc = b.nc
                  JOIN yr ON yr.sp = b.sp),
            s AS (SELECT count(*)::BIGINT AS n,
                         sum(CAST(rx AS HUGEINT)) AS sx,
                         sum(CAST(ry AS HUGEINT)) AS sy,
                         sum(CAST(rx AS HUGEINT) * rx) AS sxx,
                         sum(CAST(ry AS HUGEINT) * ry) AS syy,
                         sum(CAST(rx AS HUGEINT) * ry) AS sxy
                  FROM j)
            SELECT n AS n_users,
                   CASE WHEN n * sxx - sx * sx <= 0
                          OR n * syy - sy * sy <= 0 THEN NULL
                        ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                                * sqrt(CAST(n * syy - sy * sy
                                            AS DOUBLE))), 4)
                   END AS rho
            FROM s WHERE n >= 2
        """,
        "events_conversion_wilson": """
            WITH g AS (SELECT sum(CAST(round(value * 100) AS BIGINT))
                           AS s, count(*)::BIGINT AS n
                       FROM events),
            c AS (SELECT event_type, count(*)::BIGINT AS n,
                     sum(CASE WHEN CAST(round(value * 100) AS BIGINT)
                                   * (SELECT n FROM g) > (SELECT s FROM g)
                              THEN 1 ELSE 0 END)::BIGINT AS n_hi
                  FROM events GROUP BY 1),
            -- z forced to DOUBLE: a bare 1.96 literal is DECIMAL and
            -- 1.96*1.96 would round differently from the engine's doubles
            f AS (SELECT event_type, n, n_hi,
                         n_hi / CAST(n AS DOUBLE) AS p,
                         CAST(1.96 AS DOUBLE) AS z
                  FROM c)
            SELECT event_type, n, n_hi, round(p, 4) AS rate,
                   round((p + z * z / (2.0 * n)) / (1.0 + z * z / n)
                         - (z * sqrt(p * (1.0 - p) / n
                                     + z * z / (4.0 * n * n))
                            / (1.0 + z * z / n)), 4) AS wilson_lo,
                   round((p + z * z / (2.0 * n)) / (1.0 + z * z / n)
                         + (z * sqrt(p * (1.0 - p) / n
                                     + z * z / (4.0 * n * n))
                            / (1.0 + z * z / n)), 4) AS wilson_hi
            FROM f
        """,
        "events_raking_weights": """
            WITH cen AS (SELECT event_type,
                                ((epoch_us(ts) // 86400000000) + 4) % 7
                                    AS dow,
                                count(*)::BIGINT AS n
                         FROM events GROUP BY 1, 2),
            tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nt,
                           count(DISTINCT event_type) AS nr,
                           count(DISTINCT dow) AS nc
                    FROM cen),
            m0 AS (SELECT event_type, dow, n, CAST(n AS DOUBLE) AS w
                   FROM cen),
            r1 AS (SELECT m.event_type, m.dow, m.n,
                          m.w * (((SELECT nt FROM tot)
                                  / (SELECT nr FROM tot)) / rs.s) AS w
                   FROM m0 m JOIN (SELECT event_type, sum(w) AS s
                                   FROM m0 GROUP BY 1) rs
                        USING (event_type)),
            c1 AS (SELECT m.event_type, m.dow, m.n,
                          m.w * (((SELECT nt FROM tot)
                                  / (SELECT nc FROM tot)) / cs.s) AS w
                   FROM r1 m JOIN (SELECT dow, sum(w) AS s
                                   FROM r1 GROUP BY 1) cs USING (dow)),
            r2 AS (SELECT m.event_type, m.dow, m.n,
                          m.w * (((SELECT nt FROM tot)
                                  / (SELECT nr FROM tot)) / rs.s) AS w
                   FROM c1 m JOIN (SELECT event_type, sum(w) AS s
                                   FROM c1 GROUP BY 1) rs
                        USING (event_type)),
            c2 AS (SELECT m.event_type, m.dow, m.n,
                          m.w * (((SELECT nt FROM tot)
                                  / (SELECT nc FROM tot)) / cs.s) AS w
                   FROM r2 m JOIN (SELECT dow, sum(w) AS s
                                   FROM r2 GROUP BY 1) cs USING (dow))
            SELECT event_type, dow, n, round(w / n, 4) AS weight
            FROM c2 WHERE n > 0
        """,
        "customer_share_of_region": """
            WITH c AS (SELECT c_nationkey AS nk,
                              sum(CAST(round(c_acctbal * 100) AS BIGINT))
                                  AS bal
                       FROM customer GROUP BY 1),
            j AS (SELECT r.r_name, n.n_name, c.bal,
                         n.n_regionkey AS rk
                  FROM c JOIN nation n ON n.n_nationkey = c.nk
                  JOIN region r ON r.r_regionkey = n.n_regionkey),
            rt AS (SELECT rk, sum(bal) AS rbal FROM j GROUP BY 1),
            w AS (SELECT sum(bal) AS wbal FROM j)
            SELECT j.r_name, j.n_name, j.bal::BIGINT AS bal_cents,
                   round(j.bal / CAST(rt.rbal AS DOUBLE), 4)
                       AS share_of_region,
                   round(rt.rbal / CAST((SELECT wbal FROM w) AS DOUBLE),
                         4) AS region_share_of_world
            FROM j JOIN rt USING (rk)
        """,
        "events_type_decayed_top": f"""
            WITH m AS (SELECT max(epoch_us(ts) // 86400000000) AS md
                       FROM events),
            w AS (SELECT event_type,
                         CASE WHEN md - epoch_us(ts) // 86400000000 >= 20
                              THEN 0
                              ELSE {q.DECAY_UNIT} // (1::BIGINT <<
                                   (md - epoch_us(ts) // 86400000000))
                         END AS wt
                  FROM events, m)
            SELECT event_type, sum(wt)::BIGINT AS decayed_units
            FROM w GROUP BY 1
        """,
        "events_wow_contribution": """
            WITH wkc AS (SELECT event_type,
                                epoch_us(ts) // 604800000000 AS wk,
                                count(*)::BIGINT AS n
                         FROM events GROUP BY 1, 2),
            mx AS (SELECT max(wk) AS wl FROM wkc),
            p AS (SELECT t.event_type,
                     coalesce(sum(CASE WHEN wk = wl - 1 THEN n END),
                              0)::BIGINT AS n_prev,
                     coalesce(sum(CASE WHEN wk = wl THEN n END),
                              0)::BIGINT AS n_last
                  FROM wkc t, mx GROUP BY 1),
            tot AS (SELECT sum(n_last - n_prev) AS td FROM p)
            SELECT event_type, n_prev, n_last,
                   (n_last - n_prev)::BIGINT AS delta,
                   CASE WHEN td = 0 THEN NULL
                        ELSE round((n_last - n_prev)
                                   / CAST(td AS DOUBLE), 4)
                   END AS delta_share
            FROM p, tot
        """,
        "embedding_dim_stats": """
            WITH u AS (
                SELECT unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) - 1 AS dim
                FROM embeddings)
            SELECT dim::BIGINT AS dim, count(*)::BIGINT AS n,
                   round(sum(CAST(v AS DOUBLE)) / count(*), 4) AS mean,
                   round(min(CAST(v AS DOUBLE)), 4) AS vmin,
                   round(max(CAST(v AS DOUBLE)), 4) AS vmax
            FROM u GROUP BY 1
        """,
        "lineitem_weighted_median": """
            WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                                  AS v,
                              CAST(round(l_quantity * 100) AS BIGINT)
                                  AS wh
                       FROM lineitem),
            cen AS (SELECT v, sum(wh)::BIGINT AS w FROM c GROUP BY 1),
            r AS (SELECT v,
                         sum(w) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS cum,
                         (SELECT sum(w) FROM cen) AS total
                  FROM cen)
            SELECT total::BIGINT AS total_weight_h,
                   min(v)::BIGINT AS weighted_median_cents
            FROM r WHERE cum >= (total + 1) // 2
            GROUP BY total
        """,
        "events_type_venn3": """
            WITH f AS (SELECT user_id,
                          max(CASE WHEN event_type = 'view'
                                   THEN 1 ELSE 0 END) AS hv,
                          max(CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END) AS hc,
                          max(CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END) AS hp
                       FROM events
                       WHERE event_type IN ('view', 'click', 'purchase')
                       GROUP BY 1)
            SELECT hv::BIGINT AS has_view, hc::BIGINT AS has_click,
                   hp::BIGINT AS has_purchase,
                   count(*)::BIGINT AS n_users
            FROM f GROUP BY 1, 2, 3
        """,
        "orders_skyline": """
            WITH o AS (SELECT o_orderkey,
                              CAST(round(o_totalprice * 100) AS BIGINT)
                                  AS p,
                              epoch_us(o_orderdate) AS d
                       FROM orders)
            SELECT o_orderkey, p AS price_cents, d AS od_us
            FROM o
            WHERE NOT EXISTS (
                SELECT 1 FROM o o2
                WHERE o2.p >= o.p AND o2.d >= o.d
                  AND (o2.p > o.p OR o2.d > o.d))
        """,
        "orders_price_cume_dist": """
            WITH o AS (SELECT o_orderkey,
                              CAST(round(o_totalprice * 100) AS BIGINT)
                                  AS p
                       FROM orders),
            c AS (SELECT o_orderkey, p,
                         cume_dist() OVER (ORDER BY p) AS cd
                  FROM o)
            SELECT o_orderkey, p AS price_cents, round(cd, 6) AS cume_dist
            FROM c ORDER BY cd DESC, o_orderkey LIMIT 50
        """,
        "events_value_equidepth": """
            WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS v
                       FROM events),
            qs AS (SELECT quantile_disc(v, [0.1, 0.2, 0.3, 0.4, 0.5,
                                            0.6, 0.7, 0.8, 0.9, 1.0])
                       AS his
                   FROM c),
            bins AS (SELECT unnest(range(1, 11)) AS bin),
            h AS (SELECT bin, his[bin]::BIGINT AS hi_cents
                  FROM bins, qs WHERE his IS NOT NULL),
            le AS (SELECT bin, hi_cents,
                          (SELECT count(*) FROM c WHERE v <= hi_cents)
                              ::BIGINT AS le_n
                   FROM h)
            SELECT bin::BIGINT AS bin, hi_cents,
                   (le_n - coalesce(lag(le_n) OVER (ORDER BY bin), 0))
                       ::BIGINT AS n_rows
            FROM le
        """,
        "corpus_phrase_hits": f"""
            WITH w AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9_]+') AS ws
                FROM documents),
            h AS (
                SELECT doc_id,
                       len(list_filter(range(1, len(ws)),
                           i -> ws[i] = '{q.PHRASE_QUERY[0]}'
                            AND ws[i + 1] = '{q.PHRASE_QUERY[1]}'))::BIGINT
                           AS n_hits
                FROM w WHERE len(ws) >= 2)
            SELECT doc_id, n_hits FROM h WHERE n_hits >= 1
        """,
        "events_user_rrf_top20": f"""
            WITH c AS (SELECT user_id, count(*)::BIGINT AS m
                       FROM events WHERE event_type = 'click' GROUP BY 1),
            cr AS (SELECT user_id,
                          row_number() OVER (ORDER BY m DESC, user_id)
                              AS r
                   FROM c),
            ca AS (SELECT * FROM cr WHERE r <= {q.RRF_CANDIDATES}),
            p AS (SELECT user_id,
                         sum(CAST(round(value * 100) AS BIGINT)) AS m
                  FROM events WHERE event_type = 'purchase' GROUP BY 1),
            pr AS (SELECT user_id,
                          row_number() OVER (ORDER BY m DESC, user_id)
                              AS r
                   FROM p),
            pa_ AS (SELECT * FROM pr WHERE r <= {q.RRF_CANDIDATES}),
            f AS (SELECT coalesce(ca.user_id, pa_.user_id) AS user_id,
                         coalesce(1.0 / ({q.RRF_K} + ca.r), 0.0)
                         + coalesce(1.0 / ({q.RRF_K} + pa_.r), 0.0) AS rrf
                  FROM ca FULL OUTER JOIN pa_
                    ON ca.user_id = pa_.user_id)
            SELECT user_id, round(rrf, 6) AS rrf
            FROM f ORDER BY f.rrf DESC, user_id LIMIT 20
        """,
        "events_hourly_xcorr": f"""
            WITH f AS (SELECT event_type AS t,
                              epoch_us(ts) // 3600000000 AS h
                       FROM events
                       WHERE event_type IN ('click', 'purchase')),
            cen AS (SELECT t, h, count(*)::BIGINT AS n FROM f GROUP BY 1, 2),
            bnd AS (SELECT min(h) AS h0, max(h) AS h1 FROM cen),
            grid AS (SELECT h0 + unnest(range(0, h1 - h0 + 1)) AS h
                     FROM bnd WHERE h0 IS NOT NULL),
            x AS (SELECT g.h, coalesce(c.n, 0)::BIGINT AS v
                  FROM grid g LEFT JOIN
                       (SELECT h, n FROM cen WHERE t = 'click') c
                       USING (h)),
            y AS (SELECT g.h, coalesce(c.n, 0)::BIGINT AS v
                  FROM grid g LEFT JOIN
                       (SELECT h, n FROM cen WHERE t = 'purchase') c
                       USING (h)),
            lags AS (SELECT unnest(range(0, {q.XCORR_MAX_LAG + 1}))
                         AS lag),
            m AS (SELECT l.lag,
                         count(*)::BIGINT AS n_pairs,
                         sum(CAST(x.v AS HUGEINT)) AS sx,
                         sum(CAST(y.v AS HUGEINT)) AS sy,
                         sum(CAST(x.v AS HUGEINT) * x.v) AS sxx,
                         sum(CAST(y.v AS HUGEINT) * y.v) AS syy,
                         sum(CAST(x.v AS HUGEINT) * y.v) AS sxy
                  FROM lags l
                  JOIN x ON TRUE
                  JOIN y ON y.h = x.h + l.lag
                  GROUP BY 1)
            SELECT lag, n_pairs,
                   CASE WHEN n_pairs * sxx - sx * sx <= 0
                          OR n_pairs * syy - sy * sy <= 0 THEN NULL
                        ELSE round(
                            CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                            / (sqrt(CAST(n_pairs * sxx - sx * sx
                                         AS DOUBLE))
                               * sqrt(CAST(n_pairs * syy - sy * sy
                                           AS DOUBLE))), 4)
                   END AS r
            FROM m
        """,
        "events_hourly_holt": """
            WITH RECURSIVE h AS (
                SELECT date_trunc('hour', ts) AS hour,
                       count(*)::BIGINT AS n_events
                FROM events GROUP BY 1),
            o AS (SELECT hour, n_events,
                         row_number() OVER (ORDER BY hour) AS rn
                  FROM h),
            -- literal 0.3/0.7 and 0.1/0.9 mirror the Ray-side recurrence;
            -- the new level is recomputed inline for the trend update —
            -- same operand sequence, same doubles
            r AS (
                SELECT rn, hour, n_events,
                       CAST(n_events AS DOUBLE) AS l,
                       CAST(0.0 AS DOUBLE) AS b
                FROM o WHERE rn = 1
                UNION ALL
                SELECT o.rn, o.hour, o.n_events,
                       0.3 * o.n_events + 0.7 * (r.l + r.b),
                       0.1 * ((0.3 * o.n_events + 0.7 * (r.l + r.b))
                              - r.l) + 0.9 * r.b
                FROM r JOIN o ON o.rn = r.rn + 1)
            SELECT hour, n_events, round(l, 4) AS level,
                   round(b, 4) AS trend
            FROM r
        """,
        "doc_split_stratified": """
            SELECT doc_id, lang, source,
                   CASE WHEN row_number() OVER (
                            PARTITION BY lang, source
                            ORDER BY md5_number_upper(doc_id::VARCHAR),
                                     doc_id)
                        <= (count(*) OVER (PARTITION BY lang, source)
                            * 8) // 10
                        THEN 'train' ELSE 'valid' END AS split
            FROM documents
        """,
        "events_snapshot_diff": """
            WITH bnd AS (SELECT min(epoch_us(ts)) AS tmin,
                                max(epoch_us(ts)) AS tmax FROM events),
            cut AS (SELECT tmin + (tmax - tmin) // 2 AS t1,
                           tmin + (tmax - tmin) * 3 // 4 AS t2 FROM bnd),
            snap_a AS (
                SELECT user_id, event_id FROM (
                    SELECT e.user_id, e.event_id,
                           row_number() OVER (PARTITION BY e.user_id
                               ORDER BY e.ts DESC, e.event_id DESC) AS rn
                    FROM events e, cut WHERE epoch_us(e.ts) <= cut.t1)
                WHERE rn = 1),
            snap_b AS (
                SELECT user_id, event_id FROM (
                    SELECT e.user_id, e.event_id,
                           row_number() OVER (PARTITION BY e.user_id
                               ORDER BY e.ts DESC, e.event_id DESC) AS rn
                    FROM events e, cut WHERE epoch_us(e.ts) <= cut.t2)
                WHERE rn = 1),
            cat AS (
                SELECT CASE WHEN a.user_id IS NULL THEN 'inserted'
                            WHEN b.user_id IS NULL THEN 'deleted'
                            WHEN a.event_id <> b.event_id THEN 'updated'
                            ELSE 'unchanged' END AS category
                FROM snap_a a FULL OUTER JOIN snap_b b
                  ON a.user_id = b.user_id),
            g AS (SELECT category, count(*)::BIGINT AS n
                  FROM cat GROUP BY 1)
            SELECT c.category, coalesce(g.n, 0)::BIGINT AS n_users
            FROM (VALUES ('deleted'), ('inserted'), ('unchanged'),
                         ('updated')) c(category)
            LEFT JOIN g ON g.category = c.category
        """,
        "events_value_mannwhitney": """
            WITH f AS (SELECT event_type AS t,
                              CAST(round(value * 100) AS BIGINT) AS c
                       FROM events
                       WHERE event_type IN ('click', 'purchase')),
            cen AS (SELECT c,
                       sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END)::BIGINT
                           AS n1,
                       sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0
                           END)::BIGINT AS n2
                    FROM f GROUP BY 1),
            r AS (SELECT c, n1, n2, n1 + n2 AS m,
                         sum(n1 + n2) OVER (ORDER BY c
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS cb
                  FROM cen),
            s AS (SELECT
                    sum(CAST(n1 AS HUGEINT)
                        * (2 * coalesce(cb, 0) + m + 1)) AS r1x2,
                    sum(n1)::BIGINT AS n1t, sum(n2)::BIGINT AS n2t,
                    sum(CAST(m AS HUGEINT) * m * m - m) AS tie
                  FROM r),
            fin AS (SELECT n1t, n2t,
                       r1x2 - CAST(n1t AS HUGEINT) * (n1t + 1) AS u1x2,
                       CAST(n1t AS HUGEINT) * n2t
                         * (CAST(n1t + n2t AS HUGEINT) * (n1t + n2t)
                              * (n1t + n2t)
                            - (n1t + n2t) - tie) AS amat,
                       12 * CAST(n1t + n2t AS HUGEINT) * (n1t + n2t - 1)
                           AS bmat
                    FROM s WHERE n1t > 0 AND n2t > 0)
            SELECT n1t AS n_click, n2t AS n_purchase,
                   CAST(u1x2 AS DOUBLE) / 2.0 AS u,
                   CASE WHEN amat <= 0 THEN NULL
                        ELSE round((CAST(u1x2 AS DOUBLE) / 2.0
                             - CAST(CAST(n1t AS HUGEINT) * n2t AS DOUBLE)
                               / 2.0)
                            / sqrt(CAST(amat AS DOUBLE)
                                   / CAST(bmat AS DOUBLE)), 4)
                   END AS z
            FROM fin
        """,
        "events_funnel_window_sweep": _funnel_sweep_sql(),
        "events_bounce_rate_weekly": """
            WITH gaps AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), numbered AS (
                SELECT user_id, ts,
                       sum(new_session) OVER
                         (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
                FROM gaps
            ), sess AS (
                SELECT user_id, sid, min(ts) AS start_ts,
                       count(*) AS n_ev
                FROM numbered GROUP BY user_id, sid
            ), c AS (
                SELECT CAST(floor(epoch(start_ts) / 604800) AS BIGINT)
                           AS wk,
                       count(*)::BIGINT AS n_sessions,
                       sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)::BIGINT
                           AS n_bounce
                FROM sess GROUP BY 1)
            SELECT wk, n_sessions, n_bounce,
                   round(n_bounce / n_sessions, 4) AS bounce_rate
            FROM c
        """,
        "orders_cohort_repeat_rate": """
            WITH f AS (SELECT o_custkey, min(o_orderdate) AS fd
                       FROM orders GROUP BY 1),
            r AS (SELECT f.o_custkey,
                         CASE WHEN EXISTS (
                             SELECT 1 FROM orders o
                             WHERE o.o_custkey = f.o_custkey
                               AND o.o_orderdate > f.fd
                               AND o.o_orderdate <= f.fd
                                   + INTERVAL 90 DAY)
                              THEN 1 ELSE 0 END AS rep,
                         date_trunc('month', f.fd) AS cohort_month
                  FROM f)
            SELECT cohort_month, count(*)::BIGINT AS n_customers,
                   sum(rep)::BIGINT AS n_repeat,
                   round(sum(rep) / count(*), 4) AS repeat_rate
            FROM r GROUP BY 1
        """,
        "part_mincost_supplier_q2": """
            WITH cs AS (
                SELECT l_partkey AS pk, l_suppkey AS sk,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                           AS cents,
                       sum(CAST(round(l_quantity) AS BIGINT)) AS qty
                FROM lineitem GROUP BY 1, 2),
            cand AS (
                SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
                       n.n_name, s.s_acctbal,
                       CAST(cs.cents * 10000 // cs.qty AS BIGINT)
                           AS cost_micro
                FROM cs
                JOIN part p ON p.p_partkey = cs.pk
                 AND p.p_size = 15 AND p.p_type = 'ECONOMY'
                JOIN supplier s ON s.s_suppkey = cs.sk
                JOIN nation n ON n.n_nationkey = s.s_nationkey
                JOIN region r ON r.r_regionkey = n.n_regionkey
                 AND r.r_name = 'EUROPE'),
            best AS (
                SELECT *, row_number() OVER
                    (PARTITION BY p_partkey
                     ORDER BY cost_micro, s_suppkey) AS rn
                FROM cand)
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost_micro
            FROM best WHERE rn = 1
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100
        """,
        "supplier_promo_stock_q20": """
            SELECT s.s_name, s.s_acctbal
            FROM supplier s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
             AND n.n_name = 'NATION_7'
            WHERE s.s_suppkey IN (
                SELECT l.l_suppkey
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                WHERE p.p_name LIKE 'red %'
                  AND l.l_shipdate >= DATE '1996-01-01'
                  AND l.l_shipdate < DATE '1997-01-01'
                GROUP BY l.l_suppkey, l.l_partkey
                HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 30)
            ORDER BY s.s_name
        """,
        "events_user_count_kmv": """
            WITH h AS (
                SELECT DISTINCT md5_number_upper(user_id::VARCHAR) AS hv
                FROM events),
            k AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
            s AS (SELECT count(*)::BIGINT AS ku, max(hv) AS hk FROM k)
            SELECT ku AS k_used,
                   round(CASE WHEN ku < 256 THEN ku::DOUBLE
                              ELSE 255 * power(2.0, 64) / hk::DOUBLE END,
                         4) AS est_kmv
            FROM s
        """,
        "events_hour_dow_seasonality": """
            WITH c AS (
                SELECT isodow(ts)::BIGINT AS dow, hour(ts)::BIGINT AS hr,
                       count(*)::BIGINT AS n,
                       sum(CAST(round(value * 100) AS BIGINT)) AS sv
                FROM events GROUP BY 1, 2),
            t AS (SELECT sum(n) AS tot FROM c)
            SELECT dow, hr, n,
                   round(sv / 100.0 / n, 4) AS avg_value,
                   round(n * 168.0 / tot, 4) AS seasonal_idx
            FROM c, t
        """,
        "events_windowed_funnel": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            v AS (SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'view'),
            rc AS (SELECT DISTINCT e2.user_id, e2.ts
                   FROM events e1 JOIN events e2
                     ON e2.user_id = e1.user_id
                    AND e1.event_type = 'view'
                    AND e2.event_type = 'click'
                    AND e1.ts < e2.ts
                    AND e2.ts <= e1.ts + INTERVAL 1 HOUR),
            rp AS (SELECT DISTINCT e3.user_id
                   FROM rc JOIN events e3
                     ON e3.user_id = rc.user_id
                    AND e3.event_type = 'purchase'
                    AND rc.ts < e3.ts
                    AND e3.ts <= rc.ts + INTERVAL 1 HOUR),
            st AS (SELECT u.user_id,
                          CASE WHEN rp.user_id IS NOT NULL THEN 3
                               WHEN rcu.user_id IS NOT NULL THEN 2
                               WHEN v.user_id IS NOT NULL THEN 1
                               ELSE 0 END AS stage
                   FROM u
                   LEFT JOIN rp ON rp.user_id = u.user_id
                   LEFT JOIN (SELECT DISTINCT user_id FROM rc) rcu
                          ON rcu.user_id = u.user_id
                   LEFT JOIN v ON v.user_id = u.user_id)
            SELECT stage, count(*)::BIGINT AS n_users FROM st GROUP BY 1
        """,
        "events_user_lifecycle": """
            WITH w AS (SELECT DISTINCT user_id,
                              CAST(floor(epoch(ts) / 604800) AS BIGINT)
                                  AS wk
                       FROM events),
            mx AS (SELECT max(wk) AS maxw FROM w),
            lagd AS (SELECT user_id, wk,
                            lag(wk) OVER (PARTITION BY user_id
                                          ORDER BY wk) AS pw,
                            lead(wk) OVER (PARTITION BY user_id
                                           ORDER BY wk) AS nw
                     FROM w),
            st AS (
                SELECT wk, CASE WHEN pw IS NULL THEN 0
                                WHEN pw = wk - 1 THEN 1
                                ELSE 2 END AS s
                FROM lagd
                UNION ALL
                SELECT wk + 1, 3 FROM lagd, mx
                WHERE (nw IS NULL OR nw > wk + 1) AND wk + 1 <= maxw)
            SELECT wk,
                   sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)::BIGINT AS n_new,
                   sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_retained,
                   sum(CASE WHEN s = 2 THEN 1 ELSE 0 END)::BIGINT
                       AS n_resurrected,
                   sum(CASE WHEN s = 3 THEN 1 ELSE 0 END)::BIGINT
                       AS n_churned
            FROM st GROUP BY 1
        """,
        "events_seasonal_anomaly": """
            WITH c AS (SELECT CAST(floor(epoch(ts) / 604800) AS BIGINT)
                                  AS wk,
                              isodow(ts)::BIGINT AS dow,
                              hour(ts)::BIGINT AS hr,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2, 3),
            wr AS (SELECT max(wk) - min(wk) + 1 AS W FROM c),
            cell AS (SELECT dow, hr, sum(n)::BIGINT AS S,
                            sum(n * n)::BIGINT AS Q
                     FROM c GROUP BY 1, 2),
            sc AS (SELECT c.wk, c.dow, c.hr, c.n,
                          (c.n * wr.W - cell.S)
                              / sqrt(wr.W * cell.Q - cell.S * cell.S) AS z
                   FROM c JOIN cell USING (dow, hr) CROSS JOIN wr
                   WHERE wr.W * cell.Q - cell.S * cell.S > 0)
            SELECT wk, dow, hr, n, round(z, 4) AS z
            FROM sc ORDER BY abs(z) DESC, wk, dow, hr LIMIT 20
        """,
        "users_all_event_types": """
            WITH t AS (SELECT count(DISTINCT event_type) AS nt FROM events),
            u AS (SELECT user_id, count(DISTINCT event_type) AS c
                  FROM events GROUP BY 1)
            SELECT u.user_id FROM u, t WHERE u.c = t.nt
        """,
        "events_conversion_delay": """
            WITH v AS (SELECT user_id, min(ts) AS tv FROM events
                       WHERE event_type = 'view' GROUP BY 1),
            p AS (SELECT e.user_id, min(e.ts) AS tp
                  FROM events e JOIN v ON v.user_id = e.user_id
                  WHERE e.event_type = 'purchase' AND e.ts > v.tv
                  GROUP BY 1),
            d AS (SELECT CAST(floor(epoch(v.tv) / 604800) AS BIGINT) AS wk,
                         CAST(floor(epoch(p.tp - v.tv)) AS BIGINT)
                             AS delay_s
                  FROM v JOIN p ON p.user_id = v.user_id)
            SELECT wk, count(*)::BIGINT AS n_converted,
                   quantile_disc(delay_s, 0.5) AS p50_delay_s,
                   quantile_disc(delay_s, 0.9) AS p90_delay_s
            FROM d GROUP BY 1
        """,
        "events_type_trigrams_top20": """
            WITH s AS (SELECT user_id, event_type AS t1,
                              lead(event_type, 1) OVER w AS t2,
                              lead(event_type, 2) OVER w AS t3
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id))
            SELECT t1 || '>' || t2 || '>' || t3 AS trigram,
                   count(*)::BIGINT AS n
            FROM s WHERE t3 IS NOT NULL
            GROUP BY 1 ORDER BY n DESC, trigram ASC LIMIT 20
        """,
        "events_bot_users": """
            WITH o AS (SELECT user_id, ts,
                              lead(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS nxt
                       FROM events),
            g AS (SELECT user_id,
                         CAST(floor(epoch(nxt - ts)) AS BIGINT) AS gap_s
                  FROM o WHERE nxt IS NOT NULL),
            a AS (SELECT user_id, count(*)::BIGINT + 1 AS n_events,
                         quantile_disc(gap_s, 0.5) AS med_gap_s
                  FROM g GROUP BY 1)
            SELECT user_id, n_events, med_gap_s,
                   (CASE WHEN n_events >= 40 AND med_gap_s < 2400
                         THEN 1 ELSE 0 END)::BIGINT AS is_bot
            FROM a
        """,
        "events_attribution_linear": """
            WITH p AS (SELECT event_id AS pid, user_id, ts AS pts
                       FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, event_id AS cid, ts AS cts
                  FROM events WHERE event_type = 'click'),
            m AS (SELECT p.pid, c.cid, c.cts,
                         row_number() OVER (PARTITION BY p.pid
                             ORDER BY c.cts, c.cid) AS rn,
                         count(*) OVER (PARTITION BY p.pid) AS mtot
                  FROM p JOIN c ON c.user_id = p.user_id
                   AND c.cts < p.pts
                   AND c.cts >= p.pts - INTERVAL 7 DAY),
            cr AS (SELECT cid, cts,
                          (1000 // mtot
                           + CASE WHEN rn <= 1000 % mtot
                                  THEN 1 ELSE 0 END)::BIGINT AS credit
                   FROM m)
            SELECT CAST(floor(epoch(cts) / 604800) AS BIGINT) AS wk,
                   count(*)::BIGINT AS n_touches,
                   sum(credit)::BIGINT AS credit_milli
            FROM cr GROUP BY 1
        """,
        "kg_communities_lpa": ko.kg_communities_lpa_sql(tglob),
        "mention_heavy_hitters": ko.mention_heavy_hitters_sql(tglob),
        "events_value_quantiles": """
            SELECT quantile_disc(value, 0.5) AS p50,
                   quantile_disc(value, 0.9) AS p90,
                   quantile_disc(value, 0.99) AS p99
            FROM events
        """,
        "events_user_count_hll": """
            WITH h AS (
                SELECT DISTINCT md5_number_upper(user_id::VARCHAR) AS hv
                FROM events),
            r AS (SELECT hv % 256 AS j, hv // 256 AS w FROM h),
            rr AS (
                SELECT j, max(CASE WHEN w = 0 THEN 57
                              ELSE 56 - length(ltrim(bin(w), '0')) + 1 END
                          ) AS rho
                FROM r GROUP BY j),
            agg AS (SELECT sum(pow(2.0, -rho)) AS s, count(*) AS nz FROM rr),
            ne AS (SELECT count(DISTINCT user_id)::BIGINT AS n_exact
                   FROM events),
            est AS (
                SELECT CASE
                    WHEN (0.7213 / (1 + 1.079 / 256)) * 65536
                         / (s + (256 - nz)) <= 640
                         AND nz < 256
                    THEN 256 * ln(256.0 / (256 - nz))
                    ELSE (0.7213 / (1 + 1.079 / 256)) * 65536
                         / (s + (256 - nz))
                END AS e FROM agg)
            SELECT round(est.e, 4) AS hll_estimate,
                   ne.n_exact,
                   round(abs(est.e - ne.n_exact) / ne.n_exact, 4) AS rel_err
            FROM est, ne
        """,
        "events_value_hist": """
            WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
            b AS (
                SELECT CASE WHEN mm.hi = mm.lo THEN 0.0
                            ELSE least(floor((e.value - mm.lo) * 20.0
                                             / (mm.hi - mm.lo)), 19.0)
                       END AS fbin
                FROM events e, mm)
            SELECT fbin::BIGINT AS bin,
                   round(mm.lo + fbin * ((mm.hi - mm.lo) / 20.0), 4) AS bin_lo,
                   round(mm.lo + (fbin + 1) * ((mm.hi - mm.lo) / 20.0), 4)
                       AS bin_hi,
                   count(*)::BIGINT AS n_events
            FROM b, mm GROUP BY fbin, mm.lo, mm.hi
        """,
        "events_value_outliers": """
            WITH q AS (
                SELECT event_type,
                       quantile_disc(value, 0.25) AS p25,
                       quantile_disc(value, 0.75) AS p75
                FROM events GROUP BY event_type),
            s AS (
                SELECT e.event_type,
                       sum(CASE WHEN e.value < q.p25 - 1.5 * (q.p75 - q.p25)
                                  OR e.value > q.p75 + 1.5 * (q.p75 - q.p25)
                                THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
                       count(*)::BIGINT AS n_rows
                FROM events e JOIN q USING (event_type)
                GROUP BY e.event_type)
            SELECT q.event_type, q.p25, q.p75,
                   round(q.p25 - 1.5 * (q.p75 - q.p25), 4) AS lo_fence,
                   round(q.p75 + 1.5 * (q.p75 - q.p25), 4) AS hi_fence,
                   s.n_outliers, s.n_rows
            FROM q JOIN s USING (event_type)
        """,
        "orders_monthly_mom": """
            WITH m AS (
                SELECT o_orderpriority,
                       date_trunc('month', o_orderdate) AS month,
                       count(*)::BIGINT AS n_orders
                FROM orders GROUP BY 1, 2),
            w AS (
                SELECT o_orderpriority, month, n_orders,
                       lag(n_orders) OVER (
                           PARTITION BY o_orderpriority ORDER BY month
                       ) AS prev_n_orders
                FROM m)
            SELECT o_orderpriority, month, n_orders, prev_n_orders,
                   n_orders - prev_n_orders AS mom_delta
            FROM w WHERE prev_n_orders IS NOT NULL
        """,
        "events_user_window_1h": """
            SELECT event_id, user_id, ts,
                   count(*) OVER w AS n_w,
                   round(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                         / 100.0, 4) AS sum_w
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
        """,
        "events_latest_per_user": """
            SELECT user_id, event_id, ts, event_type, value FROM (
                SELECT user_id, event_id, ts, event_type, value,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) WHERE rn = 1
        """,
        "fk_orphan_audit": """
            SELECT 'orders->customer' AS relation,
                   count(*)::BIGINT AS n_rows,
                   count(DISTINCT o.o_custkey)::BIGINT AS n_keys,
                   sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0
                       END)::BIGINT AS n_orphan_rows,
                   count(DISTINCT CASE WHEN c.c_custkey IS NULL
                                  THEN o.o_custkey END)::BIGINT
                       AS n_orphan_keys
            FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
            UNION ALL
            SELECT 'lineitem->orders',
                   count(*)::BIGINT,
                   count(DISTINCT l.l_orderkey)::BIGINT,
                   sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0
                       END)::BIGINT,
                   count(DISTINCT CASE WHEN o.o_orderkey IS NULL
                                  THEN l.l_orderkey END)::BIGINT
            FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        """,
        "events_audience_overlap_hll": """
            WITH h AS (
                SELECT DISTINCT event_type,
                       md5_number_upper(user_id::VARCHAR) AS hv
                FROM events WHERE event_type IN ('click', 'purchase')),
            r AS (SELECT event_type, hv % 256 AS j, hv // 256 AS w FROM h),
            rr AS (
                SELECT event_type, j,
                       max(CASE WHEN w = 0 THEN 57
                           ELSE 56 - length(ltrim(bin(w), '0')) + 1 END
                       ) AS rho
                FROM r GROUP BY 1, 2),
            ru AS (SELECT j, max(rho) AS rho FROM rr GROUP BY j),
            agg AS (
                SELECT event_type AS s, sum(pow(2.0, -rho)) AS sm,
                       count(*) AS nz
                FROM rr GROUP BY 1
                UNION ALL
                SELECT 'union', sum(pow(2.0, -rho)), count(*) FROM ru),
            est AS (
                SELECT s, CASE
                    WHEN (0.7213 / (1 + 1.079 / 256)) * 65536
                         / (sm + (256 - nz)) <= 640
                         AND nz < 256
                    THEN 256 * ln(256.0 / (256 - nz))
                    ELSE (0.7213 / (1 + 1.079 / 256)) * 65536
                         / (sm + (256 - nz))
                END AS e FROM agg),
            ex AS (
                SELECT count(*)::BIGINT AS n_exact_intersection FROM (
                    SELECT user_id FROM events WHERE event_type = 'click'
                    INTERSECT
                    SELECT user_id FROM events WHERE event_type = 'purchase'))
            SELECT round(a.e, 4) AS est_click,
                   round(b.e, 4) AS est_purchase,
                   round(u.e, 4) AS est_union,
                   round(a.e + b.e - u.e, 4) AS est_intersection,
                   ex.n_exact_intersection
            FROM est a, est b, est u, ex
            WHERE a.s = 'click' AND b.s = 'purchase' AND u.s = 'union'
        """,
        "embedding_sq8": """
            WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
                       FROM embeddings),
            s AS (SELECT vec_id, e,
                         list_max(list_transform(e, x -> abs(x))) / 127.0
                             AS scale
                  FROM v),
            c AS (SELECT vec_id, scale,
                         CASE WHEN scale = 0
                              THEN list_transform(e, x -> 0::BIGINT)
                              ELSE list_transform(
                                  e, x -> floor(x / scale + 0.5)::BIGINT)
                         END AS codes
                  FROM s)
            SELECT vec_id, round(scale, 6) AS scale,
                   list_min(codes)::BIGINT AS code_min,
                   list_max(codes)::BIGINT AS code_max,
                   list_sum(codes)::BIGINT AS code_sum,
                   list_sum(list_transform(codes, x -> x * x))::BIGINT
                       AS code_sumsq
            FROM c
        """,
        "nation_balance_full_outer": """
            WITH c AS (
                SELECT c_nationkey::BIGINT AS k, count(*)::BIGINT AS n,
                       sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS cents
                FROM customer GROUP BY 1),
            s AS (
                SELECT s_nationkey::BIGINT AS k, count(*)::BIGINT AS n,
                       sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS cents
                FROM supplier GROUP BY 1)
            SELECT coalesce(c.k, s.k) AS n_nationkey,
                   coalesce(c.n, 0)::BIGINT AS n_customers,
                   round(coalesce(c.cents, 0) / 100.0, 4) AS cust_balance,
                   coalesce(s.n, 0)::BIGINT AS n_suppliers,
                   round(coalesce(s.cents, 0) / 100.0, 4) AS supp_balance
            FROM c FULL OUTER JOIN s ON c.k = s.k
        """,
        "orders_priority_share": """
            WITH c AS (
                SELECT o_orderpriority, count(*)::BIGINT AS n_orders
                FROM orders GROUP BY 1),
            t AS (SELECT sum(n_orders)::BIGINT AS total FROM c)
            SELECT c.o_orderpriority, c.n_orders,
                   round(c.n_orders::DOUBLE / t.total, 4) AS share
            FROM c, t
        """,
        "events_user_rank_top3": """
            WITH c AS (
                SELECT event_type, user_id, count(*)::BIGINT AS n_events
                FROM events GROUP BY 1, 2),
            r AS (
                SELECT event_type, user_id, n_events,
                       rank() OVER (
                           PARTITION BY event_type ORDER BY n_events DESC
                       )::BIGINT AS rnk
                FROM c)
            SELECT * FROM r WHERE rnk <= 3
        """,
        "events_user_max_streak": """
            WITH d AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) AS day
                FROM events),
            i AS (
                SELECT user_id, day,
                       day - row_number() OVER (
                           PARTITION BY user_id ORDER BY day
                       ) * INTERVAL 1 DAY AS grp
                FROM d),
            s AS (SELECT user_id, grp, count(*)::BIGINT AS len
                  FROM i GROUP BY 1, 2)
            SELECT user_id, sum(len)::BIGINT AS n_active_days,
                   max(len)::BIGINT AS max_streak_days
            FROM s GROUP BY user_id
        """,
        "events_selfjoin_size_cms": """
            WITH rows_ AS (SELECT unnest(range(4)) AS r),
            regs AS (
                SELECT rows_.r,
                       md5_number_upper(rows_.r::VARCHAR || '|'
                                        || e.user_id::VARCHAR) % 1024 AS col,
                       count(*)::BIGINT AS cnt
                FROM events e CROSS JOIN rows_
                GROUP BY 1, 2),
            est AS (
                SELECT min(s)::BIGINT AS est_selfjoin FROM (
                    SELECT r, sum(cnt * cnt) AS s FROM regs GROUP BY r)),
            ex AS (
                SELECT sum(n * n)::BIGINT AS exact_selfjoin FROM (
                    SELECT count(*)::BIGINT AS n FROM events
                    GROUP BY user_id))
            SELECT est.est_selfjoin, ex.exact_selfjoin,
                   round((est.est_selfjoin - ex.exact_selfjoin)::DOUBLE
                         / ex.exact_selfjoin, 4) AS rel_overestimate
            FROM est, ex
        """,
        "part_name_clusters": """
            WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
            pairs AS (
                SELECT a.p_name AS x, b.p_name AS y
                FROM names a JOIN names b
                  ON a.p_name < b.p_name
                 AND levenshtein(a.p_name, b.p_name) <= 2),
            edges AS (SELECT x, y FROM pairs
                      UNION SELECT y, x FROM pairs),
            reach(src, dst) AS (
                SELECT p_name, p_name FROM names
                UNION
                SELECT r.src, e.y FROM reach r JOIN edges e ON e.x = r.dst),
            lab AS (SELECT src AS p_name, min(dst) AS cluster_id
                    FROM reach GROUP BY src)
            SELECT l.p_name, l.cluster_id, c.cluster_size
            FROM lab l JOIN (
                SELECT cluster_id, count(*)::BIGINT AS cluster_size
                FROM lab GROUP BY 1) c USING (cluster_id)
        """,
        "events_user_gini": """
            WITH c AS (
                SELECT user_id, count(*)::BIGINT AS n_events
                FROM events GROUP BY 1),
            r AS (
                SELECT n_events,
                       row_number() OVER (ORDER BY n_events, user_id) AS i
                FROM c),
            a AS (
                SELECT sum(i * n_events)::BIGINT AS A,
                       sum(n_events)::BIGINT AS B,
                       count(*)::BIGINT AS n
                FROM r)
            SELECT n AS n_users, B AS n_events,
                   round(2.0 * A / (n * B) - (n + 1.0) / n, 4) AS gini
            FROM a
        """,
        "events_value_ks_drift": """
            WITH v AS (
                SELECT event_type, value FROM events
                WHERE event_type IN ('click', 'purchase')),
            n AS (
                SELECT sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                           END)::BIGINT AS n1,
                       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                           END)::BIGINT AS n2
                FROM v),
            cdf AS (
                SELECT value,
                       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                           END) OVER (ORDER BY value) AS c1,
                       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                           END) OVER (ORDER BY value) AS c2
                FROM v),
            g AS (
                SELECT value,
                       abs(c1 * n.n2 - c2 * n.n1)::BIGINT AS gap
                FROM cdf, n),
            m AS (SELECT max(gap) AS mg FROM g),
            at_ AS (SELECT min(value) AS v FROM g, m WHERE g.gap = m.mg)
            SELECT n.n1 AS n_click, n.n2 AS n_purchase,
                   round(m.mg::DOUBLE / (n.n1 * n.n2), 4) AS ks,
                   at_.v AS ks_at_value
            FROM n, m, at_
        """,
        "events_sliding_distinct_users": """
            WITH p AS (
                SELECT DISTINCT w, user_id
                FROM events,
                     unnest([time_bucket(INTERVAL '30 minutes', ts),
                             time_bucket(INTERVAL '30 minutes', ts)
                               - INTERVAL '30 minutes']) AS t(w))
            SELECT w AS window_start, count(*)::BIGINT AS n_users
            FROM p GROUP BY w
        """,
        "events_session_conversion": """
            WITH gaps AS (
                SELECT user_id, ts, event_type,
                       CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), numbered AS (
                SELECT user_id, event_type,
                       sum(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM gaps
            ), s AS (
                SELECT user_id, sid,
                       max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                           END) AS conv
                FROM numbered GROUP BY 1, 2
            )
            SELECT user_id, count(*)::BIGINT AS n_sessions,
                   sum(conv)::BIGINT AS n_converted,
                   round(sum(conv)::DOUBLE / count(*), 4) AS conv_rate
            FROM s GROUP BY user_id
        """,
        "events_table_fingerprint": """
            SELECT count(*)::BIGINT AS n_rows,
                   (sum(md5_number_upper(event_id::VARCHAR || '|'
                                         || user_id::VARCHAR)
                        % 2305843009213693951)
                    % 2305843009213693951)::BIGINT AS fingerprint
            FROM events
        """,
        "events_type_dow_chi2": """
            WITH c AS (
                SELECT event_type, dayofweek(ts)::BIGINT AS dow,
                       count(*)::BIGINT AS observed
                FROM events GROUP BY 1, 2),
            t AS (SELECT sum(observed)::BIGINT AS n FROM c),
            r AS (SELECT event_type, sum(observed)::BIGINT AS rt
                  FROM c GROUP BY 1),
            d AS (SELECT dow, sum(observed)::BIGINT AS ct FROM c GROUP BY 1)
            SELECT c.event_type, c.dow, c.observed,
                   round((r.rt::HUGEINT * d.ct)::DOUBLE / t.n, 4) AS expected,
                   round(((c.observed::HUGEINT * t.n - r.rt::HUGEINT * d.ct)
                          * (c.observed::HUGEINT * t.n
                             - r.rt::HUGEINT * d.ct))::DOUBLE
                         / ((r.rt::HUGEINT * d.ct * t.n))::DOUBLE, 4)
                       AS contrib
            FROM c JOIN r USING (event_type) JOIN d USING (dow), t
        """,
        "events_cohort_retention": """
            WITH w AS (
                SELECT DISTINCT user_id,
                       date_trunc('week', ts)::TIMESTAMP AS week
                FROM events),
            f AS (SELECT user_id, min(week) AS cohort_week
                  FROM w GROUP BY 1)
            SELECT f.cohort_week,
                   (date_diff('day', f.cohort_week, w.week) // 7)::BIGINT
                       AS week_offset,
                   count(*)::BIGINT AS n_active
            FROM w JOIN f USING (user_id)
            GROUP BY 1, 2
        """,
        "events_user_max_drawdown": """
            WITH c AS (
                SELECT user_id,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       max(CAST(round(value * 100) AS BIGINT)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS runmax
                FROM events)
            SELECT user_id, count(*)::BIGINT AS n_events,
                   round(max(runmax) / 100.0, 4) AS peak_value,
                   round(max(runmax - cents) / 100.0, 4) AS max_drawdown
            FROM c GROUP BY user_id
        """,
        "events_value_trend_ols": """
            WITH m AS (
                SELECT event_type, count(*)::HUGEINT AS n,
                       sum(epoch_us(ts) // 60000000 - 28401120)::HUGEINT
                           AS st,
                       sum(CAST(round(value * 100) AS BIGINT))::HUGEINT
                           AS sv,
                       sum((epoch_us(ts) // 60000000 - 28401120)
                           * CAST(round(value * 100) AS BIGINT))::HUGEINT
                           AS stv,
                       sum((epoch_us(ts) // 60000000 - 28401120)
                           * (epoch_us(ts) // 60000000 - 28401120))::HUGEINT
                           AS stt
                FROM events GROUP BY 1)
            SELECT event_type, n::BIGINT AS n_rows,
                   CASE WHEN n * stt - st * st = 0 THEN NULL
                        ELSE round(((n * stv - st * sv) * 1440)::DOUBLE
                                   / ((n * stt - st * st) * 100)::DOUBLE, 6)
                   END AS slope_per_day,
                   CASE WHEN n * stt - st * st = 0 THEN NULL
                        ELSE round((sv * stt - st * stv)::DOUBLE
                                   / ((n * stt - st * st) * 100)::DOUBLE, 4)
                   END AS intercept_value
            FROM m
        """,
        "events_ab_conversion_ztest": """
            WITH u AS (
                SELECT user_id,
                       CASE WHEN md5_number_upper(user_id::VARCHAR) % 2 = 0
                            THEN 'A' ELSE 'B' END AS arm,
                       max(CASE WHEN event_type = 'purchase'
                                 AND value >= 150 THEN 1 ELSE 0
                           END) AS conv
                FROM events GROUP BY user_id),
            a AS (
                SELECT
                    sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)::BIGINT AS n1,
                    sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END)::BIGINT
                        AS c1,
                    sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)::BIGINT AS n2,
                    sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END)::BIGINT
                        AS c2
                FROM u)
            SELECT n1 AS n_users_a, c1 AS n_conv_a,
                   n2 AS n_users_b, c2 AS n_conv_b,
                   CASE WHEN n1 = 0 THEN NULL
                        ELSE round(c1::DOUBLE / n1, 4) END AS rate_a,
                   CASE WHEN n2 = 0 THEN NULL
                        ELSE round(c2::DOUBLE / n2, 4) END AS rate_b,
                   CASE WHEN n1 = 0 OR n2 = 0 OR c1 + c2 = 0
                             OR c1 + c2 = n1 + n2 THEN NULL
                        ELSE round(
                            (c1::HUGEINT * n2 - c2::HUGEINT * n1)::DOUBLE
                            / sqrt(((c1 + c2)::HUGEINT
                                    * (n1 + n2 - c1 - c2) * n1 * n2)::DOUBLE
                                   / (n1 + n2)), 4)
                   END AS z_stat
            FROM a
        """,
        "events_session_paths_top20": """
            WITH gaps AS (
                SELECT user_id, ts, event_id, event_type,
                       CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            numbered AS (
                SELECT user_id, ts, event_id, event_type,
                       sum(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM gaps),
            ranked AS (
                SELECT user_id, sid, event_type,
                       row_number() OVER (
                           PARTITION BY user_id, sid
                           ORDER BY ts, event_id) AS rn
                FROM numbered),
            paths AS (
                SELECT user_id, sid,
                       string_agg(event_type, '>' ORDER BY rn) AS path
                FROM ranked WHERE rn <= 5 GROUP BY 1, 2)
            SELECT path, count(*)::BIGINT AS n
            FROM paths GROUP BY path
            ORDER BY n DESC, path ASC LIMIT 20
        """,
        "events_user_burst_max": """
            WITH w AS (
                SELECT user_id, ts,
                       count(*) OVER (
                           PARTITION BY user_id ORDER BY ts
                           RANGE BETWEEN CURRENT ROW
                                 AND INTERVAL 5 MINUTE FOLLOWING
                       )::BIGINT AS c
                FROM events),
            agg AS (
                SELECT user_id, count(*)::BIGINT AS n_events,
                       max(c)::BIGINT AS burst_5min
                FROM w GROUP BY 1)
            SELECT a.user_id, a.n_events, a.burst_5min,
                   min(w.ts) AS burst_start_ts
            FROM agg a JOIN w
              ON w.user_id = a.user_id AND w.c = a.burst_5min
            GROUP BY 1, 2, 3
        """,
        "basket_brand_lift_top20": """
            WITH ob AS (
                SELECT DISTINCT l.l_orderkey, p.p_brand
                FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
            n AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders
                  FROM ob),
            s AS (SELECT p_brand, count(*)::BIGINT AS n1 FROM ob GROUP BY 1),
            pr AS (
                SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                       count(*)::BIGINT AS n_ab
                FROM ob a JOIN ob b
                  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
                GROUP BY 1, 2)
            SELECT pr.brand_a, pr.brand_b, pr.n_ab,
                   round(pr.n_ab::DOUBLE / n.n_orders, 4) AS support,
                   round((pr.n_ab::HUGEINT * n.n_orders)::DOUBLE
                         / (sa.n1::HUGEINT * sb.n1), 4) AS lift
            FROM pr
            CROSS JOIN n
            JOIN s sa ON sa.p_brand = pr.brand_a
            JOIN s sb ON sb.p_brand = pr.brand_b
            WHERE pr.n_ab >= 3
            ORDER BY lift DESC, pr.brand_a ASC, pr.brand_b ASC
            LIMIT 20
        """,
        "orders_top20_diversified": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders) WHERE rn <= 2
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
        """,
        "events_value_psi": """
            WITH v AS (
                SELECT event_type, value FROM events
                WHERE event_type IN ('click', 'purchase')),
            mm AS (SELECT min(value) AS lo, max(value) AS hi FROM v),
            b AS (
                SELECT event_type,
                       CASE WHEN mm.hi = mm.lo THEN 0.0
                            ELSE least(floor((v.value - mm.lo) * 10.0
                                             / (mm.hi - mm.lo)), 9.0)
                       END AS fbin
                FROM v, mm),
            c AS (
                SELECT fbin::BIGINT AS bin,
                       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                           END)::BIGINT AS n_click,
                       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                           END)::BIGINT AS n_purchase
                FROM b GROUP BY 1),
            t AS (SELECT sum(n_click)::BIGINT AS na,
                         sum(n_purchase)::BIGINT AS nb FROM c)
            SELECT c.bin, c.n_click, c.n_purchase,
                   CASE WHEN c.n_click = 0 OR c.n_purchase = 0 THEN NULL
                        ELSE round(
                            (c.n_purchase::DOUBLE / t.nb
                             - c.n_click::DOUBLE / t.na)
                            * ln((c.n_purchase::HUGEINT * t.na)::DOUBLE
                                 / (c.n_click::HUGEINT * t.nb)), 4)
                   END AS psi_contrib
            FROM c, t
        """,
        "events_user_rfm_segments": """
            WITH ref AS (SELECT max(epoch_us(ts)) AS ref_us FROM events),
            m AS (
                SELECT user_id,
                       (ref.ref_us - max(epoch_us(ts))) // 86400000000
                           AS r_days,
                       count(*)::BIGINT AS f_n,
                       sum(CAST(round(value * 100) AS BIGINT))::BIGINT
                           AS m_cents
                FROM events, ref
                GROUP BY user_id, ref.ref_us),
            qb AS (
                SELECT quantile_disc(r_days, 0.25) AS q1r,
                       quantile_disc(r_days, 0.5) AS q2r,
                       quantile_disc(r_days, 0.75) AS q3r,
                       quantile_disc(f_n, 0.25) AS q1f,
                       quantile_disc(f_n, 0.5) AS q2f,
                       quantile_disc(f_n, 0.75) AS q3f,
                       quantile_disc(m_cents, 0.25) AS q1m,
                       quantile_disc(m_cents, 0.5) AS q2m,
                       quantile_disc(m_cents, 0.75) AS q3m
                FROM m)
            SELECT (4 - CASE WHEN m.r_days > qb.q1r THEN 1 ELSE 0 END
                      - CASE WHEN m.r_days > qb.q2r THEN 1 ELSE 0 END
                      - CASE WHEN m.r_days > qb.q3r THEN 1 ELSE 0 END
                   )::BIGINT AS r_score,
                   (1 + CASE WHEN m.f_n > qb.q1f THEN 1 ELSE 0 END
                      + CASE WHEN m.f_n > qb.q2f THEN 1 ELSE 0 END
                      + CASE WHEN m.f_n > qb.q3f THEN 1 ELSE 0 END
                   )::BIGINT AS f_score,
                   (1 + CASE WHEN m.m_cents > qb.q1m THEN 1 ELSE 0 END
                      + CASE WHEN m.m_cents > qb.q2m THEN 1 ELSE 0 END
                      + CASE WHEN m.m_cents > qb.q3m THEN 1 ELSE 0 END
                   )::BIGINT AS m_score,
                   count(*)::BIGINT AS n_users
            FROM m, qb
            GROUP BY 1, 2, 3
        """,
        "events_user_scd2": """
            WITH o AS (
                SELECT user_id, event_type, ts, event_id,
                       CASE WHEN lag(event_type) OVER w
                                 IS DISTINCT FROM event_type
                            THEN 1 ELSE 0 END AS chg
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
                SELECT user_id, event_type, ts,
                       sum(chg) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS seg
                FROM o),
            g AS (
                SELECT user_id, seg, min(event_type) AS event_type,
                       min(ts) AS valid_from, count(*)::BIGINT AS n_events
                FROM s GROUP BY 1, 2)
            SELECT user_id, event_type, valid_from,
                   lead(valid_from) OVER (
                       PARTITION BY user_id ORDER BY seg) AS valid_to,
                   n_events
            FROM g
        """,
        "events_value_benford": """
            WITH c AS (
                SELECT abs(CAST(round(value * 100) AS BIGINT)) AS ac
                FROM events),
            d AS (SELECT CAST(substr(CAST(ac AS VARCHAR), 1, 1) AS BIGINT)
                         AS digit
                  FROM c WHERE ac > 0),
            t AS (SELECT count(*)::BIGINT AS total FROM d),
            g AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY 1)
            SELECT g.digit, g.n,
                   round(g.n::DOUBLE / t.total, 4) AS obs_share,
                   round(log10(1.0 + 1.0 / g.digit), 4) AS exp_share,
                   round(pow(g.n::DOUBLE
                             - t.total * log10(1.0 + 1.0 / g.digit), 2)
                         / (t.total * log10(1.0 + 1.0 / g.digit)), 4)
                       AS chi2_term
            FROM g, t
        """,
        "orders_fulfillment_lag": """
            WITH ms AS (
                SELECT l_orderkey, min(l_shipdate) AS first_ship
                FROM lineitem GROUP BY 1),
            lg AS (
                SELECT o.o_orderpriority AS priority,
                       (epoch_us(ms.first_ship) - epoch_us(o.o_orderdate))
                           // 86400000000 AS lag_days
                FROM orders o JOIN ms ON ms.l_orderkey = o.o_orderkey)
            SELECT priority,
                   count(*)::BIGINT AS n_orders,
                   round(sum(lag_days)::DOUBLE / count(*), 4)
                       AS avg_lag_days,
                   max(lag_days)::BIGINT AS max_lag_days
            FROM lg GROUP BY 1
        """,
        "events_duplicate_payments": """
            WITH p AS (
                SELECT user_id, event_id, epoch_us(ts) AS us,
                       CAST(round(value) AS BIGINT) AS amt
                FROM events WHERE event_type = 'purchase'),
            f AS (
                SELECT DISTINCT a.user_id, a.event_id
                FROM p a JOIN p b
                  ON a.user_id = b.user_id AND a.amt = b.amt
                 AND a.event_id <> b.event_id
                 AND abs(a.us - b.us) <= 86400000000)
            SELECT user_id, count(*)::BIGINT AS n_flagged
            FROM f GROUP BY 1
        """,
        "events_hourly_mase": """
            WITH e AS (
                SELECT event_type, epoch_us(ts) // 3600000000 AS h
                FROM events),
            c AS (SELECT event_type, h, count(*)::BIGINT AS n
                  FROM e GROUP BY 1, 2),
            b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
            grid AS (
                SELECT t.event_type, unnest(generate_series(b.h0, b.h1)) AS h
                FROM (SELECT DISTINCT event_type FROM e) t, b),
            s AS (
                SELECT g.event_type, g.h, coalesce(c.n, 0) AS n
                FROM grid g LEFT JOIN c
                  ON c.event_type = g.event_type AND c.h = g.h),
            l AS (
                SELECT event_type, n,
                       lag(n, 1) OVER w AS n1,
                       lag(n, 24) OVER w AS n24
                FROM s WINDOW w AS (PARTITION BY event_type ORDER BY h)),
            a AS (
                SELECT event_type,
                       count(n1)::BIGINT AS cnt1,
                       coalesce(sum(abs(n - n1)), 0)::BIGINT AS sad1,
                       count(n24)::BIGINT AS cnt24,
                       coalesce(sum(abs(n - n24)), 0)::BIGINT AS sad24
                FROM l GROUP BY 1)
            SELECT event_type,
                   cnt24 AS n_pairs,
                   CASE WHEN cnt1 = 0 THEN NULL
                        ELSE round(sad1::DOUBLE / cnt1, 4) END AS mae_naive1,
                   CASE WHEN cnt24 = 0 THEN NULL
                        ELSE round(sad24::DOUBLE / cnt24, 4)
                   END AS mae_seasonal24,
                   CASE WHEN sad1 = 0 OR cnt24 = 0 THEN NULL
                        ELSE round((sad24::HUGEINT * cnt1)::DOUBLE
                                   / (sad1::HUGEINT * cnt24), 4)
                   END AS mase
            FROM a
        """,
        "events_hourly_acf24": """
            WITH e AS (
                SELECT event_type, epoch_us(ts) // 3600000000 AS h
                FROM events),
            c AS (SELECT event_type, h, count(*)::BIGINT AS n
                  FROM e GROUP BY 1, 2),
            b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
            grid AS (
                SELECT t.event_type, unnest(generate_series(b.h0, b.h1)) AS h
                FROM (SELECT DISTINCT event_type FROM e) t, b),
            s AS (
                SELECT g.event_type, g.h, coalesce(c.n, 0) AS n
                FROM grid g LEFT JOIN c
                  ON c.event_type = g.event_type AND c.h = g.h),
            l AS (
                SELECT event_type, n AS a, lag(n, 24) OVER w AS bb
                FROM s WINDOW w AS (PARTITION BY event_type ORDER BY h)),
            m AS (
                SELECT event_type,
                       count(bb)::BIGINT AS np,
                       coalesce(sum(a) FILTER (WHERE bb IS NOT NULL), 0
                           )::HUGEINT AS sa,
                       coalesce(sum(bb), 0)::HUGEINT AS sb,
                       coalesce(sum(a * a) FILTER (WHERE bb IS NOT NULL), 0
                           )::HUGEINT AS saa,
                       coalesce(sum(bb * bb), 0)::HUGEINT AS sbb,
                       coalesce(sum(a * bb), 0)::HUGEINT AS sab
                FROM l GROUP BY 1)
            SELECT event_type, np AS n_pairs,
                   CASE WHEN np = 0 OR (np * saa - sa * sa) = 0
                             OR (np * sbb - sb * sb) = 0 THEN NULL
                        ELSE round((np * sab - sa * sb)::DOUBLE
                                   / sqrt(((np * saa - sa * sa)
                                           * (np * sbb - sb * sb))::DOUBLE),
                                   4)
                   END AS acf24
            FROM m
        """,
        "events_hourly_changepoint": """
            WITH e AS (
                SELECT event_type, epoch_us(ts) // 3600000000 AS h
                FROM events),
            c AS (SELECT event_type, h, count(*)::BIGINT AS n
                  FROM e GROUP BY 1, 2),
            b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
            grid AS (
                SELECT t.event_type, unnest(generate_series(b.h0, b.h1)) AS h
                FROM (SELECT DISTINCT event_type FROM e) t, b),
            s AS (
                SELECT g.event_type, g.h, coalesce(c.n, 0) AS n
                FROM grid g LEFT JOIN c
                  ON c.event_type = g.event_type AND c.h = g.h),
            w AS (
                SELECT event_type, h,
                       sum(n) OVER (PARTITION BY event_type ORDER BY h
                                    ROWS UNBOUNDED PRECEDING)::HUGEINT AS cum,
                       row_number() OVER (
                           PARTITION BY event_type ORDER BY h) AS i,
                       count(*) OVER (PARTITION BY event_type)::BIGINT
                           AS span,
                       sum(n) OVER (PARTITION BY event_type)::HUGEINT
                           AS total
                FROM s),
            g2 AS (
                SELECT event_type, h + 1 AS split_h,
                       cum AS sl, i::HUGEINT AS nl,
                       total - cum AS sr, (span - i)::HUGEINT AS nr
                FROM w WHERE i < span),
            sc AS (
                SELECT event_type, split_h, sl, nl, sr, nr,
                       abs(sl * nr - sr * nl) AS gap,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY abs(sl * nr - sr * nl) DESC,
                                    split_h ASC) AS rk
                FROM g2)
            SELECT event_type, split_h::BIGINT AS split_h,
                   gap::DOUBLE AS gap_stat,
                   round(sl::DOUBLE / nl, 4) AS mean_left,
                   round(sr::DOUBLE / nr, 4) AS mean_right
            FROM sc WHERE rk = 1
        """,
        "events_quality_audit": r"""
            WITH k AS (
                SELECT event_type, ts, value, epoch_us(ts) AS us,
                       CASE WHEN regexp_extract(props, '"k":\s*(-?\d+)', 1)
                                 = '' THEN NULL
                            ELSE regexp_extract(props, '"k":\s*(-?\d+)', 1
                                 )::BIGINT
                       END AS kk
                FROM events),
            t AS (SELECT count(*)::BIGINT AS total FROM k),
            r AS (
                SELECT 'value_above_cap' AS rule,
                       count(*) FILTER (WHERE value > 400.0)::BIGINT
                           AS n_violations FROM k
                UNION ALL
                SELECT 'error_event',
                       count(*) FILTER (WHERE event_type = 'error')::BIGINT
                FROM k
                UNION ALL
                SELECT 'night_activity',
                       count(*) FILTER (
                           WHERE (us // 3600000000) % 24 < 6)::BIGINT
                FROM k
                UNION ALL
                SELECT 'weekend_activity',
                       count(*) FILTER (
                           WHERE dayofweek(ts) IN (0, 6))::BIGINT
                FROM k
                UNION ALL
                SELECT 'props_k_above_max',
                       count(*) FILTER (WHERE kk > 90)::BIGINT
                FROM k)
            SELECT r.rule, r.n_violations,
                   round(r.n_violations::DOUBLE / t.total, 4) AS share
            FROM r, t
            WHERE t.total > 0
        """,
        "events_ltv_weekly": """
            WITH f AS (
                SELECT user_id, min(epoch_us(ts)) AS f_us
                FROM events GROUP BY 1),
            w AS (
                SELECT e.user_id,
                       (epoch_us(e.ts) - f.f_us) // 604800000000
                           AS week_since,
                       CAST(round(e.value * 100) AS BIGINT) AS cents
                FROM events e JOIN f USING (user_id)),
            c AS (
                SELECT week_since,
                       count(DISTINCT user_id)::BIGINT AS n_users_active,
                       sum(cents)::BIGINT AS week_cents
                FROM w GROUP BY 1),
            t AS (SELECT count(*)::BIGINT AS n_users FROM f)
            SELECT week_since, n_users_active, week_cents,
                   (sum(week_cents) OVER (
                       ORDER BY week_since
                       ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_cents,
                   round((sum(week_cents) OVER (
                              ORDER BY week_since
                              ROWS UNBOUNDED PRECEDING))::DOUBLE
                         / (100.0 * t.n_users), 4) AS avg_cum_ltv
            FROM c, t
        """,
        "events_purchase_survival": """
            WITH pc AS (
                SELECT user_id, count(*)::BIGINT AS c
                FROM events WHERE event_type = 'purchase' GROUP BY 1),
            d AS (SELECT c, count(*)::BIGINT AS nu FROM pc GROUP BY 1),
            mx AS (SELECT max(c) AS m FROM d),
            n AS (SELECT unnest(generate_series(1, mx.m)) AS n FROM mx),
            s AS (
                SELECT n.n,
                       (SELECT coalesce(sum(nu), 0) FROM d
                        WHERE d.c >= n.n)::BIGINT AS n_users
                FROM n)
            SELECT n AS n_purchases, n_users,
                   CASE WHEN n = 1 THEN NULL
                        ELSE round(n_users::DOUBLE
                                   / lag(n_users) OVER (ORDER BY n), 4)
                   END AS conversion
            FROM s
        """,
        "doc_top_terms": f"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '{_TOK}')) AS token
                FROM documents),
            tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
                   FROM tok GROUP BY 1, 2),
            dfc AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df
                    FROM tok GROUP BY 1),
            r AS (
                SELECT tf.doc_id, tf.token, tf.tf, dfc.df,
                       row_number() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY tf.tf DESC, dfc.df ASC, tf.token ASC
                       ) AS rk
                FROM tf JOIN dfc USING (token))
            SELECT doc_id, token, tf, df FROM r WHERE rk <= 3
        """,
        "events_new_behavior_adoption": """
            WITH ft AS (
                SELECT user_id, event_type,
                       min(epoch_us(ts)) AS first_us
                FROM events GROUP BY 1, 2),
            ref AS (SELECT max(epoch_us(ts)) AS ref_us FROM events)
            SELECT event_type,
                   sum(CASE WHEN first_us > ref.ref_us - 604800000000
                            THEN 1 ELSE 0 END)::BIGINT AS n_new_adopters,
                   count(*)::BIGINT AS n_adopters,
                   round(sum(CASE WHEN first_us > ref.ref_us - 604800000000
                                  THEN 1 ELSE 0 END)::DOUBLE / count(*), 4)
                       AS new_share
            FROM ft, ref
            GROUP BY event_type, ref.ref_us
        """,
        "events_calibration_curve": """
            WITH mm AS (SELECT min(value) AS lo, max(value) AS hi
                        FROM events),
            b AS (
                SELECT CASE WHEN mm.hi = mm.lo THEN 0.0
                            ELSE least(floor((e.value - mm.lo) * 10.0
                                             / (mm.hi - mm.lo)), 9.0)
                       END AS fbin,
                       CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0
                       END AS pos,
                       CAST(round(e.value * 100) AS BIGINT) AS cents
                FROM events e, mm)
            SELECT fbin::BIGINT AS bin,
                   count(*)::BIGINT AS n,
                   sum(pos)::BIGINT AS n_pos,
                   round(sum(pos)::DOUBLE / count(*), 4) AS pos_rate,
                   round(sum(cents)::DOUBLE / (100.0 * count(*)), 4)
                       AS mean_score
            FROM b GROUP BY 1
        """,
        "corpus_top_terms_by_source": f"""
            WITH tok AS (
                SELECT source,
                       unnest(regexp_extract_all(text, '{_TOK}')) AS token
                FROM documents),
            c AS (SELECT source, token, count(*)::BIGINT AS n
                  FROM tok GROUP BY 1, 2),
            r AS (
                SELECT source, token, n,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY n DESC, token ASC) AS rk
                FROM c)
            SELECT source, token, n FROM r WHERE rk <= 3
        """,
        "events_power_users_pareto": """
            WITH pc AS (
                SELECT user_id, count(*)::BIGINT AS c
                FROM events GROUP BY 1),
            d AS (SELECT c, count(*)::BIGINT AS nu FROM pc GROUP BY 1),
            o AS (
                SELECT c, nu,
                       sum(nu) OVER (ORDER BY c DESC)::BIGINT AS cum_users,
                       sum(c * nu) OVER (ORDER BY c DESC)::BIGINT
                           AS cum_events
                FROM d),
            t AS (SELECT sum(nu)::BIGINT AS total_users,
                         sum(c * nu)::BIGINT AS total_events FROM d),
            qs AS (SELECT unnest([0.01, 0.05, 0.10]) AS top_pct),
            k AS (SELECT qs.top_pct,
                         CAST(ceil(t.total_users * qs.top_pct) AS BIGINT)
                             AS k
                  FROM qs, t),
            b AS (
                SELECT k.top_pct, k.k, o.c, o.cum_users, o.cum_events,
                       row_number() OVER (
                           PARTITION BY k.top_pct
                           ORDER BY o.cum_users ASC) AS rn
                FROM k JOIN o ON o.cum_users >= k.k)
            SELECT b.top_pct, b.k AS n_top_users,
                   round((b.cum_events
                          - b.c * (b.cum_users - b.k))::DOUBLE
                         / t.total_events, 4) AS event_share
            FROM b, t WHERE b.rn = 1
        """,
        "events_dau_wau_stickiness": """
            WITH ud AS (
                SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                FROM events),
            dau AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY 1),
            wau AS (
                SELECT d.day, count(DISTINCT u.user_id)::BIGINT AS wau
                FROM dau d JOIN ud u
                  ON u.day BETWEEN d.day - 6 AND d.day
                GROUP BY 1)
            SELECT d.day, d.dau, w.wau,
                   round(d.dau::DOUBLE / w.wau, 4) AS stickiness
            FROM dau d JOIN wau w USING (day)
        """,
        "orders_order_gap_days": """
            WITH o AS (
                SELECT o_custkey, epoch_us(o_orderdate) AS us,
                       lag(epoch_us(o_orderdate)) OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS prev_us
                FROM orders)
            SELECT (us - prev_us) // 86400000000 AS gap_days,
                   count(*)::BIGINT AS n
            FROM o WHERE prev_us IS NOT NULL GROUP BY 1
        """,
        "part_abc_classification": """
            WITH pr AS (
                SELECT l_partkey AS p_partkey,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       )::BIGINT AS rev_e4
                FROM lineitem GROUP BY 1),
            t AS (SELECT sum(rev_e4)::HUGEINT AS total FROM pr),
            r AS (
                SELECT p_partkey, rev_e4,
                       sum(rev_e4) OVER (
                           ORDER BY rev_e4 DESC, p_partkey ASC
                           ROWS UNBOUNDED PRECEDING)::HUGEINT AS cum
                FROM pr),
            cl AS (
                SELECT rev_e4,
                       CASE WHEN 100 * cum <= 80 * t.total THEN 'A'
                            WHEN 100 * cum <= 95 * t.total THEN 'B'
                            ELSE 'C' END AS abc_class
                FROM r, t),
            g AS (
                SELECT abc_class, count(*)::BIGINT AS n_parts,
                       round(sum(rev_e4)::DOUBLE / t.total, 4) AS rev_share
                FROM cl, t GROUP BY 1, t.total)
            SELECT c.abc_class,
                   coalesce(g.n_parts, 0)::BIGINT AS n_parts,
                   coalesce(g.rev_share, 0.0) AS rev_share
            FROM (SELECT unnest(['A', 'B', 'C']) AS abc_class) c
            LEFT JOIN g USING (abc_class)
        """,
        "supplier_scorecard": """
            WITH m AS (
                SELECT l_suppkey AS s_suppkey,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       )::BIGINT AS rev_e4,
                       count(*)::BIGINT AS n_items,
                       count(DISTINCT l_partkey)::BIGINT AS n_parts
                FROM lineitem GROUP BY 1),
            r AS (SELECT *, row_number() OVER (
                      ORDER BY rev_e4 DESC, s_suppkey ASC) AS rk FROM m)
            SELECT r.s_suppkey, s.s_name, n.n_name AS nation,
                   round(r.rev_e4::DOUBLE / 10000.0, 4) AS revenue,
                   r.n_items, r.n_parts
            FROM r
            JOIN supplier s ON s.s_suppkey = r.s_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE r.rk <= 10
        """,
        "events_error_rate_control": """
            WITH c AS (
                SELECT epoch_us(ts) // 3600000000 AS h,
                       count(*)::BIGINT AS n,
                       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                           END)::BIGINT AS n_err
                FROM events GROUP BY 1),
            t AS (SELECT sum(n)::BIGINT AS tn,
                         sum(n_err)::BIGINT AS te FROM c)
            SELECT c.h, c.n, c.n_err,
                   round(c.n_err::DOUBLE / c.n, 4) AS err_rate,
                   round(t.te::DOUBLE / t.tn
                         + 3 * sqrt((t.te::DOUBLE / t.tn)
                                    * (1 - t.te::DOUBLE / t.tn) / c.n), 4)
                       AS ucl,
                   (CASE WHEN c.n_err::DOUBLE / c.n
                              > t.te::DOUBLE / t.tn
                                + 3 * sqrt((t.te::DOUBLE / t.tn)
                                           * (1 - t.te::DOUBLE / t.tn)
                                           / c.n)
                         THEN 1 ELSE 0 END)::BIGINT AS out_of_control
            FROM c, t
        """,
        "doc_bm25_topk": f"""
            WITH toks AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '{_TOK}')) AS tok
                FROM documents),
            dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
            stats AS (
                SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl FROM dl),
            qt AS (SELECT unnest(['hash', 'join', 'scan', 'merge']) AS tok),
            tf AS (
                SELECT doc_id, tok, count(*)::BIGINT AS tf
                FROM toks WHERE tok IN (SELECT tok FROM qt) GROUP BY 1, 2),
            df AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1),
            -- contribution shape mirrors the Ray side exactly:
            -- idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl * n / sumdl))
            contrib AS (
                SELECT tf.doc_id, tf.tok,
                       ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                       * tf.tf * 2.2
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * stats.n
                                                / stats.sumdl)) AS c
                FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), stats),
            -- fixed term-order sum (no group-ordered float reassociation)
            sc AS (
                SELECT doc_id,
                       coalesce(sum(CASE WHEN tok = 'hash' THEN c END), 0)
                     + coalesce(sum(CASE WHEN tok = 'join' THEN c END), 0)
                     + coalesce(sum(CASE WHEN tok = 'scan' THEN c END), 0)
                     + coalesce(sum(CASE WHEN tok = 'merge' THEN c END), 0)
                           AS score
                FROM contrib GROUP BY doc_id)
            SELECT doc_id, round(score, 4) AS bm25
            FROM sc ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
        """,
        "orders_shipping_priority_q3": """
            SELECT l.l_orderkey,
                   round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l.l_discount * 100)
                                           AS BIGINT))
                         )::DOUBLE / 10000.0, 4) AS revenue,
                   o.o_orderdate, o.o_orderpriority
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND l.l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
            ORDER BY sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                     ) DESC,
                     l.l_orderkey ASC
            LIMIT 10
        """,
        "events_concurrent_sessions": """
            WITH gaps AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            numbered AS (
                SELECT user_id, ts,
                       sum(new_session) OVER
                         (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sidx
                FROM gaps),
            s AS (SELECT user_id, sidx, min(ts) AS start_ts, max(ts) AS end_ts
                  FROM numbered GROUP BY 1, 2),
            b AS (SELECT epoch_us(start_ts) AS t, 1 AS d FROM s
                  UNION ALL SELECT epoch_us(end_ts), -1 FROM s),
            r AS (SELECT t, d,
                         sum(d) OVER (ORDER BY t ASC, d DESC
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS c
                  FROM b)
            SELECT (SELECT max(c) FROM r)::BIGINT AS peak_concurrency,
                   (SELECT min(t) FROM r
                    WHERE c = (SELECT max(c) FROM r))::BIGINT AS peak_ts_us
        """,
        "doc_pack_bins": f"""
            WITH tc AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '{_TOK}'))::BIGINT
                           AS n_tokens
                FROM documents),
            c AS (
                SELECT doc_id, n_tokens,
                       sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens AS off
                FROM tc)
            SELECT (off // 4096)::BIGINT AS bin, count(*)::BIGINT AS n_docs,
                   sum(n_tokens)::BIGINT AS total_tokens
            FROM c GROUP BY 1
        """,
        "revenue_by_nation_q5": """
            SELECT n.n_name AS nation,
                   round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l.l_discount * 100)
                                           AS BIGINT))
                         )::DOUBLE / 10000.0, 4) AS revenue
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
                           AND s.s_nationkey = c.c_nationkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n.n_name
        """,
        "events_user_entropy_topk": """
            WITH c AS (
                SELECT user_id,
                       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                           END)::BIGINT AS n_click,
                       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                           END)::BIGINT AS n_error,
                       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                           END)::BIGINT AS n_purchase,
                       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0
                           END)::BIGINT AS n_signup,
                       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                           END)::BIGINT AS n_view,
                       count(*)::BIGINT AS n_events
                FROM events GROUP BY 1),
            -- fixed type-order subtraction mirrors the Ray side exactly
            e AS (
                SELECT user_id, n_events,
                    0.0
                    - (CASE WHEN n_click > 0 THEN (n_click::DOUBLE / n_events)
                            * ln(n_click::DOUBLE / n_events) ELSE 0 END)
                    - (CASE WHEN n_error > 0 THEN (n_error::DOUBLE / n_events)
                            * ln(n_error::DOUBLE / n_events) ELSE 0 END)
                    - (CASE WHEN n_purchase > 0
                            THEN (n_purchase::DOUBLE / n_events)
                            * ln(n_purchase::DOUBLE / n_events) ELSE 0 END)
                    - (CASE WHEN n_signup > 0
                            THEN (n_signup::DOUBLE / n_events)
                            * ln(n_signup::DOUBLE / n_events) ELSE 0 END)
                    - (CASE WHEN n_view > 0 THEN (n_view::DOUBLE / n_events)
                            * ln(n_view::DOUBLE / n_events) ELSE 0 END)
                      AS ent
                FROM c)
            SELECT user_id, n_events, round(ent, 4) AS entropy
            FROM e ORDER BY round(ent, 4) DESC, user_id ASC LIMIT 10
        """,
        "lineitem_promo_share_q14": """
            WITH j AS (
                SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                           AS rev_e4,
                       CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END
                           AS promo
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l.l_shipdate < TIMESTAMP '1997-01-01'),
            s AS (SELECT
                      sum(CASE WHEN promo = 1 THEN rev_e4 ELSE 0 END)
                          AS promo_e4,
                      sum(rev_e4) AS tot_e4
                  FROM j)
            -- exact-int single divisions, shipped UNROUNDED (NOTES.md rule)
            SELECT CAST(promo_e4 AS DOUBLE) / 10000.0 AS promo_revenue,
                   CAST(tot_e4 AS DOUBLE) / 10000.0 AS total_revenue,
                   CAST(promo_e4 * 100 AS DOUBLE) / tot_e4 AS promo_share
            FROM s WHERE tot_e4 > 0
        """,
        "orders_large_volume_q18": """
            WITH s AS (
                SELECT l_orderkey,
                       sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_e2
                FROM lineitem GROUP BY 1
                HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000)
            SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
                   CAST(s.qty_e2 AS DOUBLE) / 100.0 AS total_qty
            FROM s JOIN orders o ON o.o_orderkey = s.l_orderkey
            ORDER BY s.qty_e2 DESC, o.o_orderkey ASC
            LIMIT 20
        """,
        "events_markov_stationary": _markov_stationary_sql(),
        "orders_custdist_q13": f"""
            SELECT c_count, count(*)::BIGINT AS custdist FROM (
                SELECT c.c_custkey,
                       count(o.o_orderkey)::BIGINT AS c_count
                FROM customer c LEFT JOIN orders o
                  ON o.o_custkey = c.c_custkey
                 AND o.o_orderpriority <> '{q.Q13_EXCLUDED_PRIORITY}'
                GROUP BY 1)
            GROUP BY c_count
        """,
        "events_hourly_ewma": """
            WITH RECURSIVE h AS (
                SELECT date_trunc('hour', ts) AS hour,
                       count(*)::BIGINT AS n_events
                FROM events GROUP BY 1),
            o AS (SELECT hour, n_events,
                         row_number() OVER (ORDER BY hour) AS rn
                  FROM h),
            -- literal 0.3 / 0.7 mirror the Ray-side recurrence exactly
            r AS (
                SELECT rn, hour, n_events, CAST(n_events AS DOUBLE) AS s
                FROM o WHERE rn = 1
                UNION ALL
                SELECT o.rn, o.hour, o.n_events,
                       0.3 * o.n_events + 0.7 * r.s
                FROM r JOIN o ON o.rn = r.rn + 1)
            SELECT hour, n_events, round(s, 4) AS ewma FROM r
        """,
        "revenue_two_nation_q7": """
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l.l_discount * 100)
                                           AS BIGINT))
                         )::DOUBLE / 10000.0, 4) AS revenue
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation ns ON ns.n_nationkey = s.s_nationkey
            JOIN nation nc ON nc.n_nationkey = c.c_nationkey
            WHERE ((ns.n_name = 'NATION_11' AND nc.n_name = 'NATION_12')
                OR (ns.n_name = 'NATION_12' AND nc.n_name = 'NATION_11'))
              AND l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
        """,
        "doc_shingle_novelty": """
            WITH w AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9_]+') AS ws
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       unnest(list_transform(range(1, len(ws) - 6),
                              i -> array_to_string(ws[i:i+7], ' ')))
                           AS shingle
                FROM w WHERE len(ws) >= 8),
            m AS (SELECT shingle, min(doc_id) AS md FROM sh GROUP BY 1)
            SELECT sh.doc_id, count(*)::BIGINT AS n_shingles,
                   sum(CASE WHEN sh.doc_id = m.md THEN 1 ELSE 0 END)::BIGINT
                       AS n_novel,
                   round(sum(CASE WHEN sh.doc_id = m.md THEN 1 ELSE 0 END)
                         / count(*)::DOUBLE, 4) AS novelty
            FROM sh JOIN m ON m.shingle = sh.shingle
            GROUP BY sh.doc_id
        """,
        "corpus_keyness_g2": f"""
            WITH toks AS (
                SELECT unnest(regexp_extract_all(coalesce(text, ''),
                                                 '{_TOK}')) AS token,
                       CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_t
                FROM documents),
            c AS (SELECT token,
                         sum(is_t)::BIGINT AS n_target,
                         sum(1 - is_t)::BIGINT AS n_rest
                  FROM toks GROUP BY token),
            tot AS (SELECT sum(n_target)::BIGINT AS nt,
                           sum(n_rest)::BIGINT AS nr
                    FROM c),
            -- expected counts: double * int then ONE division (no giant
            -- int product); zero cells contribute an exact 0; the two
            -- ln terms add in fixed (target, rest) order — mirrors the
            -- Ray side verbatim
            g AS (SELECT token, n_target, n_rest,
                      (CASE WHEN n_target > 0
                            THEN n_target * ln(CAST(n_target AS DOUBLE)
                                 / (CAST(nt AS DOUBLE)
                                    * (n_target + n_rest) / (nt + nr)))
                            ELSE 0 END)
                      + (CASE WHEN n_rest > 0
                              THEN n_rest * ln(CAST(n_rest AS DOUBLE)
                                   / (CAST(nr AS DOUBLE)
                                      * (n_target + n_rest) / (nt + nr)))
                              ELSE 0 END) AS h
                  FROM c, tot)
            SELECT token, n_target, n_rest, round(2.0 * h, 4) AS g2
            FROM g ORDER BY round(2.0 * h, 4) DESC, token ASC LIMIT 50
        """,
        "orders_returned_q10": """
            SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
                   round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l.l_discount * 100)
                                           AS BIGINT))
                         )::DOUBLE / 10000.0, 4) AS revenue
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal
            ORDER BY sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                     ) DESC,
                     c.c_custkey ASC
            LIMIT 20
        """,
        "doc_readability": """
            SELECT doc_id,
                   len(regexp_extract_all(coalesce(text, ''),
                                          '[A-Za-z]+'))::BIGINT AS n_words,
                   len(regexp_extract_all(coalesce(text, ''),
                                          '[.!?]+'))::BIGINT AS n_sentences,
                   len(regexp_extract_all(coalesce(text, ''),
                                          '[AEIOUaeiou]+'))::BIGINT
                       AS n_syllables,
                   CASE WHEN n_words = 0 THEN NULL
                        ELSE round(
                            206.835
                            - 1.015 * (CAST(n_words AS DOUBLE)
                                       / greatest(n_sentences, 1))
                            - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words),
                            4)
                   END AS flesch
            FROM documents
        """,
        "events_rolling_zscore": """
            WITH c AS (
                SELECT event_id, user_id, ts,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events),
            w AS (
                SELECT event_id, user_id, ts, cents,
                       count(*) OVER win AS w,
                       sum(cents) OVER win AS s,
                       sum(cents * cents) OVER win AS ss
                FROM c WINDOW win AS (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 10 PRECEDING AND CURRENT ROW))
            SELECT event_id, user_id, ts,
                   round(s / (w * 100.0), 4) AS roll_mean,
                   CASE WHEN w * ss - s * s <= 0 THEN NULL
                        ELSE round((cents * w - s)
                                   / sqrt((w * ss - s * s)::DOUBLE), 4)
                   END AS roll_z
            FROM w
        """,
        "events_user_twa": """
            WITH o AS (
                SELECT user_id, ts,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       lead(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS nxt
                FROM events),
            a AS (
                SELECT user_id, count(*)::BIGINT AS n_events,
                       date_diff('microsecond', min(ts),
                                 max(coalesce(nxt, ts)))::BIGINT AS span_us,
                       sum(CASE WHEN nxt IS NULL THEN 0
                                ELSE cents * date_diff('microsecond', ts, nxt)
                           END)::HUGEINT AS num
                FROM o GROUP BY user_id)
            SELECT user_id, n_events, span_us,
                   CASE WHEN span_us = 0 THEN NULL
                        ELSE round(num::DOUBLE / (span_us * 100.0), 4)
                   END AS twa_value
            FROM a
        """,
        "events_user_hourly_locf": """
            WITH e AS (
                SELECT user_id, ts, event_id, value,
                       date_trunc('hour', ts)::TIMESTAMP AS ehour
                FROM events),
            b AS (
                SELECT user_id, min(ehour) AS h0, max(ehour) AS h1
                FROM e GROUP BY 1),
            g AS (
                SELECT user_id,
                       unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                           AS hour
                FROM b),
            last_in_hour AS (
                SELECT user_id, ehour AS hour, value FROM (
                    SELECT user_id, ehour, value,
                           row_number() OVER (
                               PARTITION BY user_id, ehour
                               ORDER BY ts DESC, event_id DESC) AS rn
                    FROM e) WHERE rn = 1),
            joined AS (
                SELECT g.user_id, g.hour, l.value
                FROM g LEFT JOIN last_in_hour l
                  ON l.user_id = g.user_id AND l.hour = g.hour)
            SELECT user_id, hour,
                   last_value(value IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY hour
                       ROWS UNBOUNDED PRECEDING) AS locf_value
            FROM joined
        """,
        "events_cum_value": """
            SELECT event_id, user_id, ts,
                   round(sum(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       4) AS cum_value
            FROM events
        """,
        "events_moving_avg3": """
            SELECT event_id, user_id, ts,
                   round(avg(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                       4) AS mov_avg3
            FROM events
        """,
        "doc_tfidf_top50": f"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '{_TOK}')) AS token
                FROM documents),
            stats AS (
                SELECT token, count(*)::BIGINT AS tf,
                       count(DISTINCT doc_id)::BIGINT AS df
                FROM tok GROUP BY token),
            nd AS (SELECT count(*)::DOUBLE AS n FROM documents)
            SELECT token, tf, df, round(tf * ln(nd.n / df), 4) AS tfidf
            FROM stats, nd
            ORDER BY tfidf DESC, token LIMIT 50
        """,
        "embedding_label_centroids": """
            WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
            pos AS (SELECT unnest(range(1, 65)) AS p),
            comp AS (
                SELECT label, pos.p, avg(v[pos.p]) AS m
                FROM e, pos GROUP BY label, pos.p),
            cnt AS (SELECT label, count(*)::BIGINT AS n FROM e GROUP BY label)
            SELECT c.label::BIGINT AS label, cnt.n,
                   round(sqrt(sum(c.m * c.m)), 4) AS centroid_norm
            FROM comp c JOIN cnt USING (label)
            GROUP BY c.label, cnt.n
        """,
        "events_daily_retention": """
            WITH r AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) AS day
                FROM events)
            SELECT r.day AS day,
                   count(*)::BIGINT AS n_active,
                   count(p.user_id)::BIGINT AS n_retained
            FROM r LEFT JOIN r p
              ON p.user_id = r.user_id AND p.day + INTERVAL 1 DAY = r.day
            GROUP BY r.day
        """,
        "orders_top3_customers_by_nation": """
            SELECT c_nationkey, o_custkey, total_price FROM (
                SELECT c.c_nationkey, o.o_custkey,
                       round(sum(o.o_totalprice), 4) AS total_price,
                       row_number() OVER (
                           PARTITION BY c.c_nationkey
                           ORDER BY round(sum(o.o_totalprice), 4) DESC,
                                    o.o_custkey) AS rn
                FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
                GROUP BY c.c_nationkey, o.o_custkey)
            WHERE rn <= 3
        """,
        "token_freq_top100": f"""
            SELECT token, count(*) AS n
            FROM (SELECT unnest(regexp_extract_all(text, '{_TOK}')) AS token
                  FROM documents)
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 100
        """,
        # sketch route must reproduce the exact census bit-for-bit (the
        # MG completeness proof guarantees it or raises loudly)
        "token_freq_top100_mg": f"""
            SELECT token, count(*) AS n
            FROM (SELECT unnest(regexp_extract_all(text, '{_TOK}')) AS token
                  FROM documents)
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 100
        """,
        "doc_token_counts": f"""
            SELECT doc_id, len(regexp_extract_all(text, '{_TOK}'))::BIGINT AS n_tokens
            FROM documents
        """,
        # explicit Σ OLS formulas (NOT regr_slope) so both sides evaluate
        # the same arithmetic on identical integer census inputs
        "corpus_zipf_fit": f"""
            WITH c AS (
                SELECT token, count(*)::BIGINT AS n
                FROM (SELECT unnest(regexp_extract_all(text, '{_TOK}'))
                          AS token FROM documents)
                GROUP BY token),
            r AS (
                SELECT ln(row_number() OVER (ORDER BY n DESC, token))
                           AS x,
                       ln(n::DOUBLE) AS y
                FROM c),
            s AS (
                SELECT count(*)::BIGINT AS k, sum(x) AS sx, sum(y) AS sy,
                       sum(x * x) AS sxx, sum(y * y) AS syy,
                       sum(x * y) AS sxy
                FROM r)
            SELECT k AS n_types,
                   round((k * sxy - sx * sy) / (k * sxx - sx * sx), 4)
                       AS slope,
                   round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx)
                          * sx) / k, 4) AS intercept,
                   round(CASE WHEN k * syy - sy * sy = 0 THEN 1.0
                         ELSE ((k * sxy - sx * sy) * (k * sxy - sx * sy))
                              / ((k * sxx - sx * sx) * (k * syy - sy * sy))
                         END, 4) AS r2
            FROM s WHERE k >= 2
        """,
        "doc_fingerprints": "SELECT doc_id, md5(text) AS fp FROM documents",
        "corpus_temperature_weights": """
            WITH c AS (SELECT lang, count(*)::BIGINT AS n
                       FROM documents GROUP BY 1),
            t AS (SELECT sum(n)::DOUBLE AS tot FROM c),
            s AS (SELECT sum(pow(n / (SELECT tot FROM t), 0.3)) AS z FROM c)
            SELECT lang, n AS n_docs,
                   round(n / (SELECT tot FROM t), 4) AS p,
                   round(pow(n / (SELECT tot FROM t), 0.3)
                         / (SELECT z FROM s), 4) AS q
            FROM c
        """,
        "doc_quality": f"""
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars,
                   CASE WHEN len(regexp_extract_all(text, '{_TOK}')) = 0 THEN 0.0
                        ELSE round(len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]'))
                             / len(regexp_extract_all(text, '{_TOK}'))::DOUBLE, 4)
                   END AS punct_ratio,
                   CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9_]+')) = 0 THEN 0.0
                        ELSE round(len(list_filter(
                                 regexp_extract_all(lower(text), '[a-z0-9_]+'),
                                 w -> w IN ({stop_list})))
                             / len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::DOUBLE, 4)
                   END AS stop_ratio
            FROM documents
        """,
        "doc_subword_counts": """
            SELECT doc_id,
                   coalesce(list_sum(list_transform(
                       regexp_extract_all(text, '[A-Za-z0-9_]+'),
                       w -> (length(w) + 3) // 4)), 0)::BIGINT AS n_subwords
            FROM documents
        """,
        "doc_repetition": """
            WITH w AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9_]+') AS ws
              FROM documents
            )
            SELECT doc_id,
              CASE WHEN len(ws) = 0 THEN 0.0
                   ELSE round(1 - len(list_distinct(ws)) / len(ws)::DOUBLE, 4)
              END AS dup_word_frac,
              CASE WHEN len(ws) <= 1 THEN 0.0
                   ELSE round(1 - len(list_distinct(list_transform(
                            range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])))
                        / (len(ws) - 1)::DOUBLE, 4)
              END AS dup_bigram_frac,
              CASE WHEN len(ws) = 0 THEN 0.0
                   ELSE round(list_max(map_values(list_aggregate(ws, 'histogram')))
                        / len(ws)::DOUBLE, 4)
              END AS top_word_frac
            FROM w
        """,
        "doc_split_assign": """
            SELECT doc_id,
                   CASE WHEN md5_number_upper(doc_id::VARCHAR) % 10 < 8 THEN 'train'
                        WHEN md5_number_upper(doc_id::VARCHAR) % 10 = 8 THEN 'valid'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "doc_sample_per_source": """
            SELECT source, doc_id FROM (
                SELECT source, doc_id,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5(coalesce(text, '')) ASC, doc_id ASC) AS rk
                FROM documents
            ) WHERE rk <= 3
        """,
        "doc_contamination": f"""
            WITH w AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9_]+') AS ws
              FROM documents
            ), j AS (
              SELECT doc_id, ' ' || array_to_string(ws, ' ') || ' ' AS jt FROM w
            ), bench AS (
              SELECT DISTINCT ' ' || array_to_string(
                         list_slice(ws, {q.CONTAM_NGRAM_SLICE[0] + 1},
                                    {q.CONTAM_NGRAM_SLICE[1]}), ' ') || ' ' AS ng
              FROM w
              WHERE doc_id % {q.CONTAM_STRIDE} = {q.CONTAM_RESIDUE}
                AND len(ws) >= {q.CONTAM_NGRAM_SLICE[1]}
            )
            SELECT j.doc_id, count(b.ng)::BIGINT AS n_hits
            FROM j LEFT JOIN bench b ON contains(j.jt, b.ng)
            GROUP BY j.doc_id
        """,
        "corpus_dup_shingles": """
            WITH w AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9_]+') AS ws
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(range(1, len(ws) - 6),
                            i -> array_to_string(ws[i:i+7], ' '))) AS shingle
              FROM w WHERE len(ws) >= 8
            )
            SELECT shingle, count(*)::BIGINT AS n_docs FROM sh
            GROUP BY shingle HAVING count(*) >= 2
            ORDER BY n_docs DESC, shingle ASC LIMIT 50
        """,
        "lang_fertility": """
            WITH w AS (
              SELECT lang, regexp_extract_all(text, '[A-Za-z0-9_]+') AS ws
              FROM documents
            )
            SELECT lang,
                   sum(coalesce(list_sum(list_transform(
                       ws, x -> (length(x) + 3) // 4)), 0))::BIGINT AS n_subwords,
                   sum(len(ws))::BIGINT AS n_words,
                   CASE WHEN sum(len(ws)) = 0 THEN 0.0
                        ELSE round(sum(coalesce(list_sum(list_transform(
                                 ws, x -> (length(x) + 3) // 4)), 0))
                             / sum(len(ws))::DOUBLE, 4)
                   END AS fertility
            FROM w GROUP BY lang
        """,
        "curated_shard_counts": f"""
            WITH sig AS (
              SELECT doc_id, length(text) AS n_chars,
                     regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9_]+') AS ws
              FROM documents
            ), qual AS (
              SELECT doc_id, n_chars,
                CASE WHEN len(ws) = 0 THEN 0.0
                     ELSE round(1 - len(list_distinct(ws)) / len(ws)::DOUBLE, 4)
                END AS dup_word_frac,
                CASE WHEN len(ws) = 0 THEN 0.0
                     ELSE round(list_max(map_values(list_aggregate(ws, 'histogram')))
                          / len(ws)::DOUBLE, 4)
                END AS top_word_frac
              FROM sig
            )
            SELECT split, shard, count(*)::BIGINT AS n_docs FROM (
              SELECT CASE WHEN md5_number_upper(doc_id::VARCHAR) % 10 < 8 THEN 'train'
                          WHEN md5_number_upper(doc_id::VARCHAR) % 10 = 8 THEN 'valid'
                          ELSE 'test' END AS split,
                     (md5_number_upper('s' || doc_id::VARCHAR)
                      % {curate.N_SHARDS})::BIGINT AS shard
              FROM qual
              WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
                AND n_chars >= {curate.MIN_CHARS}
                AND dup_word_frac <= {curate.MAX_DUP_WORD_FRAC}
                AND top_word_frac <= {curate.MAX_TOP_WORD_FRAC}
            ) GROUP BY split, shard
        """,
        "corpus_bigram_top50": """
            WITH w AS (
              SELECT regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9_]+') AS ws
              FROM documents
            )
            SELECT bg, count(*)::BIGINT AS n FROM (
                SELECT unnest(list_transform(
                           range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
                FROM w WHERE len(ws) > 1
            ) GROUP BY bg ORDER BY n DESC, bg ASC LIMIT 50
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY text
        """,
        "events_hourly": """
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        """,
        "events_top_types": """
            SELECT event_type, count(*) AS n FROM events
            GROUP BY event_type ORDER BY n DESC, event_type ASC LIMIT 10
        """,
        "events_recent100": """
            SELECT event_id, ts FROM events
            ORDER BY ts DESC, event_id DESC LIMIT 100
        """,
        "events_user_count": "SELECT count(DISTINCT user_id) AS n_users FROM events",
        "events_first_per_user_type": """
            SELECT user_id, event_type, min(ts) AS first_ts
            FROM events GROUP BY user_id, event_type
        """,
        "events_sessions": """
            WITH gaps AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), numbered AS (
                SELECT user_id, ts,
                       sum(new_session) OVER
                         (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS session_idx
                FROM gaps
            )
            SELECT user_id, session_idx::BIGINT AS session_idx,
                   count(*) AS n_events,
                   min(ts) AS start_ts, max(ts) AS end_ts
            FROM numbered GROUP BY user_id, session_idx
        """,
        "events_sliding_hourly": """
            SELECT w AS window_start, count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events,
                 unnest([time_bucket(INTERVAL '30 minutes', ts),
                         time_bucket(INTERVAL '30 minutes', ts)
                           - INTERVAL '30 minutes']) AS t(w)
            GROUP BY w
        """,
        "lineitem_price_bands": """
            WITH bands(band, lo, hi) AS (VALUES
                ('b0', 0.0, 20000.0),
                ('b1', 10000.0, 40000.0),
                ('b2', 30000.0, 100000.0))
            SELECT b.band, count(*) AS n_rows,
                   round(sum(l.l_extendedprice), 4) AS sum_price
            FROM lineitem l JOIN bands b
              ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
            GROUP BY b.band
        """,
        "events_purchase_last_click": """
            SELECT * FROM (
                SELECT p.event_id, p.user_id, p.ts,
                       (SELECT max(c.ts) FROM events c
                        WHERE c.user_id = p.user_id
                          AND c.event_type = 'click' AND c.ts < p.ts)
                           AS last_click_ts
                FROM events p WHERE p.event_type = 'purchase'
            ) WHERE last_click_ts IS NOT NULL
        """,
        "lineitem_qty_quantiles": """
            SELECT l_returnflag,
                   quantile_disc(l_quantity, 0.25) AS p25,
                   quantile_disc(l_quantity, 0.5) AS p50,
                   quantile_disc(l_quantity, 0.75) AS p75
            FROM lineitem GROUP BY l_returnflag
        """,
        "customers_with_orders_by_nation": """
            SELECT c_nationkey, count(*) AS n_customers
            FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            GROUP BY c_nationkey
        """,
        "customers_without_orders": """
            SELECT count(*) AS n_without_orders FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        # the Bloom-prefiltered variant is exact by construction (misses
        # are definite, hits are join-verified) — same oracle
        "customers_without_orders_bloom": """
            SELECT count(*) AS n_without_orders FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "user_top_event_type": """
            SELECT user_id, event_type AS top_type, n FROM (
                SELECT user_id, event_type, count(*) AS n,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY count(*) DESC, event_type ASC) AS rk
                FROM events GROUP BY user_id, event_type
            ) WHERE rk = 1
        """,
        "account_balance_union": """
            SELECT role, count(*) AS n_accounts, round(sum(balance), 4) AS sum_balance
            FROM (
                SELECT 'customer' AS role, c_acctbal AS balance FROM customer
                UNION ALL
                SELECT 'supplier' AS role, s_acctbal AS balance FROM supplier
            ) GROUP BY role
        """,
        "customer_segments": """
            SELECT c_mktsegment, count(*) AS n_customers,
                   round(sum(c_acctbal), 4) AS sum_balance
            FROM customer GROUP BY c_mktsegment
        """,
        "docs_by_lang_source": """
            SELECT lang, source, count(*) AS n_docs,
                   round(avg(n_chars), 4) AS avg_chars
            FROM documents GROUP BY lang, source
        """,
        "orders_monthly": """
            SELECT o_orderpriority, date_trunc('month', o_orderdate) AS month,
                   count(*) AS n_orders
            FROM orders GROUP BY o_orderpriority, date_trunc('month', o_orderdate)
        """,
        "orders_rollup": """
            SELECT o_orderpriority, o_orderstatus,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS sum_price
            FROM orders
            GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        """,
        "events_funnel": """
            WITH v AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
            c AS (
                SELECT v.user_id, min(e.ts) AS t2
                FROM v JOIN events e ON e.user_id = v.user_id
                 AND e.event_type = 'click' AND e.ts > v.t1
                GROUP BY v.user_id),
            p AS (
                SELECT c.user_id, min(e.ts) AS t3
                FROM c JOIN events e ON e.user_id = c.user_id
                 AND e.event_type = 'purchase' AND e.ts > c.t2
                GROUP BY c.user_id),
            u AS (SELECT DISTINCT user_id FROM events)
            SELECT stage, count(*)::BIGINT AS n_users FROM (
                SELECT u.user_id,
                       CASE WHEN p.user_id IS NOT NULL THEN 3
                            WHEN c.user_id IS NOT NULL THEN 2
                            WHEN v.user_id IS NOT NULL THEN 1
                            ELSE 0 END AS stage
                FROM u
                LEFT JOIN v USING (user_id)
                LEFT JOIN c USING (user_id)
                LEFT JOIN p USING (user_id)
            ) GROUP BY stage
        """,
        "events_purchase_click_window": """
            SELECT p.event_id AS purchase_id, p.user_id AS user_id,
                   p.ts AS purchase_ts, c.event_id AS click_id,
                   c.ts AS click_ts
            FROM events p JOIN events c ON c.user_id = p.user_id
            WHERE p.event_type = 'purchase' AND c.event_type = 'click'
              AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_revenue,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "events_props_k_by_type": r"""
            SELECT event_type, count(*) AS n, count(k) AS with_k,
                   min(k) AS min_k, max(k) AS max_k,
                   round(sum(k) / count(k), 4) AS mean_k
            FROM (SELECT event_type,
                         CASE WHEN regexp_extract(props, '"k":\s*(\d+)', 1) = ''
                              THEN NULL
                              ELSE regexp_extract(props, '"k":\s*(\d+)', 1)::BIGINT
                         END AS k
                  FROM events)
            GROUP BY event_type
        """,
        "lineitem_profile": """
            SELECT 'l_quantity' AS col, count(l_quantity) AS n,
                   count(*) - count(l_quantity) AS n_null,
                   min(l_quantity) AS min_v, max(l_quantity) AS max_v,
                   round(sum(l_quantity) / count(l_quantity), 4) AS mean_v
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', count(l_extendedprice),
                   count(*) - count(l_extendedprice),
                   min(l_extendedprice), max(l_extendedprice),
                   round(sum(l_extendedprice) / count(l_extendedprice), 4)
            FROM lineitem
            UNION ALL
            SELECT 'l_discount', count(l_discount),
                   count(*) - count(l_discount),
                   min(l_discount), max(l_discount),
                   round(sum(l_discount) / count(l_discount), 4)
            FROM lineitem
            UNION ALL
            SELECT 'l_tax', count(l_tax), count(*) - count(l_tax),
                   min(l_tax), max(l_tax),
                   round(sum(l_tax) / count(l_tax), 4)
            FROM lineitem
        """,
        "lineitem_corr": """
            WITH s AS (
                SELECT l_returnflag, count(*)::BIGINT AS n_rows,
                       sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
                       sum(l_quantity * l_quantity) AS sxx,
                       sum(l_extendedprice * l_extendedprice) AS syy,
                       sum(l_quantity * l_extendedprice) AS sxy
                FROM lineitem GROUP BY l_returnflag)
            SELECT l_returnflag, n_rows,
                   round((sxy - sx * sy / n_rows) / n_rows, 4)
                       AS cov_qty_price,
                   round((n_rows * sxy - sx * sy)
                         / (sqrt(n_rows * sxx - sx * sx)
                            * sqrt(n_rows * syy - sy * sy)), 4)
                       AS corr_qty_price
            FROM s
        """,
        "profit_by_nation_year": """
            SELECT n.n_name AS nation,
                   CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                       AS sum_profit
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE p.p_name LIKE '%gear%'
            GROUP BY 1, 2
        """,
        "lineitem_qty_stats": """
            SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS std_qty,
                   max(l_quantity) AS max_qty, min(l_quantity) AS min_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "events_pivot_type_counts": """
            PIVOT (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                          event_type
                   FROM events)
            ON event_type USING count(*) GROUP BY day
        """,
        "events_type_cooccurrence": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS n_users
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "doc_unigram_logprob": f"""
            WITH toks AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '{_TOK}')) AS token
                FROM documents),
            cnt AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
            tot AS (SELECT count(*) AS t FROM toks)
            SELECT toks.doc_id, count(*)::BIGINT AS n_tokens,
                   round(sum(ln(cnt.c) - ln(tot.t)), 4) AS logprob
            FROM toks, cnt, tot
            WHERE toks.token = cnt.token
            GROUP BY toks.doc_id
        """,
        "part_fuzzy_pairs": """
            WITH names AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
            FROM names a JOIN names b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 2
        """,
        "events_type_transitions": """
            WITH s AS (
                SELECT user_id, event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_type
                FROM events)
            SELECT prev_type, event_type AS next_type, count(*) AS n
            FROM s WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        """,
        "orders_cube": """
            SELECT o_orderpriority, o_orderstatus,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS sum_price
            FROM orders
            GROUP BY CUBE (o_orderpriority, o_orderstatus)
        """,
        "doc_chunks": f"""
            WITH t AS (
                SELECT doc_id, regexp_extract_all(text, '{_TOK}') AS toks
                FROM documents),
            s AS (
                SELECT doc_id, toks,
                       unnest(range(0, len(toks), 48)) AS start
                FROM t),
            c AS (
                SELECT doc_id, CAST(start / 48 AS BIGINT) AS chunk_idx,
                       toks[start + 1 : least(start + 64, len(toks))] AS ck
                FROM s)
            SELECT doc_id, chunk_idx, len(ck)::BIGINT AS n_tokens,
                   md5(array_to_string(ck, ' ')) AS chunk_fp
            FROM c
        """,
        "doc_redact_terms": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\b(spark|dup)\b'))::BIGINT
                       AS n_masked,
                   md5(regexp_replace(text, '\b(spark|dup)\b', '[MASKED]',
                                      'g')) AS masked_fp
            FROM documents
        """,
        "dedup_normalized": r"""
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups,
                   md5(norm) AS norm_fp
            FROM (SELECT doc_id,
                         regexp_replace(lower(coalesce(text, '')),
                                        '\s+', ' ', 'g') AS norm
                  FROM documents)
            GROUP BY norm
        """,
        "events_time_to_next": """
            SELECT event_id, user_id, delta_us FROM (
                SELECT event_id, user_id,
                       lead(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) - epoch_us(ts) AS delta_us
                FROM events
            ) WHERE delta_us IS NOT NULL
        """,
        "lineitem_qty_mad": """
            WITH m AS (
                SELECT l_returnflag, median(l_quantity) AS med_qty
                FROM lineitem GROUP BY 1)
            SELECT l.l_returnflag, m.med_qty,
                   median(abs(l.l_quantity - m.med_qty)) AS mad_qty
            FROM lineitem l JOIN m USING (l_returnflag)
            GROUP BY 1, 2
        """,
        "events_type_value_quantiles": """
            SELECT event_type,
                   quantile_disc(value, 0.5) AS p50,
                   quantile_disc(value, 0.9) AS p90
            FROM events GROUP BY event_type
        """,
        "events_click_purchase_setops": """
            WITH c AS (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'click'),
                 p AS (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'purchase')
            SELECT user_id, 'both' AS grp
            FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM p)
            UNION ALL
            SELECT user_id, 'click_only' AS grp
            FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM p)
        """,
        "events_user_dense_rank": """
            WITH c AS (
                SELECT event_type, user_id, count(*)::BIGINT AS n_events
                FROM events GROUP BY 1, 2),
            r AS (
                SELECT event_type, user_id, n_events,
                       dense_rank() OVER (
                           PARTITION BY event_type ORDER BY n_events DESC
                       )::BIGINT AS rnk
                FROM c)
            SELECT * FROM r WHERE rnk <= 3
        """,
        "orders_above_customer_avg": """
            WITH a AS (
                SELECT o_custkey,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sc,
                       count(*)::BIGINT AS n
                FROM orders GROUP BY 1)
            SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
                   round(a.sc / (a.n * 100.0), 4) AS cust_avg
            FROM orders o JOIN a ON o.o_custkey = a.o_custkey
            WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) * a.n > a.sc
        """,
        "nation_segments": """
            WITH d AS (
                SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
            SELECT n.n_name,
                   string_agg(d.c_mktsegment, ','
                              ORDER BY d.c_mktsegment) AS segments,
                   count(*)::BIGINT AS n_segments
            FROM d JOIN nation n ON n.n_nationkey = d.c_nationkey
            GROUP BY n.n_name
        """,
        "lineitem_charges_unpivot": """
            SELECT l_orderkey, l_linenumber,
                   'discount' AS charge, l_discount AS amount
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'extended', l_extendedprice
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'tax', l_tax
            FROM lineitem
        """,
        "events_click_no_purchase": """
            SELECT e.event_id AS click_id, e.user_id, e.ts AS click_ts
            FROM events e
            WHERE e.event_type = 'click'
              AND NOT EXISTS (
                SELECT 1 FROM events p
                WHERE p.user_id = e.user_id
                  AND p.event_type = 'purchase'
                  AND p.ts > e.ts
                  AND p.ts <= e.ts + INTERVAL 1 HOUR)
        """,
        "doc_entropy": """
            WITH w AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9_]+') AS ws
              FROM documents
            )
            SELECT doc_id, len(ws)::BIGINT AS n_words,
                   CASE WHEN len(ws) = 0 THEN 0.0
                        ELSE round(ln(len(ws))
                             - list_sum(list_transform(
                                   map_values(list_aggregate(ws, 'histogram')),
                                   c -> c * ln(c))) / len(ws), 4)
                   END AS entropy
            FROM w
        """,
        "corpus_skipgram_top50": """
            WITH w AS (
              SELECT regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9_]+') AS ws
              FROM documents
            ), pairs AS (
              SELECT unnest(list_transform(
                         range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS pair
              FROM w WHERE len(ws) > 1
              UNION ALL
              SELECT unnest(list_transform(
                         range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+2])) AS pair
              FROM w WHERE len(ws) > 2
            )
            SELECT pair, count(*)::BIGINT AS n FROM pairs
            GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 50
        """,
        "corpus_pmi_top50": """
            WITH w AS (
              SELECT regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9_]+') AS ws
              FROM documents
            ), uni AS (
              SELECT u AS word, count(*)::BIGINT AS n
              FROM (SELECT unnest(ws) AS u FROM w) GROUP BY u
            ), tot AS (SELECT sum(n)::BIGINT AS t FROM uni),
            bg AS (
              SELECT bg, count(*)::BIGINT AS n_ab FROM (
                SELECT unnest(list_transform(
                           range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
                FROM w WHERE len(ws) > 1
              ) GROUP BY bg HAVING count(*) >= 5
            )
            SELECT bg.bg, bg.n_ab,
                   round(ln((bg.n_ab * tot.t)::DOUBLE
                            / (ua.n * ub.n)::DOUBLE), 4) AS pmi
            FROM bg
            CROSS JOIN tot
            JOIN uni ua ON ua.word = split_part(bg.bg, ' ', 1)
            JOIN uni ub ON ub.word = split_part(bg.bg, ' ', 2)
            ORDER BY pmi DESC, bg.bg ASC LIMIT 50
        """,
        "events_user_daily_gapfill": """
            WITH d AS (
              SELECT user_id, date_trunc('day', ts) AS day,
                     count(*)::BIGINT AS n_events,
                     round(sum(value), 4) AS sum_value
              FROM events GROUP BY 1, 2
            ), b AS (
              SELECT user_id, min(day) AS lo, max(day) AS hi FROM d GROUP BY 1
            ), cal AS (
              SELECT user_id,
                     unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
              FROM b
            )
            SELECT cal.user_id, cal.day AS day,
                   coalesce(d.n_events, 0)::BIGINT AS n_events,
                   coalesce(d.sum_value, 0.0) AS sum_value
            FROM cal LEFT JOIN d
              ON d.user_id = cal.user_id AND d.day = cal.day
        """,
        "events_value_ntile": """
            SELECT event_id, user_id,
                   ntile(4) OVER (
                       PARTITION BY user_id ORDER BY value, event_id
                   )::BIGINT AS quartile
            FROM events
        """,
        "events_type_user_hll": """
            WITH h AS (
                SELECT DISTINCT event_type,
                       md5_number_upper(user_id::VARCHAR) AS hv
                FROM events),
            r AS (SELECT event_type, hv % 256 AS j, hv // 256 AS w FROM h),
            rr AS (
                SELECT event_type, j,
                       max(CASE WHEN w = 0 THEN 57
                           ELSE 56 - length(ltrim(bin(w), '0')) + 1 END
                       ) AS rho
                FROM r GROUP BY 1, 2),
            agg AS (SELECT event_type, sum(pow(2.0, -rho)) AS s,
                           count(*) AS nz
                    FROM rr GROUP BY 1),
            ne AS (SELECT event_type,
                          count(DISTINCT user_id)::BIGINT AS n_exact
                   FROM events GROUP BY 1),
            est AS (
                SELECT event_type, CASE
                    WHEN (0.7213 / (1 + 1.079 / 256)) * 65536
                         / (s + (256 - nz)) <= 640
                         AND nz < 256
                    THEN 256 * ln(256.0 / (256 - nz))
                    ELSE (0.7213 / (1 + 1.079 / 256)) * 65536
                         / (s + (256 - nz))
                END AS e FROM agg)
            SELECT est.event_type, round(est.e, 4) AS hll_estimate,
                   ne.n_exact,
                   round(abs(est.e - ne.n_exact) / ne.n_exact, 4) AS rel_err
            FROM est JOIN ne USING (event_type)
        """,
        # priority unrounded: bit-identical by construction (one IEEE
        # division of exact <2^53 operands); round(·,4) at ~1e12 magnitude
        # is where numpy and DuckDB diverge
        "doc_sample_weighted": """
            SELECT doc_id, n_chars, pr AS priority FROM (
                SELECT doc_id, n_chars::BIGINT AS n_chars,
                       (md5_number_upper(doc_id::VARCHAR)
                        % 9007199254740992)::DOUBLE
                       / (n_chars + 1)::DOUBLE AS pr
                FROM documents
                ORDER BY pr ASC, doc_id ASC LIMIT 20
            )
        """,
        "events_user_freq_cms": """
            WITH rows_ AS (SELECT unnest(range(4)) AS r),
            regs AS (
                SELECT rows_.r,
                       md5_number_upper(rows_.r::VARCHAR || '|'
                                        || e.user_id::VARCHAR) % 1024 AS col,
                       count(*)::BIGINT AS cnt
                FROM events e CROSS JOIN rows_
                GROUP BY 1, 2),
            probes AS (SELECT unnest(range(10)) AS u),
            est AS (
                SELECT p.u AS user_id,
                       min(coalesce(rg.cnt, 0))::BIGINT AS est_count
                FROM probes p CROSS JOIN rows_ rr
                LEFT JOIN regs rg
                  ON rg.r = rr.r
                 AND rg.col = md5_number_upper(rr.r::VARCHAR || '|'
                                               || p.u::VARCHAR) % 1024
                GROUP BY 1),
            exact AS (
                SELECT user_id, count(*)::BIGINT AS exact_count
                FROM events GROUP BY 1)
            SELECT e.user_id, e.est_count,
                   coalesce(x.exact_count, 0)::BIGINT AS exact_count
            FROM est e LEFT JOIN exact x ON e.user_id = x.user_id
        """,
        "corpus_posting_lists": f"""
            WITH td AS (
                SELECT DISTINCT doc_id, token FROM (
                    SELECT doc_id,
                           unnest(regexp_extract_all(text, '{_TOK}')) AS token
                    FROM documents)),
            agg AS (
                SELECT token, count(*)::BIGINT AS df,
                       array_to_string(list_sort(list(doc_id))[1:10], ',')
                           AS postings
                FROM td GROUP BY token)
            SELECT token, df, postings FROM agg
            ORDER BY df DESC, token ASC LIMIT 50
        """,
        "orders_by_nation": """
            SELECT n.n_name AS nation, count(*) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "similarity_topk": """
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                       e.embedding::DOUBLE[],
                       (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]
                   ), 4) AS cos
            FROM embeddings e WHERE e.vec_id <> 0
            ORDER BY cos DESC, vec_id ASC LIMIT 10
        """,
        "similarity_topk_multi": """
            WITH qs AS (
                SELECT vec_id AS query_idx, embedding AS qv
                FROM embeddings WHERE vec_id IN (0, 1, 2)
            ),
            scored AS (
                SELECT q.query_idx::BIGINT AS query_idx, e.vec_id,
                       round(list_cosine_similarity(
                           e.embedding::DOUBLE[], q.qv::DOUBLE[]), 4) AS cos
                FROM embeddings e CROSS JOIN qs q
            )
            SELECT query_idx, vec_id, cos FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_idx
                    ORDER BY cos DESC, vec_id ASC) AS rk
                FROM scored
            ) WHERE rk <= 10
        """,
        "media_video_frames": """
            -- printf('%06d') pads but never truncates (lpad would truncate
            -- ids beyond 6 digits, diverging from Python's f"m{id:06d}")
            SELECT 'm' || printf('%06d', doc_id) AS media_id,
                   least(greatest((1000 + (strlen(coalesce(text, '')) % 5) * 1000),
                                  1000)
                         // 1000 * 2, 32)::BIGINT AS n_frames
            FROM documents
        """,
        "media_audio_energy": """
            -- replays the fake 1 kHz decode sample-for-sample:
            -- s_j = ((u % 2^32 + j*((u >> 32)|1)) % 65536) - 32768
            WITH m AS (
                SELECT 'm' || printf('%06d', doc_id) AS media_id,
                       md5_number_upper(coalesce(text, '')) AS u,
                       greatest((1000 + (strlen(coalesce(text, '')) % 5)
                                 * 1000), 1) AS dur
                FROM documents),
            s AS (
                SELECT media_id,
                       unnest(range(0, dur)) AS j,
                       u % 4294967296 AS start,
                       (u // 4294967296) | 1 AS step
                FROM m)
            SELECT media_id,
                   (j // 256)::BIGINT AS window_idx,
                   round(avg(
                       ((((start + j * step) % 65536)::BIGINT - 32768)
                        * (((start + j * step) % 65536)::BIGINT - 32768)
                       )::DOUBLE), 4) AS energy
            FROM s GROUP BY media_id, j // 256
        """,
    }
