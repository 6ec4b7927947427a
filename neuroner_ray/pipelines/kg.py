"""End-to-end KG-construction pipeline (EP2 recast; SURVEY.md §3 target).

transcripts → M1 tokenize → tagger actor pool (T2/T3 or RuleTagger) →
M3 mentions → M11 triples → J4 linking (band shuffle) → A6 union-find →
J5 resolve → O5/A7 edges → S9 partitioned Parquet.

Every step is a lazy Dataset transform. Materializations: the
vocabulary-sized label/census tables (linking), plus ONE corpus-sized
checkpoint of the tagged turns so mentions and triples share a single
tagging pass (tagging is the expensive stage; the object store spills as
needed). At full 100 TB scale the same pipeline runs through
``manifests.run_bucketed``, which streams bucket-by-bucket and checkpoints
to Parquet instead.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from ..stages.canonicalize import connected_components
from ..stages.graph import (
    aggregate_edges,
    build_nodes,
    canonical_map,
    materialize_graph,
    resolve_triples,
)
from ..stages.linker import candidate_pairs, surface_census
from ..stages.tagger import RuleTagger, explode_mentions
from ..stages.triples import extract_triples_batch


def read_transcripts(path: str) -> Dataset:
    return rd.read_parquet(path)


def tag_turns(
    transcripts: Dataset,
    tagger: Any = RuleTagger,
    tagger_args: tuple = (),
    concurrency: Any = (1, 8),
    batch_size: int = 1024,
) -> Dataset:
    """Fused tokenize+tag: the map-only hot path (no shuffle by construction).

    Taggers tokenize inline (see ``_tokens_of_batch``) — one actor-pool
    stage, no intermediate Arrow tokens column.
    """
    return transcripts.map_batches(
        tagger,
        fn_constructor_args=tagger_args,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def mentions_of(tagged: Dataset) -> Dataset:
    return tagged.map_batches(explode_mentions, batch_format="pyarrow")


def triples_of(tagged: Dataset) -> Dataset:
    return tagged.map_batches(extract_triples_batch, batch_format="pyarrow")


def link_and_canonicalize(mentions: Dataset) -> tuple[Dataset, Dataset]:
    """J4 + A6: mentions → (nodes Dataset, labels Dataset)."""
    census = surface_census(mentions).materialize()  # vocabulary-sized
    if census.count() == 0:  # entity-free corpus → empty typed graph
        from ..schemas import NODES

        empty_nodes = rd.from_arrow(NODES.empty_table())
        empty_labels = rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}
            )
        )
        return empty_nodes, empty_labels
    pairs = candidate_pairs(census)
    node_ids = census.map_batches(
        lambda t: pa.table(
            {
                "node": pa.array(
                    [
                        f"{e}|{s}"
                        for e, s in zip(
                            t["ent_type"].to_pylist(), t["surface"].to_pylist()
                        )
                    ],
                    pa.string(),
                )
            }
        ),
        batch_format="pyarrow",
    )
    labels = connected_components(pairs, node_ids)
    nodes = build_nodes(labels, census)
    return nodes, labels


def run_pipeline(
    transcripts_path: str,
    out_dir: str | None = None,
    tagger: Any = RuleTagger,
    tagger_args: tuple = (),
    concurrency: Any = (1, 8),
) -> dict[str, Dataset]:
    """Full pipeline; returns the logical tables (lazy where possible)."""
    transcripts = read_transcripts(transcripts_path)
    # One tagging pass: materialize the tagged turns (tokens dropped — only
    # labels+mentions flow downstream) so mentions AND triples derive from a
    # single execution instead of re-running tokenize+tag per consumer.
    tagged = tag_turns(
        transcripts, tagger=tagger, tagger_args=tagger_args, concurrency=concurrency
    ).materialize()
    mentions = mentions_of(tagged)
    triples = triples_of(tagged).materialize()  # consumed twice (resolve + P/R)
    nodes = link_and_canonicalize(mentions)[0].materialize()
    mapping = canonical_map(nodes)
    resolved = resolve_triples(triples, mapping)
    edges = aggregate_edges(resolved)
    out = {
        "mentions": mentions,
        "triples": triples,
        "nodes": nodes,
        "edges": edges,
    }
    if out_dir is not None:
        materialize_graph(nodes, edges, out_dir)
    return out
