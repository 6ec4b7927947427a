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
    build_nodes,
    canonical_map,
    materialize_graph,
)
from ..stages.linker import candidate_pairs, surface_census
from ..stages.tagger import RuleTagger, explode_mentions
from ..stages.triples import extract_triples_batch
from ..sources.parquet import read_parquet_clean


def read_transcripts(path: str) -> Dataset:
    return read_parquet_clean(path)


def tag_turns(
    transcripts: Dataset,
    tagger: Any = RuleTagger,
    tagger_args: tuple = (),
    concurrency: Any = (1, 8),
    batch_size: int = 1024,
    num_gpus: float = 0,
) -> Dataset:
    """Fused tokenize+tag: the map-only hot path (no shuffle by construction).

    Taggers tokenize inline (see ``_tokens_of_batch``) — one stage, no
    intermediate Arrow tokens column. The default gazetteer tagger runs as
    stateless tasks (elastic, no pool ramp-up); stateful taggers (weights)
    run as an actor pool. ``num_gpus`` is the north_star GPU-actor seam:
    pass e.g. 1 (or 0.5 for packing) on a GPU cluster and Ray schedules
    each tagger actor on a GPU; the NumPy tagger here never asks for one
    (this sandbox is CPU-only), so the default is 0.
    """
    if tagger is RuleTagger and not tagger_args:
        if num_gpus:
            # the gazetteer fast path schedules plain CPU tasks — silently
            # dropping a GPU request would be a lie; the seam is for
            # stateful (weights-bearing) taggers
            raise ValueError(
                "num_gpus requires a stateful tagger (actor pool); the "
                "default gazetteer tagger runs as CPU tasks"
            )
        from ..stages.tagger import rule_tag_batch

        return transcripts.map_batches(
            rule_tag_batch, batch_format="pyarrow", batch_size=batch_size
        )
    kwargs = {"num_gpus": num_gpus} if num_gpus else {}
    return transcripts.map_batches(
        tagger,
        fn_constructor_args=tagger_args,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        **kwargs,
    )


def mentions_of(tagged: Dataset) -> Dataset:
    return tagged.map_batches(explode_mentions, batch_format="pyarrow")


def triples_of(tagged: Dataset) -> Dataset:
    return tagged.map_batches(extract_triples_batch, batch_format="pyarrow")


def link_and_canonicalize_tagged(tagged: Dataset) -> tuple[Dataset, Dataset]:
    """J4 + A6 off tagged turns directly (fused census — one corpus pass)."""
    from ..stages.linker import census_from_tagged

    return _link_from_census(census_from_tagged(tagged).materialize())


def link_and_canonicalize(mentions: Dataset) -> tuple[Dataset, Dataset]:
    """J4 + A6: mentions → (nodes Dataset, labels Dataset)."""
    return _link_from_census(surface_census(mentions).materialize())


SMALL_VOCAB_MAX = 100_000  # distinct surfaces under which linking runs driver-side


def _link_small_census(census: Dataset) -> tuple[Dataset, Dataset]:
    """Driver-local linking for small vocabularies: the SAME blocking,
    match-rule, union-find and node-build functions as the distributed
    path, executed in-process — the census is already collected, so four
    vocabulary-sized Ray executions collapse into driver compute."""
    from collections import Counter

    import pandas as pd

    from ..stages.canonicalize import union_find
    from ..stages.graph import _node_rows
    from ..stages.linker import (
        LINK_CAP,
        _block_keys_batch,
        _pairs_in_block,
        node_key,
        salt_hot_blocks,
        salt_threshold_for,
    )

    ctab = pa.concat_tables(list(census.iter_batches(batch_size=None, batch_format="pyarrow")))
    blocked_tab = _block_keys_batch(ctab)
    # same hot-block salting + cap CONSTANTS as the distributed path (paths
    # must stay equivalent — tests/test_link_paths.py)
    sizes = Counter(blocked_tab["block"].to_pylist())
    blocked = salt_hot_blocks(
        blocked_tab, dict(sizes), salt_threshold_for(LINK_CAP)
    ).to_pandas()
    pair_frames = [
        _pairs_in_block(g, cap=LINK_CAP) for _, g in blocked.groupby("block")
    ]
    pair_list: list[tuple[str, str]] = []
    for f in pair_frames:
        pair_list.extend(zip(f["a"], f["b"]))
    nodes_list = [
        node_key(e, s)
        for e, s in zip(ctab["ent_type"].to_pylist(), ctab["surface"].to_pylist())
    ]
    labels = union_find(nodes_list, pair_list)
    cdf = ctab.to_pandas()
    cdf["node"] = nodes_list
    cdf["label"] = [labels[n] for n in nodes_list]
    nodes_df = pd.concat(
        [_node_rows(g) for _, g in cdf.groupby("label")], ignore_index=True
    )
    labels_tab = pa.table(
        {
            "node": pa.array(sorted(labels), pa.string()),
            "label": pa.array([labels[k] for k in sorted(labels)], pa.string()),
        }
    )
    return rd.from_pandas(nodes_df), rd.from_arrow(labels_tab)


def _link_from_census(census: Dataset) -> tuple[Dataset, Dataset]:
    n = census.count()
    if n == 0:  # entity-free corpus → empty typed graph
        from ..schemas import NODES

        empty_nodes = rd.from_arrow(NODES.empty_table())
        empty_labels = rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}
            )
        )
        return empty_nodes, empty_labels
    if n <= SMALL_VOCAB_MAX:
        return _link_small_census(census)
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
    num_gpus: float = 0,
) -> dict[str, Dataset]:
    """Full pipeline; returns the logical tables (lazy where possible).
    ``num_gpus`` flows to the tagger actor pool (GPU-cluster seam)."""
    transcripts = read_transcripts(transcripts_path)
    # One tagging pass: materialize the tagged turns (tokens dropped — only
    # labels+mentions flow downstream) so mentions AND triples derive from a
    # single execution instead of re-running tokenize+tag per consumer.
    tagged = tag_turns(
        transcripts, tagger=tagger, tagger_args=tagger_args,
        concurrency=concurrency, num_gpus=num_gpus,
    ).materialize()
    nodes = link_and_canonicalize_tagged(tagged)[0].materialize()
    mapping = canonical_map(nodes)
    from ..stages.graph import tagged_to_edges

    edges = tagged_to_edges(tagged, mapping)
    out = {
        # mentions/triples stay lazy derivations of the materialized tagged
        # checkpoint — cheap map passes for any consumer that wants them
        "mentions": mentions_of(tagged),
        "triples": triples_of(tagged),
        "nodes": nodes,
        "edges": edges,
    }
    if out_dir is not None:
        materialize_graph(nodes, edges, out_dir)
    return out


# ------------------------------------------------------- incremental ingest
def _stage_increments(
    transcripts_path: str, out_dir: str, num_increments: int
) -> str:
    """ONE streaming pass splits the input into ``num_increments``
    conversation-disjoint arrival batches under ``<out>/_increments/inc=<i>``
    (hive-partitioned, idempotent via a keyed ``_DONE`` marker — same
    pattern as ``manifests._ensure_bucketed_input``). The split hash is
    salted so it is independent of the bucket hash inside each ingest."""
    import json
    import os
    import shutil

    # split-count in the path: `inc=0` holds DIFFERENT conversations under
    # a 2-way vs 3-way split, and downstream staging (run_bucketed's
    # per-increment `_bucketed-inc-*`) is keyed on this path — reusing one
    # dir across splits would silently feed stale conversation sets
    staged = os.path.join(out_dir, f"_increments-n{num_increments}")
    marker = os.path.join(staged, "_DONE")
    key = {"input": transcripts_path, "n": num_increments}
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == key:
                    return staged
        except (OSError, json.JSONDecodeError):
            pass
        shutil.rmtree(staged, ignore_errors=True)
    tmp = f"{staged}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)

    def add_inc(t: pa.Table) -> pa.Table:
        # vectorized siphash with its own key domain (decorrelated from the
        # conv resume buckets); ANY deterministic disjoint split is valid —
        # finalize recomputes the global stages, so the invariant
        # incremental == full rebuild holds regardless of assignment
        from ..runtime.hashing import hash_buckets

        vals = hash_buckets(t["conv_id"], num_increments, key="inc")
        return t.append_column(
            "inc", pa.array(vals.astype("int32"), pa.int32())
        )

    read_transcripts(transcripts_path).map_batches(
        add_inc, batch_format="pyarrow"
    ).write_parquet(tmp, partition_cols=["inc"])
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        json.dump(key, f)
    shutil.rmtree(staged, ignore_errors=True)
    os.replace(tmp, staged)
    return staged


def run_incremental(
    transcripts_path: str,
    out_dir: str,
    num_increments: int = 2,
    num_buckets: int = 2,
    tagger: Any = RuleTagger,
    tagger_args: tuple = (),
    config: dict | None = None,
) -> dict[str, Any]:
    """Incremental KG build: ingest the corpus as ``num_increments``
    conversation-disjoint arrival batches ("day 1, day 2, ..."), each via
    the resumable bucket machinery (`manifests.run_bucketed` with a per-
    increment tag namespace), re-finalizing the GLOBAL graph after each
    arrival so the node/edge tables are queryable between arrivals.

    The final graph is guaranteed equal to a from-scratch build over the
    union: per-turn tables (mentions, triples) are per-conversation
    deterministic and increments are conversation-disjoint, while the
    global finalize (linking → union-find canonicalization → edge
    aggregation) is recomputed over ALL completed buckets each time. Only
    those cheap vocabulary/edge-sized stages re-run on later arrivals; the
    expensive tagging of earlier increments is reused from its manifests.

    Returns ``{"nodes": Dataset, "edges": Dataset, "increments": [...]}``
    with the tables read back from the finalized on-disk graph (the bucket
    partition column dropped).
    """
    import os

    from . import manifests

    def table_fn(transcripts: Dataset) -> dict[str, Dataset]:
        tagged = tag_turns(transcripts, tagger=tagger, tagger_args=tagger_args)
        return {"mentions": mentions_of(tagged), "triples": triples_of(tagged)}

    cfg = dict(config or {})
    cfg.setdefault("pipeline", "kg-incremental-v1")
    cfg.setdefault("tagger", getattr(tagger, "__name__", str(tagger)))
    # the split parameters MUST enter the config hash: a re-run into the
    # same out_dir with a different split would otherwise skip manifests
    # produced under the old split and double-count moved conversations
    cfg["num_increments"] = num_increments
    cfg["num_buckets"] = num_buckets
    staged = _stage_increments(transcripts_path, out_dir, num_increments)
    log = []
    for i in range(num_increments):
        idir = os.path.join(staged, f"inc={i}")
        if not os.path.isdir(idir):  # no conversation hashed into this batch
            continue
        r = manifests.run_bucketed(
            idir, out_dir, table_fn, cfg,
            num_buckets=num_buckets, increment=f"inc{i}",
        )
        fin = manifests.finalize_graph(out_dir, cfg)
        log.append({"increment": f"inc{i}", **r, "finalize_skipped": fin["skipped"]})

    def _read(table: str) -> Dataset:
        import pyarrow.dataset as pads

        ds = manifests.read_output(out_dir, table)
        # column names from parquet metadata (no Ray execution — a
        # ds.schema() here would run a limit-1 plan and can log an
        # empty-block schema warning on partitioned dirs)
        names = pads.dataset(
            os.path.join(out_dir, table), format="parquet", partitioning="hive"
        ).schema.names
        return ds.drop_columns(["bucket"]) if "bucket" in names else ds

    return {"nodes": _read("nodes"), "edges": _read("edges"), "increments": log}
