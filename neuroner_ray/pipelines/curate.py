"""End-to-end training-data curation pipeline (composed operator).

Chains the curation operators into ONE streaming Ray Data pipeline — the
shape a 100 TB pre-training corpus prep actually runs:

    read → quality/repetition signals (map) → exact-dedup survivor
    (content-hash groupby; the shuffle key is the md5, so duplicate docs
    co-locate and the min-doc_id survivor is exact) → quality filter →
    deterministic split/shard assignment (id hash; stable across runs and
    cluster sizes) → hive-partitioned Parquet write (split=/shard=
    directories → a failed run resumes by skipping finished partitions).

Scale notes:
- signals are computed map-side BEFORE the dedup groupby, so the shuffle
  carries each document's text ONCE plus fixed-width signal columns (the
  exact-dedup exchange is inherently corpus-sized; nothing else is).
- the split/shard assignment is a pure map over ids — no coordination,
  identical result at any parallelism.
- `curated_shard_counts` (the driver-checked query) aggregates the
  (split, shard) key domain (30 slim keys) with the fan-in tree combine —
  no sort shuffle for the count.

DuckDB oracle: ``__ray_entry__.oracle_sql()["curated_shard_counts"]``
mirrors the full chain (signals, survivor set, thresholds, hash splits).
"""

from __future__ import annotations

import hashlib
import os
from collections import Counter

import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Min

from ..functions.rounding import round_half_away
from ..runtime.combine import group_sum_merge, tree_combine
from ..sources.parquet import read_parquet_clean

# curation thresholds (shared with the oracle SQL; compared on the
# 4-decimal rounded signals on BOTH sides so the boundary is exact)
MIN_CHARS = 100
MAX_DUP_WORD_FRAC = 0.6
MAX_TOP_WORD_FRAC = 0.2
N_SHARDS = 8

import re

_WORD_RE = re.compile(r"[a-z0-9_]+")


def _hash10(s: str) -> int:
    """First 8 md5 bytes little-endian (DuckDB md5_number_upper parity)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def _signals(batch: pa.Table) -> pa.Table:
    """Slim per-doc curation row: content hash + quality signals + the
    payload columns the curated output keeps."""
    h, n_chars, dup_w, top_w = [], [], [], []
    for t in batch["text"].to_pylist():
        t = t or ""
        h.append(hashlib.md5(t.encode("utf-8")).hexdigest())
        n_chars.append(len(t))
        ws = _WORD_RE.findall(t.lower())
        if not ws:
            dup_w.append(0.0)
            top_w.append(0.0)
        else:
            dup_w.append(float(round_half_away(1.0 - len(set(ws)) / len(ws))))
            top_w.append(float(round_half_away(max(Counter(ws).values()) / len(ws))))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text": batch["text"],
            "lang": batch["lang"],
            "source": batch["source"],
            "h": pa.array(h, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
            "dup_word_frac": pa.array(dup_w, pa.float64()),
            "top_word_frac": pa.array(top_w, pa.float64()),
        }
    )


def _assign(batch: pa.Table) -> pa.Table:
    """Deterministic split (8/1/1) + shard: pure map over ids."""
    splits, shards = [], []
    for d in batch["doc_id"].to_pylist():
        b = _hash10(str(d)) % 10
        splits.append("train" if b < 8 else ("valid" if b == 8 else "test"))
        shards.append(_hash10("s" + str(d)) % N_SHARDS)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text": batch["text"],
            "lang": batch["lang"],
            "source": batch["source"],
            "split": pa.array(splits, pa.string()),
            "shard": pa.array(shards, pa.int64()),
        }
    )


def curate(docs: Dataset) -> Dataset:
    """Signals → exact-dedup survivor → quality filter → split/shard.

    Returns the curated document stream with ``split``/``shard`` columns
    (lazy — consume with write or an aggregate).
    """
    import pyarrow.compute as pc

    sig = docs.map_batches(_signals, batch_format="pyarrow")
    # exact dedup: groupby content hash; all non-key columns are identical
    # within a group except doc_id, where Min picks the survivor — so Min
    # reconstructs the survivor's full row without a second join
    surv = sig.groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Min("text", alias_name="text"),
        Min("lang", alias_name="lang"),
        Min("source", alias_name="source"),
        Min("n_chars", alias_name="n_chars"),
        Min("dup_word_frac", alias_name="dup_word_frac"),
        Min("top_word_frac", alias_name="top_word_frac"),
    )

    def quality(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(batch["n_chars"], MIN_CHARS),
                pc.less_equal(batch["dup_word_frac"], MAX_DUP_WORD_FRAC),
            ),
            pc.less_equal(batch["top_word_frac"], MAX_TOP_WORD_FRAC),
        )
        return batch.filter(keep)

    kept = surv.map_batches(quality, batch_format="pyarrow")
    return kept.map_batches(_assign, batch_format="pyarrow")


def curated_shard_counts(sf_dir: str) -> Dataset:
    """Driver-checked summary of the full chain: docs per (split, shard)."""
    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    merge = group_sum_merge(("split", "shard"), ("n_docs",))

    def count_rows(t: pa.Table) -> pa.Table:
        return merge(
            pa.table(
                {
                    "split": t["split"],
                    "shard": t["shard"],
                    "n_docs": pa.array([1] * t.num_rows, pa.int64()),
                }
            )
        )

    partials = curate(docs).map_batches(count_rows, batch_format="pyarrow")
    return tree_combine(partials, merge)


def curate_and_write(sf_dir: str, out_dir: str) -> dict[str, int]:
    """Run the chain and write hive-partitioned curated Parquet
    (``split=*/shard=*`` directories). Returns per-split row counts read
    back from the written output (a write-path integrity check)."""
    import pyarrow.dataset as pads

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    curate(docs).write_parquet(out_dir, partition_cols=["split", "shard"])
    written = pads.dataset(out_dir, partitioning="hive").to_table(
        columns=["split"]
    )
    counts: dict[str, int] = {}
    for s in written["split"].to_pylist():
        counts[str(s)] = counts.get(str(s), 0) + 1
    return counts


def export_jsonl(curated: Dataset, out_dir: str) -> int:
    """Interchange sink: write the curated stream as JSONL (one object
    per line, one file per block; ``split``/``shard`` stay as fields so
    loaders filter on them) — the format downstream training loaders
    ingest. Streaming ``write_json``: blocks flush as they arrive,
    nothing materializes on the driver. (Ray 2.49's JSON datasink has no
    ``partition_cols``; the resumable hive-partitioned layout remains the
    Parquet sink's job — see ``curate_and_write``.) Returns the row count
    read back from the written output (same integrity convention). The
    target directory is cleared first — ``write_json`` appends files, so
    stale exports would silently double the read-back."""
    import shutil

    import ray.data as rd

    shutil.rmtree(out_dir, ignore_errors=True)
    curated.write_json(out_dir)
    return rd.read_json(out_dir, file_extensions=["json", "jsonl"]).count()


def import_jsonl(path: str) -> Dataset:
    """Interchange source: read a JSONL export back as a Dataset."""
    import ray.data as rd

    return rd.read_json(path, file_extensions=["json", "jsonl"])
