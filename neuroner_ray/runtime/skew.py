"""Skew handling: heavy-hitter census + salted two-level aggregation.

SURVEY.md §4.2 / O6: hot keys (the synthetic corpus forces one — ~5% of ORG
slots are the same entity) blow up a naive ``groupby(key)``: one reduce
task receives a disproportionate share of rows. The standard fix:

1. **Census** (O6): find heavy hitters cheaply — partial counts per batch,
   vocabulary-sized groupby, top-k. Run on a sample at real scale.
2. **Salting**: rows whose key is hot get ``key -> (key, salt)`` with
   ``salt = hash(row) % s``; aggregate per (key, salt) — the hot key's rows
   now spread over ``s`` reduce tasks — then a second, tiny groupby merges
   the ``s`` partials per hot key.

``salted_count`` demonstrates the pattern for counting; any algebraic
aggregate (sum/min/max/mergeable sketch) composes the same way.
"""

from __future__ import annotations

import zlib
from collections import Counter

import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum


def heavy_hitters(ds: Dataset, key: str, top_k: int = 20) -> list[tuple[str, int]]:
    """O6 census: [(key, count)] for the top_k most frequent keys."""

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter(batch[key].to_pylist())
        return pa.table(
            {
                "k": pa.array([str(x) for x in c.keys()], pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "k"], descending=[True, False])
        .limit(top_k)
    )
    out = []
    for b in counts.iter_batches(batch_format="pyarrow"):
        out.extend(zip(b["k"].to_pylist(), b["n"].to_pylist()))
    return out


def salted_count(
    ds: Dataset,
    key: str,
    hot_keys: set[str],
    num_salts: int = 8,
) -> Dataset:
    """groupby(key).count() with hot keys salted into ``num_salts`` partials.

    Returns (key, n). Level 1: count per (key, salt) — hot keys spread over
    ``num_salts`` reducers, cold keys keep salt 0. Level 2: sum the salted
    partials per key (touches only #hot_keys × num_salts rows).
    """

    def salt(batch: pa.Table) -> pa.Table:
        keys = [str(x) for x in batch[key].to_pylist()]
        salts = [
            zlib.crc32(f"{k}:{i}".encode()) % num_salts if k in hot_keys else 0
            for i, k in enumerate(keys)
        ]
        return pa.table(
            {
                "k": pa.array(keys, pa.string()),
                "salt": pa.array(salts, pa.int32()),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter(
            zip(
                (str(x) for x in batch["k"].to_pylist()),
                batch["salt"].to_pylist(),
            )
        )
        ks, ss, ns = [], [], []
        for (k, s), n in c.items():
            ks.append(k)
            ss.append(s)
            ns.append(n)
        return pa.table(
            {
                "k": pa.array(ks, pa.string()),
                "salt": pa.array(ss, pa.int32()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    salted = ds.map_batches(salt, batch_format="pyarrow").map_batches(
        partial, batch_format="pyarrow"
    )
    level1 = salted.groupby(["k", "salt"]).aggregate(Sum("n", alias_name="n"))
    level2 = level1.groupby("k").aggregate(Sum("n", alias_name="n"))
    return level2.map_batches(
        lambda t: pa.table({key: t["k"], "n": t["n"]}), batch_format="pyarrow"
    )
