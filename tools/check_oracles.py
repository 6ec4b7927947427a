"""Local replica of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at the given sf and compares it
with the paired ``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value comparison (rows sorted by all columns, columns
sorted by name). Queries without an oracle get a rows-only check.

Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import ray

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(result, Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    # NO float rounding here: the driver's gate hashes raw values, so the
    # replica must too — queries/oracles are responsible for rounding their
    # own float columns identically (half-away-from-zero, 4 decimals).
    # Rounding here masked the round-1 doc_quality banker's-rounding bug.
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: set[str] | None = None) -> int:
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # kg_* oracles embed the driver's sf0.01 transcript path by default;
    # point them at the sf under test instead
    os.environ["GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    oracles = e.oracle_sql()
    failures = 0
    if only:
        unknown = only - set(e.queries())
        if unknown:  # a typo must not read as "gate passed, nothing ran"
            print(f"FAIL unknown query name(s): {sorted(unknown)}")
            return 1
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(got)} rows")
            continue
        want = normalize(con.execute(oracles[name]).fetchdf())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
            )
            print(f"ok   {name}: {len(got)} rows match oracle")
        except AssertionError as ex:
            print(f"FAIL {name}: value mismatch\n{str(ex)[:500]}")
            failures += 1
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    code = main(sf, only)
    ray.shutdown()
    sys.exit(code)
