"""Doc-suite DuckDB oracles must reproduce the pipeline (fixture scale).

Backs the corpus-level assumptions in ``pipelines/doc_oracle.py``: the
minhash signature-estimate clustering equals exact-Jaccard clustering, the
LSH top-k probe is exact, and the hash/score arithmetic is bit-identical
between Python and DuckDB.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from neuroner_ray.pipelines import doc_oracle
from neuroner_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "query_fn, sql",
    [
        (q.doc_rolling_fp, doc_oracle.doc_rolling_fp_sql()),
        (q.doc_langid, doc_oracle.doc_langid_sql()),
        (q.doc_simhash, doc_oracle.doc_simhash_sql()),
        (q.doc_minhash_dedup, doc_oracle.doc_minhash_dedup_sql()),
        (q.doc_ngram_jaccard_pairs, doc_oracle.doc_ngram_jaccard_pairs_sql()),
        (q.embedding_near_dup, doc_oracle.embedding_near_dup_sql()),
        (q.similarity_topk_lsh, doc_oracle.similarity_topk_sql()),
    ],
    ids=[
        "rolling_fp",
        "langid",
        "simhash",
        "minhash_dedup",
        "ngram_jaccard",
        "embedding_near_dup",
        "topk_lsh",
    ],
)
def test_doc_oracle_matches_pipeline(con, query_fn, sql):
    got = _norm(query_fn(SF).to_pandas())
    want = _norm(con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )


@pytest.fixture(scope="module")
def con_rel():
    c = duckdb.connect()
    for t in ("events", "lineitem", "documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_round2_operator_queries_match_oracles(con_rel):
    """The round-2 operator additions (as-of join, exact quantiles, sliding
    windows, range join, multi-query ANN, media frame counts) against their
    registered oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_purchase_last_click",
        "lineitem_qty_quantiles",
        "events_sliding_hourly",
        "lineitem_price_bands",
        "similarity_topk_multi",
        "media_video_frames",
        "media_image_features",
        "similarity_topk_ivf",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(con_rel.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )
