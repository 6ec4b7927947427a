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
        (q.embedding_kmeans, doc_oracle.embedding_kmeans_sql()),
    ],
    ids=[
        "rolling_fp",
        "langid",
        "simhash",
        "minhash_dedup",
        "ngram_jaccard",
        "embedding_near_dup",
        "topk_lsh",
        "embedding_kmeans",
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
    for t in ("events", "lineitem", "documents", "embeddings", "orders", "customer"):
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
        "media_audio_energy",
        "similarity_topk_ivf",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(con_rel.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )


def test_round3_curation_queries_match_oracles(con_rel):
    """The round-3 training-data curation additions (repetition signals,
    deterministic split, stratified sample, contamination check, corpus
    bigram census) against their registered oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "doc_repetition",
        "doc_split_assign",
        "doc_sample_per_source",
        "doc_contamination",
        "corpus_bigram_top50",
        "corpus_dup_shingles",
        "lang_fertility",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(con_rel.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        assert len(got) == len(want), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )


def test_split_assign_fractions_and_determinism():
    """The 8/1/1 split is deterministic and roughly proportioned (id-hash
    based, so exact counts are fixture-stable)."""
    df1 = q.doc_split_assign(SF).to_pandas()
    df2 = q.doc_split_assign(SF).to_pandas()
    pd.testing.assert_frame_equal(
        df1.sort_values("doc_id").reset_index(drop=True),
        df2.sort_values("doc_id").reset_index(drop=True),
    )
    counts = df1["split"].value_counts()
    n = len(df1)
    assert set(counts.index) <= {"train", "valid", "test"}
    assert counts.get("train", 0) > 0.6 * n


def test_sample_per_source_is_k_per_group():
    df = q.doc_sample_per_source(SF).to_pandas()
    sizes = df.groupby("source").size()
    assert (sizes <= 3).all()
    # every source with >=3 docs contributes exactly 3
    import duckdb

    full = duckdb.connect().execute(
        f"SELECT source, count(*) n FROM read_parquet('{SF}/documents.parquet') GROUP BY source"
    ).fetchdf()
    for _, row in full.iterrows():
        assert sizes.get(row["source"], 0) == min(3, row["n"])


def test_curated_shard_counts_matches_oracle(con_rel):
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    got = _norm(e.queries()["curated_shard_counts"](SF).to_pandas())
    want = _norm(con_rel.execute(e.oracle_sql()["curated_shard_counts"]).fetchdf())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_curate_and_write_partitions(tmp_path):
    """The hive-partitioned write round-trips: per-split counts read back
    from disk equal the counts query, and the directory layout is
    split=*/shard=* (resumable-output contract)."""
    from neuroner_ray.pipelines.curate import curate_and_write, curated_shard_counts

    out = str(tmp_path / "curated")
    written = curate_and_write(SF, out)
    counts = curated_shard_counts(SF).to_pandas()
    per_split = counts.groupby("split")["n_docs"].sum().to_dict()
    assert written == per_split
    import os

    splits = sorted(d for d in os.listdir(out) if d.startswith("split="))
    assert splits and all("=" in d for d in splits)
    shard_dirs = os.listdir(os.path.join(out, splits[0]))
    assert all(d.startswith("shard=") for d in shard_dirs)


def test_round3_windowed_relational_queries_match_oracles(con_rel):
    """The round-3 windowed relational additions (daily retention,
    per-nation top-k customers) against their registered oracles at
    fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_daily_retention",
        "orders_top3_customers_by_nation",
        "events_cum_value",
        "events_user_count_hll",
        "events_value_quantiles",
        "doc_tfidf_top50",
        "embedding_label_centroids",
        "embedding_pca_top1",
        "events_purchase_click_window",
        "events_moving_avg3",
        "token_freq_top100_mg",
        "lineitem_profile",
        "events_props_k_by_type",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(con_rel.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )


def test_mg_sketch_trim_path_exact_and_loud(tmp_path):
    """Misra-Gries top-100 with a capacity small enough to force trims:
    on a skewed corpus the verified result must equal the exact census
    (deficit provably below the 100th count); on a uniform corpus where
    the trim wipes every counter it must raise rather than return an
    approximate answer."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    import neuroner_ray.pipelines.queries as Q

    # skewed: 120 hot tokens × 50 occurrences + 5000 distinct singletons
    rng = np.random.RandomState(7)
    texts = []
    hot = [f"hot{i}" for i in range(120)]
    for rep in range(50):
        rng.shuffle(hot)
        texts.append(" ".join(hot))
    noise = [f"noise{i}" for i in range(5000)]
    for i in range(0, 5000, 100):
        texts.append(" ".join(noise[i : i + 100]))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = (
        Q.token_freq_top100_mg(str(tmp_path), capacity=256)
        .to_pandas()
        .reset_index(drop=True)
    )
    from collections import Counter

    c = Counter()
    for t in texts:
        c.update(Q._TOKEN_RE.findall(t))
    want = (
        pd.DataFrame({"token": list(c.keys()), "n": list(c.values())})
        .sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
        .head(100)
        .reset_index(drop=True)
    )
    assert got.equals(want), (got.head(), want.head())

    # uniform: every token is a singleton — the trim wipes the summary
    uni = tmp_path / "uni"
    uni.mkdir()
    utexts = [" ".join(f"u{j}" for j in range(i, i + 100)) for i in range(0, 3000, 100)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(utexts)), pa.int64()),
                "text": pa.array(utexts, pa.string()),
            }
        ),
        str(uni / "documents.parquet"),
    )
    with pytest.raises(ValueError, match="MG"):
        Q.token_freq_top100_mg(str(uni), capacity=256)


def test_props_extraction_null_paths(tmp_path):
    """JSON-extraction profile on a synthetic events table covering the
    null routes: props without k, empty JSON, null props, and one type
    with no k at all (null min/max/mean on both the partial and merge
    levels)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines.queries import events_props_k_by_type

    rows = [
        ("a", '{"k": 3}'),
        ("a", '{"k": 5}'),
        ("a", '{"x": 1}'),
        ("b", "{}"),
        ("b", None),
        ("c", '{"k": 10, "x": 2}'),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([0] * len(rows), pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    df = (
        events_props_k_by_type(str(tmp_path))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert df.loc["a"].tolist()[:2] == [3, 2]          # n, with_k
    assert df.loc["a", ["min_k", "max_k", "mean_k"]].tolist() == [3, 5, 4.0]
    assert df.loc["b", "with_k"] == 0
    assert df.loc["b", ["min_k", "max_k", "mean_k"]].isna().all()
    assert df.loc["c", ["min_k", "max_k", "mean_k"]].tolist() == [10, 10, 10.0]


def test_jsonl_export_import_roundtrip(tmp_path):
    """The JSONL interchange sink/source round-trips the curated stream
    exactly (every column, every row, split/shard fields preserved)."""
    from neuroner_ray.pipelines import curate
    from neuroner_ray.sources.parquet import read_parquet_clean

    docs = read_parquet_clean(
        SF + "/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    curated = curate.curate(docs)
    want = (
        curated.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .sort_index(axis=1)
    )
    out = str(tmp_path / "jsonl")
    n = curate.export_jsonl(curate.curate(docs), out)
    got = (
        curate.import_jsonl(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .sort_index(axis=1)
    )
    assert n == len(want) == len(got)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # re-export into the same dir: stale files are cleared, not appended
    n2 = curate.export_jsonl(curate.curate(docs), out)
    assert n2 == n


def test_profile_columns_null_and_empty_paths():
    """Generic profiler: null-bearing and all-null columns produce exact
    counts and null min/max/mean where SQL would."""
    import pyarrow as pa
    import ray.data as rd

    from neuroner_ray.stages.profile import profile_columns

    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([1.0, None, 3.0], pa.float64()),
                "b": pa.array([None, None, None], pa.float64()),
            }
        )
    )
    df = profile_columns(ds, ["a", "b"]).to_pandas().set_index("col")
    assert df.loc["a"].tolist() == [2, 1, 1.0, 3.0, 2.0]
    assert df.loc["b", "n"] == 0 and df.loc["b", "n_null"] == 3
    assert df.loc["b", ["min_v", "max_v", "mean_v"]].isna().all()


def test_round4_operator_queries_match_oracles():
    """Round-4 continuation additions (moment correlation, star join,
    dynamic pivot, type co-occurrence, unigram-LM scoring, fuzzy string
    join) against their registered oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in (
        "events",
        "lineitem",
        "documents",
        "orders",
        "part",
        "supplier",
        "nation",
        "customer",
    ):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "lineitem_corr",
        "profit_by_nation_year",
        "events_pivot_type_counts",
        "events_type_cooccurrence",
        "doc_unigram_logprob",
        "part_fuzzy_pairs",
        "events_type_transitions",
        "corpus_posting_lists",
        "events_user_freq_cms",
        "orders_cube",
        "doc_chunks",
        "doc_redact_terms",
        "corpus_bpe_merges",
        "corpus_pmi_top50",
        "events_user_daily_gapfill",
        "events_value_ntile",
        "events_type_user_hll",
        "doc_sample_weighted",
        "doc_entropy",
        "corpus_skipgram_top50",
        "dedup_normalized",
        "events_time_to_next",
        "lineitem_qty_mad",
        "events_type_value_quantiles",
        "events_click_purchase_setops",
        "events_user_dense_rank",
        "orders_above_customer_avg",
        "nation_segments",
        "lineitem_charges_unpivot",
        "events_click_no_purchase",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )


def test_banded_levenshtein_matches_brute_force():
    """_lev_leq's banded DP agrees with the unbanded reference on random
    short strings, both on the distance value and the None (> k) cutoff."""
    import itertools
    import random

    def full_lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rng = random.Random(42)
    alphabet = "abcd"
    pool = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
        for _ in range(60)
    ]
    for k in (1, 2, 3):
        for a, b in itertools.combinations(pool, 2):
            want = full_lev(a, b)
            got = q._lev_leq(a, b, k)
            if want <= k:
                assert got == want, (a, b, k)
            else:
                assert got is None, (a, b, k)


def test_cms_overestimates_never_under():
    """Count-Min's defining invariant: est ≥ exact for every probe (min
    over rows of summed registers can only over-count via collisions)."""
    df = q.events_user_freq_cms(SF).to_pandas()
    assert len(df) == 10
    assert (df["est_count"] >= df["exact_count"]).all()


def test_bucket_count_invariance_for_user_bucket_census_ops():
    """n_buckets only routes rows (task-size knob): transition and
    co-occurrence censuses are identical at different bucket counts."""
    for fn in (
        q.events_type_transitions,
        q.events_type_cooccurrence,
        q.events_value_ntile,
        q.events_user_daily_gapfill,
        q.events_time_to_next,
    ):
        a = _norm(fn(SF, n_buckets=64).to_pandas())
        b = _norm(fn(SF, n_buckets=8).to_pandas())
        pd.testing.assert_frame_equal(a, b, obj=fn.__name__)


def test_bpe_merge_scan_properties():
    """The merge scan is left-to-right non-overlapping ('aaaa' + (a,a) →
    [aa, aa]) and a learned merge really appears in later rounds' pair
    space (the fold-equals-scan precondition: merged != left symbol)."""
    df = q.corpus_bpe_merges(SF).to_pandas()
    assert list(df["merge_idx"]) == [1, 2, 3, 4, 5, 6]
    assert (df["merged"] == df["left_sym"] + df["right_sym"]).all()
    assert (df["merged"] != df["left_sym"]).all()
    # frequencies are non-increasing is NOT guaranteed by BPE (later
    # merges can create new frequent pairs) — but all must be positive
    assert (df["freq"] > 0).all()


def test_gapfill_contiguous_and_ntile_balanced():
    """Structural invariants the oracle replay can't state directly: the
    gap-fill emits one row per CONSECUTIVE day of each user's span, and
    NTILE bucket sizes within a user differ by at most one."""
    import numpy as np

    got = q.events_user_daily_gapfill(SF).to_pandas()
    for _, g in got.groupby("user_id"):
        days = np.sort(g["day"].to_numpy())
        if len(days) > 1:
            assert (np.diff(days) == np.timedelta64(1, "D")).all()
    nt = q.events_value_ntile(SF).to_pandas()
    sizes = nt.groupby(["user_id", "quartile"]).size()
    spread = sizes.groupby("user_id").agg(["min", "max"])
    assert (spread["max"] - spread["min"] <= 1).all()


def test_entropy_bounds():
    """0 <= H <= ln(n_words) (tolerance 5e-5: an all-distinct doc has
    H = ln n EXACTLY and the 4-decimal rounding can land above it)."""
    import numpy as np

    df = q.doc_entropy(SF).to_pandas()
    assert (df["entropy"] >= 0).all()
    nz = df[df["n_words"] > 0]
    assert (nz["entropy"] <= np.log(nz["n_words"]) + 5.1e-5).all()


def test_closing_batch_ops_survive_empty_input(tmp_path):
    """Empty tables are a real edge case (NOTES): every closing-batch op
    must return an empty result, not crash, on schema-faithful empty
    parquet."""
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "documents", "lineitem", "part", "embeddings",
              "orders", "customer", "supplier", "nation", "region"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.corpus_pmi_top50,
        q.events_user_daily_gapfill,
        q.events_value_ntile,
        q.events_type_user_hll,
        q.doc_sample_weighted,
        q.doc_entropy,
        q.corpus_skipgram_top50,
        q.dedup_normalized,
        q.events_time_to_next,
        q.lineitem_qty_mad,
        q.events_type_value_quantiles,
        q.events_click_purchase_setops,
        q.events_user_dense_rank,
        q.orders_above_customer_avg,
        q.nation_segments,
        q.lineitem_charges_unpivot,
        q.events_click_no_purchase,
        q.doc_unigram_logprob,
        q.token_freq_top100_mg,
        q.part_fuzzy_pairs,
        q.doc_contamination,
        q.events_user_freq_cms,
        q.similarity_topk,
        q.similarity_topk_lsh,
        q.similarity_topk_ivf,
        q.similarity_topk_multi,
        q.orders_by_nation,
        q.profit_by_nation_year,
        q.embedding_pca_top1,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__
    # empty orders = every customer order-less (here: zero customers)
    bloom = q.customers_without_orders_bloom(d).to_pandas()
    assert bloom["n_without_orders"].iloc[0] == 0
    # the count queries return their one summary row (count 0)
    assert q.events_user_count(d).to_pandas()["n_users"].iloc[0] == 0
    assert len(q.events_user_count_hll(d).to_pandas()) == 1
    # BPE's contract is a loud raise when the corpus yields zero pairs
    with pytest.raises(ValueError, match="pairs exhausted"):
        q.corpus_bpe_merges(d)


def test_round4_sixth_batch_queries_match_oracles():
    """Sixth-batch additions (equi-width histogram, IQR outliers, MoM lag,
    RANGE-interval window, latest-record compaction, FK orphan audit, HLL
    audience overlap, int8 scalar quantization) against their registered
    oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "lineitem", "documents", "orders", "part",
              "supplier", "nation", "customer", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_value_hist",
        "events_value_outliers",
        "orders_monthly_mom",
        "events_user_window_1h",
        "events_latest_per_user",
        "fk_orphan_audit",
        "events_audience_overlap_hll",
        "embedding_sq8",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )


def test_sixth_batch_ops_survive_empty_input(tmp_path):
    """Schema-faithful empty parquet must yield empty (or zero-summary)
    results, never a crash, for every sixth-batch op."""
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "documents", "lineitem", "part", "embeddings",
              "orders", "customer", "supplier", "nation", "region"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.events_value_hist,
        q.events_value_outliers,
        q.orders_monthly_mom,
        q.events_user_window_1h,
        q.events_latest_per_user,
        q.fk_orphan_audit,
        q.embedding_sq8,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__
    # the overlap summary returns its one zero row (HLL count-query shape)
    ov = q.events_audience_overlap_hll(d).to_pandas()
    assert len(ov) == 1 and ov["n_exact_intersection"].iloc[0] == 0


def test_hist_bins_cover_all_rows_and_quantization_roundtrip():
    """Structural invariants the oracle replay can't state: histogram bin
    counts must sum to the row count with every bin in [0, nbins); int8
    codes must stay in [-127, 127] and reconstruct within scale/2 per
    component (the quantization error bound)."""
    import pyarrow.parquet as pq

    h = q.events_value_hist(SF).to_pandas()
    n_events = pq.read_metadata(f"{SF}/events.parquet").num_rows
    assert h["n_events"].sum() == n_events
    assert h["bin"].between(0, q.HIST_NBINS - 1).all()
    assert (h["bin_hi"] >= h["bin_lo"]).all()

    sq = q.embedding_sq8(SF).to_pandas()
    assert sq["code_min"].ge(-127).all() and sq["code_max"].le(127).all()
    # reconstruction bound: |x - code*scale| <= scale/2 (+ rounding slack)
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    import numpy as np

    row = emb.iloc[0]
    v = np.asarray(row["embedding"], np.float64)
    scale = float(np.abs(v).max() / 127.0)
    codes = np.floor(v / scale + 0.5)
    assert np.abs(v - codes * scale).max() <= scale / 2 + 1e-12


def test_round4_seventh_batch_queries_match_oracles():
    """Seventh-batch additions (FULL OUTER cogroup, ratio-to-report,
    RANK-with-ties top-k, gaps-and-islands streaks) against their
    registered oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "orders", "customer", "supplier", "nation"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "nation_balance_full_outer",
        "orders_priority_share",
        "events_user_rank_top3",
        "events_user_max_streak",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )


def test_seventh_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "orders", "customer", "supplier", "nation"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.nation_balance_full_outer,
        q.orders_priority_share,
        q.events_user_rank_top3,
        q.events_user_max_streak,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_rank_vs_dense_rank_tie_semantics():
    """rank() consumes slots on ties while dense_rank() does not: on the
    same corpus every rnk from the RANK cut must be >= its dense
    counterpart for the same (type, user), and the RANK result can never
    contain MORE distinct rank values than dense within the k-cut."""
    r = q.events_user_rank_top3(SF).to_pandas()
    d = q.events_user_dense_rank(SF).to_pandas()
    m = r.merge(d, on=["event_type", "user_id", "n_events"],
                suffixes=("_rank", "_dense"))
    assert (m["rnk_rank"] >= m["rnk_dense"]).all()
    # streak sanity: max streak never exceeds active days
    s = q.events_user_max_streak(SF).to_pandas()
    assert (s["max_streak_days"] <= s["n_active_days"]).all()
    assert (s["max_streak_days"] >= 1).all()


def test_fuzzy_blocked_path_matches_broadcast():
    """The PassJoin-style segment-blocking scale path must reproduce the
    broadcast all-pairs sweep exactly on the corpus names."""
    want = _norm(q.part_fuzzy_pairs(SF, route="broadcast").to_pandas())
    got = _norm(q.part_fuzzy_pairs(SF, route="blocked").to_pandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fuzzy_blocked_path_complete_on_planted_edits(tmp_path):
    """Completeness stress: names engineered with substitutions and
    indels at segment boundaries (the positions where a blocking scheme
    with wrong shift bounds loses pairs), plus decoys just past the
    distance cap — the blocked path must equal the brute-force sweep."""
    import itertools
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines.queries import _lev_leq

    base = "abcdefghij"
    names = {base}
    # substitutions / deletions / insertions at every position (covers
    # every segment boundary for k=2's 3-segment grid)
    for i in range(len(base)):
        names.add(base[:i] + "X" + base[i + 1:])          # sub
        names.add(base[:i] + base[i + 1:])                # del
        names.add(base[:i] + "Z" + base[i:])              # ins
    # double edits at far-apart positions (both segments corrupted →
    # must still match via the untouched third segment)
    names.add("Xbcdefghij"[:9] + "Y")
    names.add("abXdefgYij")
    # decoys at distance 3 from base
    names.add("XYZdefghij")
    names.add(base + "XYZ")
    names = sorted(names)
    d = str(tmp_path)
    pq.write_table(
        pa.table({"p_name": pa.array(names, pa.string())}),
        os.path.join(d, "part.parquet"),
    )
    got = _norm(q.part_fuzzy_pairs(d, route="blocked").to_pandas())
    rows = []
    for a, b in itertools.combinations(names, 2):
        dist = _lev_leq(a, b, 2)
        if dist is not None:
            rows.append({"name_a": a, "name_b": b, "dist": dist})
    want = _norm(pd.DataFrame(rows))
    assert len(got) == len(want) and len(want) > 20
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_selfjoin_cms_overestimates_never_under():
    """CMS inner-product join-size bound: est >= exact, always; and the
    oracle replay must agree exactly."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    got = q.events_selfjoin_size_cms(SF).to_pandas()
    assert got["est_selfjoin"].iloc[0] >= got["exact_selfjoin"].iloc[0]
    assert got["rel_overestimate"].iloc[0] >= 0
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = _norm(c.execute(e.oracle_sql()["events_selfjoin_size_cms"]).fetchdf())
    pd.testing.assert_frame_equal(
        _norm(got), want, check_dtype=False, check_exact=False, atol=1e-9,
        rtol=0,
    )
    # empty-input: zero row, no crash
    import tempfile

    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    sch = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "events.parquet"))
    z = q.events_selfjoin_size_cms(d).to_pandas()
    assert z["est_selfjoin"].iloc[0] == 0 and z["exact_selfjoin"].iloc[0] == 0


def test_fk_audit_detects_planted_orphans(tmp_path):
    """The corpus has zero orphans, so plant some: fact rows whose FK is
    missing from the dimension must be counted as orphan rows AND orphan
    keys, exactly."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    orders = pq.read_table(f"{SF}/orders.parquet")
    cust = pq.read_table(f"{SF}/customer.parquet")
    li = pq.read_table(f"{SF}/lineitem.parquet")
    # orphan orders: two custkeys far outside the customer domain,
    # three rows total (2 + 1)
    extra = orders.slice(0, 3).set_column(
        orders.schema.get_field_index("o_custkey"),
        "o_custkey",
        pa.array([99_999_991, 99_999_991, 99_999_992], pa.int64()),
    )
    pq.write_table(pa.concat_tables([orders, extra]), os.path.join(d, "orders.parquet"))
    pq.write_table(cust, os.path.join(d, "customer.parquet"))
    pq.write_table(li, os.path.join(d, "lineitem.parquet"))

    a = q.fk_orphan_audit(d).to_pandas().set_index("relation")
    oc = a.loc["orders->customer"]
    assert oc["n_orphan_rows"] == 3 and oc["n_orphan_keys"] == 2
    assert oc["n_rows"] == orders.num_rows + 3
    # lineitem->orders unaffected except the extra order keys exist now
    lo = a.loc["lineitem->orders"]
    assert lo["n_orphan_rows"] == 0 and lo["n_orphan_keys"] == 0


def test_round4_ninth_batch_queries_match_oracles():
    """ER clustering + Gini skew statistic vs their oracles, plus
    structural invariants (cluster label is a member and the min;
    Gini in [0, 1))."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "part"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("part_name_clusters", "events_user_gini"):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    cl = queries["part_name_clusters"](SF).to_pandas()
    per = cl.groupby("cluster_id")
    assert (per["p_name"].min() == per["p_name"].min().index).all()
    assert (per.size().to_numpy() == per["cluster_size"].first().to_numpy()).all()
    g = queries["events_user_gini"](SF).to_pandas()
    assert 0.0 <= g["gini"].iloc[0] < 1.0


def test_ninth_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "part"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    assert len(q.part_name_clusters(d).to_pandas()) == 0
    assert len(q.events_user_gini(d).to_pandas()) == 0


def test_round4_tenth_batch_queries_match_oracles():
    """KS drift + sliding distinct users vs their oracles, plus
    invariants: KS in [0, 1]; window distinct <= global distinct and >=
    the max tumbling-bucket distinct it covers."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("events_value_ks_drift", "events_sliding_distinct_users"):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    ks = queries["events_value_ks_drift"](SF).to_pandas()
    assert 0.0 <= ks["ks"].iloc[0] <= 1.0
    sd = queries["events_sliding_distinct_users"](SF).to_pandas()
    n_total = int(
        c.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    )
    assert (sd["n_users"] <= n_total).all() and (sd["n_users"] >= 1).all()


def test_tenth_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "events.parquet"))
    assert len(q.events_value_ks_drift(d).to_pandas()) == 0
    assert len(q.events_sliding_distinct_users(d).to_pandas()) == 0


def test_round4_eleventh_batch_queries_match_oracles():
    """Session conversion + table fingerprint vs their oracles, with
    invariants: converted <= sessions; fingerprint is order-independent
    (identical on a shuffled copy) and changes when a row changes."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("events_session_conversion", "events_table_fingerprint"):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    sc = queries["events_session_conversion"](SF).to_pandas()
    assert (sc["n_converted"] <= sc["n_sessions"]).all()


def test_table_fingerprint_order_independent_and_sensitive(tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    base = q.events_table_fingerprint(SF).to_pandas()
    d1 = str(tmp_path / "shuffled")
    os.makedirs(d1)
    t = pq.read_table(f"{SF}/events.parquet")
    idx = pa.array(list(reversed(range(t.num_rows))))
    pq.write_table(t.take(idx), os.path.join(d1, "events.parquet"))
    shuf = q.events_table_fingerprint(d1).to_pandas()
    assert shuf["fingerprint"].iloc[0] == base["fingerprint"].iloc[0]

    d2 = str(tmp_path / "mutated")
    os.makedirs(d2)
    mut = t.set_column(
        t.schema.get_field_index("user_id"),
        "user_id",
        pc.add(t["user_id"], pa.scalar(0, pa.int64())).combine_chunks(),
    )
    first = pa.array(
        [int(t["user_id"][0].as_py()) + 1]
        + t["user_id"].to_pylist()[1:],
        pa.int64(),
    )
    mut = t.set_column(t.schema.get_field_index("user_id"), "user_id", first)
    pq.write_table(mut, os.path.join(d2, "events.parquet"))
    m = q.events_table_fingerprint(d2).to_pandas()
    assert m["fingerprint"].iloc[0] != base["fingerprint"].iloc[0]


def test_round4_twelfth_batch_queries_match_oracles():
    """Chi-square independence, cohort retention, max drawdown, and
    integer-exact OLS trend vs their oracles, plus structural invariants
    (contrib >= 0 and cell counts sum to n; cohort offsets >= 0 and no
    offset exceeds its cohort size; 0 <= drawdown <= peak; OLS group
    sizes sum to the event count)."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_type_dow_chi2",
        "events_cohort_retention",
        "events_user_max_drawdown",
        "events_value_trend_ols",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    n_events = int(c.execute("SELECT count(*) FROM events").fetchone()[0])
    chi = queries["events_type_dow_chi2"](SF).to_pandas()
    assert int(chi["observed"].sum()) == n_events
    assert (chi["contrib"] >= 0).all() and (chi["expected"] > 0).all()
    co = queries["events_cohort_retention"](SF).to_pandas()
    assert (co["week_offset"] >= 0).all()
    size0 = co[co["week_offset"] == 0].set_index("cohort_week")["n_active"]
    for _, r in co.iterrows():
        assert r["n_active"] <= size0[r["cohort_week"]]
    dd = queries["events_user_max_drawdown"](SF).to_pandas()
    assert (dd["max_drawdown"] >= 0).all()
    assert (dd["max_drawdown"] <= dd["peak_value"]).all()
    ols = queries["events_value_trend_ols"](SF).to_pandas()
    assert int(ols["n_rows"].sum()) == n_events


def test_twelfth_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "events.parquet"))
    assert len(q.events_type_dow_chi2(d).to_pandas()) == 0
    assert len(q.events_cohort_retention(d).to_pandas()) == 0
    assert len(q.events_user_max_drawdown(d).to_pandas()) == 0
    assert len(q.events_value_trend_ols(d).to_pandas()) == 0


def _planted_events(tmp_path, rows):
    """Write a schema-faithful events parquet from (event_id, ts_iso,
    user_id, event_type, value) tuples."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


def test_cohort_dimension_with_staggered_starts(tmp_path):
    """The corpus has every user starting in week one (single cohort), so
    plant staggered first-activity weeks to prove the cohort dimension:
    u1 starts week0 and returns week1+week2; u2 starts week1 and returns
    week2; u3 starts week2 only."""
    d = _planted_events(
        tmp_path,
        [
            (1, "2024-01-01T10:00:00", 1, "click", 1.0),
            (2, "2024-01-08T10:00:00", 1, "click", 1.0),
            (3, "2024-01-17T10:00:00", 1, "click", 1.0),
            (4, "2024-01-09T10:00:00", 2, "click", 1.0),
            (5, "2024-01-19T10:00:00", 2, "click", 1.0),
            (6, "2024-01-20T09:00:00", 2, "click", 1.0),
            (7, "2024-01-21T10:00:00", 3, "click", 1.0),
        ],
    )
    co = q.events_cohort_retention(d).to_pandas()
    got = {
        (str(r["cohort_week"])[:10], int(r["week_offset"])): int(r["n_active"])
        for _, r in co.iterrows()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
        ("2024-01-15", 0): 1,
    }


def test_drawdown_on_planted_path(tmp_path):
    """max(value) - min(value) overstates the drawdown when the minimum
    precedes the peak — the planted path [5, 1, 10, 4] has range 9 but
    true max drawdown 6 (10 -> 4); order must follow (ts, event_id)."""
    d = _planted_events(
        tmp_path,
        [
            (1, "2024-01-01T00:00:00", 7, "click", 5.0),
            (2, "2024-01-01T00:01:00", 7, "click", 1.0),
            (3, "2024-01-01T00:02:00", 7, "click", 10.0),
            (4, "2024-01-01T00:03:00", 7, "click", 4.0),
        ],
    )
    dd = q.events_user_max_drawdown(d).to_pandas()
    assert len(dd) == 1
    assert dd["peak_value"].iloc[0] == 10.0
    assert dd["max_drawdown"].iloc[0] == 6.0
    assert dd["n_events"].iloc[0] == 4


def test_round4_thirteenth_batch_queries_match_oracles():
    """A/B z-test, session path mining, and burst detection vs their
    oracles, plus invariants: arm sizes partition the user set and the
    z sign agrees with the rate difference; every path has <= 5 steps;
    bursts are >= 1 and never exceed the user's event count."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_ab_conversion_ztest",
        "events_session_paths_top20",
        "events_user_burst_max",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    n_users = int(
        c.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    )
    z = queries["events_ab_conversion_ztest"](SF).to_pandas()
    assert int(z["n_users_a"].iloc[0] + z["n_users_b"].iloc[0]) == n_users
    if pd.notna(z["z_stat"].iloc[0]):
        diff = z["rate_a"].iloc[0] - z["rate_b"].iloc[0]
        assert (z["z_stat"].iloc[0] >= 0) == (diff >= 0)
    p = queries["events_session_paths_top20"](SF).to_pandas()
    assert (p["path"].str.count(">") <= 4).all() and (p["n"] >= 1).all()
    b = queries["events_user_burst_max"](SF).to_pandas()
    assert (b["burst_5min"] >= 1).all()
    assert (b["burst_5min"] <= b["n_events"]).all()


def test_thirteenth_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "events.parquet"))
    assert len(q.events_ab_conversion_ztest(d).to_pandas()) == 0
    assert len(q.events_session_paths_top20(d).to_pandas()) == 0
    assert len(q.events_user_burst_max(d).to_pandas()) == 0


def test_burst_window_is_value_anchored(tmp_path):
    """The 5-minute burst frame is anchored at each event's timestamp and
    inclusive of the boundary: four events at 0/4/5/11 minutes give a
    max window of 3 (0 -> [0,4,5]); an event at exactly +5min counts."""
    d = _planted_events(
        tmp_path,
        [
            (1, "2024-01-01T00:00:00", 9, "click", 1.0),
            (2, "2024-01-01T00:04:00", 9, "click", 1.0),
            (3, "2024-01-01T00:05:00", 9, "click", 1.0),
            (4, "2024-01-01T00:11:00", 9, "click", 1.0),
        ],
    )
    b = q.events_user_burst_max(d).to_pandas()
    assert int(b["burst_5min"].iloc[0]) == 3
    assert str(b["burst_start_ts"].iloc[0]) == "2024-01-01 00:00:00"


def test_session_paths_truncate_and_split_sessions(tmp_path):
    """Paths cut at 5 steps and a >30-min gap starts a new session: seven
    rapid-fire events then a later pair yield '5-step prefix' and a
    2-step path."""
    rows = [
        (i, f"2024-01-01T00:0{i}:00", 4, ty, 1.0)
        for i, ty in enumerate(
            ["a", "b", "c", "d", "e", "f", "g"]
        )
    ] + [
        (10, "2024-01-01T02:00:00", 4, "x", 1.0),
        (11, "2024-01-01T02:10:00", 4, "y", 1.0),
    ]
    d = _planted_events(tmp_path, rows)
    p = q.events_session_paths_top20(d).to_pandas()
    got = set(p["path"])
    assert got == {"a>b>c>d>e", "x>y"}


def test_round4_fourteenth_batch_queries_match_oracles():
    """Rolling z-score, time-weighted average, and LOCF hourly resample
    vs their oracles, plus invariants: window means stay inside the
    user's value range; TWA lies in [min, max] value for multi-event
    users; the LOCF grid is contiguous per user."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_rolling_zscore",
        "events_user_twa",
        "events_user_hourly_locf",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    lim = c.execute("SELECT min(value), max(value) FROM events").fetchone()
    rz = queries["events_rolling_zscore"](SF).to_pandas()
    assert rz["roll_mean"].between(lim[0] - 0.01, lim[1] + 0.01).all()
    tw = queries["events_user_twa"](SF).to_pandas()
    multi = tw[tw["span_us"] > 0]
    assert multi["twa_value"].between(lim[0] - 0.01, lim[1] + 0.01).all()
    lc = queries["events_user_hourly_locf"](SF).to_pandas()
    per = lc.groupby("user_id")["hour"]
    spans = (per.max() - per.min()).dt.total_seconds() / 3600 + 1
    assert (per.count().to_numpy() == spans.to_numpy()).all()


def test_fourteenth_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "events.parquet"))
    assert len(q.events_rolling_zscore(d).to_pandas()) == 0
    assert len(q.events_user_twa(d).to_pandas()) == 0
    assert len(q.events_user_hourly_locf(d).to_pandas()) == 0


def test_locf_carries_values_across_empty_hours(tmp_path):
    """Hours with no events repeat the last seen value; hours with
    multiple events sample the LAST one by (ts, event_id)."""
    d = _planted_events(
        tmp_path,
        [
            (1, "2024-01-01T00:10:00", 5, "click", 7.0),
            (2, "2024-01-01T00:50:00", 5, "click", 9.0),
            (3, "2024-01-01T03:30:00", 5, "click", 2.0),
        ],
    )
    lc = q.events_user_hourly_locf(d).to_pandas().sort_values("hour")
    assert list(lc["locf_value"]) == [9.0, 9.0, 9.0, 2.0]


def test_twa_weights_by_holding_time(tmp_path):
    """A value held 3x as long weighs 3x: values 10 (3h) then 40 (1h)
    give TWA = (10*3 + 40*1) / 4 = 17.5 — the plain mean (25 over the
    two rows, or any count weighting) would misstate it."""
    d = _planted_events(
        tmp_path,
        [
            (1, "2024-01-01T00:00:00", 6, "click", 10.0),
            (2, "2024-01-01T03:00:00", 6, "click", 40.0),
            (3, "2024-01-01T04:00:00", 6, "click", 0.0),
        ],
    )
    tw = q.events_user_twa(d).to_pandas()
    assert tw["twa_value"].iloc[0] == 17.5


def test_round4_fifteenth_batch_queries_match_oracles():
    """Market-basket lift, diversified top-k, and PSI drift vs their
    oracles, plus invariants: lift pairs are ordered (a < b) and meet
    the support floor; no customer exceeds the quota of 2 and the list
    is price-sorted; PSI bin counts reconcile with the slice totals."""
    import os

    import numpy as np

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "part", "lineitem", "orders"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "basket_brand_lift_top20",
        "orders_top20_diversified",
        "events_value_psi",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    bl = queries["basket_brand_lift_top20"](SF).to_pandas()
    assert (bl["brand_a"] < bl["brand_b"]).all()
    assert (bl["n_ab"] >= q.BASKET_MIN_PAIR_ORDERS).all()
    dv = queries["orders_top20_diversified"](SF).to_pandas()
    assert dv["o_custkey"].value_counts().max() <= 2
    assert (dv["o_totalprice"].to_numpy()
            == np.sort(dv["o_totalprice"].to_numpy())[::-1]).all()
    psi = queries["events_value_psi"](SF).to_pandas()
    na = int(
        c.execute(
            "SELECT count(*) FROM events WHERE event_type = 'click'"
        ).fetchone()[0]
    )
    assert int(psi["n_click"].sum()) == na


def test_fifteenth_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "part", "lineitem", "orders"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    assert len(q.basket_brand_lift_top20(d).to_pandas()) == 0
    assert len(q.orders_top20_diversified(d).to_pandas()) == 0
    assert len(q.events_value_psi(d).to_pandas()) == 0


def test_diversified_topk_quota_binds_on_planted_whale(tmp_path):
    """A whale customer owning the 5 highest-priced orders must surface
    only twice; the freed slots go to the next customers down."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    rows = [(i, 1, 1000.0 - i) for i in range(5)]  # whale custkey=1
    rows += [(10 + i, 2 + i, 500.0 - i) for i in range(25)]
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [np.datetime64("2024-01-01", "us")] * len(rows),
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "orders.parquet"))
    dv = q.orders_top20_diversified(d).to_pandas()
    assert len(dv) == 20
    assert (dv["o_custkey"] == 1).sum() == 2
    assert set(dv[dv["o_custkey"] == 1]["o_orderkey"]) == {0, 1}


def test_round4_sixteenth_batch_queries_match_oracles():
    """RFM segmentation, SCD2 intervals, and Benford audit vs their
    oracles, plus invariants: scores are 1-4 and segment counts sum to
    the user count; SCD2 n_events reconciles with the event count and
    every digit row is 1-9 with counts summing to the nonzero-cents
    total."""
    import os

    import numpy as np

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_user_rfm_segments",
        "events_user_scd2",
        "events_value_benford",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    rfm = queries["events_user_rfm_segments"](SF).to_pandas()
    for col in ("r_score", "f_score", "m_score"):
        assert rfm[col].between(1, 4).all()
    n_users = int(
        c.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    )
    assert int(rfm["n_users"].sum()) == n_users
    scd = queries["events_user_scd2"](SF).to_pandas()
    n_events = int(c.execute("SELECT count(*) FROM events").fetchone()[0])
    assert int(scd["n_events"].sum()) == n_events
    assert scd.groupby("user_id")["valid_to"].apply(
        lambda s: s.isna().sum()
    ).eq(1).all()  # exactly one open (current) interval per user
    ben = queries["events_value_benford"](SF).to_pandas()
    assert ben["digit"].between(1, 9).all()
    nz = int(
        c.execute(
            "SELECT count(*) FROM events"
            " WHERE abs(CAST(round(value * 100) AS BIGINT)) > 0"
        ).fetchone()[0]
    )
    assert int(ben["n"].sum()) == nz
    np.testing.assert_allclose(float(ben["obs_share"].sum()), 1.0, atol=5e-4)


def test_sixteenth_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "events.parquet"))
    assert len(q.events_user_rfm_segments(d).to_pandas()) == 0
    assert len(q.events_user_scd2(d).to_pandas()) == 0
    assert len(q.events_value_benford(d).to_pandas()) == 0


def test_scd2_planted_run_structure(tmp_path):
    """A planted A,A,B,A stream must yield exactly three intervals with
    the right boundaries, the middle ones closed by the NEXT run's start,
    and the last left open (NULL valid_to)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    ts = [np.datetime64("2024-01-01T00:00:00", "us") + np.timedelta64(i, "m")
          for i in range(4)]
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7, 7], pa.int64()),
            "event_type": pa.array(["A", "A", "B", "A"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    scd = (
        q.events_user_scd2(d)
        .to_pandas()
        .sort_values("valid_from")
        .reset_index(drop=True)
    )
    assert list(scd["event_type"]) == ["A", "B", "A"]
    assert list(scd["n_events"]) == [2, 1, 1]
    assert scd["valid_to"].iloc[0] == scd["valid_from"].iloc[1]
    assert scd["valid_to"].iloc[1] == scd["valid_from"].iloc[2]
    assert pd.isna(scd["valid_to"].iloc[2])


def test_round4_seventeenth_batch_queries_match_oracles():
    """Fulfillment lag, duplicate-payment screening, and hourly MASE vs
    their oracles, plus invariants: priority groups cover exactly the
    orders that have lineitems; every flagged user has n_flagged >= 2
    (a flag always has a same-user partner within the window); MASE
    emits one row per event type."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "orders", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "orders_fulfillment_lag",
        "events_duplicate_payments",
        "events_hourly_mase",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    fl = queries["orders_fulfillment_lag"](SF).to_pandas()
    n_with_li = int(
        c.execute(
            "SELECT count(DISTINCT o_orderkey) FROM orders"
            " WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)"
        ).fetchone()[0]
    )
    assert int(fl["n_orders"].sum()) == n_with_li
    dp = queries["events_duplicate_payments"](SF).to_pandas()
    assert len(dp) > 0  # non-vacuous at the gate scale
    assert (dp["n_flagged"] >= 2).all()  # a flag always has a partner
    ms = queries["events_hourly_mase"](SF).to_pandas()
    n_types = int(
        c.execute("SELECT count(DISTINCT event_type) FROM events").fetchone()[0]
    )
    assert len(ms) == n_types


def test_seventeenth_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "orders", "lineitem"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    assert len(q.orders_fulfillment_lag(d).to_pandas()) == 0
    assert len(q.events_duplicate_payments(d).to_pandas()) == 0
    assert len(q.events_hourly_mase(d).to_pandas()) == 0


def test_duplicate_payments_planted_pair(tmp_path):
    """Two same-dollar purchases 1 min apart flag both events; a third
    same-dollar purchase 48 h away and a different-amount neighbor stay
    unflagged."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    base = np.datetime64("2024-03-01T12:00:00", "us")
    rows = [
        (0, base, 5, "purchase", 49.99),                        # pair A
        (1, base + np.timedelta64(60, "s"), 5, "purchase", 50.01),  # pair A (same rounded $50)
        (2, base + np.timedelta64(48, "h"), 5, "purchase", 50.0),   # outside window
        (3, base + np.timedelta64(30, "s"), 5, "purchase", 75.0),   # different amount
        (4, base, 9, "purchase", 50.0),                         # other user, alone
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    dp = q.events_duplicate_payments(d).to_pandas()
    assert len(dp) == 1
    assert int(dp["user_id"].iloc[0]) == 5
    assert int(dp["n_flagged"].iloc[0]) == 2


def test_round4_eighteenth_batch_queries_match_oracles():
    """Lag-24 ACF, changepoint, and quality-rules audit vs their oracles,
    plus invariants: |acf| <= 1; the split means differ by at least the
    scaled gap implied amount (gap > 0 when means differ); rule shares
    lie in [0, 1] and the error_event count equals the error row count."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_hourly_acf24",
        "events_hourly_changepoint",
        "events_quality_audit",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    acf = queries["events_hourly_acf24"](SF).to_pandas()
    assert acf["acf24"].dropna().abs().le(1.0).all()
    cp = queries["events_hourly_changepoint"](SF).to_pandas()
    assert (cp["gap_stat"] >= 0).all()
    qa = queries["events_quality_audit"](SF).to_pandas()
    assert qa["share"].between(0.0, 1.0).all()
    n_err = int(
        c.execute(
            "SELECT count(*) FROM events WHERE event_type = 'error'"
        ).fetchone()[0]
    )
    assert (
        int(qa.set_index("rule").loc["error_event", "n_violations"]) == n_err
    )


def test_eighteenth_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "events.parquet"))
    assert len(q.events_hourly_acf24(d).to_pandas()) == 0
    assert len(q.events_hourly_changepoint(d).to_pandas()) == 0
    assert len(q.events_quality_audit(d).to_pandas()) == 0


def test_changepoint_finds_planted_level_shift(tmp_path):
    """A series that jumps from 2/hour to 20/hour at a known hour must
    place the split exactly at the jump."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    base = np.datetime64("2024-05-01T00:00:00", "us")
    rows = []
    eid = 0
    for h in range(48):
        per = 2 if h < 24 else 20
        for j in range(per):
            rows.append(
                (eid, base + np.timedelta64(h, "h") + np.timedelta64(j, "m"))
            )
            eid += 1
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    cp = q.events_hourly_changepoint(d).to_pandas()
    h0 = int(base.astype("datetime64[h]").astype(int))
    assert int(cp["split_h"].iloc[0]) == h0 + 24
    assert float(cp["mean_left"].iloc[0]) == 2.0
    assert float(cp["mean_right"].iloc[0]) == 20.0
    acf = q.events_hourly_acf24(d).to_pandas()
    assert int(acf["n_pairs"].iloc[0]) == 24


def test_round4_nineteenth_batch_queries_match_oracles():
    """LTV curve, purchase survival, and per-doc keywords vs their
    oracles, plus invariants: cum_cents is nondecreasing and week 0
    covers every user; survival counts are nonincreasing in the ordinal;
    every doc gets at most 3 keyword rows and tf/df are positive."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_ltv_weekly",
        "events_purchase_survival",
        "doc_top_terms",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    ltv = (
        queries["events_ltv_weekly"](SF)
        .to_pandas()
        .sort_values("week_since")
    )
    assert (ltv["cum_cents"].diff().dropna() >= 0).all()
    n_users = int(
        c.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    )
    assert int(ltv["n_users_active"].iloc[0]) == n_users  # week 0 = everyone
    sv = (
        queries["events_purchase_survival"](SF)
        .to_pandas()
        .sort_values("n_purchases")
    )
    assert (sv["n_users"].diff().dropna() <= 0).all()
    tt = queries["doc_top_terms"](SF).to_pandas()
    assert tt.groupby("doc_id").size().le(3).all()
    assert (tt["tf"] > 0).all() and (tt["df"] > 0).all()


def test_nineteenth_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "documents"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    assert len(q.events_ltv_weekly(d).to_pandas()) == 0
    assert len(q.events_purchase_survival(d).to_pandas()) == 0
    assert len(q.doc_top_terms(d).to_pandas()) == 0


def test_ltv_weekly_planted_two_users(tmp_path):
    """Two users with different start weeks: week_since realigns each to
    their own signup, and the average divides by BOTH users even in
    weeks where only one is active."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    base = np.datetime64("2024-02-01T00:00:00", "us")
    wk = np.timedelta64(7, "D")
    rows = [
        (0, base, 1, 10.0),              # u1 week 0
        (1, base + wk, 1, 20.0),         # u1 week 1
        (2, base + 3 * wk, 2, 40.0),     # u2 week 0 (starts 3 wks later)
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["purchase"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    ltv = (
        q.events_ltv_weekly(d).to_pandas().set_index("week_since")
    )
    assert int(ltv.loc[0, "n_users_active"]) == 2   # both week-0 aligned
    assert int(ltv.loc[0, "week_cents"]) == 5000    # 10.00 + 40.00
    assert int(ltv.loc[1, "week_cents"]) == 2000
    assert float(ltv.loc[1, "avg_cum_ltv"]) == 35.0  # 70.00 / 2 users


def test_round4_twentieth_batch_queries_match_oracles():
    """Adoption, calibration, and per-source top terms vs their oracles,
    plus invariants: new adopters never exceed adopters; calibration
    bins reconcile to the event count and pos counts to the purchase
    count; each source gets at most 3 term rows."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_new_behavior_adoption",
        "events_calibration_curve",
        "corpus_top_terms_by_source",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    ad = queries["events_new_behavior_adoption"](SF).to_pandas()
    assert (ad["n_new_adopters"] <= ad["n_adopters"]).all()
    cal = queries["events_calibration_curve"](SF).to_pandas()
    n_ev = int(c.execute("SELECT count(*) FROM events").fetchone()[0])
    n_pos = int(
        c.execute(
            "SELECT count(*) FROM events WHERE event_type = 'purchase'"
        ).fetchone()[0]
    )
    assert int(cal["n"].sum()) == n_ev
    assert int(cal["n_pos"].sum()) == n_pos
    tt = queries["corpus_top_terms_by_source"](SF).to_pandas()
    assert tt.groupby("source").size().le(3).all()


def test_twentieth_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "documents"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    assert len(q.events_new_behavior_adoption(d).to_pandas()) == 0
    assert len(q.events_calibration_curve(d).to_pandas()) == 0
    assert len(q.corpus_top_terms_by_source(d).to_pandas()) == 0


def test_round4_twentyfirst_batch_queries_match_oracles():
    """Pareto concentration, DAU/WAU stickiness, and order-gap histogram
    vs their oracles, plus invariants: shares are monotone in the cut
    (top 10% >= top 5% >= top 1%); stickiness in (0, 1] and WAU >= DAU;
    gap counts reconcile with orders minus first-order-per-customer."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "orders"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_power_users_pareto",
        "events_dau_wau_stickiness",
        "orders_order_gap_days",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    pr = (
        queries["events_power_users_pareto"](SF)
        .to_pandas()
        .sort_values("top_pct")
    )
    assert (pr["event_share"].diff().dropna() >= 0).all()
    st = queries["events_dau_wau_stickiness"](SF).to_pandas()
    assert (st["wau"] >= st["dau"]).all()
    assert st["stickiness"].between(0.0, 1.0).all()
    gp = queries["orders_order_gap_days"](SF).to_pandas()
    n_orders = int(c.execute("SELECT count(*) FROM orders").fetchone()[0])
    n_cust = int(
        c.execute("SELECT count(DISTINCT o_custkey) FROM orders").fetchone()[0]
    )
    assert int(gp["n"].sum()) == n_orders - n_cust


def test_twentyfirst_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "orders"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    assert len(q.events_power_users_pareto(d).to_pandas()) == 0
    assert len(q.events_dau_wau_stickiness(d).to_pandas()) == 0
    assert len(q.orders_order_gap_days(d).to_pandas()) == 0


def test_pareto_planted_whale_dominates(tmp_path):
    """100 users: one whale with 901 events, 99 with 1 each. The top-1%
    cut (exactly the whale) must report share 0.901."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    uids = [1] * 901 + list(range(2, 101))
    n = len(uids)
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [np.datetime64("2024-01-01T00:00:00", "us")] * n,
                pa.timestamp("us"),
            ),
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    pr = q.events_power_users_pareto(d).to_pandas().set_index("top_pct")
    assert int(pr.loc[0.01, "n_top_users"]) == 1
    assert float(pr.loc[0.01, "event_share"]) == 0.901


def test_round4_twentysecond_batch_queries_match_oracles():
    """ABC classification, supplier scorecard, and SPC p-chart vs their
    oracles, plus invariants: ABC counts partition the parts-with-sales
    census and shares sum to 1; the scorecard is the revenue top-10 with
    every metric positive; p-chart flags agree with rate > UCL row-wise."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("lineitem", "supplier", "nation", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "part_abc_classification",
        "supplier_scorecard",
        "events_error_rate_control",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    abc = queries["part_abc_classification"](SF).to_pandas()
    n_parts_sold = int(
        c.execute("SELECT count(DISTINCT l_partkey) FROM lineitem").fetchone()[0]
    )
    assert int(abc["n_parts"].sum()) == n_parts_sold
    assert abs(float(abc["rev_share"].sum()) - 1.0) < 5e-4
    sc = queries["supplier_scorecard"](SF).to_pandas()
    assert len(sc) <= 10
    assert (sc["revenue"].diff().dropna() <= 0).all()  # rev DESC order
    assert (sc[["revenue", "n_items", "n_parts"]] > 0).all().all()
    assert (sc["n_parts"] <= sc["n_items"]).all()
    pch = queries["events_error_rate_control"](SF).to_pandas()
    assert ((pch["err_rate"] > pch["ucl"]) == (pch["out_of_control"] == 1)).all()
    assert int(pch["n"].sum()) == int(
        c.execute("SELECT count(*) FROM events").fetchone()[0]
    )


def test_twentysecond_batch_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("lineitem", "supplier", "nation", "events"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    assert len(q.part_abc_classification(d).to_pandas()) == 0
    assert len(q.supplier_scorecard(d).to_pandas()) == 0
    assert len(q.events_error_rate_control(d).to_pandas()) == 0


def test_abc_planted_boundary_classes(tmp_path):
    """Five parts with revenues 60/20/10/6/4 (total 100): inclusive-cum
    classes are A={60,20} (cum 80 <= 80), B={10,6} (90, 96... 96 > 95 →
    only 10 with cum 90 <= 95), so A=2, B=1, C=2 and shares .8/.1/.1."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    revs = [60.0, 20.0, 10.0, 6.0, 4.0]
    n = len(revs)
    t = pa.table(
        {
            "l_orderkey": pa.array(range(n), pa.int64()),
            "l_partkey": pa.array(range(1, n + 1), pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array([1] * n, pa.int64()),
            "l_quantity": pa.array([1.0] * n, pa.float64()),
            "l_extendedprice": pa.array(revs, pa.float64()),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array(
                [np.datetime64("2024-01-01", "us")] * n, pa.timestamp("us")
            ),
        }
    )
    pq.write_table(t, os.path.join(d, "lineitem.parquet"))
    abc = (
        q.part_abc_classification(d)
        .to_pandas()
        .set_index("abc_class")
    )
    assert int(abc.loc["A", "n_parts"]) == 2
    assert int(abc.loc["B", "n_parts"]) == 1
    assert int(abc.loc["C", "n_parts"]) == 2
    assert float(abc.loc["A", "rev_share"]) == 0.8
    assert float(abc.loc["B", "rev_share"]) == 0.1
    assert float(abc.loc["C", "rev_share"]) == 0.1


def test_batch23_queries_match_oracles():
    """Batch-23 additions (BM25 top-k ranking, TPC-H Q3 shipping priority,
    sweep-line peak session concurrency) against their registered oracles
    at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "documents", "orders", "customer", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "doc_bm25_topk",
        "orders_shipping_priority_q3",
        "events_concurrent_sessions",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )


def test_batch23_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "documents", "orders", "customer", "lineitem"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.doc_bm25_topk,
        q.orders_shipping_priority_q3,
        q.events_concurrent_sessions,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_bm25_monotonicity_and_sweep_line_bound():
    """Structural invariants: every BM25 winner must actually contain a
    query term (tf > 0 somewhere); the peak concurrency is positive and
    bounded by the total session count, and its timestamp is a session
    start (+1 boundaries are the only way the running count increases)."""
    import pyarrow.parquet as pq

    top = q.doc_bm25_topk(SF).to_pandas()
    assert len(top) == q.BM25_K
    assert (top["bm25"] > 0).all()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    texts = docs.set_index("doc_id")["text"]
    for did in top["doc_id"]:
        assert any(t in texts[did] for t in q.BM25_TERMS), did

    peak = q.events_concurrent_sessions(SF).to_pandas()
    n_sessions = len(q.events_sessions(SF).to_pandas())
    p = int(peak["peak_concurrency"].iloc[0])
    assert 1 <= p <= n_sessions
    starts = set(
        q.events_sessions(SF)
        .to_pandas()["start_ts"]
        .astype("datetime64[us]")
        .astype("int64")
    )
    assert int(peak["peak_ts_us"].iloc[0]) in starts

def test_batch24_queries_match_oracles():
    """Batch-24 additions (sequence packing into 4096-token bins, TPC-H Q5
    local-supplier revenue, behavioral-entropy top-k) against their
    registered oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in (
        "events",
        "documents",
        "orders",
        "customer",
        "lineitem",
        "supplier",
        "nation",
        "region",
    ):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "doc_pack_bins",
        "revenue_by_nation_q5",
        "events_user_entropy_topk",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )


def test_batch24_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in (
        "events",
        "documents",
        "orders",
        "customer",
        "lineitem",
        "supplier",
        "nation",
        "region",
    ):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.doc_pack_bins,
        q.revenue_by_nation_q5,
        q.events_user_entropy_topk,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_pack_bins_conservation_and_entropy_bounds():
    """Structural invariants: packing conserves every document and every
    token (bin sums equal corpus totals) over contiguous bin ids; entropy
    is within [0, ln(5)] and the top-k cut is sorted descending."""
    import numpy as np
    import pyarrow.parquet as pq

    bins = q.doc_pack_bins(SF).to_pandas().sort_values("bin")
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    n_tok = sum(
        len(q._TOKEN_RE.findall(t or "")) for t in docs["text"].to_pylist()
    )
    assert int(bins["n_docs"].sum()) == docs.num_rows
    assert int(bins["total_tokens"].sum()) == n_tok
    b = bins["bin"].to_numpy()
    assert b[0] == 0 and (np.diff(b) == 1).all()

    ent = q.events_user_entropy_topk(SF).to_pandas()
    assert len(ent) == q.ENTROPY_K
    e = ent["entropy"].to_numpy()
    assert (e >= 0).all() and (e <= np.log(5) + 1e-9).all()
    assert (np.diff(e) <= 0).all()


def test_batch25_queries_match_oracles():
    """Batch-25 additions (TPC-H Q14 promo share, TPC-H Q18 large-volume
    orders, event-type Markov stationary distribution) against their
    registered oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "lineitem", "orders", "part"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "lineitem_promo_share_q14",
        "orders_large_volume_q18",
        "events_markov_stationary",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )


def test_batch25_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "lineitem", "orders", "part"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.lineitem_promo_share_q14,
        q.orders_large_volume_q18,
        q.events_markov_stationary,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_markov_stationary_is_a_distribution_and_q18_threshold_binds():
    """Structural invariants: the stationary vector is a probability
    distribution (non-negative, sums to 1 within rounding slack) over the
    closed type set; every Q18 winner clears the 300-unit threshold and
    the cut is (qty DESC, orderkey ASC)-ordered."""
    import numpy as np

    st = q.events_markov_stationary(SF).to_pandas()
    assert list(st["event_type"]) == sorted(st["event_type"])
    v = st["stationary"].to_numpy()
    assert (v >= 0).all()
    assert abs(v.sum() - 1.0) < 5e-4  # 5 values rounded to 4 decimals

    big = q.orders_large_volume_q18(SF).to_pandas()
    assert len(big) <= q.Q18_K
    tq = big["total_qty"].to_numpy()
    assert (tq > 300).all()
    assert (np.diff(tq) <= 0).all()


def test_batch26_queries_match_oracles():
    """Batch-26 additions (Flesch-style readability, near-dup cluster
    sizes over the Jaccard pair graph, KG degree assortativity) against
    their registered oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "doc_readability",
        "doc_jaccard_clusters",
        "kg_assortativity",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )


def test_batch26_doc_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/documents.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "documents.parquet"))
    for fn in (q.doc_readability, q.doc_jaccard_clusters):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_batch27_queries_match_oracles():
    """Batch-27 additions (Dunning G² keyness, TPC-H Q10 returned-item
    revenue, KG edge reciprocity) against their registered oracles at
    fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("documents", "customer", "orders", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "corpus_keyness_g2",
        "orders_returned_q10",
        "kg_edge_reciprocity",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )


def test_batch27_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("documents", "customer", "orders", "lineitem"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (q.corpus_keyness_g2, q.orders_returned_q10):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_batch28_queries_match_oracles():
    """Batch-28 additions (hourly EWMA smoothing, TPC-H Q7 two-nation
    volume, first-occurrence shingle novelty) against their registered
    oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in (
        "events",
        "documents",
        "orders",
        "customer",
        "lineitem",
        "supplier",
        "nation",
    ):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_hourly_ewma",
        "revenue_two_nation_q7",
        "doc_shingle_novelty",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0,
            obj=name,
        )


def test_batch28_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in (
        "events",
        "documents",
        "orders",
        "customer",
        "lineitem",
        "supplier",
        "nation",
    ):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.events_hourly_ewma,
        q.revenue_two_nation_q7,
        q.doc_shingle_novelty,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_ewma_recurrence_and_novelty_bounds():
    """Structural invariants: the EWMA replays the recurrence exactly on
    the collected hourly census; novelty is in (0, 1] and every doc's
    novel count is bounded by its shingle count."""
    import numpy as np

    ew = q.events_hourly_ewma(SF).to_pandas().sort_values("hour")
    ns = ew["n_events"].to_numpy()
    s = float(ns[0])
    for i in range(1, len(ns)):
        s = 0.3 * ns[i] + 0.7 * s
    assert ew["ewma"].iloc[-1] == float(q.round_half_away(s, 4))
    assert ew["ewma"].iloc[0] == float(ns[0])

    nov = q.doc_shingle_novelty(SF).to_pandas()
    assert (nov["n_novel"] <= nov["n_shingles"]).all()
    assert (nov["novelty"] > 0).sum() > 0
    assert (nov["novelty"] <= 1.0).all()


def test_batch29_queries_match_oracles():
    """Batch-29 additions (SemDedup keep flags, TPC-H Q13 custdist)
    against their registered oracles at fixture scale (kg_twohop_reach is
    exercised in test_graph_analytics + the gate replica — it needs the
    transcripts corpus, not the sf tables)."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("embeddings", "customer", "orders"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("embedding_semdedup", "orders_custdist_q13"):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch29_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("embeddings", "customer", "orders"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (q.embedding_semdedup, q.orders_custdist_q13):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_semdedup_invariants():
    """Structural invariants independent of the oracle: the smallest
    vec_id of every cluster is always kept, keep is 0/1, and dropping is
    monotone in tau (tau=1.01 keeps everything)."""
    import numpy as np

    out = q.embedding_semdedup(SF).to_pandas()
    assert set(out["keep"].unique()) <= {0, 1}
    mins = out.groupby("cluster")["vec_id"].min()
    kept_min = out.set_index("vec_id").loc[mins, "keep"]
    assert (kept_min == 1).all()
    assert out["keep"].sum() < len(out)  # tau=0.42 drops something here


def test_batch30_queries_match_oracles():
    """Batch-30 additions (PQ codes, Poisson-bootstrap means, adapted
    TPC-H Q21) against their registered oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("embeddings", "events", "lineitem", "orders", "supplier"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "embedding_pq_codes",
        "events_value_bootstrap",
        "orders_waiting_supplier_q21",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch30_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("embeddings", "events", "lineitem", "orders", "supplier"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.embedding_pq_codes,
        q.events_value_bootstrap,
        q.orders_waiting_supplier_q21,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_pq_codes_and_bootstrap_invariants():
    """Structural invariants: every PQ code is one row per vector with
    codes in [0, k); subspace 0's code column equals a standalone k-means
    over the first 16 dims (the packing/unpacking is lossless). The
    bootstrap replica means straddle (or closely bracket) the true mean
    and are mutually distinct — a degenerate hash slice would collapse
    them."""
    import numpy as np
    import pyarrow.parquet as papq

    from neuroner_ray.stages.similarity import kmeans_assign
    from neuroner_ray.sources.parquet import read_parquet_clean

    out = q.embedding_pq_codes(SF).to_pandas()
    emb = papq.read_table(f"{SF}/embeddings.parquet")
    assert len(out) == emb.num_rows
    for s in range(q.PQ_M):
        assert out[f"c{s}"].between(0, q.PQ_K - 1).all()

    def slice0(t, sub_dim=q.PQ_SUB_DIM):
        import pyarrow as pa
        import pyarrow.compute as pac

        return pa.table(
            {
                "vec_id": t["vec_id"],
                "embedding": pac.list_slice(t["embedding"], 0, sub_dim),
            }
        )

    sliced = read_parquet_clean(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(slice0, batch_format="pyarrow")
    solo = (
        kmeans_assign(sliced, k=q.PQ_K, iters=q.PQ_ITERS)
        .to_pandas()
        .set_index("vec_id")["cluster"]
    )
    joined = out.set_index("vec_id")["c0"]
    assert (joined.sort_index() == solo.sort_index()).all()

    boot = q.events_value_bootstrap(SF).to_pandas()
    assert len(boot) == q.BOOT_B
    assert boot["boot_mean"].nunique() > 1
    ev = papq.read_table(f"{SF}/events.parquet", columns=["value"])
    true_mean = float(
        np.mean(ev["value"].to_numpy(zero_copy_only=False))
    )
    spread = boot["boot_mean"].max() - boot["boot_mean"].min()
    assert abs(boot["boot_mean"].mean() - true_mean) < max(
        4 * spread, 1e-3
    )


def test_batch31_queries_match_oracles():
    """Batch-31 additions (bigram LM scoring, adapted TPC-H Q16 and Q22)
    against their registered oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("documents", "part", "lineitem", "customer", "orders"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "doc_bigram_logprob",
        "part_supplier_cnt_q16",
        "customers_lapsed_rich_q22",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch31_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("documents", "part", "lineitem", "customer", "orders"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.doc_bigram_logprob,
        q.part_supplier_cnt_q16,
        q.customers_lapsed_rich_q22,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_bigram_logprob_invariants():
    """Structural invariants: every logprob is negative (Laplace
    probabilities < 1), n_bigrams = n_words - 1 for a single-row replay,
    and docs under two words are absent."""
    import numpy as np

    out = q.doc_bigram_logprob(SF).to_pandas()
    assert (out["logprob"] < 0).all()
    assert (out["n_bigrams"] >= 1).all()
    import pyarrow.parquet as papq

    docs = papq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    import re

    wre = re.compile(r"[a-z0-9_]+")
    nw = {
        int(r.doc_id): len(wre.findall((r.text or "").lower()))
        for r in docs.itertuples()
    }
    got = dict(zip(out["doc_id"], out["n_bigrams"]))
    for did, n in nw.items():
        if n >= 2:
            assert got[did] == n - 1, did
        else:
            assert did not in got


def test_batch32_queries_match_oracles():
    """Batch-32 additions (adapted TPC-H Q8 market share and Q11
    important parts) against their registered oracles at fixture scale
    (kg_adamic_adar is exercised in test_graph_analytics + the gate
    replica — it needs the transcripts corpus, not the sf tables)."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("lineitem", "orders", "supplier", "nation"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("nation_market_share_q8", "part_important_value_q11"):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch32_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("lineitem", "orders", "supplier", "nation"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (q.nation_market_share_q8, q.part_important_value_q11):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_batch33_queries_match_oracles():
    """Batch-33 additions (adapted TPC-H Q4, Q15, Q17) against their
    registered oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("lineitem", "orders", "supplier", "part"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "orders_priority_late_q4",
        "supplier_top_quarter_q15",
        "part_smallqty_revenue_q17",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch33_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("lineitem", "orders", "supplier", "part"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.orders_priority_late_q4,
        q.supplier_top_quarter_q15,
        q.part_smallqty_revenue_q17,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_batch34_queries_match_oracles():
    """Batch-34 additions (TPC-H Q6, adapted Q12, adapted Q19) against
    their registered oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("lineitem", "orders", "part"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "lineitem_forecast_revenue_q6",
        "lineitem_shipmode_q12",
        "lineitem_disjunctive_q19",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch34_ops_survive_empty_input(tmp_path):
    """Scalar aggregates keep their one-row zero shape on empty input
    (mirrored by the oracles' coalesce); the grouped Q12 goes empty."""
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("lineitem", "orders", "part"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    q6 = q.lineitem_forecast_revenue_q6(d).to_pandas()
    assert list(q6["revenue"]) == [0.0]
    assert len(q.lineitem_shipmode_q12(d).to_pandas()) == 0
    q19 = q.lineitem_disjunctive_q19(d).to_pandas()
    assert list(q19["revenue"]) == [0.0]


def test_batch35_queries_match_oracles():
    """Batch-35 additions (KMV distinct sketch, dow×hour seasonality)
    against their registered oracles at fixture scale."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("events_user_count_kmv", "events_hour_dow_seasonality"):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_kmv_exact_below_k_and_empty(tmp_path):
    """With fewer distinct users than K the estimate IS the exact count;
    empty input yields the one-row zero sketch (oracle mirrored)."""
    import os

    import numpy as np
    import pyarrow as paw
    import pyarrow.parquet as pq

    out = q.events_user_count_kmv(SF).to_pandas()
    import duckdb as dk

    c2 = dk.connect()
    n_exact = c2.execute(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    if int(out["k_used"].iloc[0]) < 256:
        assert out["est_kmv"].iloc[0] == float(n_exact)
    else:
        # the estimator's relative error concentrates near 1/sqrt(K)
        assert abs(out["est_kmv"].iloc[0] / n_exact - 1.0) < 0.25

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "events.parquet"))
    e0 = q.events_user_count_kmv(d).to_pandas()
    assert list(e0["k_used"]) == [0] and list(e0["est_kmv"]) == [0.0]
    assert len(q.events_hour_dow_seasonality(d).to_pandas()) == 0


def test_seasonality_invariants():
    """The 168-cell profile: indices average to ~1 weighted by share, the
    cell count never exceeds 168, totals reconcile with the row count."""
    out = q.events_hour_dow_seasonality(SF).to_pandas()
    assert len(out) <= 168
    assert set(out["dow"]).issubset(set(range(1, 8)))
    assert set(out["hr"]).issubset(set(range(24)))
    import duckdb as dk

    c2 = dk.connect()
    n = c2.execute(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert int(out["n"].sum()) == n


def test_batch36_queries_match_oracles():
    """Batch-36 additions (windowed funnel, weekly growth accounting,
    seasonal anomaly top-20) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_windowed_funnel",
        "events_user_lifecycle",
        "events_seasonal_anomaly",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch36_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "events.parquet"))
    for fn in (
        q.events_windowed_funnel,
        q.events_user_lifecycle,
        q.events_seasonal_anomaly,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_lifecycle_identities():
    """Growth-accounting sanity: Σ new = distinct users; week-w actives =
    new+retained+resurrected; churned(w) ≤ actives(w−1)."""
    out = (
        q.events_user_lifecycle(SF)
        .to_pandas()
        .sort_values("wk")
        .reset_index(drop=True)
    )
    import duckdb as dk

    c2 = dk.connect()
    n_users = c2.execute(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert int(out["n_new"].sum()) == n_users
    act = (out["n_new"] + out["n_retained"] + out["n_resurrected"]).to_numpy()
    ch = out["n_churned"].to_numpy()
    wk = out["wk"].to_numpy()
    for i in range(1, len(out)):
        if wk[i] == wk[i - 1] + 1:
            assert ch[i] <= act[i - 1]


def test_windowed_funnel_never_exceeds_plain_funnel():
    """The 1-hour window can only LOSE conversions vs the unbounded
    funnel: cumulative users at stage ≥ k is ≤ the plain funnel's."""
    wf = q.events_windowed_funnel(SF).to_pandas().set_index("stage")["n_users"]
    pf = q.events_funnel(SF).to_pandas().set_index("stage")["n_users"]
    for k in (1, 2, 3):
        wk_ge = int(wf[wf.index >= k].sum())
        pk_ge = int(pf[pf.index >= k].sum())
        assert wk_ge <= pk_ge, k
    assert int(wf.sum()) == int(pf.sum())  # same user universe


def test_batch37_queries_match_oracles():
    """Batch-37 additions (containment dedup, relational division,
    cohorted conversion-delay quantiles) against their oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "doc_containment_pairs",
        "users_all_event_types",
        "events_conversion_delay",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch37_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("documents", "events"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.doc_containment_pairs,
        q.users_all_event_types,
        q.events_conversion_delay,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_containment_planted_subset():
    """A doc whose text is a strict prefix chunk of another must surface
    as contained (containment 1.0) in the asymmetric direction — the
    case symmetric Jaccard misses by construction. Also: containment
    pairs are a SUPERSET of jaccard-0.8 pairs in both directions."""
    import pyarrow as paw
    import pyarrow.parquet as pq
    import ray.data as rdm

    from neuroner_ray.stages.dedup import containment_pairs

    big = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    small = "alpha beta gamma delta epsilon zeta eta theta"
    other = "one two three four five six seven eight nine ten"
    docs = rdm.from_items(
        [
            {"doc_id": 1, "text": big},
            {"doc_id": 2, "text": small},
            {"doc_id": 3, "text": other},
        ]
    )
    out = containment_pairs(docs).to_pandas()
    got = {(r.a, r.b): r.containment for r in out.itertuples()}
    assert got[(2, 1)] == 1.0  # small fully contained in big
    assert (1, 2) not in got   # big NOT contained in small
    assert all(a != 3 and b != 3 for a, b in got)

    jac = q.doc_ngram_jaccard_pairs(SF).to_pandas()
    cont = q.doc_containment_pairs(SF).to_pandas()
    cpairs = set(zip(cont["a"], cont["b"]))
    for r in jac.itertuples():
        assert (r.a, r.b) in cpairs and (r.b, r.a) in cpairs


def test_batch38_queries_match_oracles():
    """Batch-38 additions (winnowing fingerprints, keep-longest
    survivorship, centroid outliers) against their oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "doc_winnowing_fp",
        "doc_dedup_keep_longest",
        "embedding_centroid_outliers",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch38_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("documents", "embeddings"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.doc_winnowing_fp,
        q.doc_dedup_keep_longest,
        q.embedding_centroid_outliers,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_winnowing_coverage_property():
    """The winnowing guarantee: two docs sharing a run of ≥ K+W−1 = 6
    tokens must share at least one selected fingerprint; per doc the
    selection is never empty when the doc has a token."""
    import ray.data as rdm

    shared = "quick brown fox jumps over lazy"
    d1 = f"aaa bbb {shared} ccc ddd eee"
    d2 = f"xxx yyy zzz {shared} www"
    docs = rdm.from_items(
        [{"doc_id": 1, "text": d1}, {"doc_id": 2, "text": d2}]
    )
    from neuroner_ray.pipelines.queries import doc_winnowing_fp

    # drive via a temp parquet dir (the query reads sf_dir/documents)
    import tempfile

    import pyarrow as paw
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            paw.table(
                {
                    "doc_id": paw.array([1, 2], paw.int64()),
                    "text": paw.array([d1, d2], paw.string()),
                    "lang": paw.array(["en", "en"], paw.string()),
                    "source": paw.array(["s", "s"], paw.string()),
                    "n_chars": paw.array(
                        [len(d1), len(d2)], paw.int64()
                    ),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        out = doc_winnowing_fp(d).to_pandas()
    f1 = set(out.loc[out["doc_id"] == 1, "fp"])
    f2 = set(out.loc[out["doc_id"] == 2, "fp"])
    assert f1 and f2
    assert f1 & f2, "shared 6-token run must share a fingerprint"


import os  # noqa: E402  (used by the winnowing property test above)


def test_keep_longest_exactly_one_survivor_per_cluster():
    out = q.doc_dedup_keep_longest(SF).to_pandas()
    if len(out) == 0:
        return
    g = out.groupby("cluster_id")["keep"].sum()
    assert (g == 1).all()
    # the survivor is never shorter than any clustermate
    import duckdb as dk

    c2 = dk.connect()
    nc = dict(
        c2.execute(
            f"SELECT doc_id, n_chars FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    for cid, grp in out.groupby("cluster_id"):
        kept = grp.loc[grp["keep"] == 1, "doc_id"].iloc[0]
        assert nc[kept] == max(nc[d] for d in grp["doc_id"])


def test_batch39_queries_match_oracles():
    """Batch-39 additions (type trigrams, bot screening, linear
    attribution) against their registered oracles."""
    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_type_trigrams_top20",
        "events_bot_users",
        "events_attribution_linear",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch39_ops_survive_empty_input(tmp_path):
    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "events.parquet"))
    for fn in (
        q.events_type_trigrams_top20,
        q.events_bot_users,
        q.events_attribution_linear,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_attribution_mass_conservation():
    """Every attributed purchase hands out exactly 1000 milli-credits:
    Σ credit = 1000 × (#purchases with ≥1 click in the prior 7 days)."""
    out = q.events_attribution_linear(SF).to_pandas()
    import duckdb as dk

    c2 = dk.connect()
    n_attr = c2.execute(
        f"""
        SELECT count(*) FROM read_parquet('{SF}/events.parquet') p
        WHERE p.event_type = 'purchase' AND EXISTS (
            SELECT 1 FROM read_parquet('{SF}/events.parquet') c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 7 DAY)
        """
    ).fetchone()[0]
    assert int(out["credit_milli"].sum()) == 1000 * n_attr


def test_batch41_queries_match_oracles():
    """Batch-41 additions (funnel window sweep, weekly bounce rate,
    order-cohort repeat rate) against their registered oracles."""
    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "orders"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_funnel_window_sweep",
        "events_bounce_rate_weekly",
        "orders_cohort_repeat_rate",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch41_ops_survive_empty_input(tmp_path):
    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "orders"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn in (
        q.events_funnel_window_sweep,
        q.events_bounce_rate_weekly,
        q.orders_cohort_repeat_rate,
    ):
        assert len(fn(d).to_pandas()) == 0, fn.__name__


def test_funnel_sweep_monotone_in_window():
    """A wider window can only help: cumulative users at stage ≥ k is
    non-decreasing in window_s, and the 1 h arm equals the standalone
    windowed funnel."""
    out = q.events_funnel_window_sweep(SF).to_pandas()
    piv = out.pivot_table(
        index="stage", columns="window_s", values="n_users", fill_value=0
    )
    wins = sorted(piv.columns)
    for k in (1, 2, 3):
        ge = [int(piv.loc[piv.index >= k, w].sum()) for w in wins]
        assert ge == sorted(ge), (k, ge)
    one_h = out[out["window_s"] == 3600][["stage", "n_users"]]
    wf = q.events_windowed_funnel(SF).to_pandas()
    assert (
        one_h.sort_values("stage").reset_index(drop=True)
        .equals(wf.sort_values("stage").reset_index(drop=True))
    )


def test_batch42_queries_match_oracles():
    """Batch-42 additions (TPC-H Q2 min-cost supplier, Q20 promo-stock
    suppliers, Zipf census fit) against their registered oracles."""
    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("lineitem", "part", "supplier", "nation", "region",
              "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "part_mincost_supplier_q2",
        "supplier_promo_stock_q20",
        "corpus_zipf_fit",
        "corpus_temperature_weights",
    ):
        got = _norm(queries[name](SF).to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch42_ops_survive_empty_input(tmp_path):
    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("lineitem", "part", "supplier", "nation", "region",
              "documents"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.part_mincost_supplier_q2, 6),
        (q.supplier_promo_stock_q20, 2),
        (q.corpus_zipf_fit, 4),
        (q.corpus_temperature_weights, 4),
    ):
        out = fn(d).to_pandas()
        assert len(out) == 0, fn.__name__
        # schema must survive the all-empty-block stream (Ray 2.49
        # bypasses map fns on empty blocks — driver-concat rule)
        assert len(out.columns) == ncols, fn.__name__


def test_q2_cost_micro_is_exact_argmin():
    """cost_micro is integer-exact: recompute each winning row's cost
    from raw per-(pk,sk) sums in DuckDB and confirm the argmin identity
    (no float division anywhere in the comparison)."""
    out = q.part_mincost_supplier_q2(SF).to_pandas()
    if out.empty:
        pytest.skip("no qualifying parts at this sf")
    c = duckdb.connect()
    cs = c.execute(f"""
        SELECT l_partkey pk, l_suppkey sk,
               sum(CAST(round(l_extendedprice*100) AS BIGINT)) cents,
               sum(CAST(round(l_quantity) AS BIGINT)) qty
        FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1, 2
    """).fetchdf()
    eu = set(
        c.execute(f"""
            SELECT s_suppkey FROM read_parquet('{SF}/supplier.parquet') s
            JOIN read_parquet('{SF}/nation.parquet') n
              ON n.n_nationkey = s.s_nationkey
            JOIN read_parquet('{SF}/region.parquet') r
              ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
        """).fetchdf()["s_suppkey"].astype(int)
    )
    by_pair = {
        (int(r.pk), int(r.sk)): (int(r.cents) * 10000) // int(r.qty)
        for r in cs.itertuples()
        if int(r.sk) in eu
    }
    for r in out.itertuples():
        costs = [v for (pk, _), v in by_pair.items() if pk == r.p_partkey]
        assert r.cost_micro == min(costs), r.p_partkey


def test_round4_batch44_queries_match_oracles():
    """Batch-44 additions (CDC snapshot diff, Mann-Whitney U) against
    their registered oracles at fixture scale (kg_sssp replays through
    the graph-analytics regime tests + the check_oracles replica)."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("events_snapshot_diff", "events_value_mannwhitney"):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch44_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "events.parquet"))
    # snapshot diff keeps its 4-row category contract on an empty log
    out = q.events_snapshot_diff(d).to_pandas()
    assert sorted(out["category"]) == [
        "deleted", "inserted", "unchanged", "updated",
    ]
    assert (out["n_users"] == 0).all()
    mw = q.events_value_mannwhitney(d).to_pandas()
    assert len(mw) == 0 and list(mw.columns) == [
        "n_click", "n_purchase", "u", "z",
    ]


def test_snapshot_diff_planted_categories(tmp_path):
    """Planted log pins every category's semantics: a user active only
    after T1 is `inserted`; a user whose latest event changes between
    the watermarks is `updated`; one inactive between them is
    `unchanged`; `deleted` is structurally 0 for an append-only log."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    # span [0, 100] minutes -> T1 = 50, T2 = 75 (integer-exact)
    def ts(minute):
        return np.datetime64("2026-01-01T00:00:00", "us") + np.timedelta64(
            minute * 60_000_000, "us"
        )
    rows = [
        # user 1: events at 10 and 60 -> updated (latest changes 10->60)
        (1, 1, ts(0)), (2, 1, ts(60)),
        # user 2: single event at 20 -> unchanged
        (3, 2, ts(20)),
        # user 3: first event at 70 -> inserted
        (4, 3, ts(70)),
        # user 4: events only after T2 -> in NEITHER snapshot (no row)
        (5, 4, ts(90)),
        # user 5: anchors the span end at minute 100
        (6, 5, ts(100)), (7, 5, ts(10)),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    out = q.events_snapshot_diff(str(tmp_path)).to_pandas()
    got = dict(zip(out["category"], out["n_users"]))
    # T1 = minute 50, T2 = minute 75: user1 updated (10 vs 60), user2 and
    # user5 unchanged (their latest <= T1 rows still latest at T2), user3
    # inserted, user4 invisible to both snapshots
    assert got == {
        "deleted": 0, "inserted": 1, "unchanged": 2, "updated": 1,
    }


def test_mannwhitney_planted_shift_sign():
    """A planted location shift pins the statistic's direction: when
    every click value exceeds every purchase value, U is maximal
    (n1*n2) and z is positive; swapping the samples flips the sign."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    def mk(click_vals, purch_vals, d):
        n = len(click_vals) + len(purch_vals)
        t = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [np.datetime64("2026-01-01", "us")] * n,
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(
                    ["click"] * len(click_vals)
                    + ["purchase"] * len(purch_vals),
                    pa.string(),
                ),
                "value": pa.array(
                    list(click_vals) + list(purch_vals), pa.float64()
                ),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        )
        pq.write_table(t, os.path.join(d, "events.parquet"))

    with tempfile.TemporaryDirectory() as d:
        mk([10.0, 11.0, 12.0], [1.0, 2.0], d)
        hi = q.events_value_mannwhitney(d).to_pandas().iloc[0]
        assert hi["u"] == 6.0  # n1*n2: every click outranks every purchase
        assert hi["z"] > 0
    with tempfile.TemporaryDirectory() as d:
        mk([1.0, 2.0], [10.0, 11.0, 12.0], d)
        lo = q.events_value_mannwhitney(d).to_pandas().iloc[0]
        assert lo["u"] == 0.0
        assert lo["z"] < 0


def test_round4_batch45_queries_match_oracles():
    """Batch-45 additions (lead-lag xcorr, Holt smoothing, stratified
    exact-quota split) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_hourly_xcorr",
        "events_hourly_holt",
        "doc_split_stratified",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch45_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "documents"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.events_hourly_xcorr, 3),
        (q.events_hourly_holt, 4),
        (q.doc_split_stratified, 4),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_stratified_split_exact_quota_per_stratum():
    """The defining property vs the hash split: EVERY stratum hits
    exactly ⌊0.8·n⌋ train docs (the hash split only approximates)."""
    out = q.doc_split_stratified(SF).to_pandas()
    for (lang, source), g in out.groupby(["lang", "source"]):
        n_train = int((g["split"] == "train").sum())
        assert n_train == len(g) * 8 // 10, (lang, source, n_train, len(g))


def test_xcorr_planted_lead_peaks_at_lag():
    """Purchases = clicks shifted 3 hours later ⇒ r peaks (exactly 1.0)
    at lag 3 and is lower everywhere else."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    eid = 0
    base = np.datetime64("2026-01-01T00:00:00", "us")
    # clicks: a distinctive count pattern over 30 hours
    pattern = [1, 5, 2, 8, 3, 1, 9, 4, 2, 7] * 3
    for h, n in enumerate(pattern):
        for _ in range(n):
            rows.append(("click", base + np.timedelta64(h, "h"), eid))
            eid += 1
        for _ in range(n):
            rows.append(
                ("purchase", base + np.timedelta64(h + 3, "h"), eid)
            )
            eid += 1
    t = pa.table(
        {
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "ts": pa.array(
                [r[1] for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        res = q.events_hourly_xcorr(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
    by_lag = dict(zip(out["lag"], out["r"]))
    assert by_lag[3] == 1.0
    assert all(
        r is None or np.isnan(r) or r < 1.0
        for lag, r in by_lag.items()
        if lag != 3
    )


def test_holt_recurrence_replay():
    """The distributed result replays the literal two-accumulator
    recurrence exactly (pre-round comparison at full double width)."""
    import numpy as np

    out = q.events_hourly_holt(SF).to_pandas().sort_values("hour")
    ns = out["n_events"].to_numpy()
    lv, b = float(ns[0]), 0.0
    want_l, want_b = [lv], [b]
    for x in ns[1:]:
        nl = 0.3 * x + 0.7 * (lv + b)
        b = 0.1 * (nl - lv) + 0.9 * b
        lv = nl
        want_l.append(lv)
        want_b.append(b)
    assert np.allclose(out["level"], np.round(want_l, 4), atol=1e-9)
    assert np.allclose(out["trend"], np.round(want_b, 4), atol=1e-9)


def test_round4_batch46_queries_match_oracles():
    """Batch-46 additions (positional phrase search, RRF fusion) against
    their registered oracles (kg_ppr replays through the graph regime
    test + the check_oracles replica)."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("corpus_phrase_hits", "events_user_rrf_top20"):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch46_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "documents"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.corpus_phrase_hits, 2),
        (q.events_user_rrf_top20, 2),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_phrase_hits_planted_adjacency():
    """Adjacency is load-bearing: 'table scan' back-to-back matches,
    'table X scan' does not; overlapping repeats count each start."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = [
        (1, "the table scan runs"),            # 1 hit
        (2, "table first scan later"),          # 0 hits (gap)
        (3, "table scan table scan table scan"),  # 3 hits
        (4, "scan table"),                       # 0 hits (order)
        (5, "Table SCAN"),                       # 1 hit (case-folded)
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([x for _, x in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
            "n_chars": pa.array(
                [len(x) for _, x in docs], pa.int64()
            ),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        res = q.corpus_phrase_hits(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
    got = dict(zip(out["doc_id"], out["n_hits"]))
    assert got == {1: 1, 3: 3, 5: 1}


def test_rrf_single_arm_users_score_one_term():
    """A user in only one candidate list contributes exactly one
    1/(60+r) term — checked by recomputing the fuse from the raw
    censuses in pandas."""
    import numpy as np

    res = q.events_user_rrf_top20(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    import duckdb as dk

    c = dk.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    cl = c.execute(
        "SELECT user_id, count(*) m FROM events WHERE event_type='click' "
        "GROUP BY 1 ORDER BY m DESC, user_id LIMIT 100"
    ).fetchdf()
    pu = c.execute(
        "SELECT user_id, sum(CAST(round(value*100) AS BIGINT)) m FROM events "
        "WHERE event_type='purchase' GROUP BY 1 ORDER BY m DESC, user_id "
        "LIMIT 100"
    ).fetchdf()
    r1 = {int(u): i + 1 for i, u in enumerate(cl["user_id"])}
    r2 = {int(u): i + 1 for i, u in enumerate(pu["user_id"])}
    for row in out.itertuples():
        want = (1.0 / (60 + r1[row.user_id]) if row.user_id in r1 else 0.0) + (
            1.0 / (60 + r2[row.user_id]) if row.user_id in r2 else 0.0
        )
        assert abs(row.rrf - np.round(want, 6)) < 1e-12, row.user_id


def test_round4_batch47_queries_match_oracles():
    """Batch-47 additions (zone-map skipping audit, winsorized mean,
    k-anonymity audit) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "documents", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "lineitem_zonemap_skip",
        "events_value_winsorized_mean",
        "doc_kanonymity_audit",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch47_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "documents", "lineitem"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.lineitem_zonemap_skip, 4),
        (q.events_value_winsorized_mean, 5),
        (q.doc_kanonymity_audit, 4),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_zonemap_clustered_layout_skips_more():
    """The point of the audit: the date-clustered layout must let the
    zone-map test skip at least as many ROWS as the unclustered one, and
    a skipped file's rows never intersect the predicate window."""
    res = q.lineitem_zonemap_skip(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    by = out.set_index("layout")
    assert (
        by.loc["date_clustered", "n_rows_skipped"]
        >= by.loc["unclustered", "n_rows_skipped"]
    )
    # date-clustered files are month-pure: every file outside the window
    # is skippable, so skipped rows = rows outside the window entirely
    c = duckdb.connect()
    outside = c.execute(
        f"""SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet')
            WHERE l_shipdate < TIMESTAMP '1996-01-01'
               OR l_shipdate >= TIMESTAMP '1997-01-01'"""
    ).fetchone()[0]
    assert int(by.loc["date_clustered", "n_rows_skipped"]) == int(outside)


def test_winsorized_mean_bounded_by_clamps():
    """Structural: the winsorized mean lies inside [lo, hi] cents and is
    no farther from the median than the raw mean on a planted outlier."""
    res = q.events_value_winsorized_mean(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert len(out) > 0
    for r in out.itertuples():
        assert r.lo_cents / 100.0 <= r.winsorized_mean <= r.hi_cents / 100.0


def test_kanonymity_planted_small_class(tmp_path):
    """A planted singleton QI class drives min_class_size to 1 and is
    counted at risk."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [("en", "s0", 150)] * 6 + [("zz", "rare", 9999)]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    res = q.doc_kanonymity_audit(str(tmp_path))
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    r = out.iloc[0]
    assert r["n_classes"] == 2
    assert r["min_class_size"] == 1
    assert r["n_classes_below_k"] == 1
    assert r["n_docs_at_risk"] == 1


def test_round4_batch48_queries_match_oracles():
    """Batch-48 additions (skyline, global cume_dist attach, equi-depth
    histogram) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "orders"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "orders_skyline",
        "orders_price_cume_dist",
        "events_value_equidepth",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch48_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "orders"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.orders_skyline, 3),
        (q.orders_price_cume_dist, 3),
        (q.events_value_equidepth, 3),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_skyline_planted_dominance_and_ties(tmp_path):
    """Planted frontier pins the dominance semantics: ties on both dims
    survive together; a row beaten on one dim and tied on the other is
    dominated; batch splits cannot change the result (composition)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    day = lambda i: np.datetime64("2026-01-01", "us") + np.timedelta64(
        i * 86_400_000_000, "us"
    )
    rows = [
        (1, 100.0, day(5)),   # frontier (highest price, latest date)
        (2, 100.0, day(5)),   # exact duplicate -> survives too
        (3, 100.0, day(4)),   # dominated: price tie, earlier date
        (4, 90.0, day(5)),    # dominated: date tie, lower price
        (5, 80.0, day(9)),    # frontier (later date, lower price)
        (6, 70.0, day(1)),    # dominated by everything
    ]
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [r[2] for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "orders.parquet"))
    res = q.orders_skyline(str(tmp_path))
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert sorted(out["o_orderkey"]) == [1, 2, 5]


def test_equidepth_bins_cover_and_balance():
    """Coverage invariants: bin counts sum to the row count, boundaries
    are non-decreasing, and the last boundary is the max value."""
    res = q.events_value_equidepth(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    c = duckdb.connect()
    n, mx = c.execute(
        f"""SELECT count(*), max(CAST(round(value*100) AS BIGINT))
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchone()
    assert int(out["n_rows"].sum()) == int(n)
    his = out.sort_values("bin")["hi_cents"].to_numpy()
    assert (his[1:] >= his[:-1]).all()
    assert int(his[-1]) == int(mx)


def test_cume_dist_attach_matches_definition():
    """cume_dist of the top row is exactly 1.0 and every reported value
    equals (#rows <= price)/N recomputed from the raw table."""
    res = q.orders_price_cume_dist(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    c = duckdb.connect()
    import numpy as np

    prices = c.execute(
        f"""SELECT CAST(round(o_totalprice*100) AS BIGINT) p
            FROM read_parquet('{SF}/orders.parquet')"""
    ).fetchdf()["p"].to_numpy()
    prices.sort()
    n = len(prices)
    assert out["cume_dist"].max() == 1.0
    for r in out.itertuples():
        le = int(np.searchsorted(prices, r.price_cents, side="right"))
        assert abs(r.cume_dist - np.round(le / n, 6)) < 1e-12


def test_round4_batch49_queries_match_oracles():
    """Batch-49 additions (list-column dim stats, weighted median, 3-way
    Venn) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "lineitem", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "embedding_dim_stats",
        "lineitem_weighted_median",
        "events_type_venn3",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch49_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "lineitem", "embeddings"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.embedding_dim_stats, 5),
        (q.lineitem_weighted_median, 2),
        (q.events_type_venn3, 4),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_weighted_median_planted_weights(tmp_path):
    """Weights move the median: one heavy cheap line outweighs many
    light expensive ones."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    # price 1.00 with qty 10 vs prices 5.00..9.00 with qty 1 each:
    # total weight 15 -> half = 8 -> cumulative reaches 8 at price 1.00
    rows = [(1.0, 10.0)] + [(float(p), 1.0) for p in range(5, 10)]
    t = pa.table(
        {
            "l_orderkey": pa.array(range(len(rows)), pa.int64()),
            "l_partkey": pa.array([1] * len(rows), pa.int64()),
            "l_suppkey": pa.array([1] * len(rows), pa.int64()),
            "l_linenumber": pa.array(
                np.arange(len(rows), dtype=np.int32), pa.int32()
            ),
            "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
            "l_extendedprice": pa.array(
                [r[0] for r in rows], pa.float64()
            ),
            "l_discount": pa.array([0.0] * len(rows), pa.float64()),
            "l_tax": pa.array([0.0] * len(rows), pa.float64()),
            "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
            "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
            "l_shipdate": pa.array(
                [np.datetime64("1996-06-01", "us")] * len(rows),
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "lineitem.parquet"))
    res = q.lineitem_weighted_median(str(tmp_path))
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert out.iloc[0]["total_weight_h"] == 1500
    assert out.iloc[0]["weighted_median_cents"] == 100


def test_venn3_planted_cells(tmp_path):
    """Planted users pin the cell semantics (view-only, view+click,
    all-three)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    evs = [
        (1, "view"), (2, "view"), (2, "click"),
        (3, "view"), (3, "click"), (3, "purchase"),
        (4, "error"),  # filtered type: user 4 absent from the census
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(evs)), pa.int64()),
            "ts": pa.array(
                [np.datetime64("2026-01-01", "us")] * len(evs),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([e[0] for e in evs], pa.int64()),
            "event_type": pa.array([e[1] for e in evs], pa.string()),
            "value": pa.array([1.0] * len(evs), pa.float64()),
            "props": pa.array(["{}"] * len(evs), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    res = q.events_type_venn3(str(tmp_path))
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    cells = {
        (r.has_view, r.has_click, r.has_purchase): r.n_users
        for r in out.itertuples()
    }
    assert cells == {(1, 0, 0): 1, (1, 1, 0): 1, (1, 1, 1): 1}


def test_round4_batch50_queries_match_oracles():
    """Batch-50 additions (decayed popularity, WoW contribution, split
    leakage) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_type_decayed_top",
        "events_wow_contribution",
        "doc_split_leakage",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch50_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "documents"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols, nrows in (
        (q.events_type_decayed_top, 2, 0),
        (q.events_wow_contribution, 5, 0),
        # leakage has a fixed one-row contract (0 pairs, 0 cross)
        (q.doc_split_leakage, 2, 1),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == nrows, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_decayed_top_planted_halving(tmp_path):
    """Integer halving decay: one event today (1e6), two yesterday
    (2 × 5e5), four 20+ days ago (0 — past the horizon)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    day = lambda i: np.datetime64("2026-02-01", "us") + np.timedelta64(
        i * 86_400_000_000, "us"
    )
    evs = (
        [("a", day(25))]
        + [("a", day(24))] * 2
        + [("b", day(0))] * 4
    )
    t = pa.table(
        {
            "event_id": pa.array(range(len(evs)), pa.int64()),
            "ts": pa.array([e[1] for e in evs], pa.timestamp("us")),
            "user_id": pa.array([1] * len(evs), pa.int64()),
            "event_type": pa.array([e[0] for e in evs], pa.string()),
            "value": pa.array([1.0] * len(evs), pa.float64()),
            "props": pa.array(["{}"] * len(evs), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    res = q.events_type_decayed_top(str(tmp_path))
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    got = dict(zip(out["event_type"], out["decayed_units"]))
    assert got == {"a": 1_000_000 + 2 * 500_000, "b": 0}


def test_wow_contribution_shares_sum_to_one():
    """When the total moved, the per-type shares sum to 1 (within the
    4-dp rounding of each term)."""
    res = q.events_wow_contribution(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    if out["delta"].sum() != 0:
        assert abs(out["delta_share"].sum() - 1.0) < 1e-3
    # deltas reconcile exactly regardless
    assert (out["delta"] == out["n_last"] - out["n_prev"]).all()


def test_split_leakage_bounded_by_pairs():
    res = q.doc_split_leakage(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    r = out.iloc[0]
    assert 0 <= r["n_cross_split"] <= r["n_pairs"]
    # and the pair universe matches the oracled jaccard-pairs op
    n_pairs = len(q.doc_ngram_jaccard_pairs(SF).to_pandas())
    assert r["n_pairs"] == n_pairs


def test_round4_batch51_queries_match_oracles():
    """Batch-51 additions (Wilson interval, raking/IPF, percent-of-
    parent) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "customer", "nation", "region"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_conversion_wilson",
        "events_raking_weights",
        "customer_share_of_region",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch51_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "customer", "nation", "region"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.events_conversion_wilson, 6),
        (q.events_raking_weights, 4),
        (q.customer_share_of_region, 5),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_wilson_interval_properties():
    """Wilson bounds bracket the rate, stay inside [0, 1], and shrink
    with n (structural)."""
    res = q.events_conversion_wilson(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert len(out) > 0
    for r in out.itertuples():
        assert 0.0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1.0


def test_raking_converges_marginals():
    """After 2 rounds the column (dow) marginals are exact (last scaling
    was columns) and row marginals are near target — the IPF contract."""
    import numpy as np

    res = q.events_raking_weights(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out["mass"] = out["weight"] * out["n"]
    nt = out["n"].sum()
    col = out.groupby("dow")["mass"].sum()
    # columns scaled last: exact (up to the 4-dp weight rounding × n)
    assert np.allclose(col, nt / out["dow"].nunique(), rtol=1e-2)
    row = out.groupby("event_type")["mass"].sum()
    assert np.allclose(row, nt / out["event_type"].nunique(), rtol=0.35)


def test_share_of_region_sums_to_one():
    res = q.customer_share_of_region(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    for _, g in out.groupby("r_name"):
        assert abs(g["share_of_region"].sum() - 1.0) < 1e-2
    assert (
        abs(out.drop_duplicates("r_name")["region_share_of_world"].sum() - 1.0)
        < 1e-2
    )


def test_round4_batch52_queries_match_oracles():
    """Batch-52 additions (Hamilton allocation, join-plan advisor,
    Spearman) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "documents", "orders", "customer", "lineitem",
              "nation"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "doc_sample_allocation",
        "join_plan_advisor",
        "events_user_spearman",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_allocation_seats_sum_exactly():
    """The defining property: seats sum to exactly 100 and every source
    gets within one seat of its proportional share."""
    res = q.doc_sample_allocation(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert int(out["seats"].sum()) == q.ALLOC_SEATS
    total = out["n_docs"].sum()
    for r in out.itertuples():
        lo = q.ALLOC_SEATS * r.n_docs // total
        assert lo <= r.seats <= lo + 1


def test_spearman_planted_monotone(tmp_path):
    """A perfectly monotone click→spend relationship pins rho = 1.0;
    reversing it pins −1.0."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    def mk(spends, d):
        rows = []
        eid = 0
        for u, (nc, spend) in enumerate(spends, start=1):
            for _ in range(nc):
                rows.append((eid, u, "click", 0.0))
                eid += 1
            rows.append((eid, u, "purchase", spend))
            eid += 1
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [np.datetime64("2026-01-01", "us")] * len(rows),
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array(
                    [r[2] for r in rows], pa.string()
                ),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(t, os.path.join(d, "events.parquet"))

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        mk([(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], d)
        res = q.events_user_spearman(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert out.iloc[0]["rho"] == 1.0
    with tempfile.TemporaryDirectory() as d:
        mk([(1, 40.0), (2, 30.0), (3, 20.0), (4, 10.0)], d)
        res = q.events_user_spearman(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert out.iloc[0]["rho"] == -1.0


def test_join_plan_advisor_strategies():
    """Small dims broadcast; the strategy flips with the byte budget."""
    res = q.join_plan_advisor(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    by = out.set_index("relation")
    assert by.loc["customer->nation", "strategy"] == "broadcast"
    assert (out["dim_bytes_est"] > 0).all()


def test_round4_batch53_queries_match_oracles():
    """Batch-53 additions (LOO target encoding, grouped CV folds,
    Poisson GOF) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_type_target_encoding",
        "events_user_cv_folds",
        "orders_basket_poisson_gof",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch53_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "lineitem"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.events_type_target_encoding, 4),
        (q.events_user_cv_folds, 3),
        (q.orders_basket_poisson_gof, 4),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_target_encoding_loo_property():
    """LOO invariant: within a type, the y=1 encoding is LOWER than the
    y=0 encoding (excluding yourself removes your own positive), and
    both equal (k−y)/(n−1) recomputed from the counts."""
    res = q.events_type_target_encoding(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    import numpy as np

    for t, g in out.groupby("event_type"):
        n_t = g["n_rows"].sum()
        k_t = g.loc[g["y"] == 1, "n_rows"].sum()
        if n_t <= 1:
            continue
        for r in g.itertuples():
            assert abs(
                r.encoding - np.round((k_t - r.y) / (n_t - 1), 4)
            ) < 1e-12
        if set(g["y"]) == {0, 1}:
            e1 = g.loc[g["y"] == 1, "encoding"].iloc[0]
            e0 = g.loc[g["y"] == 0, "encoding"].iloc[0]
            assert e1 <= e0


def test_cv_folds_partition_users():
    """Folds partition the user set: per-fold users sum to the distinct
    user count and events sum to the total event count."""
    res = q.events_user_cv_folds(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    c = duckdb.connect()
    nu, ne = c.execute(
        f"""SELECT count(DISTINCT user_id), count(*)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchone()
    assert int(out["n_users"].sum()) == int(nu)
    assert int(out["n_events"].sum()) == int(ne)
    assert out["fold"].between(0, q.CV_FOLDS - 1).all()


def test_poisson_gof_expected_mass_bounded():
    """Expected counts are positive and their total never exceeds the
    order count (the pmf tail holds the rest)."""
    res = q.orders_basket_poisson_gof(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert (out["expected"] > 0).all()
    assert out["expected"].sum() <= out["observed"].sum() + 1e-6
    assert (out["chi2_term"] >= 0).all()


def test_round4_batch54_queries_match_oracles():
    """Batch-54 additions (AUC, Bayesian shrinkage, mutual information)
    against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_value_auc",
        "events_type_shrunk_rate",
        "events_type_value_mi",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch54_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "events.parquet"))
    for fn, ncols in (
        (q.events_value_auc, 3),
        (q.events_type_shrunk_rate, 5),
        (q.events_type_value_mi, 4),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_auc_is_mannwhitney_u_over_n1n2():
    """AUC ≡ U/(n1·n2) from the registered Mann-Whitney op (the two ops
    share the doubled-rank machinery — cross-check them)."""
    import numpy as np

    auc_res = q.events_value_auc(SF)
    auc = (
        auc_res if isinstance(auc_res, pd.DataFrame) else auc_res.to_pandas()
    )
    if not isinstance(auc, pd.DataFrame):
        auc = auc.to_pandas()
    mw_res = q.events_value_mannwhitney(SF)
    mw = mw_res if isinstance(mw_res, pd.DataFrame) else mw_res.to_pandas()
    if not isinstance(mw, pd.DataFrame):
        mw = mw.to_pandas()
    a, m = auc.iloc[0], mw.iloc[0]
    # mannwhitney's U is for the CLICK sample; AUC ranks purchases, so
    # auc = 1 - U_click/(n1 n2) up to each side's 4-dp rounding
    u_frac = m["u"] / (m["n_click"] * m["n_purchase"])
    assert abs(a["auc"] - np.round(1.0 - u_frac, 4)) < 2e-4


def test_shrunk_rate_between_raw_and_prior():
    """Shrinkage contract: the shrunk rate lies between the raw rate and
    the global prior."""
    res = q.events_type_shrunk_rate(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    p0 = out["n_hi"].sum() / out["n"].sum()
    for r in out.itertuples():
        lo, hi = sorted((r.raw_rate, p0))
        assert lo - 1e-4 <= r.shrunk_rate <= hi + 1e-4


def test_mi_terms_nonneg_total_and_marginals():
    """Σ mi_term ≥ 0 (MI is non-negative up to per-cell rounding) and
    the cell counts reconcile with both marginals."""
    res = q.events_type_value_mi(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert out["mi_term"].sum() >= -1e-4
    assert out["d"].between(1, q.MI_DECILES).all()
    c = duckdb.connect()
    n = c.execute(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert int(out["n"].sum()) == int(n)


def test_round4_batch55_queries_match_oracles():
    """Batch-55 additions (percentile_cont, langid kappa, Hill terms)
    against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_value_quantiles_cont",
        "doc_langid_kappa",
        "events_user_hill_terms",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch55_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "documents"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.events_value_quantiles_cont, 2),
        (q.doc_langid_kappa, 4),
        (q.events_user_hill_terms, 3),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_quantile_cont_brackets_disc():
    """percentile_cont interpolates, so each value lies between the two
    adjacent discrete order statistics — check p50 against quantile_disc
    from DuckDB directly."""
    res = q.events_value_quantiles_cont(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    c = duckdb.connect()
    lo, hi = c.execute(
        f"""SELECT min(v), max(v) FROM (
            SELECT CAST(round(value*100) AS BIGINT) AS v
            FROM read_parquet('{SF}/events.parquet'))"""
    ).fetchone()
    assert (out["value_cont"] * 100 >= lo - 1).all()
    assert (out["value_cont"] * 100 <= hi + 1).all()
    assert list(out.sort_values("q")["q"]) == [0.5, 0.9, 0.99]
    assert out.sort_values("q")["value_cont"].is_monotonic_increasing


def test_kappa_perfect_and_random_fixtures(tmp_path):
    """kappa = 1 when predictions equal labels; near 0 when labels are
    constant but predictions vary (pe ≈ po)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    # use real text whose langid output equals the stored lang: easiest
    # is to store langid's own prediction back as the label
    res = q.doc_langid(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    merged = docs.merge(res, on="doc_id")
    merged["lang"] = merged["lang_pred"]
    t = pa.table(
        {
            "doc_id": pa.array(merged["doc_id"], pa.int64()),
            "text": pa.array(merged["text"], pa.string()),
            "lang": pa.array(merged["lang"], pa.string()),
            "source": pa.array(merged["source"], pa.string()),
            "n_chars": pa.array(merged["n_chars"], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    out_res = q.doc_langid_kappa(str(tmp_path))
    out = (
        out_res if isinstance(out_res, pd.DataFrame) else out_res.to_pandas()
    )
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert out.iloc[0]["accuracy"] == 1.0
    assert out.iloc[0]["kappa"] == 1.0


def test_hill_terms_nonneg_and_monotone():
    """ln(c_i/c_{k+1}) ≥ 0 and non-increasing in rank (counts sorted
    descending)."""
    res = q.events_user_hill_terms(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out = out.sort_values("rank")
    assert (out["ln_ratio"] >= 0).all()
    assert out["ln_ratio"].is_monotonic_decreasing or len(out) <= 1


def test_round4_batch56_queries_match_oracles():
    """Batch-56 additions (Bloom FPR audit, binscatter, exponential-fit
    KS) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "orders", "customer"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "bloom_fpr_audit",
        "events_hour_value_binscatter",
        "events_gap_expfit_ks",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch56_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "orders", "customer"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    # bloom audit keeps its fixed 1-row contract (0 customers -> NULL fpr)
    res = q.bloom_fpr_audit(d)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert len(out) == 1 and out.iloc[0]["n_no_orders"] == 0
    for fn, ncols in (
        (q.events_hour_value_binscatter, 4),
        (q.events_gap_expfit_ks, 3),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_bloom_fpr_consistent_with_antijoin():
    """Audit ground truth must equal the registered exact anti-join, and
    the actual FPR should be within an order of magnitude of theory on a
    healthy filter (m >> n)."""
    res = q.bloom_fpr_audit(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    r = out.iloc[0]
    exact = q.customers_without_orders(SF).to_pandas()
    # customers_without_orders returns the count/rows of order-less
    # customers — reconcile the universe size
    n_exact = (
        int(exact.iloc[0, 0]) if len(exact) == 1 and exact.shape[1] == 1
        else len(exact)
    )
    assert r["n_no_orders"] == n_exact
    assert 0 <= r["n_bloom_fp"] <= r["n_no_orders"]
    assert r["fpr_theory"] >= 0


def test_binscatter_reconciles_totals():
    res = q.events_hour_value_binscatter(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    c = duckdb.connect()
    n = c.execute(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert int(out["n"].sum()) == int(n)
    assert out["hour"].between(0, 23).all()


def test_expfit_ks_bounds():
    res = q.events_gap_expfit_ks(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    r = out.iloc[0]
    assert 0.0 <= r["ks"] <= 1.0
    assert r["mu_seconds"] > 0


def test_round4_batch57_queries_match_oracles():
    """Batch-57 additions (DiD, OOV rate, cluster purity) against their
    registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_did_estimate",
        "corpus_oov_rate",
        "doc_cluster_purity",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch57_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "documents"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.events_did_estimate, 5),
        (q.corpus_oov_rate, 3),
        (q.doc_cluster_purity, 4),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_did_reconstructs_from_cell_means():
    """did == (m_treat_post − m_treat_pre) − (m_ctrl_post − m_ctrl_pre)
    within the per-cell 4-dp rounding."""
    res = q.events_did_estimate(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    r = out.iloc[0]
    approx = (r.m_treat_post - r.m_treat_pre) - (
        r.m_ctrl_post - r.m_ctrl_pre
    )
    assert abs(r.did - approx) < 5e-4


def test_oov_rate_zero_when_eval_subset_of_train(tmp_path):
    """If every eval token also appears in train, OOV = 0; a planted
    eval-only token makes it positive."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    # find doc_ids for each split under the md5 rule
    import hashlib as h

    def split_of(d):
        return (
            int.from_bytes(h.md5(str(d).encode()).digest()[:8], "little")
            % 10
        )

    train_id = next(d for d in range(100) if split_of(d) < 8)
    eval_id = next(d for d in range(100) if split_of(d) >= 8)
    docs = [
        (train_id, "alpha beta gamma"),
        (eval_id, "alpha beta"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([x for _, x in docs], pa.string()),
            "lang": pa.array(["en"] * 2, pa.string()),
            "source": pa.array(["s"] * 2, pa.string()),
            "n_chars": pa.array([len(x) for _, x in docs], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    res = q.corpus_oov_rate(str(tmp_path))
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert out.iloc[0]["oov_rate"] == 0.0
    # now plant an eval-only token
    docs2 = [(train_id, "alpha beta gamma"), (eval_id, "alpha zzznovel")]
    t2 = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs2], pa.int64()),
            "text": pa.array([x for _, x in docs2], pa.string()),
            "lang": pa.array(["en"] * 2, pa.string()),
            "source": pa.array(["s"] * 2, pa.string()),
            "n_chars": pa.array([len(x) for _, x in docs2], pa.int64()),
        }
    )
    pq.write_table(t2, os.path.join(str(tmp_path), "documents.parquet"))
    res2 = q.corpus_oov_rate(str(tmp_path))
    out2 = res2 if isinstance(res2, pd.DataFrame) else res2.to_pandas()
    if not isinstance(out2, pd.DataFrame):
        out2 = out2.to_pandas()
    assert out2.iloc[0]["n_oov"] == 1
    assert out2.iloc[0]["oov_rate"] == 0.5


def test_cluster_purity_bounds_and_membership():
    """Purity ∈ (0, 1], cluster sizes match the registered cluster-size
    op, and n_major ≤ n_docs."""
    res = q.doc_cluster_purity(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert (out["purity"] > 0).all() and (out["purity"] <= 1).all()
    assert (out["n_major"] <= out["n_docs"]).all()
    sizes = q.doc_jaccard_clusters(SF).to_pandas()
    merged = out.merge(sizes, on="cluster_id", suffixes=("", "_ref"))
    assert (merged["n_docs"] == merged["n_docs_ref"]).all()


def test_round4_batch58_queries_match_oracles():
    """Batch-58 additions (token coverage, Fano factor) against their
    registered oracles (kg_richclub replays through the replica + the
    graph fixture test)."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("corpus_token_coverage", "events_hourly_fano"):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch58_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "documents"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.corpus_token_coverage, 3),
        (q.events_hourly_fano, 3),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_token_coverage_monotone():
    """Higher coverage targets need at least as many tokens, and each
    prefix genuinely reaches its threshold."""
    res = q.corpus_token_coverage(SF)
    out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out = out.sort_values("pct")
    assert out["n_tokens"].is_monotonic_increasing
    total = None
    c = duckdb.connect()
    total = c.execute(
        f"""SELECT count(*) FROM (
            SELECT unnest(regexp_extract_all(coalesce(text, ''),
                '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS t
            FROM read_parquet('{SF}/documents.parquet'))"""
    ).fetchone()[0]
    for r in out.itertuples():
        assert 100 * r.covered >= r.pct * int(total)


def test_round4_batch59_queries_match_oracles():
    """Batch-59 additions (CUPED, late-arrival audit, JW rescoring)
    against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "part"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_cuped_adjust",
        "events_late_arrival_audit",
        "part_jw_rescored",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch59_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "part"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.events_cuped_adjust, 7),
        (q.events_late_arrival_audit, 5),
        (q.part_jw_rescored, 4),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_cuped_reduces_to_naive_when_theta_applies():
    """CUPED algebra: lift_cuped = lift_naive − θ·(mx_treat − mx_ctrl)
    / 100 — reconstruct the adjusted lift from the reported cells."""
    out = q.events_cuped_adjust(SF).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # adjusted means shift both arms by the SAME global center, so the
    # adjusted lift differs from naive only through θ·(mx1 − mx0):
    # |lift_cuped − (m_treat − m_ctrl − (adj-diff))| is just a rounding
    # consistency check between the reported columns.
    assert abs((r["adj_treat"] - r["adj_ctrl"]) - r["lift_cuped"]) < 2e-4
    assert abs((r["m_treat"] - r["m_ctrl"]) - r["lift_naive"]) < 2e-4


def test_late_arrival_planted_sequence(tmp_path):
    """Planted fixture: one user with a known out-of-order arrival —
    event_ids 1..4 with timestamps 10, 30, 20, 25 s: arrivals 3 and 4
    are late (lateness 10 s and 5 s)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    ts = pa.array(
        [10_000_000, 30_000_000, 20_000_000, 25_000_000],
        pa.timestamp("us"),
    )
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": ts,
            "user_id": pa.array([7, 7, 7, 7], pa.int64()),
            "event_type": pa.array(["click"] * 4, pa.string()),
            "value": pa.array([1.0] * 4, pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    ).cast(sch)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = q.events_late_arrival_audit(d).to_pandas()
    assert int(out["n_events"].iloc[0]) == 4
    assert int(out["n_late"].iloc[0]) == 2
    assert int(out["max_lateness_us"].iloc[0]) == 10_000_000
    assert int(out["sum_lateness_us"].iloc[0]) == 15_000_000


def test_jw_rescored_scores_match_duckdb_builtin():
    """The Python JW replay is bit-identical to DuckDB's built-in on
    every emitted pair, and every pair is a registered fuzzy candidate."""
    out = q.part_jw_rescored(SF).to_pandas()
    assert len(out) > 0
    c = duckdb.connect()
    for r in out.itertuples(index=False):
        want = c.execute(
            "SELECT round(jaro_winkler_similarity(?, ?), 6)",
            [r.name_a, r.name_b],
        ).fetchone()[0]
        assert abs(r.jw - want) < 1e-12, (r.name_a, r.name_b)
        assert r.dist <= 2


def test_round4_batch60_queries_match_oracles():
    """Batch-60 additions (Kaplan-Meier factors, mutual NN, point-in-time
    features) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_km_factors",
        "embedding_mutual_nn",
        "events_pit_features",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch60_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("events", "embeddings"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.events_km_factors, 5),
        (q.embedding_mutual_nn, 3),
        (q.events_pit_features, 3),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_km_factors_invariants():
    """n_at_risk is strictly decreasing across death days, factors lie in
    (0, 1], and the earliest n_risk is bounded by the user universe."""
    out = q.events_km_factors(SF).to_pandas().sort_values("day")
    assert len(out) > 0
    assert out["n_risk"].is_monotonic_decreasing
    # 0 is legal: at the final death day everyone still at risk dies
    assert ((out["km_factor"] >= 0) & (out["km_factor"] <= 1)).all()
    assert (out["n_events"] > 0).all() and (out["n_censored"] >= 0).all()
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert int(out["n_risk"].iloc[0]) <= int(n_users)


def test_mutual_nn_chunking_invariance():
    """The chunk-pair cogroup is an implementation detail: 3 chunks and
    the default 8 produce the identical mutual-pair set."""
    a = q.embedding_mutual_nn(SF, n_chunks=8).to_pandas()
    b = q.embedding_mutual_nn(SF, n_chunks=3).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True),
        check_dtype=False,
    )
    # mutual pairs are unique per unordered pair and strictly id_a < id_b
    assert (a["id_a"] < a["id_b"]).all()
    assert not a.duplicated(["id_a", "id_b"]).any()


def test_pit_features_planted_leakage_free(tmp_path):
    """Planted sequence: click(10s), purchase(20s, $1), click(30s),
    purchase(40s, $2) — the first purchase must see 1 prior click and 0
    prior cents (nothing from its own instant), the second 2 clicks and
    100 cents."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/events.parquet")
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [10_000_000, 20_000_000, 30_000_000, 40_000_000],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([5, 5, 5, 5], pa.int64()),
            "event_type": pa.array(
                ["click", "purchase", "click", "purchase"], pa.string()
            ),
            "value": pa.array([0.0, 1.0, 0.0, 2.0], pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    ).cast(sch)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = q.events_pit_features(d).to_pandas().sort_values("event_id")
    assert out["event_id"].tolist() == [2, 4]
    assert out["prior_clicks"].tolist() == [1, 2]
    assert out["prior_purchase_cents"].tolist() == [0, 100]


def test_round4_batch61_queries_match_oracles():
    """Batch-61 additions (Heaps' fit, Gopher rules, minhash sketch
    audit) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "corpus_heaps_fit",
        "doc_gopher_rules",
        "doc_minhash_estimate_audit",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch61_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    sch = pq.read_schema(f"{SF}/documents.parquet")
    pq.write_table(sch.empty_table(), os.path.join(d, "documents.parquet"))
    for fn, ncols in (
        (q.corpus_heaps_fit, 4),
        (q.doc_minhash_estimate_audit, 5),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__
    # doc_gopher_rules is a pure per-doc Dataset map: on an ALL-empty
    # block stream Ray bypasses the map fn and the schema is lost
    # (NOTES.md) — the suite precedent (doc_quality et al.) accepts the
    # zero-column empty there, so assert emptiness only
    assert len(q.doc_gopher_rules(d).to_pandas()) == 0


def test_heaps_fit_bucket_count_stability():
    """The checkpoint count is an implementation knob, not a semantics
    knob: the fit stays in a tight band when buckets change (same corpus,
    coarser curve). The fixture corpus has a CLOSED ~31-token vocabulary,
    so V(n) saturates at the first checkpoint and β ≈ 0 — the templated-
    corpus signal the diagnostic exists to raise; the growth band itself
    is exercised on a planted open-vocabulary corpus below."""
    import numpy as np

    a = q.corpus_heaps_fit(SF).to_pandas()
    b = q.corpus_heaps_fit(SF, n_buckets=64).to_pandas()
    assert len(a) == 1 and len(b) == 1
    assert np.isfinite(a[["beta", "ln_k", "r2"]].to_numpy()).all()
    assert abs(a["beta"].iloc[0]) < 0.05  # saturated vocab → flat growth
    assert abs(a["beta"].iloc[0] - b["beta"].iloc[0]) < 0.05


def test_heaps_fit_planted_open_vocabulary(tmp_path):
    """A corpus whose vocabulary genuinely grows like n^0.5 (doc i
    introduces ~sqrt-many new types) must fit β in the prose band with a
    near-perfect log-log fit."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    sch = pq.read_schema(f"{SF}/documents.parquet")
    n_docs, per_doc = 200, 40
    texts = []
    for i in range(n_docs):
        # vocab universe grows with position → Heaps-like V(n) ~ n^β
        hi = max(1, int(((i + 1) * per_doc) ** 0.75))
        toks = [f"w{rng.randint(0, hi)}" for _ in range(per_doc)]
        texts.append(" ".join(toks))
    cols = {f.name: [] for f in sch}
    for i, txt in enumerate(texts):
        for f in sch:
            if f.name == "doc_id":
                cols[f.name].append(i)
            elif f.name == "text":
                cols[f.name].append(txt)
            elif f.name == "lang":
                cols[f.name].append("en")
            else:
                cols[f.name].append(None)
    d = str(tmp_path)
    pq.write_table(
        pa.table(cols).cast(sch), os.path.join(d, "documents.parquet")
    )
    out = q.corpus_heaps_fit(d).to_pandas()
    assert len(out) == 1
    assert 0.3 < out["beta"].iloc[0] < 0.9
    assert out["r2"].iloc[0] > 0.95


def test_gopher_rules_planted_documents(tmp_path):
    """Planted docs hit each rule: a 30-word prose doc with stopwords
    passes all; a 5-word doc fails the word-count band; a digit-only doc
    fails the alpha floor; a punctuation-heavy doc fails the symbol cap."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    prose = ("the cat and the dog ran to the house of a friend in town "
             "for a visit that was nice and calm on monday morning")
    short = "tiny doc of note"
    digits = " ".join(str(1000 + i) for i in range(30))
    punct = ("the cat !!! ??? ;;; and dog ### $$$ %%% ran to a house of "
             "the !!! ??? friend ;;; in ### town $$$ for %%% a visit !!!")
    sch = pq.read_schema(f"{SF}/documents.parquet")
    cols = {f.name: [] for f in sch}
    for i, txt in enumerate([prose, short, digits, punct]):
        for f in sch:
            if f.name == "doc_id":
                cols[f.name].append(i)
            elif f.name == "text":
                cols[f.name].append(txt)
            elif f.name == "lang":
                cols[f.name].append("en")
            else:
                cols[f.name].append(None)
    d = str(tmp_path)
    pq.write_table(
        pa.table(cols).cast(sch), os.path.join(d, "documents.parquet")
    )
    out = (
        q.doc_gopher_rules(d).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["pass_all"].tolist() == [1, 0, 0, 0]
    assert out.loc[1, "r_word_count"] == 0  # short
    assert out.loc[2, "r_alpha_frac"] == 0  # digits
    assert out.loc[2, "r_mean_word_len"] == 1  # 4-char words in band
    assert out.loc[3, "r_symbol_ratio"] == 0  # punct-heavy


def test_minhash_audit_est_is_dyadic_and_bounded():
    """est = k/64 must be an exact multiple of 1/64 in [0, 1]; err is
    |est − jac| of the emitted columns; pairs are unique with a < b."""
    out = q.doc_minhash_estimate_audit(SF).to_pandas()
    assert len(out) > 0
    k = out["est"].to_numpy() * 64
    assert (abs(k - k.round()) < 1e-9).all()
    assert ((out["est"] >= 0) & (out["est"] <= 1)).all()
    assert ((out["jac"] >= 0) & (out["jac"] <= 1)).all()
    recompute = (out["est"] - out["jac"]).abs().round(6)
    assert (abs(recompute - out["err"]) < 1e-9).all()
    assert (out["a"] < out["b"]).all()
    assert not out.duplicated(["a", "b"]).any()


def test_round4_batch62_queries_match_oracles():
    """Batch-62 additions (l-diversity, Z-order skipping, blocking
    quality) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "events_l_diversity",
        "events_zorder_skip",
        "doc_blocking_quality",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch62_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("documents", "events"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.events_l_diversity, 4),
        (q.events_zorder_skip, 4),
        (q.doc_blocking_quality, 7),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_l_diversity_planted_classes(tmp_path):
    """Two QI classes: (click, hour 0, band 0) with ONE user → at risk;
    (view, hour 1, band 0) with three users → diverse."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    sch = pq.read_schema(f"{SF}/events.parquet")
    H = 3_600_000_000
    rows = [
        (1, 10, 7, "click", 1.0),
        (2, 20, 7, "click", 2.0),
        (3, H + 10, 1, "view", 1.0),
        (4, H + 20, 2, "view", 1.0),
        (5, H + 30, 3, "view", 1.0),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    ).cast(sch)
    d = str(tmp_path)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = q.events_l_diversity(d).to_pandas()
    assert out["n_classes"].iloc[0] == 2
    assert out["min_user_diversity"].iloc[0] == 1
    assert out["n_classes_below_l"].iloc[0] == 1  # 3 users meets l = 3
    assert out["n_rows_at_risk"].iloc[0] == 2


def test_zorder_skip_structural_invariants():
    """Each layout's skippable count is bounded by its file count; the
    Z-order layout must not be WORSE than the best single-column layout
    by row-skip fraction vs its own total (it serves both predicates),
    and its file count respects the 8-bit prefix bound."""
    out = q.events_zorder_skip(SF).to_pandas().set_index("layout")
    assert set(out.index) == {"day_clustered", "user_mod", "zorder"}
    assert (out["n_skippable"] <= out["n_files"]).all()
    assert (out["n_rows_skipped"] >= 0).all()
    assert out.loc["zorder", "n_files"] <= 256
    # the audit's point: single-column user_mod layout cannot prune the
    # time predicate — Z-order must skip strictly more rows than it
    assert (
        out.loc["zorder", "n_rows_skipped"]
        > out.loc["user_mod", "n_rows_skipped"]
    )


def test_blocking_quality_metric_bounds_and_sampling():
    """Intersection ≤ both sides; ratios in [0, 1]; the deterministic
    sample (id % 5 == 0) reports a consistent 100-doc audit."""
    from neuroner_ray.sources.parquet import read_parquet_clean
    from neuroner_ray.stages.dedup import blocking_quality

    out = q.doc_blocking_quality(SF).to_pandas().iloc[0]
    assert out["n_cand_true"] <= min(out["n_cand"], out["n_true"])
    assert 0.0 <= out["pair_completeness"] <= 1.0
    assert 0.0 <= out["reduction_ratio"] <= 1.0
    assert out["n_all_pairs"] == out["n_docs"] * (out["n_docs"] - 1) // 2
    docs = read_parquet_clean(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    s = blocking_quality(docs, sample_mod=5).to_pandas().iloc[0]
    assert s["n_docs"] == 100
    assert s["n_all_pairs"] == 100 * 99 // 2
    assert 0.0 <= s["pair_completeness"] <= 1.0


def test_round4_batch63_queries_match_oracles():
    """Batch-63 additions (hard negatives, MMR, sortedness) against
    their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("embeddings", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "embedding_hard_negatives",
        "embedding_mmr_topk",
        "events_sortedness_audit",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch63_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("embeddings", "events"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.embedding_hard_negatives, 3),
        (q.embedding_mmr_topk, 3),
        (q.events_sortedness_audit, 7),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_hard_negatives_cross_label_and_chunking():
    """Every vector gets a negative, the negative's label differs, and
    the chunk count is an implementation knob (B=3 ≡ B=8)."""
    import pyarrow.parquet as pq

    a = q.embedding_hard_negatives(SF).to_pandas()
    lab = (
        pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "label"])
        .to_pandas()
        .set_index("vec_id")["label"]
    )
    assert len(a) == len(lab)
    assert (lab.loc[a["vec_id"]].to_numpy() != lab.loc[a["neg_id"]].to_numpy()).all()
    assert ((a["cos"] <= 1.0) & (a["cos"] >= -1.0)).all()
    b = q.embedding_hard_negatives(SF, n_chunks=3).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )


def test_mmr_rank1_is_top_relevance_and_distinct():
    """MMR's first pick ignores diversity, so it must equal the plain
    similarity top-1; all selections are distinct and never the query."""
    mmr = q.embedding_mmr_topk(SF).to_pandas()
    topk = q.similarity_topk(SF)
    topk = topk if isinstance(topk, pd.DataFrame) else topk.to_pandas()
    assert len(mmr) == 10
    assert mmr["rank"].tolist() == list(range(1, 11))
    assert mmr.loc[mmr["rank"] == 1, "vec_id"].iloc[0] == topk["vec_id"].iloc[0]
    assert not mmr["vec_id"].duplicated().any()
    assert (mmr["vec_id"] != 0).all()


def test_sortedness_audit_invariants_and_bucket_stability():
    """The fixture events stream is ts-monotone in event_id order
    (the late-arrival audit's verified property) → sortedness 1.0 with
    ONE run; user_id interleaves → far lower. Bucket count must not
    change the exact counts."""
    a = q.events_sortedness_audit(SF).to_pandas().set_index("col")
    assert a.loc["ts", "sortedness"] == 1.0
    assert a.loc["ts", "n_runs"] == 1
    assert a.loc["user_id", "sortedness"] < 0.9
    assert (
        a.loc["user_id", "n_runs"]
        == a.loc["user_id", "n_pairs"] - a.loc["user_id", "n_nondec"] + 1
    )
    b = q.events_sortedness_audit(SF, n_buckets=16).to_pandas().set_index("col")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_round4_batch64_queries_match_oracles():
    """Batch-64 additions (retrieval gain curve, quantile-sketch audit,
    FD audit) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("embeddings", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "embedding_retrieval_ndcg",
        "events_quantile_sketch_audit",
        "events_fd_audit",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch64_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("embeddings", "events"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.embedding_retrieval_ndcg, 5),
        (q.events_quantile_sketch_audit, 4),
        (q.events_fd_audit, 5),
    ):
        res = fn(d)
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_retrieval_gain_curve_invariants():
    """Gains reconstruct from rel and rank; ideal gains are the sorted
    upper bound (NDCG@10 ≤ 1 after consumer-side division); the curve's
    ranking agrees with similarity_topk's top-10 ids."""
    import numpy as np

    out = q.embedding_retrieval_ndcg(SF).to_pandas().sort_values("rank")
    assert len(out) == 10
    disc = np.log2(out["rank"].to_numpy() + 1.0)
    assert np.allclose(out["gain"], (out["rel"] / disc).round(6), atol=1e-9)
    assert (out["ideal_gain"] >= out["gain"] - 1e-12).all()
    ndcg = out["gain"].sum() / out["ideal_gain"].sum()
    assert 0.0 <= ndcg <= 1.0 + 1e-9
    topk = q.similarity_topk(SF)
    topk = topk if isinstance(topk, pd.DataFrame) else topk.to_pandas()
    assert out["vec_id"].tolist() == topk["vec_id"].tolist()


def test_quantile_sketch_audit_bounds():
    """The histogram estimate must stay inside the value domain and
    within one bin width of the exact answer (equi-width bound)."""
    import duckdb as dd

    out = q.events_quantile_sketch_audit(SF).to_pandas()
    lo, hi = dd.sql(
        f"SELECT min(value), max(value) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()
    width = (hi - lo) / 20.0
    assert (out["est"] >= lo - 1e-9).all() and (out["est"] <= hi + 1e-9).all()
    assert (out["err"] <= width + 1e-9).all()
    assert out["p"].tolist() == [0.5, 0.9, 0.99]


def test_fd_audit_key_constraint_holds():
    """event_id is a key, so event_id→user_id must HOLD with zero
    violations; the two non-key FDs must fail on the fixture."""
    out = q.events_fd_audit(SF).to_pandas().set_index("fd")
    assert out.loc["event_id->user_id", "holds"] == 1
    assert out.loc["event_id->user_id", "n_violating"] == 0
    assert out.loc["user_id->event_type", "holds"] == 0
    assert out.loc["event_type->value_band", "holds"] == 0
    assert (
        (out["violation_rate"] >= 0) & (out["violation_rate"] <= 1)
    ).all()


def test_round4_batch65_queries_match_oracles():
    """Batch-65 additions (encoding advisor, v-optimal histogram, dedup
    threshold curve) against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("documents", "events", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "lineitem_encoding_advisor",
        "events_voptimal_hist",
        "corpus_dedup_threshold_curve",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch65_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("documents", "events", "lineitem"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.lineitem_encoding_advisor, 7),
        (q.events_voptimal_hist, 6),
    ):
        out = fn(d).to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__
    # the threshold curve is defined on an empty corpus: zero pairs
    # survive at every threshold — 5 rows of zeros, not an empty table
    curve = q.corpus_dedup_threshold_curve(d).to_pandas()
    assert len(curve) == 5
    assert (curve["n_pairs"] == 0).all()


def test_voptimal_hist_partitions_and_beats_equiwidth():
    """Buckets partition the 256 pre-bins in order, row counts sum to
    the corpus, and total SSE is ≤ the fixed 8-bucket equi-width
    partition's SSE (the v-optimality guarantee vs any competitor)."""
    import duckdb as dd
    import numpy as np

    out = q.events_voptimal_hist(SF).to_pandas().sort_values("bucket")
    assert out["bin_lo"].iloc[0] == 0
    assert out["bin_hi"].iloc[-1] == 255
    assert (
        out["bin_lo"].iloc[1:].to_numpy()
        == out["bin_hi"].iloc[:-1].to_numpy() + 1
    ).all()
    n_events = dd.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert out["n_rows"].sum() == n_events

    def total_sse(df):
        sse = 0.0
        for r in df.itertuples():
            if r.n_rows:
                sse += r.sumsq_cents - (r.sum_cents**2) / r.n_rows
        return sse

    vopt_sse = total_sse(out)
    # equi-width competitor: pre-bins [0..31], [32..63], ... [224..255]
    cents = dd.sql(
        f"""SELECT CAST(round(value * 100) AS BIGINT) AS c
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchdf()["c"].to_numpy()
    lo, hi = cents.min(), cents.max()
    pb = (cents - lo) * 256 // (hi - lo + 1)
    eq = pd.DataFrame({"b": pb // 32, "c": cents}).groupby("b").agg(
        n_rows=("c", "size"),
        sum_cents=("c", "sum"),
        sumsq_cents=("c", lambda x: int((x.astype(np.int64) ** 2).sum())),
    )
    eq_sse = total_sse(eq.reset_index())
    assert vopt_sse <= eq_sse + 1e-6


def test_encoding_advisor_flags_consistent():
    out = q.lineitem_encoding_advisor(SF).to_pandas().set_index("column")
    assert (out["use_dict"] == (out["dict_bytes"] < out["raw_bytes"])).all()
    # 1-byte flag columns: dictionary is a clear win
    assert out.loc["l_returnflag", "n_distinct"] <= 3
    assert out.loc["l_returnflag", "use_dict"] == 1
    assert (out["ratio"] > 0).all()


def test_dedup_threshold_curve_monotone():
    out = q.corpus_dedup_threshold_curve(SF).to_pandas().sort_values(
        "threshold"
    )
    assert out["threshold"].tolist() == [0.5, 0.6, 0.7, 0.8, 0.9]
    assert (np.diff(out["n_pairs"].to_numpy()) <= 0).all()


import numpy as np  # noqa: E402  (used by late batch tests)


def test_round4_batch66_queries_match_oracles():
    """Batch-66 additions (join pruning, LTTB, IVF recall) against
    their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("embeddings", "events", "lineitem", "orders"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "lineitem_join_pruning_audit",
        "events_hourly_lttb",
        "embedding_ivf_recall_audit",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_batch66_ops_survive_empty_input(tmp_path):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path)
    for t in ("embeddings", "events", "lineitem", "orders"):
        sch = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    for fn, ncols in (
        (q.lineitem_join_pruning_audit, 6),
        (q.events_hourly_lttb, 3),
        (q.embedding_ivf_recall_audit, 3),
    ):
        out = fn(d)
        out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        assert len(out) == 0, fn.__name__
        assert len(out.columns) == ncols, fn.__name__


def test_join_pruning_perfect_dominates_zonemap():
    """Per layout: zone maps can never skip MORE than the perfect
    (membership) bound, and scanned-row counts order the same way;
    every count is bounded by its file total."""
    out = q.lineitem_join_pruning_audit(SF).to_pandas().set_index("layout")
    assert set(out.index) == {"orderkey_range", "shipdate_clustered"}
    assert (out["zm_skippable"] <= out["perfect_skippable"]).all()
    assert (out["rows_scanned_perfect"] <= out["rows_scanned_zm"]).all()
    assert (out["zm_skippable"] <= out["n_files"]).all()
    assert (out["perfect_skippable"] <= out["n_files"]).all()


def test_lttb_preserves_endpoints_and_extremes():
    """LTTB keeps both endpoints, emits monotone hours, and its kept
    points include the series' global maximum (the visual-fidelity
    property the algorithm exists for)."""
    out = q.events_hourly_lttb(SF).to_pandas().sort_values("idx")
    full = (
        duckdb.sql(
            f"""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS h,
                       count(*)::BIGINT AS n
                FROM read_parquet('{SF}/events.parquet') GROUP BY 1"""
        )
        .fetchdf()
        .sort_values("h")
    )
    assert out["hour_us"].iloc[0] == full["h"].iloc[0]
    assert out["hour_us"].iloc[-1] == full["h"].iloc[-1]
    assert out["hour_us"].is_monotonic_increasing
    assert len(out) == min(100, len(full))
    assert out["n"].max() == full["n"].max()


def test_ivf_recall_bounds():
    """Recall is a true overlap fraction (bounded, consistent with the
    counts), and the top-1 sits inside the probed lists on the fixture;
    at k = 5/10 the default probe setting genuinely loses recall here —
    the audit's purpose is to surface exactly that."""
    out = q.embedding_ivf_recall_audit(SF).to_pandas()
    assert out["k"].tolist() == [1, 5, 10]
    assert ((out["recall"] > 0.0) & (out["recall"] <= 1.0)).all()
    assert (out["n_overlap"] <= out["k"]).all()
    assert (
        out["recall"] == (out["n_overlap"] / out["k"]).round(6)
    ).all()
    assert out.loc[out["k"] == 1, "recall"].iloc[0] == 1.0


def test_round4_batch67_queries_match_oracles():
    """Batch-67 additions (clustering agreement, curriculum order, HHI)
    against their registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("documents", "embeddings", "orders", "customer", "nation"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in (
        "cluster_agreement_lex_sem",
        "doc_curriculum_order",
        "nation_customer_hhi",
    ):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_cluster_agreement_bounds():
    """Pair-Jaccard agreement is a true overlap fraction; the joint
    partition's pairs are bounded by both marginals."""
    out = q.cluster_agreement_lex_sem(SF).to_pandas().iloc[0]
    assert out["n_pairs_both"] <= min(out["n_pairs_lex"], out["n_pairs_sem"])
    assert 0.0 <= out["agreement"] <= 1.0
    assert out["n_ids"] > 0


def test_curriculum_difficulty_reconstructs():
    """Difficulty reconstructs from its three components on a sample,
    and every score is inside [0, 1]."""
    import re

    out = q.doc_curriculum_order(SF).to_pandas()
    assert ((out["difficulty"] >= 0) & (out["difficulty"] <= 1)).all()
    assert ((out["rare_frac"] >= 0) & (out["rare_frac"] <= 1)).all()
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') LIMIT 20"
    ).fetchdf()
    word_re = re.compile(r"[a-z0-9_]+")
    for r in docs.itertuples():
        nw = len(word_re.findall((r.text or "").lower()))
        row = out[out["doc_id"] == r.doc_id].iloc[0]
        assert row["n_words"] == nw


def test_hhi_bounds_and_monopoly_fixture(tmp_path):
    """HHI lies in (0, 1]; a nation with a single customer is a
    monopoly with HHI exactly 1."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = q.nation_customer_hhi(SF).to_pandas()
    assert ((out["hhi"] > 0) & (out["hhi"] <= 1)).all()
    d = str(tmp_path)
    osch = pq.read_schema(f"{SF}/orders.parquet")
    csch = pq.read_schema(f"{SF}/customer.parquet")
    nsch = pq.read_schema(f"{SF}/nation.parquet")

    def mk(sch, cols):
        data = {}
        n = len(next(iter(cols.values())))
        for f in sch:
            data[f.name] = cols.get(
                f.name, pa.nulls(n, f.type).to_pylist()
            )
        return pa.table(data).cast(sch)

    pq.write_table(
        mk(
            osch,
            {
                "o_orderkey": [1, 2, 3],
                "o_custkey": [10, 10, 20],
                "o_totalprice": [100.0, 300.0, 500.0],
            },
        ),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        mk(csch, {"c_custkey": [10, 20], "c_nationkey": [0, 1]}),
        os.path.join(d, "customer.parquet"),
    )
    pq.write_table(
        mk(
            nsch,
            {"n_nationkey": [0, 1], "n_name": ["SOLO_A", "SOLO_B"]},
        ),
        os.path.join(d, "nation.parquet"),
    )
    r = q.nation_customer_hhi(d).to_pandas().set_index("n_name")
    assert r.loc["SOLO_A", "hhi"] == 1.0  # one customer = monopoly
    assert r.loc["SOLO_B", "hhi"] == 1.0
    assert r.loc["SOLO_A", "n_customers"] == 1


def test_round4_batch68_queries_match_oracles():
    """Batch-68 additions (burstiness, Simpson diversity) against their
    registered oracles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("events_user_burstiness", "events_type_simpson"):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )


def test_burstiness_regular_vs_bursty_fixture(tmp_path):
    """A perfectly regular user reads B = −1; a heavily bursty one
    (many tiny gaps + one huge gap) reads B > 0."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    sch = pq.read_schema(f"{SF}/events.parquet")
    rows = []
    # user 1: every 100 s exactly (B = -1)
    for i in range(10):
        rows.append((i + 1, i * 100_000_000, 1))
    # user 2: 1-s bursts then a week apart
    t = 0
    for i in range(9):
        gap = 1_000_000 if i % 3 else 604_800_000_000
        t += gap
        rows.append((100 + i, t, 2))
    t_ = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    ).cast(sch)
    d = str(tmp_path)
    pq.write_table(t_, os.path.join(d, "events.parquet"))
    out = q.events_user_burstiness(d).to_pandas().set_index("user_id")
    assert out.loc[1, "burstiness"] == -1.0
    assert out.loc[2, "burstiness"] > 0.2
    assert out.loc[1, "mean_gap_s"] == 100.0


def test_simpson_bounds_and_single_band_fixture(tmp_path):
    """λ lies in [0, 1]; a type whose every value falls in ONE band has
    λ = 1 (zero diversity)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = q.events_type_simpson(SF).to_pandas()
    assert ((out["simpson"] >= 0) & (out["simpson"] <= 1)).all()
    sch = pq.read_schema(f"{SF}/events.parquet")
    t_ = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(["mono"] * 3, pa.string()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),  # one $50 band
            "props": pa.array(["{}"] * 3, pa.string()),
        }
    ).cast(sch)
    d = str(tmp_path)
    pq.write_table(t_, os.path.join(d, "events.parquet"))
    r = q.events_type_simpson(d).to_pandas()
    assert r["simpson"].iloc[0] == 1.0
    assert r["n_bands"].iloc[0] == 1


def test_round4_batch69_load_factor_matches_oracle_and_bounds():
    """Load factor against its oracle; λ ≥ 1 always (peak ≥ mean), and
    = 1 only for a perfectly flat hourly profile."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    res = e.queries()["events_type_load_factor"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(c.execute(e.oracle_sql()["events_type_load_factor"]).fetchdf())
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    assert (got["load_factor"] >= 1.0).all()
    assert (got["peak_hour_events"] <= got["n_events"]).all()


def test_round4_batch70_lorenz_matches_oracle_and_shape():
    """Lorenz points against the oracle; the curve is convex-increasing
    (shares non-decreasing, below the diagonal) and ends at 100%."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    res = e.queries()["events_value_lorenz"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(c.execute(e.oracle_sql()["events_value_lorenz"]).fetchdf())
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    out = got.sort_values("decile")
    assert out["cum_value_share"].is_monotonic_increasing
    assert out["cum_value_share"].iloc[-1] == 1.0
    # Lorenz curves sit on or below the diagonal
    assert (
        out["cum_value_share"] <= out["decile"] / 10.0 + 1e-9
    ).all()


def test_round4_batch71_dataset_card_matches_oracle():
    """The events dataset card against its oracle; internal consistency
    (span covers the data, zero-value count bounded by rows)."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    res = e.queries()["events_dataset_card"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(c.execute(e.oracle_sql()["events_dataset_card"]).fetchdf())
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    row = got.iloc[0]
    assert row["ts_min_us"] <= row["ts_max_us"]
    assert row["span_days"] >= 1
    assert row["n_zero_value"] <= row["n_rows"]
    assert row["n_users"] <= row["n_rows"]


def test_round4_batch72_srm_matches_oracle_and_balance():
    """SRM χ² against its oracle; the md5-parity split on the fixture
    must be UNFLAGGED (χ² below the 1-dof α=.05 threshold) — a planted
    imbalance would read far above it."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    res = e.queries()["events_ab_srm_check"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(c.execute(e.oracle_sql()["events_ab_srm_check"]).fetchdf())
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    row = got.iloc[0]
    assert row["srm_chi2"] < 3.84  # healthy hash split
    assert row["n_users_a"] + row["n_users_b"] > 0


def test_round4_batch73_queries_match_oracles_and_properties():
    """Batch-73 (conditional-entropy terms, compression ratio) against
    their oracles; H(next|prev) summed from terms is bounded by log2 of
    the type count, and templated text compresses harder than unique
    text."""
    import os
    import zlib

    import numpy as np

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("events_type_cond_entropy_terms", "doc_compression_ratio"):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    terms = queries["events_type_cond_entropy_terms"](SF)
    terms = terms if isinstance(terms, pd.DataFrame) else terms.to_pandas()
    H = terms["term"].sum() / terms["n_pn"].sum()
    n_types = terms["prev_type"].nunique()
    assert 0.0 <= H <= np.log2(n_types) + 1e-9
    # direct zlib sanity: repeated text compresses below unique text
    rep = len(zlib.compress((b"the cat sat " * 50), 6)) / (12 * 50)
    uniq = len(zlib.compress(bytes(range(256)) * 2, 6)) / 512
    assert rep < uniq


def test_round4_batch74_queries_match_oracles_and_consistency():
    """Batch-74 (dedup savings, selectivity audit) against their
    oracles; savings fractions are consistent with the counts, and
    every pairwise observed selectivity is bounded by its singles."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("documents", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("doc_dedup_savings", "lineitem_selectivity_audit"):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    sv = queries["doc_dedup_savings"](SF)
    sv = (sv if isinstance(sv, pd.DataFrame) else sv.to_pandas()).iloc[0]
    assert sv["n_survivors"] <= sv["n_docs"]
    assert sv["survivor_bytes"] <= sv["total_bytes"]
    assert 0.0 <= sv["doc_savings_frac"] < 1.0
    sel = queries["lineitem_selectivity_audit"](SF)
    sel = sel if isinstance(sel, pd.DataFrame) else sel.to_pandas()
    assert (sel["n_ij"] <= sel[["n_i", "n_j"]].min(axis=1)).all()
    assert (sel["correlation_ratio"] >= 0).all()


def test_round4_batch75_queries_match_oracles_and_fixtures(tmp_path):
    """Batch-75 (linenumber gap audit, first-touch attribution) against
    their oracles; a planted gapped/duplicated order is flagged; the
    first-click ts is never after the purchase."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("events", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("lineitem_linenumber_gap_audit", "events_purchase_first_click"):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    ft = queries["events_purchase_first_click"](SF).to_pandas()
    assert (ft["first_click_ts"] < ft["ts"]).all()
    # planted integrity violations: order 1 = contiguous 1..2; order 2 =
    # duplicate line 1; order 3 = gap (1, 3)
    sch = pq.read_schema(f"{SF}/lineitem.parquet")
    cols = {f.name: [] for f in sch}
    rows = [(1, 1), (1, 2), (2, 1), (2, 1), (3, 1), (3, 3)]
    for ok, ln in rows:
        for f in sch:
            if f.name == "l_orderkey":
                cols[f.name].append(ok)
            elif f.name == "l_linenumber":
                cols[f.name].append(ln)
            elif f.name in ("l_partkey", "l_suppkey"):
                cols[f.name].append(1)
            elif f.name in ("l_returnflag", "l_linestatus"):
                cols[f.name].append("A")
            elif f.name == "l_shipdate":
                cols[f.name].append(0)
            else:
                cols[f.name].append(1.0)
    d = str(tmp_path)
    pq.write_table(pa.table(cols).cast(sch), os.path.join(d, "lineitem.parquet"))
    g = queries["lineitem_linenumber_gap_audit"](d)
    g = (g if isinstance(g, pd.DataFrame) else g.to_pandas()).iloc[0]
    assert g["n_orders"] == 3
    assert g["n_dup_lines"] == 1
    assert g["n_gapped"] >= 1  # order 3; order 2 also gapped (mx != nd)
    assert g["n_contiguous"] == 1


def test_round4_batch76_queries_match_oracles_and_anova():
    """Batch-76 (ANOVA terms, source vocab exclusivity) against their
    oracles; F assembled from the terms is positive and finite, and
    every within-term is non-negative (it is a sum of squares)."""
    import os

    import numpy as np

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("events_value_anova_terms", "corpus_source_vocab_overlap"):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-6,
            rtol=0, obj=name,
        )
    terms = queries["events_value_anova_terms"](SF).to_pandas()
    assert (terms["within_term"] >= -1e-6).all()
    N = terms["n"].sum()
    S = terms["sum_cents"].sum()
    k = len(terms)
    ssb = terms["between_term"].sum() - S * S / N
    ssw = terms["within_term"].sum()
    F = (ssb / (k - 1)) / (ssw / (N - k))
    assert np.isfinite(F) and F >= 0
    ov = queries["corpus_source_vocab_overlap"](SF).to_pandas()
    assert ((ov["exclusive_frac"] >= 0) & (ov["exclusive_frac"] <= 1)).all()
    assert (ov["n_exclusive"] <= ov["n_types"]).all()


def test_round4_batch77_reconciliation_matches_oracle_and_fixture(tmp_path):
    """Reconciliation audit against its oracle; a planted CONSISTENT
    order (header = exact line formula) reads as an exact match."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("orders", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    res = e.queries()["orders_total_reconciliation"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(
        c.execute(e.oracle_sql()["orders_total_reconciliation"]).fetchdf()
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    # planted: one order whose header exactly equals its two lines'
    # formula (100.00·(1-0.10)·(1+0.05) + 200.00·1·1 = 294.50), one
    # order with a wrong header, one headerless line ignored
    osch = pq.read_schema(f"{SF}/orders.parquet")
    lsch = pq.read_schema(f"{SF}/lineitem.parquet")

    def mk(sch, cols):
        n = len(next(iter(cols.values())))
        data = {}
        for f in sch:
            if f.name in cols:
                data[f.name] = cols[f.name]
            elif pa.types.is_string(f.type):
                data[f.name] = ["x"] * n
            elif pa.types.is_floating(f.type):
                data[f.name] = [0.0] * n
            else:
                data[f.name] = [0] * n
        return pa.table(data).cast(sch)

    d = str(tmp_path)
    pq.write_table(
        mk(
            osch,
            {"o_orderkey": [1, 2], "o_custkey": [1, 1],
             "o_totalprice": [294.50, 999.99]},
        ),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        mk(
            lsch,
            {
                "l_orderkey": [1, 1, 2, 3],
                "l_linenumber": [1, 2, 1, 1],
                "l_extendedprice": [100.0, 200.0, 50.0, 10.0],
                "l_discount": [0.10, 0.0, 0.0, 0.0],
                "l_tax": [0.05, 0.0, 0.0, 0.0],
            },
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    r = e.queries()["orders_total_reconciliation"](d)
    r = (r if isinstance(r, pd.DataFrame) else r.to_pandas()).iloc[0]
    assert r["n_orders_checked"] == 2
    assert r["n_exact_match"] == 1
    assert r["n_orders_no_lines"] == 0
    assert r["max_abs_diff_cents"] == 94999  # 999.99 vs 50.00


def test_round4_batch78_queries_match_oracles_and_decay():
    """Batch-78 (time-decay attribution, degree CCDF) against their
    oracles; weights decay monotonically with Δ and sit in (0, 1];
    the CCDF starts at 1 and is non-increasing in degree."""
    import os

    import numpy as np

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    res = e.queries()["events_attribution_time_decay"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(
        c.execute(e.oracle_sql()["events_attribution_time_decay"]).fetchdf()
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    td = got
    assert ((td["w_raw"] > 0) & (td["w_raw"] <= 1)).all()
    assert (td["delta_s"] >= 0).all() and (td["delta_s"] <= 604800).all()
    # same purchase: larger delta => weight no larger
    srt = td.sort_values(["purchase_id", "delta_s"])
    within = srt.groupby("purchase_id")["w_raw"].apply(
        lambda s: (np.diff(s.to_numpy()) <= 1e-12).all()
    )
    assert within.all()
    ccdf = e.queries()["kg_degree_ccdf"](SF)
    ccdf = (
        ccdf if isinstance(ccdf, pd.DataFrame) else ccdf.to_pandas()
    ).sort_values("degree")
    assert ccdf["ccdf"].iloc[0] == 1.0
    assert (np.diff(ccdf["ccdf"].to_numpy()) <= 1e-12).all()


def test_round4_batch79_component_sizes_conserve_nodes():
    """Component-size histogram against its oracle replica path (the
    kg family is gated by check_oracles; here pin the conservation law:
    Σ size·n_components = the node universe of kg_components)."""
    import __ray_entry__ as e

    hist = e.queries()["kg_component_sizes"](SF)
    hist = hist.to_pandas() if hasattr(hist, "to_pandas") else hist
    labels = e.queries()["kg_components"](SF)
    labels = labels.to_pandas() if hasattr(labels, "to_pandas") else labels
    assert (hist["size"] * hist["n_components"]).sum() == len(labels)
    assert (hist["size"] > 0).all() and (hist["n_components"] > 0).all()


def test_round4_batch80_elasticity_matches_oracle_and_sign():
    """Elasticity against its oracle; on TPC-H-shaped lines quantity
    and unit price are independent draws, so |elasticity| is small and
    r² near zero — the honest no-relationship read."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    res = e.queries()["lineitem_price_qty_elasticity"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(
        c.execute(e.oracle_sql()["lineitem_price_qty_elasticity"]).fetchdf()
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-4, rtol=0
    )
    row = got.iloc[0]
    assert 0.0 <= row["r2"] <= 1.0
    assert row["n_cells"] >= 2


def test_round4_batch81_langid_confusion_matches_oracle_and_sums():
    """Confusion matrix against its oracle; cell counts conserve the
    corpus and the diagonal agrees with doc_langid's per-doc output."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    res = e.queries()["doc_langid_confusion"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(c.execute(e.oracle_sql()["doc_langid_confusion"]).fetchdf())
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=0, rtol=0
    )
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert got["n"].sum() == n_docs


def test_round4_batch82_mde_matches_oracle_and_scaling():
    """MDE against its oracle; the detectable effect shrinks with more
    users (1/√n), so MDE at the fixture scale exceeds the sf0.01 one
    only if the sample is smaller; structurally MDE > 0 and rel = abs/p."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    res = e.queries()["events_ab_power_mde"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(c.execute(e.oracle_sql()["events_ab_power_mde"]).fetchdf())
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    r = got.iloc[0]
    assert r["mde_abs"] > 0
    assert abs(r["mde_rel"] - r["mde_abs"] / r["pooled_rate"]) < 1e-5


def test_round4_batch83_queries_match_oracles_and_conserve():
    """Batch-83 (aging report, predicate census) against oracles; the
    aging bands conserve the order count and the predicate weight
    shares sum to 1."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    res = e.queries()["orders_aging_report"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(c.execute(e.oracle_sql()["orders_aging_report"]).fetchdf())
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=0, rtol=0
    )
    n_orders = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert got["n_orders"].sum() == n_orders
    pc_ = e.queries()["kg_predicate_census"](SF)
    pc_ = pc_.to_pandas() if hasattr(pc_, "to_pandas") else pc_
    assert abs(pc_["weight_share"].sum() - 1.0) < 1e-4
    assert (pc_["n_edges"] > 0).all()


def test_round4_batch84_queries_match_oracles_and_rates(tmp_path):
    """Batch-84 (node type census, props key census) — key census vs
    oracle + a planted multi-key JSON fixture."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    res = e.queries()["events_props_key_census"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(c.execute(e.oracle_sql()["events_props_key_census"]).fetchdf())
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    assert ((got["presence_rate"] > 0) & (got["presence_rate"] <= 1)).all()
    nt = e.queries()["kg_node_type_census"](SF)
    nt = nt.to_pandas() if hasattr(nt, "to_pandas") else nt
    assert abs(nt["mention_share"].sum() - 1.0) < 1e-4
    # planted: keys a (2/3 rows), b (1/3), repeated key counted once
    sch = pq.read_schema(f"{SF}/events.parquet")
    t_ = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(["click"] * 3, pa.string()),
            "value": pa.array([1.0] * 3, pa.float64()),
            "props": pa.array(
                ['{"a": 1, "b": 2}', '{"a": 3, "a": 4}', "{}"], pa.string()
            ),
        }
    ).cast(sch)
    d = str(tmp_path)
    pq.write_table(t_, os.path.join(d, "events.parquet"))
    r = e.queries()["events_props_key_census"](d)
    r = (r.to_pandas() if hasattr(r, "to_pandas") else r).set_index("key")
    assert r.loc["a", "n_rows"] == 2
    assert r.loc["b", "n_rows"] == 1


def test_round4_batch85_churn_sweep_matches_oracle_and_monotone():
    """Churn sweep vs oracle; longer thresholds can only shrink the
    churned set (monotone non-increasing)."""
    import os

    import numpy as np

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    res = e.queries()["events_churn_threshold_sweep"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(
        c.execute(e.oracle_sql()["events_churn_threshold_sweep"]).fetchdf()
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    srt = got.sort_values("threshold_days")
    assert (np.diff(srt["n_churned"].to_numpy()) <= 0).all()
    assert (srt["n_churned"] <= srt["n_users"]).all()


def test_round4_batch86_edge_hygiene_bounds():
    """Edge hygiene audit: counts internally consistent (parallel
    groups bounded by edge pairs, max bundle ≥ 1, no self-loops in a
    subject≠object triple extraction)."""
    import __ray_entry__ as e

    r = e.queries()["kg_edge_hygiene_audit"](SF)
    r = (r.to_pandas() if hasattr(r, "to_pandas") else r).iloc[0]
    assert r["n_edges"] > 0
    assert 0 <= r["n_self_loops"] <= r["n_edges"]
    assert r["max_parallel"] >= 1
    assert r["n_parallel_groups"] <= r["n_edges"] // 2 + 1


def test_round4_batch87_cosine_hist_matches_oracle_and_conserves():
    """Cosine histogram vs oracle; bins conserve the sample pair count
    C(S, 2)."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    res = e.queries()["embedding_pair_cosine_hist"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(
        c.execute(e.oracle_sql()["embedding_pair_cosine_hist"]).fetchdf()
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    s = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/embeddings.parquet') WHERE vec_id % 5 = 0"
    ).fetchone()[0]
    assert got["n_pairs"].sum() == s * (s - 1) // 2


def test_round4_batch88_queries_match_oracles_and_bounds():
    """Batch-88 (hapax rate, price-point census) vs oracles; the
    closed-gazetteer fixture reads hapax_rate == 0 (the templated-text
    signal) and price shares are bounded."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = e.oracle_sql()
    queries = e.queries()
    for name in ("corpus_hapax_rate", "events_price_point_census"):
        res = queries[name](SF)
        got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        want = _norm(c.execute(sqls[name]).fetchdf())
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-9,
            rtol=0, obj=name,
        )
    hx = queries["corpus_hapax_rate"](SF)
    hx = (hx.to_pandas() if hasattr(hx, "to_pandas") else hx).iloc[0]
    assert hx["hapax_rate"] == 0.0  # closed vocabulary: no singletons
    assert hx["n_hapax"] <= hx["n_types"]
    pp = queries["events_price_point_census"](SF)
    pp = pp.to_pandas() if hasattr(pp, "to_pandas") else pp
    assert ((pp["share"] >= 0) & (pp["share"] <= 1)).all()


def test_round4_batch89_session_position_matches_oracle_and_bounds():
    """Session-position profile vs oracle; shares in [0, 1] and the
    n_buckets knob does not change the exact counts."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    res = e.queries()["events_type_session_position"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(
        c.execute(e.oracle_sql()["events_type_session_position"]).fetchdf()
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    assert ((got["position_share"] >= 0) & (got["position_share"] <= 1)).all()
    b = q.events_type_session_position(SF, n_buckets=16)
    b = _norm(b.to_pandas() if hasattr(b, "to_pandas") else b)
    pd.testing.assert_frame_equal(got, b, check_dtype=False)


def test_round4_batch90_queries_match_oracles_and_conserve():
    """Batch-90 (return-rate trend, surface variety) — rates bounded,
    and the alias histogram conserves the node universe."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    res = e.queries()["lineitem_return_rate_monthly"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(
        c.execute(e.oracle_sql()["lineitem_return_rate_monthly"]).fetchdf()
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    assert ((got["return_rate"] >= 0) & (got["return_rate"] <= 1)).all()
    sv = e.queries()["kg_surface_variety"](SF)
    sv = sv.to_pandas() if hasattr(sv, "to_pandas") else sv
    nodes = e.queries()["kg_nodes"](SF)
    n_nodes = nodes.count() if hasattr(nodes, "count") else len(nodes)
    assert sv["n_entities"].sum() == n_nodes
    assert (sv["n_surfaces"] >= 1).all()


def test_round4_batch91_runs_test_matches_oracle_and_fixture(tmp_path):
    """Runs test vs oracle; a perfectly alternating planted sequence
    reads maximal runs (z > 0), a fully clumped one minimal (z < 0)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    res = e.queries()["events_runs_test"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(c.execute(e.oracle_sql()["events_runs_test"]).fetchdf())
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    sch = pq.read_schema(f"{SF}/events.parquet")

    def mk(types):
        n = len(types)
        return pa.table(
            {
                "event_id": pa.array(list(range(1, n + 1)), pa.int64()),
                "ts": pa.array(list(range(n)), pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ).cast(sch)

    d = str(tmp_path)
    pq.write_table(
        mk(["purchase", "click"] * 20), os.path.join(d, "events.parquet")
    )
    alt = e.queries()["events_runs_test"](d)
    alt = (alt.to_pandas() if hasattr(alt, "to_pandas") else alt).iloc[0]
    assert alt["n_runs"] == 40 and alt["z_stat"] > 3
    pq.write_table(
        mk(["purchase"] * 20 + ["click"] * 20),
        os.path.join(d, "events.parquet"),
    )
    clump = e.queries()["events_runs_test"](d)
    clump = (
        clump.to_pandas() if hasattr(clump, "to_pandas") else clump
    ).iloc[0]
    assert clump["n_runs"] == 2 and clump["z_stat"] < -3


def test_round4_batch92_sentence_dup_matches_oracle_and_fixture(tmp_path):
    """Sentence-dup census vs oracle; a planted boilerplate corpus
    (same sentence in every doc) reads the expected dup share."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    res = e.queries()["corpus_sentence_dup_census"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(
        c.execute(e.oracle_sql()["corpus_sentence_dup_census"]).fetchdf()
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    sch = pq.read_schema(f"{SF}/documents.parquet")
    cols = {f.name: [] for f in sch}
    texts = ["same footer here. unique alpha!", "same footer here. unique beta?"]
    for i, txt in enumerate(texts):
        for f in sch:
            if f.name == "doc_id":
                cols[f.name].append(i)
            elif f.name == "text":
                cols[f.name].append(txt)
            elif f.name == "lang":
                cols[f.name].append("en")
            else:
                cols[f.name].append(None)
    d = str(tmp_path)
    pq.write_table(pa.table(cols).cast(sch), os.path.join(d, "documents.parquet"))
    r = e.queries()["corpus_sentence_dup_census"](d)
    r = (r.to_pandas() if hasattr(r, "to_pandas") else r).iloc[0]
    assert r["n_occurrences"] == 4
    assert r["n_distinct"] == 3
    assert r["n_dup_occurrences"] == 1


def test_round4_batch93_bursty_terms_matches_oracle_and_order():
    """Bursty terms vs oracle; burstiness ≥ 1 by construction (cf ≥ df)
    and the list is sorted by the exact ratio."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    res = e.queries()["corpus_bursty_terms_top20"](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    want = c.execute(e.oracle_sql()["corpus_bursty_terms_top20"]).fetchdf()
    pd.testing.assert_frame_equal(
        _norm(got), _norm(want), check_dtype=False, check_exact=False,
        atol=1e-9, rtol=0,
    )
    assert (got["cf"] >= got["df"]).all()
    assert (got["burstiness"] >= 1.0).all()
    ratios = (got["cf"] / got["df"]).to_numpy()
    assert (ratios[:-1] >= ratios[1:] - 1e-12).all()


def test_round4_batch94_queries_match_oracles_and_conserve():
    """Batch-94 (norm histogram, transcript profile) — bins conserve
    the vector count; role shares sum to 1."""
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = SF
    import __ray_entry__ as e

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    res = e.queries()["embedding_norm_hist"](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(c.execute(e.oracle_sql()["embedding_norm_hist"]).fetchdf())
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchone()[0]
    assert got["n_vecs"].sum() == n_vecs
    tp = e.queries()["kg_transcript_profile"](SF)
    tp = tp.to_pandas() if hasattr(tp, "to_pandas") else tp
    assert abs(tp["share"].sum() - 1.0) < 1e-4
    assert set(tp["role"]) == {"user", "assistant", "tool"}


def test_round4_batch95_mention_density_conserves_turns():
    """Density histogram conserves the transcript-turn universe and
    its weighted sum equals the mentions table size."""
    import __ray_entry__ as e
    from neuroner_ray.sources.parquet import read_parquet_clean
    from neuroner_ray.sources.synth_transcripts import transcripts_dir_for

    h = e.queries()["kg_mention_density_hist"](SF)
    h = h.to_pandas() if hasattr(h, "to_pandas") else h
    total_turns = read_parquet_clean(
        transcripts_dir_for(SF), columns=["conv_id"]
    ).count()
    assert h["n_turns"].sum() == total_turns
    m = e.queries()["kg_mentions"](SF)
    n_mentions = m.count() if hasattr(m, "count") else len(m)
    assert (h["n_mentions"] * h["n_turns"]).sum() == n_mentions
