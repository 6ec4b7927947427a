"""Sessionization semantics (gap-based windows per key)."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from neuroner_ray.stages.sessions import sessionize


def test_sessionize_gap_splits():
    base = pd.Timestamp("2026-01-01")
    rows = []
    # user 1: two sessions (3 events, gap > 30min, 2 events)
    for m in (0, 5, 10, 60, 70):
        rows.append({"user_id": 1, "ts": base + pd.Timedelta(minutes=m)})
    # user 2: one session
    for m in (0, 29):
        rows.append({"user_id": 2, "ts": base + pd.Timedelta(minutes=m)})
    out = sessionize(rd.from_items(rows), gap_minutes=30).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_idx")
    assert list(u1["n_events"]) == [3, 2]
    assert u1.iloc[0]["start_ts"] == base
    assert u1.iloc[1]["start_ts"] == base + pd.Timedelta(minutes=60)
    u2 = out[out["user_id"] == 2]
    assert list(u2["n_events"]) == [2]


def test_exact_30min_gap_is_same_session():
    base = pd.Timestamp("2026-01-01")
    rows = [
        {"user_id": 1, "ts": base},
        {"user_id": 1, "ts": base + pd.Timedelta(minutes=30)},  # == gap → same
        {"user_id": 1, "ts": base + pd.Timedelta(minutes=61)},  # > gap → new
    ]
    out = sessionize(rd.from_items(rows), gap_minutes=30).to_pandas()
    assert sorted(out["n_events"]) == [1, 2]


def test_two_level_sessionize_equals_single_pass():
    """The time-bucketed scale path (bounded per-task groups) must produce
    exactly the single-shuffle result, including runs spanning bucket
    boundaries."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from neuroner_ray.stages.sessions import sessionize

    rng = np.random.RandomState(7)
    base = 1_700_000_000_000_000  # us
    rows_u, rows_t = [], []
    for uid in range(5):
        t = base + uid * 1_000_000
        for _ in range(200):
            # mixed gaps: some < 30 min (same session), some > (new session),
            # many crossing 6h bucket boundaries
            t += int(rng.choice([60, 600, 1800, 2400, 7200, 90000]) * 1e6)
            rows_u.append(uid)
            rows_t.append(t)
    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(rows_u, pa.int64()),
                "ts": pa.array(rows_t, pa.timestamp("us")),
            }
        )
    )
    a = (
        sessionize(ev, gap_minutes=30.0)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    b = (
        sessionize(ev, gap_minutes=30.0, time_bucket_hours=6.0)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    assert a.equals(b), (a.head(), b.head())


def test_two_level_asof_join_equals_single_pass(tmp_path):
    """events_purchase_last_click(time_bucket_hours=...) — the skew-bounded
    two-level as-of join — must equal the single-shuffle path, including a
    planted hot user and purchase-only / click-only users."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines.queries import events_purchase_last_click

    rng = np.random.RandomState(11)
    base = 1_700_000_000_000_000  # us
    eid = 0
    uids, etypes, tss, eids = [], [], [], []

    def add(uid, etype, t):
        nonlocal eid
        uids.append(uid)
        etypes.append(etype)
        tss.append(t)
        eids.append(eid)
        eid += 1

    # hot user 1: 2000 events over many 6h buckets; long purchase-only runs
    # (pre-first-click purchases in their buckets) interleaved with clicks
    t = base
    for i in range(2000):
        t += int(rng.choice([300, 3600, 25000]) * 1e6)
        add(1, "click" if rng.rand() < 0.2 else "purchase", t)
    # user 2: purchases before any click ever (dropped), then one click+buy
    add(2, "purchase", base + 10**6)
    add(2, "click", base + 3 * 10**6)
    add(2, "purchase", base + 4 * 10**6)
    # user 3: clicks only; user 4: purchases only (all dropped)
    add(3, "click", base + 10**6)
    add(4, "purchase", base + 10**6)
    # user 5: purchase exactly at click ts (strictly-earlier ⇒ no match)
    add(5, "click", base + 10**6)
    add(5, "purchase", base + 10**6)

    tab = pa.table(
        {
            "event_id": pa.array(eids, pa.int64()),
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(etypes, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))

    single = (
        events_purchase_last_click(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    two_level = (
        events_purchase_last_click(str(tmp_path), time_bucket_hours=6.0)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(single) > 100
    assert single.equals(two_level), (single.head(), two_level.head())


def test_cum_value_two_level_matches_pandas_and_join_path(tmp_path, monkeypatch):
    """events_cum_value: the bucketed running total equals a pandas window
    reference (hot user spanning many buckets included), and the wide-path
    hash join produces the same rows as the broadcast attach."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines.queries import events_cum_value

    rng = np.random.RandomState(3)
    base = pd.Timestamp("2026-01-01")
    rows = []
    eid = 0
    # hot user 1: 200 events over 90 days (crosses monthly buckets)
    for h in range(200):
        rows.append((eid, 1, base + pd.Timedelta(hours=h * 11), float(rng.randn())))
        eid += 1
    # user 2: few events, one bucket
    for h in (0, 1, 2):
        rows.append((eid, 2, base + pd.Timedelta(hours=h), float(rng.randn())))
        eid += 1
    # one event straddles sign: a bucket whose cumsum PEAKS before its end
    # (negative tail) catches the max-as-total bug
    rows.append((eid, 2, base + pd.Timedelta(hours=3), -50.0))
    eid += 1
    rows.append((eid, 2, base + pd.Timedelta(days=45), 1.0))
    eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    tab = pa.Table.from_pandas(df).replace_schema_metadata(None)
    # the real events table is timestamp[us]; pandas writes [ns], whose
    # microsecond bucket arithmetic degenerates to singleton buckets and
    # masks cross-bucket bugs — cast to the production unit
    tab = tab.set_column(
        tab.schema.get_field_index("ts"),
        "ts",
        tab["ts"].cast(pa.timestamp("us")),
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))

    expect = df.sort_values(["user_id", "ts", "event_id"]).copy()
    expect["cum_value"] = expect.groupby("user_id")["value"].cumsum().round(4)
    expect = expect[["event_id", "cum_value"]].sort_values("event_id")

    got = (
        events_cum_value(str(tmp_path), time_bucket_hours=24.0 * 30)
        .to_pandas()[["event_id", "cum_value"]]
        .sort_values("event_id")
    )
    assert np.allclose(got["cum_value"].to_numpy(), expect["cum_value"].to_numpy(),
                       atol=1e-9)
    assert list(got["event_id"]) == list(expect["event_id"])

    # wide path: force the hash join
    from neuroner_ray.stages import graph as g

    monkeypatch.setattr(g, "BROADCAST_JOIN_MAX_ROWS", 0)
    got2 = (
        events_cum_value(str(tmp_path), time_bucket_hours=24.0 * 30)
        .to_pandas()[["event_id", "cum_value"]]
        .sort_values("event_id")
    )
    assert np.allclose(got2["cum_value"].to_numpy(), expect["cum_value"].to_numpy(),
                       atol=1e-9)


def test_hll_estimate_within_error_bound(tmp_path):
    """HyperLogLog (m=256) on 5000 distinct users: estimate within 4x the
    sketch's standard error (1.04/sqrt(256) ~ 6.5%) of the exact count,
    deterministic across runs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines.queries import events_user_count_hll

    users = pa.array([i * 7919 + 13 for i in range(5000)], pa.int64())
    pq.write_table(pa.table({"user_id": users}), str(tmp_path / "events.parquet"))
    df1 = events_user_count_hll(str(tmp_path)).to_pandas()
    assert df1["n_exact"].iloc[0] == 5000
    assert df1["rel_err"].iloc[0] < 4 * 1.04 / 16
    df2 = events_user_count_hll(str(tmp_path)).to_pandas()
    assert df1.equals(df2)


def test_bloom_anti_join_exact_including_false_positives(tmp_path):
    """The Bloom-prefiltered anti-join equals the exact anti-join even with
    a deliberately tiny (256-bit) filter that forces false positives — the
    join-verify pass must catch every FP."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines.queries import customers_without_orders_bloom

    pq.write_table(
        pa.table({"c_custkey": pa.array(range(1000), pa.int64())}),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({"o_custkey": pa.array([k for k in range(100) for _ in (0, 1)],
                                        pa.int64())}),
        str(tmp_path / "orders.parquet"),
    )
    got = customers_without_orders_bloom(str(tmp_path), bloom_bits=256).to_pandas()
    assert got["n_without_orders"].iloc[0] == 900
    # with 100 keys x 4 probes in 256 bits the filter is ~80% saturated, so
    # hits vastly exceed true members — FPs are certain to occur and the
    # count above is only right if verification removed all of them
    got2 = customers_without_orders_bloom(str(tmp_path)).to_pandas()
    assert got2["n_without_orders"].iloc[0] == 900


def test_continuous_quantiles_exact_vs_numpy(tmp_path):
    """events_value_quantiles (bin-localize + targeted collect) returns the
    exact order statistic sorted[ceil(n*q)-1] — checked against a direct
    sort, including duplicates straddling a bin edge and a tiny bin count
    that forces several quantiles into one bin."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines.queries import events_value_quantiles

    rng = np.random.RandomState(11)
    vals = np.concatenate([rng.randn(5000), np.full(500, 1.25), [42.0]])
    pq.write_table(
        pa.table({"value": pa.array(vals, pa.float64())}),
        str(tmp_path / "events.parquet"),
    )
    s = np.sort(vals)
    n = len(s)
    got = events_value_quantiles(str(tmp_path), qs=(0.5, 0.9, 0.99),
                                 num_bins=8).to_pandas()
    for q in (0.5, 0.9, 0.99):
        assert got[f"p{int(q*100)}"].iloc[0] == s[int(np.ceil(n * q)) - 1]
    # collect gate forced tiny -> every quantile bin is over-populated and
    # must resolve through the re-binning recursion (including the p90 bin,
    # where 500 identical 1.25 values exercise the lo == hi exit)
    got = events_value_quantiles(
        str(tmp_path), qs=(0.5, 0.9, 0.99), num_bins=8, collect_max=50
    ).to_pandas()
    for q in (0.5, 0.9, 0.99):
        assert got[f"p{int(q*100)}"].iloc[0] == s[int(np.ceil(n * q)) - 1]


def test_events_funnel_strict_order(tmp_path):
    """Funnel stages must respect strict timestamp order: a click BEFORE
    the first view does not count, ties (same ts) do not advance, and
    users with no view land at stage 0."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines.queries import events_funnel

    T = pd.Timestamp
    rows = [
        # u1: full funnel in order -> stage 3
        (1, "view", T("2024-01-01 10:00")),
        (1, "click", T("2024-01-01 10:05")),
        (1, "purchase", T("2024-01-01 10:10")),
        # u2: click precedes the only view -> stuck at stage 1
        (2, "click", T("2024-01-01 09:00")),
        (2, "view", T("2024-01-01 10:00")),
        # u3: click ties the view timestamp (not strictly later) -> stage 1
        (3, "view", T("2024-01-01 10:00")),
        (3, "click", T("2024-01-01 10:00")),
        # u4: view+click, purchase before click -> stage 2
        (4, "purchase", T("2024-01-01 09:00")),
        (4, "view", T("2024-01-01 10:00")),
        (4, "click", T("2024-01-01 11:00")),
        # u5: no view at all -> stage 0
        (5, "purchase", T("2024-01-01 10:00")),
    ]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = events_funnel(str(tmp_path)).to_pandas()
    assert dict(zip(got["stage"], got["n_users"])) == {0: 1, 1: 2, 2: 1, 3: 1}


def test_funnel_two_level_equals_single_pass(tmp_path):
    """events_funnel(time_bucket_hours=...) — the skew-bounded two-level
    funnel — must equal the single-shuffle path, including a hot user
    whose stage transitions span many buckets, same-bucket full cascades,
    and a same-bucket purchase that precedes the qualifying click."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines.queries import events_funnel

    rng = np.random.RandomState(5)
    base = 1_700_000_000_000_000  # us
    H = 3_600_000_000
    uids, etypes, tss = [], [], []

    def add(uid, etype, t):
        uids.append(uid)
        etypes.append(etype)
        tss.append(t)

    # hot user 1: 3000 random events over ~40 buckets (6h each)
    t = base
    for _ in range(3000):
        t += int(rng.choice([60, 900, 7200]) * 1e6)
        add(1, rng.choice(["view", "click", "purchase", "error"]), t)
    # user 2: view in bucket 0, click in bucket 2, purchase in bucket 5
    add(2, "view", base + 1 * H)
    add(2, "click", base + 13 * H)
    add(2, "purchase", base + 31 * H)
    # user 3: purchase BEFORE the qualifying click in the same bucket
    add(3, "view", base + 1 * H)
    add(3, "purchase", base + 13 * H)       # p_all < c_all: must NOT count
    add(3, "click", base + 14 * H)
    # user 4: full cascade inside one bucket
    add(4, "view", base + 1 * H)
    add(4, "click", base + 1 * H + 10**6)
    add(4, "purchase", base + 1 * H + 2 * 10**6)
    # user 5: click precedes view forever -> stage 1
    add(5, "click", base)
    add(5, "view", base + 50 * H)
    tab = pa.table(
        {
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(etypes, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))

    single = events_funnel(str(tmp_path)).to_pandas().sort_values("stage")
    two = (
        events_funnel(str(tmp_path), time_bucket_hours=6.0)
        .to_pandas()
        .sort_values("stage")
    )
    assert single.reset_index(drop=True).equals(two.reset_index(drop=True)), (
        single,
        two,
    )


def test_two_level_range_join_equals_single_pass(tmp_path):
    """events_purchase_click_window(two_level=True) — the bucket-replicated
    range join — must equal the single-shuffle path, including a planted
    hot user, window-boundary events (inclusive lower edge, exclusive
    upper), and click-only / purchase-only users."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines.queries import events_purchase_click_window

    rng = np.random.RandomState(23)
    base = 1_700_000_000_000_000  # us
    eid = 0
    uids, etypes, tss, eids = [], [], [], []

    def add(uid, etype, t):
        nonlocal eid
        uids.append(uid)
        etypes.append(etype)
        tss.append(t)
        eids.append(eid)
        eid += 1

    hour = 3_600_000_000
    # hot user 1: 1500 events spread over many 1h buckets; dense stretches
    # so purchases match several clicks, incl. clicks in the previous bucket
    t = base
    for i in range(1500):
        t += int(rng.choice([120, 600, 5400]) * 1e6)
        add(1, "click" if rng.rand() < 0.6 else "purchase", t)
    # user 2: click exactly at p.ts − 1h (inclusive → matches) and a click
    # exactly at p.ts (exclusive → no match)
    add(2, "click", base)
    add(2, "click", base + hour)
    add(2, "purchase", base + hour)
    # user 3: clicks only; user 4: purchases only (both produce nothing)
    add(3, "click", base + 10**6)
    add(4, "purchase", base + 10**6)
    # user 5: purchase whose window spans the bucket boundary both ways
    add(5, "click", base + hour - 10**6)
    add(5, "purchase", base + hour + 10**6)

    tab = pa.table(
        {
            "event_id": pa.array(eids, pa.int64()),
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(etypes, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))

    def run(**kw):
        return (
            events_purchase_click_window(str(tmp_path), **kw)
            .to_pandas()
            .sort_values(["purchase_id", "click_id"])
            .reset_index(drop=True)
        )

    single = run()
    two_level = run(two_level=True)
    assert len(single) > 200
    # user-2 boundary semantics: the 1h-earlier click matches, the
    # same-instant click does not
    u2 = single[single["user_id"] == 2]
    assert list(u2["click_ts"].astype("int64")) == [base]
    # user-5 cross-bucket window still matches
    assert (single["user_id"] == 5).sum() == 1
    assert single.equals(two_level), (single.head(), two_level.head())


def test_two_level_moving_avg_equals_single_pass(tmp_path):
    """events_moving_avg3(time_bucket_hours=...) — the frame-carry
    two-level bounded window — must equal both the single-shuffle path and
    a pandas rolling-mean reference, incl. a planted hot user, single-row
    buckets, exactly-2-row buckets, and frames straddling bucket edges."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines.queries import events_moving_avg3

    rng = np.random.RandomState(31)
    base = 1_700_000_000_000_000  # us
    hour = 3_600_000_000
    rows = []
    eid = 0

    def add(uid, t, v):
        nonlocal eid
        rows.append((eid, uid, t, v))
        eid += 1

    # hot user 1: 1800 events with gaps that make 1-row, 2-row and dense
    # buckets at 6h bucketing
    t = base
    for i in range(1800):
        t += int(rng.choice([600, 7200, 22000, 90000]) * 1e6)
        add(1, t, float(rng.randn() * 10))
    # user 2: exactly one event (frame of one)
    add(2, base, 5.0)
    # user 3: two events far apart (each its own bucket, frame carries)
    add(3, base, 1.0)
    add(3, base + 13 * hour, 2.0)
    # user 4: three events in three consecutive buckets (full carry chain)
    for j in range(3):
        add(4, base + j * 6 * hour + 10**6, float(j + 1))

    tab = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))

    def run(**kw):
        return (
            events_moving_avg3(str(tmp_path), **kw)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )

    single = run()
    two_level = run(time_bucket_hours=6.0)
    assert len(single) == len(rows)
    assert single.equals(two_level), (single.head(), two_level.head())

    # independent reference: pandas rolling mean per user in (ts, event_id)
    # order (same 4-decimal half-away rounding)
    from neuroner_ray.functions.rounding import round_half_away

    df = tab.to_pandas().sort_values(["user_id", "ts", "event_id"])
    want = (
        df.groupby("user_id")["value"]
        .rolling(3, min_periods=1)
        .mean()
        .reset_index(level=0, drop=True)
    )
    got = single.set_index("event_id")["mov_avg3"]
    ref = pd.Series(
        round_half_away(want.to_numpy(), 4), index=df["event_id"].to_numpy()
    )
    assert np.allclose(got.sort_index(), ref.sort_index(), atol=1e-9)


def test_two_level_windowed_anti_join_equals_single_pass(tmp_path):
    """events_click_no_purchase(two_level=True) — purchases replicated to
    their PRECEDING bucket — must equal the single-shuffle anti path,
    including a planted hot user, forward-window boundary semantics
    (purchase at click_ts excluded, at click_ts + 1h included), and
    cross-bucket windows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines.queries import events_click_no_purchase

    rng = np.random.RandomState(29)
    base = 1_700_000_000_000_000  # us
    eid = 0
    uids, etypes, tss, eids = [], [], [], []

    def add(uid, etype, t):
        nonlocal eid
        uids.append(uid)
        etypes.append(etype)
        tss.append(t)
        eids.append(eid)
        eid += 1

    hour = 3_600_000_000
    # hot user 1: 1500 events over many buckets, mixed types
    t = base
    for i in range(1500):
        t += int(rng.choice([120, 600, 5400]) * 1e6)
        add(1, "click" if rng.rand() < 0.6 else "purchase", t)
    # user 2 boundary semantics: purchase at click_ts (excluded → click
    # survives) and purchase at click_ts + 1h exactly (included → killed)
    add(2, "click", base)
    add(2, "purchase", base)  # p.ts > e.ts fails → does NOT cover
    add(2, "click", base + 10 * hour)
    add(2, "purchase", base + 11 * hour)  # covers the 10h click exactly
    # user 3: clicks only (all survive); user 4: purchases only (no rows)
    add(3, "click", base + 10**6)
    add(4, "purchase", base + 10**6)
    # user 5: purchase just across the bucket boundary still covers
    add(5, "click", base + hour - 10**6)
    add(5, "purchase", base + hour + 10**6)

    tab = pa.table(
        {
            "event_id": pa.array(eids, pa.int64()),
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(etypes, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))

    def run(**kw):
        return (
            events_click_no_purchase(str(tmp_path), **kw)
            .to_pandas()
            .sort_values(["click_id"])
            .reset_index(drop=True)
        )

    single = run()
    two_level = run(two_level=True)
    u2 = single[single["user_id"] == 2]
    assert list(u2["click_ts"].astype("int64")) == [base]
    assert (single["user_id"] == 3).sum() == 1
    assert (single["user_id"] == 4).sum() == 0
    assert (single["user_id"] == 5).sum() == 0
    assert len(single) > 100
    assert single.equals(two_level), (single.head(), two_level.head())
