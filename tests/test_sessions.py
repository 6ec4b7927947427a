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
