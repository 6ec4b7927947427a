"""Sessionization — the stream-shaped workload (ray_guide: treat the events
table as an ordered, partitioned log; windows are per-key ``map_groups`` over
the ts-sorted group).

A session = maximal run of one user's events with inter-event gaps below
``gap``. Default path: one shuffle (groupby user), vectorized within-group
logic. Scale path (``time_bucket_hours``): a single pathological user is an
unbounded group under the default path, so the two-level variant first
sessionizes within (user, time-bucket) partials — bounding any reduce task
by one bucket's events — then merges only the per-run SUMMARIES per user
(session-count-sized, not event-sized), stitching runs that span bucket
boundaries. Both paths are equivalence-tested (tests/test_sessions.py).
Oracle-SQL-expressible via LAG + cumulative SUM (see __ray_entry__).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..runtime.timeutil import tbucket_of as _tbucket_of

from ray.data import Dataset


def _runs_of(g: pd.DataFrame, ts_col: str, gap: pd.Timedelta) -> pd.DataFrame:
    """ts-sorted events → one row per gap-delimited run."""
    g = g.sort_values(ts_col)
    ts = g[ts_col]
    new_session = (ts.diff() > gap).fillna(False)
    sid = new_session.cumsum()
    out = g.groupby(sid).agg(
        n_events=(ts_col, "size"),
        start_ts=(ts_col, "min"),
        end_ts=(ts_col, "max"),
    )
    return out.reset_index(drop=True)


def sessionize(
    events: Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    time_bucket_hours: float | None = None,
) -> Dataset:
    """Per-user sessions: (user_id, session_idx, n_events, start_ts, end_ts).

    ``session_idx`` numbers a user's sessions in time order from 0.
    Pass ``time_bucket_hours`` to bound per-task group size for skewed
    users (two-level merge; identical output).
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    if time_bucket_hours is None:

        def per_user(g: pd.DataFrame) -> pd.DataFrame:
            out = _runs_of(g, ts_col, gap)
            out.insert(0, "session_idx", np.arange(len(out), dtype=np.int64))
            out.insert(0, key, g[key].iloc[0])
            return out

        return events.select_columns([key, ts_col]).groupby(key).map_groups(
            per_user, batch_format="pandas"
        )

    # ---- two-level path -------------------------------------------------
    import pyarrow as pa
    import pyarrow.compute as pc

    bucket_us = int(time_bucket_hours * 3_600_000_000)

    def add_bucket(t: pa.Table) -> pa.Table:
        micros = pc.cast(t[ts_col], pa.int64())
        return t.append_column(
            "tbucket", _tbucket_of(micros, bucket_us)
        )

    def partial_runs(g: pd.DataFrame) -> pd.DataFrame:
        out = _runs_of(g, ts_col, gap)
        out.insert(0, key, g[key].iloc[0])
        return out

    partials = (
        events.select_columns([key, ts_col])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby([key, "tbucket"])
        .map_groups(partial_runs, batch_format="pandas")
    )

    def merge_runs(g: pd.DataFrame) -> pd.DataFrame:
        # g holds run SUMMARIES (disjoint, one per gap-delimited run within
        # a bucket); sorted by start, a run merges into the previous one
        # exactly when its start is within `gap` of the previous end — the
        # same rule the single-pass path applies per event
        g = g.sort_values("start_ts").reset_index(drop=True)
        sess_id = (g["start_ts"] > g["end_ts"].cummax().shift() + gap).fillna(
            True
        ).cumsum()
        out = g.groupby(sess_id).agg(
            n_events=("n_events", "sum"),
            start_ts=("start_ts", "min"),
            end_ts=("end_ts", "max"),
        )
        out = out.reset_index(drop=True)
        out.insert(0, "session_idx", np.arange(len(out), dtype=np.int64))
        out.insert(0, key, g[key].iloc[0])
        return out

    return partials.groupby(key).map_groups(merge_runs, batch_format="pandas")
