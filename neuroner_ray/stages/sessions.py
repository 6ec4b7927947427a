"""Sessionization — the stream-shaped workload (ray_guide: treat the events
table as an ordered, partitioned log; windows are per-key ``map_groups`` over
the ts-sorted group).

A session = maximal run of one user's events with inter-event gaps below
``gap``. One shuffle (groupby user), then vectorized within-group logic.
Oracle-SQL-expressible via LAG + cumulative SUM (see __ray_entry__).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset


def sessionize(
    events: Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> Dataset:
    """Per-user sessions: (user_id, session_idx, n_events, start_ts, end_ts).

    ``session_idx`` numbers a user's sessions in time order from 0.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col]
        new_session = (ts.diff() > gap).fillna(False)
        sid = new_session.cumsum()
        out = g.groupby(sid).agg(
            n_events=(ts_col, "size"),
            start_ts=(ts_col, "min"),
            end_ts=(ts_col, "max"),
        )
        out = out.reset_index(drop=True)
        out.insert(0, "session_idx", np.arange(len(out), dtype=np.int64))
        out.insert(0, key, g[key].iloc[0])
        return out

    return events.select_columns([key, ts_col]).groupby(key).map_groups(
        per_user, batch_format="pandas"
    )
