"""Generic one-pass column profiler (library form of the
``lineitem_profile`` query; SURVEY §12 data-profiling operator).

One ``map_batches`` pass emits ONE fixed-width partial row per profiled
column per batch (non-null count, null count, min, max, sum) and a tree
combine reduces them — profiling a 100-TB table moves
#columns × #blocks tiny rows through the merge, never data.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions.rounding import round_half_away
from ..runtime.combine import group_agg_merge, tree_combine


def profile_columns(ds: Dataset, cols: Sequence[str]) -> Dataset:
    """Profile numeric ``cols`` of ``ds``: one output row per column with
    ``(col, n, n_null, min_v, max_v, mean_v)``; mean rounded to 4
    decimals (sum/count association — the lineitem_pricing float-parity
    convention)."""
    cols = list(cols)
    merge = group_agg_merge(
        ("col",), sums=("n", "n_null", "s"), mins=("min_v",), maxs=("max_v",)
    )

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, sums, mins, maxs = [], [], [], [], [], []
        for c in cols:
            a = batch[c]
            nn = int(pc.count(a, mode="only_null").as_py())
            names.append(c)
            ns.append(batch.num_rows - nn)
            nulls.append(nn)
            sums.append(pc.sum(a).as_py() or 0.0)
            mins.append(pc.min(a).as_py())
            maxs.append(pc.max(a).as_py())
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "s": pa.array(sums, pa.float64()),
                "min_v": pa.array(mins, pa.float64()),
                "max_v": pa.array(maxs, pa.float64()),
            }
        )

    out = tree_combine(
        ds.select_columns(cols).map_batches(partial, batch_format="pyarrow"),
        merge,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["s"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(n > 0, s / n, np.nan)
        vals = round_half_away(mean, 4)
        return pa.table(
            {
                "col": t["col"],
                "n": t["n"],
                "n_null": t["n_null"],
                "min_v": t["min_v"],
                "max_v": t["max_v"],
                "mean_v": pa.array(
                    [float(v) if np.isfinite(v) else None for v in vals],
                    pa.float64(),
                ),
            }
        )

    return out.map_batches(finish, batch_size=None, batch_format="pyarrow")
