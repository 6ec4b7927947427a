"""Shared temporal-key helpers (runtime layer — usable from stages and
pipelines without crossing layers)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def tbucket_of(micros: pa.ChunkedArray | pa.Array, width_us: int) -> pa.Array:
    """FLOOR division of epoch-micros into time buckets. ``pc.divide`` on
    int64 truncates toward zero (so ``pc.floor`` after it is a no-op) —
    wrong for pre-epoch timestamps, where truncation buckets upward and
    window/carry chains would straddle the wrong boundary. Compute the
    truncated quotient and step it down where a negative remainder says
    truncation rounded up."""
    q = pc.divide(micros, width_us)
    r = pc.subtract(micros, pc.multiply(q, width_us))
    return pc.cast(
        pc.subtract(q, pc.cast(pc.less(r, 0), pa.int64())), pa.int64()
    )
