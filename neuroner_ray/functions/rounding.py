"""Oracle-compatible float rounding.

Python ``round()`` / ``np.round`` / ``pc.round`` default to banker's
rounding (half-to-even); DuckDB ``round()`` rounds ties AWAY from zero.
Ratio-valued columns can land exactly on a tie (any dyadic rational, e.g.
1/32 = 0.03125 → 0.0312 vs 0.0313), so every float the driver hash-compares
against a DuckDB oracle must round with this helper on the Python side
(root cause of the round-1 ``doc_quality`` hash mismatch).
"""

from __future__ import annotations

import numpy as np


def round_half_away(values, digits: int = 4) -> np.ndarray:
    """Round half-away-from-zero, matching DuckDB's ``round(x, digits)``."""
    a = np.asarray(values, dtype=np.float64)
    scale = 10.0**digits
    return np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale


def top_by_score_then_id(
    scores: np.ndarray, ids: np.ndarray, n: int
) -> np.ndarray:
    """Indices of the top ``n`` rows by (score DESC, id ASC) — the oracle
    tie-break. ``np.argpartition`` picks arbitrarily among tied scores, so a
    rounded-score tie group spanning the cut would drop rows the oracle
    keeps; a full lexsort is exact (and cheap at per-batch sizes)."""
    if len(scores) <= n:
        return np.arange(len(scores))
    order = np.lexsort((ids, -scores))
    return order[:n]
