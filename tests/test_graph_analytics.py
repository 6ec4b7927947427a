"""PageRank (stages/graph.py) vs a dense NumPy power-method reference.

Covers the tricky cases: dangling nodes (no out-edges), parallel
(src, dst) edges with different predicates (weights must sum), weighted
edges, and a node that appears only as a destination.
"""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from neuroner_ray.stages.graph import pagerank


def _dense_pagerank(edges, damping=0.85, iters=10):
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in edges:
        W[idx[s], idx[d]] += w
    ow = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for i in range(n):
            if ow[i] > 0:
                contrib += r[i] * W[i] / ow[i]
        dangling = r[ow == 0].sum()
        r = (1 - damping) / n + damping * (dangling / n + contrib)
    return dict(zip(nodes, r))


EDGES = [
    # parallel edges a->b under two predicates: weights must sum
    ("a", "b", 2.0),
    ("a", "b", 1.0),
    ("a", "c", 1.0),
    ("b", "c", 3.0),
    ("c", "a", 1.0),
    # d is dangling (destination-only node via c->d)
    ("c", "d", 2.0),
    # e -> a: e has out-edges but nothing points at it
    ("e", "a", 1.0),
]


def test_pagerank_matches_dense_reference():
    ds = rd.from_items(
        [{"src_id": s, "dst_id": d, "weight": w} for s, d, w in EDGES]
    )
    got = pagerank(ds).to_pydict()
    want = _dense_pagerank(EDGES)
    assert got["entity_id"] == sorted(want)
    for v, r in zip(got["entity_id"], got["rank"]):
        assert r == pytest.approx(round(want[v], 4), abs=1e-9), v


def test_pagerank_sums_to_one_and_is_deterministic():
    ds1 = rd.from_items(
        [{"src_id": s, "dst_id": d, "weight": w} for s, d, w in EDGES]
    )
    ds2 = rd.from_items(
        [{"src_id": s, "dst_id": d, "weight": w} for s, d, w in EDGES]
    )
    a = pagerank(ds1).to_pydict()
    b = pagerank(ds2).to_pydict()
    assert a == b
    # mass conservation (up to the 4-decimal output rounding)
    assert sum(a["rank"]) == pytest.approx(1.0, abs=5e-4 * len(a["rank"]))
