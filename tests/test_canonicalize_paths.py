"""Driver union-find and distributed label propagation must agree."""

from __future__ import annotations

import ray.data as rd

from neuroner_ray.stages.canonicalize import connected_components


def _graph():
    pairs = rd.from_items(
        [
            {"a": "b", "b": "c"},
            {"a": "c", "b": "d"},   # chain b-c-d
            {"a": "x", "b": "y"},
            {"a": "a", "b": "b"},   # joins a to the chain → {a,b,c,d}
        ]
    )
    nodes = rd.from_items([{"node": n} for n in "abcdxyz"])
    return pairs, nodes


def _labels(ds):
    df = ds.to_pandas()
    return dict(zip(df["node"], df["label"]))


def test_paths_agree():
    p1, n1 = _graph()
    fast = _labels(connected_components(p1, n1))
    p2, n2 = _graph()
    dist = _labels(connected_components(p2, n2, driver_max_nodes=0))
    assert fast == dist
    assert fast["a"] == fast["b"] == fast["c"] == fast["d"] == "a"
    assert fast["x"] == fast["y"] == "x"
    assert fast["z"] == "z"
