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


def test_distributed_cc_converges_on_deep_chain():
    """Review finding: min-label propagation needed O(diameter) rounds and
    silently returned split clusters past max_iters; label shortcutting now
    converges deep chains in O(log d) and non-convergence raises."""
    import pyarrow as pa
    import ray.data as rd

    from neuroner_ray.stages.canonicalize import connected_components, union_find

    n = 14
    nodes = [f"n{i:02d}" for i in range(n)]
    chain = [(nodes[i], nodes[i + 1]) for i in range(n - 1)]
    pairs = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in chain], pa.string()),
                "b": pa.array([b for _, b in chain], pa.string()),
            }
        )
    )
    node_ds = rd.from_arrow(pa.table({"node": pa.array(nodes, pa.string())}))
    got = (
        connected_components(pairs, node_ds, driver_max_nodes=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = union_find(nodes, chain)
    assert dict(zip(got["node"], got["label"])) == want
    assert set(got["label"]) == {"n00"}
