"""Driver-local and distributed linking paths must produce identical graphs."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from neuroner_ray.pipelines import kg


def _census():
    rows = [
        ("ORG", "Acme Corp", 50),
        ("ORG", "Acme Corporation", 5),
        ("ORG", "ACME", 3),
        ("ORG", "Globex", 10),
        ("PER", "Alice Johnson", 7),
        ("PER", "A. Johnson", 2),
        ("LOC", "Paris", 9),
    ]
    return rd.from_arrow(
        pa.table(
            {
                "ent_type": pa.array([r[0] for r in rows], pa.string()),
                "surface": pa.array([r[1] for r in rows], pa.string()),
                "mention_count": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


def _norm(nodes_ds):
    df = nodes_ds.to_pandas().sort_values("entity_id").reset_index(drop=True)
    df["surfaces"] = df["surfaces"].map(tuple)
    return df[["entity_id", "canonical", "ent_type", "surfaces", "mention_count"]]


def test_small_and_distributed_linking_agree(monkeypatch):
    small_nodes, small_labels = kg._link_from_census(_census().materialize())
    monkeypatch.setattr(kg, "SMALL_VOCAB_MAX", 0)
    dist_nodes, dist_labels = kg._link_from_census(_census().materialize())
    a, b = _norm(small_nodes), _norm(dist_nodes)
    assert a.equals(b), (a, b)
    la = small_labels.to_pandas().sort_values("node").reset_index(drop=True)
    lb = dist_labels.to_pandas().sort_values("node").reset_index(drop=True)
    assert la.equals(lb)
    # semantic spot-check: all Acme variants share one canonical
    acme = a[a["canonical"] == "Acme Corp"]
    assert len(acme) == 1 and len(acme.iloc[0]["surfaces"]) == 3
