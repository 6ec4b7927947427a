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


def _hot_census():
    """300 same-first-letter single-type surfaces sharing ONE word block
    (> cap), with 4 genuine variant pairs placed at the END of the node
    sort order — exactly the rows a cap-only head(200) would drop."""
    rows = []
    for i in range(295):
        rows.append(("PER", f"xa{i:04d} w{i}", 1))
    for j in range(4):
        rows.append(("PER", f"xu90{j} j", 2))
        rows.append(("PER", f"xu90{j} johnson", 3))
    return rd.from_arrow(
        pa.table(
            {
                "ent_type": pa.array([r[0] for r in rows], pa.string()),
                "surface": pa.array([r[1] for r in rows], pa.string()),
                "mention_count": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


def test_salting_preserves_recall_on_hot_blocks():
    from neuroner_ray.stages.linker import (
        candidate_pairs,
        link_match,
        node_key,
        normalize_surface,
    )

    census = _hot_census().materialize()
    cdf = census.to_pandas()
    truth = set()
    rows = list(cdf.itertuples())
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a.ent_type == b.ent_type and link_match(
                normalize_surface(a.surface), normalize_surface(b.surface)
            ):
                ka = node_key(a.ent_type, a.surface)
                kb = node_key(b.ent_type, b.surface)
                truth.add((min(ka, kb), max(ka, kb)))
    assert len(truth) >= 4  # the planted variant pairs are real matches

    got = set()
    for t in candidate_pairs(census).to_pandas().itertuples():
        got.add((min(t.a, t.b), max(t.a, t.b)))
    assert truth <= got, truth - got  # salting: zero recall loss

    # the test bites: with salting disabled the capped hot block LOSES pairs
    unsalted = set()
    for t in (
        candidate_pairs(census, salt_threshold=10**9).to_pandas().itertuples()
    ):
        unsalted.add((min(t.a, t.b), max(t.a, t.b)))
    assert not (truth <= unsalted)


def test_build_nodes_join_path_keeps_unlabeled_surfaces():
    """Review finding: the hash-join path dropped census rows missing from
    the label table while the broadcast path kept them as singletons."""
    from neuroner_ray.stages.graph import build_nodes

    census = rd.from_arrow(
        pa.table(
            {
                "ent_type": pa.array(["ORG", "ORG"], pa.string()),
                "surface": pa.array(["Acme Corp", "Orphan Inc"], pa.string()),
                "mention_count": pa.array([5, 2], pa.int64()),
            }
        )
    )
    labels = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(["ORG|Acme Corp"], pa.string()),
                "label": pa.array(["ORG|Acme Corp"], pa.string()),
            }
        )
    )
    broadcast = (
        build_nodes(labels, census).to_pandas().sort_values("entity_id")
    )
    joined = (
        build_nodes(labels, census, broadcast_max_rows=0)
        .to_pandas()
        .sort_values("entity_id")
    )
    assert list(broadcast["entity_id"]) == list(joined["entity_id"])
    assert "ORG:Orphan Inc" in set(joined["entity_id"])
