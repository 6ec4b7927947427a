"""IVF ANN variant + linker embedding-similarity scoring."""

from __future__ import annotations

import numpy as np
import ray.data as rd

from neuroner_ray.stages.linker import (
    embedding_cosine,
    link_match,
    normalize_surface,
    surface_embedding,
)
from neuroner_ray.stages.similarity import (
    ann_search_ivf,
    brute_force_topk,
    build_ivf_index,
    kmeans_centroids,
)


def test_ivf_recall_vs_brute_force():
    rng = np.random.RandomState(7)
    # clustered data (the IVF-friendly case): 8 blobs in 16-d
    centers = rng.randn(8, 16) * 4
    mat = np.vstack([c + rng.randn(60, 16) * 0.5 for c in centers])
    emb = rd.from_items(
        [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(len(mat))]
    )
    cent = kmeans_centroids(mat[rng.choice(len(mat), 200, replace=False)], k=8)
    indexed = build_ivf_index(emb, cent).materialize()
    q = centers[3] + rng.randn(16) * 0.5
    exact = brute_force_topk(emb, q, k=10).to_pandas()
    approx = ann_search_ivf(indexed, cent, q, k=10, n_probe=2).to_pandas()
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert recall >= 0.9, recall


def test_ivf_partitions_cover_all_vectors():
    rng = np.random.RandomState(8)
    mat = rng.randn(100, 8)
    emb = rd.from_items(
        [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(100)]
    )
    cent = kmeans_centroids(mat, k=4)
    df = build_ivf_index(emb, cent).to_pandas()
    assert len(df) == 100
    assert set(df["list_id"]) <= set(range(4))


def test_surface_embedding_scoring():
    assert embedding_cosine("acme corp", "acme corp") > 0.999
    near = embedding_cosine("acme corporation", "acme corporations")
    far = embedding_cosine("acme corporation", "stark industries")
    assert near > 0.9 > far
    # embedding channel links near-identical long forms even when word-prefix
    # containment fails (plural on the short side blocks containment)
    a = normalize_surface("Massive Dynamics Group")
    b = normalize_surface("Massive Dynamic Group")
    assert link_match(a, b)
    assert not link_match("globex", "initech")


def test_brute_force_topk_many_matches_single():
    from neuroner_ray.stages.similarity import brute_force_topk_many

    rng = np.random.RandomState(9)
    mat = rng.randn(300, 12)
    emb = rd.from_items(
        [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(300)]
    )
    queries = rng.randn(3, 12)
    many = brute_force_topk_many(emb, queries, k=5).to_pandas()
    for qi in range(3):
        single = brute_force_topk(emb, queries[qi], k=5).to_pandas()
        got = many[many["query_idx"] == qi].sort_values(
            ["cos", "vec_id"], ascending=[False, True]
        )
        assert list(got["vec_id"]) == list(single["vec_id"])
