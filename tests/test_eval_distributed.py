"""Distributed A2 (conlleval) and A3 (report/confusion) over Datasets."""

from __future__ import annotations

import pytest
import ray.data as rd

from neuroner_ray.functions.conlleval import evaluate, evaluate_dataset
from neuroner_ray.functions.report import (
    classification_report,
    confusion_matrix,
    pair_counts,
)


def _tagged_ds():
    rows = [
        {
            "gold_labels": ["B-PER", "I-PER", "O", "B-LOC"],
            "labels": ["B-PER", "I-PER", "O", "B-ORG"],
        },
        {"gold_labels": ["O", "B-ORG"], "labels": ["O", "B-ORG"]},
        {"gold_labels": ["B-LOC"], "labels": ["B-LOC"]},
    ]
    return rd.from_items(rows), rows


def test_evaluate_dataset_matches_driver_evaluate():
    ds, rows = _tagged_ds()
    dist = evaluate_dataset(ds)
    local = evaluate(
        [r["gold_labels"] for r in rows], [r["labels"] for r in rows]
    )
    assert dist == local
    assert dist["fb1"] == pytest.approx(local["fb1"])


def test_pair_counts_and_report():
    ds, _ = _tagged_ds()
    pairs = pair_counts(ds, mode="token")
    # token projection: B-PER/I-PER → PER etc.
    assert pairs[("PER", "PER")] == 2
    assert pairs[("LOC", "ORG")] == 1
    assert pairs[("O", "O")] == 2
    rep = classification_report(pairs)
    assert rep["accuracy"] == pytest.approx(6 / 7, abs=1e-4)
    assert rep["per_class"]["LOC"]["recall"] == 0.5
    assert rep["per_class"]["ORG"]["precision"] == 0.5
    classes, M = confusion_matrix(pairs)
    assert classes == ["LOC", "O", "ORG", "PER"]
    total = sum(sum(r) for r in M)
    assert total == 7


def test_binary_projection_report():
    ds, _ = _tagged_ds()
    pairs = pair_counts(ds, mode="binary")
    rep = classification_report(pairs)
    # all entity confusions collapse → only ENT/O classes, accuracy 7/7
    assert set(rep["classes"]) == {"ENT", "O"}
    assert rep["accuracy"] == 1.0
