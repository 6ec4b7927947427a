"""A3 — token-level classification report + confusion matrix.

Reference: src/evaluate.py::evaluate_model (≈L60–L150) uses sklearn's
classification_report / confusion_matrix under the M9 label projection
(``main_evaluation_mode``); plots via src/utils_plots.py (out of scope).
sklearn is absent here; the math is hand-rolled from a distributed
``(gold, pred)`` pair census: partial counts per block → tiny groupby →
driver pivot. Everything that touches the corpus is a ``map_batches``.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from .labels import project_labels


def pair_counts(
    tagged: Dataset,
    gold_col: str = "gold_labels",
    pred_col: str = "labels",
    mode: str = "token",
) -> dict[tuple[str, str], int]:
    """Distributed (gold, pred) census under the M9 projection."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for g, p in zip(batch[gold_col].to_pylist(), batch[pred_col].to_pylist()):
            gp = project_labels(list(g), mode)
            pp = project_labels(list(p), mode)
            c.update(zip(gp, pp))
        golds, preds, ns = [], [], []
        for (gl, pl), n in c.items():
            golds.append(gl)
            preds.append(pl)
            ns.append(n)
        return pa.table(
            {
                "gold": pa.array(golds, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    counts = (
        tagged.map_batches(partial, batch_format="pyarrow")
        .groupby(["gold", "pred"])
        .aggregate(Sum("n", alias_name="n"))
    )
    out: dict[tuple[str, str], int] = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        for g, p, n in zip(
            b["gold"].to_pylist(), b["pred"].to_pylist(), b["n"].to_pylist()
        ):
            out[(g, p)] = n
    return out


def confusion_matrix(
    pairs: dict[tuple[str, str], int]
) -> tuple[list[str], list[list[int]]]:
    """(sorted class labels, N×N counts[gold][pred])."""
    classes = sorted({g for g, _ in pairs} | {p for _, p in pairs})
    idx = {c: i for i, c in enumerate(classes)}
    M = [[0] * len(classes) for _ in classes]
    for (g, p), n in pairs.items():
        M[idx[g]][idx[p]] += n
    return classes, M


def classification_report(pairs: dict[tuple[str, str], int]) -> dict:
    """Per-class precision/recall/f1/support + accuracy + macro avg."""
    classes, M = confusion_matrix(pairs)
    total = sum(sum(row) for row in M)
    correct = sum(M[i][i] for i in range(len(classes)))
    per_class = {}
    for i, c in enumerate(classes):
        tp = M[i][i]
        fp = sum(M[j][i] for j in range(len(classes))) - tp
        fn = sum(M[i]) - tp
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        per_class[c] = {
            "precision": round(p, 4),
            "recall": round(r, 4),
            "f1": round(f1, 4),
            "support": sum(M[i]),
        }
    macro = {
        k: round(
            sum(v[k] for v in per_class.values()) / max(1, len(per_class)), 4
        )
        for k in ("precision", "recall", "f1")
    }
    return {
        "accuracy": round(correct / total, 4) if total else 0.0,
        "per_class": per_class,
        "macro_avg": macro,
        "classes": classes,
        "matrix": M,
    }
