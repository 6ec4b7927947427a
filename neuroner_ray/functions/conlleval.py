"""Faithful Python reimplementation of the CoNLL-2003 conlleval scorer (A2).

Reference: src/conlleval (canonical Perl script, ≈315 lines) invoked by
src/evaluate.py::evaluate_model (≈L60–L150) and parsed by
src/utils_nlp.py::get_parsed_conll_output (≈L200–L240). Entity-level
exact-match P/R/FB1 per type and overall, plus token accuracy, with the
Perl script's leniency for ill-formed sequences (an ``I-X`` following ``O``
or a different type starts a new entity) — that leniency is exactly what
``labels.assemble_spans`` implements, and the property test in
tests/test_labels.py pins the two to each other.

Distributed use: per-block partial (TP, FP, FN, correct, total) counters via
``map_batches`` then a tiny sum — see ``evaluate_dataset``.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from .labels import assemble_spans


@dataclass
class EvalCounts:
    correct_tokens: int = 0
    total_tokens: int = 0
    tp: dict[str, int] = field(default_factory=lambda: defaultdict(int))
    fp: dict[str, int] = field(default_factory=lambda: defaultdict(int))
    fn: dict[str, int] = field(default_factory=lambda: defaultdict(int))

    def merge(self, other: "EvalCounts") -> "EvalCounts":
        self.correct_tokens += other.correct_tokens
        self.total_tokens += other.total_tokens
        for d_self, d_other in (
            (self.tp, other.tp), (self.fp, other.fp), (self.fn, other.fn)
        ):
            for k, v in d_other.items():
                d_self[k] += v
        return self


def count_sequence(gold: list[str], pred: list[str]) -> EvalCounts:
    """Counts for one sentence (gold and pred label sequences, BIO/BIOES)."""
    if len(gold) != len(pred):  # not assert: survives python -O; a scorer
        # silently truncating mismatched inputs corrupts the A2 gate
        raise ValueError(
            f"gold/pred length mismatch: {len(gold)} vs {len(pred)}"
        )
    c = EvalCounts()
    c.total_tokens = len(gold)
    c.correct_tokens = sum(g == p for g, p in zip(gold, pred))
    gold_spans = set(assemble_spans(gold))
    pred_spans = set(assemble_spans(pred))
    for span in pred_spans:
        if span in gold_spans:
            c.tp[span[0]] += 1
        else:
            c.fp[span[0]] += 1
    for span in gold_spans:
        if span not in pred_spans:
            c.fn[span[0]] += 1
    return c


def _prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f


def metrics(counts: EvalCounts) -> dict:
    """conlleval-style metrics dict (percentages, 2-decimal convention)."""
    types = sorted(set(counts.tp) | set(counts.fp) | set(counts.fn))
    tp = sum(counts.tp.values())
    fp = sum(counts.fp.values())
    fn = sum(counts.fn.values())
    p, r, f = _prf(tp, fp, fn)
    out = {
        "accuracy": 100.0 * counts.correct_tokens / max(1, counts.total_tokens),
        "precision": 100.0 * p,
        "recall": 100.0 * r,
        "fb1": 100.0 * f,
        "found": tp + fp,
        "expected": tp + fn,
        "per_type": {},
    }
    for t in types:
        tp_t, fp_t, fn_t = counts.tp[t], counts.fp[t], counts.fn[t]
        p, r, f = _prf(tp_t, fp_t, fn_t)
        out["per_type"][t] = {
            "precision": 100.0 * p,
            "recall": 100.0 * r,
            "fb1": 100.0 * f,
            "found": tp_t + fp_t,
        }
    return out


def evaluate(gold_seqs: list[list[str]], pred_seqs: list[list[str]]) -> dict:
    if len(gold_seqs) != len(pred_seqs):  # zip would silently truncate
        raise ValueError(
            f"sequence-count mismatch: {len(gold_seqs)} vs {len(pred_seqs)}"
        )
    total = EvalCounts()
    for g, p in zip(gold_seqs, pred_seqs):
        total.merge(count_sequence(g, p))
    return metrics(total)


def report(m: dict) -> str:
    """conlleval-formatted text report."""
    lines = [
        f"processed {m.get('expected', 0)} phrases; found: {m['found']} phrases.",
        "accuracy: {:6.2f}%; precision: {:6.2f}%; recall: {:6.2f}%; FB1: {:6.2f}".format(
            m["accuracy"], m["precision"], m["recall"], m["fb1"]
        ),
    ]
    for t, tm in sorted(m["per_type"].items()):
        lines.append(
            "{:>17}: precision: {:6.2f}%; recall: {:6.2f}%; FB1: {:6.2f}  {}".format(
                t, tm["precision"], tm["recall"], tm["fb1"], tm["found"]
            )
        )
    return "\n".join(lines)


def evaluate_dataset(tagged, gold_col: str = "gold_labels", pred_col: str = "labels") -> dict:
    """Distributed A2: per-block partial counts → driver merge.

    ``tagged``: Dataset with two list<string> label columns.
    """
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        c = EvalCounts()
        for g, p in zip(batch[gold_col].to_pylist(), batch[pred_col].to_pylist()):
            c.merge(count_sequence(list(g), list(p)))
        types = sorted(set(c.tp) | set(c.fp) | set(c.fn))
        return pa.table(
            {
                "correct": pa.array([c.correct_tokens], pa.int64()),
                "total": pa.array([c.total_tokens], pa.int64()),
                "types": pa.array([types]),
                "tp": pa.array([[c.tp[t] for t in types]]),
                "fp": pa.array([[c.fp[t] for t in types]]),
                "fn": pa.array([[c.fn[t] for t in types]]),
            }
        )

    total = EvalCounts()
    for b in tagged.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for i in range(b.num_rows):
            part = EvalCounts()
            part.correct_tokens = b["correct"][i].as_py()
            part.total_tokens = b["total"][i].as_py()
            for t, tp, fp, fn in zip(
                b["types"][i].as_py(),
                b["tp"][i].as_py(),
                b["fp"][i].as_py(),
                b["fn"][i].as_py(),
            ):
                part.tp[t], part.fp[t], part.fn[t] = tp, fp, fn
            total.merge(part)
    return metrics(total)
