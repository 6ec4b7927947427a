"""EP2 — deploy/predict + evaluate pipeline over CoNLL corpora.

Reference lifecycle (src/main.py, SURVEY.md §3 EP2): pretrained model +
vocab → prediction_step over each split → CoNLL output with predicted
labels appended → conlleval. Here: CoNLL sentence Dataset → actor-pool
tagger → predicted ``labels`` column (+ distributed conlleval / report).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from ray.data import Dataset

from ..functions.conlleval import evaluate_dataset
from ..functions.report import classification_report, pair_counts
from ..schemas import TOKEN_STRUCT
from ..stages.neural_tagger import NeuralTagger


def _sentences_to_turn_shape(batch: pa.Table) -> pa.Table:
    """CoNLL sentence rows (tokens: list<string>) → tagger input shape:
    ``text`` (space-joined) + ``tokens`` struct column with offsets into it,
    ``gold_labels`` kept aside."""
    texts, toks_out, offsets = [], [], [0]
    t_text: list[str] = []
    t_start: list[int] = []
    t_end: list[int] = []
    for toks in batch["tokens"].to_pylist():
        pos = 0
        parts = []
        for tok in toks:
            t_text.append(tok)
            t_start.append(pos)
            t_end.append(pos + len(tok))
            parts.append(tok)
            pos += len(tok) + 1
        texts.append(" ".join(parts))
        offsets.append(len(t_text))
    values = pa.StructArray.from_arrays(
        [
            pa.array(t_text, pa.string()),
            pa.array(t_start, pa.int32()),
            pa.array(t_end, pa.int32()),
        ],
        fields=list(TOKEN_STRUCT),
    )
    out = pa.table(
        {
            "doc_path": batch["doc_path"],
            "sent_idx": batch["sent_idx"],
            "text": pa.array(texts, pa.string()),
            "tokens": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), values
            ),
            "gold_labels": batch["labels"],
        }
    )
    return out


def predict_conll(
    sentences: Dataset,
    tagger: Any = NeuralTagger,
    tagger_args: tuple = (),
    concurrency: Any = (1, 8),
) -> Dataset:
    """CoNLL sentences → + predicted ``labels`` (gold kept as gold_labels)."""
    shaped = sentences.map_batches(_sentences_to_turn_shape, batch_format="pyarrow")
    return shaped.map_batches(
        tagger,
        fn_constructor_args=tagger_args,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def score_predictions(tagged: Dataset, mode: str = "token") -> dict:
    """A2 + A3: conlleval metrics plus the token-level report.

    ``mode`` is the M9 projection applied to the report counts
    (token/binary/bio — see functions/report.py); conlleval is always
    span-level and unaffected.
    """
    conll = evaluate_dataset(tagged, gold_col="gold_labels", pred_col="labels")
    token_report = classification_report(
        pair_counts(tagged, gold_col="gold_labels", pred_col="labels", mode=mode)
    )
    return {"conlleval": conll, "token_report": token_report}
