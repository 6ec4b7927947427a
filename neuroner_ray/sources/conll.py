"""CoNLL format reader / writer (SURVEY.md S1 / S5 / M10).

Reference: src/dataset.py::_parse_dataset (≈L30–L80) — one token per line
``token [document_id start end] label`` (first field = token, LAST field =
label, optional middle fields from brat conversion), blank line = sentence
boundary, ``-DOCSTART-`` lines = document delimiters (dropped, M10);
src/train.py::prediction_step (≈L60–L160) writes the same columns with the
predicted label appended.

Ray mapping: ``read_text`` cannot preserve the blank-line structure per
file-fragment boundaries safely, so files are read whole
(``read_binary_files``) and split into sentences in a stateless
``flat_map``-style ``map_batches`` — each CoNLL file is one row in, many
sentence-rows out. Sentence rows carry parallel list columns
(tokens/labels/starts/ends/doc ids) plus a stable ``(doc_path, sent_idx)``
ordering key (the O4 output-order guarantee).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

DOCSTART = "-DOCSTART-"


def parse_conll_text(text: str) -> list[dict]:
    """One CoNLL file body → list of sentence dicts."""
    sentences: list[dict] = []
    cur_tokens: list[str] = []
    cur_labels: list[str] = []
    cur_docs: list[str] = []
    cur_starts: list[int] = []
    cur_ends: list[int] = []

    def flush():
        if cur_tokens:
            sentences.append(
                {
                    "tokens": list(cur_tokens),
                    "labels": list(cur_labels),
                    "doc_ids": list(cur_docs),
                    "starts": list(cur_starts),
                    "ends": list(cur_ends),
                }
            )
            for lst in (cur_tokens, cur_labels, cur_docs, cur_starts, cur_ends):
                lst.clear()

    for line in text.splitlines():
        line = line.strip()
        if not line:
            flush()
            continue
        fields = line.split(" ")
        if fields[0] == DOCSTART:  # M10 structure filter
            flush()
            continue
        cur_tokens.append(fields[0])
        cur_labels.append(fields[-1])
        # brat-derived shape is `token doc start end label`; any other 5+
        # column CoNLL (lemma/POS/chunk variants) keeps the reference's
        # token=first/label=last semantics instead of crashing on int()
        if len(fields) >= 5 and fields[2].isdigit() and fields[3].isdigit():
            cur_docs.append(fields[1])
            cur_starts.append(int(fields[2]))
            cur_ends.append(int(fields[3]))
        else:
            cur_docs.append("")
            cur_starts.append(-1)
            cur_ends.append(-1)
    flush()
    return sentences


def _parse_files_batch(batch: pa.Table) -> pa.Table:
    paths = batch["path"].to_pylist()
    bodies = batch["bytes"].to_pylist()
    out = {
        "doc_path": [], "sent_idx": [], "tokens": [], "labels": [],
        "doc_ids": [], "starts": [], "ends": [],
    }
    for path, body in zip(paths, bodies):
        for i, sent in enumerate(parse_conll_text(body.decode("utf-8"))):
            out["doc_path"].append(path)
            out["sent_idx"].append(i)
            out["tokens"].append(sent["tokens"])
            out["labels"].append(sent["labels"])
            out["doc_ids"].append(sent["doc_ids"])
            out["starts"].append(sent["starts"])
            out["ends"].append(sent["ends"])
    return pa.table(
        {
            "doc_path": pa.array(out["doc_path"], pa.string()),
            "sent_idx": pa.array(out["sent_idx"], pa.int32()),
            "tokens": pa.array(out["tokens"], pa.list_(pa.string())),
            "labels": pa.array(out["labels"], pa.list_(pa.string())),
            "doc_ids": pa.array(out["doc_ids"], pa.list_(pa.string())),
            "starts": pa.array(out["starts"], pa.list_(pa.int32())),
            "ends": pa.array(out["ends"], pa.list_(pa.int32())),
        }
    )


def read_conll(paths: str | list[str]) -> Dataset:
    """S1: CoNLL file(s) → sentence Dataset (one row per sentence)."""
    files = rd.read_binary_files(paths, include_paths=True)
    return files.map_batches(_parse_files_batch, batch_format="pyarrow")


def format_sentence(
    tokens: list[str],
    labels: list[str],
    doc_ids: list[str] | None = None,
    starts: list[int] | None = None,
    ends: list[int] | None = None,
    pred_labels: list[str] | None = None,
) -> str:
    """S5: one sentence → CoNLL lines (gold label, then predicted appended)."""
    lines = []
    for i, tok in enumerate(tokens):
        fields = [tok]
        if doc_ids is not None and doc_ids[i]:
            fields += [doc_ids[i], str(starts[i]), str(ends[i])]
        fields.append(labels[i])
        if pred_labels is not None:
            fields.append(pred_labels[i])
        lines.append(" ".join(fields))
    return "\n".join(lines)


def write_conll(
    ds: Dataset,
    out_path: str,
    pred_col: str | None = None,
) -> None:
    """Write a sentence Dataset back to a single CoNLL text file, in stable
    (doc_path, sent_idx) order (O4). Driver-side streaming writer — CoNLL
    output is a debug/parity sink, not the production path (which is
    Parquet)."""
    rows = []
    cols = ["doc_path", "sent_idx", "tokens", "labels", "doc_ids", "starts", "ends"]
    if pred_col:
        cols.append(pred_col)
    for b in ds.select_columns(cols).sort(["doc_path", "sent_idx"]).iter_batches(
        batch_format="pyarrow"
    ):
        d = b.to_pydict()
        for i in range(b.num_rows):
            rows.append(
                format_sentence(
                    d["tokens"][i],
                    d["labels"][i],
                    d["doc_ids"][i],
                    d["starts"][i],
                    d["ends"][i],
                    d[pred_col][i] if pred_col else None,
                )
            )
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n\n".join(rows) + "\n")
