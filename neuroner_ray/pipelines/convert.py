"""EP3 — standalone format conversion pipelines (SURVEY.md §3).

brat → CoNLL: src/brat_to_conll.py::brat_to_conll (≈L140–L200) — tokenize
each document (M1), sentence-split, tag tokens from char-span entities
(M4), emit CoNLL sentence rows carrying (doc_id, start, end).

CoNLL (+labels) → brat: src/conll_to_brat.py::conll_to_brat (≈L80–L250) —
assemble maximal label runs into char-span entities (M3) using the carried
offsets, grouped per document.

Both are stateless ``map_batches`` transforms over one-document /
one-sentence rows; the round-trip property (brat → conll → brat is the
identity on well-formed input) is pinned in tests/test_io_formats.py.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from ..functions.labels import assemble_spans, spans_to_bio
from ..functions.tokenize import split_sentences, tokenize_text


def brat_docs_to_conll(docs: Dataset) -> Dataset:
    """(doc_id, text, entities) rows → CoNLL sentence rows (S2→M1→M4→S1 shape)."""

    def convert(batch: pa.Table) -> pa.Table:
        out = {
            "doc_path": [], "sent_idx": [], "tokens": [], "labels": [],
            "doc_ids": [], "starts": [], "ends": [],
        }
        for doc_id, text, ents in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["entities"].to_pylist(),
        ):
            spans = [(e["ent_type"], e["start"], e["end"]) for e in ents]
            for si, (ss, se) in enumerate(split_sentences(text)):
                toks = [
                    (t, ss + s, ss + e) for t, s, e in tokenize_text(text[ss:se])
                ]
                if not toks:
                    continue
                bio = spans_to_bio([(s, e) for _, s, e in toks], spans)
                out["doc_path"].append(doc_id)
                out["sent_idx"].append(si)
                out["tokens"].append([t for t, _, _ in toks])
                out["labels"].append(bio)
                out["doc_ids"].append([doc_id] * len(toks))
                out["starts"].append([s for _, s, _ in toks])
                out["ends"].append([e for _, _, e in toks])
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

    return docs.map_batches(convert, batch_format="pyarrow")


def conll_to_brat_entities(sentences: Dataset, label_col: str = "labels") -> Dataset:
    """CoNLL sentence rows → per-document entity spans (M3 + S6 head).

    Groups by source document (one shuffle on doc id) and rebuilds
    ``entities`` in (sent_idx, position) order.
    """
    import pandas as pd

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("sent_idx")
        ents = []
        for _, row in g.iterrows():
            labs = list(row[label_col])
            starts = list(row["starts"])
            ends = list(row["ends"])
            for ent_type, ti, tj in assemble_spans(labs):
                ents.append(
                    {
                        "ent_type": ent_type,
                        "start": int(starts[ti]),
                        "end": int(ends[tj]),
                        "surface": "",  # filled by caller against source text
                    }
                )
        doc = g["doc_ids"].iloc[0][0] if len(g["doc_ids"].iloc[0]) else g["doc_path"].iloc[0]
        return pd.DataFrame({"doc_id": [doc], "entities": [ents]})

    return sentences.groupby("doc_path").map_groups(per_doc, batch_format="pandas")


def fill_surfaces(entities: Dataset, texts: dict[str, str]) -> Dataset:
    """Resolve entity surfaces against source texts (broadcast dict)."""
    import ray

    ref = ray.put(texts)

    class Fill:
        def __init__(self, ref):
            self.texts = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            docs = batch["doc_id"].to_pylist()
            ents = batch["entities"].to_pylist()
            for d, es in zip(docs, ents):
                text = self.texts.get(d, "")
                for e in es:
                    e["surface"] = text[e["start"] : e["end"]]
            from ..sources.brat import ENTITY_LIST

            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "entities": pa.array(ents, ENTITY_LIST),
                }
            )

    return entities.map_batches(
        Fill, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=(1, 4)
    )
