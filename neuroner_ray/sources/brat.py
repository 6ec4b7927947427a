"""brat standoff reader / writer + integrity validators (SURVEY.md S2 / S6).

Reference: src/brat_to_conll.py::get_entities_from_brat (≈L20–L60) parses
``.ann`` T-lines ``T<n>\\t<Type> <start> <end>\\t<surface>`` and asserts
``text[start:end] == surface``; src/conll_to_brat.py::output_brat
(≈L80–L250) reconstructs ``.ann`` from labeled tokens;
check_brat_annotation_and_text_compatibility (≈L160–L200) is the validator.

Ray mapping: files become (stem, ext, body) rows, then a ``groupby(stem)``
pairs each document's ``.txt`` with its ``.ann`` regardless of how the read
partitioned the files (pairing by batch would silently break whenever the
two files land in different blocks). The reference's hard assert becomes a
*quarantine* route: violating spans go to a side table instead of killing
the job (at 100 TB one bad annotation must not fail the run).
"""

from __future__ import annotations

import os
import re

import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

_T_LINE = re.compile(r"^T\d+\t(\S+) (\d+) (\d+)\t(.*)$")

ENTITY_LIST = pa.list_(
    pa.struct(
        [
            ("ent_type", pa.string()),
            ("start", pa.int32()),
            ("end", pa.int32()),
            ("surface", pa.string()),
        ]
    )
)


def parse_ann(text: str) -> list[dict]:
    """.ann body → [{ent_type, start, end, surface}] (T-lines only)."""
    out = []
    for line in text.splitlines():
        m = _T_LINE.match(line)
        if m:
            out.append(
                {
                    "ent_type": m.group(1),
                    "start": int(m.group(2)),
                    "end": int(m.group(3)),
                    "surface": m.group(4),
                }
            )
    return out


def check_compatibility(text: str, entities: list[dict]) -> list[dict]:
    """The reference's integrity assert, returning violations instead of
    raising: entity spans whose text slice doesn't equal the surface."""
    return [e for e in entities if text[e["start"] : e["end"]] != e["surface"]]


def _file_rows(batch: pa.Table) -> pa.Table:
    stems, exts, bodies = [], [], []
    for path, body in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
        stem, ext = os.path.splitext(path)
        # group by the FULL path stem: read_binary_files walks recursively,
        # and basename-only grouping would collide same-named documents in
        # different subdirectories (one dropped, annotations paired with
        # the wrong text)
        stems.append(stem)
        exts.append(ext)
        bodies.append(body.decode("utf-8"))
    return pa.table(
        {
            "stem": pa.array(stems, pa.string()),
            "ext": pa.array(exts, pa.string()),
            "body": pa.array(bodies, pa.string()),
        }
    )


def _pair_docs(group: pd.DataFrame) -> pd.DataFrame:
    """One document's files → one doc row (+ embedded quarantine rows)."""
    by_ext = dict(zip(group["ext"], group["body"]))
    if ".txt" not in by_ext:
        return pd.DataFrame(
            {"doc_id": [], "text": [], "entities": [], "quarantined": []}
        )
    text = by_ext[".txt"]
    entities = parse_ann(by_ext.get(".ann", ""))
    bad = check_compatibility(text, entities)
    bad_keys = {(e["start"], e["end"]) for e in bad}
    good = [e for e in entities if (e["start"], e["end"]) not in bad_keys]
    return pd.DataFrame(
        {
            # doc_id keeps the basename (reference convention: X.ann ↔ X);
            # nested same-named docs pair correctly (full-stem grouping) but
            # share a doc_id — callers needing uniqueness use the path
            "doc_id": [os.path.basename(group["stem"].iloc[0])],
            "text": [text],
            "entities": [good],
            "quarantined": [bad],
        }
    )


def read_brat(directory: str) -> tuple[Dataset, Dataset]:
    """S2: a directory of ``X.txt``/``X.ann`` pairs → (documents, quarantine).

    documents: (doc_id, text, entities list<struct>); quarantine: violating
    spans with their doc_id.
    """
    files = rd.read_binary_files(directory, include_paths=True)
    paired = (
        files.map_batches(_file_rows, batch_format="pyarrow")
        .groupby("stem")
        .map_groups(_pair_docs, batch_format="pandas")
        .materialize()  # consumed twice (docs + quarantine); document-count sized
    )

    def docs_only(batch: pa.Table) -> pa.Table:
        ents = batch["entities"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": batch["text"],
                "entities": pa.array(ents, ENTITY_LIST),
            }
        )

    def quarantine_only(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "ent_type": [], "start": [], "end": [], "surface": []}
        for doc_id, bad in zip(
            batch["doc_id"].to_pylist(), batch["quarantined"].to_pylist()
        ):
            for e in bad:
                rows["doc_id"].append(doc_id)
                rows["ent_type"].append(e["ent_type"])
                rows["start"].append(e["start"])
                rows["end"].append(e["end"])
                rows["surface"].append(e["surface"])
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "ent_type": pa.array(rows["ent_type"], pa.string()),
                "start": pa.array(rows["start"], pa.int32()),
                "end": pa.array(rows["end"], pa.int32()),
                "surface": pa.array(rows["surface"], pa.string()),
            }
        )

    docs = paired.map_batches(docs_only, batch_format="pyarrow")
    quarantine = paired.map_batches(quarantine_only, batch_format="pyarrow")
    return docs, quarantine


def format_ann(entities: list[dict]) -> str:
    """S6: entity spans → .ann body (T-lines, 1-indexed ids)."""
    return "\n".join(
        f"T{i + 1}\t{e['ent_type']} {e['start']} {e['end']}\t{e['surface']}"
        for i, e in enumerate(entities)
    )


def write_brat(docs: Dataset, out_dir: str) -> None:
    """Write one .txt/.ann pair per document (debug sink)."""
    os.makedirs(out_dir, exist_ok=True)
    for b in docs.iter_batches(batch_format="pyarrow"):
        d = b.to_pydict()
        for i in range(b.num_rows):
            stem = os.path.join(out_dir, d["doc_id"][i])
            with open(stem + ".txt", "w", encoding="utf-8") as f:
                f.write(d["text"][i])
            with open(stem + ".ann", "w", encoding="utf-8") as f:
                f.write(format_ann(d["entities"][i]))
