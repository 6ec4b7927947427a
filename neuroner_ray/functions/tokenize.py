"""Offset-preserving deterministic tokenizer (SURVEY.md §2.2 M1).

Reference contract: src/brat_to_conll.py::get_sentences_and_tokens_from_spacy
(≈L60–L100) — non-destructive tokenization emitting per-token
``(text, start, end)`` character offsets into the source text, skipping
whitespace. spaCy is not available in this environment, so the contract is
implemented with a fixed regex whose semantics are reproducible in DuckDB/RE2
for oracle checks (see TOKEN_PATTERN): runs of word characters, or single
non-word non-space characters (punctuation isolated, offsets exact).

Ray mapping: a stateless ``map_batches`` transform over Arrow batches
(``batch_format="pyarrow"``); the regex is compiled once per process at
module import, not per batch.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..schemas import TOKEN_STRUCT

# ASCII word runs or a single other non-space char. Written with explicit
# classes so Python re and DuckDB's RE2 agree codepoint-for-codepoint.
TOKEN_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize_text(text: str) -> list[tuple[str, int, int]]:
    """Tokenize one string → [(token, start, end)]; ``text[start:end] == token``."""
    return [(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def _tokens_list_array(texts: list[str]) -> pa.ListArray:
    """Build a list<struct<text,start,end>> column for a batch of texts."""
    offsets = [0]
    tok_text: list[str] = []
    tok_start: list[int] = []
    tok_end: list[int] = []
    for text in texts:
        if text:
            for m in _TOKEN_RE.finditer(text):
                tok_text.append(m.group(0))
                tok_start.append(m.start())
                tok_end.append(m.end())
        offsets.append(len(tok_text))
    values = pa.StructArray.from_arrays(
        [
            pa.array(tok_text, pa.string()),
            pa.array(tok_start, pa.int32()),
            pa.array(tok_end, pa.int32()),
        ],
        fields=list(TOKEN_STRUCT),
    )
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)


def tokenize_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append a ``tokens: list<struct<text,start,end>>`` column (M1)."""
    texts = batch[text_col].to_pylist()
    return batch.append_column("tokens", _tokens_list_array(texts))


# a sentence boundary is a .!? run followed by whitespace or end-of-text —
# '.' inside "2.0"/"U.S.A."/URLs is NOT a boundary. Scanning for boundaries
# and slicing between them PARTITIONS the text; the old alternation regex
# silently skipped any prefix containing a non-boundary '.', losing tokens.
_SENT_BOUNDARY_RE = re.compile(r"[.!?]+(?=\s|$)")


def split_sentences(text: str) -> list[tuple[int, int]]:
    """Deterministic sentencizer (the reference uses spaCy's; same contract:
    non-destructive char spans covering the text, split after .!? runs)."""

    def _trimmed(s: int, e: int) -> tuple[int, int]:
        while s < e and text[s].isspace():
            s += 1
        while e > s and text[e - 1].isspace():
            e -= 1
        return s, e

    spans = []
    start = 0
    for m in _SENT_BOUNDARY_RE.finditer(text):
        s, e = _trimmed(start, m.end())
        if s < e:
            spans.append((s, e))
        start = m.end()
    s, e = _trimmed(start, len(text))
    if s < e:
        spans.append((s, e))
    return spans


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Cheap variant: only ``n_tokens: int64`` (for text-analysis queries)."""
    counts = [
        len(_TOKEN_RE.findall(t)) if t else 0 for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("n_tokens", pa.array(counts, pa.int64()))
