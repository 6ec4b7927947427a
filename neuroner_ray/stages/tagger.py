"""Sequence-tagging stages: gazetteer rule tagger + span assembly + explode.

The reference's inference path (EP2: src/train.py::prediction_step ≈L60–L160
over an EntityLSTM) is embarrassingly parallel over sentences; here it is an
actor-pool ``map_batches`` stage over Arrow batches of turns. Two tagger
implementations share the same contract (tokens in → BIO labels out):

- ``RuleTagger`` (this module): deterministic gazetteer longest-match —
  the skeleton tagger from SURVEY.md §7 step 1, and the gold-parity tagger
  for the synthetic corpus.
- ``NeuralTagger`` (``neuroner_ray.state.model``): the NumPy BiLSTM-CRF
  reimplementation of src/entity_lstm.py::EntityLSTM (SURVEY.md §2.3 T2/T3).

Both are callable classes → Ray actor pools: expensive setup (trie build /
weight load) happens once per actor in ``__init__``, not per batch.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.labels import assemble_spans
from ..functions.tokenize import tokenize_text
from ..schemas import MENTION_STRUCT
from ..sources.synth_transcripts import GAZETTEER


def build_trie(
    gazetteer: dict[str, list[str]] | None = None,
) -> dict[str, list[tuple[tuple[str, ...], str]]]:
    """first-token → [(token_tuple, ent_type)], longest first."""
    gazetteer = gazetteer if gazetteer is not None else GAZETTEER
    trie: dict[str, list[tuple[tuple[str, ...], str]]] = {}
    for ent_type, surfaces in gazetteer.items():
        for surf in surfaces:
            toks = tuple(t for t, _, _ in tokenize_text(surf))
            if not toks:
                continue
            trie.setdefault(toks[0], []).append((toks, ent_type))
    for cands in trie.values():
        cands.sort(key=lambda c: (-len(c[0]), c[0]))
    return trie


def tag_tokens(
    token_texts: list[str],
    trie: dict[str, list[tuple[tuple[str, ...], str]]],
) -> list[str]:
    """Greedy longest-match gazetteer tagging → BIO labels."""
    n = len(token_texts)
    labels = ["O"] * n
    i = 0
    while i < n:
        matched = False
        for toks, ent_type in trie.get(token_texts[i], ()):
            ln = len(toks)
            if i + ln <= n and tuple(token_texts[i : i + ln]) == toks:
                labels[i] = "B-" + ent_type
                for k in range(i + 1, i + ln):
                    labels[k] = "I-" + ent_type
                i += ln
                matched = True
                break
        if not matched:
            i += 1
    return labels


def mentions_from_labels(
    text: str,
    labels: list[str],
    starts: list[int],
    ends: list[int],
) -> list[dict]:
    """M3 span assembly applied per turn: labels+offsets → char-span mentions."""
    out = []
    for ent_type, ti, tj in assemble_spans(labels):
        cs, ce = starts[ti], ends[tj]
        out.append(
            {"ent_type": ent_type, "start": cs, "end": ce, "surface": text[cs:ce]}
        )
    return out


def _tokens_of_batch(batch: pa.Table) -> list[list[tuple[str, int, int]]]:
    """Per-row (text, start, end) tuples: reuse the ``tokens`` column when the
    batch was pre-tokenized, else tokenize inline (fused fast path — avoids
    materializing an Arrow list<struct> column that is immediately unpacked
    again)."""
    if "tokens" in batch.column_names:
        return [
            [(t["text"], t["start"], t["end"]) for t in toks]
            for toks in batch["tokens"].to_pylist()
        ]
    return [
        tokenize_text(t) if t else [] for t in batch["text"].to_pylist()
    ]


def _append_labels_mentions(
    batch: pa.Table,
    labels_per_row: list[list[str]],
    toks_per_row: list[list[tuple[str, int, int]]],
) -> pa.Table:
    """Append ``labels`` and assembled ``mentions`` columns."""
    texts = batch["text"].to_pylist()
    men_offsets = [0]
    m_type: list[str] = []
    m_start: list[int] = []
    m_end: list[int] = []
    m_surf: list[str] = []
    for text, toks, labs in zip(texts, toks_per_row, labels_per_row):
        starts = [s for _, s, _ in toks]
        ends = [e for _, _, e in toks]
        for m in mentions_from_labels(text, labs, starts, ends):
            m_type.append(m["ent_type"])
            m_start.append(m["start"])
            m_end.append(m["end"])
            m_surf.append(m["surface"])
        men_offsets.append(len(m_type))
    mention_values = pa.StructArray.from_arrays(
        [
            pa.array(m_type, pa.string()),
            pa.array(m_start, pa.int32()),
            pa.array(m_end, pa.int32()),
            pa.array(m_surf, pa.string()),
        ],
        fields=list(MENTION_STRUCT),
    )
    batch = batch.append_column(
        "labels", pa.array(labels_per_row, pa.list_(pa.string()))
    )
    return batch.append_column(
        "mentions",
        pa.ListArray.from_arrays(pa.array(men_offsets, pa.int32()), mention_values),
    )


class RuleTagger:
    """Actor-pool stage: turns → +labels +mentions (gazetteer longest-match).

    Use as ``ds.map_batches(RuleTagger, batch_format="pyarrow",
    concurrency=N)``; the match trie is built once per actor. Accepts raw
    turns (tokenizes inline — the fused fast path) or pre-tokenized batches
    with a ``tokens`` column.
    """

    def __init__(self, gazetteer: dict[str, list[str]] | None = None):
        self.trie = build_trie(gazetteer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks_per_row = _tokens_of_batch(batch)
        labels_per_row = [
            tag_tokens([t for t, _, _ in toks], self.trie) for toks in toks_per_row
        ]
        return _append_labels_mentions(batch, labels_per_row, toks_per_row)


_DEFAULT_TRIE: dict | None = None


def rule_tag_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task variant of RuleTagger with the default gazetteer.

    A plain function schedules as elastic tasks (no actor-pool ramp-up);
    the trie is built once per worker process and cached in the module
    global — same semantics as the actor, better scaling for the cheap
    gazetteer tagger. Use the class form for taggers with real state
    (NeuralTagger's weights)."""
    global _DEFAULT_TRIE
    if _DEFAULT_TRIE is None:
        _DEFAULT_TRIE = build_trie(None)
    toks_per_row = _tokens_of_batch(batch)
    labels_per_row = [
        tag_tokens([t for t, _, _ in toks], _DEFAULT_TRIE) for toks in toks_per_row
    ]
    return _append_labels_mentions(batch, labels_per_row, toks_per_row)


def explode_mentions(batch: pa.Table) -> pa.Table:
    """Tagged turns → one row per mention (MENTIONS schema).

    Stateless ``map_batches``; no shuffle — mentions stay co-located with
    their conversation's block.
    """
    conv: list[str] = []
    turn: list[int] = []
    etype: list[str] = []
    start: list[int] = []
    end: list[int] = []
    surf: list[str] = []
    cids = batch["conv_id"].to_pylist()
    tidx = batch["turn_idx"].to_pylist()
    ments = batch["mentions"].to_pylist()
    for cid, ti, ms in zip(cids, tidx, ments):
        for m in ms:
            conv.append(cid)
            turn.append(ti)
            etype.append(m["ent_type"])
            start.append(m["start"])
            end.append(m["end"])
            surf.append(m["surface"])
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "ent_type": pa.array(etype, pa.string()),
            "start": pa.array(start, pa.int32()),
            "end": pa.array(end, pa.int32()),
            "surface": pa.array(surf, pa.string()),
        }
    )
