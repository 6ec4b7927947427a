"""M11 — dependency-pattern (subj, pred, obj) triple extraction.

Target-only operator (no reference counterpart; required by
BASELINE.json:north_rule "dependency-pattern relation extraction"). Semantics
frozen by the synthetic golden corpus (see
``neuroner_ray.sources.synth_transcripts``): for each pair of mentions
adjacent in a turn (no third mention between them), the normalized token
sequence strictly between them is looked up in a fixed predicate lexicon;
a hit emits ``(subj_surface, pred, obj_surface)`` with the mention types.

Ray mapping: stateless ``map_batches`` over tagged Arrow batches — the
lexicon is a module constant (shipped in the function closure, tiny), no
shuffle, no state.
"""

from __future__ import annotations

import re

import pyarrow as pa

# normalized between-mention token string → canonical predicate
PREDICATE_LEXICON: dict[str, str] = {
    "works at": "works_at",
    "visited": "visited",
    "flew to": "visited",
    "used": "used",
    "is based in": "based_in",
    "met": "met",
    "acquired": "acquired",
    "partnered with": "partnered_with",
}
MAX_GAP_CHARS = 40  # mentions further apart than this never relate

_NORM_RE = re.compile(r"[A-Za-z0-9_]+")


def _normalize_gap(text: str) -> str:
    return " ".join(_NORM_RE.findall(text)).lower()


def extract_triples_row(
    text: str, mentions: list[dict]
) -> list[tuple[str, str, str, str, str]]:
    """One turn → [(subj, pred, obj, subj_type, obj_type)]."""
    out = []
    for a, b in zip(mentions, mentions[1:]):  # mentions are in text order
        gap = text[a["end"] : b["start"]]
        if len(gap) > MAX_GAP_CHARS:
            continue
        pred = PREDICATE_LEXICON.get(_normalize_gap(gap))
        if pred is not None:
            out.append(
                (a["surface"], pred, b["surface"], a["ent_type"], b["ent_type"])
            )
    return out


def extract_triples_batch(batch: pa.Table) -> pa.Table:
    """Tagged turns → TRIPLES-schema table (one row per extracted triple)."""
    conv: list[str] = []
    turn: list[int] = []
    subj: list[str] = []
    pred: list[str] = []
    obj: list[str] = []
    st: list[str] = []
    ot: list[str] = []
    cids = batch["conv_id"].to_pylist()
    tidx = batch["turn_idx"].to_pylist()
    texts = batch["text"].to_pylist()
    ments = batch["mentions"].to_pylist()
    for cid, ti, text, ms in zip(cids, tidx, texts, ments):
        for s, p, o, s_t, o_t in extract_triples_row(text, ms):
            conv.append(cid)
            turn.append(ti)
            subj.append(s)
            pred.append(p)
            obj.append(o)
            st.append(s_t)
            ot.append(o_t)
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "subj_type": pa.array(st, pa.string()),
            "obj_type": pa.array(ot, pa.string()),
            "confidence": pa.array([1.0] * len(subj), pa.float32()),
        }
    )
