"""Deterministic synthetic transcripts generator (FIXTURES.md F1).

The driver provides no ``transcripts`` table, and BASELINE.json's
``input_hint`` mandates building over ``(conv_id, turn_idx, role, text,
tool, ts)``; this module synthesises that table deterministically
(zlib.crc32-keyed choices, no RNG state) at any scale, together with the
gold mention/triple tables the P/R harness (north_rule "triple P/R >= 0.95")
compares against. Gold is exact by construction: entities are placed from a
closed gazetteer with known character offsets.

Everything here is plain Python + pyarrow (no Ray): generation happens once
per scale and is cached as Parquet; pipelines then ``ray.data.read_parquet``
the cache so benchmarks measure the pipeline, not generation.

Reference anchor (shape only): the CoNLL-2003 data-folder convention the
reference reads (src/main.py::get_valid_dataset_filepaths ≈L40–L120) is
replaced by this Parquet source (SURVEY.md §2.1 S9).
"""

from __future__ import annotations

import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

# --------------------------------------------------------------------------
# Gazetteer. Surfaces are grouped by canonical entity so linking /
# canonicalization (SURVEY.md J4/A6) has ground truth: every surface in one
# tuple must end up in the same canonical cluster.
# --------------------------------------------------------------------------
_CANON_GROUPS: dict[str, list[tuple[str, ...]]] = {
    "PER": [
        ("Alice Johnson", "alice johnson", "A. Johnson"),
        ("Bob Stone", "bob stone"),
        ("Carol Diaz", "Dr. Carol Diaz"),
        ("Dave Kim", "dave kim"),
        ("Erin Brock", "E. Brock"),
        ("Frank Mueller", "frank mueller"),
        ("Grace Hopper2", "grace hopper2"),
        ("Hank Pym", "hank pym"),
        ("Ivy Chen", "I. Chen"),
        ("Jack Ryan", "jack ryan"),
        ("Karl Osei", "K. Osei"),
        ("Lena Park", "lena park"),
    ],
    "ORG": [
        ("Acme Corp", "Acme Corporation", "ACME", "acme corp"),  # hot entity
        ("Globex", "Globex Inc", "globex"),
        ("Initech", "initech"),
        ("Umbrella Labs", "umbrella labs"),
        ("Stark Industries", "Stark Ind"),
        ("Wayne Enterprises", "wayne enterprises"),
        ("Hooli", "hooli"),
        ("Vehement Capital", "vehement capital"),
        ("Massive Dynamic", "massive dynamic"),
        ("Cyberdyne Systems", "Cyberdyne"),
    ],
    "LOC": [
        ("Paris", "paris"),
        ("New York", "new york", "New York City"),
        ("Berlin", "berlin"),
        ("Tokyo", "tokyo"),
        ("Sao Paulo", "sao paulo"),
        ("Cape Town", "cape town"),
        ("Oslo", "oslo"),
        ("Mumbai", "mumbai"),
        ("Lagos", "lagos"),
        ("Zone51", "zone51"),
    ],
    "TOOL": [
        ("GrepSearch", "grepsearch"),
        ("WebFetch9", "webfetch9"),
        ("Calc3000", "calc3000"),
        ("DataLoader", "dataloader"),
        ("BashRunner", "bashrunner"),
    ],
}

HOT_SURFACE = "Acme Corp"  # ~5% of turns mention it (skew/salting exercise)

# flat per-type surface lists + surface -> canonical map
GAZETTEER: dict[str, list[str]] = {}
CANONICAL_OF: dict[str, str] = {}
for _t, _groups in _CANON_GROUPS.items():
    GAZETTEER[_t] = []
    for _g in _groups:
        for _s in _g:
            GAZETTEER[_t].append(_s)
            CANONICAL_OF[_s] = _g[0]

TOOL_NAMES = [g[0] for g in _CANON_GROUPS["TOOL"]]

# --------------------------------------------------------------------------
# Sentence templates. Each: (template, slot types, predicate or None).
# Predicate verbs are the fixed lexicon the M11 extractor matches, so gold
# triples are exact by construction.
# --------------------------------------------------------------------------
TEMPLATES: list[tuple[str, tuple[str, ...], str | None]] = [
    ("{0} works at {1} .", ("PER", "ORG"), "works_at"),
    ("{0} visited {1} last week .", ("PER", "LOC"), "visited"),
    ("{0} used {1} to parse the logs .", ("PER", "TOOL"), "used"),
    ("{0} is based in {1} .", ("ORG", "LOC"), "based_in"),
    ("{0} met {1} at the summit .", ("PER", "PER"), "met"),
    ("{0} acquired {1} for an undisclosed sum .", ("ORG", "ORG"), "acquired"),
    ("{0} partnered with {1} on the rollout .", ("ORG", "ORG"), "partnered_with"),
    ("{0} flew to {1} for the review .", ("PER", "LOC"), "visited"),
    ("the report from {0} mentioned {1} twice .", ("ORG", "TOOL"), None),
    ("{0} asked about the quarterly numbers .", ("PER",), None),
    ("status update : all checks passed .", (), None),
    ("please rerun the failing job and attach the output .", (), None),
    ("the deployment finished without errors .", (), None),
    ("{0} opened a ticket about the outage in {1} .", ("PER", "LOC"), None),
    ("invoice 4521 was sent to {0} on friday .", ("ORG",), None),
    ("résumé review for café staff is done — naïve baseline wins .", (), None),
]

_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00 UTC in microseconds


def _h(*parts: object) -> int:
    """Stable 32-bit hash of the joined parts (seed material everywhere)."""
    return zlib.crc32(":".join(str(p) for p in parts).encode("utf-8"))


def gen_turn(conv_id: str, turn_idx: int) -> tuple[str, list[dict], list[dict]]:
    """Generate one turn: (text, gold mentions, gold triples).

    Mentions: {ent_type, start, end, surface}; triples: {subj, pred, obj,
    subj_type, obj_type} with surface forms as placed.
    """
    key = (conv_id, turn_idx)
    if _h(*key, "empty") % 97 == 0:  # ~1% empty-text turns (edge case)
        return "", [], []
    n_sents = 1 + _h(*key, "ns") % 3
    parts: list[str] = []
    mentions: list[dict] = []
    triples: list[dict] = []
    offset = 0
    for s in range(n_sents):
        tmpl, slot_types, pred = TEMPLATES[_h(*key, s, "t") % len(TEMPLATES)]
        fills: list[str] = []
        for j, st in enumerate(slot_types):
            pool = GAZETTEER[st]
            surf = pool[_h(*key, s, j, "g") % len(pool)]
            # hot entity: ~5% of ORG slots forced to the hot surface
            if st == "ORG" and _h(*key, s, j, "hot") % 20 == 0:
                surf = HOT_SURFACE
            if len(fills) and surf == fills[-1]:  # avoid X met X
                # Known quirk (kept frozen — goldens pin generator output):
                # when the hot override forced this slot to HOT_SURFACE and
                # the +1 replacement wraps to pool[0] == HOT_SURFACE, a rare
                # self-pair survives (~1/9000 ORG-ORG sentences). Gold and
                # pipeline agree on those rows, so P/R is unaffected.
                surf = pool[(_h(*key, s, j, "g") + 1) % len(pool)]
            fills.append(surf)
        # substitute while tracking character offsets
        sent = ""
        cursor = 0
        slot_spans: list[tuple[int, int, str, str]] = []
        for j, st in enumerate(slot_types):
            marker = "{" + str(j) + "}"
            pos = tmpl.index(marker, cursor)
            sent += tmpl[cursor:pos]
            start = offset + len(sent)
            sent += fills[j]
            slot_spans.append((start, start + len(fills[j]), st, fills[j]))
            cursor = pos + len(marker)
        sent += tmpl[cursor:]
        for start, end, st, surf in slot_spans:
            mentions.append(
                {"ent_type": st, "start": start, "end": end, "surface": surf}
            )
        if pred is not None and len(slot_types) >= 2:
            triples.append(
                {
                    "subj": fills[0],
                    "pred": pred,
                    "obj": fills[1],
                    "subj_type": slot_types[0],
                    "obj_type": slot_types[1],
                }
            )
        parts.append(sent)
        offset += len(sent) + 1  # joining space
    return " ".join(parts), mentions, triples


def conv_len(conv_id: str) -> int:
    """2–12 turns, deterministic per conversation (FIXTURES.md F1)."""
    return 2 + _h(conv_id, "len") % 11


def generate(
    n_convs: int, first_conv: int = 0, ts_base_turn: int = 0
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Build (transcripts, gold_mentions, gold_triples) Arrow tables.

    ``first_conv``/``ts_base_turn`` let shards be generated independently
    (same output as one big call, enabling parallel generation).
    """
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []
    m_conv: list[str] = []
    m_turn: list[int] = []
    m_rows: dict[str, list] = {"ent_type": [], "start": [], "end": [], "surface": []}
    t_conv: list[str] = []
    t_turn: list[int] = []
    t_rows: dict[str, list] = {
        "subj": [], "pred": [], "obj": [], "subj_type": [], "obj_type": []
    }
    role_cycle = ("user", "assistant", "tool")
    gturn = ts_base_turn
    for i in range(first_conv, first_conv + n_convs):
        cid = f"conv{i:06d}"
        off = _h(cid) % 3
        for t in range(conv_len(cid)):
            role = role_cycle[(t + off) % 3]
            text, mentions, triples = gen_turn(cid, t)
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append(
                TOOL_NAMES[_h(cid, t, "tool") % len(TOOL_NAMES)]
                if role == "tool"
                else ""
            )
            tss.append(_EPOCH_US + 60_000_000 * gturn)
            gturn += 1
            for m in mentions:
                m_conv.append(cid)
                m_turn.append(t)
                for k, v in m.items():
                    m_rows[k].append(v)
            for tr in triples:
                t_conv.append(cid)
                t_turn.append(t)
                for k, v in tr.items():
                    t_rows[k].append(v)

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    gold_mentions = pa.table(
        {
            "conv_id": pa.array(m_conv, pa.string()),
            "turn_idx": pa.array(m_turn, pa.int32()),
            "ent_type": pa.array(m_rows["ent_type"], pa.string()),
            "start": pa.array(m_rows["start"], pa.int32()),
            "end": pa.array(m_rows["end"], pa.int32()),
            "surface": pa.array(m_rows["surface"], pa.string()),
        }
    )
    gold_triples = pa.table(
        {
            "conv_id": pa.array(t_conv, pa.string()),
            "turn_idx": pa.array(t_turn, pa.int32()),
            "subj": pa.array(t_rows["subj"], pa.string()),
            "pred": pa.array(t_rows["pred"], pa.string()),
            "obj": pa.array(t_rows["obj"], pa.string()),
            "subj_type": pa.array(t_rows["subj_type"], pa.string()),
            "obj_type": pa.array(t_rows["obj_type"], pa.string()),
        }
    )
    return transcripts, gold_mentions, gold_triples


# --------------------------------------------------------------------------
# Cached parquet materialization. sf mirrors the driver testdata scales:
# target turns = 6_000_000 * sf (sf0.001 → ~6k turns, like lineitem rows).
# --------------------------------------------------------------------------
CACHE_ROOT = os.environ.get("NEURONER_RAY_DATA", "/tmp/neuroner_ray_data")
_AVG_TURNS_PER_CONV = 7.0


def n_convs_for_sf(sf: float) -> int:
    return max(4, int(round(6_000_000 * sf / _AVG_TURNS_PER_CONV)))


def sf_of_dir(sf_dir: str) -> float:
    """Parse '.../sf0.01' → 0.01 (fallback 0.001)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.001


def ensure_transcripts(sf: float, shard_convs: int = 2000) -> str:
    """Materialize transcripts for scale ``sf`` to the cache; return its dir.

    Writes sharded Parquet (one file per ``shard_convs`` conversations) so
    Ray can parallelize the read, plus gold mention/triple sidecars. Writes
    are atomic (tmp dir + rename) so concurrent callers are safe.
    """
    out = os.path.join(CACHE_ROOT, f"sf{sf:g}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    # per-process tmp dir: concurrent writers never share a staging area
    tmp = f"{out}.tmp-{os.getpid()}"
    os.makedirs(os.path.join(tmp, "transcripts"), exist_ok=True)
    n = n_convs_for_sf(sf)
    gm, gt = [], []
    ts_base = 0
    shard = 0
    for first in range(0, n, shard_convs):
        cnt = min(shard_convs, n - first)
        tr, m, t = generate(cnt, first_conv=first, ts_base_turn=ts_base)
        ts_base += tr.num_rows
        pq.write_table(
            tr, os.path.join(tmp, "transcripts", f"part-{shard:05d}.parquet")
        )
        gm.append(m)
        gt.append(t)
        shard += 1
    pq.write_table(pa.concat_tables(gm), os.path.join(tmp, "gold_mentions.parquet"))
    pq.write_table(pa.concat_tables(gt), os.path.join(tmp, "gold_triples.parquet"))
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(f"n_convs={n}\n")
    import shutil

    if os.path.exists(done):  # concurrent writer won
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        try:
            os.replace(tmp, out)
        except OSError:  # lost the publish race to another writer
            shutil.rmtree(tmp, ignore_errors=True)
    return out


def transcripts_dir_for(sf_dir: str) -> str:
    """Map a driver testdata dir ('/root/testdata/sf0.01') to a cached
    transcripts directory at the matching scale."""
    return os.path.join(ensure_transcripts(sf_of_dir(sf_dir)), "transcripts")
