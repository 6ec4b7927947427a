"""CoNLL / brat IO and EP3 round-trip tests (SURVEY.md S1/S2/S5/S6)."""

from __future__ import annotations

import os

import pytest

from neuroner_ray.pipelines.convert import (
    brat_docs_to_conll,
    conll_to_brat_entities,
    fill_surfaces,
)
from neuroner_ray.sources.brat import (
    check_compatibility,
    format_ann,
    parse_ann,
    read_brat,
    write_brat,
)
from neuroner_ray.sources.conll import (
    format_sentence,
    parse_conll_text,
    read_conll,
    write_conll,
)

CONLL_SAMPLE = """\
-DOCSTART- O

Alice doc1 0 5 B-PER
Johnson doc1 6 13 I-PER
works doc1 14 19 O
at doc1 20 22 O
Acme doc1 23 27 B-ORG
. doc1 28 29 O

Paris doc1 30 35 B-LOC
is doc1 36 38 O
nice doc1 39 43 O
. doc1 44 45 O
"""


def test_parse_conll_text():
    sents = parse_conll_text(CONLL_SAMPLE)
    assert len(sents) == 2
    assert sents[0]["tokens"][:2] == ["Alice", "Johnson"]
    assert sents[0]["labels"][-2] == "B-ORG"
    assert sents[0]["starts"][0] == 0 and sents[0]["ends"][1] == 13
    assert sents[1]["tokens"][0] == "Paris"


def test_conll_read_write_round_trip(tmp_path):
    src = tmp_path / "train.txt"
    src.write_text(CONLL_SAMPLE)
    ds = read_conll(str(src))
    out = tmp_path / "out.txt"
    write_conll(ds, str(out))
    # re-parse: same sentences (DOCSTART dropped is expected)
    a = parse_conll_text(CONLL_SAMPLE)
    b = parse_conll_text(out.read_text())
    assert a == b


def test_brat_parse_and_integrity():
    text = "Alice Johnson works at Acme ."
    ann = "T1\tPER 0 13\tAlice Johnson\nT2\tORG 23 27\tAcme\nT3\tLOC 0 5\tWRONG"
    ents = parse_ann(ann)
    assert len(ents) == 3
    bad = check_compatibility(text, ents)
    assert len(bad) == 1 and bad[0]["surface"] == "WRONG"


def test_brat_round_trip(tmp_path):
    d = tmp_path / "brat"
    d.mkdir()
    text = "Alice Johnson works at Acme Corp . Paris is nice ."
    (d / "doc1.txt").write_text(text)
    (d / "doc1.ann").write_text(
        "T1\tPER 0 13\tAlice Johnson\nT2\tORG 23 32\tAcme Corp\nT3\tLOC 35 40\tParis"
    )
    docs, quarantine = read_brat(str(d))
    assert quarantine.count() == 0
    # brat → conll
    conll = brat_docs_to_conll(docs)
    rows = conll.take_all()
    assert len(rows) == 2  # two sentences
    assert rows[0]["labels"][0] == "B-PER"
    # conll → brat (round trip)
    ents = conll_to_brat_entities(conll)
    filled = fill_surfaces(ents, {"doc1": text})
    got = filled.take_all()[0]["entities"]
    want = parse_ann((d / "doc1.ann").read_text())
    assert sorted(
        (e["ent_type"], e["start"], e["end"], e["surface"]) for e in got
    ) == sorted((e["ent_type"], e["start"], e["end"], e["surface"]) for e in want)
    # write back out
    out_dir = tmp_path / "out"
    write_brat(docs, str(out_dir))
    assert (out_dir / "doc1.ann").read_text() == (d / "doc1.ann").read_text()


def test_brat_quarantine_routing(tmp_path):
    d = tmp_path / "brat"
    d.mkdir()
    (d / "doc1.txt").write_text("Alice went home .")
    (d / "doc1.ann").write_text("T1\tPER 0 5\tAlice\nT2\tLOC 6 10\tWRONG")
    docs, quarantine = read_brat(str(d))
    ddf = docs.to_pandas()
    assert len(ddf.iloc[0]["entities"]) == 1  # good span kept
    q = quarantine.to_pandas()
    assert len(q) == 1 and q.iloc[0]["surface"] == "WRONG"


def test_split_sentences_partitions_text_with_internal_dots():
    """Review finding: the old sentencizer dropped any prefix containing a
    '.' not followed by whitespace (decimals, versions, abbreviations)."""
    from neuroner_ray.functions.tokenize import split_sentences

    text = "Version 2.0 shipped today. U.S.A. won. See https://x.y/z now"
    spans = split_sentences(text)
    covered = "".join(text[s:e] for s, e in spans)
    # every non-space char is inside some span
    assert covered.replace(" ", "") == text.replace(" ", "")
    assert text[spans[0][0] : spans[0][1]] == "Version 2.0 shipped today."


def test_parse_conll_tolerates_multicolumn_files():
    """Review finding: int(fields[2]) crashed on standard 5+ column CoNLL
    (lemma/POS/chunk variants)."""
    from neuroner_ray.sources.conll import parse_conll_text

    text = "word LEMMA POS CHUNK B-PER\nother L P C O\n"
    sents = parse_conll_text(text)
    assert sents[0]["tokens"] == ["word", "other"]
    assert sents[0]["labels"] == ["B-PER", "O"]
    assert sents[0]["starts"] == [-1, -1]
