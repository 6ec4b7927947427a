"""Label algebra property tests (SURVEY.md §5: M3/M4/M5/M6/M9 + A2)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neuroner_ray.functions.conlleval import count_sequence, evaluate
from neuroner_ray.functions.labels import (
    assemble_spans,
    bio_to_bioes,
    bioes_to_bio,
    project_labels,
    spans_to_bio,
)

TYPES = ["PER", "ORG", "LOC", "TOOL"]


@st.composite
def bio_sequences(draw):
    """Well-formed BIO sequences."""
    n = draw(st.integers(0, 12))
    labs = []
    open_type = None
    for _ in range(n):
        choice = draw(st.integers(0, 2))
        if choice == 0:
            labs.append("O")
            open_type = None
        elif choice == 1 or open_type is None:
            open_type = draw(st.sampled_from(TYPES))
            labs.append("B-" + open_type)
        else:
            labs.append("I-" + open_type)
    return labs


@st.composite
def arbitrary_sequences(draw):
    """Arbitrary (possibly ill-formed) BIO/BIOES sequences."""
    n = draw(st.integers(0, 12))
    prefixes = ["O", "B-", "I-", "E-", "S-"]
    labs = []
    for _ in range(n):
        p = draw(st.sampled_from(prefixes))
        labs.append(p if p == "O" else p + draw(st.sampled_from(TYPES)))
    return labs


@given(bio_sequences())
@settings(max_examples=200)
def test_bio_bioes_round_trip(labs):
    assert bioes_to_bio(bio_to_bioes(labs)) == labs


@given(bio_sequences())
@settings(max_examples=200)
def test_bioes_preserves_spans(labs):
    assert assemble_spans(bio_to_bioes(labs)) == assemble_spans(labs)


@given(arbitrary_sequences())
@settings(max_examples=200)
def test_spans_partition_entity_tokens(labs):
    """Every non-O token is covered by exactly one span; spans don't overlap."""
    spans = assemble_spans(labs)
    covered = []
    for _, i, j in spans:
        assert i <= j
        covered.extend(range(i, j + 1))
    assert len(covered) == len(set(covered))
    non_o = {i for i, l in enumerate(labs) if l != "O"}
    assert set(covered) == non_o


def test_conlleval_leniency_i_after_o():
    # I-X after O starts a new entity (Perl conlleval behavior)
    assert assemble_spans(["O", "I-PER", "I-PER", "O"]) == [("PER", 1, 2)]
    # I-Y after B-X closes X and starts Y
    assert assemble_spans(["B-ORG", "I-LOC"]) == [("ORG", 0, 0), ("LOC", 1, 1)]
    # B-X B-X = two entities
    assert assemble_spans(["B-PER", "B-PER"]) == [("PER", 0, 0), ("PER", 1, 1)]


def test_spans_to_bio_and_back():
    toks = [(0, 5), (6, 8), (9, 14), (15, 16)]
    spans = [("PER", 0, 8), ("LOC", 9, 14)]
    bio = spans_to_bio(toks, spans)
    assert bio == ["B-PER", "I-PER", "B-LOC", "O"]
    assert assemble_spans(bio) == [("PER", 0, 1), ("LOC", 2, 2)]


def test_project_labels_modes():
    labs = ["B-PER", "I-PER", "O", "B-LOC"]
    assert project_labels(labs, "token") == ["PER", "PER", "O", "LOC"]
    assert project_labels(labs, "binary") == ["ENT", "ENT", "O", "ENT"]
    assert project_labels(labs, "conll") == labs


def test_conlleval_known_example():
    gold = [["B-PER", "I-PER", "O", "B-LOC"], ["O", "B-ORG"]]
    pred = [["B-PER", "I-PER", "O", "B-ORG"], ["O", "B-ORG"]]
    m = evaluate(gold, pred)
    # 2 TP (PER span, ORG in sent2), 1 FP (ORG for LOC), 1 FN (LOC)
    assert m["precision"] == pytest.approx(100 * 2 / 3)
    assert m["recall"] == pytest.approx(100 * 2 / 3)
    assert m["accuracy"] == pytest.approx(100 * 5 / 6)
    assert m["per_type"]["LOC"]["recall"] == 0.0


@given(arbitrary_sequences(), arbitrary_sequences())
@settings(max_examples=100)
def test_conlleval_self_is_perfect(a, b):
    if len(a) != len(b):
        a = a[: min(len(a), len(b))]
        b = b[: len(a)]
    c = count_sequence(a, a)
    assert not c.fp and not c.fn
    assert c.correct_tokens == len(a)
