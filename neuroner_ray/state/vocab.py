"""Vocabulary fit + embedding-lookup cascade (SURVEY.md T1 / M7 / M8 / J1).

Reference: src/dataset.py::load_dataset (≈L90–L300) builds token/char/label
index maps ordered by descending frequency (ties alphabetical) with a
prepended UNK; src/entity_lstm.py::load_pretrained_token_embeddings
(≈L200–L250) resolves each vocab token against the embedding dict through
the cascade exact → lower → digits→0 → lower+digits→0, counting match
categories (A5 telemetry).

The *fit* is a distributed census (``groupby().count()`` over exploded
tokens — or the pre-aggregated partial-count pattern); the resulting maps
are vocabulary-sized and broadcast (``ray.put``), never shuffled.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

UNK = "UNK"
PAD_CHAR_INDEX = 0  # reference reserves a padding character index


@dataclass
class Vocab:
    token_to_index: dict[str, int]
    character_to_index: dict[str, int]
    label_to_index: dict[str, int]
    index_to_label: list[str] = field(default_factory=list)

    def __post_init__(self):
        if not self.index_to_label:
            self.index_to_label = [
                l for l, _ in sorted(self.label_to_index.items(), key=lambda kv: kv[1])
            ]

    def token_index(self, token: str) -> int:
        """M8: OOV → UNK index."""
        return self.token_to_index.get(token, self.token_to_index[UNK])

    def char_indices(self, token: str) -> np.ndarray:
        ci = self.character_to_index
        return np.array(
            [ci[ch] for ch in token if ch in ci], dtype=np.int64
        )

    @property
    def n_tokens(self) -> int:
        return len(self.token_to_index)

    @property
    def n_chars(self) -> int:
        return max(self.character_to_index.values()) + 1

    @property
    def n_labels(self) -> int:
        return len(self.label_to_index)

    def to_json(self) -> dict:
        return {
            "token_to_index": self.token_to_index,
            "character_to_index": self.character_to_index,
            "label_to_index": self.label_to_index,
        }

    @classmethod
    def from_json(cls, d: dict) -> "Vocab":
        return cls(
            token_to_index=dict(d["token_to_index"]),
            character_to_index=dict(d["character_to_index"]),
            label_to_index=dict(d["label_to_index"]),
        )


def build_vocab(
    sentences: list[list[str]], label_seqs: list[list[str]]
) -> Vocab:
    """Driver-side fit from materialized sentences (fixture-scale path).

    Ordering matches the reference: tokens by count desc then token asc,
    UNK prepended at index 0; chars with a reserved padding index 0; labels
    sorted alphabetically.
    """
    tok_counts: Counter = Counter()
    char_counts: Counter = Counter()
    labels: set[str] = set()
    for sent in sentences:
        tok_counts.update(sent)
        for tok in sent:
            char_counts.update(tok)
    for seq in label_seqs:
        labels.update(seq)
    ordered = sorted(tok_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    token_to_index = {UNK: 0}
    for tok, _ in ordered:
        token_to_index[tok] = len(token_to_index)
    character_to_index = {}
    for ch in sorted(char_counts):
        character_to_index[ch] = len(character_to_index) + 1  # 0 = padding
    label_to_index = {lab: i for i, lab in enumerate(sorted(labels))}
    return Vocab(token_to_index, character_to_index, label_to_index)


def build_vocab_distributed(tokenized: Dataset, top_k: int | None = None) -> Counter:
    """T1 census as dataflow: tokenized turns → token counts (partial counts
    per batch, then a vocabulary-sized groupby-sum), collected to the driver
    (vocab ≪ memory by definition)."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for toks in batch["tokens"].to_pylist():
            c.update(t["text"] for t in toks)
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = (
        tokenized.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    out: Counter = Counter()
    for b in counts.iter_batches(batch_format="pyarrow"):
        out.update(dict(zip(b["token"].to_pylist(), b["n"].to_pylist())))
    if top_k:
        out = Counter(dict(out.most_common(top_k)))
    return out


_DIGIT_RE = re.compile(r"\d")


def embedding_cascade(
    token: str,
    emb: dict[str, np.ndarray],
    check_lower: bool = True,
    check_digits: bool = True,
) -> tuple[np.ndarray | None, str]:
    """M7: exact → lower → digits→0 → lower+digits→0; returns (vec, category)."""
    if token in emb:
        return emb[token], "exact"
    if check_lower and token.lower() in emb:
        return emb[token.lower()], "lower"
    if check_digits:
        zeroed = _DIGIT_RE.sub("0", token)
        if zeroed in emb:
            return emb[zeroed], "digits"
        if check_lower:
            lz = _DIGIT_RE.sub("0", token.lower())
            if lz in emb:
                return emb[lz], "lower+digits"
    return None, "miss"


def build_embedding_matrix(
    vocab: Vocab,
    emb: dict[str, np.ndarray],
    dim: int,
    seed: int = 42,
) -> tuple[np.ndarray, dict[str, int]]:
    """J1 broadcast join: [V, D] matrix; misses → seeded random rows.

    Returns the matrix and the A5 match-category telemetry counts.
    """
    rng = np.random.RandomState(seed)
    M = rng.uniform(-0.25, 0.25, size=(vocab.n_tokens, dim))
    stats: dict[str, int] = {
        "exact": 0, "lower": 0, "digits": 0, "lower+digits": 0, "miss": 0
    }
    for tok, idx in vocab.token_to_index.items():
        vec, cat = embedding_cascade(tok, emb)
        # short vectors (e.g. a word2vec header line "400000 300" parsed as
        # token '400000' with a 1-dim vector) would silently BROADCAST a
        # constant into the row; count them as misses instead
        if vec is not None and len(vec) < dim:
            vec, cat = None, "miss"
        stats[cat] += 1
        if vec is not None:
            M[idx] = vec[:dim]
    return M, stats
