"""T2/T3 as a Ray actor-pool stage: the NumPy BiLSTM-CRF tagger.

Reference inference path: src/train.py::prediction_step (≈L60–L160) — one
sentence at a time through EntityLSTM + viterbi_decode. Here it is a
callable class for ``map_batches``: weights + vocab load once per actor
(``__init__``), each Arrow batch of turns is tagged with bucketed padded
batching (sequences sorted by length, lockstep LSTM over [B,T,·] arrays)
and vectorized Viterbi — no per-sentence Python loop over timesteps×rows.

A per-actor char-feature cache memoizes the char-BiLSTM output per unique
token (the reference recomputes it per occurrence; token surface forms
repeat heavily, so this is a large win with identical semantics).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions.labels import bioes_to_bio
from ..state.checkpoint import load_checkpoint
from ..state.model import (
    char_features_unique,
    forward_scores_batch,
    viterbi_decode_batch,
)
from .tagger import _append_labels_mentions

# resolved against the repo root (package parent), not the cwd: Ray workers
# and processes launched elsewhere must find the same fixture checkpoint
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_CHECKPOINT = os.path.join(_REPO_ROOT, "tests", "fixtures", "checkpoint")
_CACHE_MAX = 200_000  # unique tokens cached per actor
_SEQ_CACHE_MAX = 100_000  # unique token SEQUENCES (whole turns) per actor


def resolve_checkpoint(path: str) -> str:
    """cwd-independent checkpoint resolution: absolute paths pass through,
    relative ones resolve against the repo root."""
    return path if os.path.isabs(path) else os.path.join(_REPO_ROOT, path)


class NeuralTagger:
    """``ds.map_batches(NeuralTagger, fn_constructor_args=(ckpt_dir,),
    batch_format="pyarrow", concurrency=N)``."""

    def __init__(
        self,
        checkpoint_dir: str = DEFAULT_CHECKPOINT,
        emit_bio: bool = True,
        bucket_size: int = 256,
    ):
        self.params, self.vocab = load_checkpoint(resolve_checkpoint(checkpoint_dir))
        # inference in float32: identical decisions at these score margins,
        # half the memory bandwidth (the multi-core numpy bottleneck)
        self.params = {
            k: v.astype(np.float32) if v.dtype == np.float64 else v
            for k, v in self.params.items()
        }
        self.emit_bio = emit_bio
        self.bucket_size = bucket_size
        self.char_dim2 = 2 * self.params["char_Wh_f"].shape[0]
        self._char_cache: dict[str, np.ndarray] = {}
        self._seq_cache: dict[tuple, list[str]] = {}

    # -- char features with per-unique-token memoization -------------------
    def _char_feats(self, tokens: list[str]) -> np.ndarray:
        # evict BEFORE inserting this batch's tokens, so the entries the
        # stack below depends on are never cleared out from under it
        if len(self._char_cache) > _CACHE_MAX:
            self._char_cache.clear()
        missing = [t for t in set(tokens) if t not in self._char_cache]
        if missing:
            ids = [self.vocab.char_indices(t) for t in missing]
            feats = char_features_unique(self.params, ids)
            for t, f in zip(missing, feats):
                self._char_cache[t] = f
        if not tokens:
            return np.zeros((0, self.char_dim2), dtype=self.params["char_emb"].dtype)
        return np.stack([self._char_cache[t] for t in tokens])

    _MAX_BUCKET_AREA = 400_000  # rows × padded length cap (bounds [B,T,C] RAM)

    def _buckets(self, order: list[int], seqs: list[list[str]]):
        """Length-sorted buckets capped by row count AND padded area, so one
        pathological 10k-token turn can't force a huge padded batch."""
        bucket: list[int] = []
        max_len = 0
        for i in order:
            if not seqs[i]:
                continue
            cand_len = max(max_len, len(seqs[i]))
            if bucket and (
                len(bucket) >= self.bucket_size
                or (len(bucket) + 1) * cand_len > self._MAX_BUCKET_AREA
            ):
                yield bucket
                bucket, max_len = [], 0
                cand_len = len(seqs[i])
            bucket.append(i)
            max_len = cand_len
        if bucket:
            yield bucket

    def _tag_sequences(self, seqs: list[list[str]]) -> list[list[str]]:
        """Tag many token sequences with length-bucketed padded batches."""
        out: list[list[str]] = [[] for _ in seqs]
        order = sorted(range(len(seqs)), key=lambda i: len(seqs[i]))
        i2l = self.vocab.index_to_label
        for bidx in self._buckets(order, seqs):
            lengths = np.array([len(seqs[i]) for i in bidx], dtype=np.int64)
            Tmax = int(lengths.max())
            B = len(bidx)
            tok_pad = np.zeros((B, Tmax), dtype=np.int64)
            # match the float32 inference dtype: a default-float64 pad
            # would upcast the cached features and force forward_scores to
            # copy the whole [B,T,2H] array back down
            chf_pad = np.zeros(
                (B, Tmax, self.char_dim2), dtype=self.params["char_emb"].dtype
            )
            for row, i in enumerate(bidx):
                toks = seqs[i]
                tok_pad[row, : len(toks)] = [
                    self.vocab.token_index(t) for t in toks
                ]
                chf_pad[row, : len(toks)] = self._char_feats(toks)
            U = forward_scores_batch(self.params, tok_pad, chf_pad, lengths)
            paths = viterbi_decode_batch(U, self.params["crf_A"], lengths)
            for row, i in enumerate(bidx):
                labs = [i2l[j] for j in paths[row, : lengths[row]]]
                out[i] = bioes_to_bio(labs) if self.emit_bio else labs
        return out

    def _tag_sequences_cached(self, seqs: list[list[str]]) -> list[list[str]]:
        """Per-actor memo over whole token sequences: transcripts repeat
        turn text heavily (~54% duplicate turns in the synthetic corpus;
        greetings/acks dominate real ones too), and the tagger is
        deterministic per sequence, so identical turns need one forward
        pass per actor, not one per occurrence. Same clear-at-cap policy
        as the char cache (bounded actor heap)."""
        if len(self._seq_cache) > _SEQ_CACHE_MAX:
            self._seq_cache.clear()
        keys = [tuple(s) for s in seqs]
        missing: list[tuple] = []
        seen: set[tuple] = set()
        for k in keys:
            if k not in self._seq_cache and k not in seen:
                seen.add(k)
                missing.append(k)
        if missing:
            tagged = self._tag_sequences([list(k) for k in missing])
            for k, labs in zip(missing, tagged):
                self._seq_cache[k] = labs
        return [self._seq_cache[k] for k in keys]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .tagger import _tokens_of_batch

        toks_per_row = _tokens_of_batch(batch)
        seqs = [[t for t, _, _ in toks] for toks in toks_per_row]
        labels_per_row = self._tag_sequences_cached(seqs)
        return _append_labels_mentions(batch, labels_per_row, toks_per_row)
