"""Checkpoint save / restore with vocab remap (SURVEY.md S8 / T5 / J2).

Reference: per-epoch ``model_{epoch}.ckpt`` + pickled vocab +
parameters.ini (src/main.py ≈L300–L450, src/prepare_pretrained_model.py
≈L10–L120); selective weight reload with embedding-row remapping when the
new vocab differs (src/entity_lstm.py::restore_from_pretrained_model
≈L250–L330).

Here a checkpoint is a ``.npz`` of the parameter dict + a ``vocab.json``
sidecar. ``restore_with_remap`` implements the J2 old→new vocab inner join:
embedding rows are permuted by token string; tokens unseen in the old vocab
keep their fresh (seeded random) rows — same semantics as the reference's
``reload_token_embeddings`` path.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .vocab import Vocab


def save_checkpoint(path: str, params: dict[str, np.ndarray], vocab: Vocab) -> None:
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(os.path.join(path, "model.npz"), **params)
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(vocab.to_json(), f)


def load_checkpoint(path: str) -> tuple[dict[str, np.ndarray], Vocab]:
    with np.load(os.path.join(path, "model.npz")) as z:
        params = {k: z[k].copy() for k in z.files}
    with open(os.path.join(path, "vocab.json")) as f:
        vocab = Vocab.from_json(json.load(f))
    return params, vocab


def restore_with_remap(
    old_params: dict[str, np.ndarray],
    old_vocab: Vocab,
    new_vocab: Vocab,
    new_params: dict[str, np.ndarray],
    reload_token_embeddings: bool = True,
    reload_character_lstm: bool = True,
    reload_token_lstm: bool = True,
    reload_feedforward: bool = True,
    reload_crf: bool = True,
) -> dict[str, np.ndarray]:
    """T5: copy weight groups per reload_* flags; embeddings joined on token.

    ``new_params`` supplies shapes/defaults for anything not reloaded (and
    rows for tokens absent from the old vocab).
    """
    out = {k: v.copy() for k, v in new_params.items()}
    groups = {
        "char": ("char_emb", "char_Wx_f", "char_Wh_f", "char_b_f",
                 "char_Wx_b", "char_Wh_b", "char_b_b"),
        "tok_lstm": ("tok_Wx_f", "tok_Wh_f", "tok_b_f",
                     "tok_Wx_b", "tok_Wh_b", "tok_b_b"),
        "ff": ("ff_W", "ff_b", "out_W", "out_b"),
        "crf": ("crf_A",),
    }
    if reload_character_lstm:
        # char vocab remap (char string → index join), then LSTM weights
        for ch, new_i in new_vocab.character_to_index.items():
            old_i = old_vocab.character_to_index.get(ch)
            if old_i is not None and old_i < len(old_params["char_emb"]):
                out["char_emb"][new_i] = old_params["char_emb"][old_i]
        for k in groups["char"][1:]:
            out[k] = old_params[k].copy()
    if reload_token_embeddings:
        for tok, new_i in new_vocab.token_to_index.items():
            old_i = old_vocab.token_to_index.get(tok)
            if old_i is not None:
                out["tok_emb"][new_i] = old_params["tok_emb"][old_i]
    if reload_token_lstm:
        for k in groups["tok_lstm"]:
            out[k] = old_params[k].copy()
    if reload_feedforward:
        for k in groups["ff"]:
            out[k] = old_params[k].copy()
    if reload_crf:
        out["crf_A"] = old_params["crf_A"].copy()
    return out
