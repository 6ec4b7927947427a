"""GloVe-format embedding file IO (SURVEY.md S3 / FIXTURES.md F4).

Reference: src/utils_nlp.py::load_pretrained_token_embeddings (≈L20–L60)
reads ``token v1 … vD`` text lines into a dict;
load_tokens_from_pretrained_token_embeddings_file (≈L60–L90) returns the
token set only. The table is vocabulary-sized: read driver-side, broadcast
with ``ray.put`` into scorer actors — never a shuffled Dataset (SURVEY J1).
"""

from __future__ import annotations

import math
import zlib

import numpy as np


def load_embeddings(path: str, dim: int | None = None) -> dict[str, np.ndarray]:
    """token → float32[D]; malformed lines skipped (reference behavior)."""
    out: dict[str, np.ndarray] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) < 2:
                continue
            tok = parts[0]
            try:
                vec = np.array([float(x) for x in parts[1:]], dtype=np.float32)
            except ValueError:
                continue
            if dim is not None and len(vec) != dim:
                continue
            out[tok] = vec
    return out


def load_token_set(path: str) -> set[str]:
    """Token set only (gates M8 closed-vocab behavior)."""
    out = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split(" ", 1)
            if parts and parts[0]:
                out.add(parts[0])
    return out


def write_fixture_embeddings(path: str, tokens: list[str], dim: int = 10) -> None:
    """FIXTURES.md F4 generator: deterministic vectors
    ``round(sin(crc32(tok) + j), 6)``."""
    with open(path, "w", encoding="utf-8") as f:
        for tok in tokens:
            base = zlib.crc32(tok.encode("utf-8"))
            vec = [round(math.sin(base + j), 6) for j in range(dim)]
            f.write(tok + " " + " ".join(str(v) for v in vec) + "\n")
