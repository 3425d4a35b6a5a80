"""Deterministic text embeddings (the sealed-sandbox stand-in for the
reference's embedding model — ai_agent.py:126-138 stores Document nodes
with ``text`` + ``embedding``; no model weights ship in this runtime).

Hashed character-3-gram bag projected to ``dim`` signed buckets
(feature hashing): stable across processes (splitmix64 over the
PYTHONHASHSEED-independent token hash), L2-normalized so cosine is the
natural metric. A real embedding model is a drop-in replacement at the
stage layer (stages/embeddings.DocEmbedder holds the "model" per
actor)."""

from __future__ import annotations

import numpy as np

from sigraph_ray.functions.hashing import splitmix64, token_hashes

DIM = 32


def _char_ngrams(text: str, n: int = 3) -> list[str]:
    t = " " + text.lower() + " "
    if len(t) < n:
        return [t]
    return [t[i:i + n] for i in range(len(t) - n + 1)]


def embed_texts(texts, dim: int = DIM) -> list[np.ndarray]:
    """One unit-norm float64 vector per text."""
    out = []
    for t in texts:
        h = token_hashes(_char_ngrams(t or ""))
        vec = np.zeros(dim, dtype=np.float64)
        if len(h):
            bucket = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where((splitmix64(h) >> np.uint64(63)).astype(bool),
                            1.0, -1.0)
            np.add.at(vec, bucket, sign)
        n = np.linalg.norm(vec)
        out.append(vec / n if n > 0 else vec)
    return out
