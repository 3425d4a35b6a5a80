"""A2 — candidate entity-link scoring as a warm-state actor-pool stage.

The reference's analog is the embedding encoder backing its hybrid
vector index (src/ai/ai_agent.py:126-138, 157-169, 187-198): model
weights loaded once per process, then reused per request. In the batch
engine this is the stage between mention extraction and the
canonicalization shuffle: each mention is scored against a candidate
vocabulary of canonical entities, and confident matches adopt the
canonical surface before the groupby — shrinking the key space the
shuffle has to move.

The scorer here is deterministic (character-trigram Jaccard against a
broadcast vocabulary — no model weights exist in this container), but
the stage shape is the production one: vocabulary fetched from the
object store once per actor in ``__init__`` (``ray.put`` on the
driver), trigram index precomputed per actor, vectorized scoring per
batch. Swapping in a GPU bi-encoder changes only ``__init__`` /
``_score``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _trigrams(s: str) -> frozenset[str]:
    s = f"  {s} "
    return frozenset(s[i:i + 3] for i in range(len(s) - 2))


class EntityLinkScorer:
    """Actor-pool stage: adds ``link_entity`` (best candidate or the
    mention itself) and ``link_score`` columns for subj and obj."""

    def __init__(self, vocab_ref, threshold: float = 0.75):
        import ray

        vocab: list[str] = sorted(ray.get(vocab_ref))
        self.threshold = threshold
        self.vocab = vocab
        self.vocab_tg = [_trigrams(v) for v in vocab]
        # inverted index: trigram -> candidate ids (bounds the scan)
        self.inv: dict[str, list[int]] = {}
        for i, tg in enumerate(self.vocab_tg):
            for t in tg:
                self.inv.setdefault(t, []).append(i)
        self._cache: dict[str, tuple[str, float]] = {}

    def _score(self, mention: str) -> tuple[str, float]:
        hit = self._cache.get(mention)
        if hit is not None:
            return hit
        tg = _trigrams(mention)
        counts: dict[int, int] = {}
        for t in tg:
            for i in self.inv.get(t, ()):
                counts[i] = counts.get(i, 0) + 1
        best, best_s = mention, 0.0
        for i, inter in counts.items():
            union = len(tg) + len(self.vocab_tg[i]) - inter
            s = inter / union if union else 1.0
            if s > best_s or (s == best_s and self.vocab[i] < best):
                best, best_s = self.vocab[i], s
        out = (best, best_s) if best_s >= self.threshold else (mention, best_s)
        self._cache[mention] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj = batch.column("subj").to_pylist()
        obj = batch.column("obj").to_pylist()
        se, ss = zip(*(self._score(m) for m in subj)) if subj else ((), ())
        oe, os_ = zip(*(self._score(m) for m in obj)) if obj else ((), ())
        out = batch.append_column("subj_link", pa.array(list(se), pa.string()))
        out = out.append_column("subj_link_score",
                                pa.array(list(ss), pa.float64()))
        out = out.append_column("obj_link", pa.array(list(oe), pa.string()))
        out = out.append_column("obj_link_score",
                                pa.array(list(os_), pa.float64()))
        return out


def link_entities(triples, vocab: list[str], *, threshold: float = 0.75,
                  concurrency: int = 2, batch_size: int = 1024,
                  num_cpus: float = 0.5):
    """Score triple endpoints against a canonical vocabulary. The vocab
    is broadcast ONCE (``ray.put``), never shipped per batch.

    ``num_cpus`` defaults fractional: this pool runs CONCURRENTLY with
    the upstream extraction pool and the downstream dedup shuffle — at
    full-CPU actors the pools pin every scheduling slot in a small
    session and the shuffle's map tasks starve (the documented
    pool+join deadlock, stages/joins.py)."""
    import ray

    ref = ray.put(list(vocab))
    return triples.map_batches(
        EntityLinkScorer, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs={"vocab_ref": ref, "threshold": threshold},
        concurrency=concurrency, num_cpus=num_cpus)
