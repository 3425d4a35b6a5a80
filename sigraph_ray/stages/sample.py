"""Deterministic stratified sampling by content-hash bucket.

Beyond-reference operator (the reference has no sampling surface —
SURVEY.md §2.7). A training-data pipeline needs holdout/eval splits
that are a PURE FUNCTION of the row key: re-runs, resumes, different
block layouts and different cluster sizes must all pick the same rows.
Hash-bucket sampling gives that — row kept iff the first hex nibble of
``md5(str(key))`` falls below the stratum's bucket allowance (rate =
buckets/16) — and is embarrassingly parallel (a stateless
``map_batches`` filter, no shuffle, no RNG state).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sigraph_ray.functions.hashing import md5_hex


def stratified_hash_sample(ds, *, key: str, stratum: str,
                           buckets: dict[str, int],
                           default_buckets: int):
    """Keep each row iff ``int(md5(str(row[key]))[0], 16) <
    buckets.get(row[stratum], default_buckets)``. ``buckets`` maps
    stratum value → number of kept hex buckets out of 16 (e.g. 2 =
    12.5 % sample); unlisted strata use ``default_buckets`` —
    oversample minority strata by giving them more buckets."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        nib = np.fromiter(
            (int(h[0], 16) for h in md5_hex(df[key].astype(str).tolist())),
            dtype=np.int64, count=len(df))
        limit = (df[stratum].map(lambda s: buckets.get(s, default_buckets))
                 .to_numpy())
        return df[nib < limit]

    return ds.map_batches(f, batch_format="pandas")


def mixture_sample(ds, *, key: str, stratum: str,
                   rates: dict[str, float], default_rate: float):
    """Source-mixture resampling — the training-mixture balancing pass
    (keep each stratum at its own rate, e.g. up/down-weighting domains
    before tokenization; public practice per GPT-3/Pile mixture
    weights). Same determinism contract as
    :func:`stratified_hash_sample` but with 16-bit resolution: row kept
    iff ``int(md5(str(key))[:4], 16) < round(rate · 65536)``, a pure
    function of the row key — identical across re-runs, resumes, block
    layouts and cluster sizes, and reproducible in SQL nibble-by-nibble."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        h16 = np.fromiter(
            (int(h[:4], 16)
             for h in md5_hex(df[key].astype(str).tolist())),
            dtype=np.int64, count=len(df))
        limit = (df[stratum]
                 .map(lambda s: round(rates.get(s, default_rate) * 65536))
                 .to_numpy())
        return df[h16 < limit]

    return ds.map_batches(f, batch_format="pandas")


def weighted_sample_k(ds, *, key: str, weight: str, k: int):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis 2006, public): each row gets the key
    ``u^(1/w)`` where ``u`` is a uniform derived from ``md5(key)``
    (first 4 hex nibbles, +0.5, /65536 — never 0 or 1) and the global
    top-k keys are the sample. Inclusion probability is proportional
    to ``weight`` and, like every sampler here, the draw is a PURE
    FUNCTION of the row key — re-runs, resumes and any block layout
    pick the same rows, and the SQL oracle reproduces it exactly.

    Scale shape: per-batch vectorized key computation + per-batch
    ``head(k)`` partial, one tiny driver fold of O(#blocks × k) rows —
    no shuffle."""
    def score(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(_es=pd.Series(dtype="float64"))
        h16 = np.fromiter(
            (int(h[:4], 16)
             for h in md5_hex(df[key].astype(str).tolist())),
            dtype=np.int64, count=len(df))
        u = (h16 + 0.5) / 65536.0
        w = np.maximum(df[weight].to_numpy(dtype="float64"), 1e-12)
        out = df.copy()
        out["_es"] = u ** (1.0 / w)
        return out.sort_values(["_es", key],
                               ascending=[False, True]).head(k)

    parts = ds.map_batches(score, batch_format="pandas").to_pandas()
    out = (parts.sort_values(["_es", key], ascending=[False, True])
           .head(k).drop(columns=["_es"]).reset_index(drop=True))
    return out
