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
