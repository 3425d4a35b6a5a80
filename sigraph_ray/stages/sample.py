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


def grouped_hash_cap(ds, *, key: str, group: str, k: int,
                     rank_col: str = "rank"):
    """Per-group deterministic cap — the crawl-curation "max N pages
    per host" rule (every Common-Crawl-style pipeline bounds a single
    domain's contribution before training). Keeps the ``k`` rows per
    ``group`` with the SMALLEST ``md5(str(key))`` — a pure function of
    content like every sampler here, so re-runs, resumes, block
    layouts and cluster sizes keep the same rows, and the SQL oracle
    (``row_number() OVER (PARTITION BY group ORDER BY md5(key), key)``)
    reproduces it exactly.

    Scale shape: one range sort via
    :func:`sigraph_ray.stages.collect.sorted_grouped_topk` — fragments
    are pre-capped at ``k`` rows so a degenerate group (one host owning
    half the crawl) cannot blow a worker block or the driver stitch."""
    from sigraph_ray.stages.collect import sorted_grouped_topk

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_hcap"] = (md5_hex(out[key].astype(str).tolist())
                        if len(out) else pd.Series(dtype="object"))
        return out

    capped = sorted_grouped_topk(
        ds.map_batches(add_hash, batch_format="pandas"),
        key=group, order_by=["_hcap", key],
        descending=[False, False], k=k, rank_col=rank_col)
    return capped.map_batches(lambda df: df.drop(columns=["_hcap"]),
                              batch_format="pandas")


def temperature_mixture(ds, *, key: str, stratum: str,
                        alpha: float = 0.5):
    """Temperature-based mixture rebalancing: per-stratum keep-rate
    ``r_s = (n_s / n_min) ** (alpha - 1)`` so sampled stratum masses
    follow ``n_s ** alpha`` (the multilingual/domain temperature
    sampling of public LM training recipes; alpha=1 keeps everything,
    alpha→0 equalizes strata). The rarest stratum always keeps rate
    1.0; rates are derived from the data, not hand-set like
    :func:`mixture_sample`.

    Determinism contract: counts come from per-batch ``value_counts``
    partials folded on the driver (O(#blocks × #strata) rows, no
    shuffle); the row filter is the same 16-bit md5 prefix as
    :func:`mixture_sample`. For the default ``alpha=0.5`` the rate is
    computed as ``sqrt(n_min / n_s)`` — IEEE sqrt and division are
    correctly rounded, so the SQL oracle's ``floor(sqrt(...) * 65536)``
    is bit-identical to ours; other alphas go through ``pow`` where
    that guarantee is platform-typical but not mandated."""
    import math

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        return (df[stratum].value_counts().rename_axis(stratum)
                .reset_index(name="n"))

    parts = ds.map_batches(cnt, batch_format="pandas",
                           batch_size=None).to_pandas()
    counts = parts.groupby(stratum)["n"].sum()
    if not len(counts):
        return ds
    n_min = float(counts.min())
    if alpha == 0.5:
        rates = {s: math.sqrt(n_min / float(n))
                 for s, n in counts.items()}
    else:
        rates = {s: (float(n) / n_min) ** (alpha - 1.0)
                 for s, n in counts.items()}
    limits = {s: math.floor(r * 65536.0) for s, r in rates.items()}

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        h16 = np.fromiter(
            (int(h[:4], 16)
             for h in md5_hex(df[key].astype(str).tolist())),
            dtype=np.int64, count=len(df))
        lim = df[stratum].map(lambda s: limits.get(s, 65536)).to_numpy()
        return df[h16 < lim]

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
