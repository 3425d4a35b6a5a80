"""Mergeable-sketch operators (the brief's "novel sketch" slot).

``approx_distinct``: distributed distinct-count via HyperLogLog —
per-batch register arrays (functions/hashing.hll_*), merged by register
max. The merge is associative and idempotent, so the operator is
partition-layout-independent and needs NO shuffle: every block emits one
fixed-size (2^p bytes) sketch row and the driver folds the O(#blocks)
sketches (at 8192 blocks and p=14 that is ≤128 MB through the driver —
the same bounded-stitch class as stages/collect; a tree-reduce pass
would remove even that if needed).

Approximate by design → rows-only in the driver contract; accuracy is
gated in pytest against the exact distinct count (≈0.8% rel. error at
p=14).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sigraph_ray.functions import hashing as H


def _sketch_batches(ds, cols: list[str], p: int):
    def f(df: pd.DataFrame) -> pd.DataFrame:
        key = df[cols[0]].astype(str)
        for c in cols[1:]:
            key = key + "\x1f" + df[c].astype(str)
        hs = H.splitmix64(pd.util.hash_pandas_object(
            key, index=False).to_numpy().astype(np.uint64))
        reg = H.hll_init(p)
        H.hll_add_hashes(reg, hs, p)
        return pd.DataFrame({"sketch": [reg.tobytes()]})
    return ds.map_batches(f, batch_format="pandas", batch_size=None)


def approx_distinct(ds, cols: list[str], *, p: int = H.HLL_P) -> float:
    """HLL estimate of the number of distinct ``cols`` tuples."""
    sketches = _sketch_batches(ds, cols, p).take_all()
    reg = H.hll_init(p)
    for row in sketches:
        reg = H.hll_merge(reg, np.frombuffer(row["sketch"], dtype=np.uint8))
    return H.hll_count(reg, p)


# fixed odd 64-bit mixing seeds — one per count-min row; constants, so
# sketches built on any worker/process merge exactly
_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


def approx_heavy_hitters(ds, col: str, *, k: int = 20, w: int = 4096,
                         d: int = 4, m: int = 256,
                         tokenize: bool = False) -> pd.DataFrame:
    """Approximate top-k heavy hitters via a Count-Min sketch (the
    approximate tier under the exact ``textstats.term_topk``): every
    block emits ONE fixed-size (d×w int64) sketch plus its local
    top-``m`` candidate values; sketches merge by element-wise sum
    (associative → partition-layout-independent counts), candidates by
    set union; the driver queries the merged sketch for each candidate
    and keeps the top ``k`` by estimated frequency (freq DESC, value
    ASC). Driver work is O(#blocks × (d·w + m)) — the bounded-stitch
    class; no shuffle anywhere. Estimates overcount by ≤ εN with
    ε ≈ e/w (classic CM bound); a true top-k value missing from every
    block's local top-m is the (Zipf-unlikely) miss mode — raise ``m``
    for flat distributions."""
    import re

    rx = re.compile(r"[a-z0-9]+") if tokenize else None

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        if tokenize:
            vals = (df[col].str.lower().str.findall(rx)
                    .explode().dropna())
        else:
            vals = df[col].astype(str)
        vc = vals.value_counts()
        uniq = vc.index.to_numpy(dtype=object)
        cnts = vc.to_numpy().astype(np.int64)
        hs = H.splitmix64(pd.util.hash_pandas_object(
            pd.Series(uniq, dtype="object"),
            index=False).to_numpy().astype(np.uint64))
        cms = np.zeros((d, w), dtype=np.int64)
        for i in range(d):
            idx = (H.splitmix64(hs ^ _CMS_SEEDS[i])
                   % np.uint64(w)).astype(np.int64)
            np.add.at(cms[i], idx, cnts)
        cand = [str(v) for v in uniq[:m]]  # value_counts is desc-sorted
        return pd.DataFrame({"sketch": [cms.tobytes()],
                             "cands": [cand]})

    def merge_partials(df: pd.DataFrame) -> pd.DataFrame:
        # tree-combine level: 64 block sketches fold into one before
        # the driver, so driver work is O(#blocks/64) even at extreme
        # block counts (sketch sums are associative)
        acc = np.zeros((d, w), dtype=np.int64)
        cands: list = []
        for _, row in df.iterrows():
            acc += np.frombuffer(row["sketch"],
                                 dtype=np.int64).reshape(d, w)
            cands.extend(row["cands"])
        return pd.DataFrame({"sketch": [acc.tobytes()],
                             "cands": [sorted(set(cands))[:64 * m]]})

    parts = (ds.map_batches(per_block, batch_format="pandas",
                            batch_size=None)
             .map_batches(merge_partials, batch_format="pandas",
                          batch_size=64)
             .take_all())
    if not parts:
        return pd.DataFrame({"value": pd.Series(dtype="object"),
                             "est_freq": pd.Series(dtype="int64")})
    cms = np.zeros((d, w), dtype=np.int64)
    cands: set[str] = set()
    for row in parts:
        cms += np.frombuffer(row["sketch"], dtype=np.int64).reshape(d, w)
        cands.update(row["cands"])
    cand_arr = np.array(sorted(cands), dtype=object)
    hs = H.splitmix64(pd.util.hash_pandas_object(
        pd.Series(cand_arr, dtype="object"),
        index=False).to_numpy().astype(np.uint64))
    est = np.full(len(cand_arr), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(d):
        idx = (H.splitmix64(hs ^ _CMS_SEEDS[i])
               % np.uint64(w)).astype(np.int64)
        est = np.minimum(est, cms[i][idx])
    out = (pd.DataFrame({"value": cand_arr, "est_freq": est})
           .sort_values(["est_freq", "value"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return out


def grouped_approx_distinct(ds, *, group: str, cols: list[str],
                            p: int = H.HLL_P) -> pd.DataFrame:
    """Per-group HLL distinct count (e.g. distinct users per event
    type) — every block emits one (group, sketch) row per group it
    contains, sketches merge per group by register max (associative /
    idempotent → layout-independent), groups fold in one tiny grouped
    pass. Driver holds O(#blocks × groups-per-block) fixed-size rows —
    the bounded-stitch class; the raw value stream never moves.
    Rows-only by design; error-gated vs exact in pytest."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        key = df[cols[0]].astype(str)
        for c in cols[1:]:
            key = key + "\x1f" + df[c].astype(str)
        hs = H.splitmix64(pd.util.hash_pandas_object(
            key, index=False).to_numpy().astype(np.uint64))
        out_g, out_s = [], []
        order = np.argsort(df[group].to_numpy(), kind="stable")
        gvals = df[group].to_numpy()[order]
        hvals = hs[order]
        bounds = np.flatnonzero(np.concatenate(
            ([True], gvals[1:] != gvals[:-1])))
        for i, start in enumerate(bounds):
            end = bounds[i + 1] if i + 1 < len(bounds) else len(gvals)
            reg = H.hll_init(p)
            H.hll_add_hashes(reg, hvals[start:end], p)
            out_g.append(gvals[start])
            out_s.append(reg.tobytes())
        return pd.DataFrame({group: out_g, "sketch": out_s})

    parts = (ds.map_batches(f, batch_format="pandas", batch_size=None)
             .to_pandas())
    rows = []
    for g, sub in parts.groupby(group, sort=True):
        reg = H.hll_init(p)
        for b in sub["sketch"]:
            reg = H.hll_merge(reg, np.frombuffer(b, dtype=np.uint8))
        rows.append((g, float(H.hll_count(reg, p))))
    return pd.DataFrame(rows, columns=[group, "approx_distinct"])
