"""Temporal custom operators Ray Data lacks: as-of join and
session-window aggregation (the build brief's named examples of
operators to express as sort + blockwise pass when semantics allow).

Both follow the ``sorted_collect`` architecture (stages/collect): one
range sort by ``(key, ts)``, a fully VECTORIZED per-block resolution for
every key interior to a block, and a driver-side re-resolution of the
O(#blocks) boundary keys (only a block's FIRST and LAST key can
continue into a neighboring block after the sort). Partitioning
assumption, documented per the brief: one key's rows fit a worker
block plus boundary fragments — true for per-user event streams at any
realistic user cardinality; a pathologically hot key needs a
prefix-broadcast second pass instead.

Determinism: ties on ``ts`` are broken by an explicit tiebreak column
(caller-supplied, e.g. event id), so outputs are identical across block
counts and match a SQL oracle's ``ORDER BY ts, id`` window frame.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _boundary_split(df: pd.DataFrame, key: str):
    """(interior rows, boundary rows) of one sorted block: boundary =
    rows whose key equals the block's first or last key."""
    if len(df) == 0:
        return df, df
    first, last = df[key].iloc[0], df[key].iloc[-1]
    b = (df[key] == first) | (df[key] == last)
    return df[~b], df[b]


def _run(ds, sort_cols: list, key: str, resolve):
    """Shared skeleton: sort → per-block resolve interior keys +
    forward boundary rows → driver resolves boundary keys with the SAME
    function → union."""
    import ray.data as rd

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        interior, boundary = _boundary_split(df, key)
        out = resolve(interior) if len(interior) else None
        bnd = boundary.copy()
        bnd["_boundary"] = True
        if out is None or len(out) == 0:
            return bnd.reindex(columns=list(bnd.columns))
        out = out.copy()
        out["_boundary"] = False
        # boundary rows keep INPUT schema; resolved rows have OUTPUT
        # schema — carry both column sets, NaN-filled crosswise
        cols = list(dict.fromkeys([*out.columns, *bnd.columns]))
        return pd.concat([out.reindex(columns=cols),
                          bnd.reindex(columns=cols)], ignore_index=True)

    parts = ds.sort(sort_cols).map_batches(
        per_block, batch_format="pandas", batch_size=None)
    parts = parts.materialize()  # pin the interior/boundary split
    resolved = parts.filter(expr="_boundary == False").map_batches(
        lambda df: df.drop(columns=["_boundary"]).dropna(axis=1, how="all"),
        batch_format="pandas")
    bdf = parts.filter(expr="_boundary == True").to_pandas()
    if len(bdf):
        bdf = (bdf.drop(columns=["_boundary"]).dropna(axis=1, how="all")
               .sort_values(sort_cols, kind="stable"))
        merged = resolve(bdf)
    else:
        merged = None
    out = resolved
    if merged is not None and len(merged):
        out = out.union(rd.from_pandas(merged).map_batches(
            lambda df: df, batch_format="pandas"))
    return out


def sorted_asof_join(left, right, *, key: str, ts: str,
                     tiebreak: str, left_cols: list,
                     right_cols: dict):
    """AS-OF JOIN: for every left row, the right row of the same
    ``key`` with the greatest ``ts`` ≤ the left row's ``ts``
    (inclusive — SQL ``ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts``
    semantics); left rows with no such right row are DROPPED (inner).

    ``right_cols`` maps output alias → right column. Implementation:
    union the two sides with a side marker (right sorts BEFORE left on
    ts ties so an equal-ts right row is visible to the left row), one
    range sort, grouped forward-fill per block, boundary keys re-filled
    on the driver."""
    lcols = list(left_cols)
    rcols = dict(right_cols)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key, ts, tiebreak, *[c for c in lcols
                                       if c not in (key, ts, tiebreak)]]]
        out = out.copy()
        out["_side"] = np.int8(1)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key: df[key], ts: df[ts],
                            tiebreak: df[tiebreak], "_side": np.int8(0)})
        for alias, c in rcols.items():
            out["_r_" + alias] = df[c]
        return out

    both = (left.map_batches(tag_left, batch_format="pandas")
            .union(right.map_batches(tag_right, batch_format="pandas")))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)
        filled = {}
        for alias in rcols:
            filled[alias] = g["_r_" + alias].ffill()
        is_left = df["_side"] == 1
        out = df.loc[is_left, lcols].copy()
        ok = pd.Series(True, index=out.index)
        for alias in rcols:
            vals = filled[alias][is_left]
            out[alias] = vals
            ok &= vals.notna()
        return out[ok]

    return _run(both, [key, ts, "_side", tiebreak], key, resolve)


def sessionize(ds, *, key: str, ts: str, tiebreak: str, gap,
               value: str | None = None):
    """Session-window aggregate: rows of one ``key`` ordered by
    ``(ts, tiebreak)`` split into sessions wherever the gap to the
    previous row exceeds ``gap`` (a pandas Timedelta / np.timedelta64);
    emits one row per session: (key, session  — 1-based per key in
    start order, n_events, session_start, session_end[, sum_value])."""
    gap = pd.Timedelta(gap)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)
        prev = g[ts].shift()
        brk = (prev.isna() | ((df[ts] - prev) > gap)).astype("int64")
        sess = brk.groupby(df[key], sort=False).cumsum()
        keys = {key: df[key], "session": sess}
        gb = df.assign(**keys).groupby([key, "session"], sort=False)
        out = gb.agg(n_events=(ts, "size"),
                     session_start=(ts, "min"),
                     session_end=(ts, "max"),
                     **({"sum_value": (value, "sum")} if value else {}))
        return out.reset_index()

    cols = [key, ts, tiebreak] + ([value] if value else [])
    proj = ds.map_batches(lambda df: df[cols], batch_format="pandas")
    out = _run(proj, [key, ts, tiebreak], key, resolve)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        # the boundary-carry concat upcasts int columns to float in
        # blocks that mix resolved and forwarded rows — restore the
        # declared output dtypes (values are exact ints)
        return df.assign(session=df["session"].astype("int64"),
                         n_events=df["n_events"].astype("int64"))

    return out.map_batches(finalize, batch_format="pandas")


# int64 headroom guard for the composite key (patched down in tests to
# exercise the per-key fallback)
_COMPOSITE_GUARD = 2**62


def sorted_range_join(left, right, *, key: str, ts: str, tiebreak: str,
                      window, left_cols: list, right_cols: dict):
    """RANGE (band) JOIN: every (left, right) pair of the same ``key``
    with ``right.ts`` in ``[left.ts - window, left.ts]`` (both ends
    inclusive — SQL ``r.ts BETWEEN l.ts - window AND l.ts``). Same
    sorted-stitch skeleton as the as-of join; the per-block expansion is
    fully vectorized: rights arrive (key, ts)-sorted, so each left row's
    match range is two ``searchsorted`` probes on an injective composite
    ``key_code · scale + relative_ts`` (scale = block ts span + window;
    falls back to per-key segment probes if the composite would overflow
    int64 — only possible for >~10^5 keys × multi-decade spans in ONE
    block), and the pairs expand with one repeat/arange pass.

    Output volume is data-dependent (every in-window pair) — callers
    bound it by the window size, as any band join must."""
    window = pd.Timedelta(window)
    lcols = list(left_cols)
    rcols = dict(right_cols)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key, ts, tiebreak,
                  *[c for c in lcols if c not in (key, ts, tiebreak)]]]
        out = out.copy()
        out["_side"] = np.int8(1)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key: df[key], ts: df[ts],
                            tiebreak: df[tiebreak], "_side": np.int8(0)})
        for alias, c in rcols.items():
            out["_r_" + alias] = df[c]
        return out

    both = (left.map_batches(tag_left, batch_format="pandas")
            .union(right.map_batches(tag_right, batch_format="pandas")))
    win_us = np.int64(window // pd.Timedelta("1ns"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        codes = pd.factorize(df[key], sort=True)[0].astype(np.int64)
        # epoch NANOSECONDS regardless of the column's stored resolution
        ts_us = (df[ts].astype("datetime64[ns]").astype("int64")
                 .to_numpy())
        is_left = (df["_side"] == 1).to_numpy()
        rmask = ~is_left
        rel = ts_us - ts_us.min()
        scale = np.int64(rel.max() - rel.min()) + win_us + 2
        n_codes = codes.max() + 1 if len(codes) else 0
        if n_codes and n_codes < _COMPOSITE_GUARD // max(scale, 1):
            comp = codes * scale + (rel - rel.min())
            rcomp = comp[rmask]
            lo = np.searchsorted(rcomp, comp[is_left] - win_us, "left")
            hi = np.searchsorted(rcomp, comp[is_left], "right")
        else:  # overflow fallback: per-key segment probes
            rcodes, rts = codes[rmask], ts_us[rmask]
            lo = np.empty(int(is_left.sum()), np.int64)
            hi = np.empty_like(lo)
            lcode, lts = codes[is_left], ts_us[is_left]
            for i in range(len(lo)):
                s = np.searchsorted(rcodes, lcode[i], "left")
                e = np.searchsorted(rcodes, lcode[i], "right")
                lo[i] = s + np.searchsorted(rts[s:e], lts[i] - win_us,
                                            "left")
                hi[i] = s + np.searchsorted(rts[s:e], lts[i], "right")
        counts = hi - lo
        rep = np.repeat(np.arange(len(lo)), counts)
        if len(rep):
            inner = (np.arange(len(rep))
                     - np.repeat(np.concatenate(
                         ([0], np.cumsum(counts)[:-1])), counts)
                     + np.repeat(lo, counts))
        else:
            inner = np.empty(0, np.int64)
        ldf = df[is_left].reset_index(drop=True)
        rdf = df[rmask].reset_index(drop=True)
        out = ldf.loc[rep, lcols].reset_index(drop=True)
        for alias in rcols:
            out[alias] = rdf["_r_" + alias].to_numpy()[inner]
        return out

    return _run(both, [key, ts, "_side", tiebreak], key, resolve)


def sliding_window_agg(ds, *, key: str, ts: str, tiebreak: str,
                       window, value: str, keep_value: bool = False):
    """Sliding (RANGE-preceding) window aggregate: for every row,
    count and sum over the SAME key's rows with ``ts`` in
    ``[row.ts - window, row.ts]`` — SQL
    ``count(*)/sum(value) OVER (PARTITION BY key ORDER BY ts RANGE
    BETWEEN window PRECEDING AND CURRENT ROW)`` (RANGE frames include
    all equal-ts peers, matched here by probing ``ts`` bounds, not row
    position). Same sorted-stitch skeleton and injective composite
    searchsorted as :func:`sorted_range_join`; per-row work is two
    binary-search probes + a prefix-sum difference — no pair expansion,
    so output is exactly one row per input row."""
    window = pd.Timedelta(window)
    win_ns = np.int64(window // pd.Timedelta("1ns"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        codes = pd.factorize(df[key], sort=True)[0].astype(np.int64)
        ts_ns = (df[ts].astype("datetime64[ns]").astype("int64")
                 .to_numpy())
        rel = ts_ns - ts_ns.min()
        scale = np.int64(rel.max()) + win_ns + 2
        n_codes = codes.max() + 1 if len(codes) else 0
        if n_codes and n_codes < _COMPOSITE_GUARD // max(scale, 1):
            comp = codes * scale + rel
            lo = np.searchsorted(comp, comp - win_ns, "left")
            hi = np.searchsorted(comp, comp, "right")
        else:  # overflow fallback: per-row segment probes
            lo = np.empty(len(df), np.int64)
            hi = np.empty_like(lo)
            for i in range(len(df)):
                s = np.searchsorted(codes, codes[i], "left")
                e = np.searchsorted(codes, codes[i], "right")
                lo[i] = s + np.searchsorted(ts_ns[s:e],
                                            ts_ns[i] - win_ns, "left")
                hi[i] = s + np.searchsorted(ts_ns[s:e], ts_ns[i],
                                            "right")
        vals = df[value].to_numpy(dtype="float64")
        csum = np.concatenate(([0.0], np.cumsum(vals)))
        out = df[[tiebreak, key, ts]].copy()
        if keep_value:
            out[value] = vals
        out["n_window"] = (hi - lo).astype("int64")
        out["sum_value_window"] = csum[hi] - csum[lo]
        return out

    proj = ds.map_batches(lambda df: df[[key, ts, tiebreak, value]],
                          batch_format="pandas")
    out = _run(proj, [key, ts, tiebreak], key, resolve)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        # mixed resolved/boundary blocks upcast the count to float
        return df.assign(n_window=df["n_window"].astype("int64"))

    return out.map_batches(finalize, batch_format="pandas")


def event_transitions(ds, *, key: str, ts: str, tiebreak: str,
                      value: str):
    """Per-key consecutive-event transition counts — the Markov /
    sequential-pattern table ``(prev_value, next_value, n)`` over each
    key's ``(ts, tiebreak)``-ordered event stream (SQL ``lag() OVER
    (PARTITION BY key ORDER BY ts, tiebreak)`` + GROUP BY). What a
    behavioral model or next-event predictor trains on.

    Scale shape: ONE range sort by (key, ts, tiebreak); each sorted
    block counts its within-block adjacent pairs vectorized and ships
    only a tiny partial-count dict + its four boundary scalars (first/
    last key and value) to the driver; the driver chains the O(#blocks)
    block seams (a pair spans a seam only when the same key continues)
    and folds the partial dicts — O(#blocks × |alphabet|²) driver
    state, never row-scale."""
    import ray

    sorted_ds = ds.sort([key, ts, tiebreak]).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_stats(t):
        if not t.num_rows:
            return None
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(value).to_numpy(zero_copy_only=False)
        same = k[1:] == k[:-1]
        prev, nxt = v[:-1][same], v[1:][same]
        counts: dict = {}
        for p, x in zip(prev.tolist(), nxt.tolist()):
            pair = (p, x)
            counts[pair] = counts.get(pair, 0) + 1
        first_sort = (t.column(key)[0].as_py(), t.column(ts)[0].as_py(),
                      t.column(tiebreak)[0].as_py())
        return (first_sort, k[0], v[0], k[-1], v[-1], counts)

    stats = [s for s in ray.get([block_stats.remote(r) for r in refs])
             if s is not None]
    stats.sort(key=lambda s: s[0])
    total: dict = {}
    for i, (_, _fk, _fv, lk, lv, counts) in enumerate(stats):
        for pair, n in counts.items():
            total[pair] = total.get(pair, 0) + n
        if i + 1 < len(stats):
            nfk, nfv = stats[i + 1][1], stats[i + 1][2]
            if lk == nfk:  # same key continues across the seam
                pair = (lv, nfv)
                total[pair] = total.get(pair, 0) + 1
    if not total:
        return pd.DataFrame({"prev_value": pd.Series(dtype="object"),
                             "next_value": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    items = sorted(total.items())
    return pd.DataFrame({
        "prev_value": [p for (p, _), _n in items],
        "next_value": [x for (_, x), _n in items],
        "n": pd.Series([n for _, n in items], dtype="int64")})


def interval_overlap_join(left, right, *, key: str, id_l: str,
                          start_l: str, end_l: str, id_r: str,
                          start_r: str, end_r: str, grid_us: int):
    """Per-key INTERVAL OVERLAP join — all (left, right) interval
    pairs of the same ``key`` with ``start_l ≤ end_r AND start_r ≤
    end_l`` (inclusive). The join type behind session×incident
    correlation, ad-impression attribution windows, shift overlap.

    Grid partitioning: each interval is replicated to every
    ``grid_us``-wide time cell it touches; two overlapping intervals
    share the cell containing any common instant, so ONE merge join on
    the composite (key, cell) finds every qualifying pair (no misses),
    the exact predicate prunes cell-mates that don't overlap, and a
    distinct pass drops pairs found in several shared cells. Cost
    contract (documented): replication factor = interval_len/grid_us
    + 1 and per-(key, cell) fan-out = concurrent intervals per key per
    cell — pick ``grid_us`` ≈ the max interval length.

    Returns ``(key, id_l, id_r)`` distinct rows."""
    from sigraph_ray.stages.collect import sorted_distinct
    from sigraph_ray.stages.joins import sorted_merge_join

    def cells(idc, start, end, sfx):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({
                key: pd.Series(dtype="object"),
                "cell": pd.Series(dtype="int64"),
                f"id{sfx}": pd.Series(dtype="int64"),
                f"s{sfx}": pd.Series(dtype="int64"),
                f"e{sfx}": pd.Series(dtype="int64")})
            if len(df) == 0:
                return empty
            s = df[start].astype("datetime64[us]").astype("int64")
            e = df[end].astype("datetime64[us]").astype("int64")
            c0, c1 = s.to_numpy() // grid_us, e.to_numpy() // grid_us
            reps = (c1 - c0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(df)), reps)
            offs = (np.arange(int(reps.sum()), dtype=np.int64)
                    - np.repeat(np.cumsum(reps) - reps, reps))
            return pd.DataFrame({
                key: df[key].to_numpy()[idx],
                "cell": c0[idx] + offs,
                f"id{sfx}": df[idc].to_numpy()[idx],
                f"s{sfx}": s.to_numpy()[idx],
                f"e{sfx}": e.to_numpy()[idx]})
        return f

    lc = left.map_batches(cells(id_l, start_l, end_l, "_l"),
                          batch_format="pandas")
    rc = right.map_batches(cells(id_r, start_r, end_r, "_r"),
                           batch_format="pandas")
    j = sorted_merge_join(lc, rc, on=[key, "cell"],
                          left_cols=["id_l", "s_l", "e_l"],
                          right_cols=["id_r", "s_r", "e_r"])

    def overlap(df: pd.DataFrame) -> pd.DataFrame:
        keep = ((df["s_l"].to_numpy() <= df["e_r"].to_numpy())
                & (df["s_r"].to_numpy() <= df["e_l"].to_numpy()))
        out = df.loc[keep, [key, "id_l", "id_r"]].copy()
        out = out.rename(columns={"id_l": id_l, "id_r": id_r})
        return out

    return sorted_distinct(
        j.map_batches(overlap, batch_format="pandas"),
        [key, id_l, id_r])


def grouped_gap_stats(ds, *, key: str, ts: str, tiebreak: str):
    """Per-key inter-arrival statistics — (mean_gap_s, max_gap_s,
    n_gaps) over each key's (ts, tiebreak)-ordered stream; SQL
    ``lag(ts) OVER (PARTITION BY key ORDER BY ts, tiebreak)``. The
    arrival-cadence profile burst detection and SLA monitors read.

    Same seam shape as :func:`event_transitions`: ONE range sort, each
    block folds its within-block gaps to |keys-in-block| partial rows
    plus four boundary scalars, the driver chains O(#blocks) seams —
    driver state is key-alphabet-sized, never row-scale."""
    import ray

    sorted_ds = ds.sort([key, ts, tiebreak]).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_stats(t):
        if not t.num_rows:
            return None
        k = t.column(key).to_numpy(zero_copy_only=False)
        tv = (t.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False)).astype("int64")  # µs
        same = k[1:] == k[:-1]
        gaps = (tv[1:] - tv[:-1])[same]
        gk = k[1:][same]
        partial: dict = {}
        for kk, g in zip(gk.tolist(), gaps.tolist()):
            s, m, n = partial.get(kk, (0, 0, 0))
            partial[kk] = (s + g, max(m, g), n + 1)
        first_sort = (t.column(key)[0].as_py(), int(tv[0]),
                      t.column(tiebreak)[0].as_py())
        return (first_sort, k[0], int(tv[0]), k[-1], int(tv[-1]),
                partial)

    stats = [s for s in ray.get([block_stats.remote(r) for r in refs])
             if s is not None]
    stats.sort(key=lambda s: s[0])
    total: dict = {}

    def fold(kk, s, m, n):
        s0, m0, n0 = total.get(kk, (0, 0, 0))
        total[kk] = (s0 + s, max(m0, m), n0 + n)

    for i, (_, _fk, _ft, lk, lt, partial) in enumerate(stats):
        for kk, (s, m, n) in partial.items():
            fold(kk, s, m, n)
        if i + 1 < len(stats):
            nfk, nft = stats[i + 1][1], stats[i + 1][2]
            if lk == nfk:               # same key continues: seam gap
                g = nft - lt
                fold(lk, g, g, 1)
    if not total:
        return pd.DataFrame({key: pd.Series(dtype="object"),
                             "mean_gap_s": pd.Series(dtype="float64"),
                             "max_gap_s": pd.Series(dtype="float64"),
                             "n_gaps": pd.Series(dtype="int64")})
    items = sorted(total.items())
    return pd.DataFrame({
        key: [kk for kk, _ in items],
        "mean_gap_s": [(s / n) / 1e6 for _, (s, _m, n) in items],
        "max_gap_s": [m / 1e6 for _, (_s, m, _n) in items],
        "n_gaps": pd.Series([n for _, (_s, _m, n) in items],
                            dtype="int64")})


def running_extremes(ds, *, key: str, ts: str, tiebreak: str,
                     value: str):
    """Per-row running MAX/MIN within each ``key``'s (ts, tiebreak)
    order — SQL ``max(value) OVER (PARTITION BY key ORDER BY ts, tb
    ROWS UNBOUNDED PRECEDING)`` — on the shared sorted-stitch skeleton:
    ONE range sort, vectorized ``cummax``/``cummin`` per block for
    interior keys, and the keys that straddle block boundaries re-run
    through the SAME resolve on the driver (O(#blocks) boundary rows).
    Pure comparisons, no arithmetic — exact for any float input."""

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)[value]
        out = df.copy()
        out["run_max"] = g.cummax()
        out["run_min"] = g.cummin()
        return out

    return _run(ds, [key, ts, tiebreak], key, resolve)
