"""Exact distributed quantiles — rank selection over one range sort.

Beyond-reference operator (the reference has no sampling/sketch/quantile
surface at all — SURVEY.md §2.7; the approximate sibling is the HLL
sketch in ``stages/sketch``). This is the EXACT tier: the returned
values match DuckDB ``quantile_disc`` bit-for-bit.

Design for the 100 TB shape — only ONE all-to-all (the value sort),
then driver work stays O(#blocks):

1. ``ds.sort(col)`` and pin the sorted blocks (``materialize``).
2. Probe pass: one tiny remote task per block returns
   ``(first, last, n)`` — three scalars; blocks never reach the driver.
   The driver orders blocks by ``(first, last)`` (ties are blocks of
   one repeated value, where any order selects the same value) and
   builds the cumulative row offsets.
3. Pick pass: a remote ``take`` on ONLY the ≤ ``len(qs)`` blocks that
   contain a target rank returns just the selected scalars.

Rank rule (calibrated against DuckDB): ``idx = max(0, ceil(q·n) − 1)``
into the ascending sort, 0-based.
"""

from __future__ import annotations

import bisect
import math

import numpy as np
import pandas as pd


def exact_quantiles(ds, col: str, qs: list[float]) -> pd.DataFrame:
    """Exact ``quantile_disc`` values of ``ds[col]`` at each q in
    ``qs`` → DataFrame ``(q, value)`` sorted by q."""
    import ray

    s = ds.sort(col).materialize()
    refs = s.to_arrow_refs()

    @ray.remote
    def probe(t):
        if t.num_rows == 0:
            return None
        c = t.column(col)
        return (c[0].as_py(), c[-1].as_py(), t.num_rows)

    @ray.remote
    def pick(t, idxs):
        c = t.column(col)
        return [c[i].as_py() for i in idxs]

    # pair refs with their probe results, dropping empty blocks
    probed = [(r, st) for r, st in zip(refs,
                                       ray.get([probe.remote(r)
                                                for r in refs]))
              if st is not None]
    qs = sorted(qs)
    if not probed:
        return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                             "value": pd.Series([None] * len(qs),
                                                dtype="float64")})
    probed.sort(key=lambda p: (p[1][0], p[1][1]))
    n = sum(st[2] for _, st in probed)

    # DuckDB quantile_disc rank rule, 0-based ascending index
    targets = [min(max(0, math.ceil(q * n) - 1), n - 1) for q in qs]
    wanted: dict[int, list[tuple[int, int]]] = {}
    start = 0
    starts = []
    for _, st in probed:
        starts.append(start)
        start += st[2]
    for qi, rank in enumerate(targets):
        bi = bisect.bisect_right(starts, rank) - 1
        wanted.setdefault(bi, []).append((rank - starts[bi], qi))

    values: list = [None] * len(qs)
    tasks = []
    for bi, pairs in wanted.items():
        tasks.append((pairs, pick.remote(probed[bi][0],
                                         [p[0] for p in pairs])))
    for pairs, fut in tasks:
        got = ray.get(fut)
        for (_, qi), v in zip(pairs, got):
            values[qi] = v
    return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                         "value": values})


def approx_quantiles(ds, col: str, qs: list[float], *,
                     per_block: int = 1024) -> pd.DataFrame:
    """Approximate quantiles with NO shuffle at all — the sketch tier
    under :func:`exact_quantiles` (which pays one full range sort).

    Every block independently sorts its own values and emits at most
    ``per_block`` ``(value, weight)`` samples — the block's ascending
    values at stride ``ceil(n/per_block)``, each carrying the size of
    the run it represents. Summaries are weight-preserving, so merging
    is just concatenation: the driver sorts the O(#blocks × per_block)
    samples, cumulates weights and selects by target rank — the same
    bounded-stitch class as the HLL/CMS sketches.

    Rank-error bound: a stride-``s`` block summary displaces any rank
    by < ``s``, so the merged estimate is within
    ``Σ_b ceil(n_b/per_block) ≈ N/per_block + #blocks`` ranks of exact
    (ε ≈ 1/per_block relative — 0.1 % at the default), enforced in
    tests/test_new_ops.py. Memory per block is O(per_block) regardless
    of block size; raise ``per_block`` for tighter ε."""
    import math

    import numpy as np

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df[col].to_numpy())
        n = len(v)
        if n == 0:
            return pd.DataFrame({"value": v, "weight": v})
        stride = max(1, math.ceil(n / per_block))
        idx = np.arange(0, n, stride)
        w = np.minimum(stride, n - idx)
        return pd.DataFrame({"value": v[idx],
                             "weight": w.astype("int64")})

    samp = (ds.map_batches(summarize, batch_format="pandas",
                           batch_size=None)
            .to_pandas().sort_values("value", kind="stable"))
    qs = sorted(qs)
    if samp.empty:
        return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                             "value": pd.Series([None] * len(qs),
                                                dtype="float64")})
    cum = samp["weight"].to_numpy().cumsum()
    n = int(cum[-1])
    vals = samp["value"].to_numpy()
    targets = np.array([min(max(0, math.ceil(q * n) - 1), n - 1)
                        for q in qs])
    picks = vals[np.searchsorted(cum, targets, side="right")]
    return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                         "value": picks})


def grouped_exact_quantiles(ds, *, key: str, col: str,
                            qs: list[float]) -> pd.DataFrame:
    """Exact per-group ``quantile_disc``: one range sort by
    ``(key, col)``, a per-block (group → count) probe, then remote
    rank picks — the grouped sibling of :func:`exact_quantiles` (per-
    domain length percentiles are the canonical corpus use). Driver
    work is O(#blocks + #groups) count pairs — groups-sized, never
    rows-sized; selected scalars are fetched from only the blocks that
    hold a target rank."""
    import bisect

    import numpy as np
    import ray

    s = ds.sort([key, col]).materialize()
    refs = s.to_arrow_refs()

    @ray.remote
    def probe(t):
        if t.num_rows == 0:
            return None
        df = t.select([key]).to_pandas()
        # block comes from the global (key, col) sort → groups are
        # contiguous and in order within the block
        g = df.groupby(key, sort=False).size()
        first = (t.column(key)[0].as_py(), t.column(col)[0].as_py())
        return first, list(zip(g.index.tolist(),
                               [int(x) for x in g.tolist()]))

    @ray.remote
    def pick(t, idxs):
        c = t.column(col)
        return [c[i].as_py() for i in idxs]

    probed = [(r, p) for r, p in zip(refs, ray.get(
        [probe.remote(r) for r in refs])) if p is not None]
    qs = sorted(qs)
    if not probed:
        return pd.DataFrame({key: pd.Series(dtype="object"),
                             "q": pd.Series(dtype="float64"),
                             "value": pd.Series(dtype="float64")})
    probed.sort(key=lambda p: p[1][0])

    # per-group totals and per-(block, group) local offsets
    totals: dict = {}
    seen_before: list[dict] = []   # group → rows of group in earlier blocks
    for _, (_, pairs) in probed:
        seen_before.append(dict(totals))
        for k, n in pairs:
            totals[k] = totals.get(k, 0) + n

    # targets: group → [(rank_within_group, q_idx)]
    out_rows: list[tuple] = []
    wanted: dict[int, list[tuple[int, int]]] = {}
    order_keys = sorted(totals)
    for k in order_keys:
        n = totals[k]
        for qi, q in enumerate(qs):
            rank = min(max(0, math.ceil(q * n) - 1), n - 1)
            # locate block: last block whose seen_before[b].get(k) ≤ rank
            for b, (_, (_, pairs)) in enumerate(probed):
                before = seen_before[b].get(k, 0)
                here = dict(pairs).get(k, 0)
                if here and before <= rank < before + here:
                    # local row index = offset of k's segment + delta
                    seg_off = 0
                    for kk, nn in pairs:
                        if kk == k:
                            break
                        seg_off += nn
                    wanted.setdefault(b, []).append(
                        (seg_off + rank - before, (k, q)))
                    break

    results: dict = {}
    tasks = [(pairs, pick.remote(probed[b][0], [p[0] for p in pairs]))
             for b, pairs in wanted.items()]
    for pairs, fut in tasks:
        for (_, kq), v in zip(pairs, ray.get(fut)):
            results[kq] = v
    for k in order_keys:
        for q in qs:
            out_rows.append((k, q, results[(k, q)]))
    return pd.DataFrame(out_rows, columns=[key, "q", "value"])


def percent_rank_transform(ds, *, value_col: str, keep_cols: list[str]):
    """Exact global percentile-rank feature transform — SQL
    ``percent_rank() OVER (ORDER BY value)`` = (#strictly smaller) /
    (N-1) — the rank-normalization step feature pipelines apply before
    training, inverse of :func:`exact_quantiles`.

    Two passes, no per-row shuffle of the data itself: (1) per-batch
    value-count partials + one grouped sum on the sorted stitch give
    the DISTINCT-value count table; the driver turns it into a
    (sorted values, #smaller) pair of arrays via one cumsum and
    broadcasts it; (2) every batch probes by ``searchsorted`` —
    embarrassingly parallel, original row identity preserved.

    Bound (documented): the distinct-VALUE table must fit the object
    store — true for bounded-precision features (scores, prices,
    counts; ~16 bytes a distinct value). For continuous near-unique
    values use :func:`approx_quantiles` grids instead — an exact rank
    there requires a full range sort of the rows.
    """
    import ray

    from sigraph_ray.stages.collect import sorted_groupby_agg

    def vc_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[value_col].value_counts()
        return pd.DataFrame({"v": vc.index.to_numpy(),
                             "c": vc.to_numpy().astype("int64")})

    counts = sorted_groupby_agg(
        ds.map_batches(vc_partial, batch_format="pandas"),
        key="v", aggs={"c": ("c", "sum")}).to_pandas()
    if not len(counts):
        return ds.map_batches(
            lambda df: df.assign(pct_rank=pd.Series(dtype="float64")),
            batch_format="pandas")
    counts = counts.sort_values("v", kind="stable").reset_index(drop=True)
    vals = counts["v"].to_numpy()
    cnts = counts["c"].to_numpy(dtype="int64")
    smaller = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    n_total = int(cnts.sum())
    table_ref = ray.put((vals, smaller))
    denom = max(n_total - 1, 1)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        vs, sm = ray.get(table_ref)
        pos = np.searchsorted(vs, df[value_col].to_numpy())
        out = df[keep_cols].copy()
        out["pct_rank"] = sm[pos] / denom
        return out

    return ds.map_batches(probe, batch_format="pandas")


def ntile_transform(ds, *, value_col: str, id_col: str, k: int):
    """Equal-frequency (equal-depth) binning: SQL ``ntile(k) OVER
    (ORDER BY value, id)``, 1-based — the quantile-bucket feature
    transform (balanced histogram bins, per-bucket model routing)
    whose bucket boundaries adapt to the distribution, unlike the
    fixed-width histogram.

    Reuses the ordering stitch (stages/ordering._global_positions):
    one narrow range sort of (value, id) + O(#blocks) scalar probes,
    then each block maps its global row positions to buckets with the
    exact SQL ntile split (first n % k buckets get one extra row).
    Needs the total row count first — one metadata-cheap count pass.
    ``(value, id)`` must be row-unique (id unique suffices)."""
    import pyarrow as pa

    from sigraph_ray.stages.ordering import _global_positions

    n = ds.count()
    size, rem = divmod(int(n), k)

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({value_col: t.column(value_col),
                         id_col: t.column(id_col)})

    sorted_ds = (ds.map_batches(narrow, batch_format="pyarrow")
                 .sort([value_col, id_col]))

    cut = rem * (size + 1)

    def emit(t: pa.Table, offset: int) -> pa.Table:
        pos = np.arange(offset, offset + t.num_rows, dtype=np.int64)
        if size:
            bucket = np.where(pos < cut, pos // (size + 1),
                              rem + (pos - cut) // size)
        else:  # n < k: each row its own bucket
            bucket = pos
        return pa.table({id_col: t.column(id_col),
                         value_col: t.column(value_col),
                         "bucket": pa.array(bucket + 1, pa.int64())})

    out = _global_positions(sorted_ds, emit)
    if out is None:
        import ray.data as rd
        return rd.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             value_col: pa.array([], pa.float64()),
             "bucket": pa.array([], pa.int64())}))
    return out


def weighted_quantiles(ds, *, value: str, weight: str,
                       qs: list[float]) -> pd.DataFrame:
    """Exact WEIGHTED quantiles: ``q-th = min v with F(v) ≥ q·W`` where
    ``F(v) = Σ weight over rows with value ≤ v`` — the
    mass-weighted generalization of quantile_disc (e.g. "the quantity
    below which half the REVENUE sits").

    Dataflow: per-VALUE grouped weight sums (distinct-value-bounded —
    one grouped-sum stitch), cumulative sum + selection in one bounded
    final step. Best when the value column is low-cardinality (enums,
    sizes, bucketed measures) so the grouped table is small; for
    continuous values use :func:`weighted_quantiles_ranked`, which
    never builds a per-value table (identical selection rule — the two
    tiers are cross-checked in tests)."""
    import numpy as np

    from sigraph_ray.stages.collect import sorted_groupby_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(value, sort=False)[weight].sum()
             .rename("w").reset_index())
        return g

    counts = sorted_groupby_sum(
        ds.map_batches(partial, batch_format="pandas"),
        key=value, sum_cols={"w": "w"}).to_pandas()
    if counts.empty:
        return pd.DataFrame({"q": pd.Series(sorted(qs), dtype="float64"),
                             "value": pd.Series([np.nan] * len(qs))})
    d = counts.sort_values(value).reset_index(drop=True)
    cumw = d["w"].to_numpy(np.float64).cumsum()
    total = cumw[-1]
    rows = []
    for q in qs:
        idx = int(np.searchsorted(cumw, q * total, side="left"))
        rows.append({"q": q, "value": d[value].iloc[min(idx, len(d) - 1)]})
    return pd.DataFrame(rows)


def weighted_quantiles_ranked(ds, *, value: str, weight: str,
                              qs: list[float]) -> pd.DataFrame:
    """Exact weighted quantiles for CONTINUOUS value columns — the
    rank-selection tier :func:`weighted_quantiles` defers to when the
    value column's cardinality is unbounded (same selection rule:
    ``q-th = min v with F(v) ≥ q·W``, ``F(v) = Σ weight over rows with
    value ≤ v``; the two tiers are cross-checked in tests).

    Same 100 TB shape as :func:`exact_quantiles` — ONE all-to-all (the
    value sort), then O(#blocks) driver work:

    1. ``ds.sort(value)`` and pin the sorted blocks.
    2. Probe pass: one remote task per block returns
       ``(first, last, Σweight, rows)`` — four scalars per block.
    3. The driver orders blocks by ``(first, last)``, prefix-sums the
       block weights, and locates the ≤ ``len(qs)`` blocks whose
       weight span crosses a target mass ``q·W``.
    4. Pick pass: a remote task on ONLY those blocks cumsums the block
       weights and returns the first row whose running mass reaches
       the residual target.

    In row-sorted order equal values are contiguous, so the first row
    whose running mass reaches ``q·W`` carries exactly the ``min v
    with F(v) ≥ q·W``. Weights must be non-negative."""
    import ray

    s = ds.sort(value).materialize()
    refs = s.to_arrow_refs()

    @ray.remote
    def probe(t):
        if t.num_rows == 0:
            return None
        c = t.column(value)
        w = np.asarray(t.column(weight).to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        return (c[0].as_py(), c[-1].as_py(), float(w.sum()), t.num_rows)

    @ray.remote
    def pick(t, residuals):
        w = np.asarray(t.column(weight).to_numpy(zero_copy_only=False),
                       dtype=np.float64).cumsum()
        c = t.column(value)
        return [c[min(int(np.searchsorted(w, r, side="left")),
                      len(w) - 1)].as_py() for r in residuals]

    probed = [(r, st) for r, st in zip(refs, ray.get(
        [probe.remote(r) for r in refs])) if st is not None]
    qs = sorted(qs)
    if not probed:
        return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                             "value": pd.Series([np.nan] * len(qs))})
    probed.sort(key=lambda p: (p[1][0], p[1][1]))
    block_w = np.array([p[1][2] for p in probed], dtype=np.float64)
    cum_w = block_w.cumsum()
    total = cum_w[-1]
    offsets = cum_w - block_w  # mass before each block
    # assign each q to the first block whose cumulative mass reaches it
    per_block: dict[int, list[tuple[int, float]]] = {}
    for qi, q in enumerate(qs):
        t = q * total
        bi = min(int(np.searchsorted(cum_w, t, side="left")),
                 len(probed) - 1)
        per_block.setdefault(bi, []).append((qi, t - offsets[bi]))
    out: list = [None] * len(qs)
    picked = {bi: pick.remote(probed[bi][0], [r for _, r in targets])
              for bi, targets in per_block.items()}
    for bi, targets in per_block.items():
        for (qi, _), v in zip(targets, ray.get(picked[bi])):
            out[qi] = v
    return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                         "value": out})
