"""``sorted_collect`` — a custom wide operator Ray Data lacks: grouped,
ORDER-PRESERVING list collection (``collect_list(... ORDER BY ...)``)
without per-group Python.

Why: ``groupby(key).map_groups(fn)`` invokes Python once per group
(~0.5-1 ms each — measured; see BASELINE.md notes), which dominates when
groups are numerous. This operator instead:

1. globally sorts by ``(key, order_col)`` (one range shuffle — after the
   sort, a key's rows are contiguous; only a block's FIRST and LAST key
   can continue into a neighboring block);
2. collects lists per key inside each block with one vectorized pandas
   pass per block;
3. fixes up the O(#blocks) boundary keys on the driver (collected rows
   for interior keys never leave the workers). Fragments carry their
   first ``order_col`` value so the stitch is order-correct even when
   the streaming executor delivers blocks out of order
   (``preserve_order`` stays False).

Partitioning assumption (documented per the build brief): the rows of
one key fit in one worker's block plus boundary fragments — true
whenever per-key list sizes are bounded (related-span lists, per-doc
sequences). For unbounded keys use the two-phase groupby combiners in
provenance_graph.py instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


# An already-materialized stitch input at/below this finishes in ONE
# driver pandas pass instead of the range sort: the sort's
# sample/partition/reduce machinery costs ~2 s at 32 cpus regardless of
# bytes (measured on the prov builders), pure fixed cost at this size.
# The gate engages ONLY for MaterializedDataset inputs — callers opt in
# by materializing their per-batch-combined (bounded) partial streams,
# the same staged-boundary pattern as kg.build_kg_edges_staged; lazy
# corpus-scale streams always take the sort.
_DRIVER_STITCH_BYTES = 64 * 2 ** 20


def _driver_small(ds):
    """The input as one driver pandas frame iff it is materialized,
    non-empty and at/below ``_DRIVER_STITCH_BYTES``; else None (the
    caller runs the distributed path — which also owns the typed-empty
    handling)."""
    from ray.data.dataset import MaterializedDataset

    if isinstance(ds, MaterializedDataset):
        sb = ds.size_bytes()
        # unknown size (None) must NOT take the driver tier: treat it
        # as large, never as 0 (ADVICE r4)
        if sb is not None and sb <= _DRIVER_STITCH_BYTES:
            pdf = ds.to_pandas()
            if len(pdf):
                return pdf
    return None


def _collect_block_factory(key: str, order_col: str, value: str,
                           dedup: bool, max_members: int | None):
    def f(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: pd.Series(dtype="object"),
                                 "values": pd.Series(dtype="object"),
                                 "head_ord": pd.Series(dtype="object"),
                                 "boundary": pd.Series(dtype="bool")})
        if dedup:
            # post-sort keep-first = min-order occurrence per member;
            # cross-block duplicates are boundary keys, deduped in the
            # stitch below
            df = df.drop_duplicates([key, value])
        if max_members is not None:
            # keep the first max_members rows per key (sorted order):
            # a key exceeding the cap still emits EXACTLY max_members
            # values, which downstream consumers use as the overflow
            # sentinel — so one degenerate key can never produce an
            # unbounded list row in a block or in the boundary stitch
            df = df[df.groupby(key, sort=False).cumcount() < max_members]
        g = df.groupby(key, sort=False)
        lists = g[value].agg(list)
        heads = g[order_col].first()
        out = pd.DataFrame({key: lists.index.to_numpy(),
                            "values": lists.to_numpy(),
                            "head_ord": heads.to_numpy()})
        boundary = np.zeros(len(out), dtype=bool)
        boundary[0] = True
        boundary[-1] = True
        out["boundary"] = boundary
        return out
    return f


def _dedup_keep_first(values: list) -> list:
    seen: dict = {}
    for v in values:
        seen.setdefault(v, None)
    return list(seen)


def sorted_collect(ds, *, key: str, order_col: str, value: str,
                   dedup: bool = False, max_members: int | None = None):
    """Dataset → Dataset of ``(key, values: list)`` with ``values``
    ordered by ``order_col`` (make ``order_col`` unique per key for full
    determinism). ``dedup=True`` keeps each value's FIRST (min-order)
    occurrence only — collapsing a distinct-groupby that would
    otherwise have to run before the sort into the collect pass.

    ``max_members`` bounds every per-block collected list at that many
    elements (first-in-sort-order kept). This is the degenerate-key
    guard: callers that SKIP oversized keys (e.g. the LSH bucket-width
    cap) pass ``cap + 1`` and treat a returned list longer than ``cap``
    as the overflow sentinel — boundary-key stitches then carry at most
    ``#fragments × (cap+1)`` elements instead of the key's full
    population. Lists at or under the cap are exact."""
    import ray.data as rd

    pdf = _driver_small(ds)
    if pdf is not None:
        d = pdf.sort_values([key, order_col], kind="stable")
        if dedup:
            d = d.drop_duplicates([key, value])
        if max_members is not None:
            # global cap (vs the distributed tier's per-fragment cap):
            # lists at/under the cap are identical; overflow keys still
            # return > cap values, so the sentinel contract holds
            d = d[d.groupby(key, sort=False).cumcount() < max_members]
        merged = (d.groupby(key, sort=False)[value].agg(list)
                  .rename("values").reset_index())
        return rd.from_pandas(merged)

    hydrated = ds.sort([key, order_col])
    collected = hydrated.map_batches(
        _collect_block_factory(key, order_col, value, dedup, max_members),
        batch_format="pandas",
        batch_size=None)  # one batch per block — blockwise contiguity
    # pin: both branches below consume `collected`, and re-executing the
    # sort can pick different range boundaries, which would let one key
    # be "interior" in one execution and "boundary" in the other
    collected = collected.materialize()
    interior = collected.filter(expr="boundary == False").map_batches(
        lambda df: df[[key, "values"]], batch_format="pandas")
    bdf = collected.filter(expr="boundary == True").to_pandas()
    if len(bdf):
        bdf = bdf.sort_values([key, "head_ord"], kind="stable")
        flat = (lambda ls: _dedup_keep_first(
            [x for sub in ls for x in sub])) if dedup else (
            lambda ls: [x for sub in ls for x in sub])
        merged = (bdf.groupby(key, sort=False)["values"]
                  .agg(flat)
                  .reset_index())
    else:
        merged = pd.DataFrame({key: pd.Series(dtype="object"),
                               "values": pd.Series(dtype="object")})
    return interior.union(
        rd.from_pandas(merged).map_batches(lambda df: df,
                                           batch_format="pandas"))


def sorted_groupby_agg(ds, *, key, aggs: dict[str, tuple[str, str]]):
    """Grouped SUM/MIN/MAX/COUNT without Ray's ``groupby().aggregate``
    reduce, whose per-row combine costs ~100 µs (measured: 600 k input
    rows ≈ 60 s at 32 cpus — it dominates any aggregate whose input,
    even after per-batch combiners, stays row-heavy, e.g. a
    per-customer total where most batch rows carry distinct keys, or a
    corpus-sized per-content-hash min).

    Same skeleton as :func:`sorted_collect`: one range sort by ``key``
    (a str or list of str), ONE vectorized pandas groupby per block,
    and a driver-side stitch of the O(#blocks) boundary keys. ``aggs``
    maps output alias → (input column, op) with op in
    sum|min|max|count; every op re-combines exactly across the block
    and stitch phases (count partials re-combine via sum). Scale
    bound: per-block work is vectorized, driver work is #blocks × 2
    rows."""
    import ray.data as rd

    keys = [key] if isinstance(key, str) else list(key)
    ops = {"sum", "min", "max", "count"}
    for a, (_, op) in aggs.items():
        if op not in ops:
            raise ValueError(f"unsupported op {op!r} for {a!r}")
    spec = {a: (c, op) for a, (c, op) in aggs.items()}

    pdf = _driver_small(ds)
    if pdf is not None:
        g = pdf.groupby(keys, sort=False)
        out = {}
        for a, (c, op) in spec.items():
            out[a] = g[c].size() if op == "count" else getattr(g[c], op)()
        merged = pd.DataFrame(out).reset_index()
        return rd.from_pandas(merged[[*keys, *spec]])

    def stitch_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        out = {}
        for a, (_, op) in spec.items():
            # partial counts COMBINE via sum; sum/min/max self-combine
            out[a] = g[a].sum() if op == "count" else getattr(g[a], op)()
        return pd.DataFrame(out).reset_index()

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = {k: pd.Series(dtype="object") for k in keys}
            out.update({a: pd.Series(dtype="float64") for a in spec})
            out["boundary"] = pd.Series(dtype="bool")
            return pd.DataFrame(out)
        part = df.groupby(keys, sort=False)
        cols = {}
        for a, (c, op) in spec.items():
            cols[a] = (part[c].size() if op == "count"
                       else getattr(part[c], op)())
        g = pd.DataFrame(cols).reset_index()
        boundary = np.zeros(len(g), dtype=bool)
        boundary[0] = True
        boundary[-1] = True
        g["boundary"] = boundary
        return g

    hydrated = ds.sort(keys)
    parts = hydrated.map_batches(per_block, batch_format="pandas",
                                 batch_size=None)
    # pin before the two consumers (interior / boundary): re-executing
    # the sort could move a key across the interior/boundary split
    parts = parts.materialize()
    interior = parts.filter(expr="boundary == False").map_batches(
        lambda df: df[[*keys, *spec]], batch_format="pandas")
    bdf = parts.filter(expr="boundary == True").to_pandas()
    if len(bdf):
        merged = stitch_combine(bdf)[[*keys, *spec]]
    else:
        merged = pd.DataFrame({**{k: pd.Series(dtype="object")
                                  for k in keys},
                               **{a: pd.Series(dtype="float64")
                                  for a in spec}})
    return interior.union(
        rd.from_pandas(merged).map_batches(lambda df: df,
                                           batch_format="pandas"))


def sorted_groupby_sum(ds, *, key: str, sum_cols: dict[str, str]):
    """Grouped SUM via :func:`sorted_groupby_agg` (kept as the common
    special case). ``sum_cols`` maps output alias → input column."""
    return sorted_groupby_agg(
        ds, key=key, aggs={a: (c, "sum") for a, c in sum_cols.items()})


def sorted_grouped_topk(ds, *, key: str, order_by: list[str],
                        descending: list[bool], k: int,
                        rank_col: str = "rank"):
    """Per-key top-k rows with ranks — SQL
    ``row_number() OVER (PARTITION BY key ORDER BY ...) <= k`` — on the
    sorted-stitch skeleton: one range sort by ``(key, *order_by)``
    (with the requested per-column direction), a vectorized
    ``head(k)`` + cumcount rank per block, and a driver stitch of only
    the boundary KEYS' fragments. Every fragment is already capped at
    ``k`` rows, so the stitch holds at most ``#blocks × 2 × k`` rows
    regardless of group sizes — no degenerate-key cliff.

    ``order_by`` should end in a unique tiebreak column so ranks are
    deterministic across parallelism levels."""
    import ray.data as rd

    cols = [key, *order_by]
    asc = [not d for d in descending]

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(**{rank_col: pd.Series(dtype="int64"),
                                "boundary": pd.Series(dtype="bool")})
        top = df.groupby(key, sort=False).head(k).copy()
        top[rank_col] = top.groupby(key, sort=False).cumcount() + 1
        first, last = df[key].iloc[0], df[key].iloc[-1]
        top["boundary"] = (top[key] == first) | (top[key] == last)
        return top

    parts = ds.sort(cols, descending=[False, *descending]).map_batches(
        per_block, batch_format="pandas", batch_size=None)
    parts = parts.materialize()  # pin the interior/boundary split
    interior = parts.filter(expr="boundary == False").map_batches(
        lambda df: df.drop(columns=["boundary"]), batch_format="pandas")
    bdf = parts.filter(expr="boundary == True").to_pandas()
    if len(bdf):
        bdf = bdf.sort_values(cols, ascending=[True, *asc], kind="stable")
        merged = bdf.groupby(key, sort=False).head(k).copy()
        merged[rank_col] = merged.groupby(key, sort=False).cumcount() + 1
        merged = merged.drop(columns=["boundary"])
    else:
        merged = bdf.drop(columns=["boundary"])
    return interior.union(
        rd.from_pandas(merged).map_batches(lambda df: df,
                                           batch_format="pandas"))


def sorted_distinct(ds, keys: list[str]):
    """DISTINCT over ``keys`` via one range sort + per-block vectorized
    drop_duplicates + a driver-side stitch of the O(#blocks) boundary
    rows — no Ray aggregate (whose per-row reduce cost dominates
    row-heavy distincts) and no per-group Python. After the sort equal
    keys are contiguous, so only a block's FIRST and LAST post-dedup
    rows can collide with a neighboring block."""
    import ray.data as rd

    pdf = _driver_small(ds)
    if pdf is not None:
        merged = (pdf.sort_values(keys, kind="stable")
                  .drop_duplicates(keys).reset_index(drop=True))
        return rd.from_pandas(merged)

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(keys)
        boundary = np.zeros(len(out), dtype=bool)
        if len(out):
            boundary[0] = True
            boundary[-1] = True
        return out.assign(boundary=boundary)

    parts = ds.sort(keys).map_batches(per_block, batch_format="pandas",
                                      batch_size=None)
    parts = parts.materialize()  # pin the interior/boundary split
    interior = parts.filter(expr="boundary == False").map_batches(
        lambda df: df.drop(columns=["boundary"]), batch_format="pandas")
    bdf = parts.filter(expr="boundary == True").to_pandas()
    # errors="ignore": an EMPTY input dataset never runs per_block, so
    # the collected frame has no boundary column at all
    merged = (bdf.drop(columns=["boundary"], errors="ignore")
              .sort_values(keys, kind="stable").drop_duplicates(keys)
              if len(bdf)
              else bdf.drop(columns=["boundary"], errors="ignore"))
    return interior.union(
        rd.from_pandas(merged).map_batches(lambda df: df,
                                           batch_format="pandas"))


def salted_groupby_agg(ds, *, key, aggs: dict[str, tuple[str, str]],
                       salt_buckets: int = 16):
    """Two-stage EXPLICITLY SALTED aggregation for Zipf-hot keys — the
    skew treatment the north star names alongside the per-batch
    combiners used elsewhere (stages/canonicalize docstring).

    Combiners bound a hot key to ≤ one partial per BLOCK; that is the
    right tool when partials are small. When they are not — a hot key
    whose per-block partials are still numerous or wide (distinct
    sketches, long collected lists) — no single reducer should own the
    key at all. Stage 1 groups by ``(key, salt)`` where
    ``salt = value-hash % salt_buckets`` spreads one hot key over
    ``salt_buckets`` reducers; stage 2 re-aggregates the ≤
    ``salt_buckets`` salted partials per key. Only re-combinable aggs
    are offered (sum / min / max / count — count re-combines as sum),
    so the result is exactly the unsalted answer for any bucket count
    (property-tested in tests/test_collect.py).
    """
    import numpy as np
    import pandas as pd

    keys = [key] if isinstance(key, str) else list(key)
    # stage-2 re-combines stage-1's output column (named alias);
    # count partials re-combine via sum
    stage2 = {alias: (alias, "sum" if op == "count" else op)
              for alias, (_col, op) in aggs.items()}

    def add_salt(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df = df.copy()
            df["_salt"] = pd.Series(dtype="int64")
            return df
        h = pd.util.hash_pandas_object(
            df.index.to_series().reset_index(drop=True), index=False)
        df = df.reset_index(drop=True)
        df["_salt"] = (h.to_numpy().astype(np.uint64)
                       % np.uint64(salt_buckets)).astype(np.int64)
        return df

    salted = ds.map_batches(add_salt, batch_format="pandas")
    part = sorted_groupby_agg(salted, key=keys + ["_salt"], aggs=aggs)
    out = sorted_groupby_agg(part, key=keys, aggs=stage2)
    return out


def grouped_mode(ds, *, key: str, value: str):
    """Per-key MODE — the most frequent ``value`` per ``key`` with a
    deterministic tie-break (higher count wins, then smaller value) —
    SQL ``row_number() OVER (PARTITION BY key ORDER BY cnt DESC,
    value) = 1`` over the grouped counts. The dominant-category
    aggregate (e.g. a user's primary event type, a host's main
    language) that Ray's built-in aggregates lack.

    Shape: per-batch (key, value) count partials (the combiner — the
    full rows never shuffle), one :func:`sorted_groupby_agg` for exact
    pair counts, then :func:`sorted_grouped_topk` k=1. All three
    phases are stitch-based; driver state stays O(#blocks).

    Returns ``(key, mode_value, cnt)``."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: pd.Series(dtype="object"),
                                 value: pd.Series(dtype="object"),
                                 "cnt_p": pd.Series(dtype="int64")})
        g = df.groupby([key, value], sort=False).size()
        return g.rename("cnt_p").reset_index()

    counts = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key=[key, value], aggs={"cnt": ("cnt_p", "sum")})
    top = sorted_grouped_topk(counts, key=key,
                              order_by=["cnt", value],
                              descending=[True, False], k=1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={value: "mode_value"})
        out["cnt"] = out["cnt"].astype("int64")
        return out[[key, "mode_value", "cnt"]]

    return top.map_batches(finish, batch_format="pandas")


def sorted_count_distinct(ds, *, key, dcol: str, alias: str = "n"):
    """``COUNT(DISTINCT dcol) GROUP BY key`` in ONE range sort — the
    fused sibling of ``sorted_distinct`` + ``sorted_groupby_agg``
    (composing those pays two all-to-alls; at corpus scale the second
    sort is pure waste because the distinct stream is already
    key-clustered).

    After the global ``(key, dcol)`` sort, equal pairs are contiguous,
    so per block: vectorized pair-dedup, then per-key counts. Two
    cross-block hazards, both confined to block edges:

    - a KEY spanning blocks → its count rows are the first/last
      key-rows of their blocks; mark those boundary and re-sum them in
      the driver stitch (the ``sorted_groupby_agg`` correction);
    - a PAIR spanning blocks → counted once per block; each block
      ships its edge pairs (≤2, pre-deduped within the block) and the
      stitch subtracts ``multiplicity − 1`` per distinct edge pair
      (a pair spanning m blocks appears as an edge record in all m).

    Driver state: O(#blocks) boundary rows + O(#blocks) edge records.
    Returns a distributed Dataset of ``(key…, alias)``, count int64."""
    import ray.data as rd

    keys = [key] if isinstance(key, str) else list(key)

    pdf = _driver_small(ds)
    if pdf is not None:
        d = pdf[keys + [dcol]].drop_duplicates()
        merged = (d.groupby(keys, sort=False).size().rename(alias)
                  .reset_index())
        merged[alias] = merged[alias].astype("int64")
        return rd.from_pandas(merged[keys + [alias]])

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({**{k: pd.Series(dtype="object")
                                 for k in keys},
                              alias: pd.Series(dtype="int64"),
                              "boundary": pd.Series(dtype="bool"),
                              "edge_first": pd.Series(dtype="object"),
                              "edge_last": pd.Series(dtype="object")})
        d = df[keys + [dcol]].drop_duplicates()
        if len(d) == 0:
            return empty
        cnt = (d.groupby(keys, sort=False).size().rename(alias)
               .reset_index())
        boundary = np.zeros(len(cnt), dtype=bool)
        boundary[0] = True
        boundary[-1] = True
        cnt["boundary"] = boundary
        cnt["edge_first"] = None
        cnt["edge_last"] = None
        first, last = d.iloc[0], d.iloc[-1]
        # edge records, deduped within the block (a single-pair block
        # must contribute its pair ONCE)
        same_pair = bool((first[keys + [dcol]] == last[keys + [dcol]])
                         .all())
        if not same_pair:
            cnt.iloc[0, cnt.columns.get_loc("edge_first")] = first[dcol]
        cnt.iloc[len(cnt) - 1,
                 cnt.columns.get_loc("edge_last")] = last[dcol]
        return cnt

    parts = ds.sort(keys + [dcol]).map_batches(
        per_block, batch_format="pandas", batch_size=None)
    parts = parts.materialize()  # pin the interior/boundary split
    interior = parts.filter(expr="boundary == False").map_batches(
        lambda df: df[keys + [alias]], batch_format="pandas")
    bdf = parts.filter(expr="boundary == True").to_pandas()
    if len(bdf) == 0:
        merged = pd.DataFrame({**{k: pd.Series(dtype="object")
                                  for k in keys},
                               alias: pd.Series(dtype="int64")})
    else:
        totals = bdf.groupby(keys, sort=False)[alias].sum()
        # pair-overlap correction: each distinct edge pair seen in m
        # blocks was counted m times, belongs once
        recs = []
        for col in ("edge_first", "edge_last"):
            sub = bdf[bdf[col].notna()]
            for _, row in sub.iterrows():
                recs.append(tuple(row[k] for k in keys) + (row[col],))
        if recs:
            rec_df = pd.DataFrame(recs, columns=keys + ["_d"])
            dup = (rec_df.groupby(keys + ["_d"], sort=False).size() - 1)
            corr = dup[dup > 0].groupby(level=list(range(len(keys)))) \
                .sum()
            totals = totals.sub(corr, fill_value=0)
        merged = totals.astype("int64").rename(alias).reset_index()
    return interior.union(
        rd.from_pandas(merged).map_batches(lambda df: df,
                                           batch_format="pandas"))
