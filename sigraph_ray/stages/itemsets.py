"""Frequent-itemset pair mining (market-basket co-occurrence) — the
counting core of A-Priori/FP-growth restricted to pairs, which is the
step KG pipelines use to mine entity co-occurrence edges from grouped
observations (documents, sessions, orders).

Beyond-reference operator (the reference has no basket-analytics
surface; SURVEY.md §2.11): ``support(p1, p2) = |{groups containing
both}|`` over DISTINCT (group, item) observations, thresholded at
``min_support``, global top-k by (support DESC, p1, p2).

Dataflow shape: one :func:`~sigraph_ray.stages.collect.sorted_collect`
range sort co-locates each group's distinct item set (basket), pair
expansion runs as a vectorized within-batch self-merge (quadratic only
in BASKET size, which is small and bounded — the classic A-Priori
assumption; a degenerate giant basket is exactly what
``sorted_collect(max_members=...)`` caps), per-batch pair counts
pre-aggregate before the one grouped-sum stitch, and the top-k is
two-phase (per-block head, then a single bounded final task). Nothing
corpus-sized ever lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sigraph_ray.stages.collect import sorted_collect, sorted_groupby_sum

_EMPTY = {"p1": pd.Series(dtype="object"), "p2": pd.Series(dtype="object"),
          "support": pd.Series(dtype="int64")}


def pair_supports(ds, *, group: str, item: str,
                  max_basket: int | None = None):
    """Exact global co-occurrence supports as a Dataset of
    ``(p1, p2, support)`` with ``p1 < p2`` — the shared counting core
    under :func:`frequent_pairs` (thresholded top-k) and
    :func:`jaccard_neighbors` (common-neighbor link prediction).

    ``max_basket`` (optional) caps basket width via ``sorted_collect``'s
    ``max_members`` guard — baskets over the cap are DROPPED (logged
    semantics mirror the LSH bucket cap, dedup.py): at web scale a
    degenerate group (one crawl host owning millions of items) must not
    expand quadratically.
    """
    baskets = sorted_collect(
        ds, key=group, order_col=item, value=item, dedup=True,
        max_members=None if max_basket is None else max_basket + 1)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(_EMPTY)
        vals = df["values"]
        if max_basket is not None:
            vals = vals[vals.str.len() <= max_basket]
        ex = pd.DataFrame({
            "g": np.repeat(np.arange(len(vals)), vals.str.len()),
            "item": [x for sub in vals for x in sub]})
        m = ex.merge(ex, on="g")
        m = m[m["item_x"] < m["item_y"]]
        if len(m) == 0:
            # keep the item dtype (don't emit untyped empties)
            return pd.DataFrame({"p1": m["item_x"], "p2": m["item_y"],
                                 "support": pd.Series(dtype="int64")})
        # each group is wholly in one list row → one hit per group
        vc = m.value_counts(["item_x", "item_y"])
        idx = vc.index.to_frame(index=False)
        return pd.DataFrame({"p1": idx["item_x"], "p2": idx["item_y"],
                             "support": vc.to_numpy().astype("int64")})

    return sorted_groupby_sum(
        baskets.map_batches(expand, batch_format="pandas"),
        key=["p1", "p2"], sum_cols={"support": "support"})


def frequent_pairs(ds, *, group: str, item: str, min_support: int = 2,
                   k: int = 20, max_basket: int | None = None):
    """Top-k co-occurring item pairs by group support (see
    :func:`pair_supports` for the dataflow); two-phase top-k — the
    min_support filter runs distributed, only per-block heads reach
    the final fold."""
    counts = pair_supports(ds, group=group, item=item,
                           max_basket=max_basket)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["support"] >= min_support]
        if len(d) == 0:
            return pd.DataFrame(_EMPTY)
        return (d.sort_values(["support", "p1", "p2"],
                              ascending=[False, True, True])
                .head(k).astype({"support": "int64"}))

    partials = counts.map_batches(topk, batch_format="pandas").to_pandas()
    return (partials.sort_values(["support", "p1", "p2"],
                                 ascending=[False, True, True])
            .head(k).reset_index(drop=True))


def jaccard_neighbors(ds, *, group: str, item: str, min_common: int = 2,
                      k: int = 20, max_basket: int | None = None):
    """Common-neighbor link prediction over a bipartite observation
    table: for each item pair, ``jaccard = |groups(p1) ∩ groups(p2)| /
    |groups(p1) ∪ groups(p2)|``, top-k by (jaccard DESC, p1, p2) among
    pairs with ≥ ``min_common`` shared groups — the classic
    neighborhood-similarity scorer (Liben-Nowell & Kleinberg 2003)
    used to propose KG alias/relatedness edges.

    Intersections reuse the :func:`pair_supports` wedge counting (one
    range sort, block-local expansion); item degrees are one grouped
    count; both marginals attach via bounded sorted-merge joins, so
    the union term is ``d1 + d2 - common`` without a second pass over
    the data. Note: with ``max_basket`` set, degrees still count
    dropped giant baskets while intersections exclude them — scores
    for items touching a dropped basket are LOWER bounds (the
    conservative direction for link proposals)."""
    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.joins import sorted_merge_join

    uniq = ds  # pair_supports dedups inside sorted_collect
    common = pair_supports(uniq, group=group, item=item,
                           max_basket=max_basket)
    # threshold BEFORE the marginal joins: only surviving pairs shuffle
    common = common.map_batches(
        lambda df: df[df["support"] >= min_common],
        batch_format="pandas")
    deg = sorted_groupby_agg(
        _distinct_pairs(uniq, group, item),
        key=item, aggs={"deg": (group, "count")})

    d1 = deg.map_batches(
        lambda df: df.rename(columns={item: "p1", "deg": "d1"}),
        batch_format="pandas")
    d2 = deg.map_batches(
        lambda df: df.rename(columns={item: "p2", "deg": "d2"}),
        batch_format="pandas")
    j1 = sorted_merge_join(common, d1, on="p1",
                           left_cols=["p2", "support"], right_cols=["d1"])
    j2 = sorted_merge_join(j1, d2, on="p2",
                           left_cols=["p1", "support", "d1"],
                           right_cols=["d2"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        d = df
        c = d["support"].to_numpy(np.float64)
        union = (d["d1"].to_numpy(np.float64)
                 + d["d2"].to_numpy(np.float64) - c)
        out = pd.DataFrame({"p1": d["p1"], "p2": d["p2"],
                            "common": d["support"].astype("int64"),
                            "jaccard": c / union})
        return out.sort_values(["jaccard", "p1", "p2"],
                               ascending=[False, True, True]).head(k)

    partials = j2.map_batches(score, batch_format="pandas").to_pandas()
    return (partials.sort_values(["jaccard", "p1", "p2"],
                                 ascending=[False, True, True])
            .head(k).reset_index(drop=True))


def _distinct_pairs(ds, group: str, item: str):
    from sigraph_ray.stages.collect import sorted_distinct
    return sorted_distinct(ds, [group, item])


def association_rules(ds, *, group: str, item: str, min_support: int = 2,
                      k: int = 20, max_basket: int | None = None):
    """Directed association rules (Agrawal & Srikant, VLDB'94 — the
    pair case): for every supported pair, both rule directions with
    ``confidence = supp(a∪c)/supp(a)`` and
    ``lift = confidence / (supp(c)/N)``; top-k by (lift DESC, ant,
    cons). Reuses :func:`pair_supports` wedge counting; item marginals
    attach as bounded sorted-merge joins and the basket count N is one
    distributed distinct-count — the fact table is scanned once per
    marginal, never joined to itself."""
    from sigraph_ray.stages.collect import sorted_distinct, sorted_groupby_agg
    from sigraph_ray.stages.joins import sorted_merge_join

    # Original item dtype, captured BEFORE the NaN-capable merges
    # upcast it: the cast-back below must only undo a merge upcast,
    # never truncate genuinely-float item ids (2.5 -> 2 would merge
    # distinct items).
    try:
        import pyarrow as _pa

        sch = ds.schema()
        item_is_int = _pa.types.is_integer(
            dict(zip(sch.names, sch.types))[item])
    except Exception:
        item_is_int = False

    supports = pair_supports(ds, group=group, item=item,
                             max_basket=max_basket)
    supports = supports.map_batches(
        lambda df: df[df["support"] >= min_support],
        batch_format="pandas")
    deg = sorted_groupby_agg(
        _distinct_pairs(ds, group, item),
        key=item, aggs={"deg": (group, "count")})
    n_groups = float(sorted_distinct(ds, [group]).count())

    # both rule directions from the p1<p2 support table
    directed = supports.map_batches(
        lambda df: pd.concat([
            df.rename(columns={"p1": "ant", "p2": "cons"}),
            df.rename(columns={"p2": "ant", "p1": "cons"})],
            ignore_index=True)[["ant", "cons", "support"]],
        batch_format="pandas")

    da = deg.map_batches(
        lambda df: df.rename(columns={item: "ant", "deg": "da"}),
        batch_format="pandas")
    dc = deg.map_batches(
        lambda df: df.rename(columns={item: "cons", "deg": "dc"}),
        batch_format="pandas")
    j1 = sorted_merge_join(directed, da, on="ant",
                           left_cols=["cons", "support"],
                           right_cols=["da"])
    j2 = sorted_merge_join(j1, dc, on="cons",
                           left_cols=["ant", "support", "da"],
                           right_cols=["dc"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        c = df["support"].to_numpy(np.float64)
        da_ = df["da"].to_numpy(np.float64)
        dc_ = df["dc"].to_numpy(np.float64)
        # the merge joins upcast int id columns to float64 (pandas
        # NaN-capable merge); every ant/cons has a degree row by
        # construction, so the cast back is lossless — but ONLY for
        # columns that were integers going in (item_is_int above);
        # string or genuinely-float items pass through unchanged.
        def unfloat(s: pd.Series, was_int: bool) -> pd.Series:
            if was_int and pd.api.types.is_float_dtype(s):
                return s.astype("int64")
            return s

        out = pd.DataFrame({"ant": unfloat(df["ant"], item_is_int),
                            "cons": unfloat(df["cons"], item_is_int),
                            "support": unfloat(df["support"], True),
                            "confidence": c / da_,
                            "lift": c * n_groups / (da_ * dc_)})
        return out.sort_values(["lift", "ant", "cons"],
                               ascending=[False, True, True]).head(k)

    partials = j2.map_batches(score, batch_format="pandas").to_pandas()
    return (partials.sort_values(["lift", "ant", "cons"],
                                 ascending=[False, True, True])
            .head(k).reset_index(drop=True))
