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


def frequent_pairs(ds, *, group: str, item: str, min_support: int = 2,
                   k: int = 20, max_basket: int | None = None):
    """Top-k co-occurring item pairs by group support.

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

    counts = sorted_groupby_sum(
        baskets.map_batches(expand, batch_format="pandas"),
        key=["p1", "p2"], sum_cols={"support": "support"})

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
