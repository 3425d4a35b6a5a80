"""One-pass column profiler — the pre-flight table scan of a
training-data run.

Beyond-reference operator (the reference's only schema introspection is
OpenSearch's dynamic mapping, db_model.py:12-109 — it never *reports*
per-field statistics). A 100 TB ingest wants a cheap, shuffle-free
``DESCRIBE``: per-column row count, null count and min/max in ONE pass,
so schema drift and null floods are caught before the expensive stages
run. Pairs with :mod:`sigraph_ray.stages.validate` (assertions) and
:mod:`sigraph_ray.stages.sketch` (approximate distincts) — this module
is the exact, O(#blocks)-driver-state tier.

Scale shape: one ``map_batches`` emits ONE wide partial row per block
(native dtypes preserved so int mins compare numerically, not
lexically); the driver folds O(#blocks) rows and renders min/max to
strings only at the end. No shuffle, nothing corpus-sized anywhere.
"""

from __future__ import annotations

import pandas as pd


def profile_table(ds, columns: list[str]) -> pd.DataFrame:
    """Profile ``columns`` of ``ds`` → one row per column:
    ``(col, n_rows, n_null, min_value, max_value)`` with min/max
    rendered as strings (None when every value is null). Equivalent
    SQL: ``count(*)``, ``count(*) - count(c)``,
    ``CAST(min(c) AS VARCHAR)``, ``CAST(max(c) AS VARCHAR)`` per
    column."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        row: dict[str, list] = {}
        for c in columns:
            s = df[c]
            notna = s.notna()
            row[f"{c}__rows"] = [len(s)]
            row[f"{c}__nulls"] = [int((~notna).sum())]
            v = s[notna]
            row[f"{c}__min"] = [v.min() if len(v) else None]
            row[f"{c}__max"] = [v.max() if len(v) else None]
        return pd.DataFrame(row)

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    recs = []
    for c in columns:
        mn = parts[f"{c}__min"].dropna()
        mx = parts[f"{c}__max"].dropna()
        recs.append({
            "col": c,
            "n_rows": int(parts[f"{c}__rows"].sum()),
            "n_null": int(parts[f"{c}__nulls"].sum()),
            "min_value": str(mn.min()) if len(mn) else None,
            "max_value": str(mx.max()) if len(mx) else None,
        })
    out = pd.DataFrame(recs).sort_values("col").reset_index(drop=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_null"] = out["n_null"].astype("int64")
    return out


def key_skew(ds, *, key: str, top_k: int = 10):
    """Key-skew profiler — the pre-shuffle hot-key report. Before any
    groupby/join on ``key`` at 100 TB you want to know whether one key
    holds 30% of the rows (then you salt it, see
    ``stages/collect.salted_groupby_agg``). Returns the ``top_k``
    heaviest keys as ``(rank, key, cnt, share_pct, skew)`` where
    ``share_pct`` is the key's row share and ``skew`` = cnt / mean
    count per key (1.0 = perfectly uniform).

    Shape: per-batch partial-count combiner → one
    ``sorted_groupby_agg`` for exact per-key counts → per-block top-k
    prune (each block forwards ≤ ``top_k`` rows) → tiny global sort;
    total/n_keys come from O(#blocks) partial scalars. Driver state is
    O(#blocks + top_k), never O(#keys)."""

    from sigraph_ray.stages.collect import sorted_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: pd.Series(dtype="object"),
                                 "cnt_p": pd.Series(dtype="int64")})
        g = df.groupby(key, sort=False).size()
        return pd.DataFrame({key: g.index.to_numpy(),
                             "cnt_p": g.to_numpy().astype("int64")})

    counts = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key=key, aggs={"cnt": ("cnt_p", "sum")}).materialize()

    stats = counts.map_batches(
        lambda df: pd.DataFrame({"tot": [int(df["cnt"].sum())],
                                 "nk": [len(df)]}),
        batch_format="pandas", batch_size=None).to_pandas()
    total, n_keys = int(stats["tot"].sum()), int(stats["nk"].sum())

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cnt", key], ascending=[False, True],
                              kind="stable").head(top_k)

    top = (counts.map_batches(prune, batch_format="pandas",
                              batch_size=None)
           .sort(["cnt", key], descending=[True, False])
           .limit(top_k).to_pandas())
    cnt = top["cnt"].astype("int64").to_numpy()
    return pd.DataFrame({
        "rank": pd.RangeIndex(1, len(top) + 1).astype("int64"),
        key: top[key].to_numpy(),
        "cnt": cnt,
        "share_pct": (cnt * 100.0) / total if total else cnt * 0.0,
        "skew": (cnt * n_keys) / total if total else cnt * 0.0,
    })
