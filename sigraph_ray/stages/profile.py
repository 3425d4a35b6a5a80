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
