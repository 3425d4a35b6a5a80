"""Data-quality expectation checks — the validation gate a pipeline
runs before promoting a table (the batch generalization of the
reference's ingest-time Pydantic validation + Neo4j uniqueness
constraints, src/graph/graph_model.py and graph_element/schema.py:11-21,
which check one row / one key per request; here the whole table is
audited in one pass). Public pattern (Great-Expectations-style
expectation suites).

Dataflow: every per-row rule (not_null / range / regex) is counted by
ONE shared vectorized pass per batch — |rules| tiny partial rows per
block reach the fold. ``unique`` rules need a global view and use one
grouped-count stitch per keyed column (violations = rows − distinct
keys, i.e. every row beyond the first of a duplicated key). Output is
a (rule, violations, n_checked) report — driver-side size is |rules|.
"""

from __future__ import annotations

import pandas as pd


def validate_table(ds, rules: list[dict]):
    """``rules``: list of dicts with ``name``, ``kind`` in
    {not_null, range, regex, unique}, ``col``, and for range ``lo`` /
    ``hi`` (inclusive; None = unbounded), for regex ``pattern``
    (fullmatch). Returns a Dataset report ``(rule, violations,
    n_checked)``; null values violate not_null only (range/regex skip
    them — compose with not_null to forbid)."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    for r in rules:
        if r["kind"] not in ("not_null", "range", "regex", "unique"):
            raise ValueError(r["kind"])
    row_rules = [r for r in rules if r["kind"] != "unique"]
    uniq_rules = [r for r in rules if r["kind"] == "unique"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r in row_rules:
            s = df[r["col"]]
            if r["kind"] == "not_null":
                viol = int(s.isna().sum())
                checked = len(s)
            elif r["kind"] == "range":
                ok = pd.Series(True, index=s.index)
                if r.get("lo") is not None:
                    ok &= s >= r["lo"]
                if r.get("hi") is not None:
                    ok &= s <= r["hi"]
                mask = s.notna()
                viol = int((~ok & mask).sum())
                checked = int(mask.sum())
            else:  # regex
                mask = s.notna()
                viol = int((~s[mask].astype(str)
                            .str.fullmatch(r["pattern"])).sum())
                checked = int(mask.sum())
            out.append({"rule": r["name"], "v": viol, "n": checked})
        return pd.DataFrame(out, columns=["rule", "v", "n"])

    reports = []
    if row_rules:
        reports.append(sorted_groupby_agg(
            ds.map_batches(partial, batch_format="pandas"),
            key="rule", aggs={"violations": ("v", "sum"),
                              "n_checked": ("n", "sum")}))
    for r in uniq_rules:
        col = r["col"]

        def key_partial(df: pd.DataFrame, *, _c=col) -> pd.DataFrame:
            vc = df[_c].value_counts(dropna=False)
            return pd.DataFrame({"k": vc.index.to_numpy(),
                                 "c": vc.to_numpy()})

        counts = sorted_groupby_agg(
            ds.map_batches(key_partial, batch_format="pandas"),
            key="k", aggs={"c": ("c", "sum")})

        def to_report(df: pd.DataFrame, *, _name=r["name"]) \
                -> pd.DataFrame:
            # per-block partial: extra rows beyond each key's first
            c = df["c"]
            return pd.DataFrame({"rule": [_name],
                                 "v": [int((c - 1).sum())],
                                 "n": [int(c.sum())]})

        reports.append(sorted_groupby_agg(
            counts.map_batches(to_report, batch_format="pandas"),
            key="rule", aggs={"violations": ("v", "sum"),
                              "n_checked": ("n", "sum")}))

    out = reports[0]
    for rep in reports[1:]:
        out = out.union(rep)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["violations"] = df["violations"].astype("int64")
        df["n_checked"] = df["n_checked"].astype("int64")
        return df[["rule", "violations", "n_checked"]]

    return out.map_batches(finish, batch_format="pandas")
