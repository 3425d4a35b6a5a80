"""Local mirror of the driver's correctness gate: run every
``queries()`` entry that has an ``oracle_sql()`` and compare against
DuckDB on the same parquet tables (order-insensitive, column-name
matched), at sf0.001 for speed. The driver repeats this at sf0.01."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize WITHIN a dtype kind only (int width → int64, float
    width → float64, datetime unit → ns). Deliberately does NOT bridge
    int↔float: the driver's value hash distinguishes ``38`` from
    ``38.0``, so the local gate must too (r4 post-mortem — 5 driver
    reds that the old ``check_dtype=False`` compare waved through)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = (pd.to_datetime(df[c]).dt.tz_localize(None)
                     .astype("datetime64[ns]"))
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def assert_strict_match(g: pd.DataFrame, w: pd.DataFrame,
                        name: str = "") -> None:
    """Driver-grade compare of two NORMALIZED frames: identical column
    order, identical dtypes (int vs float is a FAIL), exact values for
    non-float columns, 1e-6 tolerance for float columns only."""
    assert list(g.columns) == list(w.columns), (
        f"{name}: cols {list(g.columns)} vs {list(w.columns)}")
    gd, wd = [str(t) for t in g.dtypes], [str(t) for t in w.dtypes]
    assert gd == wd, (
        f"{name}: dtype mismatch (query vs oracle): "
        + ", ".join(f"{c}: {a} vs {b}"
                    for c, a, b in zip(g.columns, gd, wd) if a != b))
    assert len(g) == len(w), f"{name}: rows {len(g)} vs {len(w)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=True,
                                  check_exact=False, atol=1e-6, rtol=1e-6)


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(ray_session, name):
    q = entrymod.queries()[name]
    got = q(SF_DIR)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = run_oracle(entrymod.oracle_sql()[name])
    g, w = normalize(got), normalize(want)
    assert_strict_match(g, w, name)


def test_rows_only_queries_execute(ray_session):
    qs = entrymod.queries()
    for name in sorted(set(qs) - set(ORACLED)):
        out = qs[name](SF_DIR)
        if hasattr(out, "to_pandas"):
            out = out.to_pandas()
        assert len(out) >= 0 and len(out.columns) > 0, name


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(df) > 0
    assert {"doc_url", "subj", "pred", "obj"} <= set(df.columns)
