"""Moment-sum statistics — correlation and grouped linear regression
as ONE shuffle-free (or one-stitch) pass of per-block partial moments.

The classic scale shape for second-order statistics: each block emits
(n, Σx, Σy, Σx², Σy², Σxy) — six scalars per block (per group) — and
the fold is exact re-combination. x is shifted by a constant ``x_base``
before squaring: correlation and slope are shift-invariant, and the
shift keeps Σx² ~ var·n instead of ~(1e9)²·n, avoiding the float64
cancellation a raw epoch-seconds column would cause (DuckDB's
``corr``/``regr_*`` use streaming-stable accumulators; the shifted
moment sums match them to ~1e-12 relative).

Beyond-reference operators (the reference has no numeric-statistics
surface; SURVEY.md §2.7/§2.11) — the data-quality / drift-analysis
pass a training-data pipeline runs over numeric columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MOMS = ["n", "sx", "sy", "sxx", "syy", "sxy"]


def _moment_partial(df: pd.DataFrame, x: str, y: str,
                    x_base: float) -> dict:
    xs = df[x].to_numpy(dtype=np.float64) - x_base
    ys = df[y].to_numpy(dtype=np.float64)
    return {"n": float(len(df)), "sx": float(xs.sum()),
            "sy": float(ys.sum()), "sxx": float((xs * xs).sum()),
            "syy": float((ys * ys).sum()), "sxy": float((xs * ys).sum())}


def column_corr(ds, *, x: str, y: str, x_base: float = 0.0):
    """Pearson correlation between two numeric columns — one
    shuffle-free pass, O(#blocks) × 6 scalars on the driver. Returns a
    one-row DataFrame ``(corr_xy, n)`` matching DuckDB ``corr(y, x)``
    (sample/population factors cancel)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({m: pd.Series(dtype="float64")
                                 for m in _MOMS})
        return pd.DataFrame([_moment_partial(df, x, y, x_base)])

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    n, sx, sy, sxx, syy, sxy = (float(parts[m].sum()) for m in _MOMS)
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    r = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else np.nan
    return pd.DataFrame({"corr_xy": [r], "n": pd.Series([n], dtype="int64")})


def grouped_linreg(ds, *, key: str, x: str, y: str,
                   x_base: float = 0.0):
    """Per-group ordinary least squares ``y = slope·x + icept`` — the
    per-segment trend fit (drift per event type, quality-over-time per
    source). Per-batch grouped moment partials (six scalars per group
    per block, never row-scale) re-combine exactly through ONE
    sorted_groupby_agg stitch; slope/intercept are a per-row epilogue.
    Matches DuckDB ``regr_slope(y, x)`` / ``regr_intercept(y, x)``.

    Returns ``(key, slope, icept, n)``."""
    from sigraph_ray.stages.collect import sorted_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = {key: pd.Series(dtype="object")}
            out.update({f"{m}_p": pd.Series(dtype="float64")
                        for m in _MOMS})
            return pd.DataFrame(out)
        rows = []
        for g, idx in df.groupby(key, sort=False).indices.items():
            m = _moment_partial(df.iloc[idx], x, y, x_base)
            m[key] = g
            rows.append(m)
        out = pd.DataFrame(rows)
        return out.rename(columns={m: f"{m}_p" for m in _MOMS})

    sums = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key=key, aggs={m: (f"{m}_p", "sum") for m in _MOMS})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: pd.Series(dtype="object"),
                                 "slope": pd.Series(dtype="float64"),
                                 "icept": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        n = df["n"].to_numpy()
        mx = df["sx"].to_numpy() / n
        my = df["sy"].to_numpy() / n
        cov = df["sxy"].to_numpy() - n * mx * my
        vx = df["sxx"].to_numpy() - n * mx * mx
        slope = np.where(vx > 0, cov / np.where(vx > 0, vx, 1.0),
                         np.nan)
        # intercept at RAW x = 0: x̄_raw = x_base + x̄_shifted
        icept = my - slope * (x_base + mx)
        return pd.DataFrame({key: df[key], "slope": slope,
                             "icept": icept,
                             "n": n.astype("int64")})

    return sums.map_batches(finish, batch_format="pandas")


def _pareto_block(df: pd.DataFrame, *, minimize: str,
                  maximize: str) -> pd.DataFrame:
    """Vectorized 2-D skyline of one block: keep rows whose
    (minimize, maximize) pair is not dominated (another row ≤ on
    ``minimize``, ≥ on ``maximize``, strict on at least one). Ties on
    both axes all survive (neither dominates). One sort + one grouped
    cummax — no pairwise comparison."""
    if len(df) == 0:
        return df
    per_lo = (df.groupby(minimize)[maximize].max()
              .sort_index())                      # max hi per lo value
    prev_best = per_lo.cummax().shift(1, fill_value=-np.inf)
    surviving_lo = per_lo[per_lo > prev_best]     # beats all cheaper lo
    keep = (df[minimize].map(surviving_lo).to_numpy()
            == df[maximize].to_numpy())           # NaN != x → dropped
    return df[keep]


def skyline(ds, *, minimize: str, maximize: str):
    """Pareto frontier (skyline) over two columns — SQL
    ``WHERE NOT EXISTS (dominating row)`` without the quadratic
    self-join. Börzsönyi et al., ICDE 2001: the skyline of a union is
    the skyline of the partial skylines, so each block reduces to its
    own (small) frontier in parallel and ONE bounded final task
    re-reduces the concatenated partials — the classic
    combiner-then-reduce shape; the full input never co-locates. The
    final task's input is Σ per-block frontier sizes (tiny on real
    data; worst case anti-correlated axes, still ≪ the input)."""
    parts = ds.map_batches(
        lambda df: _pareto_block(df, minimize=minimize, maximize=maximize),
        batch_format="pandas")
    return parts.repartition(1).map_batches(
        lambda df: _pareto_block(df, minimize=minimize, maximize=maximize),
        batch_format="pandas", batch_size=None)


def chi2_independence(ds, *, a: str, b: str):
    """Pearson χ² test of independence between two categorical columns,
    over the FULL r×c grid (unobserved cells contribute their expected
    mass). One pass of per-block contingency partials (a vectorized
    ``value_counts`` per block — the combiner), one bounded final task
    folds the r×c grid and emits a single (chi2, dof, n) row. The grid
    is vocabulary-sized, never row-sized, so the reduce input is
    #blocks × |observed cells|."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df.value_counts([a, b])
        idx = vc.index.to_frame(index=False)
        return pd.DataFrame({"a": idx[a].astype(str),
                             "b": idx[b].astype(str),
                             "o": vc.to_numpy().astype("int64")})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"chi2": pd.Series(dtype="float64"),
                                 "dof": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        obs = (df.groupby(["a", "b"], sort=True)["o"].sum()
               .unstack(fill_value=0).astype("float64"))
        n = float(obs.to_numpy().sum())
        exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / n
        chi2 = float(((obs.to_numpy() - exp) ** 2 / exp).sum())
        dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
        return pd.DataFrame({"chi2": [chi2], "dof": [dof],
                             "n": [int(n)]})

    return (ds.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=None))


def ks_two_sample(ds, *, value: str, group: str, a, b):
    """Exact two-sample Kolmogorov–Smirnov statistic between groups
    ``a`` and ``b`` of ``value``: ``ks = max_v |F_a(v) − F_b(v)|``.
    The fold is per-VALUE grouped counts (distinct-value-sized, not
    row-sized — one grouped-sum stitch), ECDFs are cumulative sums
    over that bounded table in one final task. The distribution-drift
    screen that complements the binned PSI metric with an exact,
    binning-free answer."""
    from sigraph_ray.stages.collect import sorted_groupby_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[group].isin([a, b])]
        out = pd.DataFrame({
            "v": d[value],
            "c1": (d[group] == a).astype("int64"),
            "c2": (d[group] == b).astype("int64")})
        g = out.groupby("v", sort=False)[["c1", "c2"]].sum().reset_index()
        return g

    counts = sorted_groupby_sum(
        ds.map_batches(partial, batch_format="pandas"),
        key="v", sum_cols={"c1": "c1", "c2": "c2"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ks": pd.Series(dtype="float64"),
                              "n1": pd.Series(dtype="int64"),
                              "n2": pd.Series(dtype="int64")})
        if len(df) == 0:
            return empty
        d = df.sort_values("v")
        n1 = float(d["c1"].sum())
        n2 = float(d["c2"].sum())
        if n1 == 0.0 or n2 == 0.0:
            # one sample absent → no two-sample statistic exists;
            # typed-empty instead of a silent NaN from the 0-division
            return empty
        f1 = d["c1"].to_numpy(np.int64).cumsum() / n1
        f2 = d["c2"].to_numpy(np.int64).cumsum() / n2
        return pd.DataFrame({"ks": [float(np.abs(f1 - f2).max())],
                             "n1": [int(n1)], "n2": [int(n2)]})

    return (counts.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=None))


def gini_coefficient(ds, *, value: str):
    """Exact Gini coefficient of a non-negative column via the
    rank-sum identity ``G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n`` (ties
    contribute x·Σi regardless of tie order, so any stable global
    sort works): ONE range sort, the O(#blocks) row-offset stitch
    assigns global ranks, each block folds (Σ i·x, Σx, n) — three
    scalars — and one bounded task finishes. The concentration /
    inequality screen for source- or host-level skew audits."""
    import pyarrow as pa

    from sigraph_ray.stages.ordering import _global_positions

    two_col = ds.map_batches(
        lambda df: pd.DataFrame({"x": df[value], "x2": df[value]}),
        batch_format="pandas")

    def make_out(t: pa.Table, offset: int) -> pa.Table:
        x = np.asarray(t.column("x").to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        i = np.arange(offset + 1, offset + 1 + len(x), dtype=np.float64)
        return pa.table({"sixi": [float((i * x).sum())],
                         "sx": [float(x.sum())],
                         "n": [float(len(x))]})

    parts = _global_positions(two_col.sort(["x", "x2"]), make_out)
    if parts is None:
        return pd.DataFrame({"gini": pd.Series(dtype="float64"),
                             "n": pd.Series(dtype="int64")})
    g = parts.to_pandas().sum()
    n, sx, sixi = float(g["n"]), float(g["sx"]), float(g["sixi"])
    gini = 2.0 * sixi / (n * sx) - (n + 1.0) / n
    return pd.DataFrame({"gini": [gini], "n": [int(n)]})


def mutual_information(ds, *, a: str, b: str):
    """Mutual information (nats) between two categorical columns —
    the effect-size companion to :func:`chi2_independence`, sharing
    its contingency dataflow (per-block value_counts partials, one
    bounded grid fold): ``I = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))`` over
    observed cells."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df.value_counts([a, b])
        idx = vc.index.to_frame(index=False)
        return pd.DataFrame({"a": idx[a].astype(str),
                             "b": idx[b].astype(str),
                             "o": vc.to_numpy().astype("int64")})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"mi": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        obs = df.groupby(["a", "b"], sort=True)["o"].sum().reset_index()
        n = float(obs["o"].sum())
        pa_ = obs.groupby("a")["o"].transform("sum").to_numpy() / n
        pb_ = obs.groupby("b")["o"].transform("sum").to_numpy() / n
        pxy = obs["o"].to_numpy(np.float64) / n
        mi = float((pxy * np.log(pxy / (pa_ * pb_))).sum())
        return pd.DataFrame({"mi": [mi], "n": [int(n)]})

    return (ds.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=None))
