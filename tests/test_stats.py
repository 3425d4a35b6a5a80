"""Moment-sum statistics (stages/stats): correlation and grouped OLS
vs numpy reference, layout invariance, and the shift-safety of the
x_base trick."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from sigraph_ray.stages.stats import column_corr, grouped_linreg


def _data(n=300, seed=9):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1e6, n) + 1.7e9      # epoch-seconds scale
    g = rng.choice(["a", "b", "c"], n)
    slope = {"a": 2.5e-6, "b": -4e-6, "c": 0.0}
    y = np.array([slope[gi] for gi in g]) * x + rng.normal(0, 1, n)
    return pd.DataFrame({"g": g, "x": x, "y": y})


def test_column_corr_matches_numpy(ray_session):
    df = _data()
    for parts in (1, 6):
        got = column_corr(rd.from_pandas(df).repartition(parts),
                          x="x", y="y", x_base=1.7e9)
        want = np.corrcoef(df["x"], df["y"])[0, 1]
        assert abs(float(got["corr_xy"][0]) - want) < 1e-9
        assert int(got["n"][0]) == len(df)


def test_grouped_linreg_matches_polyfit(ray_session):
    df = _data()
    got = (grouped_linreg(rd.from_pandas(df).repartition(5),
                          key="g", x="x", y="y", x_base=1.7e9)
           .to_pandas().set_index("g").sort_index())
    for g in "abc":
        sub = df[df["g"] == g]
        sl, ic = np.polyfit(sub["x"], sub["y"], 1)
        assert abs(got.loc[g, "slope"] - sl) < 1e-12
        assert abs(got.loc[g, "icept"] - ic) < 1e-3  # raw-origin extrap
        assert got.loc[g, "n"] == len(sub)
