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
