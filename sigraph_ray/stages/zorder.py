"""Z-order (Morton) clustering keys — the multi-dimensional file-layout
technique (public; Morton 1966, used by every lakehouse engine): rows
sorted by the bit-interleave of two normalized dimensions cluster so a
range predicate on EITHER dimension touches a bounded fraction of
files, instead of all files the way a single-column sort leaves the
second dimension scattered.

Engine shape: computing the key is a stateless vectorized
``map_batches`` (pure uint64 bit math, zero-copy in/out); the one wide
op is the final ``sort(zkey)`` any clustering rewrite pays. Dimension
normalization is quantile-free here (fixed-point scaling against
caller-provided bounds) so the key is a pure per-row function —
reproducible in SQL bit arithmetic, layout- and cluster-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BITS = 16  # per dimension; 2×16 interleave → 32-bit Morton key


def _scale(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Fixed-point scale to [0, 2^BITS) — clipped, monotonic."""
    span = max(hi - lo, 1e-300)
    x = np.clip((v.astype(np.float64) - lo) / span, 0.0, 1.0)
    return np.minimum((x * (1 << BITS)).astype(np.uint64),
                      np.uint64((1 << BITS) - 1))


def morton_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave two BITS-bit integers: bit i of ``a`` lands at 2i,
    of ``b`` at 2i+1."""
    out = np.zeros(len(a), dtype=np.uint64)
    for i in range(BITS):
        out |= ((a >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
        out |= ((b >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i + 1)
    return out


def zorder_key(ds, *, cols: tuple[str, str],
               bounds: tuple[tuple[float, float], tuple[float, float]],
               out_col: str = "zkey"):
    """Append the Morton key of ``cols`` (scaled against ``bounds``)."""
    (alo, ahi), (blo, bhi) = bounds
    ca, cb = cols

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[out_col] = morton_key(
            _scale(df[ca].to_numpy(), alo, ahi),
            _scale(df[cb].to_numpy(), blo, bhi)).astype("int64")
        return out

    return ds.map_batches(f, batch_format="pandas")


def zorder_sort(ds, *, cols, bounds, out_col: str = "zkey"):
    """Cluster ``ds`` by the Morton key (the layout rewrite)."""
    return zorder_key(ds, cols=cols, bounds=bounds,
                      out_col=out_col).sort(out_col)


def zorder_sql_expr(col_a: str, col_b: str,
                    bounds: tuple[tuple[float, float],
                                  tuple[float, float]]) -> str:
    """DuckDB expression computing the SAME key (generated, like the
    lang-ID oracle, so Ray and SQL can never drift)."""
    (alo, ahi), (blo, bhi) = bounds
    top = (1 << BITS) - 1

    def scaled(col, lo, hi):
        span = max(hi - lo, 1e-300)
        return (f"least(CAST(floor(least(greatest((CAST({col} AS DOUBLE)"
                f" - {lo!r}) / {span!r}, 0.0), 1.0) * {1 << BITS}) AS"
                f" BIGINT), {top})")

    sa, sb = scaled(col_a, alo, ahi), scaled(col_b, blo, bhi)
    # fully parenthesized: SQL's << binds LOOSER than +, so an
    # unwrapped `a << n + b` parses as `a << (n + b)`
    terms = []
    for i in range(BITS):
        terms.append(f"((({sa} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({sb} >> {i}) & 1) << {2 * i + 1})")
    return "(" + "\n + ".join(terms) + ")"
