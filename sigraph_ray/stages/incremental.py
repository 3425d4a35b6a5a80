"""Incremental graph maintenance — merge a delta event stream into the
materialized graph WITHOUT shuffling (or even re-reading) the base.

The reference maintains its graph INCREMENTALLY: every event performs a
point read plus up to six MERGE writes against Neo4j
(reference: element_behavior.py:260-521).  The batch engine's full
rebuild (:mod:`sigraph_ray.stages.provenance_graph`) replaces that for
bulk loads; this stage restores the incremental path for the steady
state — yesterday's materialized tables + today's (comparatively tiny)
delta — without touching the full event history again.

Key design decision: traces (U2) and edges (U3) are persisted in their
MERGEABLE ENCODED STATE — the same ``(k, v[, n])`` encoding the
two-phase builders already use internally: ``v`` is the zero-padded
``(timestamp, span_id)``-ordered arg-min / arg-max payload and ``n`` a
partial count.  min, max and sum are associative and commutative, so

    state(A ∪ B) == merge(state(A), state(B))      (bit-identical)

holds for ANY split of the event stream — the merged graph equals a
full rebuild exactly, which is what the SQL oracle checks.  (U1 node
rows keep first-seen-ORDERED span lists, which are NOT mergeable from
decoded output; their incremental path re-derives touched keys from
the base events behind a manifest key probe — out of scope here.)

Scale shape (the point of the exercise):

- the delta is aggregated FIRST (per-batch combiner + one tiny stitch),
  so what gets broadcast is one row per touched key, not raw events;
- the base streams through ONE ``map_batches`` pass that patches
  touched keys vectorized (indexed lookup against the broadcast frame)
  and passes untouched rows through zero-copy — NO shuffle over the
  base, nothing base-sized ever on the driver;
- keys present only in the delta are appended from the broadcast frame
  (one pruned scan of the merged key column finds the matched set);
- on a partitioned on-disk base the touched-key probe pushes into the
  partition manifest (:mod:`sigraph_ray.state.manifest`), so untouched
  partitions are never read, let alone rewritten.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from sigraph_ray.functions.hashing import md5_hex


def split_base_delta(parsed_valid, *, key: str = "span_id",
                     delta_nibble: int = 0):
    """Deterministic base/delta split of a parsed event stream: a row
    lands in the delta iff the first hex nibble of ``md5(str(key))``
    equals ``delta_nibble`` (≈ 1/16 of rows) — a pure function of row
    content, so both halves are stable across block layouts and
    re-runs (same contract as stages/sample)."""
    def part(want_delta: bool):
        def f(batch):
            import pyarrow as pa

            if batch.num_rows == 0:
                return batch
            keys = [str(v) for v in batch.column(key).to_pylist()]
            nib = np.fromiter((int(h[0], 16) for h in md5_hex(keys)),
                              dtype=np.int64, count=batch.num_rows)
            m = nib == delta_nibble
            return batch.filter(pa.array(m if want_delta else ~m))
        return parsed_valid.map_batches(f, batch_format="pyarrow")

    return part(False), part(True)


def trace_state(parsed_valid):
    """U2 mergeable state ``(k, v, span_count)`` — the encoded arg-min
    payload per (unit, trace) plus the span count.  This is exactly the
    intermediate :func:`provenance_graph.build_traces` aggregates; kept
    encoded it becomes the persistable incremental-merge artifact."""
    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.provenance_graph import _trace_partials

    partials = parsed_valid.map_batches(_trace_partials,
                                        batch_format="pyarrow")
    return sorted_groupby_agg(partials, key="k",
                              aggs={"v": ("v", "min"),
                                    "span_count": ("n", "sum")})


def edge_state(parsed_valid):
    """U3 mergeable state ``(k, v)`` — the encoded last-writer
    (arg-max) payload per (src, type, dst)."""
    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.provenance_graph import _edge_partials

    partials = parsed_valid.map_batches(_edge_partials,
                                        batch_format="pyarrow")
    return sorted_groupby_agg(partials, key="k",
                              aggs={"v": ("v", "max")})


def decode_trace_state(state):
    from sigraph_ray.stages.provenance_graph import _trace_decode

    return state.map_batches(_trace_decode, batch_format="pyarrow")


def decode_edge_state(state):
    from sigraph_ray.stages.provenance_graph import _edge_decode

    return state.map_batches(_edge_decode, batch_format="pyarrow")


def merge_state(base_state, delta_state, *, mode: str,
                count_cols: tuple[str, ...] = ()):
    """Merge a (small, keyed) delta state into a (large) base state.

    ``mode`` is ``"min"`` (trace arg-min), ``"max"`` (edge arg-max) or
    ``"sum"`` (pure grouped count, e.g. the KG edge-weight table — no
    ``v`` payload, ``count_cols`` only); every column in ``count_cols``
    is summed.  The delta is collected to one pandas frame (one row per
    touched key — the broadcast assumption; a delta beyond driver
    memory would take the sorted-merge-join tier instead) and shipped
    once via ``ray.put``; the base streams through a single vectorized
    patch pass.
    """
    if mode not in ("min", "max", "sum"):
        raise ValueError(f"mode must be min, max or sum, got {mode!r}")
    if mode == "sum" and not count_cols:
        raise ValueError("sum mode needs at least one count column")
    delta_df = delta_state.to_pandas()
    if len(delta_df) == 0:
        return base_state
    delta_df = delta_df.set_index("k")
    ref = ray.put(delta_df)

    def patch(df: pd.DataFrame) -> pd.DataFrame:
        delta = ray.get(ref)
        if len(df) == 0:
            out = df.copy()
            out["_hit"] = pd.Series(dtype=bool)
            return out
        hit = df["k"].isin(delta.index).to_numpy()
        out = df.copy()
        out["_hit"] = hit
        if hit.any():
            sub = delta.loc[out.loc[hit, "k"]]
            if mode != "sum":
                bv = out.loc[hit, "v"].to_numpy()
                dv = sub["v"].to_numpy()
                keep_base = (bv <= dv) if mode == "min" else (bv >= dv)
                out.loc[hit, "v"] = np.where(keep_base, bv, dv)
            for c in count_cols:
                out.loc[hit, c] = (out.loc[hit, c].to_numpy()
                                   + sub[c].to_numpy())
        return out

    merged = base_state.map_batches(patch,
                                    batch_format="pandas").materialize()

    # keys present only in the delta: one key-column-pruned scan of the
    # merged state finds the matched set (on a partitioned base this
    # probe is answered by the partition manifest instead).
    matched = (merged.select_columns(["k", "_hit"])
               .filter(expr="_hit == True").to_pandas()["k"])
    missing = delta_df.drop(index=matched, errors="ignore").reset_index()
    out = merged.drop_columns(["_hit"])
    if len(missing):
        import ray.data as rd

        head = ("k",) if mode == "sum" else ("k", "v")
        cols = [c for c in (*head, *count_cols)]
        out = out.union(rd.from_pandas(missing[cols]))
    return out


def merge_trace_delta(base_state, delta_events):
    """Incrementally maintained trace table: aggregate the delta events
    and merge (min payload, summed span counts) into the base state."""
    return merge_state(base_state, trace_state(delta_events),
                       mode="min", count_cols=("span_count",))


def merge_edge_delta(base_state, delta_events):
    """Incrementally maintained edge table: last-writer-wins arg-max
    merged into the base state."""
    return merge_state(base_state, edge_state(delta_events), mode="max")


def merge_kg_edge_delta(base_state, delta_state):
    """Incrementally maintained KG edge table.  The flagship's edge
    aggregate (pipelines/kg.build_kg_edges) is a pure grouped SUM of
    mention counts per edge key — associative and commutative — so the
    merged state equals a full rebuild over base ∪ delta bit-exactly
    for ANY corpus split: yesterday's materialized KG plus today's
    crawl delta, never re-reading the base corpus.  Both arguments are
    ``(k, weight)`` states (the base typically read back from its
    persisted parquet); the delta broadcasts, the base streams through
    one vectorized patch pass (reference analog: the per-event MERGE
    ... ON MATCH SET weight = weight + 1 steady state,
    element_behavior.py:260-521)."""
    return merge_state(base_state, delta_state, mode="sum",
                       count_cols=("weight",))
