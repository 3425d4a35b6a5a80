"""Upsert compaction — last-writer-wins MERGE of an updates stream
into a base table, as one batch pass.

This is the engine-level generalization of the reference's per-event
Neo4j ``MERGE`` (src/graph/graph_element/element_behavior.py:321-354:
read-modify-write per key, arrival order decides) and of this repo's
U3 edge aggregate: the "have I seen this key" index disappears into a
single grouped arg-max over ``(base ∪ updates)`` keyed on a version
column — the same architectural inversion SURVEY.md names, applied to
any table. ONE wide op total (the grouped-top-k stitch's range sort);
a per-batch combiner first bounds every key to ≤ one candidate row per
block, so Zipf-hot keys cost blocks, not rows.

Determinism: the winner is max ``(version, origin)`` per key — origin
breaks exact version ties in favor of the UPDATES side (an upsert with
the same version as base replaces it, matching MERGE semantics).
Callers should keep ``(key, version)`` unique within each side, as a
MERGE stream is; further ties pick one row but which is
layout-dependent.
"""

from __future__ import annotations

import pandas as pd

_SEP = "\x1f"


def compact_upserts(base, updates, *, key, version: str,
                    tombstone: str | None = None):
    """Return one row per key: the base row unless ``updates`` carries
    an equal-or-newer ``version`` for it. ``key`` is a column name or
    list of names; both inputs must share the schema.

    ``tombstone`` names an optional boolean column: when the WINNING
    row for a key has it true, the key is deleted from the output
    entirely (CDC delete semantics — a tombstone only wins by the same
    version rule, so a newer upsert resurrects the key). The filter
    runs after the arg-max, so deletes cost nothing extra."""
    keys = [key] if isinstance(key, str) else list(key)

    from sigraph_ray.stages.collect import sorted_grouped_topk

    def tag(origin: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df.assign(_origin=pd.Series(dtype="int64"),
                                 _ckey=pd.Series(dtype="object"))
            out = df.copy()
            out["_origin"] = origin
            ck = out[keys[0]].astype(str)
            for k in keys[1:]:
                ck = ck + _SEP + out[k].astype(str)
            out["_ckey"] = ck
            # per-batch combiner: ≤ one candidate per key per block
            out = out.sort_values(["_ckey", version, "_origin"],
                                  kind="stable")
            return out.groupby("_ckey", sort=False).tail(1)
        return f

    both = (base.map_batches(tag(0), batch_format="pandas")
            .union(updates.map_batches(tag(1), batch_format="pandas")))
    top = sorted_grouped_topk(both, key="_ckey",
                              order_by=[version, "_origin"],
                              descending=[True, True], k=1)
    drop = {"rank", "_origin", "_ckey"}
    if tombstone is not None:
        drop.add(tombstone)
        return top.map_batches(
            lambda df: df[~df[tombstone].fillna(False).astype(bool)]
            [[c for c in df.columns if c not in drop]],
            batch_format="pandas")
    return top.map_batches(
        lambda df: df[[c for c in df.columns if c not in drop]],
        batch_format="pandas")
