"""CSV event ingest — the third wire format next to Parquet and JSONL
(S2 coverage: a user replacing the reference's HTTP ingest can land
the same GraphNode records from CSV exports).

CSV has no list or timestamp types, so the two non-scalar EVENTS
columns ride as strings — ``related_rule_ids`` JSON-encoded (lossless:
null vs [] vs values), ``timestamp`` ISO-8601 — and the reader decodes
them before the shared :func:`~sigraph_ray.sources.jsonl.
normalize_events_batch` cast onto the fixed Arrow schema. Scale shape
identical to the other sources: ``ray.data.read_csv`` streams files
block-by-block, decoding is a stateless per-batch map. Tested by the
same round-trip identity as JSONL (graph built from a CSV copy is
byte-identical).
"""

from __future__ import annotations

import json

import pandas as pd

from sigraph_ray.sources.jsonl import normalize_events_batch


def _decode_batch(df: pd.DataFrame):
    out = df.copy()
    for c in out.columns:
        # CSV cannot distinguish null from '': the EVENTS schema has no
        # meaningful empty-string values, so '' decodes to null (the
        # writer emits nulls as empty cells)
        if out[c].dtype == object:
            out[c] = out[c].replace("", None)
    if "related_rule_ids" in out.columns:
        out["related_rule_ids"] = [
            None if v is None or (isinstance(v, float) and v != v)
            else json.loads(v)
            for v in out["related_rule_ids"]]
    return normalize_events_batch(out)


def read_events_csv(path: str):
    """Read CSV GraphNode records → EVENTS-typed Dataset."""
    import ray.data as rd

    return rd.read_csv(path).map_batches(_decode_batch,
                                         batch_format="pandas")


def write_events_csv(events, path: str) -> None:
    """Write an EVENTS-shaped Dataset as CSV (round-trip helper)."""
    import os

    os.makedirs(path, exist_ok=True)
    for i, batch in enumerate(events.iter_batches(batch_format="pandas")):
        b = batch.copy()
        b["timestamp"] = b["timestamp"].map(
            lambda t: None if t is None else pd.Timestamp(t).isoformat())
        b["related_rule_ids"] = b["related_rule_ids"].map(
            lambda v: None if v is None
            or (isinstance(v, float) and v != v)
            else json.dumps(list(v)))
        b.to_csv(os.path.join(path, f"part-{i:05d}.csv"), index=False)
