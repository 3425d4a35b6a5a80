"""JSONL event ingest — the reference's actual wire format, batched.

The reference ingests one ``GraphNode`` JSON body per HTTP POST
(src/app/backend/v1/api.py:149-155, schema at
src/graph/graph_model.py:14-46); the batch engine's equivalent source
is newline-delimited JSON files of the same records, read with
``ray.data.read_json`` and normalized onto the fixed ``schemas.EVENTS``
Arrow schema (S4's dynamic-mapping inversion: one declared schema, no
runtime DDL; absent optional fields become typed nulls, ISO-8601
timestamp strings become ``timestamp[us]``).

Scale shape: ``read_json`` streams files block-by-block like any other
source; normalization is a stateless per-batch cast. Tested by
round-trip: the provenance graph built from a JSONL copy of an event
stream is byte-identical to the one built from the Arrow stream
(tests/test_provenance_graph.py::test_jsonl_roundtrip_graph_identical).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from sigraph_ray import schemas


def normalize_events_batch(df: pd.DataFrame) -> pa.Table:
    """Pandas batch of parsed JSON records → typed EVENTS table.
    Missing optional columns materialize as typed nulls; timestamps
    accept ISO-8601 strings or epoch values."""
    cols = {}
    for field in schemas.EVENTS:
        name = field.name
        if name not in df.columns:
            cols[name] = pa.nulls(len(df), field.type)
            continue
        s = df[name]
        if pa.types.is_timestamp(field.type):
            s = pd.to_datetime(s, utc=False, format="ISO8601")
            cols[name] = pa.Array.from_pandas(s).cast(field.type)
        elif pa.types.is_list(field.type):
            vals = [v if isinstance(v, list) else
                    (None if v is None or v != v else list(v))
                    for v in s]
            cols[name] = pa.array(vals, field.type)
        else:
            cols[name] = pa.Array.from_pandas(s).cast(field.type)
    return pa.table(cols).cast(schemas.EVENTS)


def read_events_jsonl(path: str):
    """Read newline-delimited GraphNode records → EVENTS-typed
    Dataset."""
    import ray.data as rd

    return rd.read_json(path).map_batches(normalize_events_batch,
                                          batch_format="pandas")


def write_events_jsonl(events, path: str) -> None:
    """Write an EVENTS-shaped Dataset as JSONL (test/round-trip
    helper; timestamps serialize as ISO-8601)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    for i, batch in enumerate(events.iter_batches(batch_format="pandas")):
        with open(os.path.join(path, f"part-{i:05d}.jsonl"), "w") as f:
            for rec in batch.to_dict(orient="records"):
                ts = rec.get("timestamp")
                if ts is not None and not isinstance(ts, str):
                    rec["timestamp"] = pd.Timestamp(ts).isoformat()
                rules = rec.get("related_rule_ids")
                if rules is not None and not isinstance(rules, list):
                    rec["related_rule_ids"] = (
                        None if isinstance(rules, float) else list(rules))
                f.write(json.dumps(rec, default=str) + "\n")
