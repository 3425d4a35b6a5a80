"""Fixed Arrow schemas for every table the engine reads or writes.

The reference's OpenSearch side is dynamic-with-templates
(src/db/db_model.py:12-109) and its graph side is
constraint-enforced-at-startup (schema.py:11-21); a batch engine
declares everything once (SURVEY.md §2.1 S4): no runtime DDL, and
uniqueness is asserted post-groupby (:func:`~sigraph_ray.stages.
provenance_graph.validate_graph`).
"""

from __future__ import annotations

import pyarrow as pa

# Input: Common-Crawl-style pages (BASELINE.json input_hint).
PAGES = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

# Input: provenance events (mirror of GraphNode, graph_model.py:14-46).
EVENTS = pa.schema([
    ("trace_id", pa.string()),
    ("span_id", pa.string()),
    ("unit_id", pa.string()),
    ("system_provenance", pa.string()),
    ("timestamp", pa.timestamp("us")),
    ("weight", pa.int64()),
    ("process_name", pa.string()),
    ("related_rule_ids", pa.list_(pa.string())),
    ("parent_span_id", pa.string()),
    ("parent_system_provenance", pa.string()),
])

# Graph outputs (element.py:13-230 property sets).
NODES = pa.schema([
    ("artifact", pa.string()),        # PK (uniqueness asserted)
    ("artifact_type", pa.string()),   # label
    ("image", pa.string()),
    ("related_span_ids", pa.list_(pa.string())),
    ("related_trace_ids", pa.list_(pa.string())),
])
EDGES = pa.schema([
    ("src", pa.string()),
    ("dst", pa.string()),
    ("type", pa.string()),
    ("start_time", pa.timestamp("us")),
    ("weight", pa.int64()),
])
TRACES = pa.schema([
    ("unit_id", pa.string()),
    ("trace_id", pa.string()),        # PK with unit_id
    ("start_time", pa.timestamp("us")),
    ("representative_process_name", pa.string()),
    ("span_count", pa.int64()),
])
CONTAINS = pa.schema([
    ("unit_id", pa.string()),
    ("trace_id", pa.string()),
    ("artifact", pa.string()),
])
MATCHES = pa.schema([
    ("rule_id", pa.string()),
    ("artifact", pa.string()),
])

# KG outputs (pipelines/kg.py).
TRIPLES = pa.schema([
    ("doc_url", pa.string()),
    ("chunk_id", pa.int64()),
    ("ord", pa.int64()),
    ("subj", pa.string()),
    ("subj_is_generic", pa.bool_()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_type", pa.string()),
    ("obj_type", pa.string()),
])
ENTITIES = pa.schema([
    ("entity", pa.string()),
    ("entity_type", pa.string()),
    ("n_mentions", pa.int64()),
])
