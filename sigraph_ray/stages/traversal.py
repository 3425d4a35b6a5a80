"""Graph traversals (the reference's "wide" read queries, SURVEY.md §2.6).

- G2 related traces: undirected variable-length paths ``t1 -[*1..k]- t2``
  between Trace nodes of the same unit
  (src/graph/graph_element/schema.py:89-110, driver
  element_behavior.py:559-603, default max_hop=5). The Neo4j query walks
  ANY relationship type, so the adjacency here is the union of action
  edges (src↔dst), CONTAINS (trace↔artifact) and MATCHES
  (rule↔artifact). Output pairs are deduplicated with the reference's
  ``elementId(t1) < elementId(t2)`` ordering trick rendered
  deterministic as ``t1 < t2`` lexicographic (same-unit pairs only).

- G3 provenance subgraph export (schema.py:127-152): bounded-hop
  forward expansion from a trace's contained nodes with the reference's
  filters (not both endpoints PROCESS, source not MODULE, destination
  contained in the same trace), flattened to unique node/edge lists.

Execution model: seeds are processed distributedly (``map_batches`` over
the trace table); the aggregated graph adjacency is BROADCAST once via
``ray.put`` and BFS runs vectorized-per-seed inside each batch. The
node/edge tables are post-aggregation outputs, orders of magnitude
smaller than the event stream; the assumption "adjacency fits one
worker" is the same one the reference makes of its Neo4j instance. The
iterative frontier-join formulation (no broadcast) is the documented
fallback for graphs beyond single-worker memory (SURVEY.md §4.2).
"""

from __future__ import annotations

from collections import deque

import pandas as pd
import pyarrow as pa


def _build_adjacency(graph: dict) -> dict[str, list[str]]:
    """Driver-side adjacency dict over node keys. Trace nodes are keyed
    ``trace:<unit>:<trace_id>``, rule nodes ``rule:<rule_id>``,
    artifact nodes by their artifact key."""
    adj: dict[str, list[str]] = {}

    def add(u: str, v: str) -> None:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)

    for df in graph["edges"].iter_batches(batch_format="pandas"):
        for s, d in zip(df["src"], df["dst"]):
            add(s, d)
    for df in graph["contains"].iter_batches(batch_format="pandas"):
        for u, t, a in zip(df["unit_id"], df["trace_id"], df["artifact"]):
            add(f"trace:{u}:{t}", a)
    for df in graph["matches"].iter_batches(batch_format="pandas"):
        for r, a in zip(df["rule_id"], df["artifact"]):
            add(f"rule:{r}", a)
    return adj


class _RelatedTraces:
    """Batch kernel: BFS (≤ max_hop edges) from each seed trace over the
    broadcast adjacency; emits same-unit trace pairs."""

    def __init__(self, adj_ref, max_hop: int):
        import ray

        self.adj = ray.get(adj_ref)
        self.max_hop = max_hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_u, out_a, out_b, out_h = [], [], [], []
        units = batch.column("unit_id").to_pylist()
        tids = batch.column("trace_id").to_pylist()
        for unit, tid in zip(units, tids):
            start = f"trace:{unit}:{tid}"
            if start not in self.adj:
                continue
            dist = {start: 0}
            q = deque([start])
            while q:
                cur = q.popleft()
                d = dist[cur]
                if d >= self.max_hop:
                    continue
                for nxt in self.adj.get(cur, ()):
                    if nxt not in dist:
                        dist[nxt] = d + 1
                        q.append(nxt)
            prefix = f"trace:{unit}:"
            for node, d in dist.items():
                if d == 0 or not node.startswith(prefix):
                    continue
                other = node[len(prefix):]
                # elementId ordering trick → lexicographic, dedup half
                if tid < other:
                    out_u.append(unit)
                    out_a.append(tid)
                    out_b.append(other)
                    out_h.append(d)
        return pa.table({
            "unit_id": pa.array(out_u, pa.string()),
            "trace_a": pa.array(out_a, pa.string()),
            "trace_b": pa.array(out_b, pa.string()),
            "hops": pa.array(out_h, pa.int64()),
        })


def related_traces(graph: dict, *, max_hop: int = 5):
    """G2 — Dataset of (unit_id, trace_a, trace_b, hops) with
    trace_a < trace_b and hops = shortest undirected path ≤ max_hop."""
    import ray

    adj_ref = ray.put(_build_adjacency(graph))
    return graph["traces"].map_batches(
        _RelatedTraces, batch_format="pyarrow",
        fn_constructor_kwargs={"adj_ref": adj_ref, "max_hop": max_hop},
        concurrency=2)


class _Subgraph:
    """G3 batch kernel: forward expansion src→dst over directed action
    edges from each trace's contained nodes, with the reference's
    filters (schema.py:141-144)."""

    def __init__(self, fwd_ref, contained_ref, types_ref, max_hop: int):
        import ray

        self.fwd = ray.get(fwd_ref)            # src -> [(dst, type)]
        self.contained = ray.get(contained_ref)  # (unit,trace) -> set
        self.types = ray.get(types_ref)        # artifact -> type
        self.max_hop = max_hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        units = batch.column("unit_id").to_pylist()
        tids = batch.column("trace_id").to_pylist()
        for unit, tid in zip(units, tids):
            members = self.contained.get((unit, tid), set())
            seen_edges = set()
            for src in sorted(members):
                if self.types.get(src) == "MODULE":
                    continue  # src not MODULE (schema.py:143)
                frontier = {src}
                for _ in range(self.max_hop):
                    nxt = set()
                    for u in frontier:
                        for (v, etype) in self.fwd.get(u, ()):
                            both_proc = (self.types.get(u) == "PROCESS"
                                         and self.types.get(v) == "PROCESS")
                            if both_proc:
                                continue  # not both endpoints PROCESS
                            if v not in members:
                                continue  # dst contained in same trace
                            if (u, etype, v) not in seen_edges:
                                seen_edges.add((u, etype, v))
                                nxt.add(v)
                    frontier = nxt
                    if not frontier:
                        break
            for (u, etype, v) in sorted(seen_edges):
                rows.append({"unit_id": unit, "trace_id": tid,
                             "src": u, "type": etype, "dst": v})
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("unit_id", pa.string()), ("trace_id", pa.string()),
            ("src", pa.string()), ("type", pa.string()),
            ("dst", pa.string())]))


def provenance_subgraph(graph: dict, *, max_hop: int = 5):
    """G3 — unique directed edges of each trace's provenance subgraph
    (the reference flattens paths to unique node/edge lists,
    element_behavior.py:639-699; we emit the edge list, node list =
    its distinct endpoints)."""
    import ray

    fwd: dict[str, list] = {}
    for df in graph["edges"].iter_batches(batch_format="pandas"):
        for s, d, t in zip(df["src"], df["dst"], df["type"]):
            fwd.setdefault(s, []).append((d, t))
    contained: dict[tuple, set] = {}
    for df in graph["contains"].iter_batches(batch_format="pandas"):
        for u, t, a in zip(df["unit_id"], df["trace_id"], df["artifact"]):
            contained.setdefault((u, t), set()).add(a)
    types: dict[str, str] = {}
    for df in graph["nodes"].iter_batches(batch_format="pandas"):
        for a, at in zip(df["artifact"], df["artifact_type"]):
            types[a] = at
    return graph["traces"].map_batches(
        _Subgraph, batch_format="pyarrow",
        fn_constructor_kwargs={
            "fwd_ref": ray.put(fwd), "contained_ref": ray.put(contained),
            "types_ref": ray.put(types), "max_hop": max_hop},
        concurrency=2)


def drift_trace_set(graph: dict, unit_id: str, trace_id: str,
                    *, max_hop: int = 5) -> set[str]:
    """The trace set of a drift query: the seed trace plus every
    same-unit trace within ``max_hop`` undirected hops (J6,
    src/app/backend/v1/api.py:177-208 unions the seed's syslog sequence
    with the sequences of all graph-related traces)."""
    adj = _build_adjacency(graph)
    start = f"trace:{unit_id}:{trace_id}"
    out = {trace_id}
    if start not in adj:
        return out
    dist = {start: 0}
    frontier = [start]
    for d in range(max_hop):
        nxt = []
        for cur in frontier:
            for n in adj.get(cur, ()):
                if n not in dist:
                    dist[n] = d + 1
                    nxt.append(n)
        frontier = nxt
    prefix = f"trace:{unit_id}:"
    out |= {n[len(prefix):] for n in dist if n.startswith(prefix)}
    return out


def drift_sequence(graph: dict, docs, unit_id: str, trace_id: str,
                   *, max_hop: int = 5, sort_cols=("timestamp", "span_id")):
    """J6 — union of the seed trace's document sequence with the
    sequences of all graph-related traces, re-sorted by timestamp
    (api.py:177-208 + O2 final sort, db_session.py:211-214). ``docs``
    is any Dataset with unit_id/trace_id plus the sort columns; the
    trace set is broadcast (semi-join, no shuffle)."""
    import ray

    traces = drift_trace_set(graph, unit_id, trace_id, max_hop=max_hop)
    ref = ray.put(traces)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ts = ray.get(ref)
        return df[(df["unit_id"] == unit_id) & df["trace_id"].isin(ts)]

    return docs.map_batches(f, batch_format="pandas").sort(list(sort_cols))
