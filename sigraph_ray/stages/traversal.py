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

- G3 provenance subgraph export (schema.py:127-152 QUERY_ALL_PROVENANCE):
  directed paths ``(src)-[*1..k]->(dst)`` over action edges where the
  filters constrain only the PATH ENDPOINTS — src contained in the
  trace and not MODULE, dst contained in the trace, NOT (src PROCESS
  AND dst PROCESS). Intermediate nodes need not be contained and
  PROCESS→PROCESS hops are allowed mid-path. An edge is exported iff it
  lies on some qualifying path, decided via forward/backward BFS
  distances split by endpoint PROCESS-ness:
  ``min over allowed (srcclass,dstclass): dfwd[class](a) + 1 +
  dbwd[class](b) <= k`` for edge a→b. (Deviation note: Cypher forbids
  repeating a relationship within one path; the distance formulation
  ignores that, which is equivalence on cycle-free provenance graphs
  and a superset only on cycles shorter than ``k``.)

Execution model — TWO tiers behind one API (``mode="auto"``):

- **actor-index tier** (relationship rows ≤ ``actor_index_max_rows``):
  seed traces are processed distributedly (``map_batches`` over the
  trace table with an ACTOR-POOL kernel); each actor builds its
  adjacency index ONCE in ``__init__`` from the materialized
  relationship tables' object-store block refs — the brief's "stateful
  stage holding a shared index" pattern. The driver never iterates
  rows; it only ships block references. The index-per-actor assumption
  ("post-aggregation graph fits one worker") is the same one the
  reference makes of its Neo4j instance.
- **frontier-join tier** (:mod:`sigraph_ray.stages.frontier`): past the
  threshold the BFS runs as iterative ``safe_join`` + min-dist groupby
  rounds over the full cluster — no single-worker index anywhere.
  Both tiers produce identical output (tests force the distributed
  path with ``actor_index_max_rows=0`` and compare).
"""

from __future__ import annotations

from collections import deque

import pandas as pd
import pyarrow as pa

#: above this many relationship rows (edges + contains + matches) the
#: auto tier switches to frontier joins. ~5M rows ≈ low-single-GB as a
#: Python dict-of-lists index per actor — comfortably inside one
#: worker; past it the index build dominates and heap risk grows.
DEFAULT_ACTOR_INDEX_MAX_ROWS = 5_000_000


def _artifact_type(key: str) -> str:
    """M6 label derivation — type = final @-token of the node key."""
    return key.rsplit("@", 1)[-1]


def materialize_rels(graph: dict) -> dict:
    """Pin the (post-aggregation, small-relative-to-events)
    relationship tables in the object store — consumed by BOTH tiers
    (block refs for the actor index; join inputs for frontier)."""
    return {name: graph[name].materialize()
            for name in ("edges", "contains", "matches")}


def _use_actor_tier(rels: dict, mode: str, max_rows: int) -> bool:
    if mode == "actor":
        return True
    if mode == "distributed":
        return False
    if mode != "auto":
        raise ValueError(f"mode must be auto|actor|distributed: {mode!r}")
    return sum(ds.count() for ds in rels.values()) <= max_rows


def graph_table_refs(graph_or_rels: dict) -> dict:
    """Object-store block refs of the materialized relationship tables —
    the payload shipped to traversal actors. No rows touch the driver.
    Accepts either a graph dict (lazy tables) or a ``materialize_rels``
    output."""
    out = {}
    for name in ("edges", "contains", "matches"):
        ds = graph_or_rels[name].materialize()
        out[name] = list(ds.to_arrow_refs())
    return out


def _fetch_tables(refs: list) -> list[pa.Table]:
    import ray

    return [t for t in ray.get(list(refs)) if t.num_rows]


class _AdjacencyIndex:
    """Per-actor adjacency over node keys: trace nodes keyed
    ``trace:<unit>:<trace_id>``, rule nodes ``rule:<rule_id>``,
    artifacts by artifact key. Built once per actor from Arrow blocks
    (zero-copy reads from the object store)."""

    def __init__(self, refs: dict):
        frames = []
        for t in _fetch_tables(refs["edges"]):
            df = t.select(["src", "dst"]).to_pandas()
            frames.append(pd.DataFrame({"u": df["src"], "v": df["dst"]}))
        for t in _fetch_tables(refs["contains"]):
            df = t.to_pandas()
            tk = "trace:" + df["unit_id"].astype(str) + ":" \
                 + df["trace_id"].astype(str)
            frames.append(pd.DataFrame({"u": tk, "v": df["artifact"]}))
        for t in _fetch_tables(refs["matches"]):
            df = t.to_pandas()
            frames.append(pd.DataFrame({
                "u": "rule:" + df["rule_id"].astype(str),
                "v": df["artifact"]}))
        if frames:
            und = pd.concat(frames, ignore_index=True)
            both = pd.concat(
                [und, und.rename(columns={"u": "v", "v": "u"})],
                ignore_index=True)
            # one vectorized groupby, not a per-edge Python append loop
            self.adj = both.groupby("u", sort=False)["v"].agg(list).to_dict()
        else:
            self.adj = {}

    def bfs(self, start: str, max_hop: int) -> dict[str, int]:
        if start not in self.adj:
            return {}
        dist = {start: 0}
        q = deque([start])
        while q:
            cur = q.popleft()
            d = dist[cur]
            if d >= max_hop:
                continue
            for nxt in self.adj.get(cur, ()):
                if nxt not in dist:
                    dist[nxt] = d + 1
                    q.append(nxt)
        return dist


class _RelatedTraces:
    """Batch kernel: BFS (≤ max_hop edges) from each seed trace over the
    actor-built adjacency; emits same-unit trace pairs."""

    def __init__(self, refs: dict, max_hop: int):
        self.index = _AdjacencyIndex(refs)
        self.max_hop = max_hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_u, out_a, out_b, out_h = [], [], [], []
        units = batch.column("unit_id").to_pylist()
        tids = batch.column("trace_id").to_pylist()
        for unit, tid in zip(units, tids):
            dist = self.index.bfs(f"trace:{unit}:{tid}", self.max_hop)
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


def related_traces(graph: dict, *, max_hop: int = 5, concurrency: int = 2,
                   mode: str = "auto",
                   actor_index_max_rows: int = DEFAULT_ACTOR_INDEX_MAX_ROWS,
                   num_partitions: int = 8):
    """G2 — Dataset of (unit_id, trace_a, trace_b, hops) with
    trace_a < trace_b and hops = shortest undirected path ≤ max_hop.
    Tier picked per the module docstring (``mode`` forces one)."""
    from sigraph_ray.stages import frontier as F

    rels = materialize_rels(graph)
    if _use_actor_tier(rels, mode, actor_index_max_rows):
        refs = graph_table_refs(rels)
        return graph["traces"].map_batches(
            _RelatedTraces, batch_format="pyarrow",
            fn_constructor_kwargs={"refs": refs, "max_hop": max_hop},
            concurrency=concurrency)
    return F.related_traces_distributed(
        rels, graph["traces"], max_hop=max_hop,
        num_partitions=num_partitions)


class _Subgraph:
    """G3 batch kernel (QUERY_ALL_PROVENANCE, schema.py:127-152).

    Per trace: forward BFS over directed action edges from the
    contained non-MODULE sources (split into PROCESS / non-PROCESS
    classes) and backward BFS from the contained destinations (same
    split); edge a→b is exported iff some allowed class pair gives
    ``dfwd(a) + 1 + dbwd(b) <= max_hop`` — endpoint-only filters, as
    the Cypher query specifies (intermediates unrestricted)."""

    def __init__(self, refs: dict, max_hop: int):
        e_frames = [t.select(["src", "type", "dst"]).to_pandas()
                    for t in _fetch_tables(refs["edges"])]
        if e_frames:
            edf = pd.concat(e_frames, ignore_index=True).drop_duplicates()
            self.fwd = edf.groupby("src", sort=False)["dst"] \
                          .agg(list).to_dict()
            self.bwd = edf.groupby("dst", sort=False)["src"] \
                          .agg(list).to_dict()
            self.edges = sorted(
                map(tuple, edf[["src", "type", "dst"]].to_numpy()))
        else:
            self.fwd, self.bwd, self.edges = {}, {}, []
        c_frames = [t.select(["unit_id", "trace_id", "artifact"]).to_pandas()
                    for t in _fetch_tables(refs["contains"])]
        if c_frames:
            cdf = pd.concat(c_frames, ignore_index=True)
            self.contained = cdf.groupby(
                ["unit_id", "trace_id"], sort=False)["artifact"] \
                .agg(set).to_dict()
        else:
            self.contained = {}
        self.max_hop = max_hop

    @staticmethod
    def _multi_bfs(adj: dict, seeds, cap: int) -> dict[str, int]:
        dist = {s: 0 for s in seeds}
        q = deque(dist)
        while q:
            cur = q.popleft()
            d = dist[cur]
            if d >= cap:
                continue
            for nxt in adj.get(cur, ()):
                if nxt not in dist:
                    dist[nxt] = d + 1
                    q.append(nxt)
        return dist

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        units = batch.column("unit_id").to_pylist()
        tids = batch.column("trace_id").to_pylist()
        k = self.max_hop
        for unit, tid in zip(units, tids):
            members = self.contained.get((unit, tid), set())
            if not members:
                continue
            src_proc = {m for m in members
                        if _artifact_type(m) == "PROCESS"}
            srcs_np = {m for m in members
                       if _artifact_type(m) not in ("PROCESS", "MODULE")}
            dst_proc = src_proc
            dsts_np = {m for m in members
                       if _artifact_type(m) != "PROCESS"}
            df_p = self._multi_bfs(self.fwd, src_proc, k - 1)
            df_n = self._multi_bfs(self.fwd, srcs_np, k - 1)
            db_p = self._multi_bfs(self.bwd, dst_proc, k - 1)
            db_n = self._multi_bfs(self.bwd, dsts_np, k - 1)
            for (a, ty, b) in self.edges:
                best = None
                for dfwd, dbwd in ((df_p, db_n), (df_n, db_p),
                                   (df_n, db_n)):
                    da = dfwd.get(a)
                    db = dbwd.get(b)
                    if da is not None and db is not None:
                        tot = da + 1 + db
                        if best is None or tot < best:
                            best = tot
                if best is not None and best <= k:
                    rows.append({"unit_id": unit, "trace_id": tid,
                                 "src": a, "type": ty, "dst": b})
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("unit_id", pa.string()), ("trace_id", pa.string()),
            ("src", pa.string()), ("type", pa.string()),
            ("dst", pa.string())]))


def provenance_subgraph(graph: dict, *, max_hop: int = 5,
                        concurrency: int = 2, mode: str = "auto",
                        actor_index_max_rows: int =
                        DEFAULT_ACTOR_INDEX_MAX_ROWS,
                        num_partitions: int = 8):
    """G3 — unique directed edges of each trace's provenance subgraph
    (the reference flattens paths to unique node/edge lists,
    element_behavior.py:639-699; we emit the edge list, node list =
    its distinct endpoints). Tier picked per the module docstring."""
    from sigraph_ray.stages import frontier as F

    rels = materialize_rels(graph)
    if _use_actor_tier(rels, mode, actor_index_max_rows):
        refs = graph_table_refs(rels)
        return graph["traces"].map_batches(
            _Subgraph, batch_format="pyarrow",
            fn_constructor_kwargs={"refs": refs, "max_hop": max_hop},
            concurrency=concurrency)
    return F.subgraph_distributed(rels, max_hop=max_hop,
                                  num_partitions=num_partitions)


def drift_trace_set(graph: dict, unit_id: str, trace_id: str,
                    *, max_hop: int = 5, mode: str = "auto",
                    actor_index_max_rows: int =
                    DEFAULT_ACTOR_INDEX_MAX_ROWS) -> set[str]:
    """The trace set of a drift query: the seed trace plus every
    same-unit trace within ``max_hop`` undirected hops (J6,
    src/app/backend/v1/api.py:177-208 unions the seed's syslog sequence
    with the sequences of all graph-related traces). Actor tier: the
    BFS runs in a Ray task against the actor-style index — the driver
    ships block refs and receives only the (per-unit-bounded) trace-id
    set. Frontier tier: single-seed distributed BFS."""
    import ray

    from sigraph_ray.stages import frontier as F

    rels = materialize_rels(graph)
    if not _use_actor_tier(rels, mode, actor_index_max_rows):
        return F.drift_traces_distributed(rels, unit_id, trace_id,
                                          max_hop=max_hop)
    refs = graph_table_refs(rels)

    @ray.remote
    def _bfs_task(refs: dict, unit_id: str, trace_id: str,
                  max_hop: int) -> set[str]:
        index = _AdjacencyIndex(refs)
        dist = index.bfs(f"trace:{unit_id}:{trace_id}", max_hop)
        prefix = f"trace:{unit_id}:"
        out = {trace_id}
        out |= {n[len(prefix):] for n in dist if n.startswith(prefix)}
        return out

    return ray.get(_bfs_task.remote(refs, unit_id, trace_id, max_hop))


def drift_sequence(graph: dict, docs, unit_id: str, trace_id: str,
                   *, max_hop: int = 5, sort_cols=("timestamp", "span_id"),
                   mode: str = "auto",
                   actor_index_max_rows: int = DEFAULT_ACTOR_INDEX_MAX_ROWS):
    """J6 — union of the seed trace's document sequence with the
    sequences of all graph-related traces, re-sorted by timestamp
    (api.py:177-208 + O2 final sort, db_session.py:211-214). ``docs``
    is any Dataset with unit_id/trace_id plus the sort columns; the
    trace set is broadcast (semi-join, no shuffle)."""
    import ray

    traces = drift_trace_set(graph, unit_id, trace_id, max_hop=max_hop,
                             mode=mode,
                             actor_index_max_rows=actor_index_max_rows)
    ref = ray.put(traces)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ts = ray.get(ref)
        return df[(df["unit_id"] == unit_id) & df["trace_id"].isin(ts)]

    return docs.map_batches(f, batch_format="pandas").sort(list(sort_cols))
