"""Distributed frontier-join BFS — the traversal tier for graphs beyond
single-worker memory (SURVEY.md §4.2; the fallback named by
stages/traversal's docstring, now implemented).

The actor-index tier in :mod:`sigraph_ray.stages.traversal` assumes the
post-aggregation relationship tables fit one worker's heap — the same
bound the reference places on its Neo4j instance
(src/graph/graph_element/schema.py:89-152). Past that bound the
traversals here re-express BFS as dataflow:

    visited(seed, node, dist) starts at the seed set; each round joins
    the current frontier against the MATERIALIZED adjacency pair table
    (``stages/joins.safe_join`` — bounded aggregator pools, schema-
    normalized sparse sides) and folds the result back with a
    (seed, node) min-dist groupby; rows whose min dist equals the round
    index form the next frontier. ≤ ``max_hop`` rounds, each one hash
    join + one sort-shuffle groupby — the honest price of traversing a
    graph that cannot sit in one worker. Tier selection mirrors
    ``connected_components``' small/large split (stages/canonicalize).

Node keys are flat strings (Acero joins reject list payloads):
traces ``T␟<unit>␟<trace>``, rules ``R␟<rule>``, artifacts
``A␟<artifact>`` — prefixes keep the three namespaces disjoint without
relying on artifact spelling.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

_SEP = "\x1f"

ADJ_SCHEMA = pa.schema([("node", pa.string()), ("nbr", pa.string())])
SEED_SCHEMA = pa.schema([("seed", pa.string()), ("node", pa.string())])
VISITED_SCHEMA = pa.schema([("seed", pa.string()), ("node", pa.string()),
                            ("dist", pa.int64())])


def _table(cols: dict) -> pa.Table:
    return pa.table({k: pa.array(list(v), pa.string()) for k, v in cols.items()})


def undirected_pairs(rels: dict):
    """(node, nbr) pair Dataset — BOTH directions of every relationship
    (action edges, CONTAINS, MATCHES), the adjacency G2/J6 walk over
    (schema.py:89-110 matches ANY relationship type)."""

    def from_edges(df: pd.DataFrame) -> pa.Table:
        a = "A" + _SEP + df["src"].astype(str)
        b = "A" + _SEP + df["dst"].astype(str)
        return _table({"node": pd.concat([a, b], ignore_index=True),
                       "nbr": pd.concat([b, a], ignore_index=True)})

    def from_contains(df: pd.DataFrame) -> pa.Table:
        t = ("T" + _SEP + df["unit_id"].astype(str)
             + _SEP + df["trace_id"].astype(str))
        a = "A" + _SEP + df["artifact"].astype(str)
        return _table({"node": pd.concat([t, a], ignore_index=True),
                       "nbr": pd.concat([a, t], ignore_index=True)})

    def from_matches(df: pd.DataFrame) -> pa.Table:
        r = "R" + _SEP + df["rule_id"].astype(str)
        a = "A" + _SEP + df["artifact"].astype(str)
        return _table({"node": pd.concat([r, a], ignore_index=True),
                       "nbr": pd.concat([a, r], ignore_index=True)})

    return (rels["edges"].map_batches(from_edges, batch_format="pandas")
            .union(rels["contains"].map_batches(from_contains,
                                                batch_format="pandas"))
            .union(rels["matches"].map_batches(from_matches,
                                               batch_format="pandas")))


def directed_pairs(edges, *, reverse: bool = False):
    """(node, nbr) over action edges only, directed (G3 walks
    ``-[*]->``); ``reverse`` flips for the backward BFS. Raw artifact
    keys — only one namespace exists here."""
    src, dst = ("dst", "src") if reverse else ("src", "dst")

    def f(df: pd.DataFrame) -> pa.Table:
        return _table({"node": df[src].astype(str),
                       "nbr": df[dst].astype(str)})

    return edges.map_batches(f, batch_format="pandas")


def bfs(seeds, adj, *, max_hop: int, num_partitions: int = 8):
    """Multi-source shortest-dist reachability ≤ ``max_hop``.

    ``seeds``: Dataset(seed, node) — distinct rows; ``adj``: Dataset
    (node, nbr). Returns a MATERIALIZED Dataset(seed, node, dist) with
    dist = min hops from that seed's start node (0 = the seed itself).
    """
    from ray.data.aggregate import Min as AggMin

    from sigraph_ray.stages.joins import safe_join, typed

    def with_dist0(t: pa.Table) -> pa.Table:
        return t.append_column("dist", pa.array([0] * t.num_rows, pa.int64()))

    visited = typed(seeds, SEED_SCHEMA).map_batches(
        with_dist0, batch_format="pyarrow")
    visited = typed(visited, VISITED_SCHEMA).materialize()
    if visited.count() == 0:
        return visited
    adj = typed(adj, ADJ_SCHEMA).materialize()
    if adj.count() == 0:
        return visited

    frontier = visited
    for d in range(1, max_hop + 1):
        if frontier.count() == 0:
            break
        hop = safe_join(
            frontier.select_columns(["seed", "node"]), adj, "inner",
            num_partitions, ("node",),
            left_schema=SEED_SCHEMA, right_schema=None)

        def advance(df: pd.DataFrame, _d: int = d) -> pa.Table:
            # per-batch combiner: a (seed, nbr) reached through many
            # nodes collapses before the min-dist shuffle
            out = (df[["seed", "nbr"]]
                   .drop_duplicates()
                   .rename(columns={"nbr": "node"}))
            out["dist"] = _d
            return pa.Table.from_pandas(out, preserve_index=False)

        nxt = typed(hop.map_batches(advance, batch_format="pandas"),
                    VISITED_SCHEMA)
        visited = (visited.union(nxt)
                   .groupby(["seed", "node"])
                   .aggregate(AggMin("dist", alias_name="dist"))
                   ).materialize()
        frontier = visited.filter(expr=f"dist == {d}").materialize()
    return visited


# ---------------------------------------------------------------------------
# G2 — related traces, distributed
# ---------------------------------------------------------------------------


def related_traces_distributed(rels, traces, *, max_hop: int,
                               num_partitions: int = 8):
    """G2 over frontier joins: seeds = every trace node; emit same-unit
    (trace_a < trace_b, hops) pairs. Output schema identical to the
    actor tier (``stages/traversal.related_traces``)."""

    def seed_batch(df: pd.DataFrame) -> pa.Table:
        u = df["unit_id"].astype(str)
        t = df["trace_id"].astype(str)
        return _table({"seed": u + _SEP + t,
                       "node": "T" + _SEP + u + _SEP + t})

    seeds = traces.map_batches(seed_batch, batch_format="pandas")
    visited = bfs(seeds, undirected_pairs(rels),
                  max_hop=max_hop, num_partitions=num_partitions)

    def finish(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({"unit_id": pa.array([], pa.string()),
                             "trace_a": pa.array([], pa.string()),
                             "trace_b": pa.array([], pa.string()),
                             "hops": pa.array([], pa.int64())})
        sk = df["seed"].str.split(_SEP, n=1, expand=True)
        nk = df["node"].str.split(_SEP, n=2, expand=True)
        if 2 not in nk.columns:
            nk[2] = None
        keep = ((nk[0] == "T") & (nk[1] == sk[0]) & (sk[1] < nk[2]))
        return pa.Table.from_pandas(pd.DataFrame({
            "unit_id": sk.loc[keep, 0],
            "trace_a": sk.loc[keep, 1],
            "trace_b": nk.loc[keep, 2],
            "hops": df.loc[keep, "dist"].astype("int64"),
        }), preserve_index=False)

    return visited.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# G3 — provenance subgraph, distributed
# ---------------------------------------------------------------------------


def subgraph_distributed(rels, *, max_hop: int, num_partitions: int = 8):
    """G3 over frontier joins (QUERY_ALL_PROVENANCE, schema.py:127-152):
    forward BFS from each trace's contained non-MODULE members and
    backward BFS from its contained members, both split by PROCESS-ness
    into seed classes ``p``/``n``; an edge a→b is exported for a trace
    iff some allowed class pair (not p→p) gives
    ``dfwd(a) + 1 + dbwd(b) <= max_hop``. Endpoint-only filters, as in
    the actor tier."""
    from ray.data.aggregate import Count as AggCount

    from sigraph_ray.stages.joins import safe_join

    edges = rels["edges"]
    contains = rels["contains"]

    def _seeds(df: pd.DataFrame, keep: pd.Series) -> pa.Table:
        import numpy as np

        typ = df["artifact"].astype(str).str.rsplit("@", n=1).str[-1]
        cls = pd.Series(np.where(typ == "PROCESS", "p", "n"), index=df.index)
        u = df["unit_id"].astype(str)
        t = df["trace_id"].astype(str)
        return pa.Table.from_pandas(pd.DataFrame({
            "seed": (u + _SEP + t + _SEP + cls)[keep],
            "node": df["artifact"].astype(str)[keep],
        }), preserve_index=False)

    def fwd_seeds(df: pd.DataFrame) -> pa.Table:
        # src endpoints: contained, non-MODULE (schema.py:141)
        typ = df["artifact"].astype(str).str.rsplit("@", n=1).str[-1]
        return _seeds(df, typ != "MODULE")

    def bwd_seeds(df: pd.DataFrame) -> pa.Table:
        # dst endpoints: any contained artifact
        return _seeds(df, pd.Series(True, index=df.index))

    dfwd = bfs(contains.map_batches(fwd_seeds, batch_format="pandas"),
               directed_pairs(edges),
               max_hop=max_hop - 1, num_partitions=num_partitions)
    dbwd = bfs(contains.map_batches(bwd_seeds, batch_format="pandas"),
               directed_pairs(edges, reverse=True),
               max_hop=max_hop - 1, num_partitions=num_partitions)

    def fwd_rows(df: pd.DataFrame) -> pa.Table:
        sk = df["seed"].str.rsplit(_SEP, n=1, expand=True)
        if 1 not in sk.columns:
            sk[1] = None
        return pa.Table.from_pandas(pd.DataFrame({
            "src": df["node"], "sd": sk[0], "cls_f": sk[1],
            "da": df["dist"].astype("int64")}), preserve_index=False)

    def bwd_rows(df: pd.DataFrame) -> pa.Table:
        sk = df["seed"].str.rsplit(_SEP, n=1, expand=True)
        if 1 not in sk.columns:
            sk[1] = None
        return pa.Table.from_pandas(pd.DataFrame({
            "dst": df["node"], "sd": sk[0], "cls_b": sk[1],
            "db": df["dist"].astype("int64")}), preserve_index=False)

    _fwd_schema = pa.schema([("src", pa.string()), ("sd", pa.string()),
                             ("cls_f", pa.string()), ("da", pa.int64())])
    _bwd_schema = pa.schema([("dst", pa.string()), ("sd", pa.string()),
                             ("cls_b", pa.string()), ("db", pa.int64())])
    _edge_schema = pa.schema([("src", pa.string()), ("type", pa.string()),
                              ("dst", pa.string())])

    def edge_rows(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            df[["src", "type", "dst"]].astype(str).drop_duplicates(),
            preserve_index=False)

    j1 = safe_join(
        edges.map_batches(edge_rows, batch_format="pandas"),
        dfwd.map_batches(fwd_rows, batch_format="pandas"),
        "inner", num_partitions, ("src",),
        left_schema=_edge_schema, right_schema=_fwd_schema)
    j1_schema = pa.schema([("src", pa.string()), ("type", pa.string()),
                           ("dst", pa.string()), ("sd", pa.string()),
                           ("cls_f", pa.string()), ("da", pa.int64())])
    j2 = safe_join(
        j1, dbwd.map_batches(bwd_rows, batch_format="pandas"),
        "inner", num_partitions, ("dst", "sd"),
        left_schema=j1_schema, right_schema=_bwd_schema)

    k = max_hop

    def qualify(df: pd.DataFrame) -> pa.Table:
        keep = (~((df["cls_f"] == "p") & (df["cls_b"] == "p"))
                & (df["da"] + 1 + df["db"] <= k))
        out = df.loc[keep, ["sd", "src", "type", "dst"]].drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    def decode(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return pa.table({"unit_id": pa.array([], pa.string()),
                             "trace_id": pa.array([], pa.string()),
                             "src": pa.array([], pa.string()),
                             "type": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string())})
        sd = df["sd"].str.split(_SEP, n=1, expand=True)
        return pa.Table.from_pandas(pd.DataFrame({
            "unit_id": sd[0], "trace_id": sd[1],
            "src": df["src"], "type": df["type"], "dst": df["dst"],
        }), preserve_index=False)

    return (j2.map_batches(qualify, batch_format="pandas")
            .groupby(["sd", "src", "type", "dst"])
            .aggregate(AggCount(alias_name="_n"))
            .map_batches(decode, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# J6 — drift trace set, distributed
# ---------------------------------------------------------------------------


def drift_traces_distributed(rels, unit_id: str, trace_id: str,
                             *, max_hop: int,
                             num_partitions: int = 8) -> set[str]:
    """Single-seed undirected BFS; returns the (per-unit-bounded) trace
    id set — the only rows pulled to the driver."""
    import ray.data as rd

    seed = pd.DataFrame({
        "seed": [unit_id + _SEP + trace_id],
        "node": ["T" + _SEP + unit_id + _SEP + trace_id]})
    visited = bfs(rd.from_pandas(seed), undirected_pairs(rels),
                  max_hop=max_hop, num_partitions=num_partitions)

    def finish(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({"trace_id": pa.array([], pa.string())})
        nk = df["node"].str.split(_SEP, n=2, expand=True)
        if 2 not in nk.columns:
            nk[2] = None
        keep = (nk[0] == "T") & (nk[1] == unit_id)
        return pa.Table.from_pandas(
            pd.DataFrame({"trace_id": nk.loc[keep, 2]}),
            preserve_index=False)

    out = visited.map_batches(finish, batch_format="pandas").to_pandas()
    return {trace_id} | set(out["trace_id"])
