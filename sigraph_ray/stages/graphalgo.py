"""Iterative graph analytics over edge Datasets — PageRank (entity /
artifact importance for the constructed knowledge graph; public
algorithm, Page et al. 1999). The reference has no analytics surface —
its graph lives in Neo4j and is only traversed — so this is a
beyond-reference addition in the same family as
``canonicalize.connected_components``, and follows the same two-tier
idiom:

- **broadcast tier** (default up to ``broadcast_max_nodes``): the
  rank vector is ``ray.put`` once per iteration and every edge block
  computes its contribution partials independently (vectorized pandas
  groupby per batch), folded with one grouped-sum stitch per iteration.
  Bound: the (node → rank) vector fits the object store — ~16 bytes a
  node, 10⁹ nodes ≈ 16 GB, fine for dimension-sized graphs; the edge
  table streams and is never driver-materialized.
- **join tier** (``tier="join"``): ranks stay a Dataset; each
  iteration is one hash join (ranks ⨝ edges on src) + one grouped-sum
  shuffle — the honest dataflow price when even the rank VECTOR
  outgrows one store (trillion-node regime). Same formulation as
  ``frontier.bfs``'s frontier⨝edges rounds.

Both tiers implement the identical textbook iteration
``r' = (1-d)/N + d·(Σ_in r/outdeg + dangling_mass/N)`` and are
cross-checked against a dense numpy power iteration in
tests/test_graph_ops.py — iteration-exact (same fixed iteration count,
float tolerance), not just direction-of-ranking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _pagerank_broadcast(edges_df_stream, nodes: np.ndarray,
                        outdeg: np.ndarray, damping: float,
                        n_iter: int):
    """Driver-coordinated power iteration: nodes/outdeg are the
    broadcast-tier bound (one vector in memory); edges stream per
    iteration."""
    import ray

    n = len(nodes)
    idx = pd.Index(nodes)
    rank = np.full(n, 1.0 / n)
    dangling = outdeg == 0
    for _ in range(n_iter):
        share = np.zeros(n)
        nz = ~dangling
        share[nz] = rank[nz] / outdeg[nz]
        share_ref = ray.put((idx, share))

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            ix, sh = ray.get(share_ref)
            s = sh[ix.get_indexer(df["src"].to_numpy())]
            g = (pd.DataFrame({"dst": df["dst"].to_numpy(), "c": s})
                 .groupby("dst", sort=False)["c"].sum().reset_index())
            return g

        parts = (edges_df_stream.map_batches(contrib,
                                             batch_format="pandas")
                 .to_pandas())
        s_in = np.zeros(n)
        if len(parts):
            agg = parts.groupby("dst", sort=False)["c"].sum()
            s_in[idx.get_indexer(agg.index.to_numpy())] = agg.to_numpy()
        d_mass = rank[dangling].sum()
        rank = (1 - damping) / n + damping * (s_in + d_mass / n)
    return pd.DataFrame({"node": nodes, "rank": rank})


def pagerank(edges, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, n_iter: int = 10,
             tier: str = "broadcast", num_partitions: int = 8):
    """PageRank over a directed edge Dataset → ``(node, rank)``
    DataFrame (broadcast tier) or Dataset (join tier), ranks summing
    to 1. Parallel edges count once each (weighted multigraph
    semantics, matching the dense-matrix reference computation)."""
    import ray
    import ray.data as rd

    pair = edges.map_batches(
        lambda t: pa.table({"src": t.column(src).cast(pa.string()),
                            "dst": t.column(dst).cast(pa.string())}),
        batch_format="pyarrow").materialize()

    # node universe + out-degrees: two bounded aggregates
    from sigraph_ray.stages.collect import sorted_distinct, \
        sorted_groupby_agg

    srcs = pair.map_batches(lambda t: pa.table(
        {"node": t.column("src")}), batch_format="pyarrow")
    dsts = pair.map_batches(lambda t: pa.table(
        {"node": t.column("dst")}), batch_format="pyarrow")
    nodes_df = sorted_distinct(srcs.union(dsts), ["node"]).to_pandas()
    nodes = np.sort(nodes_df["node"].to_numpy()) if len(nodes_df) \
        else np.empty(0, dtype=object)
    if not len(nodes):
        return pd.DataFrame({"node": pd.Series(dtype="object"),
                             "rank": pd.Series(dtype="float64")})

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src", sort=False).size().rename("c").reset_index()
        return g

    degs = (sorted_groupby_agg(
        pair.map_batches(deg_partial, batch_format="pandas"),
        key="src", aggs={"outdeg": ("c", "sum")}).to_pandas())
    idx = pd.Index(nodes)
    outdeg = np.zeros(len(nodes), dtype="int64")
    if len(degs):
        outdeg[idx.get_indexer(degs["src"].to_numpy())] = \
            degs["outdeg"].to_numpy(dtype="int64")

    if tier == "broadcast":
        return _pagerank_broadcast(pair, nodes, outdeg, damping, n_iter)
    if tier != "join":
        raise ValueError(tier)

    # join tier: ranks remain a Dataset end-to-end
    from sigraph_ray.stages.joins import safe_join

    n = len(nodes)
    deg_tbl = pa.table({"src": pa.array(nodes, pa.string()),
                        "outdeg": pa.array(outdeg, pa.int64())})
    ranks = rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.string()),
        "rank": pa.array(np.full(n, 1.0 / n), pa.float64()),
        "outdeg": pa.array(outdeg, pa.int64())}))
    rank_schema = pa.schema([("node", pa.string()),
                             ("rank", pa.float64()),
                             ("outdeg", pa.int64())])
    for _ in range(n_iter):
        # dangling mass: tiny scalar aggregate (one pass over ranks)
        d_mass = (ranks.filter(expr="outdeg == 0")
                  .sum("rank", ignore_nulls=True) or 0.0)
        live = ranks.filter(expr="outdeg > 0").map_batches(
            lambda t: pa.table({
                "src": t.column("node"),
                "share": pa.compute.divide(
                    t.column("rank"),
                    pa.compute.cast(t.column("outdeg"), pa.float64()))}),
            batch_format="pyarrow")
        joined = safe_join(
            pair, live, "inner", num_partitions, on=("src",),
            left_schema=pa.schema([("src", pa.string()),
                                   ("dst", pa.string())]),
            right_schema=pa.schema([("src", pa.string()),
                                    ("share", pa.float64())]))

        def contrib_partial(df: pd.DataFrame) -> pd.DataFrame:
            return (df.groupby("dst", sort=False)["share"].sum()
                    .rename("c").reset_index())

        s_in = sorted_groupby_agg(
            joined.map_batches(contrib_partial, batch_format="pandas"),
            key="dst", aggs={"s_in": ("c", "sum")}).map_batches(
                lambda t: t.rename_columns(["node", "s_in"]),
                batch_format="pyarrow")
        base = safe_join(
            ranks, s_in, "left_outer", num_partitions, on=("node",),
            left_schema=rank_schema,
            right_schema=pa.schema([("node", pa.string()),
                                    ("s_in", pa.float64())]))
        const = (1 - damping) / n + damping * d_mass / n

        def update(t: pa.Table, *, _c=const) -> pa.Table:
            s = pa.compute.coalesce(t.column("s_in"), pa.scalar(0.0))
            new = pa.compute.add(
                pa.scalar(_c),
                pa.compute.multiply(pa.scalar(damping), s))
            return pa.table({"node": t.column("node"),
                             "rank": new,
                             "outdeg": t.column("outdeg")})

        ranks = base.map_batches(update,
                                 batch_format="pyarrow").materialize()
    return ranks.map_batches(
        lambda t: t.select(["node", "rank"]), batch_format="pyarrow")


def triangle_counts(edges, *, u: str = "u", v: str = "v"):
    """Per-node triangle counts over an undirected edge Dataset →
    ``(node, n_triangles)`` DataFrame covering every incident node
    (zeros included). Classic degree-ordered node-iterator (public
    algorithm — e.g. Schank & Wagner 2005 "forward"): orient each edge
    from the lower to the higher endpoint in the total order
    ``(degree, node)``; every triangle is then counted exactly once as
    a wedge at its lowest corner, and each center's oriented
    out-degree is O(√m), bounding wedge generation.

    Dataflow: dedup/normalize per batch + one sorted-distinct; degrees
    via one grouped-sum stitch; wedges from ONE ``sorted_collect`` of
    oriented out-neighbor lists (vectorized triu pairs per block);
    wedge→edge membership via a broadcast sorted int64 key array
    (rank_lo * N + rank_hi, 8 bytes/edge — the broadcast-tier bound,
    same idiom as :func:`pagerank`; ~10⁹ edges ≈ 8 GB). Past that,
    semi-join the wedge stream against the oriented edge Dataset
    (stages/joins.safe_join) instead — steps 1-3 are unchanged.
    """
    import ray

    from sigraph_ray.stages.collect import (sorted_collect,
                                            sorted_distinct,
                                            sorted_groupby_agg)

    def norm(t: pa.Table) -> pa.Table:
        a = t.column(u).cast(pa.string())
        b = t.column(v).cast(pa.string())
        lo = pa.compute.min_element_wise(a, b)
        hi = pa.compute.max_element_wise(a, b)
        keep = pa.compute.not_equal(lo, hi)  # drop self-loops
        return pa.table({"a": lo.filter(keep), "b": hi.filter(keep)})

    und = sorted_distinct(
        edges.map_batches(norm, batch_format="pyarrow"),
        ["a", "b"]).materialize()

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.concat([df["a"], df["b"]], ignore_index=True)
        return (s.value_counts().rename("c").rename_axis("node")
                .reset_index())

    degs = sorted_groupby_agg(
        und.map_batches(endpoints, batch_format="pandas"),
        key="node", aggs={"deg": ("c", "sum")}).to_pandas()
    if not len(degs):
        return pd.DataFrame({"node": pd.Series(dtype="object"),
                             "n_triangles": pd.Series(dtype="int64")})
    # total order (deg, node) → rank; rank table is the broadcast bound
    order = degs.sort_values(["deg", "node"], kind="stable")
    nodes = order["node"].to_numpy()
    n = len(nodes)
    rank_idx = pd.Index(nodes)
    idx_ref = ray.put(rank_idx)

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        ix = ray.get(idx_ref)
        ra = ix.get_indexer(df["a"].to_numpy()).astype(np.int64)
        rb = ix.get_indexer(df["b"].to_numpy()).astype(np.int64)
        lo = np.minimum(ra, rb)
        hi = np.maximum(ra, rb)
        return pd.DataFrame({"lo": lo, "hi": hi})

    oriented = und.map_batches(orient,
                               batch_format="pandas").materialize()
    keys = np.sort(np.concatenate(
        [b["lo"].to_numpy() * n + b["hi"].to_numpy() for b in
         oriented.iter_batches(batch_format="pandas")] or
        [np.empty(0, dtype=np.int64)]))
    keys_ref = ray.put(keys)

    wedges = sorted_collect(oriented, key="lo", order_col="hi",
                            value="hi")

    def close_wedges(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        cs, xs, ys = [], [], []
        for center, vals in zip(df["lo"], df["values"]):
            if len(vals) < 2:
                continue
            a = np.sort(np.asarray(vals, dtype=np.int64))
            iu, iv = np.triu_indices(len(a), 1)
            cand = a[iu] * n + a[iv]
            pos = np.searchsorted(ks, cand)
            hit = pos < len(ks)
            hit[hit] = ks[pos[hit]] == cand[hit]
            if hit.any():
                cs.append(np.full(int(hit.sum()), center,
                                  dtype=np.int64))
                xs.append(a[iu][hit])
                ys.append(a[iv][hit])
        if not cs:
            return pd.DataFrame({"r": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        tri = np.concatenate([np.concatenate(cs), np.concatenate(xs),
                              np.concatenate(ys)])
        vals, cnts = np.unique(tri, return_counts=True)
        return pd.DataFrame({"r": vals, "c": cnts.astype(np.int64)})

    parts = wedges.map_batches(close_wedges, batch_format="pandas")
    per_rank = sorted_groupby_agg(parts, key="r",
                                  aggs={"n": ("c", "sum")}).to_pandas()
    counts = np.zeros(n, dtype=np.int64)
    if len(per_rank):
        counts[per_rank["r"].to_numpy(dtype=np.int64)] = \
            per_rank["n"].to_numpy(dtype=np.int64)
    out = pd.DataFrame({"node": nodes, "n_triangles": counts})
    return out.sort_values("node", kind="stable").reset_index(drop=True)


def kcore(edges, *, k: int = 2, u: str = "u", v: str = "v",
          max_rounds: int = 100):
    """k-core extraction (Seidman 1983 peeling, public algorithm):
    the maximal subgraph where every node keeps degree ≥ k. Returns
    ``(node, degree_in_core)`` for surviving nodes — the density
    filter graph-curation pipelines apply before expensive analytics.

    Iterative dataflow, same convergence idiom as
    ``canonicalize.connected_components``: each round recomputes
    degrees over surviving edges with one grouped-sum stitch, drops
    sub-k nodes, and filters edges by a broadcast sorted survivor
    array (``searchsorted`` membership per batch — the node-set
    broadcast bound documented on :func:`triangle_counts` and
    :func:`pagerank`; for node sets beyond one store, swap the filter
    for two semi-joins via stages/joins.safe_join). Rounds are data-
    dependent (≤ peeling depth); ``max_rounds`` guards pathological
    chains with a warning, mirroring connected_components.
    """
    import logging

    import ray

    from sigraph_ray.stages.collect import sorted_distinct, \
        sorted_groupby_agg

    def norm(t: pa.Table) -> pa.Table:
        a = t.column(u).cast(pa.string())
        b = t.column(v).cast(pa.string())
        lo = pa.compute.min_element_wise(a, b)
        hi = pa.compute.max_element_wise(a, b)
        keep = pa.compute.not_equal(lo, hi)
        return pa.table({"a": lo.filter(keep), "b": hi.filter(keep)})

    live = sorted_distinct(
        edges.map_batches(norm, batch_format="pyarrow"),
        ["a", "b"]).materialize()

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.concat([df["a"], df["b"]], ignore_index=True)
        return (s.value_counts().rename("c").rename_axis("node")
                .reset_index())

    empty = pd.DataFrame({"node": pd.Series(dtype="object"),
                          "degree_in_core": pd.Series(dtype="int64")})
    for round_no in range(max_rounds):
        degs = sorted_groupby_agg(
            live.map_batches(endpoints, batch_format="pandas"),
            key="node", aggs={"deg": ("c", "sum")}).to_pandas()
        if not len(degs):
            return empty
        bad = degs["deg"].to_numpy() < k
        if not bad.any():
            out = degs.rename(columns={"deg": "degree_in_core"})
            out["degree_in_core"] = out["degree_in_core"].astype("int64")
            return (out.sort_values("node", kind="stable")
                    .reset_index(drop=True))
        survivors = np.sort(degs["node"].to_numpy()[~bad])
        if not len(survivors):
            return empty
        surv_ref = ray.put(survivors)

        def keep_edges(df: pd.DataFrame) -> pd.DataFrame:
            sv = ray.get(surv_ref)
            a = df["a"].to_numpy()
            b = df["b"].to_numpy()
            pa_ = np.searchsorted(sv, a).clip(max=len(sv) - 1)
            pb_ = np.searchsorted(sv, b).clip(max=len(sv) - 1)
            ok = (sv[pa_] == a) & (sv[pb_] == b)
            return df[ok]

        live = live.map_batches(keep_edges,
                                batch_format="pandas").materialize()
    logging.getLogger(__name__).warning(
        "kcore: max_rounds=%d reached without convergence", max_rounds)
    degs = sorted_groupby_agg(
        live.map_batches(endpoints, batch_format="pandas"),
        key="node", aggs={"deg": ("c", "sum")}).to_pandas()
    degs = degs[degs["deg"] >= k]
    out = degs.rename(columns={"deg": "degree_in_core"})
    out["degree_in_core"] = out["degree_in_core"].astype("int64")
    return out.sort_values("node", kind="stable").reset_index(drop=True)


def khop_min_dist(edges, *, seed, k: int, src: str = "src",
                  dst: str = "dst", w: str = "w"):
    """Bounded-hop weighted single-source shortest paths: min total
    weight over directed paths of ≤ ``k`` edges from ``seed`` —
    ``k`` Bellman-Ford relaxation rounds, each ONE bounded merge join
    (frontier ⨝ edges on the source node; fan-out = out-degree) plus
    ONE grouped-min stitch. The weighted sibling of the BFS-hop
    traversal tier (stages/traversal G3), and exactly the semantics a
    bounded recursive CTE gives, so it is SQL-oracle-checkable: float
    path sums associate left in both engines and float ``+`` is
    monotone, so relaxation's min-of-prefix + w equals the true
    per-path float minimum.

    Scale shape: the frontier/dist table is node-sized, edges are
    joined ``k`` times but never materialized to the driver; per-key
    join fan-out is the graph's max out-degree (document/cap for
    power-law graphs — same contract as the merge join itself).

    Returns ``(node, dist)`` for every node reachable in ≤ k edges."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.joins import sorted_merge_join

    dist = rd.from_pandas(pd.DataFrame(
        {"node": [seed], "dist": [0.0]}))
    for _ in range(k):
        frontier = dist.map_batches(
            lambda df: df.rename(columns={"node": src})
            .rename(columns={"dist": "d0"}),
            batch_format="pandas")
        j = sorted_merge_join(edges, frontier, on=src,
                              left_cols=[dst, w],
                              right_cols=["d0"])
        cand = j.map_batches(
            lambda df: pd.DataFrame(
                {"node": df[dst],
                 "dist": df["d0"].to_numpy() + df[w].to_numpy()}),
            batch_format="pandas")
        dist = sorted_groupby_agg(dist.union(cand), key="node",
                                  aggs={"dist": ("dist", "min")})
        dist = dist.materialize()  # pin: next round reads it twice
    return dist


def hits(edges, *, src: str = "src", dst: str = "dst",
         n_iter: int = 20):
    """HITS hubs & authorities (Kleinberg, JACM 1999) over a directed
    edge Dataset → (node, hub, authority) DataFrame, each vector
    L2-normalized. Same tiering contract as :func:`pagerank`'s
    broadcast tier: the per-node score vector is the broadcast-bound
    state (``ray.put`` once per half-iteration, read by every task),
    edges stream per pass, per-block contributions are one groupby —
    the edge set never co-locates. Beyond the single-vector bound,
    the documented upgrade is the pagerank join tier (score attach by
    sorted-merge join); semantics identical.

    Deterministic: fixed iteration count, zero-init-to-uniform,
    float64; parallel edges count once each (weighted multigraph
    semantics, matching the dense-matrix reference)."""
    import ray

    pair = edges.map_batches(
        lambda t: pa.table({"src": t.column(src).cast(pa.string()),
                            "dst": t.column(dst).cast(pa.string())}),
        batch_format="pyarrow").materialize()

    from sigraph_ray.stages.collect import sorted_distinct

    srcs = pair.map_batches(lambda t: pa.table(
        {"node": t.column("src")}), batch_format="pyarrow")
    dsts = pair.map_batches(lambda t: pa.table(
        {"node": t.column("dst")}), batch_format="pyarrow")
    nodes_df = sorted_distinct(srcs.union(dsts), ["node"]).to_pandas()
    if not len(nodes_df):
        return pd.DataFrame({"node": pd.Series(dtype="object"),
                             "hub": pd.Series(dtype="float64"),
                             "authority": pd.Series(dtype="float64")})
    nodes = np.sort(nodes_df["node"].to_numpy())
    idx = pd.Index(nodes)
    n = len(nodes)

    def spread(col_from: str, col_to: str, vec: np.ndarray) -> np.ndarray:
        """out[v] = Σ_{(u,v) ∈ E oriented col_from→col_to} vec[u]."""
        vec_ref = ray.put((idx, vec))

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            ix, v = ray.get(vec_ref)
            s = v[ix.get_indexer(df[col_from].to_numpy())]
            return (pd.DataFrame({"to": df[col_to].to_numpy(), "c": s})
                    .groupby("to", sort=False)["c"].sum().reset_index())

        parts = (pair.map_batches(contrib, batch_format="pandas")
                 .to_pandas())
        out = np.zeros(n)
        if len(parts):
            agg = parts.groupby("to", sort=False)["c"].sum()
            out[idx.get_indexer(agg.index.to_numpy())] = agg.to_numpy()
        return out

    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(n_iter):
        auth = spread("src", "dst", hub)
        na = np.linalg.norm(auth)
        auth = auth / na if na > 0 else auth
        hub = spread("dst", "src", auth)
        nh = np.linalg.norm(hub)
        hub = hub / nh if nh > 0 else hub
    return pd.DataFrame({"node": nodes, "hub": hub, "authority": auth})


def hits_join_tier(edges, *, src: str = "src", dst: str = "dst",
                   n_iter: int = 20, num_partitions: int = 8):
    """HITS with scores kept as a DATASET end-to-end — the scale tier
    past :func:`hits`'s broadcast bound (same contract as pagerank's
    join tier): each half-iteration is one hash join (edges ⨝ scores),
    one grouped-sum stitch of contributions, one left-outer attach,
    and one scalar sum-of-squares fold for the L2 normalizer. Nothing
    node-vector-sized ever lands on the driver. Semantics identical to
    the broadcast tier (pytest cross-checks them)."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_distinct, \
        sorted_groupby_agg
    from sigraph_ray.stages.joins import safe_join

    pair = edges.map_batches(
        lambda t: pa.table({"src": t.column(src).cast(pa.string()),
                            "dst": t.column(dst).cast(pa.string())}),
        batch_format="pyarrow").materialize()
    srcs = pair.map_batches(lambda t: pa.table(
        {"node": t.column("src")}), batch_format="pyarrow")
    dsts = pair.map_batches(lambda t: pa.table(
        {"node": t.column("dst")}), batch_format="pyarrow")
    nodes = sorted_distinct(srcs.union(dsts), ["node"]).materialize()
    n = int(nodes.count())
    if n == 0:
        return pd.DataFrame({"node": pd.Series(dtype="object"),
                             "hub": pd.Series(dtype="float64"),
                             "authority": pd.Series(dtype="float64")})
    init = 1.0 / float(np.sqrt(n))
    scores = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "hub": pa.array([init] * t.num_rows),
                            "authority": pa.array([init] * t.num_rows)}),
        batch_format="pyarrow").materialize()
    score_schema = pa.schema([("node", pa.string()),
                              ("hub", pa.float64()),
                              ("authority", pa.float64())])
    pair_schema = pa.schema([("src", pa.string()),
                             ("dst", pa.string())])

    def half(scores, from_col, to_col, take_col, put_col):
        live = scores.map_batches(
            lambda t: pa.table({from_col: t.column("node"),
                                "w": t.column(take_col)}),
            batch_format="pyarrow")
        joined = safe_join(
            pair, live, "inner", num_partitions, on=(from_col,),
            left_schema=pair_schema,
            right_schema=pa.schema([(from_col, pa.string()),
                                    ("w", pa.float64())]))
        contrib = sorted_groupby_agg(
            joined.map_batches(
                lambda df: (df.groupby(to_col, sort=False)["w"].sum()
                            .rename("c").reset_index()),
                batch_format="pandas"),
            key=to_col, aggs={"s": ("c", "sum")}).map_batches(
                lambda t: t.rename_columns(["node", "s"]),
                batch_format="pyarrow")
        base = safe_join(
            scores, contrib, "left_outer", num_partitions, on=("node",),
            left_schema=score_schema,
            right_schema=pa.schema([("node", pa.string()),
                                    ("s", pa.float64())]))
        raw = base.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "hub": t.column("hub"),
                "authority": t.column("authority"),
                "raw": pa.compute.coalesce(t.column("s"),
                                           pa.scalar(0.0))}),
            batch_format="pyarrow").materialize()
        ss = raw.map_batches(
            lambda df: pd.DataFrame({"q": [float((df["raw"] ** 2)
                                                 .sum())]}),
            batch_format="pandas").sum("q") or 0.0
        norm = float(np.sqrt(ss))
        inv = 1.0 / norm if norm > 0 else 1.0

        def put(t: pa.Table, *, _inv=inv) -> pa.Table:
            cols = {"node": t.column("node"),
                    "hub": t.column("hub"),
                    "authority": t.column("authority")}
            cols[put_col] = pa.compute.multiply(t.column("raw"),
                                                pa.scalar(_inv))
            return pa.table(cols)

        return raw.map_batches(put, batch_format="pyarrow").materialize()

    for _ in range(n_iter):
        scores = half(scores, "src", "dst", "hub", "authority")
        scores = half(scores, "dst", "src", "authority", "hub")
    return scores


def _brandes_batch(coo_src, coo_dst, n, sources):
    """Exact per-source Brandes dependency accumulation (unweighted),
    vectorized over the COO edge arrays (both directions present):
    level-synchronous BFS computes path counts, then one backward
    sweep per level accumulates dependencies. O(E × diameter) per
    source, all numpy."""
    import numpy as np

    bc = np.zeros(n, dtype=np.float64)
    for s in sources:
        dist = np.full(n, -1, dtype=np.int64)
        sigma = np.zeros(n, dtype=np.float64)
        dist[s] = 0
        sigma[s] = 1.0
        fmask = np.zeros(n, dtype=bool)
        fmask[s] = True
        level = 0
        while fmask.any():
            e_sel = fmask[coo_src]
            tgt, org = coo_dst[e_sel], coo_src[e_sel]
            new = dist[tgt] == -1
            dist[tgt[new]] = level + 1
            on_next = dist[tgt] == level + 1
            np.add.at(sigma, tgt[on_next], sigma[org[on_next]])
            fmask = np.zeros(n, dtype=bool)
            fmask[tgt[new]] = True
            level += 1
        delta = np.zeros(n, dtype=np.float64)
        for lev in range(level, 0, -1):
            e_sel = (dist[coo_src] == lev) & (dist[coo_dst] == lev - 1)
            v, w = coo_src[e_sel], coo_dst[e_sel]
            np.add.at(delta, w, sigma[w] / sigma[v] * (1.0 + delta[v]))
        delta[s] = 0.0
        bc += delta
    return bc


def approx_betweenness(edges, *, u: str = "u", v: str = "v",
                       n_sources: int | None = 64, seed: int = 7,
                       concurrency: int = 8):
    """Approximate betweenness centrality (Brandes–Pich 2007:
    sampled-source exact dependency accumulation, scaled by n/k) over
    an UNDIRECTED edge Dataset of distinct pairs — the
    bridging-node/bottleneck score of the graph-analytics family.

    Tiering contract (same as :func:`triangle_counts` /
    :func:`pagerank` broadcast tier): the DISTINCT-EDGE list is
    graph-sized, not corpus-sized — it is collected once, packed into
    two int32 COO arrays (both directions), and broadcast via
    ``ray.put``; each Ray task then runs an independent batch of
    sampled sources against the shared arrays (embarrassingly
    parallel — THE standard way betweenness scales, since per-source
    work is inherently a full BFS). Source sampling is deterministic
    and layout-independent: the ``n_sources`` smallest
    ``splitmix64(node_rank)`` values over the sorted node list.
    ``n_sources=None`` runs every node = EXACT betweenness (the pytest
    gate). Returns (node, bc) with the undirected double-count halved
    and the n/k Brandes–Pich scaling applied."""
    import ray

    from sigraph_ray.functions.hashing import splitmix64

    pdf = edges.to_pandas()
    nodes = np.unique(np.concatenate([pdf[u].to_numpy(),
                                      pdf[v].to_numpy()]))
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": pd.Series(dtype="object"),
                             "bc": pd.Series(dtype="float64")})
    idx = pd.Series(np.arange(n), index=nodes)
    a = idx[pdf[u]].to_numpy(np.int64)
    b = idx[pdf[v]].to_numpy(np.int64)
    coo_src = np.concatenate([a, b])
    coo_dst = np.concatenate([b, a])

    if n_sources is None or n_sources >= n:
        chosen = np.arange(n)
        scale = 1.0
    else:
        h = splitmix64((np.arange(n) + np.uint64(seed)).astype(np.uint64))
        chosen = np.argsort(h, kind="stable")[:n_sources]
        scale = n / float(n_sources)

    src_ref = ray.put(coo_src)
    dst_ref = ray.put(coo_dst)

    @ray.remote
    def run_batch(srcs, s_ref, d_ref):
        return _brandes_batch(s_ref, d_ref, n, srcs)

    nch = min(max(1, concurrency), len(chosen))
    refs = [run_batch.remote(c, src_ref, dst_ref)
            for c in np.array_split(chosen, nch) if len(c)]
    bc = sum(ray.get(refs)) * (scale / 2.0)   # halve: undirected pairs
    out = pd.DataFrame({"node": nodes, "bc": bc})
    return out.sort_values(["bc", "node"],
                           ascending=[False, True]).reset_index(drop=True)


def pointer_double_roots(nodes, *, node: str = "node",
                         parent: str = "parent",
                         max_rounds: int = 8):
    """Forest ancestor resolution by POINTER DOUBLING (Wyllie '79 /
    Shiloach-Vishkin lineage): every node finds its root and depth in
    O(log depth) self-join ROUNDS instead of O(depth) sequential hops
    — the distributed primitive behind hierarchy rollups, dependency
    attribution, and union-find finalization at scale.

    Input: a Dataset of ``(node, parent)`` rows, ``parent`` NULL for
    roots, forest-shaped (acyclic — guaranteed by construction when
    parent < node). State per node is ``(anc, d)`` = an ancestor and
    its edge distance; roots carry ``(self, 0)``. Each round joins the
    state to itself through ``anc`` so every pointer jumps to its
    ancestor's ancestor and ``d`` doubles — after r rounds every chain
    of depth ≤ 2^r is resolved (``max_rounds=8`` covers depth 256; a
    chain that deep in a crawl-derived forest means a data bug, and
    CONVERGENCE IS ASSERTED, never silently truncated). Each round is
    ONE bounded sort-merge join on a node-sized table — corpus rows
    never enter the iteration.

    Returns ``(node, root, depth)``."""
    from sigraph_ray.stages.joins import sorted_merge_join

    def init(df: pd.DataFrame) -> pd.DataFrame:
        isroot = df[parent].isna()
        return pd.DataFrame({
            "node": df[node],
            "anc": df[parent].where(~isroot, df[node]),
            "d": np.where(isroot, 0, 1).astype("int64")})

    state = nodes.map_batches(init, batch_format="pandas").materialize()

    for _ in range(max_rounds):
        hop = state.map_batches(
            lambda df: df.rename(columns={"node": "anc",
                                          "anc": "anc_next",
                                          "d": "d_next"}),
            batch_format="pandas")
        joined = sorted_merge_join(state, hop, on="anc",
                                   left_cols=["node", "d"],
                                   right_cols=["anc_next", "d_next"])

        def jump(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": df["node"],
                "anc": df["anc_next"],
                "d": (df["d"] + df["d_next"]).astype("int64")})

        state = joined.map_batches(jump,
                                   batch_format="pandas").materialize()

    # convergence assert, DISTRIBUTED (no driver-side node set): one
    # verification hop — a state row is converged iff its ancestor's
    # own state row carries d == 0 (roots are the unique fixed points)
    hop = state.map_batches(
        lambda df: df.rename(columns={"node": "anc", "anc": "anc_next",
                                      "d": "d_next"}),
        batch_format="pandas")
    check = sorted_merge_join(state, hop, on="anc",
                              left_cols=["node"],
                              right_cols=["d_next"])
    n_bad = check.filter(expr="d_next > 0").count()
    if n_bad:
        raise RuntimeError(
            f"pointer doubling did not converge in {max_rounds} rounds "
            f"({n_bad} chains deeper than {2 ** max_rounds})")
    return state.map_batches(
        lambda df: df.rename(columns={"anc": "root", "d": "depth"})
        [["node", "root", "depth"]],
        batch_format="pandas")
