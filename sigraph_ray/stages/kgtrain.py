"""KG-embedding training-data operators — the step after graph
materialization when the graph feeds a TransE/DistMult-style trainer:
every true triple needs corrupted negatives, sampled DETERMINISTICALLY
so shards are reproducible at any parallelism (Bordes et al., NeurIPS
2013 negative sampling, made hash-deterministic).

Beyond-reference operator (the reference stops at the Neo4j graph;
SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _h16(keys: list[str]) -> np.ndarray:
    """16-bit md5 prefix (matches the SQL oracle's 4-nibble
    arithmetic). CONTRACT: mod-sampling with this prefix is uniform
    only for vocabularies < 2¹⁶ — at web scale widen to ``h[:8]``
    (32-bit) and the oracle's nibble expansion with it."""
    from sigraph_ray.functions.hashing import md5_hex

    return np.array([int(h[:4], 16) for h in md5_hex(keys)],
                    dtype="int64")


def negative_samples(edges, *, src: str = "src", type_col: str = "type",
                     dst: str = "dst"):
    """One deterministic corrupted-tail negative per true edge:
    ``neg_dst = entity[ md5_16(src|type|dst) mod |entities| ]``, with
    self-corruptions (``neg_dst == dst``) and accidental TRUE triples
    filtered exactly.

    Dataflow: the entity vocabulary is ranked once (one sort + the
    O(#blocks) row-offset stitch — vocabulary-sized, not edge-sized);
    corrupted tails attach by ONE sorted-merge join on the rank; the
    accidental-positive filter is the Bloom-prefiltered exact ANTI
    join (only Bloom-positive candidates reach a shuffle). Every
    stage is a pure function of the triple bytes, so output is
    identical at any block layout — the property a resumable training
    export needs."""
    from sigraph_ray.stages.bloom import bloom_semi_anti
    from sigraph_ray.stages.collect import sorted_distinct
    from sigraph_ray.stages.joins import sorted_merge_join
    from sigraph_ray.stages.ordering import _global_positions

    uniq = sorted_distinct(edges, [src, type_col, dst]).materialize()

    # --- entity vocabulary, globally ranked ------------------------------
    ents = sorted_distinct(
        uniq.map_batches(lambda t: pa.table({"ent": t.column(dst),
                                             "ent2": t.column(dst)}),
                         batch_format="pyarrow"), ["ent", "ent2"])
    ents_sorted = ents.sort(["ent", "ent2"])

    def make_out(t: pa.Table, offset: int) -> pa.Table:
        return pa.table({"idx": pa.array(
            np.arange(offset, offset + t.num_rows, dtype="int64")),
            "neg_dst": t.column("ent")})

    ranked = _global_positions(ents_sorted, make_out)
    n_ents = int(ranked.count())

    # --- deterministic corrupted index per true edge ----------------------
    def corrupt(df: pd.DataFrame) -> pd.DataFrame:
        keys = (df[src] + "|" + df[type_col] + "|" + df[dst]).tolist()
        return pd.DataFrame({src: df[src], type_col: df[type_col],
                             dst: df[dst],
                             "idx": _h16(keys) % n_ents})

    cand = sorted_merge_join(
        uniq.map_batches(corrupt, batch_format="pandas"),
        ranked, on="idx",
        left_cols=[src, type_col, dst], right_cols=["neg_dst"])

    def keyed(df: pd.DataFrame) -> pa.Table:
        d = df[df["neg_dst"] != df[dst]]
        out = d[[src, type_col, "neg_dst"]].copy()
        out["negk"] = d[src] + "|" + d[type_col] + "|" + d["neg_dst"]
        # arrow out: empty post-filter blocks break the pandas size
        # estimator (noisy per-block warnings); Arrow tables don't
        return pa.Table.from_pandas(out, preserve_index=False)

    true_keys = uniq.map_batches(
        lambda df: pd.DataFrame(
            {"truek": df[src] + "|" + df[type_col] + "|" + df[dst]}),
        batch_format="pandas")

    neg = bloom_semi_anti(
        cand.map_batches(keyed, batch_format="pandas"), true_keys,
        left_key="negk", right_key="truek", anti=True)
    return neg.map_batches(
        lambda df: df[[src, type_col, "neg_dst"]],
        batch_format="pandas")


def _init_vecs(ids: np.ndarray, d: int, salt: str) -> np.ndarray:
    """Deterministic embedding init: row j of entity e comes from
    splitmix64(token_hash(salt:e) + j) mapped to [-0.5, 0.5), then
    L2-normalized — identical in any process, no RNG state."""
    from sigraph_ray.functions.hashing import splitmix64, token_hashes

    base = token_hashes([f"{salt}:{i}" for i in ids])
    cols = []
    for j in range(d):
        h = splitmix64(base + np.uint64(j))
        cols.append(h.astype(np.float64) / 2.0 ** 64 - 0.5)
    m = np.stack(cols, axis=1)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(norms > 0, norms, 1.0)


def transe_epoch(edges, *, src: str = "src", type_col: str = "type",
                 dst: str = "dst", dim: int = 16, lr: float = 0.1,
                 margin: float = 1.0):
    """ONE TransE epoch (Bordes et al., NeurIPS 2013) over the
    constructed graph, as dataflow: training pairs are the true edges
    joined with their deterministic corrupted tails (same md5-keyed
    RULE as :func:`negative_samples` but over this function's OWN
    entity pool — src∪dst, the pool the epoch embeds — where
    negative_samples ranks dst-only entities, so the modulus and the
    drawn negatives differ between the two functions;
    self-corruptions dropped, accidental trues retained — Bordes'
    unfiltered TRAINING setting; the filtered variant composes
    :func:`negative_samples`' Bloom anti-join), the
    entity/relation matrices are vocabulary-sized state broadcast once
    via ``ray.put``, each block emits SPARSE per-entity gradient rows
    ((kind, id, component) long form — touched entities only, the
    parameter-server update as a grouped-sum stitch), and the driver
    applies one SGD step to the bounded matrices. Returns
    (loss_before, loss_after, n_pairs) plus the updated matrices —
    loss recomputed in a second streaming pass with the updated
    broadcast.

    Deterministic end to end: hash init, hash corruption, margin-loss
    subgradient with the 0-at-boundary convention; pytest matches a
    single-process numpy epoch to 1e-9."""
    import ray

    from sigraph_ray.stages.collect import sorted_distinct, \
        sorted_groupby_sum
    from sigraph_ray.stages.joins import sorted_merge_join
    from sigraph_ray.stages.ordering import _global_positions

    uniq = sorted_distinct(edges, [src, type_col, dst]).materialize()

    ents = sorted_distinct(
        uniq.map_batches(lambda t: pa.table({"ent": t.column(dst),
                                             "ent2": t.column(dst)}),
                         batch_format="pyarrow")
        .union(uniq.map_batches(
            lambda t: pa.table({"ent": t.column(src),
                                "ent2": t.column(src)}),
            batch_format="pyarrow")), ["ent", "ent2"])
    ents = sorted_distinct(ents, ["ent", "ent2"]).sort(["ent", "ent2"])

    def make_out(t: pa.Table, offset: int) -> pa.Table:
        return pa.table({"idx": pa.array(
            np.arange(offset, offset + t.num_rows, dtype="int64")),
            "neg_dst": t.column("ent")})

    ranked = _global_positions(ents, make_out).materialize()
    ent_ids = (ranked.to_pandas().sort_values("idx")["neg_dst"]
               .to_numpy())
    n_ents = len(ent_ids)
    rel_ids = np.sort(uniq.map_batches(
        lambda df: df[[type_col]].drop_duplicates(),
        batch_format="pandas").to_pandas()[type_col].unique())

    ent_idx = pd.Index(ent_ids)
    rel_idx = pd.Index(rel_ids)
    E = _init_vecs(ent_ids, dim, "ent")
    R = _init_vecs(rel_ids, dim, "rel")

    # training pairs: true edge + corrupted tail (tail-only corruption)
    def corrupt(df: pd.DataFrame) -> pd.DataFrame:
        keys = (df[src] + "|" + df[type_col] + "|" + df[dst]).tolist()
        return pd.DataFrame({src: df[src], type_col: df[type_col],
                             dst: df[dst],
                             "idx": _h16(keys) % n_ents})

    pairs = sorted_merge_join(
        uniq.map_batches(corrupt, batch_format="pandas"),
        ranked, on="idx",
        left_cols=[src, type_col, dst], right_cols=["neg_dst"])
    pairs = pairs.map_batches(
        lambda df: df[df["neg_dst"] != df[dst]],
        batch_format="pandas").materialize()

    def pass_fn(state_ref, emit_grads: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            e_idx, r_idx, e_m, r_m = ray.get(state_ref)
            s = e_m[e_idx.get_indexer(df[src].to_numpy())]
            p = r_m[r_idx.get_indexer(df[type_col].to_numpy())]
            o = e_m[e_idx.get_indexer(df[dst].to_numpy())]
            o2 = e_m[e_idx.get_indexer(df["neg_dst"].to_numpy())]
            dp = s + p - o
            dn = s + p - o2
            ndp = np.linalg.norm(dp, axis=1)
            ndn = np.linalg.norm(dn, axis=1)
            viol = margin + ndp - ndn > 0
            loss = np.where(viol, margin + ndp - ndn, 0.0).sum()
            if not emit_grads:
                return pd.DataFrame(
                    {"kind": ["L", "L"], "id": ["loss", "n"],
                     "k": [0, 1], "v": [float(loss), float(len(df))]})
            # subgradients on violating pairs: d||x|| /dx = x/||x||
            gp = np.zeros_like(dp)
            gn = np.zeros_like(dn)
            vz = viol & (ndp > 0)
            gp[vz] = dp[vz] / ndp[vz, None]
            vz2 = viol & (ndn > 0)
            gn[vz2] = dn[vz2] / ndn[vz2, None]
            rows = []
            for kind, ids, g in (
                    ("E", df[src].to_numpy(), gp - gn),
                    ("E", df[dst].to_numpy(), -gp),
                    ("E", df["neg_dst"].to_numpy(), gn),
                    ("R", df[type_col].to_numpy(), gp - gn)):
                t = pd.DataFrame({"id": np.repeat(ids, dim),
                                  "k": np.tile(np.arange(dim), len(ids)),
                                  "v": g.ravel()})
                t = t[t["v"] != 0.0]
                t["kind"] = kind
                rows.append(t)
            out = pd.concat(rows, ignore_index=True)
            out = (out.groupby(["kind", "id", "k"], sort=False)["v"]
                   .sum().reset_index())
            loss_row = pd.DataFrame(
                {"kind": ["L", "L"], "id": ["loss", "n"], "k": [0, 1],
                 "v": [float(loss), float(len(df))]})
            return pd.concat([out, loss_row], ignore_index=True)
        return fn

    state0 = ray.put((ent_idx, rel_idx, E, R))
    folded = sorted_groupby_sum(
        pairs.map_batches(pass_fn(state0, True), batch_format="pandas"),
        key=["kind", "id", "k"], sum_cols={"v": "v"}).to_pandas()

    loss_before = float(
        folded.loc[(folded["kind"] == "L") & (folded["id"] == "loss"),
                   "v"].sum())
    n_pairs = int(folded.loc[(folded["kind"] == "L")
                             & (folded["id"] == "n"), "v"].sum())

    E2, R2 = E.copy(), R.copy()
    ge = folded[folded["kind"] == "E"]
    if len(ge):
        E2[ent_idx.get_indexer(ge["id"].to_numpy()),
           ge["k"].to_numpy(np.int64)] -= lr * ge["v"].to_numpy()
    gr = folded[folded["kind"] == "R"]
    if len(gr):
        R2[rel_idx.get_indexer(gr["id"].to_numpy()),
           gr["k"].to_numpy(np.int64)] -= lr * gr["v"].to_numpy()

    state1 = ray.put((ent_idx, rel_idx, E2, R2))
    after = sorted_groupby_sum(
        pairs.map_batches(pass_fn(state1, False), batch_format="pandas"),
        key=["kind", "id", "k"], sum_cols={"v": "v"}).to_pandas()
    loss_after = float(
        after.loc[after["id"] == "loss", "v"].sum())

    summary = pd.DataFrame({
        "n_pairs": [n_pairs],
        "loss_before": [loss_before / max(n_pairs, 1)],
        "loss_after": [loss_after / max(n_pairs, 1)]})
    return summary, (ent_ids, E2), (rel_ids, R2)


def transe_rank_eval(edges, ent_ids: np.ndarray, E: np.ndarray,
                     rel_ids: np.ndarray, R: np.ndarray, *,
                     src: str = "src", type_col: str = "type",
                     dst: str = "dst"):
    """RAW link-prediction ranking metrics (Bordes et al.: rank of the
    true tail among ALL entities by ||s+p−e||, unfiltered, ties broken
    by entity rank): returns one row (mrr, hits1, hits10, n).

    The entity matrix is the broadcast bound (``ray.put`` once); each
    block computes its b×|E| squared-distance matrix as one matmul and
    emits FOUR scalars (Σ1/rank, Σ[rank≤1], Σ[rank≤10], n) — the
    evaluation streams, only scalar partials fold. Squared distances
    preserve the ranking; ties use the deterministic entity order so
    the result is layout-invariant."""
    import ray

    ent_idx = pd.Index(ent_ids)
    rel_idx = pd.Index(rel_ids)
    e_norms = (E * E).sum(axis=1)
    state_ref = ray.put((ent_idx, rel_idx, E, R, e_norms))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        e_ix, r_ix, e_m, r_m, en = ray.get(state_ref)
        if len(df) == 0:
            return pd.DataFrame({"k": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="float64")})
        q = (e_m[e_ix.get_indexer(df[src].to_numpy())]
             + r_m[r_ix.get_indexer(df[type_col].to_numpy())])
        ti = e_ix.get_indexer(df[dst].to_numpy())
        # ||q - e||² = ||q||² - 2 q·e + ||e||²; ||q||² constant per row
        d2 = en[None, :] - 2.0 * (q @ e_m.T)
        dt = d2[np.arange(len(df)), ti]
        smaller = (d2 < dt[:, None]).sum(axis=1)
        tie_before = ((d2 == dt[:, None])
                      & (np.arange(len(en))[None, :] < ti[:, None])
                      ).sum(axis=1)
        rank = 1 + smaller + tie_before
        return pd.DataFrame({
            "k": np.arange(4, dtype="int64"),
            "v": [float((1.0 / rank).sum()), float((rank <= 1).sum()),
                  float((rank <= 10).sum()), float(len(df))]})

    g = (edges.map_batches(partial, batch_format="pandas")
         .to_pandas().groupby("k")["v"].sum())
    n = g[3]
    return pd.DataFrame({"mrr": [g[0] / n], "hits1": [g[1] / n],
                         "hits10": [g[2] / n], "n": [int(n)]})


def random_walks(edges, *, src: str = "src", dst: str = "dst",
                 length: int = 4):
    """Deterministic DeepWalk-style corpus generation (Perozzi et al.,
    KDD 2014): one walk per node, each step choosing
    ``neighbors[md5_16(node|step) mod degree]`` — a pure function of
    the graph bytes, so the corpus is identical at any parallelism
    (the reproducibility a training export needs; a seeded variant
    just salts the hash). Sink nodes hold in place (self-stay padding)
    so every walk has exactly ``length + 1`` nodes.

    Dataflow: adjacency lists co-locate once via ``sorted_collect``
    (degree-bounded; cap degenerate hubs with its ``max_members``
    guard at web scale), then each step is ONE bounded sorted-merge
    join of the walk frontier against the adjacency — k steps = k
    joins, no driver-side graph. Returns (walk_id, path) with path
    '>'-joined."""
    from sigraph_ray.stages.collect import sorted_collect, sorted_distinct
    from sigraph_ray.stages.joins import sorted_merge_join

    pairs = sorted_distinct(edges, [src, dst])
    adj = sorted_collect(pairs, key=src, order_col=dst, value=dst)
    # neighbors as one ','-joined string: list columns don't survive
    # Arrow conversion inside the join's range sort; strings do
    adj = adj.map_batches(
        lambda df: pd.DataFrame({"cur": df[src],
                                 "nbrs": df["values"].map(",".join)}),
        batch_format="pandas").materialize()

    nodes = sorted_distinct(
        pairs.map_batches(lambda t: pa.table({"n": t.column(src)}),
                          batch_format="pyarrow")
        .union(pairs.map_batches(lambda t: pa.table({"n": t.column(dst)}),
                                 batch_format="pyarrow")), ["n"])

    state = nodes.map_batches(
        lambda df: pd.DataFrame({"walk_id": df["n"], "cur": df["n"],
                                 "path": df["n"]}),
        batch_format="pandas")

    for step in range(length):
        joined = sorted_merge_join(
            state, adj, on="cur",
            left_cols=["walk_id", "path"], right_cols=["nbrs"])

        def advance(df: pd.DataFrame, *, _step=step) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"walk_id": df.get("walk_id"),
                                     "cur": pd.Series(dtype="object"),
                                     "path": pd.Series(dtype="object")})
            h = _h16((df["walk_id"] + "|" + str(_step)).tolist())
            nbrs = df["nbrs"].str.split(",")
            deg = nbrs.str.len().to_numpy()
            pick = h % deg
            nxt = np.array([nb[i] for nb, i
                            in zip(nbrs, pick)], dtype=object)
            return pd.DataFrame({"walk_id": df["walk_id"],
                                 "cur": nxt,
                                 "path": df["path"] + ">" + nxt})

        stepped = joined.map_batches(advance, batch_format="pandas")
        # sink self-stay: nodes absent from adj keep their position
        from sigraph_ray.stages.bloom import bloom_semi_anti

        stuck = bloom_semi_anti(state, adj, left_key="cur",
                                right_key="cur", anti=True)
        stuck = stuck.map_batches(        # arrow out: empty-block-safe
            lambda t: pa.table({"walk_id": t.column("walk_id"),
                                "cur": t.column("cur"),
                                "path": pc.binary_join_element_wise(
                                    t.column("path"), t.column("cur"),
                                    ">")}),
            batch_format="pyarrow")
        state = stepped.union(stuck).materialize()

    return state.map_batches(
        lambda df: df[["walk_id", "path"]], batch_format="pandas")
