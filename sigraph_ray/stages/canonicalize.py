"""Shuffle 1 — entity canonicalization (U1) and alias merge (G4).

Reference semantics: ``add_graph_documents(baseEntityLabel=True)``
merges ``__Entity__`` nodes by normalized id across all chunks and
documents (src/ai/ai_agent.py:249-255); the id normalization itself is
E1/E2 (:394-403). In batch form the "have I seen this entity" index
(Neo4j MERGE + unique constraint, schema.py:11-21) disappears into a
groupby-aggregate shuffle on the normalized surface form (SURVEY.md
§3.4).

Skew handling (SURVEY.md §4.2): entity surface forms are Zipf-heavy
(one malware family dominates a crawl slice the way
``explorer.exe@PROCESS`` dominates provenance events), so the
aggregation is TWO-PHASE — a per-batch combiner inside ``map_batches``
emits at most one partial row per (entity, type) per batch, and only
those partials hit the groupby shuffle. The hot key's final group then
holds ≤ n_batches rows instead of n_mentions rows; no single reducer
sees the raw mention stream.

:func:`connected_components` is the generic alias-merge / G4 operator —
deterministic hash-min label propagation over an undirected edge list,
converging in ≤ O(log n) rounds of groupby-min; the canonical component
id is the lexicographic minimum member (stable across parallelism
levels, SURVEY.md §7.3).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Max, Min, Sum


def _entity_partials(batch: pa.Table) -> pa.Table:
    """Combiner: mention stream → (entity, entity_type, n) partials,
    one row per key per batch."""
    df = batch.select(["subj", "subj_type"]).rename_columns(
        ["entity", "entity_type"]).to_pandas()
    df2 = batch.select(["obj", "obj_type"]).rename_columns(
        ["entity", "entity_type"]).to_pandas()
    allm = pd.concat([df, df2], ignore_index=True)
    part = (allm.groupby(["entity", "entity_type"], sort=False)
            .size().rename("n").reset_index())
    return pa.Table.from_pandas(part, preserve_index=False)


def _entity_finalize(group: pd.DataFrame) -> pd.DataFrame:
    """Final merge per entity: total mentions; type = the type with the
    most mentions, ties broken lexicographically (deterministic)."""
    n = int(group["n"].sum())
    bytype = group.groupby("entity_type")["n"].sum()
    etype = bytype.sort_index().sort_values(kind="stable", ascending=False).index[0]
    return pd.DataFrame({
        "entity": [group["entity"].iloc[0]],
        "entity_type": [etype],
        "n_mentions": [n],
    })


def canonicalize_entities(triples):
    """Triple Dataset → canonical entity (node) table.

    Two-phase aggregate as described in the module docstring; the output
    is one row per normalized entity key.
    """
    partials = triples.map_batches(_entity_partials, batch_format="pyarrow")
    return finalize_entity_partials(partials)


# Closed entity-type vocabulary (functions/verbs.TYPE_RULES targets +
# defaults), lexicographically sorted — the argmax encoding below relies
# on it. Types outside the vocabulary get code 0 (sorts last on ties).
ENTITY_TYPE_VOCAB = ("Entity", "File", "Network", "Process", "Registry")
_TYPE_TO_CODE = {t: len(ENTITY_TYPE_VOCAB) - i
                 for i, t in enumerate(ENTITY_TYPE_VOCAB)}
_CODE_TO_TYPE = {c: t for t, c in _TYPE_TO_CODE.items()}
_ENC_BASE = 16  # > len(vocab)


def finalize_entity_partials(partials):
    """(entity, entity_type, n) partials → (entity, entity_type,
    n_mentions), fully vectorized (no per-group Python):

    1. groupby(entity, entity_type) Sum(n)  — global per-type counts;
    2. encode ``enc = n * 16 + code(type)`` where code is descending in
       lexicographic type order, so ``max(enc)`` picks the
       most-mentioned type with ties broken lexicographically —
       identical to :func:`_entity_finalize`;
    3. groupby(entity) Max(enc) + Sum(n).
    """
    from sigraph_ray.stages.collect import sorted_groupby_agg

    # entity-keyed inputs are row-heavy (≈ one row per entity per
    # batch): both phases run as range-sort + blockwise stitch
    bytype = sorted_groupby_agg(partials, key=["entity", "entity_type"],
                                aggs={"n": ("n", "sum")})

    def encode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        codes = pa.array([_TYPE_TO_CODE.get(v, 0)
                          for v in t.column("entity_type").to_pylist()],
                         pa.int64())
        enc = pc.add(pc.multiply(pc.cast(t.column("n"), pa.int64()),
                                 pa.scalar(_ENC_BASE)), codes)
        return pa.table({"entity": t.column("entity"),
                         "enc": enc, "n": t.column("n")})

    agg = sorted_groupby_agg(
        bytype.map_batches(encode, batch_format="pyarrow"),
        key="entity", aggs={"enc": ("enc", "max"),
                            "n_mentions": ("n", "sum")})

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        enc = t.column("enc").to_pylist()
        types = [_CODE_TO_TYPE.get(e % _ENC_BASE, "Entity") for e in enc]
        return pa.table({
            "entity": t.column("entity"),
            "entity_type": pa.array(types, pa.string()),
            "n_mentions": pc.cast(t.column("n_mentions"), pa.int64()),
        })

    return agg.map_batches(decode, batch_format="pyarrow")


# --- G4: connected components (alias merge) --------------------------------

def _cc_seed(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    u = batch.column("u")
    v = batch.column("v")
    node = pa.concat_arrays([_comb(u), _comb(v)])
    comp = pa.concat_arrays([_comb(pc.min_element_wise(u, v))] * 2)
    return pa.table({"node": node, "comp": comp})


def _comb(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _union_find_task_labels(edge_refs):
    """Exact min-label union-find over a BOUNDED edge set, run inside
    one Ray worker task (the actor-index pattern — blocks are read
    from the object store; nothing touches the driver)."""
    import ray

    @ray.remote
    def _uf(refs):
        parent: dict = {}
        seen: set = set()

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for t in ray.get(list(refs)):
            if t.num_rows == 0 or "u" not in t.column_names:
                continue  # empty blocks may carry degenerate schemas
            for u, v in zip(t.column("u").to_pylist(),
                            t.column("v").to_pylist()):
                seen.add(u)
                seen.add(v)
                ru, rv = find(u), find(v)
                if ru != rv:
                    lo, hi = (ru, rv) if ru < rv else (rv, ru)
                    parent[hi] = lo
        nodes = sorted(seen)
        return pd.DataFrame({"node": nodes,
                             "comp": [find(x) for x in nodes]})

    return _uf.remote(edge_refs)


def connected_components(edges, *, max_rounds: int = 12,
                         num_partitions: int = 16, node_type=None,
                         small_graph_rows: int = 500_000):
    """Undirected connected components over an edge Dataset with
    columns (u, v) → Dataset of (node, comp) where ``comp`` is the
    minimum member of the node's component (lexicographic for string
    ids, numeric for integer ids). ``node_type`` (pyarrow DataType,
    default string) schema-normalizes every join input so sparse/empty
    partitions cannot reach the Acero kernel untyped (stages/joins.py).

    Deterministic hash-min label propagation: each round joins current
    labels onto the edge list and takes the per-node minimum label;
    terminates early when a round changes nothing. Convergence needs
    O(component diameter) rounds; when the budget is exhausted without
    convergence a WARNING is logged (labels may then be split across
    multiple clusters of one true component) — raise ``max_rounds``
    for chain-shaped components. (A pointer-doubling shortcut join
    would give O(log diameter) but triples the per-round hash-pool
    churn; two concurrent join pools per round is already the
    scheduling limit at small CPU counts, see stages/joins.py.)

    Edge sets of ≤ ``small_graph_rows`` take a fast path: exact
    union-find inside ONE Ray worker task reading the materialized
    blocks from the object store (identical labels; several
    join+groupby rounds collapse into one bounded task — the same
    "index fits one worker" tier the traversal kernels use). Larger
    graphs run the distributed rounds.
    """
    import logging

    import ray
    import ray.data as rd

    from sigraph_ray.stages.joins import safe_join

    nt = node_type if node_type is not None else pa.string()
    edge_schema = pa.schema([("u", nt), ("v", nt)])
    label_schema = pa.schema([("node", nt), ("comp", nt)])

    if small_graph_rows:
        edges = edges.materialize()
        if edges.count() <= small_graph_rows:
            refs = list(edges.to_arrow_refs())
            # labels stay in the object store (from_pandas_refs) — the
            # driver never holds them
            out = rd.from_pandas_refs([_union_find_task_labels(refs)])
            return out if out.count() else rd.from_arrow(
                label_schema.empty_table())

    labels = (edges.map_batches(_cc_seed, batch_format="pyarrow")
              .groupby("node").aggregate(Min("comp", alias_name="comp")))

    converged = False
    prev_sig = _label_signature(labels.materialize())
    labels = labels.materialize()
    for _ in range(max_rounds):
        # propagate: for each edge (u,v): candidate label for v is
        # label(u) and vice versa
        lab_u = safe_join(labels, edges, "inner", num_partitions,
                          ("node",), right_on=("u",),
                          left_schema=label_schema, right_schema=edge_schema)
        msgs_v = lab_u.map_batches(
            lambda t: pa.table({"node": t.column("v"), "comp": t.column("comp")}),
            batch_format="pyarrow")
        lab_v = safe_join(labels, edges, "inner", num_partitions,
                          ("node",), right_on=("v",),
                          left_schema=label_schema, right_schema=edge_schema)
        msgs_u = lab_v.map_batches(
            lambda t: pa.table({"node": t.column("u"), "comp": t.column("comp")}),
            batch_format="pyarrow")
        new_labels = (labels.union(msgs_v).union(msgs_u)
                      .groupby("node")
                      .aggregate(Min("comp", alias_name="comp"))
                      .materialize())
        # convergence check: labels shrink monotonically, so the label
        # multiset is unchanged iff its (count, 2×independent-hash-sum)
        # signature is unchanged — ONE map pass over the materialized
        # label table (the previous union+groupby comparison cost a
        # full extra shuffle per round)
        sig = _label_signature(new_labels)
        if sig == prev_sig and _labels_equal_exact(labels, new_labels):
            # the cheap signature is probabilistic (~2^-62 collision per
            # round); convergence is correctness-bearing, so the round
            # that CLAIMS convergence is confirmed exactly once with a
            # ±1-count groupby (one extra shuffle total per CC call, not
            # per round). A collision just means we keep iterating.
            labels = new_labels
            converged = True
            break
        labels = new_labels
        prev_sig = sig
    if not converged:
        logging.getLogger(__name__).warning(
            "connected_components: round budget (%d) exhausted without "
            "convergence — components wider than the budget may be split",
            max_rounds)
    return labels


def _sig_partial(t: pa.Table) -> pa.Table:
    """Per-block (count, hash-sum, hash-sum') partial of the label
    multiset — order-insensitive, so any block layout yields the same
    global signature."""
    import numpy as np

    from sigraph_ray.functions.hashing import splitmix64

    df = t.to_pandas()
    if len(df) == 0:
        return pa.table({"n": pa.array([0], pa.int64()),
                         "s1": pa.array([0], pa.int64()),
                         "s2": pa.array([0], pa.int64())})
    keys = df["node"].astype(str).str.cat(df["comp"].astype(str), sep="\x1f")
    h = pd.util.hash_pandas_object(keys, index=False).to_numpy().astype(np.uint64)
    h2 = splitmix64(h ^ np.uint64(0xDEADBEEF12345678))
    return pa.table({
        "n": pa.array([len(df)], pa.int64()),
        "s1": pa.array([int((h & np.uint64(0x7FFFFFFF)).sum())], pa.int64()),
        "s2": pa.array([int((h2 & np.uint64(0x7FFFFFFF)).sum())], pa.int64()),
    })


def _labels_equal_exact(a, b) -> bool:
    """Exact multiset equality of two (node, comp) tables: tag each side
    ±1, groupby(node, comp), sum — equal iff every group sums to 0.
    One shuffle; run only on the round that claims convergence."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def tag(delta):
        def _t(t: pa.Table) -> pa.Table:
            return t.append_column(
                "d", pa.array([delta] * t.num_rows, pa.int64()))
        return _t

    both = (a.map_batches(tag(1), batch_format="pyarrow")
            .union(b.map_batches(tag(-1), batch_format="pyarrow"))
            .groupby(["node", "comp"]).aggregate(Sum("d", alias_name="d")))
    bad = both.map_batches(
        lambda t: pa.table({"bad": pa.array(
            [int(pc.sum(pc.not_equal(t.column("d"),
                                     pa.scalar(0))).as_py() or 0)],
            pa.int64())}),
        batch_format="pyarrow").to_pandas()
    return int(bad["bad"].sum()) == 0


def _label_signature(labels) -> tuple:
    """Order-insensitive multiset signature of a (node, comp) table;
    one map pass, one tiny per-block row pulled to the driver."""
    parts = labels.map_batches(_sig_partial, batch_format="pyarrow").to_pandas()
    return (int(parts["n"].sum()), int(parts["s1"].sum()),
            int(parts["s2"].sum()))
