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

from ray.data.aggregate import Count, Max, Min, Sum


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
    bytype = partials.groupby(["entity", "entity_type"]).aggregate(
        Sum("n", alias_name="n"))

    def encode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        codes = pa.array([_TYPE_TO_CODE.get(v, 0)
                          for v in t.column("entity_type").to_pylist()],
                         pa.int64())
        enc = pc.add(pc.multiply(pc.cast(t.column("n"), pa.int64()),
                                 pa.scalar(_ENC_BASE)), codes)
        return pa.table({"entity": t.column("entity"),
                         "enc": enc, "n": t.column("n")})

    agg = (bytype.map_batches(encode, batch_format="pyarrow")
           .groupby("entity")
           .aggregate(Max("enc", alias_name="enc"),
                      Sum("n", alias_name="n_mentions")))

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


def connected_components(edges, *, max_rounds: int = 12, num_partitions: int = 64):
    """Undirected connected components over an edge Dataset with string
    columns (u, v) → Dataset of (node, comp) where ``comp`` is the
    lexicographic minimum member of the node's component.

    Deterministic hash-min label propagation: each round joins current
    labels onto the edge list and takes the per-node minimum label;
    terminates early when a round changes nothing. Each round is two
    hash shuffles over (edges + labels) — at web scale the alias edge
    set is small relative to triples (SURVEY.md §4.2), and rounds are
    bounded by the component diameter ≤ O(log n) under hash-min.
    """
    labels = (edges.map_batches(_cc_seed, batch_format="pyarrow")
              .groupby("node").aggregate(Min("comp", alias_name="comp")))

    for _ in range(max_rounds):
        # propagate: for each edge (u,v): candidate label for v is
        # label(u) and vice versa
        lab_u = labels.join(edges, join_type="inner",
                            num_partitions=num_partitions,
                            on=("node",), right_on=("u",))
        msgs_v = lab_u.map_batches(
            lambda t: pa.table({"node": t.column("v"), "comp": t.column("comp")}),
            batch_format="pyarrow")
        lab_v = labels.join(edges, join_type="inner",
                            num_partitions=num_partitions,
                            on=("node",), right_on=("v",))
        msgs_u = lab_v.map_batches(
            lambda t: pa.table({"node": t.column("u"), "comp": t.column("comp")}),
            batch_format="pyarrow")
        new_labels = (labels.union(msgs_v).union(msgs_u)
                      .groupby("node").aggregate(Min("comp", alias_name="comp")))
        new_labels = new_labels.materialize()
        # convergence check: any node whose label shrank this round?
        changed = (labels.union(new_labels)
                   .groupby("node")
                   .aggregate(Count(alias_name="c"), Min("comp", alias_name="lo"),
                              Max("comp", alias_name="hi")))
        n_changed = changed.map_batches(
            _count_changed, batch_format="pyarrow").sum("n")
        labels = new_labels
        if not n_changed:
            break
    return labels


def _count_changed(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    neq = pc.not_equal(t.column("lo"), t.column("hi"))
    return pa.table({"n": pa.array([pc.sum(pc.cast(neq, pa.int64())).as_py() or 0],
                                   pa.int64())})
