"""The KG-construction pipeline: web pages → knowledge graph
(SURVEY.md §3.3 Ray-Data restatement, §7.1 P1-P11).

Logical flow (each box one streaming stage, no mid-pipeline
materialization):

    pages(url, warc_ts, html, text, lang)
      → P1 extract_text (drop html immediately)
      → P2 chunk 400/40 (lowercased, E4)
      → P3/P5 TripleExtractor actor pool (V1-V5 contract)
      → V3 per-url actor resolution (groupby url)
      → P6 normalize (E1/E2/E3)
      → dedup distinct (doc_url, subj, pred, obj)   [U9 IoC dedup]
      → fork: entity canonicalization (U1/G4 shuffle)
              edge aggregation by (subj, pred, obj) + §1.4 direction
              MENTIONS pairs (doc_url, entity)      [ai_agent.py:249-255]

The reference stores this in Neo4j via ``add_graph_documents``
(__Entity__ merge-by-id + Document/MENTIONS, src/ai/ai_agent.py:243-255);
here the merge index is the canonicalization shuffle and the output is
sorted Parquet node/edge tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


from sigraph_ray.stages import canonicalize as C
from sigraph_ray.stages import extract as E
from sigraph_ray.stages import triples as T


def synth_pages(n: int, *, parallelism: int = 0):
    """Deterministic synthetic pages Dataset (FIXTURES.md F1) —
    partition-independent, so any parallelism yields identical rows."""
    import ray.data as rd

    from sigraph_ray.sources import synth

    kw = {"override_num_blocks": parallelism} if parallelism else {}
    return rd.range(n, **kw).map_batches(
        lambda b: synth.pages_batch(b["id"]), batch_format="numpy")


def extract_triples_pipeline(pages, *, concurrency=4, batch_size: int = 1024,
                             fused: bool = True, backend=None,
                             pre_extracted: bool = False):
    """pages → deduplicated normalized triple Dataset with columns
    (doc_url, chunk_id, ord, subj, subj_type, pred, obj, obj_type).

    ``fused=True`` (default, the throughput path) keeps every doc-local
    step (chunk → extract → V3 resolve → normalize → per-doc dedup)
    inside one actor-pool stage, so no shuffle happens before the
    canonicalization aggregates. ``fused=False`` runs the same steps as
    separate composable stages (per-url groupby for V3) — identical
    output, used to cross-check the fusion.

    ``backend``: the extractor seam (stages/triples.TripleExtractor) —
    None = deterministic grammar, "ensemble" = A3 debate ensemble, or
    any callable with the chunk-rows→TRIPLE_COLUMNS contract (a
    model-backed actor drops in here).
    """
    if fused:
        docs = pages if pre_extracted else pages.map_batches(
            E.extract_text_batch, batch_format="pyarrow",
            batch_size=batch_size)
        return docs.map_batches(T.DocTripleExtractor,
                                batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency,
                                fn_constructor_kwargs={"backend": backend})
    chunks = (pages.map_batches(E.chunk_batch, batch_format="pyarrow")
              if pre_extracted else E.extract_and_chunk(pages))
    triples = T.extract_triples_stage(
        chunks, concurrency=concurrency, batch_size=batch_size,
        backend=backend)
    # U9/V4 dedup: one triple per (doc_url, subj, pred, obj), keeping the
    # earliest occurrence (min ord) — "keep the clearest instance"
    # (prompt.py:94) made deterministic.
    return dedup_triples(triples)


_DEDUP_KEY = ["doc_url", "subj", "pred", "obj"]


def _triple_dedup_partial(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch min-ord row per key, with the non-key payload
    encoded behind a fixed-width ord prefix so the global arg-min is a
    vectorized string ``Min`` (no per-group Python finalizer)."""
    df = batch.to_pandas()
    idx = df.groupby(_DEDUP_KEY, sort=False)["ord"].idxmin()
    df = df.loc[idx.values]
    v = (df["ord"].astype("int64").astype(str).str.zfill(14) + _SEP
         + df["chunk_id"].astype("int64").astype(str) + _SEP
         + np.where(df["subj_is_generic"], "1", "0") + _SEP
         + df["subj_type"].astype(str) + _SEP + df["obj_type"].astype(str))
    out = df[_DEDUP_KEY].copy()
    out["v"] = v
    return pa.Table.from_pandas(out, preserve_index=False)


def _triple_dedup_decode(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    vals = df["v"].str.split(_SEP, n=4, expand=True)
    return pa.Table.from_pandas(pd.DataFrame({
        "doc_url": df["doc_url"],
        "chunk_id": vals[1].astype("int64"),
        "ord": vals[0].astype("int64"),
        "subj": df["subj"],
        "subj_is_generic": vals[2] == "1",
        "pred": df["pred"],
        "obj": df["obj"],
        "subj_type": vals[3],
        "obj_type": vals[4],
    }), preserve_index=False)


def dedup_triples(triples):
    from sigraph_ray.stages.collect import sorted_groupby_agg

    partials = triples.map_batches(_triple_dedup_partial,
                                   batch_format="pyarrow")
    # triple-stream-sized input (row-heavy): range-sort + blockwise
    # stitch min, not Ray's per-row aggregate reduce
    agg = sorted_groupby_agg(partials, key=_DEDUP_KEY,
                             aggs={"v": ("v", "min")})
    return agg.map_batches(_triple_dedup_decode, batch_format="pyarrow")


def dedup_triples_doc_local(triples):
    """:func:`dedup_triples` for streams whose BLOCKS hold whole
    documents (the fused extraction contract: every emitted block is
    the output of one doc-complete input batch; consumers that must
    preserve it pass ``batch_size=None``). The dedup key LEADS with
    ``doc_url``, so a vectorized per-batch min-``ord`` pick IS the
    global dedup — zero shuffle, against ``dedup_triples``' full range
    sort. Exactness vs the global tier is pytest-enforced on the
    linked path; callers whose layout may split a document (the
    non-fused pipeline's post-stitch blocks) must use the global
    tier."""
    def f(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if len(df) == 0:
            return batch
        idx = df.groupby(_DEDUP_KEY, sort=False)["ord"].idxmin()
        return pa.Table.from_pandas(df.loc[np.sort(idx.values)],
                                    preserve_index=False)

    return triples.map_batches(f, batch_format="pyarrow",
                               batch_size=None)


_SEP = "\x1f"  # unit separator — cannot occur in normalized entities


def _edge_partials(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch mention counts keyed by ONE composite string
    (subj␟subj_type␟pred␟obj␟obj_type) — the shuffle sorts a single
    key column instead of five, and the count is a vectorized Arrow
    value_counts (no pandas groupby)."""
    key = pc.binary_join_element_wise(
        batch.column("subj"), batch.column("subj_type"),
        batch.column("pred"), batch.column("obj"),
        batch.column("obj_type"), _SEP)
    vc = pc.value_counts(key.combine_chunks()
                         if isinstance(key, pa.ChunkedArray) else key)
    return pa.table({"edge_key": vc.field("values"),
                     "n_mentions": pc.cast(vc.field("counts"), pa.int64())})


def _edge_decode(batch: pa.Table) -> pa.Table:
    parts = pc.split_pattern(batch.column("edge_key"), _SEP)
    cols = {}
    for i, name in enumerate(
            ["subj", "subj_type", "pred", "obj", "obj_type"]):
        cols[name] = pc.list_element(parts, i)
    cols["weight"] = batch.column("weight")
    return pa.table(cols)


def build_kg_edges_staged(triples):
    """:func:`build_kg_edges` with an explicit stage boundary at the
    combiner output: the partial stream (≈ distinct-edges × blocks
    rows, tiny next to the corpus) is MATERIALIZED before the stitch
    sort. An actor pool RESERVES its CPUs for the whole streaming
    execution — fused, the post-extraction sort runs on only the
    leftover cores; staged, the pool releases at extraction end and
    the sort gets the full cluster (measured at 1.2M pages/32 cpus:
    117 s fused vs 62 s staged). This is also the natural
    manifest/resume boundary (state/manifest)."""
    from sigraph_ray.stages.blocks import right_size
    from sigraph_ray.stages.collect import sorted_groupby_agg

    partials = right_size(
        triples.map_batches(_edge_partials, batch_format="pyarrow")
        .materialize())
    agg = sorted_groupby_agg(partials, key="edge_key",
                             aggs={"weight": ("n_mentions", "sum")})
    decoded = agg.map_batches(_edge_decode, batch_format="pyarrow")
    return decoded.map_batches(T.triples_with_direction,
                               batch_format="pyarrow")


def build_kg_edges(triples):
    """Global edge table: one row per (subj, pred, obj) with mention
    count (= document count: the triple stream is already deduped per
    (doc_url, subj, pred, obj)), behavioral action_type, and §1.4
    direction applied (src/dst columns). Two-phase aggregate: the
    per-batch combiner shrinks the shuffle to one partial row per key
    per batch, keyed by a single composite string."""
    from sigraph_ray.stages.collect import sorted_groupby_agg

    partials = triples.map_batches(_edge_partials, batch_format="pyarrow")
    # edge-keyed partials stay row-heavy (one row per edge per batch):
    # stitch sum instead of the aggregate reduce
    agg = sorted_groupby_agg(partials, key="edge_key",
                             aggs={"weight": ("n_mentions", "sum")})
    decoded = agg.map_batches(_edge_decode, batch_format="pyarrow")
    return decoded.map_batches(T.triples_with_direction, batch_format="pyarrow")


def _entity_from_edge_partials(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    a = df[["subj", "subj_type", "weight"]].rename(
        columns={"subj": "entity", "subj_type": "entity_type"})
    b = df[["obj", "obj_type", "weight"]].rename(
        columns={"obj": "entity", "obj_type": "entity_type"})
    allm = pd.concat([a, b], ignore_index=True)
    part = (allm.groupby(["entity", "entity_type"], sort=False)["weight"]
            .sum().rename("n").reset_index())
    return pa.Table.from_pandas(part, preserve_index=False)


def entities_from_edges(edges):
    """Canonical entity table derived from the (already aggregated, much
    smaller) edge table — identical to
    :func:`~sigraph_ray.stages.canonicalize.canonicalize_entities` over
    the triple stream (each deduped triple row contributes exactly one
    subj and one obj mention, and edge ``weight`` counts those rows),
    but the big shuffle happens once: entity aggregation reuses it.
    Equivalence is tested (test_kg_e2e.test_entities_from_edges_equal).
    """
    from sigraph_ray.stages.canonicalize import finalize_entity_partials

    partials = edges.map_batches(_entity_from_edge_partials,
                                 batch_format="pyarrow")
    return finalize_entity_partials(partials)


def adopt_links(linked, *, scope: str = "global"):
    """A2 adoption: confident link surfaces replace the mention
    surfaces (``subj``/``obj`` ← ``subj_link``/``obj_link``), then the
    per-doc dedup re-runs — two surfaces of one document collapsing
    onto one canonical entity must yield ONE triple row (U9
    semantics). The entity key space every downstream shuffle
    (canonicalization, edge aggregate, mentions) moves is thereby
    shrunk BEFORE those shuffles run.

    ``scope``: adoption can only create duplicates WITHIN a document
    (the dedup key leads with ``doc_url``), so when the stream's
    blocks hold whole documents (fused extraction + a block-preserving
    link pool), ``scope='doc'`` replaces the global sorted dedup with
    the zero-shuffle per-batch tier (:func:`dedup_triples_doc_local`).
    Default stays ``'global'`` — correct at any layout."""
    def f(t: pa.Table) -> pa.Table:
        keep = [c for c in t.column_names
                if not c.endswith("_link") and not c.endswith("_link_score")]
        sub = {"subj": "subj_link", "obj": "obj_link"}
        return pa.table({c: t.column(sub.get(c, c)) for c in keep})

    renamed = linked.map_batches(f, batch_format="pyarrow",
                                 batch_size=None)
    if scope == "doc":
        return dedup_triples_doc_local(renamed)
    return dedup_triples(renamed)


# doc-local vocab partials below this land on the driver for the final
# df sum + top-N (one pandas pass); above it the range-sort stitch runs
_VOCAB_DRIVER_BYTES = 128 * 2 ** 20


def derive_link_vocab(triples, *, min_df: int = 2,
                      max_terms: int = 100_000,
                      with_mentions: bool = False,
                      doc_local: bool = False):
    """Self-derived canonical vocabulary for the A2 link stage
    (ai_agent.py:126-138: the reference scores mentions against the
    entities already indexed — here the index is the corpus itself):
    entity surfaces mentioned in ≥ ``min_df`` distinct documents,
    top ``max_terms`` by (document frequency desc, surface asc).

    Scale bound: document frequencies come from ONE fused
    count-distinct stitch (``collect.sorted_count_distinct`` — a
    single (entity, doc_url) range sort; composing distinct + grouped
    count would pay two all-to-alls); only the ≤ ``max_terms``
    vocabulary rows ever reach the driver, and the vocabulary is then
    broadcast ONCE via ``ray.put`` (stages/entity_link). Pass the
    MATERIALIZED triple stream — this is a second pass over it.

    ``with_mentions=True`` returns ``(vocab, mentions_ds)``: the
    stitch's per-entity table IS the distinct mention set, so the
    link stage can skip its own ``sorted_distinct`` over the same
    stream (one range sort instead of two). The table is materialized
    once because two consumers (top-N and the scoring tasks) read
    it.

    ``doc_local=True``: for doc-complete blocks (the fused-extraction
    contract) an (entity, doc) pair can never straddle blocks, so the
    per-block dedup partial is already globally distinct and df is a
    plain grouped SUM of per-block per-entity counts — the sort input
    shrinks from corpus-pair-sized to (#blocks × per-block uniques)
    partial rows. Exactness vs the pair-sort tier is pytest-enforced;
    callers with re-blocked/non-fused streams keep the default.

    The doc-local partials are additionally size-gated: when the
    materialized partial table fits ``_VOCAB_DRIVER_BYTES`` the final
    df sum + filter + top-N run in ONE pandas pass on the driver
    (identical (df DESC, surface ASC) semantics, pytest-enforced) —
    the partials are already per-block combined, so the three extra
    streaming executions (stitch sort, boundary collect, top-N sort)
    are pure fixed cost at this size.  Beyond the gate the range-sort
    stitch engages unchanged: at 100 TB the partial table is
    (#blocks × per-block uniques)-sized and must never land on the
    driver."""
    from sigraph_ray.stages.collect import (sorted_count_distinct,
                                            sorted_groupby_agg)

    pairs = triples.map_batches(_mention_partial, batch_format="pyarrow",
                                batch_size=None if doc_local else 1024)
    if doc_local:
        def partial_counts(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:  # typed empty — Arrow must not infer null
                return pa.table({"entity": pa.array([], pa.string()),
                                 "df": pa.array([], pa.int64())})
            df = t.to_pandas()
            cnt = (df.groupby("entity", sort=False).size()
                   .rename("df").reset_index())
            return pa.table({"entity": pa.array(cnt["entity"], pa.string()),
                             "df": pa.array(cnt["df"], pa.int64())})

        parts = pairs.map_batches(partial_counts, batch_format="pyarrow",
                                  batch_size=None).materialize()
        if parts.size_bytes() <= _VOCAB_DRIVER_BYTES:
            import ray.data as rd

            pdf = parts.to_pandas()
            dfc = (pdf.groupby("entity", sort=False)["df"].sum()
                   .reset_index())
            top = (dfc[dfc["df"] >= min_df]
                   .sort_values(["df", "entity"],
                                ascending=[False, True])
                   .head(max_terms))
            vocab = top["entity"].tolist()
            if not with_mentions:
                return vocab
            mentions = rd.from_pandas(
                dfc[["entity"]].rename(columns={"entity": "mention"}))
            return vocab, mentions
        df_tbl = sorted_groupby_agg(
            parts, key="entity", aggs={"df": ("df", "sum")})
    else:
        df_tbl = sorted_count_distinct(pairs, key="entity",
                                       dcol="doc_url", alias="df")
    if with_mentions:
        df_tbl = df_tbl.materialize()
    top = (df_tbl.filter(expr=f"df >= {min_df}")
           .sort(["df", "entity"], descending=[True, False])
           .limit(max_terms).to_pandas())
    vocab = top["entity"].tolist()
    if not with_mentions:
        return vocab
    mentions = df_tbl.map_batches(
        lambda t: pa.table({"mention": t.column("entity")}),
        batch_format="pyarrow")
    return vocab, mentions


def build_kg(pages, *, concurrency=4, batch_size: int = 1024,
             fused: bool = True, mode: str = "grammar",
             link_vocab=None, link_threshold: float = 0.75,
             refine: bool | str = False) -> dict:
    """Full KG build. Returns lazy Datasets:
    triples (per-doc provenance), entities (canonical node table),
    edges (global typed edge table), mentions (doc→entity pairs);
    plus refined (the stage-0/1 intermediate) when ``refine`` is on.

    ``mode``: "grammar" (default) or "ensemble" — the documented
    high-recall A3 mode, routed through the same extractor seam; any
    other value is passed to the seam as a custom backend callable.

    ``link_vocab``: optional canonical-entity vocabulary — when given,
    the A2 entity-link scorer (stages/entity_link, the reference's
    embedding encoder analog, ai_agent.py:126-138) runs between
    extraction and the canonicalization shuffle; confident matches
    adopt the canonical surface (:func:`adopt_links`).

    ``refine``: False | True | "ensemble" — the A3 stage-0/stage-1
    shape (ai_agent.py:405-454): the two report-refinement ensembles
    run FIRST, materializing ``overview``/``behavior`` columns, and
    extraction consumes the refined ``behavior`` text instead of the
    raw report ("ensemble" = majority-of-3 debate classifiers)."""
    backend = {"grammar": None, "ensemble": "ensemble"}.get(mode, mode)
    refined = None
    if refine:
        from sigraph_ray.stages.refine import refine_stage

        docs = pages.map_batches(E.extract_text_batch,
                                 batch_format="pyarrow",
                                 batch_size=batch_size)
        refined = refine_stage(
            docs, backend="ensemble" if refine == "ensemble" else None,
            concurrency=concurrency, batch_size=batch_size)
        pages = refined.map_batches(
            lambda t: pa.table({"url": t.column("url"),
                                "lang": t.column("lang"),
                                "text": t.column("behavior")}),
            batch_format="pyarrow")
    triples = extract_triples_pipeline(
        pages, concurrency=concurrency, batch_size=batch_size, fused=fused,
        backend=backend, pre_extracted=bool(refine))
    link_mentions = None
    if link_vocab == "auto":
        # flagship default (VERDICT r3 #6): vocabulary self-derived
        # from the extracted stream, so A2 runs with no external input.
        # Materialize once — the stream feeds vocabulary derivation,
        # the link pool, and the downstream tables.
        triples = triples.materialize()
        link_vocab, link_mentions = derive_link_vocab(
            triples, with_mentions=True, doc_local=bool(fused))
    if link_vocab is not None:
        from sigraph_ray.stages.entity_link import link_entities

        # fused extraction emits doc-complete blocks; batch_size=None
        # keeps them through the link pool, unlocking the zero-shuffle
        # doc-local adoption dedup. The non-fused stream's post-stitch
        # blocks may split a document → global tier.
        doc_local = bool(fused)
        triples = adopt_links(
            link_entities(triples, link_vocab, threshold=link_threshold,
                          concurrency=concurrency,
                          batch_size=None if doc_local else batch_size,
                          mentions=link_mentions),
            scope="doc" if doc_local else "global")
    entities = C.canonicalize_entities(triples)
    edges = build_kg_edges(triples)
    # the fused stream (linked or not) keeps doc-complete blocks all
    # the way here, so mentions ride the zero-shuffle tier
    mentions = build_mentions(triples,
                              scope="doc" if fused else "global")
    out = {"triples": triples, "entities": entities, "edges": edges,
           "mentions": mentions}
    if refined is not None:
        out["refined"] = refined
    return out


def _mention_partial(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    a = df[["doc_url", "subj"]].rename(columns={"subj": "entity"})
    b = df[["doc_url", "obj"]].rename(columns={"obj": "entity"})
    return pa.Table.from_pandas(
        pd.concat([a, b], ignore_index=True).drop_duplicates(),
        preserve_index=False)


def build_mentions(triples, *, scope: str = "global"):
    """Document→entity MENTIONS pairs (ai_agent.py:249-255
    include_source=True). Distinct = per-batch dedup partial +
    ``sorted_distinct`` stitch (one range sort, per-block vectorized
    drop_duplicates, O(#blocks) boundary stitch) — Ray's
    ``groupby().aggregate`` reduce costs ~100 µs/input-row on exactly
    this row-heavy corpus-sized distinct (measured, BASELINE.md).

    ``scope='doc'``: for streams whose BLOCKS hold whole documents
    (the same fused-extraction contract :func:`dedup_triples_doc_local`
    rides — blocks preserved through the link pool via
    ``batch_size=None``), the distinct key LEADS with ``doc_url``, so
    the per-block dedup partial IS the global distinct — the range
    sort disappears entirely (zero-shuffle mentions). Callers whose
    layout may split a document (non-fused streams, anything
    re-blocked by ``right_size``/``repartition``) must stay
    ``'global'``."""
    if scope == "doc":
        return triples.map_batches(_mention_partial,
                                   batch_format="pyarrow",
                                   batch_size=None)
    from sigraph_ray.stages.collect import sorted_distinct

    return sorted_distinct(
        triples.map_batches(_mention_partial, batch_format="pyarrow"),
        ["doc_url", "entity"])


def sorted_materialize(kg: dict, out_dir: str) -> dict:
    """O5: deterministic sorted Parquet for every KG table."""
    plan = {
        "triples": ["doc_url", "subj", "pred", "obj"],
        "entities": ["entity"],
        "edges": ["src", "pred", "dst"],
        "mentions": ["doc_url", "entity"],
    }
    paths = {}
    for name, keys in plan.items():
        path = f"{out_dir}/{name}"
        ds = kg[name].sort(keys)
        # preserve_order during the write (on the dataset's own captured
        # context, cf. state/manifest.write_stage): guarantees file
        # index = sorted block position, so a reader consuming the
        # directory in file order sees the global sort — otherwise the
        # write tasks may be numbered in completion order under load
        ds.context.execution_options.preserve_order = True
        ds.write_parquet(path)
        paths[name] = path
    return paths
