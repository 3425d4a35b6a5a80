"""The construction path: provenance events → graph tables (SURVEY.md §3.1).

The reference ingests one event per HTTP POST and maintains graph state
via per-event read-modify-write against Neo4j
(src/graph/graph_element/element_behavior.py:260-521: ≥2 point reads +
up to 8 MERGE writes per event). This module is the architectural
inversion: the same get-or-create / merge semantics expressed as
groupby-aggregate shuffles over the full event stream, producing the
identical final graph in one resumable batch pass.

Reproduced merge semantics (all deterministic under a defined event
order ``ord = (timestamp, span_id)`` — the batch replacement for the
reference's HTTP arrival order):

- U1 node merge (element_behavior.py:316-347): per ``artifact`` key,
  ``related_span_ids`` / ``related_trace_ids`` are append-if-absent in
  first-seen order; ``image`` is the LAST non-null ``process_name`` in
  event order (incoming non-null overwrites; incoming null keeps the
  existing value, :339-340). Parent artifacts contribute existence +
  label only (:402-408 creates a bare node).
- U2 trace aggregate (element_behavior.py:350-381): ``start_time`` =
  min timestamp; ``representative_process_name`` = process of the
  min-``ord`` event (strictly-earlier update rule :368-371; ties beyond
  the reference's arrival order are broken by span_id);
  ``span_count`` = event count.
- U3 edge merge (graph_client/client.py:213-232 ``MERGE … SET r +=``):
  one edge per (src, type, dst); props (start_time, weight) from the
  max-``ord`` (last-writer) event.
- U4 CONTAINS set (element_behavior.py:378-381, 409-413, 477-485):
  every distinct (trace, current-artifact) pair, PLUS a parent-CONTAINS
  pair only when the artifact's FIRST appearance (by ``ord``) in the
  whole stream is as a parent — the batch equivalent of "create the
  trace edge only for a newly created parent node" (:404-413).
- U5 MATCHES set (element_behavior.py:490-515): distinct
  (rule_id, artifact) per related_rule_ids entry. Nodes are written
  with label ``SigmaRule`` (the reference's read path queries label
  ``Rule`` — a documented reference inconsistency; we match the
  *written* graph, SURVEY.md §7.3).
- G1 orphan cleanup (schema.py:112-125 FLUSH_SINGLE_ENTITIES_WITH_TRACE):
  DETACH DELETE of (t)-[:CONTAINS]->(n) pairs where the trace has
  exactly one CONTAINS edge and the node has total degree 1.

Skew handling: every aggregation runs a per-batch COMBINER inside
``map_batches`` first (≤1 row per key per batch reaches the shuffle),
so the hot parent artifact (``explorer.exe@PROCESS``-style, ≥30% of
events in the fixture) never concentrates raw rows on one reducer.

Malformed provenance rows are quarantined (counted + preserved), never
raised — the reference swallows per-event exceptions at
graph_session.py:128-132; a trillion-row job must do better than both.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count

from sigraph_ray.functions import provenance as P

# ---------------------------------------------------------------------------
# parsing / quarantine (M1-M5)
# ---------------------------------------------------------------------------


def parse_events_batch(batch: pa.Table) -> pa.Table:
    """Vectorized M1-M5: parse actor + parent provenance, build node
    keys, apply the §1.4 direction rule, attach the deterministic event
    order key ``ord`` and a ``valid`` quarantine mask."""
    actor = P.parse_actor(batch.column("system_provenance"))
    parent = P.parse_parent(batch.column("parent_system_provenance"))
    artifact = P.artifact_key(actor["name"], actor["artifact_type"])
    parent_key = P.artifact_key(parent["name"], parent["artifact_type"])
    ep = P.edge_endpoints(artifact, parent_key, actor["actor_type"])

    ts = batch.column("timestamp")
    ts_us = pc.cast(pc.cast(ts, pa.int64()), pa.string())
    ts_pad = pc.utf8_lpad(ts_us, 20, "0")
    ord_key = pc.binary_join_element_wise(ts_pad, batch.column("span_id"), "|")

    # weight >= 1 validation (element_behavior.py:307-308)
    w_ok = pc.greater_equal(
        pc.fill_null(batch.column("weight"), 0), 1)
    # the parent sequence runs only when BOTH parent_id and
    # parent_system_provenance are present (element_behavior.py:392);
    # an invalid parent provenance raises inside the per-event try and
    # the WHOLE event is lost (graph_session.py:128-132 swallows), so
    # such rows are quarantined entirely.
    attempt_parent = pc.and_(
        pc.is_valid(batch.column("parent_span_id")),
        pc.is_valid(batch.column("parent_system_provenance")))
    parent_bad = pc.and_(attempt_parent, pc.invert(parent["valid"]))
    valid = pc.and_(pc.and_(actor["valid"], w_ok), pc.invert(parent_bad))
    has_parent = pc.and_(attempt_parent, parent["valid"])

    out = batch.drop_columns(["system_provenance", "parent_system_provenance"])
    for name, col in [
        ("artifact", artifact),
        ("artifact_type", actor["artifact_type"]),
        ("action_type", actor["action_type"]),
        ("actor_type", actor["actor_type"]),
        ("parent_key", parent_key),
        ("parent_type", parent["artifact_type"]),
        ("has_parent", has_parent),
        ("src", ep["src"]),
        ("dst", ep["dst"]),
        ("ord", ord_key),
        ("valid", valid),
    ]:
        out = out.append_column(name, _arr(col))
    return out


def _arr(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def split_quarantine(parsed):
    """valid rows forward; invalid rows preserved for audit (the batch
    answer to the reference's swallowed exceptions)."""
    ok = parsed.filter(expr="valid == True")
    bad = parsed.filter(expr="valid == False")
    return ok, bad


# ---------------------------------------------------------------------------
# U1 — node merge (two-phase: combiner + final groupby)
# ---------------------------------------------------------------------------


_SEP_NODE = "\x1f"


def _node_item_partials(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch min-ord (ak, member, ord) rows where ak =
    artifact␟kind, kind 's' = span id / 't' = trace id — one row per
    distinct member per batch, vectorized pandas groupby-min. The
    GLOBAL min-ord dedup happens inside ``sorted_collect(dedup=True)``
    (keep-first after the range sort), so no extra shuffle runs."""
    df = batch.select(["artifact", "span_id", "trace_id", "ord"]).to_pandas()
    enc = pd.DataFrame({
        "ak": pd.concat([df["artifact"] + _SEP_NODE + "s",
                         df["artifact"] + _SEP_NODE + "t"],
                        ignore_index=True),
        "member": pd.concat([df["span_id"], df["trace_id"]],
                            ignore_index=True),
        "ord": pd.concat([df["ord"], df["ord"]], ignore_index=True)})
    part = (enc.groupby(["ak", "member"], sort=False)["ord"].min()
            .reset_index())
    return pa.Table.from_pandas(part, preserve_index=False)


def _node_image_partials(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch max-ord non-null process per artifact
    (element_behavior.py:339-340 — incoming non-null overwrites)."""
    df = batch.select(["artifact", "process_name", "ord"]).to_pandas()
    df = df[df["process_name"].notna()]
    v = df["ord"] + _SEP_NODE + df["process_name"]
    part = (pd.DataFrame({"artifact": df["artifact"], "v": v})
            .groupby("artifact", sort=False)["v"].max().reset_index())
    return pa.Table.from_pandas(part, preserve_index=False)


def _node_image_parent_partials(batch: pa.Table) -> pa.Table:
    """Fused combiner — ONE scan of the parsed stream emitting pivot-
    format rows for BOTH the image aggregate (per-batch max-ord
    non-null process, element_behavior.py:339-340) and the bare parent
    existence (:402-408). Replaces two separate full passes."""
    img = _node_image_partials(batch)
    par = batch.filter(_arr(batch.column("has_parent"))).select(
        ["parent_key"]).to_pandas()
    return pa.concat_tables([
        _pivot_rows(img.column("artifact").to_pylist(),
                    image=img.column("v").to_pylist()),
        _pivot_rows(list(par["parent_key"].unique())),
    ])


def _pivot_rows(artifact, spans=None, traces=None, image=None):
    n = len(artifact)
    return pa.table({
        "artifact": pa.array(artifact, pa.string()),
        "spans_enc": pa.array(spans if spans is not None else [None] * n,
                              pa.string()),
        "traces_enc": pa.array(traces if traces is not None else [None] * n,
                               pa.string()),
        "image_enc": pa.array(image if image is not None else [None] * n,
                              pa.string()),
    })


def build_nodes_encoded(events):
    """U1 node merge as pure vectorized dataflow — no per-group Python.

    Semantics (element_behavior.py:316-347): ``related_span_ids`` /
    ``related_trace_ids`` are append-if-absent in first-seen event
    order = members ordered by their min ``ord``; ``image`` is the
    last non-null process by ``ord``; parent artifacts contribute bare
    existence. Stages:

    1. per-batch (artifact␟kind, member, min ord) combiner rows go
       straight into ONE :func:`sorted_collect` range sort with
       ``dedup=True`` — the post-sort keep-first IS the global min-ord
       member dedup, so no separate groupby shuffle runs. Lists are
       joined to ONE ␟-separated string per (artifact, kind) — flat
       string columns keep the node table Acero-join-safe for G1
       pruning (pyarrow joins reject list payloads);
    2. image partials feed the pivot groupby directly (its
       null-skipping Max is the last-writer aggregate); parent
       existence via per-batch distinct;
    3. pivot to one row per artifact with a null-skipping Max groupby.

    Partitioning assumption (documented per the build brief): one
    artifact's member list fits a worker block (same bound the
    reference puts on a Neo4j node property array).

    Returns columns (artifact, artifact_type, image, spans_enc,
    traces_enc); :func:`decode_nodes` restores the list columns.
    """
    from ray.data.aggregate import Max as AggMax

    from sigraph_ray.stages.collect import sorted_collect

    items = events.map_batches(_node_item_partials,
                                batch_format="pyarrow").materialize()
    collected = sorted_collect(items, key="ak", order_col="ord",
                               value="member", dedup=True)

    def lists_to_pivot(df: pd.DataFrame) -> pa.Table:
        ak = df["ak"].str.split(_SEP_NODE, n=1, expand=True)
        enc = df["values"].map(_SEP_NODE.join)
        is_span = (ak[1] == "s").to_numpy() if len(df) else np.array([], bool)
        return _pivot_rows(
            ak[0].tolist() if len(df) else [],
            spans=[e if s else None for e, s in zip(enc, is_span)],
            traces=[None if s else e for e, s in zip(enc, is_span)])

    span_trace_rows = collected.map_batches(lists_to_pivot,
                                            batch_format="pandas")
    # image + parent partials share ONE fused scan and feed the PIVOT
    # groupby directly — its null-skipping Max over image_enc IS the
    # global last-writer aggregate, so no separate per-column groupby
    # is needed
    image_parent_rows = events.map_batches(_node_image_parent_partials,
                                           batch_format="pyarrow")

    # the pivot input is tiny (≈ a few rows per artifact) but arrives
    # as one block per upstream batch across the union branches; the
    # sort shuffle's cost scales with map-blocks × reduce-partitions,
    # so coalesce first (measured: 7.3 s → sub-second for the same
    # 16k rows at sf0.1)
    from sigraph_ray.stages.collect import sorted_groupby_agg

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        # pandas groupby max rejects mixed str/None object columns; ""
        # is a safe null stand-in (encoded values always carry an ord
        # prefix, so "" sorts strictly below every real value) and
        # ``finish`` already treats "" as absent
        return df.fillna({"spans_enc": "", "traces_enc": "",
                          "image_enc": ""})

    # artifact-keyed pivot rows are row-heavy (a few per artifact):
    # range-sort + blockwise stitch max, not Ray's per-row reduce
    merged = sorted_groupby_agg(
        span_trace_rows.union(image_parent_rows)
        .map_batches(fill, batch_format="pandas").repartition(8)
        .materialize(),
        key="artifact",
        aggs={"spans_enc": ("spans_enc", "max"),
              "traces_enc": ("traces_enc", "max"),
              "image_enc": ("image_enc", "max")})

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        img = df["image_enc"].str.split(_SEP_NODE, n=1, expand=True)
        image = img[1] if 1 in img.columns else pd.Series(
            [None] * len(df), dtype="object")
        return pa.Table.from_pandas(pd.DataFrame({
            "artifact": df["artifact"],
            # M6 label derivation: type = final @-token of the key
            # (names may themselves contain '@', db_model M2 semantics)
            "artifact_type": df["artifact"].str.rsplit("@", n=1).str[-1],
            "image": image.astype(object).where(image.notna(), None),
            "spans_enc": df["spans_enc"].fillna(""),
            "traces_enc": df["traces_enc"].fillna(""),
        }), preserve_index=False)

    return merged.map_batches(finish, batch_format="pyarrow")


def decode_nodes(encoded):
    """(spans_enc, traces_enc) strings → related_span_ids /
    related_trace_ids list columns (the public U1 node schema)."""
    def f(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.Table.from_pandas(pd.DataFrame({
            "artifact": df["artifact"],
            "artifact_type": df["artifact_type"],
            "image": df["image"],
            "related_span_ids": [
                s.split(_SEP_NODE) if s else [] for s in df["spans_enc"]],
            "related_trace_ids": [
                s.split(_SEP_NODE) if s else [] for s in df["traces_enc"]],
        }), preserve_index=False)
    return encoded.map_batches(f, batch_format="pyarrow")


def build_nodes(events):
    return decode_nodes(build_nodes_encoded(events))


# ---------------------------------------------------------------------------
# U2 — trace aggregate
# ---------------------------------------------------------------------------


# Encoded arg-min/arg-max aggregation: the deterministic order key
# ``ord`` (fixed-layout, no \x1f) is prefixed to a \x1f-joined payload,
# so a plain vectorized Min/Max over ONE string column is an
# arg-min/arg-max over ``ord`` — no per-group Python in the finalizer
# (\x1f sorts below every character that can appear in ``ord``, so
# prefix-ordering is preserved).
_SEP = "\x1f"


def _trace_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per (unit, trace) with the encoded
    min-ord payload and a partial count."""
    df = batch.select(["unit_id", "trace_id", "timestamp",
                       "process_name", "ord"]).to_pandas()
    ts_us = df["timestamp"].astype("int64").astype(str)
    proc = df["process_name"]
    payload = (df["ord"] + _SEP + ts_us + _SEP
               + np.where(proc.isna(), "0", "1" + proc.fillna("")))
    enc = pd.DataFrame({
        "k": df["unit_id"] + _SEP + df["trace_id"], "v": payload})
    g = enc.groupby("k", sort=False)["v"]
    part = g.min().rename("v").reset_index()
    part["n"] = g.size().values
    return pa.Table.from_pandas(part, preserve_index=False)


def _trace_decode(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    keys = df["k"].str.split(_SEP, n=1, expand=True)
    vals = df["v"].str.split(_SEP, n=2, expand=True)
    proc = vals[2]
    rep = proc.str.slice(1).where(proc.str.slice(0, 1) == "1", None)
    return pa.Table.from_pandas(pd.DataFrame({
        "unit_id": keys[0],
        "trace_id": keys[1],
        "start_time": pd.to_datetime(vals[1].astype("int64"), unit="us"),
        "representative_process_name": rep.astype(object),
        "span_count": df["span_count"].astype("int64"),
    }), preserve_index=False)


def build_traces(events):
    from sigraph_ray.stages.collect import sorted_groupby_agg

    # materialized = staged boundary + the stitch's small-input gate
    # (collect._driver_small) can see the byte size
    partials = events.map_batches(_trace_partials,
                                  batch_format="pyarrow").materialize()
    # trace-keyed partials are row-heavy: stitch min/sum
    agg = sorted_groupby_agg(partials, key="k",
                             aggs={"v": ("v", "min"),
                                   "span_count": ("n", "sum")})
    return agg.map_batches(_trace_decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# U3 — edge merge (last-writer-wins by ord)
# ---------------------------------------------------------------------------


def _edge_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per (src, type, dst) carrying the
    encoded max-ord (last-writer) payload."""
    t = batch.filter(pc.and_(_arr(batch.column("has_parent")),
                             pc.is_valid(batch.column("src"))))
    df = t.select(["src", "dst", "action_type", "timestamp",
                   "weight", "ord"]).to_pandas()
    if len(df) == 0:
        return pa.table({"k": pa.array([], pa.string()),
                         "v": pa.array([], pa.string())})
    k = df["src"] + _SEP + df["action_type"] + _SEP + df["dst"]
    v = (df["ord"] + _SEP + df["timestamp"].astype("int64").astype(str)
         + _SEP + df["weight"].astype(str))
    part = pd.DataFrame({"k": k, "v": v}).groupby(
        "k", sort=False)["v"].max().reset_index()
    return pa.Table.from_pandas(part, preserve_index=False)


def _edge_decode(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    keys = df["k"].str.split(_SEP, n=2, expand=True)
    vals = df["v"].str.split(_SEP, n=2, expand=True)
    return pa.Table.from_pandas(pd.DataFrame({
        "src": keys[0],
        "dst": keys[2],
        "type": keys[1],
        "start_time": pd.to_datetime(vals[1].astype("int64"), unit="us"),
        "weight": vals[2].astype("int64"),
    }), preserve_index=False)


def build_edges(events):
    from sigraph_ray.stages.collect import sorted_groupby_agg

    partials = events.map_batches(_edge_partials,
                                   batch_format="pyarrow").materialize()
    # edge-keyed partials are row-heavy: stitch max (last-writer enc)
    agg = sorted_groupby_agg(partials, key="k",
                             aggs={"v": ("v", "max")})
    return agg.map_batches(_edge_decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# U4 — CONTAINS set (+ first-appearance parent rule)
# ---------------------------------------------------------------------------


def _appearance_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: encoded min-ord appearance per artifact.
    Payload ``ord␟kind␟unit␟trace`` — ord ties cannot occur across the
    two kinds of one event because kind=0 (current) sorts before kind=1
    (parent) at equal ord, matching the reference's within-event
    sequence (node before parent, element_behavior.py:316-424)."""
    cur = batch.select(["artifact", "ord", "trace_id", "unit_id"]).to_pandas()
    cur_v = cur["ord"] + _SEP + "0" + _SEP + cur["unit_id"] + _SEP + cur["trace_id"]
    par = batch.filter(_arr(batch.column("has_parent"))).select(
        ["parent_key", "ord", "trace_id", "unit_id"]).to_pandas()
    par_v = par["ord"] + _SEP + "1" + _SEP + par["unit_id"] + _SEP + par["trace_id"]
    enc = pd.concat([
        pd.DataFrame({"artifact": cur["artifact"], "v": cur_v}),
        pd.DataFrame({"artifact": par["parent_key"], "v": par_v}),
    ], ignore_index=True)
    part = enc.groupby("artifact", sort=False)["v"].min().reset_index()
    return pa.Table.from_pandas(part, preserve_index=False)


def _decode_parent_first(t: pa.Table) -> pa.Table:
    df = t.to_pandas()
    vals = df["v"].str.split(_SEP, n=3, expand=True)
    sel = vals[1] == "1"
    return pa.Table.from_pandas(pd.DataFrame({
        "unit_id": vals.loc[sel, 2],
        "trace_id": vals.loc[sel, 3],
        "artifact": df.loc[sel, "artifact"],
    }), preserve_index=False)


def build_contains(events):
    """Distinct (unit_id, trace_id, artifact) CONTAINS pairs: every
    current-node pair + the first-appearance-as-parent pairs. CONTAINS
    is a SET (the reference's Neo4j MERGE, element_behavior.py:378-381,
    409-413): an artifact whose first global appearance is as a parent
    in trace T and that later occurs as a current artifact in the same
    trace contributes ONE pair, so both legs flow into a single
    distinct aggregate (Count-then-project — also one fewer shuffle
    than deduplicating the current leg separately)."""
    from sigraph_ray.stages.collect import sorted_distinct, sorted_groupby_agg

    cur_partials = events.map_batches(_distinct_current_pairs,
                                      batch_format="pyarrow")
    # artifact-keyed first-appearance min is row-heavy: stitch min;
    # the set-union DISTINCT is a sorted_distinct (no Count shuffle)
    first = sorted_groupby_agg(
        events.map_batches(_appearance_partials,
                           batch_format="pyarrow").materialize(),
        key="artifact", aggs={"v": ("v", "min")})
    parent_pairs = first.map_batches(_decode_parent_first,
                                     batch_format="pyarrow")
    return (sorted_distinct(cur_partials.union(parent_pairs)
                            .materialize(),
                            ["unit_id", "trace_id", "artifact"])
            .map_batches(
                lambda t: t.select(["unit_id", "trace_id", "artifact"]),
                batch_format="pyarrow"))


def _distinct_current_pairs(batch: pa.Table) -> pa.Table:
    df = batch.select(["unit_id", "trace_id", "artifact"]).to_pandas()
    return pa.Table.from_pandas(
        df.drop_duplicates(["unit_id", "trace_id", "artifact"]),
        preserve_index=False)


# ---------------------------------------------------------------------------
# U5 — MATCHES set
# ---------------------------------------------------------------------------


def _rule_pairs(batch: pa.Table) -> pa.Table:
    df = batch.select(["related_rule_ids", "artifact"]).to_pandas()
    df = df.explode("related_rule_ids").dropna(subset=["related_rule_ids"])
    df = df.rename(columns={"related_rule_ids": "rule_id"})
    return pa.Table.from_pandas(
        df.drop_duplicates(["rule_id", "artifact"]), preserve_index=False)


def build_matches(events):
    from ray.data.aggregate import Count as AggCount

    return (events.map_batches(_rule_pairs, batch_format="pyarrow")
            .groupby(["rule_id", "artifact"])
            .aggregate(AggCount(alias_name="_n"))
            .map_batches(lambda t: t.select(["rule_id", "artifact"]),
                         batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# G1 — orphan cleanup (degree-1 pruning) as dataflow
# ---------------------------------------------------------------------------


def _degree_partials_factory(cols):
    """Per-batch combiner: value_counts of node keys appearing in
    ``cols`` — one partial row per distinct key per batch."""
    def f(df: pd.DataFrame) -> pa.Table:
        hits = pd.concat([df[c] for c in cols], ignore_index=True)
        vc = hits.value_counts()
        return pa.Table.from_pandas(pd.DataFrame({
            "artifact": vc.index.astype(object),
            "deg": vc.values.astype("int64")}), preserve_index=False)
    return f


def prune_orphans(nodes, edges, traces, contains, matches,
                  *, num_partitions: int = 8):
    """FLUSH_SINGLE_ENTITIES_WITH_TRACE (schema.py:112-125): drop
    (trace, node) CONTAINS pairs where the trace contains exactly one
    node and that node's total degree is 1, deleting both endpoints.

    Pure dataflow — no driver-side candidate sets — tuned to ONE hash
    join: candidate pairs come from a single Count+Min aggregate (a
    1-pair trace's artifact IS the group Min), degrees from per-batch
    value_counts combiners + a Sum aggregate, and the three output
    tables subtract the doomed set via union+tag groupbys
    (:func:`_subtract_by_key` — sort shuffles, no hash-join actor
    pools). Only the doomed-pair COUNT touches the driver. Returns
    pruned (nodes, edges, traces, contains) plus the dropped count.
    Each intermediate is materialized: they are small post-aggregation
    tables, and a zero-row join side would otherwise ship no schema
    broadcast at all (stages/joins.py).
    """
    from ray.data.aggregate import Min as AggMin
    from ray.data.aggregate import Sum as AggSum

    from sigraph_ray.stages.joins import safe_join

    _pair3 = pa.schema([("unit_id", pa.string()), ("trace_id", pa.string()),
                        ("artifact", pa.string())])
    _deg = pa.schema([("artifact", pa.string()), ("degree", pa.int64())])

    cand_lazy = (contains.groupby(["unit_id", "trace_id"])
                 .aggregate(Count(alias_name="_n"),
                            AggMin("artifact", alias_name="artifact"))
                 .filter(expr="_n == 1")
                 .map_batches(
                     lambda t: t.select(["unit_id", "trace_id", "artifact"]),
                     batch_format="pyarrow"))
    deg_lazy = (edges.map_batches(_degree_partials_factory(["src", "dst"]),
                                  batch_format="pandas")
                .union(contains.map_batches(
                    _degree_partials_factory(["artifact"]),
                    batch_format="pandas"))
                .union(matches.map_batches(
                    _degree_partials_factory(["artifact"]),
                    batch_format="pandas"))
                .groupby("artifact")
                .aggregate(AggSum("deg", alias_name="degree"))
                .filter(expr="degree == 1"))
    # independent aggregates over already-pinned inputs — overlap them
    # (the rare all-clean input pays one wasted degree pass; every
    # other input saves a full serial aggregate)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_cand = pool.submit(cand_lazy.materialize)
        f_deg = pool.submit(deg_lazy.materialize)
        cand, deg = f_cand.result(), f_deg.result()
    if cand.count() == 0 or deg.count() == 0:
        return nodes, edges, traces, contains, 0

    # the single remaining hash join — both sides small aggregates.
    # Each doomed node has exactly one relationship (its CONTAINS
    # pair), so artifacts and (unit, trace) keys are both unique.
    doomed = safe_join(cand, deg, "left_semi", num_partitions,
                       ("artifact",),
                       left_schema=_pair3, right_schema=_deg).materialize()
    n_pruned = doomed.count()
    if n_pruned == 0:
        return nodes, edges, traces, contains, 0

    nodes2 = _subtract_by_key(
        nodes, doomed.select_columns(["artifact"]), key=["artifact"],
        payload=["artifact_type", "image", "spans_enc", "traces_enc"])
    traces2 = _subtract_by_key(
        traces, doomed.select_columns(["unit_id", "trace_id"]),
        key=["unit_id", "trace_id"],
        payload=["start_time", "representative_process_name", "span_count"],
        payload_codecs={"start_time": "ts_ns", "span_count": "int"})
    # a doomed artifact has degree 1, so its ONLY contains pair is the
    # doomed triple itself — subtracting on the full triple equals
    # subtracting by artifact and keeps the key unique
    contains2 = _subtract_by_key(
        contains, doomed, key=["unit_id", "trace_id", "artifact"],
        payload=[])
    return nodes2, edges, traces2, contains2, n_pruned


_SEP_REC = "\x1e"


def _subtract_by_key(table, doomed_keys, *, key: list[str],
                     payload: list[str], payload_codecs: dict | None = None,
                     out_order: list[str] | None = None):
    """``table`` MINUS rows whose ``key`` appears in ``doomed_keys`` —
    one union + groupby (the anti-join without spawning a hash-join
    pool). Keys are unique per table row here, so each group carries
    exactly one payload; payload columns are \x1e-joined into one
    string (record separator — payload values may themselves contain
    the \x1f used by the encoded node lists) for a single vectorized
    Max (a doomed marker row carries the
    empty payload and tag 1). ``payload_codecs`` marks non-string
    columns (``ts_ns`` = timestamp↔nanoseconds, ``int`` = int64);
    string payloads get a \x01 prefix so genuine nulls round-trip."""
    codecs = payload_codecs or {}

    def _encode_cols(df: pd.DataFrame):
        parts = []
        for c in payload:
            col = df[c]
            if codecs.get(c) in ("ts_ns", "int"):
                parts.append(col.astype("int64").astype(str))
            else:
                parts.append(
                    ("\x01" + col.astype(str)).where(col.notna(), "\x00"))
        enc = parts[0]
        for p in parts[1:]:
            enc = enc + _SEP_REC + p
        return enc

    def encode(df: pd.DataFrame) -> pa.Table:
        out = df[key].copy()
        if payload:
            out["_payload"] = _encode_cols(df)
        out["_tag"] = 0
        return pa.Table.from_pandas(out, preserve_index=False)

    def tag_doomed(df: pd.DataFrame) -> pa.Table:
        out = df[key].copy()
        if payload:
            out["_payload"] = ""
        out["_tag"] = 1
        return pa.Table.from_pandas(out, preserve_index=False)

    from sigraph_ray.stages.collect import sorted_groupby_agg

    aggs = {"_tag": ("_tag", "max")}
    if payload:
        aggs["_payload"] = ("_payload", "max")
    # table rows are keyed one-per-entity (row-heavy): stitch max
    merged = sorted_groupby_agg(
        table.map_batches(encode, batch_format="pandas")
        .union(doomed_keys.map_batches(tag_doomed, batch_format="pandas"))
        .materialize(),
        key=key, aggs=aggs).filter(expr="_tag == 0")

    def decode(df: pd.DataFrame) -> pa.Table:
        out = df[key].copy()
        if payload:
            parts = df["_payload"].str.split(_SEP_REC, n=len(payload) - 1,
                                             expand=True)
            for i, c in enumerate(payload):
                col = (parts[i] if i in parts.columns
                       else pd.Series([""] * len(df), index=df.index))
                if codecs.get(c) == "ts_ns":
                    out[c] = pd.to_datetime(col.astype("int64"), unit="ns")
                elif codecs.get(c) == "int":
                    out[c] = col.astype("int64")
                else:
                    out[c] = (col.str.slice(1)
                              .where(col.str.slice(0, 1) == "\x01", None)
                              .astype(object))
        cols = out_order or (key + payload)
        return pa.Table.from_pandas(out[cols], preserve_index=False)

    return merged.map_batches(decode, batch_format="pandas")


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------


def build_graph(events, *, prune: bool = True,
                materialize_parsed: bool = True) -> dict:
    """events Dataset (GraphNode schema, FIXTURES.md F2) → graph tables.

    Returns dict of Datasets: nodes, edges, traces, contains, matches,
    quarantined. All six are lazy; materialize via O5 sorted writes
    (:func:`sorted_materialize`).

    ``materialize_parsed`` pins the parsed/validated event stream in the
    object store once, since FIVE downstream branches (nodes, edges,
    traces, contains, matches) consume it — without this each branch
    re-executes the parse. This is also the pipeline's natural
    stage/manifest boundary (SURVEY.md §4.2 resume layout); at 100 TB
    the same boundary is a partitioned Parquet stage directory instead
    of the object store (state/manifest.py).
    """
    parsed = events.map_batches(parse_events_batch, batch_format="pyarrow")
    if materialize_parsed:
        from sigraph_ray.stages.blocks import right_size

        # coalesce the pinned stream to byte-proportional blocks BEFORE
        # the five consumers fan out: each build's shuffle width follows
        # the input block count, and a cluster-sized read splits a small
        # event table into dozens of near-empty blocks whose map×reduce
        # task grid is pure fixed cost — paid five times over
        parsed = right_size(parsed.materialize())
    return build_graph_from_parsed(parsed, prune=prune)


def build_graph_from_parsed(parsed, *, prune: bool = True) -> dict:
    """Graph tables from an already-parsed event stream — the entry
    point used when resuming from a persisted parse stage
    (state/manifest.read_stage)."""
    ok, bad = split_quarantine(parsed)
    # nodes stay ENCODED (flat string columns) through pruning — the
    # G1 anti-join runs on the flat table (Acero joins reject list
    # payloads); list columns are decoded at the API boundary below.
    if prune:
        # prune consults contains/edges/matches several times (counts,
        # candidate filters, degree sums) and the caller reads every
        # output; pin the aggregated tables (post-shuffle, small
        # relative to the event stream) so no branch re-runs upstream.
        # The five builds are independent dataflows over the SAME
        # pinned parsed stream — build AND materialize them
        # CONCURRENTLY: each .materialize() otherwise blocks the
        # driver while the cluster idles between small shuffles, and
        # the node build's internal sorted_collect sort is eager, so
        # it too must sit inside a thread (measured ~20 s → ~12 s at
        # sf0.1/32cpu). Ray's scheduler arbitrates the five streaming
        # executions; on a real cluster this is five small concurrent
        # jobs, not one serial chain.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=5) as pool:
            futs = [pool.submit(lambda b=b: b(ok).materialize())
                    for b in (build_nodes_encoded, build_edges,
                              build_traces, build_contains,
                              build_matches)]
            nodes, edges, traces, contains, matches = (
                f.result() for f in futs)
        nodes, edges, traces, contains, n_pruned = prune_orphans(
            nodes, edges, traces, contains, matches)
    else:
        nodes = build_nodes_encoded(ok)
        edges = build_edges(ok)
        traces = build_traces(ok)
        contains = build_contains(ok)
        matches = build_matches(ok)
        n_pruned = 0
    nodes = decode_nodes(nodes)
    return {
        "nodes": nodes, "edges": edges, "traces": traces,
        "contains": contains, "matches": matches, "quarantined": bad,
        "n_pruned": n_pruned,
    }


def sorted_materialize(graph: dict, out_dir: str) -> dict:
    """O5 — deterministic sorted Parquet materialization: nodes by
    artifact, edges by (src, type, dst) (north rule; the reference
    relies on Neo4j storage order, SURVEY.md §2.7)."""
    paths = {}
    sort_keys = {
        "nodes": ["artifact"],
        "edges": ["src", "type", "dst"],
        "traces": ["unit_id", "trace_id"],
        "contains": ["unit_id", "trace_id", "artifact"],
        "matches": ["rule_id", "artifact"],
    }
    for name, keys in sort_keys.items():
        path = f"{out_dir}/{name}"
        ds = graph[name].sort(keys)
        # file index = sorted block position (see kg.sorted_materialize)
        ds.context.execution_options.preserve_order = True
        ds.write_parquet(path)
        paths[name] = path
    return paths


# ---------------------------------------------------------------------------
# S7 — constraint assertions; J5/U8 — IoC extraction; D1 — unit flush;
# S10 — JSON export
# ---------------------------------------------------------------------------


def validate_graph(graph: dict) -> dict:
    """The batch form of the reference's uniqueness constraints
    (schema.py:11-21: ``artifact`` unique per label, ``trace_id``
    unique): post-groupby key-uniqueness assertions
    (count == count_distinct). Returns the counts; raises AssertionError
    on violation."""
    n_nodes = graph["nodes"].count()
    n_node_keys = (graph["nodes"].select_columns(["artifact"])
                   .groupby("artifact").count().count())
    assert n_nodes == n_node_keys, (n_nodes, n_node_keys)
    traces = graph["traces"]
    n_traces = traces.count()
    n_trace_keys = (traces.select_columns(["unit_id", "trace_id"])
                    .groupby(["unit_id", "trace_id"]).count().count())
    assert n_traces == n_trace_keys, (n_traces, n_trace_keys)
    return {"nodes": n_nodes, "traces": n_traces}


def extract_iocs(graph: dict, unit_id: str):
    """SigraphIoC query (element_behavior.py:788-851 + schema.py:154-168
    U8): distinct properties of non-PROCESS artifacts contained in the
    unit's traces, with ``related_trace_ids`` filtered to the unit's own
    trace set (J5 broadcast semi-join). Output columns:
    image, artifact, artifact_type, related_trace_ids.

    The broadcast sets are ONE unit's traces / contained artifacts —
    filtered on the workers before the (bounded, per-unit) pull; the
    full trace/contains tables never reach the driver."""
    import ray

    def unit_rows(col):
        def f(t: pa.Table) -> pa.Table:
            return (t.filter(pc.equal(t.column("unit_id"), unit_id))
                    .select([col]))
        return f

    unit_traces = set(
        graph["traces"].map_batches(unit_rows("trace_id"),
                                    batch_format="pyarrow")
        .to_pandas()["trace_id"])
    contained = set(
        graph["contains"].map_batches(unit_rows("artifact"),
                                      batch_format="pyarrow")
        .to_pandas()["artifact"])
    traces_ref = ray.put(unit_traces)
    contained_ref = ray.put(contained)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ts = ray.get(traces_ref)
        member = ray.get(contained_ref)
        sel = df[(df["artifact_type"] != "PROCESS")
                 & df["artifact"].isin(member)].copy()
        sel["related_trace_ids"] = sel["related_trace_ids"].map(
            lambda ids: [t for t in ids if t in ts])
        return sel[["image", "artifact", "artifact_type",
                    "related_trace_ids"]]

    return graph["nodes"].map_batches(f, batch_format="pandas")


def write_unit_partitioned(ds, out_dir: str, *, table: str) -> None:
    """Write a unit-keyed table as one directory per unit
    (``out_dir/<table>/unit_id=<u>/``) so a unit can be flushed by
    dropping its directory — the batch equivalent of the reference's
    DETACH DELETE / delete_by_query flush (D1/D2,
    schema.py:182-193, db_session.py:448-481)."""
    ds.write_parquet(f"{out_dir}/{table}", partition_cols=["unit_id"])


def flush_unit(out_dir: str, unit_id: str, *, tables=("traces", "contains",
                                                      "documents")) -> list[str]:
    """D1/D2 — drop every partition directory of one unit. Returns the
    removed paths."""
    import glob
    import shutil

    removed = []
    for table in tables:
        for path in glob.glob(f"{out_dir}/{table}/unit_id={unit_id}"):
            shutil.rmtree(path)
            removed.append(path)
    return removed


def export_json(graph: dict, path: str, *, max_rows: int = 100_000) -> dict:
    """S10 — small-result JSON export ``{"nodes": [...], "rels": [...]}``
    (element_behavior.py:639-699 / helper.py:10-52 serializers). Guarded
    by ``max_rows``: this is a query-path sink, not a bulk sink."""
    import json

    nodes = graph["nodes"].limit(max_rows).to_pandas()
    edges = graph["edges"].limit(max_rows).to_pandas()
    doc = {
        "nodes": [
            {"elementId": r["artifact"],
             "labels": [r["artifact_type"]],
             "properties": {
                 "artifact": r["artifact"], "image": r["image"],
                 "related_span_ids": list(r["related_span_ids"]),
                 "related_trace_ids": list(r["related_trace_ids"])}}
            for _, r in nodes.iterrows()],
        "rels": [
            {"startNodeElementId": r["src"], "endNodeElementId": r["dst"],
             "type": r["type"],
             "properties": {"start_time": str(r["start_time"]),
                            "weight": int(r["weight"])}}
            for _, r in edges.iterrows()],
    }
    with open(path, "w") as f:
        json.dump(doc, f, sort_keys=True)
    return {"nodes": len(doc["nodes"]), "rels": len(doc["rels"])}
