"""Syslog document model + Sigma match scan (S2/S4/J7).

The reference stores syslog rows in OpenSearch with a free-form nested
``raw_data`` object whose string leaves are dynamically mapped to
keyword fields (src/db/db_model.py:12-109 dynamic templates;
SyslogModel at :111-124), and Sigma queries address those leaves as
``raw_data.Metadata.<field>`` keywords. The Ray-native restatement:

- :func:`derive_syslog` — the deterministic events→syslog mapping
  (sibling of ``queries._events_to_prov``): one row per event with the
  ``raw_data`` leaves as FLATTENED string columns
  (``raw_data.EventName``, ``raw_data.Timestamp``,
  ``raw_data.Metadata.*``). Flat columns ARE the batch analog of the
  dynamic keyword mapping: every leaf is a typed Arrow string column.
- :func:`nest_raw_data` / :func:`flatten_raw_data` — round-trip between
  the flat layout and a genuine Arrow struct column (the nested
  document shape of SyslogModel.raw_data), proving the mapping
  semantics; pipelines run on the flat layout.
- :class:`SigmaMatcher` — J7: compile uploaded Sigma YAML once per
  ACTOR (A5 — the batch analog of the reference compiling per upload,
  rule/session.py:24-94) and scan syslog batches with the mandatory
  ``unit_id`` + ``raw_data.EventName = logsource.category`` terms
  (db_session.py:256-264) before the rule predicates.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

RAW_FIELDS = (
    "raw_data.EventName",
    "raw_data.Timestamp",
    "raw_data.Metadata.Image",
    "raw_data.Metadata.TargetFilename",
    "raw_data.Metadata.DestinationIp",
    "raw_data.Metadata.User",
    "raw_data.Metadata.CommandLine",
    "raw_data.Metadata.EventID",
)


def syslog_batch(batch: pa.Table) -> pa.Table:
    """Vectorized events→syslog mapping. Field formulas (documented in
    the oracle SQL, all pure functions of event_id/user_id/ts):

        Image            = C:\\\\Programs\\\\proc_<user_id%7>.exe
        TargetFilename   = file_<event_id%100>.tmp
        DestinationIp    = 10.0.0.<event_id%256>
        User             = user_<user_id>
        CommandLine      = proc_<user_id%7>.exe --flag <event_id%16>
        EventID          = <event_id%20>
        Timestamp        = ISO-8601 microseconds (string — the
                           reference sorts raw docs by this STRING,
                           db_model.py:141-143)
    """
    df = batch.to_pandas()
    eid = df["event_id"].to_numpy()
    uid = df["user_id"].to_numpy()
    proc = np.char.add(np.char.add("proc_", (uid % 7).astype(str)), ".exe")
    # optional SyslogModel fields (db_model.py:116-117): present only on
    # rule-tagged events, mirroring the provenance related_rule_ids
    # mapping (event_id % 5 == 0 → rule_<event_id % 12>)
    tagged = (eid % 5) == 0
    rule_ids = pd.Series(
        np.char.add("rule_", (eid % 12).astype(str)),
        dtype="object").mask(~tagged)
    tactics = pd.Series(
        np.char.add("TA00", (eid % 9).astype(str)),
        dtype="object").mask(~tagged)
    out = pd.DataFrame({
        "unit_id": np.char.add("unit_", (uid % 3).astype(str)),
        "trace_id": np.char.add("trace_", uid.astype(str)),
        "span_id": np.char.add("span_", np.char.zfill(eid.astype(str), 12)),
        "timestamp": df["ts"],
        "tactics": tactics,
        "rule_ids": rule_ids,
        "raw_data.EventName": df["event_type"],
        "raw_data.Timestamp": df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f"),
        "raw_data.Metadata.Image": np.char.add("C:\\Programs\\", proc),
        "raw_data.Metadata.TargetFilename": np.char.add(
            np.char.add("file_", (eid % 100).astype(str)), ".tmp"),
        "raw_data.Metadata.DestinationIp": np.char.add(
            "10.0.0.", (eid % 256).astype(str)),
        "raw_data.Metadata.User": np.char.add("user_", uid.astype(str)),
        "raw_data.Metadata.CommandLine": np.char.add(
            np.char.add(proc, " --flag "), (eid % 16).astype(str)),
        "raw_data.Metadata.EventID": (eid % 20).astype(str),
    })
    return pa.Table.from_pandas(out, preserve_index=False)


def derive_syslog(sf_dir: str):
    """events.parquet → flat syslog Dataset (column-pruned read)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    return ds.map_batches(syslog_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# D2 — persisted per-unit doc store
# ---------------------------------------------------------------------------

#: root for persisted doc stores (scratch space; one subdir per distinct
#: source dataset). At scale this is the durable table location.
DOC_STORE_ROOT = os.environ.get("SIGRAPH_DOC_STORE",
                                "/tmp/sigraph_doc_store")


def doc_store_dir(sf_dir: str) -> str:
    """Deterministic per-source store directory — keyed on the source
    path AND the events file's (mtime, size) so a regenerated input
    gets a fresh store instead of stale reads."""
    import hashlib

    src = os.path.abspath(sf_dir)
    ev = os.path.join(src, "events.parquet")
    st = os.stat(ev)
    tag = hashlib.sha1(
        f"{src}|{st.st_mtime_ns}|{st.st_size}".encode()).hexdigest()[:12]
    return os.path.join(DOC_STORE_ROOT,
                        f"{os.path.basename(src)}-{tag}")


def ensure_doc_store(sf_dir: str, *, root: str | None = None) -> str:
    """The doc store as a TABLE, not a derivation (reference: the
    OpenSearch index, db_model.py:12-109): derive the syslog document
    model ONCE per source and persist it unit-partitioned
    (``write_unit_partitioned`` — one directory per unit, so D2 unit
    flush = drop the directory). Subsequent syslog queries read the
    persisted Parquet instead of recomputing the mapping. Atomic via
    tmp dir + rename; a concurrent builder races benignly (first
    rename wins, the loser discards its tmp dir). Returns the
    ``documents`` table directory."""
    import shutil

    from sigraph_ray.stages.provenance_graph import write_unit_partitioned

    base = root or doc_store_dir(sf_dir)
    table_dir = os.path.join(base, "documents")
    marker = os.path.join(base, "_SUCCESS")
    if os.path.exists(marker):
        return table_dir
    tmp = f"{base}.tmp-{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    write_unit_partitioned(derive_syslog(sf_dir), tmp, table="documents")
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("")
    os.makedirs(DOC_STORE_ROOT, exist_ok=True)
    try:
        os.rename(tmp, base)
    except OSError:
        # lost the race — another process completed the store
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(marker):
            raise
    return table_dir


def read_doc_store(sf_dir: str, *, root: str | None = None):
    """Dataset over the persisted doc store (building it on first use).
    ``unit_id`` comes back as the hive partition column; all other
    columns round-trip from the derived layout."""
    import ray.data as rd

    return rd.read_parquet(ensure_doc_store(sf_dir, root=root))


def nest_raw_data(batch: pa.Table) -> pa.Table:
    """Flat ``raw_data.*`` columns → one Arrow struct column
    ``raw_data`` (the SyslogModel nested-document shape)."""
    meta_fields = [f for f in RAW_FIELDS if f.startswith("raw_data.Metadata.")]
    meta = pa.StructArray.from_arrays(
        [batch.column(f).combine_chunks() for f in meta_fields],
        names=[f.rsplit(".", 1)[-1] for f in meta_fields])
    raw = pa.StructArray.from_arrays(
        [batch.column("raw_data.EventName").combine_chunks(),
         batch.column("raw_data.Timestamp").combine_chunks(),
         meta],
        names=["EventName", "Timestamp", "Metadata"])
    keep = [c for c in batch.column_names if not c.startswith("raw_data.")]
    return batch.select(keep).append_column("raw_data", raw)


def flatten_raw_data(batch: pa.Table) -> pa.Table:
    """Inverse of :func:`nest_raw_data` — the S4 "dynamic mapping"
    step: nested leaves become typed keyword (string) columns."""
    raw = batch.column("raw_data").combine_chunks()
    keep = batch.drop_columns(["raw_data"])
    keep = keep.append_column("raw_data.EventName", raw.field("EventName"))
    keep = keep.append_column("raw_data.Timestamp", raw.field("Timestamp"))
    meta = raw.field("Metadata")
    for fld in meta.type:
        keep = keep.append_column(f"raw_data.Metadata.{fld.name}",
                                  meta.field(fld.name))
    return keep


class SigmaMatcher:
    """Actor-pool J7 kernel: rules compiled once per actor from the
    uploaded YAML bytes; per batch, each rule contributes its matches
    after the mandatory unit / EventName-category terms."""

    def __init__(self, rule_yaml: str | bytes, unit_id: str | None,
                 prefix: str = "raw_data.Metadata"):
        from sigraph_ray.functions.sigma import compile_rules

        self.rules = compile_rules(rule_yaml, prefix=prefix)
        self.unit_id = unit_id

    def __call__(self, df: pd.DataFrame) -> pa.Table:
        base = np.ones(len(df), dtype=bool)
        if self.unit_id is not None:
            base &= (df["unit_id"] == self.unit_id).to_numpy()
        titles, spans, tss = [], [], []
        for rule in self.rules:
            mask = base.copy()
            if rule.category is not None:
                mask &= (df["raw_data.EventName"]
                         == rule.category).to_numpy()
            mask &= rule.mask(df)
            hit = df.loc[mask]
            titles.extend([rule.title] * len(hit))
            spans.extend(hit["span_id"])
            tss.extend(hit["raw_data.Timestamp"])
        return pa.table({
            "rule_title": pa.array(titles, pa.string()),
            "span_id": pa.array(spans, pa.string()),
            "timestamp": pa.array(tss, pa.string()),
        })


def sigma_match(syslog_ds, rule_yaml: str | bytes, *,
                unit_id: str | None = None, concurrency: int = 2):
    """J7 — scan a flat syslog Dataset with compiled Sigma rules.
    Returns (rule_title, span_id, timestamp) match rows (the batch
    analog of get_syslog_by_subquery's raw-doc hits; timestamp is the
    raw string the reference sorts by)."""
    return syslog_ds.map_batches(
        SigmaMatcher, batch_format="pandas",
        fn_constructor_kwargs={"rule_yaml": rule_yaml, "unit_id": unit_id},
        concurrency=concurrency)


class _TraceIdPartials:
    """Per-batch combiner: distinct trace_ids of rows matching ANY of
    the compiled rules (after the unit + EventName-category terms)."""

    def __init__(self, rule_yaml: str | bytes, unit_id: str,
                 prefix: str = "raw_data.Metadata"):
        from sigraph_ray.functions.sigma import compile_rules

        self.rules = compile_rules(rule_yaml, prefix=prefix)
        self.unit_id = unit_id

    def __call__(self, df: pd.DataFrame) -> pa.Table:
        base = (df["unit_id"] == self.unit_id).to_numpy()
        any_hit = np.zeros(len(df), dtype=bool)
        for rule in self.rules:
            mask = base.copy()
            if rule.category is not None:
                mask &= (df["raw_data.EventName"]
                         == rule.category).to_numpy()
            mask &= rule.mask(df)
            any_hit |= mask
        return pa.table({"trace_id": pa.array(
            df.loc[any_hit, "trace_id"].unique(), pa.string())})


def sigma_trace_ids(syslog_ds, rule_yaml: str | bytes, *, unit_id: str,
                    concurrency: int = 2):
    """get_trace_ids_with_lucene_query (db_session.py:346-413): the
    distinct trace ids of one unit whose syslog docs match the compiled
    query. Per-batch distinct combiner + one Count-distinct groupby."""
    from sigraph_ray.stages.collect import sorted_distinct

    return sorted_distinct(
        syslog_ds.map_batches(
            _TraceIdPartials, batch_format="pandas",
            fn_constructor_kwargs={"rule_yaml": rule_yaml,
                                   "unit_id": unit_id},
            concurrency=concurrency),
        ["trace_id"])


def label_sequences(syslog_ds, rule_yaml: str | bytes, *, unit_id: str,
                    label: str, concurrency: int = 2):
    """label_syslog_sequences_with_lucene_query
    (db_session.py:414-446): query → matching trace ids → the FULL
    syslog sequence of every matching trace, tagged with ``label`` —
    the weak-supervision labeling flow for training-data pipelines.
    The matching trace-id set is per-unit-bounded and broadcast (the
    same semi-join shape as drift/IoC); the sequence fetch is one
    streaming pass over the doc store, sorted by the raw Timestamp
    string (the reference's sequence order)."""
    import ray

    ids = sigma_trace_ids(syslog_ds, rule_yaml, unit_id=unit_id,
                          concurrency=concurrency)
    trace_set = set(ids.to_pandas()["trace_id"])
    ref = ray.put(trace_set)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        ts = ray.get(ref)
        out = df[(df["unit_id"] == unit_id)
                 & df["trace_id"].isin(ts)].copy()
        out["label"] = label
        return out[["unit_id", "trace_id", "span_id",
                    "raw_data.Timestamp", "label"]].rename(
            columns={"raw_data.Timestamp": "timestamp"})

    return (syslog_ds.map_batches(pick, batch_format="pandas")
            .sort(["trace_id", "timestamp", "span_id"]))
