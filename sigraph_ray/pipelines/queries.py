"""Driver-checkable queries: every entry pairs a Ray Data pipeline with
an ANSI-SQL oracle over the same parquet tables (driver contract in
``__ray_entry__.py``).

The provenance-graph queries derive a deterministic provenance-event
stream from the generic ``events`` table (mapping below, implemented
IDENTICALLY in :func:`_events_to_prov` and in the SQL CTE ``base``) and
then run the REAL construction operators
(stages/provenance_graph.py) over it — so U1/U2/U3/U4 semantics are
checked against DuckDB row-for-row, not just against our own simulator.

Mapping events → GraphNode fields (pure function of event_id/user_id/
event_type/ts; all expressible in SQL):

    span_id    = 'span_' || lpad(event_id, 12, '0')
    trace_id   = 'trace_' || user_id
    unit_id    = 'unit_'  || (user_id % 3)
    weight     = (event_id % 9) + 1
    process    = NULL if event_id % 10 == 0 else 'proc_'||(user_id%7)||'.exe'
    parent     = NULL if event_id % 11 == 0 else that process @PROCESS
    malformed  = event_id % 37 == 0  → system_provenance 'no_at_sign'
    artifact   = per event_type:
      click    → file_{event_id%100}.tmp@FILE,      CREATE,  WRITE_SEND
      purchase → 10.0.0.{event_id%256}@NETWORK,     CONNECT, WRITE_SEND
      error    → hklm\\software\\k{event_id%50}@REGISTRY, REG_SET, WRITE_SEND
      signup   → mod_{event_id%20}.dll@MODULE,      LOAD,    READ_RECV
      view     → cfg_{event_id%30}.ini@FILE,        MODIFY,  READ_RECV
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

def _conc(frac: float = 0.25, lo: int = 2, hi: int = 16) -> int:
    """Actor-pool size proportional to the session's CPUs (an actor
    pool RESERVES its CPUs; a fixed size either starves a big session
    or deadlocks a small one — the pool must stay well under the CPU
    count so producer tasks and downstream shuffles keep slots)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(lo, min(hi, int(cpus * frac)))


_SPEC = {
    "click": ("file_{m100}.tmp", "FILE", "CREATE", "WRITE_SEND"),
    "purchase": ("10.0.0.{m256}", "NETWORK", "CONNECT", "WRITE_SEND"),
    "error": ("hklm\\software\\k{m50}", "REGISTRY", "REG_SET", "WRITE_SEND"),
    "signup": ("mod_{m20}.dll", "MODULE", "LOAD", "READ_RECV"),
    "view": ("cfg_{m30}.ini", "FILE", "MODIFY", "READ_RECV"),
}


def _events_to_prov(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    eid = df["event_id"].to_numpy()
    uid = df["user_id"].to_numpy()
    name = np.empty(len(df), dtype=object)
    prov = np.empty(len(df), dtype=object)
    mods = {"m100": eid % 100, "m256": eid % 256, "m50": eid % 50,
            "m20": eid % 20, "m30": eid % 30}
    et = df["event_type"].to_numpy()
    for t, (tpl, atype, action, actor) in _SPEC.items():
        mask = et == t
        if not mask.any():
            continue
        key = tpl[tpl.find("{") + 1:tpl.find("}")]
        vals = mods[key][mask]
        base = np.char.add(
            np.char.add(tpl.split("{")[0], vals.astype(str)),
            tpl.split("}")[1])
        prov[mask] = np.char.add(base, f"@{atype}@{action}@{actor}")
        name[mask] = base
    prov[eid % 37 == 0] = "no_at_sign"
    proc = np.char.add(np.char.add("proc_", (uid % 7).astype(str)), ".exe")
    out = pd.DataFrame({
        "trace_id": np.char.add("trace_", uid.astype(str)),
        "span_id": np.char.add("span_", np.char.zfill(eid.astype(str), 12)),
        "unit_id": np.char.add("unit_", (uid % 3).astype(str)),
        "system_provenance": prov,
        "timestamp": df["ts"],
        "weight": (eid % 9) + 1,
        "process_name": pd.Series(proc, dtype="object").mask(eid % 10 == 0),
        "related_rule_ids": pd.Series(
            [[f"rule_{e % 12}"] if e % 5 == 0 else [] for e in eid],
            dtype="object"),
        "parent_span_id": pd.Series(
            np.char.add("pspan_", uid.astype(str)), dtype="object"
        ).mask(eid % 11 == 0),
        "parent_system_provenance": pd.Series(
            np.char.add(proc, "@PROCESS@LAUNCH@NOT_ACTOR"), dtype="object"
        ).mask(eid % 11 == 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False)


_SQL_BASE = """
base AS (
  SELECT event_id, ts, user_id, event_type,
         (event_id % 9) + 1 AS weight,
         'span_' || lpad(CAST(event_id AS VARCHAR), 12, '0') AS span_id,
         'trace_' || CAST(user_id AS VARCHAR) AS trace_id,
         'unit_' || CAST(user_id % 3 AS VARCHAR) AS unit_id,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'proc_' || CAST(user_id % 7 AS VARCHAR) || '.exe'
         END AS process_name,
         CASE WHEN event_id % 11 = 0 THEN NULL
              ELSE 'pspan_' || CAST(user_id AS VARCHAR) END AS parent_span_id,
         CASE WHEN event_id % 11 = 0 THEN NULL
              ELSE 'proc_' || CAST(user_id % 7 AS VARCHAR) || '.exe@PROCESS'
         END AS parent_key,
         (event_id % 37 = 0) AS malformed,
         CASE event_type
           WHEN 'click'    THEN 'file_' || CAST(event_id % 100 AS VARCHAR) || '.tmp@FILE'
           WHEN 'purchase' THEN '10.0.0.' || CAST(event_id % 256 AS VARCHAR) || '@NETWORK'
           WHEN 'error'    THEN 'hklm\\software\\k' || CAST(event_id % 50 AS VARCHAR) || '@REGISTRY'
           WHEN 'signup'   THEN 'mod_' || CAST(event_id % 20 AS VARCHAR) || '.dll@MODULE'
           ELSE 'cfg_' || CAST(event_id % 30 AS VARCHAR) || '.ini@FILE'
         END AS artifact,
         CASE event_type WHEN 'click' THEN 'CREATE' WHEN 'purchase' THEN 'CONNECT'
              WHEN 'error' THEN 'REG_SET' WHEN 'signup' THEN 'LOAD'
              ELSE 'MODIFY' END AS action_type,
         CASE event_type WHEN 'signup' THEN 'READ_RECV' WHEN 'view' THEN 'READ_RECV'
              ELSE 'WRITE_SEND' END AS actor_type
  FROM events
),
valid AS (
  SELECT *, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' || span_id AS ord
  FROM base WHERE NOT malformed
)
"""


def derive_prov_events(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    return ds.map_batches(_events_to_prov, batch_format="pyarrow")


# --- provenance-graph queries ----------------------------------------------

_PARSED_CACHE: dict[str, object] = {}


def _parsed_events(sf_dir: str):
    """Materialized parsed event stream, cached per sf_dir — the driver
    calls many provenance queries in one process and every one consumes
    the same parse; pinning it once turns nine re-parses into one."""
    ds = _PARSED_CACHE.get(sf_dir)
    if ds is None:
        from sigraph_ray.stages import provenance_graph as G

        ds = derive_prov_events(sf_dir).map_batches(
            G.parse_events_batch, batch_format="pyarrow").materialize()
        _PARSED_CACHE[sf_dir] = ds
    return ds



def q_prov_nodes(sf_dir: str):
    """U1 node merge, scalar projection (list columns → counts so the
    value-hash compare is representation-stable)."""
    from sigraph_ray.stages import provenance_graph as G

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    nodes = G.build_nodes(ok)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "artifact": df["artifact"],
            "artifact_type": df["artifact_type"],
            "image": df["image"],
            "n_spans": df["related_span_ids"].map(len).astype("int64"),
            "n_traces": df["related_trace_ids"].map(len).astype("int64"),
        })
    return nodes.map_batches(project, batch_format="pandas")


SQL_PROV_NODES = f"""
WITH {_SQL_BASE},
from_events AS (
  SELECT artifact,
         count(DISTINCT span_id) AS n_spans,
         count(DISTINCT trace_id) AS n_traces,
         arg_max(process_name, ord) FILTER (process_name IS NOT NULL) AS image
  FROM valid GROUP BY artifact
),
parents AS (
  SELECT DISTINCT parent_key AS artifact FROM valid
  WHERE parent_key IS NOT NULL
),
allnodes AS (
  SELECT coalesce(e.artifact, p.artifact) AS artifact,
         coalesce(e.n_spans, 0) AS n_spans,
         coalesce(e.n_traces, 0) AS n_traces,
         e.image AS image
  FROM from_events e FULL OUTER JOIN parents p ON e.artifact = p.artifact
)
SELECT artifact,
       string_split(artifact, '@')[-1] AS artifact_type,
       image, n_spans, n_traces
FROM allnodes ORDER BY artifact
"""


def q_prov_traces(sf_dir: str):
    from sigraph_ray.stages import provenance_graph as G

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    return G.build_traces(ok)


SQL_PROV_TRACES = f"""
WITH {_SQL_BASE}
SELECT unit_id, trace_id,
       min(ts) AS start_time,
       nullif(arg_min(coalesce(process_name, chr(1)), ord), chr(1))
           AS representative_process_name,
       count(*) AS span_count
FROM valid GROUP BY unit_id, trace_id ORDER BY unit_id, trace_id
"""


def q_prov_edges(sf_dir: str):
    from sigraph_ray.stages import provenance_graph as G

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    return G.build_edges(ok)


SQL_PROV_EDGES = f"""
WITH {_SQL_BASE},
edges_raw AS (
  SELECT CASE WHEN actor_type = 'READ_RECV' THEN artifact ELSE parent_key END AS src,
         CASE WHEN actor_type = 'READ_RECV' THEN parent_key ELSE artifact END AS dst,
         action_type AS type, ts, weight, ord
  FROM valid WHERE parent_key IS NOT NULL AND parent_span_id IS NOT NULL
)
SELECT src, dst, type,
       arg_max(ts, ord) AS start_time,
       arg_max(weight, ord) AS weight
FROM edges_raw GROUP BY src, dst, type ORDER BY src, type, dst
"""


def q_prov_contains(sf_dir: str):
    from sigraph_ray.stages import provenance_graph as G

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    return G.build_contains(ok)


SQL_PROV_CONTAINS = f"""
WITH {_SQL_BASE},
cur AS (SELECT DISTINCT unit_id, trace_id, artifact FROM valid),
appearances AS (
  SELECT artifact, ord, unit_id, trace_id, 0 AS kind FROM valid
  UNION ALL
  SELECT parent_key AS artifact, ord, unit_id, trace_id, 1 AS kind
  FROM valid WHERE parent_key IS NOT NULL
),
firsts AS (
  SELECT artifact, unit_id, trace_id, kind,
         row_number() OVER (PARTITION BY artifact ORDER BY ord) AS rn
  FROM appearances
),
parent_first AS (
  SELECT unit_id, trace_id, artifact FROM firsts WHERE rn = 1 AND kind = 1
)
SELECT unit_id, trace_id, artifact FROM cur
UNION
SELECT unit_id, trace_id, artifact FROM parent_first
ORDER BY unit_id, trace_id, artifact
"""


def q_prov_quarantine(sf_dir: str):
    from sigraph_ray.stages import provenance_graph as G

    parsed = _parsed_events(sf_dir)
    _, bad = G.split_quarantine(parsed)
    return bad.groupby("unit_id").count().map_batches(
        lambda df: df.rename(columns={"count()": "n_quarantined"}),
        batch_format="pandas")


SQL_PROV_QUARANTINE = f"""
WITH {_SQL_BASE}
SELECT unit_id, count(*) AS n_quarantined
FROM base WHERE malformed GROUP BY unit_id ORDER BY unit_id
"""


# --- relational coverage (read / filter / agg / join / sort-limit) ---------

def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-style grouped aggregate — read-pruned, vectorized
    pre-aggregation then a tiny groupby.

    Revenue is summed in exact integer units (price-cents × discount
    basis points): TPC-H prices/discounts are 2-dp decimals, so
    round(p*100) * round((1-d)*100) is the exact revenue in 10^-4
    units.  Integer addition is order-independent, making the float
    emitted by the final /1e4 projection deterministic across block
    orders and bit-identical to the same integer sum computed by the
    SQL oracle (a float Sum("revenue") varies in the last ulps with
    the streaming executor's addition order).  int64 headroom: row
    revenue < 1e13 units, so a group overflows only past ~9e5 billion
    rows; at that scale aggregate into decimal128 instead."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def revenue_units(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
        disc_bp = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            pa.scalar(100.0))), pa.int64())
        return t.append_column("revenue_units", pc.multiply(cents, disc_bp))

    def partial(t: pa.Table) -> pa.Table:
        # per-batch combiner: ≤ |flag × status| partial rows per block
        # reach the shuffle instead of every line item. All three
        # aggregates re-combine exactly (integer units; quantities are
        # integral so their float sum is exact far past this scale).
        df = t.to_pandas()
        g = (df.groupby(["l_returnflag", "l_linestatus"], sort=False)
             .agg(sum_qty=("l_quantity", "sum"),
                  sum_revenue_units=("revenue_units", "sum"),
                  n_rows=("l_quantity", "size"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(revenue_units, batch_format="pyarrow")
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("sum_revenue_units",
                          alias_name="sum_revenue_units"),
                      Sum("n_rows", alias_name="n_rows")))

    def finish(t: pa.Table) -> pa.Table:
        rev = pc.divide(pc.cast(t.column("sum_revenue_units"), pa.float64()),
                        pa.scalar(1e4))
        return (t.append_column("sum_revenue", rev)
                .drop_columns(["sum_revenue_units"]))

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       count(*) AS n_rows,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 10000.0
         AS sum_revenue
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_lineitem_rollup(sf_dir: str):
    """Multi-level ROLLUP aggregate — (flag, status) cells, per-flag
    subtotals, grand total — derived from ONE pass: the finest-level
    aggregate is tiny (|flag×status| rows), so the coarser levels
    re-combine from it exactly (integer revenue units re-sum
    losslessly); no second scan of the fact table."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100)\
            .astype("int64")
        disc = np.round((1.0 - df["l_discount"].to_numpy()) * 100)\
            .astype("int64")
        df["units"] = cents * disc
        g = (df.groupby(["l_returnflag", "l_linestatus"], sort=False)
             .agg(sum_qty=("l_quantity", "sum"),
                  units=("units", "sum"),
                  n_rows=("l_quantity", "size"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                       Sum("units", alias_name="units"),
                       Sum("n_rows", alias_name="n_rows"))
            .to_pandas())
    sub = (fine.groupby("l_returnflag", as_index=False)
           [["sum_qty", "units", "n_rows"]].sum())
    sub["l_linestatus"] = None
    total = pd.DataFrame([{
        "l_returnflag": None, "l_linestatus": None,
        "sum_qty": fine["sum_qty"].sum(), "units": fine["units"].sum(),
        "n_rows": fine["n_rows"].sum()}])
    out = pd.concat([fine, sub, total], ignore_index=True)
    out["sum_revenue"] = out["units"].astype("float64") / 1e4
    out["n_rows"] = out["n_rows"].astype("int64")
    return (out[["l_returnflag", "l_linestatus", "sum_qty", "n_rows",
                 "sum_revenue"]]
            .sort_values(["l_returnflag", "l_linestatus"],
                         kind="stable", na_position="last")
            .reset_index(drop=True))


SQL_LINEITEM_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       count(*) AS n_rows,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 10000.0
         AS sum_revenue
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
"""


def q_user_event_pivot(sf_dir: str):
    """PIVOT / crosstab — per-user event-type counts as columns: one
    vectorized per-batch crosstab partial (≤ |users-in-batch| rows
    reach the shuffle), then a grouped-sum stitch over the five
    numeric columns."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    types = ["click", "error", "purchase", "signup", "view"]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df["user_id"], df["event_type"])
        for t in types:
            if t not in ct.columns:
                ct[t] = 0
        ct = ct[types].rename(columns={t: f"n_{t}" for t in types})
        return ct.rename_axis("user_id").reset_index()

    agg = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key="user_id",
        aggs={f"n_{t}": (f"n_{t}", "sum") for t in types})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        for t in types:
            out[f"n_{t}"] = out[f"n_{t}"].astype("int64")
        out["n_total"] = sum(out[f"n_{t}"] for t in types)
        out["user_id"] = out["user_id"].astype("int64")
        return out

    return agg.map_batches(finish, batch_format="pandas")


SQL_USER_EVENT_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS n_click,
       count(*) FILTER (event_type = 'error')    AS n_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup')   AS n_signup,
       count(*) FILTER (event_type = 'view')     AS n_view,
       count(*) AS n_total
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_top_customers(sf_dir: str):
    """Broadcast hash join (small dimension side via ray.put) + grouped
    sum + deterministic top-10."""
    import ray
    import ray.data as rd


    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_mktsegment"])
    # the inner join only needs the KEY SET inside the tasks (dimension
    # attributes re-attach from the driver-held frame after the top-k);
    # broadcast a sorted numpy key array — ray.get of a numpy object is
    # a ZERO-COPY view into the object store, so a plain task pool reads
    # it for free and no actor pool (with its per-process cold start)
    # is needed for this lookup stage
    keys_ref = ray.put(np.sort(cust["c_custkey"].to_numpy()))

    def join_customer(df: pd.DataFrame) -> pa.Table:
        keys = ray.get(keys_ref)
        hit = keys[np.searchsorted(keys, df["o_custkey"].to_numpy())
                   .clip(max=len(keys) - 1)] == df["o_custkey"].to_numpy()
        out = df[hit]
        # combiner: partial sums per batch — only one row per
        # customer per batch reaches the shuffle (Arrow out)
        part = (out.groupby("o_custkey", sort=False)["o_totalprice"]
                .sum().rename("o_totalprice").reset_index()
                .rename(columns={"o_custkey": "c_custkey"}))
        return pa.Table.from_pandas(part, preserve_index=False)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    joined = orders.map_batches(join_customer, batch_format="pandas")
    # single integer-key grouped sum; dimension attributes re-attached
    # from the broadcast side afterwards (never shuffle strings you can
    # look up). The partial rows stay row-heavy (most orders in a batch
    # carry distinct customers), so the global phase uses the
    # sort+blockwise-stitch sum instead of Ray's aggregate reduce (whose
    # per-row combine would dominate). Top-10 via two-phase top-k.
    from sigraph_ray.stages.collect import sorted_groupby_sum

    agg = sorted_groupby_sum(joined, key="c_custkey",
                             sum_cols={"total_spent": "o_totalprice"})

    def partial_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["total_spent", "c_custkey"],
                              ascending=[False, True]).head(10)

    partials = agg.map_batches(partial_top, batch_format="pandas").to_pandas()
    top = partials.sort_values(["total_spent", "c_custkey"],
                               ascending=[False, True]).head(10)
    out = top.merge(cust, on="c_custkey")
    return out[["c_custkey", "c_name", "c_mktsegment", "total_spent"]]


SQL_TOP_CUSTOMERS = """
SELECT c_custkey, c_name, c_mktsegment,
       sum(o_totalprice) AS total_spent
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name, c_mktsegment
ORDER BY total_spent DESC, c_custkey ASC LIMIT 10
"""


def q_funnel_conversion(sf_dir: str):
    """Two-step funnel: users whose first signup is followed by a
    purchase within 7 days. Per-user min-signup stitch ⨝ purchase
    events (one hash join, window filter vectorized), distinct-user
    count — the event-sequence analytics pattern as dataflow."""
    import ray.data as rd

    from sigraph_ray.stages.collect import (sorted_distinct,
                                            sorted_groupby_agg)
    from sigraph_ray.stages.joins import safe_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    signups = ev.filter(expr="event_type == 'signup'")
    purchases = (ev.filter(expr="event_type == 'purchase'")
                 .select_columns(["user_id", "ts"]))

    def min_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("user_id", sort=False)["ts"].min()
                .rename("s").reset_index())

    su = sorted_groupby_agg(
        signups.map_batches(min_partial, batch_format="pandas"),
        key="user_id", aggs={"s": ("s", "min")})
    n_signups = su.count()
    j = safe_join(
        purchases, su, "inner", 8, on=("user_id",),
        left_schema=pa.schema([("user_id", pa.int64()),
                               ("ts", pa.timestamp("us"))]),
        right_schema=pa.schema([("user_id", pa.int64()),
                                ("s", pa.timestamp("us"))]))

    def in_window(df: pd.DataFrame) -> pd.DataFrame:
        ok = (df["ts"] >= df["s"]) &             (df["ts"] <= df["s"] + pd.Timedelta(days=7))
        return df.loc[ok, ["user_id"]]

    conv = sorted_distinct(j.map_batches(in_window,
                                         batch_format="pandas"),
                           ["user_id"])
    n_conv = conv.count()
    return pd.DataFrame({
        "n_signups": pd.Series([n_signups], dtype="int64"),
        "n_converted": pd.Series([n_conv], dtype="int64"),
        "conversion_rate": [n_conv / n_signups if n_signups else 0.0],
    })


SQL_FUNNEL_CONVERSION = """
WITH su AS (
  SELECT user_id, min(ts) AS s FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
  SELECT DISTINCT su.user_id
  FROM su JOIN events e ON e.user_id = su.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts >= su.s AND e.ts <= su.s + INTERVAL 7 DAY
)
SELECT (SELECT count(*) FROM su) AS n_signups,
       (SELECT count(*) FROM conv) AS n_converted,
       CAST((SELECT count(*) FROM conv) AS DOUBLE)
         / (SELECT count(*) FROM su) AS conversion_rate
"""


def q_cohort_retention(sf_dir: str):
    """Cohort retention matrix: users bucketed by first-activity month
    (cohort), counted per (cohort, activity month). Composition:
    per-user min-month stitch (cohort table, user-sized) ⨝ distinct
    (user, month) activity pairs — one hash join + one grouped-count
    stitch; the raw event stream collapses at the first combiner."""
    import ray.data as rd

    from sigraph_ray.stages.collect import (sorted_distinct,
                                            sorted_groupby_agg)
    from sigraph_ray.stages.joins import safe_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def month(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "m": pc.floor_temporal(t.column("ts"), unit="month"),
        })

    um = ev.map_batches(month, batch_format="pyarrow")
    activity = sorted_distinct(um, ["user_id", "m"])

    def cohort_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False)["m"].min().rename("cm")
        return g.reset_index()

    cohorts = sorted_groupby_agg(
        um.map_batches(cohort_partial, batch_format="pandas"),
        key="user_id", aggs={"cohort": ("cm", "min")})
    joined = safe_join(
        activity, cohorts, "inner", 8, on=("user_id",),
        left_schema=pa.schema([("user_id", pa.int64()),
                               ("m", pa.timestamp("us"))]),
        right_schema=pa.schema([("user_id", pa.int64()),
                                ("cohort", pa.timestamp("us"))]))

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["cohort", "m"], sort=False).size()
             .rename("c").reset_index())
        return g

    out = sorted_groupby_agg(
        joined.map_batches(count_partial, batch_format="pandas"),
        key=["cohort", "m"], aggs={"n_users": ("c", "sum")})
    return out.map_batches(
        lambda df: df.rename(columns={"m": "activity_month"})
        .astype({"n_users": "int64"}), batch_format="pandas")         .sort(["cohort", "activity_month"])


SQL_COHORT_RETENTION = """
WITH c AS (
  SELECT user_id, min(date_trunc('month', ts)) AS cohort
  FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT user_id, date_trunc('month', ts) AS activity_month
  FROM events
)
SELECT c.cohort, a.activity_month, count(*) AS n_users
FROM a JOIN c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_burst_hours(sf_dir: str):
    """Burst / anomaly detection on the event stream (streaming-
    analytics composition): hourly counts per event type, trailing-24 h
    mean via the sliding RANGE window operator, rows flagged when the
    hour runs ≥ 3× its trailing mean with ≥ 6 h of history. One grouped
    aggregate + one sorted-stitch window pass — no driver loops."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from sigraph_ray.stages.temporal import sliding_window_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def window(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        return t.append_column("hour", hour)

    hc = (ds.map_batches(window, batch_format="pyarrow")
          .groupby(["hour", "event_type"])
          .aggregate(Count(alias_name="cnt"))
          # the stitch needs a tiebreak column distinct from ts
          .map_batches(lambda t: t.append_column(
              "hour_tb", t.column("hour")), batch_format="pyarrow"))
    win = sliding_window_agg(hc, key="event_type", ts="hour",
                             tiebreak="hour_tb", window="24h",
                             value="cnt", keep_value=True)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        mean = df["sum_value_window"] / df["n_window"]
        return pd.DataFrame({
            "event_type": df["event_type"],
            "hour": df["hour"],
            "cnt": df["cnt"].astype("int64"),
            "n_window": df["n_window"].astype("int64"),
            "mean_24h": mean,
            "is_burst": (df["n_window"] >= 6)
            & (df["cnt"] >= 3.0 * mean),
        })

    return win.map_batches(flag, batch_format="pandas")


SQL_BURST_HOURS = """
WITH hc AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, hour, cnt,
         count(*) OVER w AS n_window,
         sum(cnt) OVER w AS sum_cnt
  FROM hc
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                         AND CURRENT ROW)
)
SELECT event_type, hour, cnt, n_window,
       CAST(sum_cnt AS DOUBLE) / n_window AS mean_24h,
       n_window >= 6 AND cnt >= 3.0 * (CAST(sum_cnt AS DOUBLE) / n_window)
         AS is_burst
FROM win ORDER BY event_type, hour
"""


def q_events_hourly(sf_dir: str):
    """Event-time tumbling window as a grouped aggregate on a computed
    window key (streaming-shaped workload, batch form)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id", "event_type", "value"])

    def window(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        return t.append_column("window_start", hour)

    return (ds.map_batches(window, batch_format="pyarrow")
            .groupby(["window_start", "event_type"])
            .aggregate(Count(alias_name="n_events"),
                       Sum("value", alias_name="sum_value")))


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, sum(value) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_asof_attribution(sf_dir: str):
    """AS-OF JOIN (brief-named custom operator): each purchase joined
    to the SAME user's latest click at-or-before it (inclusive, inner).
    stages/temporal.sorted_asof_join — one range sort + grouped ffill
    per block + driver stitch of the two boundary keys per block."""
    import ray.data as rd

    from sigraph_ray.stages.temporal import sorted_asof_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'")
    clicks = ev.filter(expr="event_type == 'click'")
    return sorted_asof_join(
        purchases, clicks, key="user_id", ts="ts", tiebreak="event_id",
        left_cols=["event_id", "user_id", "ts"],
        right_cols={"click_event_id": "event_id"}).map_batches(
            lambda df: df.assign(
                click_event_id=df["click_event_id"].astype("int64")),
            batch_format="pandas")


SQL_ASOF_ATTRIBUTION = """
SELECT p.event_id, p.user_id, p.ts, c.event_id AS click_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


def q_approx_distinct(sf_dir: str):
    """HLL approximate distinct (user_id, event_type) pairs — mergeable
    sketch, no shuffle (stages/sketch). Approximate by design →
    rows-only; the pytest gate bounds relative error vs the exact
    distinct at 3%."""
    import ray.data as rd

    from sigraph_ray.stages.sketch import approx_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    est = approx_distinct(ds, ["user_id", "event_type"])
    return pd.DataFrame({"approx_distinct_pairs": [round(est)]})


def q_range_join(sf_dir: str):
    """RANGE (band) JOIN (brief-named custom operator): every
    (purchase, click) pair of one user with the click inside the 24 h
    window before the purchase. stages/temporal.sorted_range_join —
    vectorized composite-key searchsorted per block + boundary
    stitch."""
    import ray.data as rd

    from sigraph_ray.stages.temporal import sorted_range_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'")
    clicks = ev.filter(expr="event_type == 'click'")
    return sorted_range_join(
        purchases, clicks, key="user_id", ts="ts", tiebreak="event_id",
        window="24h", left_cols=["event_id", "user_id", "ts"],
        right_cols={"click_event_id": "event_id"}).map_batches(
            lambda df: df.assign(
                click_event_id=df["click_event_id"].astype("int64")),
            batch_format="pandas")


SQL_RANGE_JOIN = """
SELECT p.event_id, p.user_id, p.ts, c.event_id AS click_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 24 HOUR AND p.ts
ORDER BY p.event_id, c.event_id
"""


def q_grouped_approx_distinct(sf_dir: str):
    """Per-event-type approximate distinct users (stages/sketch
    .grouped_approx_distinct): per-block per-group HLL partials,
    register-max merge — rows-only (approximate by design; error
    gated in pytest vs exact)."""
    import ray.data as rd

    from sigraph_ray.stages.sketch import grouped_approx_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return grouped_approx_distinct(ev, group="event_type",
                                   cols=["user_id"])


def q_sessionize(sf_dir: str):
    """Session-window aggregate (brief-named custom operator): per-user
    sessions split at >12 h gaps; one row per session with count, span
    and value sum. stages/temporal.sessionize (sort + vectorized
    per-block gap/cumsum + boundary stitch)."""
    import ray.data as rd

    from sigraph_ray.stages.temporal import sessionize

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    return sessionize(ev, key="user_id", ts="ts", tiebreak="event_id",
                      gap="12h", value="value")


SQL_SESSIONIZE = """
WITH b AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 12 HOUR THEN 1
              ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session
  FROM b
)
SELECT user_id, session, count(*) AS n_events, min(ts) AS session_start,
       max(ts) AS session_end, sum(value) AS sum_value
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_quantiles(sf_dir: str):
    """Exact distributed quantiles (stages/quantiles.exact_quantiles):
    one range sort + O(#blocks) scalar probes + remote rank picks —
    matches DuckDB quantile_disc bit-for-bit."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"])
    return exact_quantiles(ds, "l_extendedprice",
                           [0.01, 0.25, 0.5, 0.75, 0.99])


def q_grouped_quantiles(sf_dir: str):
    """Exact per-source length percentiles (stages/quantiles
    .grouped_exact_quantiles): one (key, value) range sort + group-
    count probes + remote rank picks."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import grouped_exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    return grouped_exact_quantiles(ds, key="source", col="n_chars",
                                   qs=[0.5, 0.9])


SQL_GROUPED_QUANTILES = """
SELECT source,
       unnest([0.5, 0.9]) AS q,
       unnest(quantile_disc(n_chars, [0.5, 0.9])) AS value
FROM documents GROUP BY source ORDER BY source, q
"""


def q_approx_quantiles(sf_dir: str):
    """Shuffle-free approximate quantiles (stages/quantiles
    .approx_quantiles): per-block weighted summaries merged by
    concatenation, ε ≈ 1/per_block rank error (rows-only: approximate
    by design; the pytest gate bounds the rank error vs exact)."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import approx_quantiles

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"])
    return approx_quantiles(ds, "l_extendedprice",
                            [0.01, 0.25, 0.5, 0.75, 0.99])


SQL_QUANTILES = """
SELECT CAST(0.01 AS DOUBLE) AS q,
       quantile_disc(l_extendedprice, 0.01) AS value FROM lineitem
UNION ALL SELECT 0.25, quantile_disc(l_extendedprice, 0.25) FROM lineitem
UNION ALL SELECT 0.50, quantile_disc(l_extendedprice, 0.50) FROM lineitem
UNION ALL SELECT 0.75, quantile_disc(l_extendedprice, 0.75) FROM lineitem
UNION ALL SELECT 0.99, quantile_disc(l_extendedprice, 0.99) FROM lineitem
ORDER BY q
"""


def q_top_orders_per_customer(sf_dir: str):
    """Per-group top-k (window row_number ≤ k) via the sorted-stitch
    grouped top-k (stages/collect.sorted_grouped_topk): one range sort,
    vectorized per-block head(k)+rank, boundary-key stitch capped at
    #blocks × 2 × k rows."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_grouped_topk

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    return sorted_grouped_topk(orders, key="o_custkey",
                               order_by=["o_totalprice", "o_orderkey"],
                               descending=[True, False], k=2)


SQL_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders)
WHERE rank <= 2 ORDER BY o_custkey, rank
"""


def q_sliding_window(sf_dir: str):
    """Sliding RANGE-preceding window aggregate (brief-named custom
    operator): per-user count + value sum over the trailing 1 h at
    every event. stages/temporal.sliding_window_agg — sorted stitch +
    two searchsorted probes + prefix-sum difference per row."""
    import ray.data as rd

    from sigraph_ray.stages.temporal import sliding_window_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    return sliding_window_agg(ev, key="user_id", ts="ts",
                              tiebreak="event_id", window="1h",
                              value="value")


SQL_SLIDING_WINDOW = """
SELECT event_id, user_id, ts,
       count(*) OVER w AS n_window,
       sum(value) OVER w AS sum_value_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def q_bloom_semi_lineitem(sf_dir: str):
    """Bloom-prefiltered exact SEMI join (stages/bloom
    .bloom_semi_anti): lineitems of high-value orders, then a combined
    per-flag aggregate. Only Bloom-positive lineitem rows reach the
    verification shuffle; semantics are exact, so the oracle is the
    plain IN-subquery SQL."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from sigraph_ray.stages.bloom import bloom_semi_anti

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag",
                                  "l_quantity"])
    hi = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_totalprice"])
          .filter(expr="o_totalprice > 400000.0")
          .select_columns(["o_orderkey"]))
    semi = bloom_semi_anti(li, hi, left_key="l_orderkey",
                           right_key="o_orderkey")

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (df.groupby("l_returnflag", sort=False)
             .agg(sum_qty=("l_quantity", "sum"),
                  n_rows=("l_quantity", "size")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    return (semi.map_batches(partial, batch_format="pyarrow")
            .groupby("l_returnflag")
            .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                       Sum("n_rows", alias_name="n_rows"))
            .sort("l_returnflag"))


SQL_BLOOM_SEMI_LINEITEM = """
SELECT l_returnflag,
       sum(l_quantity) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_totalprice > 400000.0)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_zorder_keys(sf_dir: str):
    """Z-order clustering keys over (l_extendedprice, l_quantity)
    (stages/zorder): the multi-dimensional layout key, bit-exact vs
    the generated SQL bit-arithmetic oracle."""
    import ray.data as rd

    from sigraph_ray.stages.zorder import zorder_key

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber",
                                  "l_extendedprice", "l_quantity"])
    out = zorder_key(li, cols=("l_extendedprice", "l_quantity"),
                     bounds=((0.0, 110000.0), (0.0, 55.0)))
    return out.select_columns(["l_orderkey", "l_linenumber", "zkey"])


def _zorder_sql() -> str:
    from sigraph_ray.stages.zorder import zorder_sql_expr

    expr = zorder_sql_expr("l_extendedprice", "l_quantity",
                           ((0.0, 110000.0), (0.0, 55.0)))
    return (f"SELECT l_orderkey, l_linenumber, {expr} AS zkey "
            "FROM lineitem ORDER BY l_orderkey, l_linenumber")


SQL_ZORDER_KEYS = _zorder_sql()


def q_upsert_compact(sf_dir: str):
    """Last-writer-wins upsert compaction (stages/upsert
    .compact_upserts): a deterministic updates stream (newer / tied /
    stale versions) merged into the orders base in one grouped-arg-max
    pass — the reference's per-key MERGE as dataflow."""
    import ray.data as rd

    from sigraph_ray.stages.upsert import compact_upserts

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def as_base(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["version"] = 10
        return out

    def as_updates(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["o_orderkey"] % 7 < 3].copy()
        out["o_totalprice"] = out["o_totalprice"] * 2
        m = out["o_orderkey"] % 3
        out["version"] = m.map({0: 20, 1: 10, 2: 5}).astype("int64")
        return out

    base = orders.map_batches(as_base, batch_format="pandas")
    upd = orders.map_batches(as_updates, batch_format="pandas")
    out = compact_upserts(base, upd, key="o_orderkey",
                          version="version")
    return out.sort("o_orderkey")


SQL_UPSERT_COMPACT = """
WITH base AS (
  SELECT o_orderkey, o_totalprice, 10 AS version, 0 AS origin
  FROM orders
), upd AS (
  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
         CASE CAST(o_orderkey % 3 AS INTEGER)
              WHEN 0 THEN 20 WHEN 1 THEN 10 ELSE 5 END AS version,
         1 AS origin
  FROM orders WHERE o_orderkey % 7 < 3
), tagged AS (
  SELECT * FROM base UNION ALL SELECT * FROM upd
), r AS (
  SELECT o_orderkey, o_totalprice, version,
         row_number() OVER (PARTITION BY o_orderkey
                            ORDER BY version DESC, origin DESC) AS rn
  FROM tagged
)
SELECT o_orderkey, o_totalprice, version FROM r
WHERE rn = 1 ORDER BY o_orderkey
"""


def q_data_quality(sf_dir: str):
    """Data-quality expectation suite (stages/validate.validate_table)
    over orders — the promotion gate a pipeline runs before publishing
    a table: uniqueness, null, range and format rules in one pass
    (+ one keyed stitch per unique rule). ``price_cap`` is a rule with
    real violations, so the report is exercised on both outcomes."""
    import ray.data as rd

    from sigraph_ray.stages.validate import validate_table

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderpriority", "o_orderstatus"])
    return validate_table(ds, [
        {"name": "orderkey_unique", "kind": "unique", "col": "o_orderkey"},
        {"name": "custkey_not_null", "kind": "not_null",
         "col": "o_custkey"},
        {"name": "price_positive", "kind": "range",
         "col": "o_totalprice", "lo": 0.0, "hi": None},
        {"name": "price_cap", "kind": "range",
         "col": "o_totalprice", "lo": None, "hi": 400000.0},
        {"name": "priority_format", "kind": "regex",
         "col": "o_orderpriority", "pattern": r"[1-5]-[A-Z ]+"},
        {"name": "status_domain", "kind": "regex",
         "col": "o_orderstatus", "pattern": r"[OFP]"},
    ])


SQL_DATA_QUALITY = """
SELECT 'orderkey_unique' AS rule,
       count(*) - count(DISTINCT o_orderkey) AS violations,
       count(*) AS n_checked FROM orders
UNION ALL
SELECT 'custkey_not_null',
       count(*) FILTER (o_custkey IS NULL), count(*) FROM orders
UNION ALL
SELECT 'price_positive',
       count(*) FILTER (o_totalprice < 0),
       count(o_totalprice) FROM orders
UNION ALL
SELECT 'price_cap',
       count(*) FILTER (o_totalprice > 400000),
       count(o_totalprice) FROM orders
UNION ALL
SELECT 'priority_format',
       count(*) FILTER (NOT regexp_full_match(o_orderpriority,
                                              '[1-5]-[A-Z ]+')),
       count(o_orderpriority) FROM orders
UNION ALL
SELECT 'status_domain',
       count(*) FILTER (NOT regexp_full_match(o_orderstatus, '[OFP]')),
       count(o_orderstatus) FROM orders
ORDER BY rule
"""


def q_upsert_with_deletes(sf_dir: str):
    """CDC MERGE with tombstones (stages/upsert.compact_upserts,
    ``tombstone=``): the updates stream carries deletes — a newer
    tombstone removes the key, a STALE tombstone loses to the base
    version and the key survives, exercising both directions of the
    delete-vs-version race in one deterministic derivation."""
    import ray.data as rd

    from sigraph_ray.stages.upsert import compact_upserts

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def as_base(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["version"] = 10
        out["deleted"] = False
        return out

    def as_updates(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["o_orderkey"] % 5 < 2].copy()
        m = out["o_orderkey"] % 4
        # m 0: newer delete (key vanishes)   m 1: newer upsert
        # m 2: stale delete (base survives)  m 3: tied upsert (wins)
        out["o_totalprice"] = out["o_totalprice"] * 3
        out["version"] = m.map({0: 20, 1: 20, 2: 5, 3: 10})\
            .astype("int64")
        out["deleted"] = (m % 2 == 0)
        return out

    base = orders.map_batches(as_base, batch_format="pandas")
    upd = orders.map_batches(as_updates, batch_format="pandas")
    out = compact_upserts(base, upd, key="o_orderkey",
                          version="version", tombstone="deleted")
    return out.sort("o_orderkey")


SQL_UPSERT_WITH_DELETES = """
WITH base AS (
  SELECT o_orderkey, o_totalprice, 10 AS version, FALSE AS deleted,
         0 AS origin
  FROM orders
), upd AS (
  SELECT o_orderkey, o_totalprice * 3 AS o_totalprice,
         CASE CAST(o_orderkey % 4 AS INTEGER)
              WHEN 0 THEN 20 WHEN 1 THEN 20 WHEN 2 THEN 5
              ELSE 10 END AS version,
         (o_orderkey % 4) % 2 = 0 AS deleted,
         1 AS origin
  FROM orders WHERE o_orderkey % 5 < 2
), tagged AS (
  SELECT * FROM base UNION ALL SELECT * FROM upd
), r AS (
  SELECT o_orderkey, o_totalprice, version, deleted,
         row_number() OVER (PARTITION BY o_orderkey
                            ORDER BY version DESC, origin DESC) AS rn
  FROM tagged
)
SELECT o_orderkey, o_totalprice, version FROM r
WHERE rn = 1 AND NOT deleted ORDER BY o_orderkey
"""


def q_customers_without_orders(sf_dir: str):
    """ANTI JOIN (NOT IN): customers with no big order (> 400 k) —
    stages/joins.broadcast_semi_anti over the distinct probe-key set
    (stitch-distinct → one sorted array → zero-copy broadcast →
    per-batch searchsorted membership). The probe side is filtered at
    the read (predicate pushdown) before the distinct."""
    import ray.data as rd

    from sigraph_ray.stages.joins import broadcast_semi_anti

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"]).filter(
            expr="o_totalprice > 400000")
    return broadcast_semi_anti(cust, orders, left_key="c_custkey",
                               right_key="o_custkey", anti=True)


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey
"""


def q_order_revenue(sf_dir: str):
    """Large×large fact⨝fact equi-join on the SORT-MERGE tier
    (stages/joins.sorted_merge_join): per-order line revenue joined
    back to the order row. Neither side is broadcastable at 100 TB and
    Ray's hash join pays a per-join aggregator-pool spin-up, so this is
    the third join tier (broadcast < merge < hash). Aggregate-before-
    join: lineitem is reduced to one row per order on the stitch
    (exact integer revenue units, q_lineitem_agg convention) BEFORE the
    join, so the merge tier's one-key-fits-a-block bound holds at any
    scale (1 row per key per side)."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.joins import sorted_merge_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def units(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
        disc_bp = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            pa.scalar(100.0))), pa.int64())
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "units": pc.multiply(cents, disc_bp)})

    per_order = sorted_groupby_agg(
        line.map_batches(units, batch_format="pyarrow"),
        key="o_orderkey",
        aggs={"n_lines": ("units", "count"), "units": ("units", "sum")})

    joined = sorted_merge_join(
        orders, per_order, on="o_orderkey",
        left_cols=["o_orderpriority"], right_cols=["n_lines", "units"])

    def finish(df):
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "o_orderpriority": df["o_orderpriority"],
            "n_lines": df["n_lines"].astype("int64"),
            "revenue": df["units"].astype("float64") / 1e4})

    return joined.map_batches(finish, batch_format="pandas")


SQL_ORDER_REVENUE = """
WITH la AS (
  SELECT l_orderkey AS o_orderkey, count(*) AS n_lines,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS units
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderkey, o.o_orderpriority, la.n_lines,
       la.units / 10000.0 AS revenue
FROM orders o JOIN la USING (o_orderkey)
ORDER BY o.o_orderkey
"""


def q_quality_filtered(sf_dir: str):
    """Percentile-threshold corpus filter (operator COMPOSITION:
    text_stats → exact_quantiles → broadcast-scalar filter): keep
    documents whose token count is at or above the corpus median —
    the global-statistic-then-filter shape every quality-pruning
    pipeline needs, in two passes and one tiny driver scalar."""
    import ray.data as rd

    from sigraph_ray.stages import textstats as TS
    from sigraph_ray.stages.quantiles import exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    stats = TS.text_stats(ds).map_batches(
        lambda df: df[["doc_id", "n_tokens"]],
        batch_format="pandas").materialize()
    median = int(exact_quantiles(stats, "n_tokens", [0.5])["value"][0])
    return stats.filter(expr=f"n_tokens >= {median}")


SQL_QUALITY_FILTERED = r"""
WITH s AS (
  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
  FROM documents)
SELECT doc_id, n_tokens FROM s
WHERE n_tokens >= (SELECT quantile_disc(n_tokens, 0.5) FROM s)
ORDER BY doc_id
"""


def q_supplier_nation(sf_dir: str):
    """Two-level broadcast join through a snowflake dimension chain."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    dim = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")[["n_nationkey", "n_name", "r_name"]]
    # Arrow broadcast + task pool: ray.get of an Arrow table is a
    # zero-copy object-store view, so each task's lookup costs one tiny
    # to_pandas of the 25-row dimension — no actor pool (and its
    # per-process cold start) needed for a stateless lookup
    ref = ray.put(pa.Table.from_pandas(dim, preserve_index=False))

    def j(df: pd.DataFrame) -> pa.Table:
        out = df.merge(ray.get(ref).to_pandas(), left_on="s_nationkey",
                       right_on="n_nationkey")
        return pa.Table.from_pandas(out, preserve_index=False)

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    return (supp.map_batches(j, batch_format="pandas")
            .groupby(["r_name", "n_name"])
            .aggregate(Count(alias_name="n_suppliers"),
                       Sum("s_acctbal", alias_name="sum_acctbal")))


SQL_SUPPLIER_NATION = """
SELECT r_name, n_name, count(*) AS n_suppliers, sum(s_acctbal) AS sum_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name
"""


# --- text analysis / dedup / similarity ------------------------------------

def q_text_stats(sf_dir: str):
    import ray.data as rd

    from sigraph_ray.stages import textstats as TS

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return TS.text_stats(ds)


SQL_TEXT_STATS = r"""
SELECT doc_id,
       length(text) AS n_chars,
       len(regexp_extract_all(text, '\S+')) AS n_tokens,
       len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
       len(regexp_extract_all(text, '\b(?:the|and|of|a|to|in|is)\b')) AS n_stopwords,
       CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
         / greatest(len(regexp_extract_all(text, '\S+')), 1) AS mean_token_len
FROM documents ORDER BY doc_id
"""


def q_node_degrees(sf_dir: str):
    """Per-node in/out degree over the aggregated edge table — the
    degree-distribution scan every graph pipeline starts analytics
    with; two tagged partial streams + one grouped-sum stitch."""
    import ray.data as rd

    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages.collect import sorted_groupby_agg

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    edges = G.build_edges(ok)

    def partial(df):
        out_p = (df.groupby("src", sort=False).size()
                 .rename("o").reset_index()
                 .rename(columns={"src": "node"}))
        out_p["i"] = 0
        in_p = (df.groupby("dst", sort=False).size()
                .rename("i").reset_index()
                .rename(columns={"dst": "node"}))
        in_p["o"] = 0
        import pandas as pd
        return pd.concat([out_p, in_p], ignore_index=True)[
            ["node", "o", "i"]]

    parts = edges.map_batches(partial, batch_format="pandas")
    return sorted_groupby_agg(parts, key="node",
                              aggs={"out_degree": ("o", "sum"),
                                    "in_degree": ("i", "sum")})


SQL_NODE_DEGREES = f"""
WITH {_SQL_BASE},
edges_raw AS (
  SELECT CASE WHEN actor_type = 'READ_RECV' THEN artifact ELSE parent_key END AS src,
         CASE WHEN actor_type = 'READ_RECV' THEN parent_key ELSE artifact END AS dst,
         action_type AS type, ts, weight, ord
  FROM valid WHERE parent_key IS NOT NULL AND parent_span_id IS NOT NULL
),
edges AS (
  SELECT src, dst FROM edges_raw GROUP BY src, dst, type
),
tagged AS (
  SELECT src AS node, 1 AS o, 0 AS i FROM edges
  UNION ALL
  SELECT dst AS node, 0 AS o, 1 AS i FROM edges
)
SELECT node, CAST(sum(o) AS BIGINT) AS out_degree,
       CAST(sum(i) AS BIGINT) AS in_degree
FROM tagged GROUP BY node ORDER BY node
"""


def q_component_labels(sf_dir: str):
    """G4 connected components over the undirected edge set — the
    min-label output directly, giving the alias-merge operator a SQL
    oracle (recursive-CTE transitive closure) on top of its pytest
    equivalence suite."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages.canonicalize import connected_components

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    edges = G.build_edges(ok).map_batches(
        lambda t: pa.table({"u": t.column("src"), "v": t.column("dst")}),
        batch_format="pyarrow")
    out = connected_components(edges)
    return out.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "component": t.column("comp")}),
        batch_format="pyarrow")


SQL_COMPONENT_LABELS = f"""
WITH RECURSIVE {_SQL_BASE},
edges_raw AS (
  SELECT CASE WHEN actor_type = 'READ_RECV' THEN artifact ELSE parent_key END AS src,
         CASE WHEN actor_type = 'READ_RECV' THEN parent_key ELSE artifact END AS dst,
         action_type AS type
  FROM valid WHERE parent_key IS NOT NULL AND parent_span_id IS NOT NULL
),
und AS (
  SELECT src AS a, dst AS b FROM edges_raw
  UNION
  SELECT dst, src FROM edges_raw
),
reach(node, r) AS (
  SELECT a, a FROM und
  UNION
  SELECT und.b, reach.r FROM reach JOIN und ON und.a = reach.node
)
SELECT node, min(r) AS component FROM reach GROUP BY node ORDER BY node
"""


def q_triangle_cooccur(sf_dir: str):
    """Per-node triangle counts (stages/graphalgo.triangle_counts,
    degree-ordered wedge closure) over the NETWORK-artifact
    co-occurrence graph: two IPs are adjacent when some trace touched
    both (clique expansion per trace). Per-trace IP lists are bounded
    (≤256 distinct by construction; at 100 TB cap/flag oversized
    groups exactly like the LSH bucket cap), so the expansion is
    block-local."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_collect, sorted_distinct
    from sigraph_ray.stages.graphalgo import triangle_counts

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"]).filter(
            expr="event_type == 'purchase'")

    def to_pairs(t: pa.Table) -> pa.Table:
        eid = t.column("event_id")
        uid = t.column("user_id").cast(pa.string())
        ip = pc.binary_join_element_wise(
            "10.0.0.",
            pc.cast(pc.subtract(eid, pc.multiply(
                pc.divide(eid, 256), 256)), pa.string()), "")
        tid = pc.binary_join_element_wise("trace_", uid, "")
        return pa.table({"tid": tid, "ip": ip})

    pairs = sorted_distinct(
        ev.map_batches(to_pairs, batch_format="pyarrow"), ["tid", "ip"])
    per_trace = sorted_collect(pairs, key="tid", order_col="ip",
                               value="ip")

    def clique_edges(df):
        us, vs = [], []
        for vals in df["values"]:
            if len(vals) > 1:
                a = np.sort(np.asarray(vals, dtype=object))
                iu, iv = np.triu_indices(len(a), 1)
                us.append(a[iu])
                vs.append(a[iv])
        if not us:
            return pd.DataFrame({"u": pd.Series(dtype="object"),
                                 "v": pd.Series(dtype="object")})
        return pd.DataFrame({"u": np.concatenate(us),
                             "v": np.concatenate(vs)})

    edges = per_trace.map_batches(clique_edges, batch_format="pandas")
    return triangle_counts(edges)


SQL_TRIANGLE_COOCCUR = """
WITH p AS (
  SELECT DISTINCT 'trace_' || CAST(user_id AS VARCHAR) AS tid,
         '10.0.0.' || CAST(event_id % 256 AS VARCHAR) AS ip
  FROM events WHERE event_type = 'purchase'
), und AS (
  SELECT DISTINCT x.ip AS a, y.ip AS b
  FROM p x JOIN p y ON x.tid = y.tid AND x.ip < y.ip
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1 JOIN und e2 ON e2.a = e1.b
       JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
), pts AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
), nodes AS (
  SELECT a AS node FROM und UNION SELECT b FROM und
), cnt AS (
  SELECT node, count(*) AS n FROM pts GROUP BY node
)
SELECT nodes.node, coalesce(cnt.n, 0) AS n_triangles
FROM nodes LEFT JOIN cnt USING (node) ORDER BY node
"""


def q_kcore(sf_dir: str):
    """k-core of the provenance edge graph (stages/graphalgo.kcore,
    k=3): the density filter before expensive graph analytics.
    Rows-only — iterative peeling is a fixpoint, not SQL-expressible;
    the pytest gate matches exact sequential peeling on planted
    graphs (tests/test_graph_ops.py)."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages.graphalgo import kcore

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    edges = G.build_edges(ok).map_batches(
        lambda t: pa.table({"u": t.column("src"), "v": t.column("dst")}),
        batch_format="pyarrow")
    return kcore(edges, k=3)


def q_node_pagerank(sf_dir: str):
    """PageRank over the provenance edge table (stages/graphalgo
    .pagerank, broadcast tier): artifact importance in the constructed
    graph. Rows-only — iterative/fixed-point, not SQL-expressible; the
    pytest gate matches a dense power iteration iteration-exactly."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages.graphalgo import pagerank

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    edges = G.build_edges(ok)
    out = pagerank(edges, src="src", dst="dst", n_iter=10)
    return out.sort_values("node").reset_index(drop=True)


def q_training_shards(sf_dir: str):
    """End-to-end training-shard export (pipelines/training_export):
    docs → token ids → packed fixed-512 sequences → parquet under
    /tmp, read back. Rows-only: the sink is the deliverable; shape and
    token-stream equality are pytest-gated."""
    import hashlib
    import ray.data as rd

    from sigraph_ray.pipelines.training_export import \
        export_training_shards

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ("/tmp/sigraph_ray_shards_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:8])
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    export_training_shards(ds, out, max_tokens=512)
    t = rd.read_parquet(out).to_pandas()
    t["n_ids"] = t["input_ids"].map(len).astype("int64")
    return (t[["seq_id", "n_real", "n_ids"]]
            .sort_values("seq_id").reset_index(drop=True))


def q_pack_sequences(sf_dir: str):
    """GPT-style sequence packing (stages/packing.pack_sequences):
    doc→fixed-512-token-sequence span mapping over the doc_id-ordered
    concatenation; prefix-sum stitch, text never moves."""
    import ray.data as rd

    from sigraph_ray.stages.packing import pack_sequences

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return pack_sequences(ds, max_tokens=512)


SQL_PACK_SEQUENCES = r"""
WITH t AS (
  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n
  FROM documents
), c AS (
  SELECT doc_id, n,
         sum(n) OVER (ORDER BY doc_id) - n AS start
  FROM t
), s AS (
  SELECT doc_id, n, start,
         unnest(generate_series(CAST(start // 512 AS BIGINT),
                                 CAST((start + n - 1) // 512 AS BIGINT)))
           AS seq_id
  FROM c WHERE n > 0
)
SELECT doc_id, seq_id,
       CAST(greatest(start, seq_id * 512) - start AS BIGINT) AS doc_offset,
       CAST(least(start + n, (seq_id + 1) * 512)
         - greatest(start, seq_id * 512) AS BIGINT) AS n_tokens
FROM s ORDER BY doc_id, seq_id
"""


def q_mixture_sample(sf_dir: str):
    """Source-mixture resampling (stages/sample.mixture_sample):
    per-source keep rates as a pure function of doc_id (16-bit md5
    prefix), deterministic at every parallelism level."""
    import ray.data as rd

    from sigraph_ray.stages.sample import mixture_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return mixture_sample(ds, key="doc_id", stratum="source",
                          rates={"src0": 1.0, "src1": 0.5},
                          default_rate=0.25)


SQL_MIXTURE_SAMPLE = """
WITH h AS (
  SELECT doc_id, source,
         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS h16
  FROM documents
)
SELECT doc_id, source FROM h
WHERE h16 < CASE source WHEN 'src0' THEN 65536
                        WHEN 'src1' THEN 32768
                        ELSE 16384 END
ORDER BY doc_id
"""


def q_bpe_train(sf_dir: str):
    """BPE tokenizer training (stages/tokenizer.bpe_train): ONE
    corpus-wide word-count stitch, then the merge loop on the bounded
    word table — the subword vocabulary every training-export pipeline
    needs. Rows-only: the merge loop is an iterative fixpoint; the
    pytest gate matches an independent sequential BPE and pins
    layout-invariance (tests/test_textclean.py)."""
    import ray.data as rd

    from sigraph_ray.stages.tokenizer import bpe_train

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    return bpe_train(ds, n_merges=30)


def q_nb_classify(sf_dir: str):
    """Distributed multinomial Naive Bayes (stages/nbayes): FIT as one
    (class, term) grouped-sum stitch over the doc_id%5≠0 split,
    broadcast dense log-prob model, held-out docs classified per batch
    — the source/quality classifier shape of curation pipelines, with
    the training itself expressed as dataflow."""
    import ray.data as rd

    from sigraph_ray.stages.nbayes import nb_fit_predict

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    return nb_fit_predict(ds)


SQL_NB_CLASSIFY = r"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
), train AS (
  SELECT * FROM toks WHERE doc_id % 5 <> 0
), test AS (
  SELECT doc_id, term FROM toks WHERE doc_id % 5 = 0
), cc AS (
  SELECT source, term, count(*) AS c FROM train GROUP BY source, term
), tot AS (
  SELECT source, sum(c) AS t FROM cc GROUP BY source
), vocab AS (
  SELECT count(DISTINCT term) AS v FROM train
), prior AS (
  SELECT source,
         ln(count(DISTINCT doc_id) * 1.0 /
            (SELECT count(DISTINCT doc_id) FROM documents
             WHERE doc_id % 5 <> 0)) AS lp
  FROM documents WHERE doc_id % 5 <> 0 GROUP BY source
), scored AS (
  SELECT te.doc_id, tot.source,
         sum(ln((coalesce(cc.c, 0) + 1.0) / (tot.t + vocab.v)))
           + any_value(prior.lp) AS score
  FROM test te
  CROSS JOIN tot
  CROSS JOIN vocab
  JOIN prior ON prior.source = tot.source
  LEFT JOIN cc ON cc.source = tot.source AND cc.term = te.term
  GROUP BY te.doc_id, tot.source
), ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, source ASC) AS rn
  FROM scored
)
SELECT doc_id, source AS predicted FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


def q_unigram_logprob(sf_dir: str):
    """Perplexity-proxy importance score (stages/textstats
    .unigram_logprob): mean ln(corpus unigram frequency) per document;
    global term totals broadcast once."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import unigram_logprob

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return unigram_logprob(ds)


SQL_UNIGRAM_LOGPROB = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
  FROM documents
), tf AS (
  SELECT term, count(*) AS c FROM toks GROUP BY term
), tot AS (
  SELECT sum(c) AS n FROM tf
)
SELECT toks.doc_id,
       count(*) AS n_tokens,
       avg(ln(tf.c / tot.n)) AS mean_log_freq
FROM toks JOIN tf USING (term), tot
GROUP BY toks.doc_id ORDER BY toks.doc_id
"""


def q_host_stats(sf_dir: str):
    """URL canonicalization + per-host crawl stats (stages/weburl):
    deterministic messy URLs derived from doc_id (scheme/host case,
    www., default ports, utm params, fragments, trailing slashes —
    mirrored in the SQL CTE), canonicalized by the ordered regex
    chain, then per-host page / unique-resource / duplicate counts —
    the dedup-key report a crawl-ingest pipeline runs first. Two
    stitch aggregates: distinct canonical URLs, then per-host
    roll-up of the (already tiny) distinct stream."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.weburl import canonicalize_urls

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def make_url(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        S = lambda a: pd.Series(a, dtype="object")
        hostn = S((d % 40).astype(str))
        url = (S(np.where(d % 2 == 0, "HTTP", "https")) + "://"
               + S(np.where(d % 4 == 0, "WWW.Site", "site")) + hostn
               + S(np.where(d % 4 == 0, ".Example.COM", ".example.com"))
               + S(np.where(d % 5 == 0, ":443", ""))
               + "/p/" + S((d % 200).astype(str))
               + S(np.where(d % 11 == 0, "/", ""))
               + S(np.where(d % 3 == 0,
                            "?utm_source=feed&utm_medium=rss", ""))
               + S(np.where(d % 7 == 0, "#sec2", "")))
        return pd.DataFrame({"doc_id": d, "url": url})

    pages = canonicalize_urls(
        ds.map_batches(make_url, batch_format="pandas"))

    def per_canon(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["host", "canon_url"], sort=False).size()
                .rename("n").reset_index())

    canon = sorted_groupby_agg(
        pages.map_batches(per_canon, batch_format="pandas"),
        key=["host", "canon_url"], aggs={"n": ("n", "sum")})
    hosts = sorted_groupby_agg(
        canon, key="host",
        aggs={"n_pages": ("n", "sum"), "n_unique": ("n", "count")})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "host": df["host"],
            "n_pages": df["n_pages"].astype("int64"),
            "n_unique": df["n_unique"].astype("int64"),
            "n_dup": (df["n_pages"] - df["n_unique"]).astype("int64")})

    return hosts.map_batches(finish, batch_format="pandas")


SQL_HOST_STATS = r"""
WITH u AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END || '://' ||
    CASE WHEN doc_id % 4 = 0
         THEN 'WWW.Site' || CAST(doc_id % 40 AS VARCHAR) || '.Example.COM'
         ELSE 'site' || CAST(doc_id % 40 AS VARCHAR) || '.example.com'
    END ||
    CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
    '/p/' || CAST(doc_id % 200 AS VARCHAR) ||
    CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END ||
    CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_medium=rss'
         ELSE '' END ||
    CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END AS url
  FROM documents
), c1 AS (
  SELECT regexp_replace(regexp_replace(url, '#.*$', ''),
                        '\?utm_[^#]*$', '') AS x FROM u
), c2 AS (
  SELECT lower(regexp_extract(x, '^[^/]+//[^/]+'))
         || regexp_replace(x, '^[^/]+//[^/]+', '') AS x FROM c1
), canon AS (
  SELECT regexp_replace(regexp_replace(regexp_replace(
           x, '^(https?://)www\.', '\1'),
           ':(80|443)(/|$)', '\2'),
           '/$', '') AS canon_url FROM c2
), named AS (
  SELECT canon_url,
         regexp_extract(canon_url, '^https?://([^/:]+)', 1) AS host
  FROM canon
), per_canon AS (
  SELECT host, canon_url, count(*) AS n FROM named
  GROUP BY host, canon_url
)
SELECT host, CAST(sum(n) AS BIGINT) AS n_pages, count(*) AS n_unique,
       CAST(sum(n) - count(*) AS BIGINT) AS n_dup
FROM per_canon GROUP BY host ORDER BY host
"""


def q_dup_passages(sf_dir: str):
    """Exact duplicate-passage detection (stages/dedup.dup_passages):
    per-doc counts of 6-token windows shared with ≥1 other document —
    the substring-level dedup signal doc-level dedup misses."""
    import ray.data as rd

    from sigraph_ray.stages.dedup import dup_passages

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return dup_passages(ds, n=6)


SQL_DUP_PASSAGES = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS arr FROM documents
), toks AS (
  SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS ord
  FROM t
), grams AS (
  SELECT doc_id,
         term || ' ' || lead(term, 1) OVER w || ' '
              || lead(term, 2) OVER w || ' '
              || lead(term, 3) OVER w || ' '
              || lead(term, 4) OVER w || ' '
              || lead(term, 5) OVER w AS gram
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), dg AS (
  SELECT DISTINCT doc_id, gram FROM grams WHERE gram IS NOT NULL
), dup AS (
  SELECT gram FROM dg GROUP BY gram HAVING count(*) >= 2
)
SELECT dg.doc_id, count(*) AS n_windows,
       CAST(coalesce(sum(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END), 0)
         AS BIGINT) AS n_dup_windows,
       coalesce(sum(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END), 0)
         * 1.0 / count(*) AS dup_fraction
FROM dg LEFT JOIN dup d USING (gram)
GROUP BY dg.doc_id ORDER BY dg.doc_id
"""


def q_remove_dup_passages(sf_dir: str):
    """Duplicate-passage REMOVAL (stages/dedup.remove_dup_passages):
    Lee et al. 2022's rewrite — delete every non-keeper occurrence of
    a cross-document 6-token window; keeper = min doc_id. Returns the
    rewritten corpus (doc_id, n_tokens, n_removed, clean_text)."""
    import ray.data as rd

    from sigraph_ray.stages.dedup import remove_dup_passages

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return remove_dup_passages(ds, n=6)


SQL_REMOVE_DUP_PASSAGES = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS arr FROM documents
), toks AS (
  SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS ord
  FROM t
), grams AS (
  SELECT doc_id, ord AS start,
         term || ' ' || lead(term, 1) OVER w || ' '
              || lead(term, 2) OVER w || ' '
              || lead(term, 3) OVER w || ' '
              || lead(term, 4) OVER w || ' '
              || lead(term, 5) OVER w AS gram
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), occ AS (
  SELECT doc_id, start, gram FROM grams WHERE gram IS NOT NULL
), dup AS (
  SELECT gram, min(doc_id) AS keeper
  FROM (SELECT DISTINCT doc_id, gram FROM occ)
  GROUP BY gram HAVING count(*) >= 2
), removed AS (
  SELECT DISTINCT o.doc_id, u.pos
  FROM occ o JOIN dup d USING (gram)
       CROSS JOIN unnest(range(o.start, o.start + 6)) AS u(pos)
  WHERE o.doc_id <> d.keeper
)
SELECT tk.doc_id,
       count(*) AS n_tokens,
       CAST(coalesce(sum(CASE WHEN r.pos IS NOT NULL THEN 1 ELSE 0 END), 0)
         AS BIGINT) AS n_removed,
       coalesce(string_agg(CASE WHEN r.pos IS NULL THEN tk.term END,
                           ' ' ORDER BY tk.ord), '') AS clean_text
FROM toks tk LEFT JOIN removed r
  ON r.doc_id = tk.doc_id AND r.pos = tk.ord
GROUP BY tk.doc_id ORDER BY tk.doc_id
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (stages/decontam.decontaminate):
    corpus docs sharing any 4-token shingle with the doc_id%20==0 eval
    split — eval shingle set broadcast once, corpus probed shuffle-free."""
    import ray.data as rd

    from sigraph_ray.stages.decontam import decontaminate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return decontaminate(ds, n=4, eval_mod=20)


SQL_DECONTAMINATE = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS arr FROM documents
), toks AS (
  SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS ord
  FROM t
), grams AS (
  SELECT doc_id,
         term || ' ' || lead(term, 1) OVER w || ' '
              || lead(term, 2) OVER w || ' '
              || lead(term, 3) OVER w AS gram
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), eval_g AS (
  SELECT DISTINCT gram FROM grams
  WHERE doc_id % 20 = 0 AND gram IS NOT NULL
), corpus AS (
  SELECT doc_id, count(gram) AS n_grams FROM grams
  WHERE doc_id % 20 <> 0 GROUP BY doc_id
), hits AS (
  SELECT doc_id, count(*) AS n_contaminated FROM grams
  WHERE doc_id % 20 <> 0 AND gram IN (SELECT gram FROM eval_g)
  GROUP BY doc_id
)
SELECT c.doc_id, c.n_grams,
       coalesce(h.n_contaminated, 0) AS n_contaminated,
       coalesce(h.n_contaminated, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN hits h USING (doc_id) ORDER BY c.doc_id
"""


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition signals (stages/textstats
    .repetition_stats): top-token fraction + duplicate-2-gram fraction
    per document (doc-local, shuffle-free)."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import repetition_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return repetition_stats(ds)


SQL_REPETITION_STATS = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS arr FROM documents
), toks AS (
  SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS ord
  FROM t
), grams AS (
  SELECT doc_id,
         term || ' ' || lead(term) OVER (PARTITION BY doc_id ORDER BY ord)
           AS gram
  FROM toks
), top AS (
  SELECT doc_id, max(c) AS top_cnt FROM (
    SELECT doc_id, term, count(*) AS c FROM toks GROUP BY doc_id, term
  ) GROUP BY doc_id
), g2 AS (
  SELECT doc_id, count(DISTINCT gram) AS distinct2
  FROM grams WHERE gram IS NOT NULL GROUP BY doc_id
)
SELECT t.doc_id,
       len(t.arr) AS n_tokens,
       CAST(coalesce(top.top_cnt, 0) AS DOUBLE)
         / greatest(len(t.arr), 1) AS top_token_frac,
       CASE WHEN len(t.arr) > 1
            THEN 1.0 - CAST(coalesce(g2.distinct2, 0) AS DOUBLE)
                         / (len(t.arr) - 1)
            ELSE 0.0 END AS dup_2gram_frac
FROM t LEFT JOIN top USING (doc_id) LEFT JOIN g2 USING (doc_id)
ORDER BY doc_id
"""


def q_bpe_token_count(sf_dir: str):
    """BPE-ish token budget estimate (stages/textstats
    .bpe_token_stats): GPT-2-style pre-tokenizer regex, RE2 shared
    verbatim with the oracle (the SQL below is built FROM the same
    BPE_RE constant)."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import bpe_token_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bpe_token_stats(ds)


def _bpe_sql() -> str:
    from sigraph_ray.stages.textstats import BPE_RE

    rx = BPE_RE.replace("'", "''")
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{rx}')) AS n_bpe_tokens,
       CAST(length(text) AS DOUBLE)
         / greatest(len(regexp_extract_all(text, '{rx}')), 1)
         AS chars_per_token
FROM documents ORDER BY doc_id
"""


SQL_BPE_TOKEN_COUNT = _bpe_sql()


def q_curated_per_source(sf_dir: str):
    """Quality curation: top-5 highest-quality documents per source —
    the quality-score scan composed with the grouped top-k stitch
    (the per-domain selection step of a curated-corpus build)."""
    import ray.data as rd

    from sigraph_ray.stages import textstats as TS
    from sigraph_ray.stages.collect import sorted_grouped_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    scores = TS.quality_scores(docs)

    # doc-aligned zip: quality_scores preserves row order within
    # batches, but joins are cheap at doc-id grain — recompute source
    # via a broadcast-free two-column scan instead
    def attach(batch: pa.Table) -> pa.Table:
        st = TS.quality_score_batch(batch)
        return st.append_column("source", batch.column("source"))

    scored = docs.map_batches(attach, batch_format="pyarrow")
    return sorted_grouped_topk(
        scored.select_columns(["source", "doc_id", "quality_score"]),
        key="source", order_by=["quality_score", "doc_id"],
        descending=[True, False], k=5)


SQL_CURATED_PER_SOURCE = r"""
WITH s AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '\S+')) AS n_tokens,
         len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         len(regexp_extract_all(text, '\b(?:the|and|of|a|to|in|is)\b')) AS n_stop
  FROM documents
), q AS (
  SELECT doc_id, source,
         (CAST(n_tokens BETWEEN 10 AND 100000 AS DOUBLE)
          + CAST(n_punct > 0 AS DOUBLE)
          + CAST(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) >= 0.01
                 AS DOUBLE)) / 3.0 AS quality_score
  FROM s
)
SELECT source, doc_id, quality_score, rank FROM (
  SELECT source, doc_id, quality_score,
         row_number() OVER (PARTITION BY source
                            ORDER BY quality_score DESC, doc_id) AS rank
  FROM q)
WHERE rank <= 5 ORDER BY source, rank
"""


def q_snapshot_delta(sf_dir: str):
    """Incremental-ingest delta: documents NOT already present in the
    prior snapshot (stand-in: doc_id % 3 == 0) by exact content md5 —
    the cross-snapshot anti-join every recurring crawl run starts
    with, on the Bloom-prefiltered tier so unchanged (negative) docs
    never shuffle."""
    import ray.data as rd

    from sigraph_ray.functions.hashing import md5_hex
    from sigraph_ray.stages.bloom import bloom_semi_anti

    def with_md5(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["content_md5"] = md5_hex(df["text"].tolist())
        out["is_prior"] = (df["doc_id"] % 3 == 0)
        return out[["doc_id", "content_md5", "is_prior"]]

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    hashed = docs.map_batches(with_md5, batch_format="pandas")
    prior = hashed.filter(expr="is_prior == True").select_columns(
        ["content_md5"])
    fresh = hashed.filter(expr="is_prior == False")
    out = bloom_semi_anti(fresh, prior, left_key="content_md5",
                          right_key="content_md5", anti=True)
    return out.select_columns(["doc_id", "content_md5"]).sort("doc_id")


SQL_SNAPSHOT_DELTA = """
SELECT doc_id, md5(text) AS content_md5 FROM documents
WHERE doc_id % 3 <> 0
  AND md5(text) NOT IN (SELECT md5(text) FROM documents
                        WHERE doc_id % 3 = 0)
ORDER BY doc_id
"""


def q_corpus_summary(sf_dir: str):
    """One-row corpus roll-up (docs, token totals, source cardinality,
    length extremes) — the pre-flight sanity scan a training-data run
    starts with. Per-batch combiner emits one partial row per block;
    the driver folds O(#blocks) partials (HLL-style bounded stitch,
    exact because the per-block partials are exact and re-combinable;
    distinct sources fold as a set union bounded by the source
    cardinality)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nt = df["text"].str.count(r"\S+")
        return pd.DataFrame({
            "n_docs": [len(df)],
            "total_tokens": [int(nt.sum())],
            "min_tokens": [int(nt.min()) if len(df) else None],
            "max_tokens": [int(nt.max()) if len(df) else None],
            "sources": [sorted(df["source"].unique())],
        })

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    srcs = sorted({s for row in parts["sources"] for s in row})
    return pd.DataFrame({
        "n_docs": pd.Series([int(parts["n_docs"].sum())], dtype="int64"),
        "total_tokens": pd.Series([int(parts["total_tokens"].sum())],
                                  dtype="int64"),
        "min_tokens": pd.Series([int(parts["min_tokens"].min())],
                                dtype="int64"),
        "max_tokens": pd.Series([int(parts["max_tokens"].max())],
                                dtype="int64"),
        "n_sources": pd.Series([len(srcs)], dtype="int64"),
    })


SQL_CORPUS_SUMMARY = r"""
SELECT count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
         AS total_tokens,
       min(len(regexp_extract_all(text, '\S+'))) AS min_tokens,
       max(len(regexp_extract_all(text, '\S+'))) AS max_tokens,
       count(DISTINCT source) AS n_sources
FROM documents
"""


def q_pii_scrub(sf_dir: str):
    """PII redaction scan (stages/textclean.pii_scrub): emails /
    SSN-like ids / phones / IPv4 redacted in a fixed order with
    per-document counts; RE2 kernels shared with the DuckDB oracle."""
    import ray.data as rd

    from sigraph_ray.stages.textclean import pii_scrub

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return pii_scrub(ds)


# CTE chain mirrors stages/textclean.PII_RULES order exactly: each
# pattern's count is taken on the text BEFORE its own replacement.
SQL_PII_SCRUB = r"""
WITH c1 AS (
  SELECT doc_id,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails
  FROM documents
), c2 AS (
  SELECT doc_id,
         regexp_replace(t, '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g') AS t,
         n_emails,
         len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ids
  FROM c1
), c3 AS (
  SELECT doc_id,
         regexp_replace(t, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS t,
         n_emails, n_ids,
         len(regexp_extract_all(t, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS n_phones
  FROM c2
)
SELECT doc_id,
       regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS text,
       n_emails, n_ids, n_phones,
       len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips
FROM c3 ORDER BY doc_id
"""


def q_quality_scores(sf_dir: str):
    import ray.data as rd

    from sigraph_ray.stages import textstats as TS

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return TS.quality_scores(ds)


SQL_QUALITY_SCORES = r"""
WITH s AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+')) AS n_tokens,
         len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         len(regexp_extract_all(text, '\b(?:the|and|of|a|to|in|is)\b')) AS n_stop
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) AS stop_ratio,
       (CAST(n_tokens BETWEEN 10 AND 100000 AS DOUBLE)
        + CAST(n_punct > 0 AS DOUBLE)
        + CAST(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) >= 0.01 AS DOUBLE)
       ) / 3.0 AS quality_score
FROM s ORDER BY doc_id
"""


def q_fingerprints(sf_dir: str):
    import ray.data as rd

    from sigraph_ray.stages import textstats as TS

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return TS.fingerprints(ds)


SQL_FINGERPRINTS = r"""
SELECT doc_id,
       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id
"""


def q_term_topk(sf_dir: str):
    """Global vocabulary heavy hitters (exact top-50 terms):
    stages/textstats.term_topk — per-batch count partials + stitch sum
    + two-phase deterministic top-k."""
    import ray.data as rd

    from sigraph_ray.stages import textstats as TS

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return TS.term_topk(ds, k=50)


SQL_TERM_TOPK = """
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents)
SELECT term, count(*) AS freq FROM tok
GROUP BY term ORDER BY freq DESC, term LIMIT 50
"""


def q_bigram_topk(sf_dir: str):
    """Global top-50 token bigrams (stages/textstats.ngram_topk): the
    n-gram count table an LM / tokenizer-training pipeline starts
    from; per-batch gram-count partials + one stitch sum + two-phase
    top-k."""
    import ray.data as rd

    from sigraph_ray.stages import textstats as TS

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    return TS.ngram_topk(ds, n=2, k=50)


SQL_BIGRAM_TOPK = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
  FROM documents
), toks AS (
  SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS ord
  FROM t
), bg AS (
  SELECT term || ' ' || lead(term, 1)
           OVER (PARTITION BY doc_id ORDER BY ord) AS gram
  FROM toks
)
SELECT gram, count(*) AS freq FROM bg WHERE gram IS NOT NULL
GROUP BY gram ORDER BY freq DESC, gram LIMIT 50
"""


def q_percent_rank(sf_dir: str):
    """Exact global percentile-rank transform
    (stages/quantiles.percent_rank_transform) over event values — the
    rank-normalization features pipelines apply before training; one
    distinct-value stitch + broadcast searchsorted probe."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import percent_rank_transform

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])
    return percent_rank_transform(ds, value_col="value",
                                  keep_cols=["event_id", "value"])


SQL_PERCENT_RANK = """
SELECT event_id, value,
       percent_rank() OVER (ORDER BY value) AS pct_rank
FROM events ORDER BY event_id
"""


def q_inverted_index(sf_dir: str):
    """Inverted-index construction — the batch analog of the
    reference's OpenSearch document index (db_model.py dynamic keyword
    mappings): BIGRAM phrase → sorted posting list of doc_ids, for
    phrases with 2 ≤ df ≤ 100 (unigram terms in this corpus are
    near-ubiquitous; bigrams give a discriminative index, the standard
    phrase-index trick). One ``sorted_collect`` with ``dedup`` folds
    the distinct-(phrase, doc) pass into the collect;
    ``max_members=101`` is the degenerate-key guard (a stop-phrase's
    posting row can never exceed the cap — oversized phrases surface
    as 101-member sentinels and are dropped by the same df ≤ 100
    filter the oracle applies). Postings serialize as a comma-joined
    string."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_collect

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"[a-z0-9]+")
        s = toks.explode().dropna()
        gram = (s + " " + s.groupby(level=0).shift(-1)).dropna()
        doc = df["doc_id"].reindex(gram.index)
        return (pd.DataFrame({"term": gram.to_numpy(),
                              "doc_id": doc.to_numpy()})
                .drop_duplicates())

    collected = sorted_collect(
        ds.map_batches(pairs, batch_format="pandas"),
        key="term", order_col="doc_id", value="doc_id",
        dedup=True, max_members=101)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "df": pd.Series(dtype="int64"),
                                 "postings": pd.Series(dtype="object")})
        n = df["values"].str.len()
        keep = (n >= 2) & (n <= 100)
        kept = df[keep]
        return pd.DataFrame({
            "term": kept["term"].to_numpy(),
            "df": n[keep].astype("int64").to_numpy(),
            "postings": [",".join(str(x) for x in v)
                         for v in kept["values"]]})

    return collected.map_batches(finish, batch_format="pandas")


SQL_INVERTED_INDEX = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
  FROM documents
), toks AS (
  SELECT doc_id, unnest(arr) AS tok, unnest(range(len(arr))) AS ord
  FROM t
), bg AS (
  SELECT DISTINCT doc_id,
         tok || ' ' || lead(tok, 1)
           OVER (PARTITION BY doc_id ORDER BY ord) AS term
  FROM toks
)
SELECT term, count(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         AS postings
FROM bg WHERE term IS NOT NULL
GROUP BY term HAVING count(*) BETWEEN 2 AND 100
ORDER BY term
"""


def q_tfidf_keywords(sf_dir: str):
    """Per-document top-3 TF-IDF keywords
    (stages/textstats.tfidf_topk): stitch-summed document frequencies
    (vocab-sized, the only wide op), broadcast idf table, actor-pool
    scoring. Scores rounded to 6 dp before ranking on BOTH sides so
    float rank ties resolve identically."""
    import ray.data as rd

    from sigraph_ray.stages import textstats as TS

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return TS.tfidf_topk(ds, k=3, concurrency=_conc())


SQL_TFIDF_KEYWORDS = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((SELECT n FROM n) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term)),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rank
  FROM scored)
SELECT doc_id, term, tfidf, rank FROM ranked
WHERE rank <= 3 ORDER BY doc_id, rank
"""


def q_approx_term_topk(sf_dir: str):
    """Count-Min-sketch heavy hitters over the document vocabulary —
    the approximate, shuffle-free tier under `term_topk` (rows-only:
    estimates overcount by design; the pytest gate compares against
    the exact operator on Zipf data)."""
    import ray.data as rd

    from sigraph_ray.stages.sketch import approx_heavy_hitters

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return approx_heavy_hitters(ds, "text", k=20, tokenize=True)


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sample-without-replacement
    (stages/sample.weighted_sample_k, Efraimidis–Spirakis keys from
    md5 uniforms): 50 docs weighted by length."""
    import ray.data as rd

    from sigraph_ray.stages.sample import weighted_sample_k

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    return weighted_sample_k(ds, key="doc_id", weight="n_chars", k=50)


SQL_WEIGHTED_SAMPLE = """
WITH h AS (
  SELECT doc_id, n_chars,
         ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
          + 0.5) / 65536.0 AS u
  FROM documents
)
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         pow(u, 1.0 / greatest(n_chars, 1e-12)) AS es
  FROM h ORDER BY es DESC, doc_id LIMIT 50
) ORDER BY doc_id
"""


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified holdout sample
    (stages/sample.stratified_hash_sample): md5-nibble buckets, en kept
    at 2/16 and minority languages oversampled at 4/16 — a pure
    function of doc_id, identical at every parallelism level."""
    import ray.data as rd

    from sigraph_ray.stages.sample import stratified_hash_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    return stratified_hash_sample(ds, key="doc_id", stratum="lang",
                                  buckets={"en": 2}, default_buckets=4)


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM documents
WHERE strpos('0123456789abcdef',
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
      < CASE WHEN lang = 'en' THEN 2 ELSE 4 END
ORDER BY doc_id
"""


def q_exact_dedup(sf_dir: str):
    import ray.data as rd

    from sigraph_ray.stages import dedup as D

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return D.exact_dedup(ds)


SQL_EXACT_DEDUP = """
SELECT md5(text) AS content_md5, min(doc_id) AS kept_id
FROM documents GROUP BY md5(text) ORDER BY content_md5
"""


def _lang_id_sql() -> str:
    """SQL twin of stages/textstats.LangId, generated FROM the same
    _PROFILES lists so the stopword sets can never drift. Precedence
    chain (ko-script > zh-script > no-tokens > profile argmax with
    first-max-wins tie-break) mirrors the numpy control flow exactly;
    scores are the same round-to-6 the driver compare uses."""
    from sigraph_ray.stages.textstats import _PROFILES

    rows = ",\n        ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(_PROFILES) if _PROFILES[lang]
        for w in sorted(_PROFILES[lang]))
    return f"""
WITH stats AS (
  SELECT doc_id,
         greatest(length(lower(text)), 1) AS nchars,
         len(regexp_extract_all(lower(text), '[가-힯]')) AS hangul,
         len(regexp_extract_all(lower(text), '[一-鿿]')) AS cjk,
         regexp_extract_all(lower(text), '[a-zà-ÿ]+') AS toks
  FROM documents
), tk AS (
  SELECT doc_id, unnest(toks) AS w FROM stats
), prof(lang, w) AS (
  VALUES {rows}
), hits AS (
  SELECT tk.doc_id, prof.lang, count(*) AS hit
  FROM tk JOIN prof ON tk.w = prof.w GROUP BY tk.doc_id, prof.lang
), scores AS (
  SELECT s.doc_id, l.lang,
         CAST(coalesce(h.hit, 0) AS DOUBLE)
           / greatest(len(s.toks), 1) AS sc
  FROM stats s
  CROSS JOIN (SELECT DISTINCT lang FROM prof) l
  LEFT JOIN hits h ON h.doc_id = s.doc_id AND h.lang = l.lang
), best AS (
  SELECT doc_id, lang, sc,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY sc DESC, lang ASC) AS rn
  FROM scores
)
SELECT s.doc_id,
       CASE WHEN s.hangul * 2 > s.nchars * 0.1 THEN 'ko'
            WHEN s.cjk * 2 > s.nchars * 0.1 THEN 'zh'
            WHEN len(s.toks) = 0 THEN ''
            WHEN b.sc > 0.02 THEN b.lang ELSE '' END AS pred_lang,
       CASE WHEN s.hangul * 2 > s.nchars * 0.1 THEN 1.0
            WHEN s.cjk * 2 > s.nchars * 0.1 THEN 1.0
            WHEN len(s.toks) = 0 THEN 0.0
            ELSE round(b.sc, 6) END AS lang_score
FROM stats s JOIN best b ON b.doc_id = s.doc_id AND b.rn = 1
ORDER BY s.doc_id
"""


SQL_LANG_ID = _lang_id_sql()


def q_lang_id(sf_dir: str):
    """Heuristic language ID — no SQL oracle (rows-only check)."""
    import ray.data as rd

    from sigraph_ray.stages import textstats as TS

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return TS.lang_id(ds)


def q_minhash_dedup(sf_dir: str):
    """MinHash-LSH near-dup clusters — no SQL oracle (rows-only)."""
    import ray.data as rd

    from sigraph_ray.stages import dedup as D

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return D.minhash_lsh_dedup(ds, concurrency=_conc())


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup candidate pairs. The token hash is md5-based
    (functions/hashing.md5_token_hashes) precisely so the whole
    pipeline — tokenize → simhash bits → 16-bit segment banding →
    min-doc anchor per bucket → hamming verify — has an exact DuckDB
    oracle (SQL_SIMHASH_PAIRS)."""
    import ray.data as rd

    from sigraph_ray.stages import dedup as D

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return D.simhash_candidates(ds)


# Mirrors simhash_candidates exactly: whitespace tokenization with
# empty tokens dropped (Python str.split()), token hash = first 8 md5
# bytes, simhash bit b set iff sum of (2*bit_b - 1) over token hashes
# is positive, 4×16-bit segment buckets, anchor = min doc_id per
# bucket, pairs (anchor, member) kept at hamming ≤ 3 (the
# simhash_candidates default), deduplicated by Min(hamming).
SQL_SIMHASH_PAIRS = """
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents,
       unnest(regexp_split_to_array(text, '\\s+')) AS t(tok)
  WHERE t.tok <> ''
),
th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
  FROM toks
),
bits AS (
  SELECT doc_id, r.b,
         SUM(CASE WHEN (h >> r.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN range(64) AS r(b)
  GROUP BY doc_id, r.b
),
sig0 AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN (1::UBIGINT << b)
                       ELSE 0::UBIGINT END) AS UBIGINT) AS sh
  FROM bits GROUP BY doc_id
),
sig AS (
  SELECT d.doc_id, COALESCE(s.sh, 0::UBIGINT) AS sh
  FROM documents d LEFT JOIN sig0 s USING (doc_id)
),
seg AS (
  SELECT doc_id, sh, g.s, ((sh >> (16 * g.s)) & 65535::UBIGINT) AS sv
  FROM sig CROSS JOIN range(4) AS g(s)
),
anch AS (
  SELECT s, sv, min(doc_id) AS u FROM seg GROUP BY s, sv
),
anchh AS (
  SELECT a.s, a.sv, a.u, x.sh AS ush
  FROM anch a JOIN sig x ON x.doc_id = a.u
),
cand AS (
  SELECT a.u, m.doc_id AS v, bit_count(xor(a.ush, m.sh)) AS hd
  FROM anchh a JOIN seg m ON m.s = a.s AND m.sv = a.sv
  WHERE m.doc_id <> a.u
)
SELECT u, v, CAST(min(hd) AS BIGINT) AS hamming
FROM cand WHERE hd <= 3 GROUP BY u, v ORDER BY u, v
"""


def q_ngram_jaccard(sf_dir: str):
    """EXACT word-3-gram Jaccard near-dup pairs (PPJoin-style prefix
    filtering; stages/dedup.ngram_jaccard_pairs) — the deterministic
    sibling of minhash_dedup, hash-exact vs the DuckDB all-pairs
    oracle (the Ray side never enumerates all pairs)."""
    import ray.data as rd

    from sigraph_ray.stages import dedup as D

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return D.ngram_jaccard_pairs(ds, n=3, threshold=0.7,
                                 concurrency=_conc())


SQL_NGRAM_JACCARD = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                 for i in range(1, len(t) - 1)]) AS g
  FROM toks WHERE len(t) >= 3
)
SELECT a.doc_id AS u, b.doc_id AS v
FROM grams a JOIN grams b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.g, b.g))::DOUBLE
      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.7
ORDER BY u, v
"""


def q_embed_cosine_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (exact blockwise matmul against
    the broadcast normalized matrix; stages/similarity
    .embed_cosine_pairs). Threshold 0.4 sits >1e-4 from every pair in
    the synthetic corpus, far above float32-dot discrepancy, so the
    pair SET is hash-exact vs the DuckDB cross-join oracle."""
    import ray.data as rd

    from sigraph_ray.stages.similarity import embed_cosine_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return embed_cosine_pairs(ds, threshold=0.4, concurrency=_conc())


SQL_EMBED_COSINE_PAIRS = """
SELECT a.vec_id AS u, b.vec_id AS v
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding, b.embedding)
      / (sqrt(list_dot_product(a.embedding, a.embedding))
         * sqrt(list_dot_product(b.embedding, b.embedding))) >= 0.4
ORDER BY u, v
"""


def q_embed_dup_clusters(sf_dir: str):
    """Embedding-cosine near-dup CLUSTERS — operator composition: the
    exact cosine pair tier (stages/similarity.embed_cosine_pairs)
    feeding G4 connected components (stages/canonicalize), labels =
    numeric min member — the transitive closure step an embedding-dedup
    pipeline keeps after pair generation (keep one doc per cluster)."""
    import ray.data as rd

    from sigraph_ray.stages.canonicalize import connected_components
    from sigraph_ray.stages.similarity import embed_cosine_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    pairs = embed_cosine_pairs(ds, threshold=0.4, concurrency=_conc())
    out = connected_components(pairs, node_type=pa.int64())
    return out.map_batches(
        lambda t: pa.table({"vec_id": t.column("node").cast(pa.int64()),
                            "cluster": t.column("comp").cast(pa.int64())}),
        batch_format="pyarrow")


SQL_EMBED_DUP_CLUSTERS = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.embedding, b.embedding)
        / (sqrt(list_dot_product(a.embedding, a.embedding))
           * sqrt(list_dot_product(b.embedding, b.embedding))) >= 0.4
), und AS (
  SELECT u AS a, v AS b FROM pairs
  UNION
  SELECT v, u FROM pairs
), reach(node, r) AS (
  SELECT a, a FROM und
  UNION
  SELECT und.b, reach.r FROM reach JOIN und ON und.a = reach.node
)
SELECT node AS vec_id, min(r) AS cluster FROM reach
GROUP BY node ORDER BY vec_id
"""


def _knn_queries(sf_dir: str, n_queries: int = 8) -> pd.DataFrame:
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    q = emb[emb["vec_id"] < n_queries]
    return pd.DataFrame({"qid": q["vec_id"].to_numpy(),
                         "vec": [np.asarray(v) for v in q["embedding"]]})


def q_knn_cosine(sf_dir: str):
    """Brute-force cosine top-5 for 8 query vectors (self excluded)."""
    import ray.data as rd

    from sigraph_ray.stages import similarity as S

    corpus = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    corpus = corpus.filter(expr="vec_id >= 8")
    out = S.knn_cosine(corpus, _knn_queries(sf_dir), k=5)
    return out.map_batches(
        lambda df: df[["qid", "rank", "vec_id"]], batch_format="pandas")


SQL_KNN_COSINE = """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8),
scored AS (
  SELECT q.qid, c.vec_id,
         round(list_cosine_similarity(
             CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 9) AS cos
  FROM q CROSS JOIN c
),
ranked AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT qid, rank, vec_id FROM ranked WHERE rank <= 5 ORDER BY qid, rank
"""


def q_knn_cosine_lsh(sf_dir: str):
    """LSH-bucketed ANN — no SQL oracle (approximate by design)."""
    import ray.data as rd

    from sigraph_ray.stages import similarity as S

    corpus = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    corpus = corpus.filter(expr="vec_id >= 8")
    return S.knn_cosine_lsh(corpus, _knn_queries(sf_dir), k=5)


def q_kg_triples(sf_dir: str):
    """Flagship KG pipeline over deterministic synthetic pages (the
    `pages` shape from input_hint has no driver-side table; scale the
    corpus to the documents table size). Rows-only check — covered by
    the generator-oracle P/R gate in tests."""
    import pyarrow.parquet as pq

    from sigraph_ray.pipelines import kg as K

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    pages = K.synth_pages(n_docs * 2)
    return K.build_kg(pages, concurrency=_conc(0.5))["triples"]


def q_kg_entities(sf_dir: str):
    import pyarrow.parquet as pq

    from sigraph_ray.pipelines import kg as K

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    pages = K.synth_pages(n_docs * 2)
    return K.build_kg(pages, concurrency=_conc(0.5))["entities"]


def q_link_mentions(sf_dir: str):
    """A2 entity linking under the SQL hash gate: the REAL
    ``EntityLinkScorer`` (stages/entity_link — prefix-filtered trigram
    inverted index, exact overlap bound, vectorized CSR verification)
    scored against a DuckDB trigram-Jaccard oracle.

    Mentions are the distinct word bigrams of ``documents.text``; the
    vocabulary is self-derived exactly as the flagship derives its link
    pool (``derive_link_vocab`` semantics: document frequency from ONE
    ``sorted_count_distinct`` stitch, df ≥ 3, top-200 by (df DESC,
    surface ASC)). Output = every mention that links at threshold 0.6:
    ``(mention, link, score)``. Only at-/above-threshold rows are
    emitted because those are the scorer's exactness contract
    (entity_link.py docstring: sub-threshold ``link_score`` is a lower
    bound by design); a missed or spurious link, a wrong best
    candidate, or a broken smallest-surface tie-break all flip rows
    here. Reference analog: ai_agent.py:126-138 (mention scoring
    against the already-indexed entity pool)."""
    import re

    import ray
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_count_distinct
    from sigraph_ray.stages.entity_link import _score_batch

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def bigrams(t: pa.Table) -> pa.Table:
        # mirror the oracle exactly: split on \s+ and pair adjacent
        # ARRAY slots (not adjacent non-empty tokens) so any empty
        # split artifacts break the pair on both sides identically
        ids, ms = [], []
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            ws = re.split(r"\s+", txt or "")
            for a, b in zip(ws, ws[1:]):
                if a and b:
                    ids.append(did)
                    ms.append(f"{a} {b}")
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "mention": pa.array(ms, pa.string())})

    pairs = docs.map_batches(bigrams, batch_format="pyarrow")
    df_tbl = sorted_count_distinct(pairs, key="mention", dcol="doc_id",
                                   alias="df").materialize()
    top = (df_tbl.filter(expr="df >= 3")
           .sort(["df", "mention"], descending=[True, False])
           .limit(200).to_pandas())
    ref = ray.put(top["mention"].tolist())
    scored = df_tbl.map_batches(
        lambda t: pa.table({"mention": t.column("mention")}),
        batch_format="pyarrow").map_batches(
        _score_batch, batch_format="pyarrow",
        fn_kwargs={"vocab_ref": ref, "threshold": 0.6})
    return scored.filter(expr="score >= 0.6")


SQL_LINK_MENTIONS = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws FROM documents
),
pos AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM toks
),
bg AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] AS mention
  FROM pos WHERE ws[i] <> '' AND ws[i + 1] <> ''
),
dfreq AS (SELECT mention, count(DISTINCT doc_id) AS df FROM bg GROUP BY 1),
vocab AS (SELECT mention AS term FROM dfreq WHERE df >= 3
          ORDER BY df DESC, mention ASC LIMIT 200),
mtg AS (
  SELECT DISTINCT mention, substr('  ' || mention || ' ', i, 3) AS tg
  FROM (SELECT mention, unnest(generate_series(1, length(mention) + 1)) AS i
        FROM (SELECT DISTINCT mention FROM dfreq))
),
mlen AS (SELECT mention, count(*) AS m FROM mtg GROUP BY 1),
vtg AS (
  SELECT DISTINCT term, substr('  ' || term || ' ', i, 3) AS tg
  FROM (SELECT term, unnest(generate_series(1, length(term) + 1)) AS i
        FROM vocab)
),
vlen AS (SELECT term, count(*) AS v FROM vtg GROUP BY 1),
inter AS (
  SELECT mtg.mention, vtg.term, count(*) AS i
  FROM mtg JOIN vtg USING (tg) GROUP BY 1, 2
),
scored AS (
  SELECT inter.mention, inter.term,
         CAST(i AS DOUBLE) / (m + v - i) AS score
  FROM inter JOIN mlen USING (mention) JOIN vlen USING (term)
),
best AS (
  SELECT mention, term, score,
         row_number() OVER (PARTITION BY mention
                            ORDER BY score DESC, term ASC) AS rn
  FROM scored
)
SELECT mention, term AS link, score FROM best WHERE rn = 1 AND score >= 0.6
"""


# --- traversal / rule-match / pagination coverage --------------------------

def q_related_traces(sf_dir: str):
    """G2 k-hop related traces (schema.py:89-110) over the derived
    provenance graph, max_hop=3, unpruned; oracle is a DuckDB recursive
    CTE over the identical adjacency."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages import traversal as TV

    parsed = _parsed_events(sf_dir)
    g = G.build_graph_from_parsed(parsed, prune=False)
    return TV.related_traces(g, max_hop=3)


SQL_RELATED_TRACES = f"""
WITH RECURSIVE {_SQL_BASE},
edges_raw AS (
  SELECT CASE WHEN actor_type = 'READ_RECV' THEN artifact ELSE parent_key END AS src,
         CASE WHEN actor_type = 'READ_RECV' THEN parent_key ELSE artifact END AS dst
  FROM valid WHERE parent_key IS NOT NULL AND parent_span_id IS NOT NULL
),
cur AS (SELECT DISTINCT unit_id, trace_id, artifact FROM valid),
appearances AS (
  SELECT artifact, ord, unit_id, trace_id, 0 AS kind FROM valid
  UNION ALL
  SELECT parent_key AS artifact, ord, unit_id, trace_id, 1 AS kind
  FROM valid WHERE parent_key IS NOT NULL
),
firsts AS (
  SELECT artifact, unit_id, trace_id, kind,
         row_number() OVER (PARTITION BY artifact ORDER BY ord) AS rn
  FROM appearances
),
contains_all AS (
  SELECT unit_id, trace_id, artifact FROM cur
  UNION
  SELECT unit_id, trace_id, artifact FROM firsts WHERE rn = 1 AND kind = 1
),
matches_all AS (
  SELECT DISTINCT 'rule_' || CAST(event_id % 12 AS VARCHAR) AS rule_id, artifact
  FROM valid WHERE event_id % 5 = 0
),
undirected AS (
  SELECT src AS u, dst AS v FROM edges_raw
  UNION SELECT dst, src FROM edges_raw
  UNION SELECT 'trace:' || unit_id || ':' || trace_id, artifact FROM contains_all
  UNION SELECT artifact, 'trace:' || unit_id || ':' || trace_id FROM contains_all
  UNION SELECT 'rule:' || rule_id, artifact FROM matches_all
  UNION SELECT artifact, 'rule:' || rule_id FROM matches_all
),
seeds AS (SELECT DISTINCT unit_id, trace_id FROM valid),
walk(unit_id, trace_id, node, d) AS (
  SELECT unit_id, trace_id, 'trace:' || unit_id || ':' || trace_id, 0 FROM seeds
  UNION
  SELECT w.unit_id, w.trace_id, a.v, w.d + 1
  FROM walk w JOIN undirected a ON w.node = a.u
  WHERE w.d < 3
),
reach AS (
  SELECT unit_id, trace_id, node, min(d) AS hops
  FROM walk GROUP BY unit_id, trace_id, node
)
SELECT unit_id, trace_id AS trace_a,
       substr(node, length('trace:' || unit_id || ':') + 1) AS trace_b,
       hops
FROM reach
WHERE hops > 0
  AND node LIKE 'trace:' || unit_id || ':%'
  AND trace_id < substr(node, length('trace:' || unit_id || ':') + 1)
ORDER BY unit_id, trace_a, trace_b
"""


# Demo Sigma YAML upload (S8) — the user-extension surface: arbitrary
# rules in Sigma syntax, compiled at runtime by functions/sigma.py
# (rule/session.py:24-123 semantics: per-rule compile, field-prefix
# rewrite to raw_data.Metadata.*, logsource.category term, 1024-clause
# split). The four rules below exercise plain/list equality, the
# contains/startswith/endswith/re modifiers, and/not conditions and the
# `1 of <pattern>` quantifier; their predicates are restated in
# SQL_SIGMA_MATCH over the identical events→syslog field formulas.
SIGMA_DEMO_RULES = r"""
title: Suspicious temp file write
id: a1a1a1a1-0000-0000-0000-000000000001
logsource:
  category: click
detection:
  selection:
    TargetFilename|endswith: '7.tmp'
    Image|contains: 'proc_3'
  condition: selection
---
title: Internal exfil destination
id: b2b2b2b2-0000-0000-0000-000000000002
logsource:
  category: purchase
detection:
  sel_ip:
    DestinationIp|startswith: '10.0.0.1'
  sel_user:
    User:
      - user_3
      - user_13
      - user_23
  condition: sel_ip and sel_user
---
title: Low proc command persistence
id: c3c3c3c3-0000-0000-0000-000000000003
logsource:
  category: error
detection:
  selection:
    CommandLine|re: 'proc_[0-2]\.exe'
  filter:
    User|endswith: '0'
  condition: selection and not filter
---
title: Noisy view selector
id: d4d4d4d4-0000-0000-0000-000000000004
logsource:
  category: view
detection:
  sel_a:
    EventID:
      - '3'
      - '4'
  sel_b:
    User|contains: '7'
  condition: 1 of sel_*
"""


def q_sigma_match(sf_dir: str):
    """S8/A5/J7 — uploaded Sigma YAML compiled per actor and scanned
    over the syslog raw_data document model for unit_0
    (db_session.py:233-345 get_syslog_by_subquery)."""
    from sigraph_ray.stages import syslog as SY

    return SY.sigma_match(SY.read_doc_store(sf_dir), SIGMA_DEMO_RULES,
                          unit_id="unit_0")


SQL_SIGMA_MATCH = """
WITH s AS (
  SELECT 'span_' || lpad(CAST(event_id AS VARCHAR), 12, '0') AS span_id,
         strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts_raw,
         event_type, event_id, user_id
  FROM events WHERE user_id % 3 = 0
)
SELECT 'Suspicious temp file write' AS rule_title, span_id,
       ts_raw AS "timestamp"
FROM s WHERE event_type = 'click'
  AND (event_id % 100) % 10 = 7 AND user_id % 7 = 3
UNION ALL
SELECT 'Internal exfil destination', span_id, ts_raw
FROM s WHERE event_type = 'purchase'
  AND CAST(event_id % 256 AS VARCHAR) LIKE '1%'
  AND user_id IN (3, 13, 23)
UNION ALL
SELECT 'Low proc command persistence', span_id, ts_raw
FROM s WHERE event_type = 'error'
  AND user_id % 7 IN (0, 1, 2)
  AND NOT (CAST(user_id AS VARCHAR) LIKE '%0')
UNION ALL
SELECT 'Noisy view selector', span_id, ts_raw
FROM s WHERE event_type = 'view'
  AND (CAST(event_id % 20 AS VARCHAR) IN ('3', '4')
       OR CAST(user_id AS VARCHAR) LIKE '%7%')
ORDER BY 1, 2
"""


def q_label_sequences(sf_dir: str):
    """Sequence labeling (db_session.py:414-446): traces of unit_0 with
    any demo-Sigma hit, expanded to their FULL syslog sequences and
    tagged — the weak-supervision labeling flow."""
    from sigraph_ray.stages import syslog as SY

    return SY.label_sequences(SY.read_doc_store(sf_dir), SIGMA_DEMO_RULES,
                              unit_id="unit_0", label="suspicious")


SQL_LABEL_SEQUENCES = """
WITH s AS (
  SELECT 'unit_' || CAST(user_id % 3 AS VARCHAR) AS unit_id,
         'trace_' || CAST(user_id AS VARCHAR) AS trace_id,
         'span_' || lpad(CAST(event_id AS VARCHAR), 12, '0') AS span_id,
         strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts_raw,
         event_type, event_id, user_id
  FROM events
),
hits AS (
  SELECT DISTINCT trace_id FROM s
  WHERE unit_id = 'unit_0' AND (
    (event_type = 'click'
     AND (event_id % 100) % 10 = 7 AND user_id % 7 = 3)
    OR (event_type = 'purchase'
        AND CAST(event_id % 256 AS VARCHAR) LIKE '1%'
        AND user_id IN (3, 13, 23))
    OR (event_type = 'error'
        AND user_id % 7 IN (0, 1, 2)
        AND NOT (CAST(user_id AS VARCHAR) LIKE '%0'))
    OR (event_type = 'view'
        AND (CAST(event_id % 20 AS VARCHAR) IN ('3', '4')
             OR CAST(user_id AS VARCHAR) LIKE '%7%'))
  )
)
SELECT s.unit_id, s.trace_id, s.span_id, s.ts_raw AS "timestamp",
       'suspicious' AS label
FROM s JOIN hits USING (trace_id)
WHERE s.unit_id = 'unit_0'
ORDER BY s.trace_id, s.ts_raw, s.span_id
"""


def q_tactic_histogram(sf_dir: str):
    """Per-unit MITRE-tactic histogram over the persisted doc store —
    the consumer of SyslogModel's optional ``tactics`` field
    (db_model.py:116-117): how often each tactic was observed per unit
    across rule-tagged documents. One column-pruned scan + one small
    groupby-count."""
    from ray.data.aggregate import Count

    from sigraph_ray.stages import syslog as SY

    ds = SY.read_doc_store(sf_dir)

    def tag(t: pa.Table) -> pa.Table:
        # unit_id arrives as the hive partition column (may be
        # dictionary-encoded) — cast to plain string before the shuffle
        keep = pa.table({
            "unit_id": t.column("unit_id").cast(pa.string()),
            "tactics": t.column("tactics").cast(pa.string())})
        return keep.filter(keep.column("tactics").combine_chunks().is_valid())

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    out = tagged.groupby(["unit_id", "tactics"]).aggregate(
        Count(alias_name="n_docs"))
    return out.map_batches(
        lambda t: t.rename_columns(["unit_id", "tactic", "n_docs"]),
        batch_format="pyarrow").sort(["unit_id", "tactic"])


SQL_TACTIC_HISTOGRAM = """
SELECT 'unit_' || CAST(user_id % 3 AS VARCHAR) AS unit_id,
       'TA00' || CAST(event_id % 9 AS VARCHAR) AS tactic,
       count(*) AS n_docs
FROM events WHERE event_id % 5 = 0
GROUP BY 1, 2 ORDER BY 1, 2
"""


# Fixed sigma-style rules: (rule_id, RE2 pattern over document text).
# The reference compiles uploaded Sigma YAML to Lucene queries at
# runtime (src/rule/session.py:24-94, J7 match at db_session.py:233-345);
# here rules are compiled once per actor and broadcast as a table.
TEXT_RULES: tuple[tuple[str, str], ...] = (
    ("r_sortmerge", "sort .* merge"),
    ("r_window", "window (?:scan|agg|join)"),
    ("r_bigjoin", "big .* join"),
    ("r_sparkrow", "spark row"),
)


def q_rule_match(sf_dir: str):
    """J7 — rule set broadcast, predicate scan per rule; emits
    (rule_id, doc_id) match pairs."""
    import ray.data as rd

    class RuleMatcher:
        def __init__(self):
            import re

            self.rules = [(rid, re.compile(pat)) for rid, pat in TEXT_RULES]

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            out_r, out_d = [], []
            for rid, rx in self.rules:
                hit = df["text"].str.contains(rx, regex=True)
                ids = df.loc[hit, "doc_id"]
                out_r.extend([rid] * len(ids))
                out_d.extend(ids)
            return pa.Table.from_pandas(
                pd.DataFrame({"rule_id": out_r, "doc_id": out_d}),
                preserve_index=False)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(RuleMatcher, batch_format="pandas", concurrency=2)


SQL_RULE_MATCH = """
WITH rules(rule_id, pat) AS (VALUES
  ('r_sortmerge', 'sort .* merge'),
  ('r_window', 'window (?:scan|agg|join)'),
  ('r_bigjoin', 'big .* join'),
  ('r_sparkrow', 'spark row'))
SELECT rule_id, doc_id
FROM rules JOIN documents ON regexp_matches(text, pat)
ORDER BY rule_id, doc_id
"""


def q_distinct_units(sf_dir: str):
    """U7 — distinct unit ids (schema.py:170-180)."""
    from sigraph_ray.stages import provenance_graph as G

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    units = ok.unique("unit_id")
    return pd.DataFrame({"unit_id": sorted(units)})


SQL_DISTINCT_UNITS = f"""
WITH {_SQL_BASE}
SELECT DISTINCT unit_id FROM valid ORDER BY unit_id
"""


def q_doc_page(sf_dir: str):
    """O1 — sorted pagination (timestamp-analog sort key + id tiebreak,
    db_session.py:170-223): page 3 of size 50 ordered by
    (n_chars, doc_id)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    page = ds.sort(["n_chars", "doc_id"]).limit(150).to_pandas().tail(50)
    return page.reset_index(drop=True)


SQL_DOC_PAGE = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars, doc_id LIMIT 50 OFFSET 100
"""


def q_prov_subgraph(sf_dir: str):
    """G3 provenance subgraph export (QUERY_ALL_PROVENANCE,
    schema.py:127-152): per trace, every directed action edge lying on
    some path (src)-[*1..5]->(dst) whose ENDPOINTS are contained in the
    trace, src not MODULE, not both endpoints PROCESS — intermediates
    unrestricted. Oracle: recursive forward/backward distance CTEs over
    the identical derived edge set."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages import traversal as TV

    parsed = _parsed_events(sf_dir)
    g = G.build_graph_from_parsed(parsed, prune=False)
    return TV.provenance_subgraph(g, max_hop=5)


_SUBGRAPH_K = 5

SQL_PROV_SUBGRAPH = f"""
WITH RECURSIVE {_SQL_BASE},
edges_d AS (
  SELECT DISTINCT
     CASE WHEN actor_type = 'READ_RECV' THEN artifact ELSE parent_key END AS src,
     CASE WHEN actor_type = 'READ_RECV' THEN parent_key ELSE artifact END AS dst,
     action_type AS type
  FROM valid WHERE parent_key IS NOT NULL AND parent_span_id IS NOT NULL
),
cur AS (SELECT DISTINCT unit_id, trace_id, artifact FROM valid),
appearances AS (
  SELECT artifact, ord, unit_id, trace_id, 0 AS kind FROM valid
  UNION ALL
  SELECT parent_key AS artifact, ord, unit_id, trace_id, 1 AS kind
  FROM valid WHERE parent_key IS NOT NULL
),
firsts AS (
  SELECT artifact, unit_id, trace_id, kind,
         row_number() OVER (PARTITION BY artifact ORDER BY ord) AS rn
  FROM appearances
),
contains_all AS (
  SELECT unit_id, trace_id, artifact FROM cur
  UNION
  SELECT unit_id, trace_id, artifact FROM firsts WHERE rn = 1 AND kind = 1
),
cont AS (
  SELECT unit_id, trace_id, artifact,
         string_split(artifact, '@')[-1] AS atype
  FROM contains_all
),
src_seeds AS (
  SELECT unit_id, trace_id, artifact AS node,
         (atype = 'PROCESS') AS is_proc
  FROM cont WHERE atype <> 'MODULE'
),
dst_seeds AS (
  SELECT unit_id, trace_id, artifact AS node,
         (atype = 'PROCESS') AS is_proc
  FROM cont
),
fwd(unit_id, trace_id, is_proc, node, d) AS (
  SELECT unit_id, trace_id, is_proc, node, 0 FROM src_seeds
  UNION
  SELECT f.unit_id, f.trace_id, f.is_proc, e.dst, f.d + 1
  FROM fwd f JOIN edges_d e ON f.node = e.src
  WHERE f.d < {_SUBGRAPH_K - 1}
),
bwd(unit_id, trace_id, is_proc, node, d) AS (
  SELECT unit_id, trace_id, is_proc, node, 0 FROM dst_seeds
  UNION
  SELECT b.unit_id, b.trace_id, b.is_proc, e.src, b.d + 1
  FROM bwd b JOIN edges_d e ON b.node = e.dst
  WHERE b.d < {_SUBGRAPH_K - 1}
)
SELECT DISTINCT f.unit_id AS unit_id, f.trace_id AS trace_id,
                e.src AS src, e.type AS type, e.dst AS dst
FROM edges_d e
JOIN fwd f ON f.node = e.src
JOIN bwd b ON b.node = e.dst
          AND b.unit_id = f.unit_id AND b.trace_id = f.trace_id
WHERE f.d + 1 + b.d <= {_SUBGRAPH_K}
  AND NOT (f.is_proc AND b.is_proc)
ORDER BY 1, 2, 3, 4, 5
"""


def q_prov_contains_pruned(sf_dir: str):
    """G1 — the CONTAINS table AFTER orphan pruning
    (FLUSH_SINGLE_ENTITIES_WITH_TRACE, schema.py:112-125): pairs whose
    trace contains exactly one node and whose node has total degree 1
    are deleted. Oracle restates the degree/singleton arithmetic in
    SQL over the identical derived graph."""
    from sigraph_ray.stages import provenance_graph as G

    parsed = _parsed_events(sf_dir)
    g = G.build_graph_from_parsed(parsed, prune=True)
    return g["contains"]


SQL_PROV_CONTAINS_PRUNED = f"""
WITH {_SQL_BASE},
edges_d AS (
  SELECT DISTINCT
     CASE WHEN actor_type = 'READ_RECV' THEN artifact ELSE parent_key END AS src,
     CASE WHEN actor_type = 'READ_RECV' THEN parent_key ELSE artifact END AS dst,
     action_type AS type
  FROM valid WHERE parent_key IS NOT NULL AND parent_span_id IS NOT NULL
),
cur AS (SELECT DISTINCT unit_id, trace_id, artifact FROM valid),
appearances AS (
  SELECT artifact, ord, unit_id, trace_id, 0 AS kind FROM valid
  UNION ALL
  SELECT parent_key AS artifact, ord, unit_id, trace_id, 1 AS kind
  FROM valid WHERE parent_key IS NOT NULL
),
firsts AS (
  SELECT artifact, unit_id, trace_id, kind,
         row_number() OVER (PARTITION BY artifact ORDER BY ord) AS rn
  FROM appearances
),
contains_all AS (
  SELECT unit_id, trace_id, artifact FROM cur
  UNION
  SELECT unit_id, trace_id, artifact FROM firsts WHERE rn = 1 AND kind = 1
),
matches_all AS (
  SELECT DISTINCT 'rule_' || CAST(event_id % 12 AS VARCHAR) AS rule_id, artifact
  FROM valid WHERE event_id % 5 = 0
),
deg AS (
  SELECT artifact, count(*) AS degree FROM (
    SELECT src AS artifact FROM edges_d
    UNION ALL SELECT dst FROM edges_d
    UNION ALL SELECT artifact FROM contains_all
    UNION ALL SELECT artifact FROM matches_all
  ) GROUP BY artifact
),
singles AS (
  SELECT unit_id, trace_id FROM contains_all
  GROUP BY unit_id, trace_id HAVING count(*) = 1
),
doomed AS (
  SELECT c.artifact
  FROM contains_all c
  JOIN singles s ON s.unit_id = c.unit_id AND s.trace_id = c.trace_id
  JOIN deg d ON d.artifact = c.artifact AND d.degree = 1
)
SELECT c.unit_id, c.trace_id, c.artifact
FROM contains_all c
WHERE c.artifact NOT IN (SELECT artifact FROM doomed)
ORDER BY 1, 2, 3
"""


NEIGHBORHOOD_SEEDS = ("proc_3", "file_1", "hklm")


def q_prov_neighborhood(sf_dir: str):
    """Graph-neighborhood retrieval (KNOWLEDGE_GRAPH_QUERY,
    prompt.py:151-173) run BULK over a seed list against the provenance
    graph: ≤2 prefix-matched nodes per seed (sorted id), out- then
    in-edges formatted ``src - TYPE -> dst``, 50 lines per seed."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages.query import neighborhood

    parsed = _parsed_events(sf_dir)
    g = G.build_graph_from_parsed(parsed, prune=False)
    return neighborhood(g["nodes"], g["edges"], NEIGHBORHOOD_SEEDS,
                        id_col="artifact", type_col="type")


SQL_PROV_NEIGHBORHOOD = f"""
WITH {_SQL_BASE},
edges_d AS (
  SELECT DISTINCT
     CASE WHEN actor_type = 'READ_RECV' THEN artifact ELSE parent_key END AS src,
     CASE WHEN actor_type = 'READ_RECV' THEN parent_key ELSE artifact END AS dst,
     action_type AS type
  FROM valid WHERE parent_key IS NOT NULL AND parent_span_id IS NOT NULL
),
nodes_all AS (
  SELECT DISTINCT artifact FROM valid
  UNION
  SELECT DISTINCT parent_key FROM valid WHERE parent_key IS NOT NULL
),
seeds(seed) AS (VALUES ('proc_3'), ('file_1'), ('hklm')),
matched AS (
  SELECT seed, artifact FROM (
    SELECT s.seed, n.artifact,
           row_number() OVER (PARTITION BY s.seed ORDER BY n.artifact) AS rn
    FROM seeds s JOIN nodes_all n ON starts_with(n.artifact, s.seed)
  ) WHERE rn <= 2
),
lines AS (
  SELECT m.seed, 0 AS leg,
         e.src || ' - ' || e.type || ' -> ' || e.dst AS line
  FROM matched m JOIN edges_d e ON e.src = m.artifact
  UNION ALL
  SELECT m.seed, 1, e.src || ' - ' || e.type || ' -> ' || e.dst
  FROM matched m JOIN edges_d e ON e.dst = m.artifact
),
ranked AS (
  SELECT seed, line,
         row_number() OVER (PARTITION BY seed ORDER BY leg, line) AS rn
  FROM lines
)
SELECT seed, line FROM ranked WHERE rn <= 50 ORDER BY seed, line
"""


def q_knn_self_join(sf_dir: str):
    """All-pairs exact top-5 neighbor self-join (stages/similarity
    .knn_self_join): broadcast corpus matrix, per-block matmul + full
    deterministic ranking."""
    import ray.data as rd

    from sigraph_ray.stages.similarity import knn_self_join

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return knn_self_join(ds, k=5)


SQL_KNN_SELF_JOIN = """
WITH scored AS (
  SELECT a.vec_id, b.vec_id AS nbr_id,
         round(list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])), 9) AS cos
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id, nbr_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, nbr_id ASC) AS rank
  FROM scored
)
SELECT vec_id, rank, nbr_id FROM ranked WHERE rank <= 5
ORDER BY vec_id, rank
"""


def q_kg_neighborhood(sf_dir: str):
    """F3 + neighborhood over the LLM knowledge graph: entities are
    extracted from a question (deterministic F3 stand-in,
    ai_agent.py:456-474) and their graph context retrieved — rows-only
    (the KG comes from the extraction grammar, not from SQL-expressible
    tables)."""
    import pyarrow.parquet as pq

    from sigraph_ray.pipelines import kg as K
    from sigraph_ray.stages.query import neighborhood, query_entities

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    # materialize the triple stream once and reuse the edge aggregate
    # for the entity table — neighborhood consumes entities AND edges,
    # which would otherwise re-run the whole extraction per consumer
    triples = K.extract_triples_pipeline(
        K.synth_pages(n_docs), concurrency=_conc(0.5)).materialize()
    edges = K.build_kg_edges(triples).materialize()
    entities = K.entities_from_edges(edges)
    question = ("what did wscript.exe do after payload898.exe appeared, "
                "and who touched hklm\\software\\microsoft\\windows?")
    ents = query_entities(question)
    return neighborhood(entities, edges, ents,
                        id_col="entity", type_col="pred")


def q_doc_embed_knn(sf_dir: str):
    """Doc-embedding stage feeding ANN from the KG side: documents get
    the deterministic embedding column, queried by the embeddings of
    the first 4 documents' own text — rows-only (the embedder is a
    hashed-ngram kernel, not SQL); pytest asserts self-retrieval."""
    import ray.data as rd

    from sigraph_ray.functions.embed import embed_texts
    from sigraph_ray.stages import similarity as S

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    embedded = S.add_embeddings(docs).materialize()
    qdocs = embedded.filter(expr="doc_id < 4").to_pandas()
    queries = pd.DataFrame({
        "qid": qdocs["doc_id"].to_numpy(),
        "vec": [np.asarray(v) for v in embed_texts(qdocs["text"])]})
    return S.knn_cosine(embedded, queries, k=3, id_col="doc_id")


def q_knn_cosine_ivf(sf_dir: str):
    """IVF ANN over the embeddings table — rows-only (approximate by
    design; recall vs brute is pytest-gated)."""
    import ray.data as rd

    from sigraph_ray.stages import similarity as S

    corpus = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    corpus = corpus.filter(expr="vec_id >= 8")
    return S.knn_cosine_ivf(corpus, _knn_queries(sf_dir), k=5)


def q_knn_cosine_pq(sf_dir: str):
    """Product-quantization ANN over the embeddings table
    (stages/similarity.knn_cosine_pq): per-subspace codebooks +
    asymmetric-distance scan — the memory-scale tier under IVF/LSH
    (8 bytes/vector at m=8). Rows-only (approximate by design; recall
    vs brute and layout-invariance are pytest-gated)."""
    import ray.data as rd

    from sigraph_ray.stages import similarity as S

    corpus = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    corpus = corpus.filter(expr="vec_id >= 8")
    return S.knn_cosine_pq(corpus, _knn_queries(sf_dir), k=5)


def q_trace_listing(sf_dir: str):
    """F1 — trace listing drops traces with span_count < 2
    (graph_session.py:221-223)."""
    from sigraph_ray.stages import provenance_graph as G

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    traces = G.build_traces(ok)
    return traces.filter(expr="span_count >= 2")


SQL_TRACE_LISTING = f"""
WITH {_SQL_BASE}
SELECT unit_id, trace_id,
       min(ts) AS start_time,
       nullif(arg_min(coalesce(process_name, chr(1)), ord), chr(1))
           AS representative_process_name,
       count(*) AS span_count
FROM valid GROUP BY unit_id, trace_id HAVING count(*) >= 2
ORDER BY unit_id, trace_id
"""


def q_iocs(sf_dir: str):
    """J5/U8 — SigraphIoC listing for unit_0: non-PROCESS contained
    artifacts with trace ids semi-joined to the unit's trace set
    (element_behavior.py:788-851). Scalar projection (trace list →
    count) for hash-stable compare."""
    from sigraph_ray.stages import provenance_graph as G

    parsed = _parsed_events(sf_dir)
    g = G.build_graph_from_parsed(parsed, prune=False)
    iocs = G.extract_iocs(g, "unit_0")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "artifact": df["artifact"],
            "artifact_type": df["artifact_type"],
            "image": df["image"],
            "n_unit_traces": df["related_trace_ids"].map(len).astype("int64"),
        })
    return iocs.map_batches(project, batch_format="pandas")


SQL_IOCS = f"""
WITH {_SQL_BASE},
from_events AS (
  SELECT artifact,
         count(DISTINCT trace_id) FILTER (unit_id = 'unit_0') AS n_unit_traces,
         arg_max(process_name, ord) FILTER (process_name IS NOT NULL) AS image
  FROM valid GROUP BY artifact
),
appearances AS (
  SELECT artifact, ord, unit_id, trace_id, 0 AS kind FROM valid
  UNION ALL
  SELECT parent_key AS artifact, ord, unit_id, trace_id, 1 AS kind
  FROM valid WHERE parent_key IS NOT NULL
),
firsts AS (
  SELECT artifact, unit_id, kind,
         row_number() OVER (PARTITION BY artifact ORDER BY ord) AS rn
  FROM appearances
),
contained_u0 AS (
  SELECT DISTINCT artifact FROM valid WHERE unit_id = 'unit_0'
  UNION
  SELECT artifact FROM firsts WHERE rn = 1 AND kind = 1 AND unit_id = 'unit_0'
),
allnodes AS (
  SELECT c.artifact,
         coalesce(e.n_unit_traces, 0) AS n_unit_traces,
         e.image
  FROM contained_u0 c LEFT JOIN from_events e ON c.artifact = e.artifact
)
SELECT artifact,
       string_split(artifact, '@')[-1] AS artifact_type,
       image, n_unit_traces
FROM allnodes
WHERE string_split(artifact, '@')[-1] <> 'PROCESS'
ORDER BY artifact
"""


def q_drift_sequence(sf_dir: str):
    """J6 — drift sequence for seed (unit_0, trace_0): the seed trace's
    SYSLOG documents unioned with those of all graph-related traces
    within 3 undirected hops, sorted by the raw Timestamp string
    (api.py:177-208; db_model.py:141-143 sorts raw docs by the string).
    The docs leg reads the syslog DOCUMENT STORE (stages/syslog.py),
    which ingests every event — including rows whose provenance-graph
    ingest quarantined (the reference's OpenSearch store is populated
    independently of Neo4j ingest success)."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages import syslog as SY
    from sigraph_ray.stages import traversal as TV

    parsed = _parsed_events(sf_dir)
    g = G.build_graph_from_parsed(parsed, prune=False)
    docs = SY.read_doc_store(sf_dir)
    seq = TV.drift_sequence(g, docs, "unit_0", "trace_0", max_hop=3,
                            sort_cols=("raw_data.Timestamp", "span_id"))
    return seq.map_batches(
        lambda t: t.select(["unit_id", "trace_id", "span_id", "timestamp"]),
        batch_format="pyarrow")


SQL_DRIFT_SEQUENCE = f"""
WITH RECURSIVE {_SQL_BASE},
edges_raw AS (
  SELECT CASE WHEN actor_type = 'READ_RECV' THEN artifact ELSE parent_key END AS src,
         CASE WHEN actor_type = 'READ_RECV' THEN parent_key ELSE artifact END AS dst
  FROM valid WHERE parent_key IS NOT NULL AND parent_span_id IS NOT NULL
),
cur AS (SELECT DISTINCT unit_id, trace_id, artifact FROM valid),
appearances AS (
  SELECT artifact, ord, unit_id, trace_id, 0 AS kind FROM valid
  UNION ALL
  SELECT parent_key AS artifact, ord, unit_id, trace_id, 1 AS kind
  FROM valid WHERE parent_key IS NOT NULL
),
firsts AS (
  SELECT artifact, unit_id, trace_id, kind,
         row_number() OVER (PARTITION BY artifact ORDER BY ord) AS rn
  FROM appearances
),
contains_all AS (
  SELECT unit_id, trace_id, artifact FROM cur
  UNION
  SELECT unit_id, trace_id, artifact FROM firsts WHERE rn = 1 AND kind = 1
),
matches_all AS (
  SELECT DISTINCT 'rule_' || CAST(event_id % 12 AS VARCHAR) AS rule_id, artifact
  FROM valid WHERE event_id % 5 = 0
),
undirected AS (
  SELECT src AS u, dst AS v FROM edges_raw
  UNION SELECT dst, src FROM edges_raw
  UNION SELECT 'trace:' || unit_id || ':' || trace_id, artifact FROM contains_all
  UNION SELECT artifact, 'trace:' || unit_id || ':' || trace_id FROM contains_all
  UNION SELECT 'rule:' || rule_id, artifact FROM matches_all
  UNION SELECT artifact, 'rule:' || rule_id FROM matches_all
),
walk(node, d) AS (
  SELECT 'trace:unit_0:trace_0', 0
  UNION
  SELECT a.v, w.d + 1 FROM walk w JOIN undirected a ON w.node = a.u
  WHERE w.d < 3
),
drift_traces AS (
  SELECT DISTINCT trace_id FROM (
    SELECT 'trace_0' AS trace_id
    UNION ALL
    SELECT substr(node, length('trace:unit_0:') + 1) AS trace_id FROM walk
    WHERE node LIKE 'trace:unit_0:%'
  ) u
)
SELECT b.unit_id, b.trace_id, b.span_id, b.ts AS timestamp
FROM base b JOIN drift_traces d ON b.trace_id = d.trace_id
WHERE b.unit_id = 'unit_0'
ORDER BY b.ts, b.span_id
"""


def q_source_capped(sf_dir: str):
    """Per-group deterministic cap (stages/sample.grouped_hash_cap):
    the crawl-curation "max N pages per host" rule — keep the 10 docs
    per source with the smallest md5(doc_id), a pure function of
    content, stable at every parallelism level. One range sort with
    pre-capped fragments (no degenerate-group cliff)."""
    import ray.data as rd

    from sigraph_ray.stages.sample import grouped_hash_cap

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    capped = grouped_hash_cap(ds, key="doc_id", group="source", k=10)
    return capped.map_batches(
        lambda df: df[["source", "doc_id", "rank"]],
        batch_format="pandas")


SQL_SOURCE_CAPPED = """
WITH h AS (
  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS hv
  FROM documents
), r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY hv, doc_id) AS rank
  FROM h
)
SELECT source, doc_id, rank FROM r WHERE rank <= 10
ORDER BY source, rank
"""


def q_temperature_mixture(sf_dir: str):
    """Temperature-based mixture rebalancing
    (stages/sample.temperature_mixture): per-LANGUAGE keep-rates
    derived FROM the data — rate_s = sqrt(n_min/n_s) (alpha=0.5), so
    sampled masses follow n_s^0.5 and the rarest language keeps
    everything (the multilingual rebalancing pass; `lang` is the
    skewed stratum in this corpus, en ≈ 3× fr). The alpha=0.5 path is
    sqrt/division only (IEEE correctly rounded), so the SQL oracle
    reproduces the 16-bit md5 threshold bit-exactly."""
    import ray.data as rd

    from sigraph_ray.stages.sample import temperature_mixture

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    return temperature_mixture(ds, key="doc_id", stratum="lang",
                               alpha=0.5)


SQL_TEMPERATURE_MIXTURE = """
WITH c AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang
), lim AS (
  SELECT lang,
         CAST(floor(sqrt((SELECT min(n) FROM c) * 1.0 / n) * 65536)
              AS BIGINT) AS lim
  FROM c
), h AS (
  SELECT doc_id, lang,
         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS h16
  FROM documents
)
SELECT h.doc_id, h.lang FROM h JOIN lim USING (lang)
WHERE h.h16 < lim.lim
ORDER BY h.doc_id
"""


def q_dedup_weighted_tokens(sf_dir: str):
    """Duplicate-aware corpus accounting: each doc weighted 1/m where m
    is its exact-duplicate cluster size (md5(text) across ALL sources),
    then per-source EFFECTIVE token mass — the soft-dedup down-weighting
    used instead of hard removal when duplicates carry signal. Dataflow:
    per-batch (hash, source) combiner → sorted_groupby_agg → cluster
    sizes by hash → sorted_merge_join (bounded fan-out: ≤ #sources rows
    per hash) → per-batch per-source partials folded on the driver."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.joins import sorted_merge_join
    from sigraph_ray.functions.hashing import md5_hex

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"h": pd.Series(dtype="object"),
                                 "source": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64"),
                                 "tok": pd.Series(dtype="int64")})
        out = pd.DataFrame({
            "h": md5_hex(df["text"].tolist()),
            "source": df["source"].to_numpy(),
            "tok": df["text"].str.count(r"\S+").to_numpy(),
        })
        g = out.groupby(["h", "source"], sort=False)["tok"]
        return (g.agg(c="size", tok="sum").reset_index()
                [["h", "source", "c", "tok"]])

    parts = ds.map_batches(parse, batch_format="pandas")
    g = sorted_groupby_agg(parts, key=["h", "source"],
                           aggs={"c": ("c", "sum"),
                                 "tok": ("tok", "sum")})
    m = sorted_groupby_agg(g, key="h", aggs={"m": ("c", "sum")})
    j = sorted_merge_join(g, m, on="h",
                          left_cols=["source", "c", "tok"],
                          right_cols=["m"])

    def per_source(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "eff_tokens": pd.Series(dtype="float64"),
                                 "n_docs": pd.Series(dtype="int64")})
        df = df.assign(_eff=df["tok"] / df["m"])
        gg = df.groupby("source", sort=False)
        return (gg.agg(eff_tokens=("_eff", "sum"), n_docs=("c", "sum"))
                .reset_index())

    folded = (j.map_batches(per_source, batch_format="pandas",
                            batch_size=None).to_pandas())
    out = (folded.groupby("source", sort=True)
           .agg(eff_tokens=("eff_tokens", "sum"),
                n_docs=("n_docs", "sum")).reset_index())
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


SQL_DEDUP_WEIGHTED_TOKENS = r"""
WITH d AS (
  SELECT source, md5(text) AS h,
         len(regexp_extract_all(text, '\S+')) AS tok
  FROM documents
), g AS (
  SELECT h, source, count(*) AS c, sum(tok) AS tok
  FROM d GROUP BY h, source
), m AS (
  SELECT h, sum(c) AS m FROM g GROUP BY h
)
SELECT g.source,
       sum(g.tok * 1.0 / m.m) AS eff_tokens,
       CAST(sum(g.c) AS BIGINT) AS n_docs
FROM g JOIN m USING (h)
GROUP BY g.source ORDER BY g.source
"""


def q_profile(sf_dir: str):
    """One-pass column profiler (stages/profile.profile_table): per
    column rows/nulls/min/max in a single shuffle-free scan — the
    pre-flight DESCRIBE of a training-data ingest. One wide partial row
    per block, native-dtype fold on the driver, strings rendered last."""
    import ray.data as rd

    from sigraph_ray.stages.profile import profile_table

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars"])
    return profile_table(ds, ["doc_id", "lang", "source", "n_chars"])


SQL_PROFILE = """
SELECT * FROM (
  SELECT 'doc_id' AS col, count(*) AS n_rows,
         count(*) - count(doc_id) AS n_null,
         CAST(min(doc_id) AS VARCHAR) AS min_value,
         CAST(max(doc_id) AS VARCHAR) AS max_value
  FROM documents
  UNION ALL
  SELECT 'lang', count(*), count(*) - count(lang),
         min(lang), max(lang) FROM documents
  UNION ALL
  SELECT 'source', count(*), count(*) - count(source),
         min(source), max(source) FROM documents
  UNION ALL
  SELECT 'n_chars', count(*), count(*) - count(n_chars),
         CAST(min(n_chars) AS VARCHAR),
         CAST(max(n_chars) AS VARCHAR) FROM documents
) ORDER BY col
"""


def q_value_outliers(sf_dir: str):
    """Robust per-group outlier detection (median/MAD, the
    skew-immune z-score): per event_type median via the exact grouped
    quantile_disc machinery, a second grouped median over |x − med|
    (the MAD), then a broadcast-threshold filter |x − med| > 3·MAD —
    the data-quality anomaly pass run before training ingest trusts a
    numeric column. Two range sorts on group-sized keys + one
    stateless filter; medians/MADs broadcast as tiny dicts. Both sides
    evaluate the identical double expression, so the comparison is
    deterministic (no aggregation-order float drift)."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import grouped_exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    med = grouped_exact_quantiles(ds, key="event_type", col="value",
                                  qs=[0.5])
    med_by = dict(zip(med["event_type"], med["value"]))

    def absdev(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["ad"] = (out["value"]
                     - out["event_type"].map(med_by)).abs()
        return out

    dev = ds.map_batches(absdev, batch_format="pandas")
    mad = grouped_exact_quantiles(dev, key="event_type", col="ad",
                                  qs=[0.5])
    mad_by = dict(zip(mad["event_type"], mad["value"]))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        thr = 3.0 * df["event_type"].map(mad_by).to_numpy()
        keep = df["ad"].to_numpy() > thr
        return df.loc[keep, ["event_id", "event_type", "value"]]

    return dev.map_batches(flag, batch_format="pandas")


SQL_VALUE_OUTLIERS = """
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS m
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_id, e.event_type, e.value,
         abs(e.value - med.m) AS ad
  FROM events e JOIN med USING (event_type)
), mad AS (
  SELECT event_type, quantile_disc(ad, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT dev.event_id, dev.event_type, dev.value
FROM dev JOIN mad USING (event_type)
WHERE dev.ad > 3 * mad.mad
ORDER BY dev.event_id
"""


def q_length_histogram(sf_dir: str):
    """Fixed-width histogram of document lengths (100-char bins) —
    the distribution profile behind length-filter thresholds. Exact
    and shuffle-free: per-batch bin value_counts partials, one tiny
    driver fold over O(#blocks × #bins) rows."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bins = (df["n_chars"] // 100).astype("int64")
        return (bins.value_counts().rename_axis("bin")
                .reset_index(name="n_docs"))

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    out = (parts.groupby("bin", sort=True)["n_docs"].sum()
           .reset_index())
    out["bin"] = out["bin"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


SQL_LENGTH_HISTOGRAM = """
SELECT CAST(n_chars // 100 AS BIGINT) AS bin, count(*) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1
"""


def q_det_shuffle(sf_dir: str):
    """Deterministic corpus shuffle (stages/ordering): global training
    position = rank of md5(seed ':' doc_id) — bit-reproducible at any
    parallelism, one narrow range sort + the O(#blocks) row stitch."""
    import ray.data as rd

    from sigraph_ray.stages.ordering import deterministic_shuffle

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return deterministic_shuffle(ds, key="doc_id", seed="s0",
                                 keep_cols=["source"])


SQL_DET_SHUFFLE = """
SELECT row_number() OVER (
         ORDER BY md5('s0:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
         AS pos,
       doc_id, source
FROM documents ORDER BY pos
"""


def q_interleave_sources(sf_dir: str):
    """Round-robin source interleaving (stages/ordering): per-source
    deterministic rank by md5(doc_id), global order by (rank, source)
    so a sequential reader sees every source mixed ~uniformly."""
    import ray.data as rd

    from sigraph_ray.stages.ordering import interleave_sources

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return interleave_sources(ds, key="doc_id", source="source")


SQL_INTERLEAVE_SOURCES = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rnk
  FROM documents
)
SELECT row_number() OVER (ORDER BY rnk, source) - 1 AS pos,
       doc_id, source
FROM r ORDER BY pos
"""


def q_shard_plan(sf_dir: str):
    """Token-balanced training-shard plan (stages/ordering): each doc
    assigned whole to shard floor(tokens_before / 4096) over the
    doc_id-ordered concatenation; prefix-sum stitch, text never moves."""
    import ray.data as rd

    from sigraph_ray.stages.ordering import shard_plan

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return shard_plan(ds, budget=4096)


SQL_SHARD_PLAN = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
           AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens) // 4096
            AS BIGINT) AS shard
FROM t ORDER BY doc_id
"""


def q_key_skew(sf_dir: str):
    """Pre-shuffle hot-key report (stages/profile.key_skew): the
    top-10 heaviest event_type keys with row share and skew factor —
    what you run before committing to a groupby/join key at 100 TB."""
    import ray.data as rd

    from sigraph_ray.stages.profile import key_skew

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type"])
    return key_skew(ds, key="event_type", top_k=10)


SQL_KEY_SKEW = """
WITH c AS (
  SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
), s AS (
  SELECT count(*) AS nk, sum(cnt) AS total FROM c
)
SELECT row_number() OVER (ORDER BY cnt DESC, event_type) AS rank,
       event_type, cnt,
       cnt * 100.0 / total AS share_pct,
       CAST(cnt * nk AS DOUBLE) / total AS skew
FROM c, s
ORDER BY cnt DESC, event_type
LIMIT 10
"""


def q_grouped_mode(sf_dir: str):
    """Per-user dominant event type (stages/collect.grouped_mode):
    the MODE aggregate with a deterministic tie-break — count
    partials are the combiner, so full rows never shuffle."""
    import ray.data as rd

    from sigraph_ray.stages.collect import grouped_mode

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    return grouped_mode(ds, key="user_id", value="event_type")


SQL_GROUPED_MODE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type AS mode_value, cnt FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn
  FROM c
) WHERE rn = 1 ORDER BY user_id
"""


def q_ntile_buckets(sf_dir: str):
    """Equal-frequency value binning
    (stages/quantiles.ntile_transform): ntile(8) over (value,
    event_id) — distribution-adaptive quantile buckets."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import ntile_transform

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])
    return ntile_transform(ds, value_col="value", id_col="event_id",
                           k=8)


SQL_NTILE_BUCKETS = """
SELECT event_id, value,
       ntile(8) OVER (ORDER BY value, event_id) AS bucket
FROM events ORDER BY event_id
"""


def q_gap_filled_hourly(sf_dir: str):
    """Gap-filled hourly event series: tumbling-window counts with
    missing hours zero-filled between the corpus min and max hour —
    the dense time series a monitoring/seasonality consumer needs
    (missing hour = silence, not absence of a row). Per-batch hour
    value_counts partials fold on the driver (state O(#blocks ×
    #hours-per-block); #hours is calendar-bounded — a decade is 88k
    rows — so the dense reindex is driver-safe by construction)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        vc = pc.value_counts(hour)
        return pa.table({"hour": vc.field("values"),
                         "n_p": pc.cast(vc.field("counts"), pa.int64())})

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None).to_pandas())
    counts = parts.groupby("hour", sort=True)["n_p"].sum()
    full = pd.date_range(counts.index.min(), counts.index.max(),
                         freq="h")
    out = counts.reindex(full, fill_value=0).rename("n_events")
    return (out.rename_axis("hour").reset_index()
            .astype({"n_events": "int64"}))


SQL_GAP_FILLED_HOURLY = """
WITH b AS (
  SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events
  FROM events GROUP BY 1
), r AS (
  SELECT unnest(generate_series((SELECT min(hour) FROM b),
                                (SELECT max(hour) FROM b),
                                INTERVAL 1 HOUR)) AS h
)
SELECT r.h AS hour, coalesce(b.n_events, 0) AS n_events
FROM r LEFT JOIN b ON b.hour = r.h
ORDER BY hour
"""


def q_name_editdist_pairs(sf_dir: str):
    """Blocked edit-distance similarity join
    (stages/dedup.blocked_levenshtein_pairs): part-name pairs at
    levenshtein ≤ 10 within the same (brand, size) blocking cell —
    the entity-resolution candidate step with an exact DuckDB
    levenshtein oracle."""
    import ray.data as rd

    from sigraph_ray.stages.dedup import blocked_levenshtein_pairs

    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_brand",
                                  "p_size"])
    return blocked_levenshtein_pairs(
        ds, id_col="p_partkey", text_col="p_name",
        block_cols=["p_brand", "p_size"], max_dist=10)


SQL_NAME_EDITDIST_PAIRS = """
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       levenshtein(a.p_name, b.p_name) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 10
ORDER BY 1, 2
"""


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids in long form
    (stages/similarity.grouped_centroid) — the class-prototype
    aggregate over a list<float> column; per-batch numpy partial sums,
    one grouped-sum stitch."""
    import ray.data as rd

    from sigraph_ray.stages.similarity import grouped_centroid

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])
    return grouped_centroid(ds, group="label", vec_col="embedding")


SQL_LABEL_CENTROIDS = """
WITH d AS (
  SELECT label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
SELECT label, CAST(dim AS BIGINT) AS dim, avg(v) AS mean
FROM d GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_event_transitions(sf_dir: str):
    """Per-user event-type transition counts
    (stages/temporal.event_transitions): the Markov bigram table over
    each user's time-ordered event stream — one range sort, vectorized
    within-block pair counts, O(#blocks) seam stitch."""
    import ray.data as rd

    from sigraph_ray.stages.temporal import event_transitions

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    return event_transitions(ds, key="user_id", ts="ts",
                             tiebreak="event_id", value="event_type")


SQL_EVENT_TRANSITIONS = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev AS prev_value, event_type AS next_value, count(*) AS n
FROM s WHERE prev IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_tfidf_cosine_pairs(sf_dir: str):
    """Sparse TF-IDF cosine similarity join
    (stages/dedup.tfidf_cosine_pairs): doc pairs at cosine ≥ 0.3 over
    tf·ln(N/df) weights, terms df-capped at 200 (stop-word cut that
    also bounds every posting list) — the sparse sibling of the dense
    embedding pair join, with an exact SQL oracle."""
    import ray.data as rd

    from sigraph_ray.stages.dedup import tfidf_cosine_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return tfidf_cosine_pairs(ds, threshold=0.3, df_cap=200)


SQL_TFIDF_COSINE_PAIRS = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
           AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), w AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((SELECT count(*) FROM documents) * 1.0 / df.df)
           AS w
  FROM tf JOIN df USING (term) WHERE df.df <= 200
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1
), pair AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT pair.id_a, pair.id_b,
       pair.dot / (na.nrm * nb.nrm) AS cos
FROM pair
JOIN nrm na ON na.doc_id = pair.id_a
JOIN nrm nb ON nb.doc_id = pair.id_b
WHERE pair.dot / (na.nrm * nb.nrm) >= 0.3
ORDER BY 1, 2
"""


def q_value_time_corr(sf_dir: str):
    """Pearson correlation between event value and event time
    (stages/stats.column_corr): ONE shuffle-free pass of per-block
    moment partials; x shifted by a constant epoch base so Σx² stays
    cancellation-safe (shift-invariant statistic)."""
    import ray.data as rd

    from sigraph_ray.stages.stats import column_corr

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        x = df["ts"].astype("datetime64[us]").astype("int64") / 1e6
        return pd.DataFrame({"x": x, "y": df["value"]})

    return column_corr(ds.map_batches(prep, batch_format="pandas"),
                       x="x", y="y", x_base=1_704_000_000.0)


SQL_VALUE_TIME_CORR = """
SELECT corr(value, epoch(ts)) AS corr_xy, count(*) AS n FROM events
"""


def q_type_trend(sf_dir: str):
    """Per-event-type OLS trend of value over time
    (stages/stats.grouped_linreg): grouped moment partials + one
    stitch; intercept reported at the shifted origin (epoch base
    1704000000) so both sides compute an O(value)-scale number
    instead of an extrapolation to epoch 0."""
    import ray.data as rd

    from sigraph_ray.stages.stats import grouped_linreg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        x = df["ts"].astype("datetime64[us]").astype("int64") / 1e6
        return pd.DataFrame({"event_type": df["event_type"],
                             "x": x, "y": df["value"]})

    out = grouped_linreg(ds.map_batches(prep, batch_format="pandas"),
                         key="event_type", x="x", y="y",
                         x_base=1_704_000_000.0)

    def shift_origin(df: pd.DataFrame) -> pd.DataFrame:
        # icept at raw x=0 → icept at x_base (matches the SQL's
        # regr_intercept over the shifted x)
        df = df.copy()
        df["icept0"] = df["icept"] + df["slope"] * 1_704_000_000.0
        return df[["event_type", "slope", "icept0", "n"]]

    return out.map_batches(shift_origin, batch_format="pandas")


SQL_TYPE_TREND = """
SELECT event_type,
       regr_slope(value, epoch(ts) - 1704000000.0) AS slope,
       regr_intercept(value, epoch(ts) - 1704000000.0) AS icept0,
       count(*) AS n
FROM events GROUP BY 1 ORDER BY 1
"""


def q_rolling_active_users(sf_dir: str):
    """7-day rolling distinct active users per calendar day — the
    exact windowed COUNT DISTINCT, which no mergeable aggregate gives
    you: each distinct (day, user) activity contributes itself to the
    7 window-days it supports (vectorized ×7 explode), a second
    distinct collapses multi-activity users per window, and the final
    per-day count folds calendar-bounded partials on the driver."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def day_user(t: pa.Table) -> pa.Table:
        return pa.table({"d": pc.floor_temporal(t.column("ts"),
                                                unit="day"),
                         "user_id": t.column("user_id")})

    du = sorted_distinct(ds.map_batches(day_user,
                                        batch_format="pyarrow"),
                         ["d", "user_id"]).materialize()
    hi_parts = du.map_batches(
        lambda df: pd.DataFrame({"m": [df["d"].max()]}) if len(df)
        else pd.DataFrame({"m": pd.Series(dtype="datetime64[us]")}),
        batch_format="pandas", batch_size=None).to_pandas()
    hi = hi_parts["m"].max()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"wd": pd.Series(dtype="datetime64[us]"),
                 "user_id": pd.Series(dtype="int64")})
        k = 7
        wd = (np.repeat(df["d"].to_numpy(), k)
              + np.tile(np.arange(k), len(df))
              .astype("timedelta64[D]"))
        out = pd.DataFrame({"wd": wd,
                            "user_id": np.repeat(
                                df["user_id"].to_numpy(), k)})
        return out[out["wd"] <= hi]

    win = sorted_distinct(du.map_batches(explode,
                                         batch_format="pandas"),
                          ["wd", "user_id"])
    parts = win.map_batches(
        lambda df: (df["wd"].value_counts().rename_axis("day")
                    .reset_index(name="n_p")),
        batch_format="pandas", batch_size=None).to_pandas()
    out = (parts.groupby("day", sort=True)["n_p"].sum()
           .reset_index(name="active_users"))
    out["active_users"] = out["active_users"].astype("int64")
    return out


SQL_ROLLING_ACTIVE_USERS = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
), bounds AS (SELECT max(d) AS hi FROM du),
ex AS (
  SELECT d + (i::INT) * INTERVAL 1 DAY AS wd, user_id
  FROM du, range(0, 7) r(i)
), win AS (
  SELECT DISTINCT wd, user_id FROM ex, bounds WHERE wd <= bounds.hi
)
SELECT wd AS day, count(*) AS active_users
FROM win GROUP BY 1 ORDER BY 1
"""


def q_source_enriched(sf_dir: str):
    """Aggregate-back enrichment join under total key skew: a
    10-row per-source count table joined back onto every document —
    every key is hot (a source holds ~10-50% of the corpus), the case
    that breaks a plain merge join's bounded-fan-out assumption.
    stages/joins.salted_merge_join replicates the aggregate row per
    salt bucket and joins on (source, salt); deterministic salts make
    the result layout-invariant."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.joins import salted_merge_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False).size()
        return pd.DataFrame({"source": g.index.to_numpy(),
                             "cnt_p": g.to_numpy().astype("int64")})

    counts = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key="source", aggs={"n_source_docs": ("cnt_p", "sum")})

    out = salted_merge_join(ds, counts, on="source",
                            left_cols=["doc_id"],
                            right_cols=["n_source_docs"],
                            salt_col="doc_id", buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "source": df["source"],
            "n_source_docs": df["n_source_docs"].astype("int64")})

    return out.map_batches(finish, batch_format="pandas")


SQL_SOURCE_ENRICHED = """
SELECT doc_id, source,
       count(*) OVER (PARTITION BY source) AS n_source_docs
FROM documents ORDER BY doc_id
"""


def q_cooccur_shortest_paths(sf_dir: str):
    """Bounded-hop weighted single-source shortest paths
    (stages/graphalgo.khop_min_dist) over the IP co-occurrence graph
    (edge weight 1/shared-trace-count — heavier co-occurrence =
    closer): 3 Bellman-Ford rounds, each one bounded merge join + one
    grouped-min stitch, from the lexicographically smallest node."""
    import ray.data as rd

    from sigraph_ray.stages.collect import (sorted_collect,
                                            sorted_distinct,
                                            sorted_groupby_agg)
    from sigraph_ray.stages.graphalgo import khop_min_dist

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"]).filter(
            expr="event_type == 'purchase'")

    def to_pairs(t: pa.Table) -> pa.Table:
        eid = t.column("event_id")
        uid = t.column("user_id").cast(pa.string())
        ip = pc.binary_join_element_wise(
            "10.0.0.",
            pc.cast(pc.subtract(eid, pc.multiply(
                pc.divide(eid, 256), 256)), pa.string()), "")
        tid = pc.binary_join_element_wise("trace_", uid, "")
        return pa.table({"tid": tid, "ip": ip})

    pairs = sorted_distinct(
        ev.map_batches(to_pairs, batch_format="pyarrow"),
        ["tid", "ip"])
    per_trace = sorted_collect(pairs, key="tid", order_col="ip",
                               value="ip")

    def clique_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a_, b_ = [], []
        for vals in df["values"]:
            if len(vals) > 1:
                arr = np.asarray(vals)
                iu, iv = np.triu_indices(len(arr), 1)
                a_.append(arr[iu])
                b_.append(arr[iv])
        if not a_:
            return pd.DataFrame({"a": pd.Series(dtype="object"),
                                 "b": pd.Series(dtype="object"),
                                 "one": pd.Series(dtype="int64")})
        a = np.concatenate(a_)
        return pd.DataFrame({"a": a, "b": np.concatenate(b_),
                             "one": np.ones(len(a), dtype=np.int64)})

    und = sorted_groupby_agg(
        per_trace.map_batches(clique_pairs, batch_format="pandas"),
        key=["a", "b"], aggs={"cnt": ("one", "sum")}).materialize()

    seed_parts = und.map_batches(
        lambda df: pd.DataFrame({"m": [df["a"].min()]}) if len(df)
        else pd.DataFrame({"m": pd.Series(dtype="object")}),
        batch_format="pandas", batch_size=None).to_pandas()
    seed = seed_parts["m"].min()

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        w = 1.0 / df["cnt"].to_numpy()
        return pd.DataFrame({
            "src": np.concatenate([df["a"].to_numpy(),
                                   df["b"].to_numpy()]),
            "dst": np.concatenate([df["b"].to_numpy(),
                                   df["a"].to_numpy()]),
            "w": np.concatenate([w, w])})

    edges = und.map_batches(sym, batch_format="pandas")
    out = khop_min_dist(edges, seed=seed, k=3)
    return out.map_batches(
        lambda df: df[["node", "dist"]], batch_format="pandas")


SQL_COOCCUR_SHORTEST_PATHS = """
WITH RECURSIVE p AS (
  SELECT DISTINCT 'trace_' || CAST(user_id AS VARCHAR) AS tid,
         '10.0.0.' || CAST(event_id % 256 AS VARCHAR) AS ip
  FROM events WHERE event_type = 'purchase'
), und AS (
  SELECT x.ip AS a, y.ip AS b, count(*) AS cnt
  FROM p x JOIN p y ON x.tid = y.tid AND x.ip < y.ip
  GROUP BY 1, 2
), sym AS (
  SELECT a AS src, b AS dst, 1.0 / cnt AS w FROM und
  UNION ALL
  SELECT b, a, 1.0 / cnt FROM und
), walk(node, dist, hops) AS (
  SELECT (SELECT min(a) FROM und), CAST(0 AS DOUBLE), 0
  UNION ALL
  SELECT s.dst, walk.dist + s.w, walk.hops + 1
  FROM walk JOIN sym s ON s.src = walk.node
  WHERE walk.hops < 3
)
SELECT node, min(dist) AS dist FROM walk GROUP BY 1 ORDER BY 1
"""


def q_distinct_users_per_type(sf_dir: str):
    """EXACT grouped COUNT DISTINCT (distinct users per event type):
    one sorted_distinct on the (key, member) pair + per-batch count
    partials + one grouped-sum stitch — the exact tier under
    grouped_approx_distinct's HLL sketch."""
    import ray.data as rd

    from sigraph_ray.stages.collect import (sorted_distinct,
                                            sorted_groupby_agg)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    d = sorted_distinct(ds, ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False).size()
        return pd.DataFrame({"event_type": g.index.to_numpy(),
                             "c_p": g.to_numpy().astype("int64")})

    out = sorted_groupby_agg(
        d.map_batches(partial, batch_format="pandas"),
        key="event_type", aggs={"n_users": ("c_p", "sum")})
    return out.map_batches(
        lambda df: df.astype({"n_users": "int64"}),
        batch_format="pandas")


SQL_DISTINCT_USERS_PER_TYPE = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1 ORDER BY 1
"""


def q_source_lang_entropy(sf_dir: str):
    """Shannon entropy of the language mix per source —
    H = ln(n) − Σ c·ln(c) / n over per-(source, lang) counts; the
    corpus-diversity metric behind mixture decisions. Grouped counts
    via one stitch; the per-source epilogue folds O(#sources × #langs)
    rows on the driver (bounded by construction)."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "lang"], sort=False).size()
        return g.rename("c_p").reset_index()

    counts = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key=["source", "lang"], aggs={"c": ("c_p", "sum")}).to_pandas()
    c = counts["c"].to_numpy(dtype=np.float64)
    counts["cl"] = c * np.log(c)
    g = counts.groupby("source", sort=True).agg(
        n=("c", "sum"), s=("cl", "sum")).reset_index()
    n = g["n"].to_numpy(dtype=np.float64)
    return pd.DataFrame({"source": g["source"],
                         "entropy": np.log(n) - g["s"].to_numpy() / n,
                         "n_docs": g["n"].astype("int64")})


SQL_SOURCE_LANG_ENTROPY = """
WITH c AS (
  SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2
)
SELECT source, ln(sum(c)) - sum(c * ln(c)) / sum(c) AS entropy,
       CAST(sum(c) AS BIGINT) AS n_docs
FROM c GROUP BY source ORDER BY source
"""


def q_source_unigram_kl(sf_dir: str):
    """KL divergence KL(src0 ‖ src1) between two sources' unigram
    term distributions (add-1 smoothing over the union vocabulary) —
    the corpus-drift / domain-shift metric run before mixing or
    swapping a source. One (term) grouped-count stitch with per-source
    partial columns; scalar totals and the final contribution sum fold
    O(#blocks) partials on the driver."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"]).filter(
        expr="source == 'src0' or source == 'src1'")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"term": pd.Series(dtype="object"),
                              "c0_p": pd.Series(dtype="int64"),
                              "c1_p": pd.Series(dtype="int64")})
        if len(df) == 0:
            return empty
        toks = df["text"].str.lower().str.findall(r"[a-z0-9]+")
        e = (df[["source"]].assign(term=toks).explode("term")
             .dropna(subset=["term"]))
        if len(e) == 0:
            return empty
        g = (e.groupby(["term", "source"], sort=False).size()
             .unstack(fill_value=0))
        out = pd.DataFrame({"term": g.index.to_numpy()})
        for src, col in (("src0", "c0_p"), ("src1", "c1_p")):
            out[col] = (g[src].to_numpy().astype("int64")
                        if src in g.columns
                        else np.zeros(len(g), dtype=np.int64))
        return out

    counts = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key="term", aggs={"c0": ("c0_p", "sum"),
                          "c1": ("c1_p", "sum")}).materialize()

    scal = counts.map_batches(
        lambda df: pd.DataFrame({"n0": [int(df["c0"].sum())],
                                 "n1": [int(df["c1"].sum())],
                                 "v": [len(df)]}),
        batch_format="pandas", batch_size=None).to_pandas()
    n0 = float(scal["n0"].sum())
    n1 = float(scal["n1"].sum())
    v = float(scal["v"].sum())

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        p0 = (df["c0"].to_numpy(np.float64) + 1.0) / (n0 + v)
        p1 = (df["c1"].to_numpy(np.float64) + 1.0) / (n1 + v)
        return pd.DataFrame({"s": [float((p0 * np.log(p0 / p1)).sum())]})

    parts = counts.map_batches(contrib, batch_format="pandas",
                               batch_size=None).to_pandas()
    return pd.DataFrame({"kl": [float(parts["s"].sum())],
                         "n_terms": pd.Series([int(v)], dtype="int64")})


SQL_SOURCE_UNIGRAM_KL = r"""
WITH tok AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents WHERE source IN ('src0', 'src1')
), c AS (
  SELECT term,
         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c1
  FROM tok GROUP BY 1
), s AS (
  SELECT sum(c0) AS n0, sum(c1) AS n1, count(*) AS v FROM c
)
SELECT sum(((c0 + 1.0) / (n0 + v))
           * ln(((c0 + 1.0) / (n0 + v)) / ((c1 + 1.0) / (n1 + v))))
         AS kl,
       CAST(min(v) AS BIGINT) AS n_terms
FROM c, s
"""


def q_value_drift_psi(sf_dir: str):
    """Population Stability Index between two time periods of the
    event value distribution — THE standard production drift metric:
    decile bins from the reference period's exact quantiles
    (stages/quantiles.exact_quantiles matches quantile_disc
    bit-for-bit, so the bin EDGES agree with SQL exactly), add-1
    smoothed bin shares, PSI = Σ (p_a − p_b)·ln(p_a/p_b). Two
    filtered passes with broadcast bin edges; per-batch bin counts
    fold O(#blocks × 10) rows on the driver."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import exact_quantiles

    split = pd.Timestamp("2024-01-16")
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def period(before: bool):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            m = df["ts"] < split
            return df.loc[m if before else ~m, ["value"]]
        return ds.map_batches(f, batch_format="pandas")

    a, b = period(True), period(False)
    qs = [i / 10 for i in range(1, 10)]
    bounds = np.sort(exact_quantiles(a, "value", qs)["value"]
                     .to_numpy(dtype=np.float64))

    def bin_counts(df: pd.DataFrame) -> pd.DataFrame:
        # bin = count of edges strictly below the value (SQL: bnd < v)
        bins = np.searchsorted(bounds, df["value"].to_numpy(),
                               side="left")
        vc = pd.Series(bins).value_counts()
        return pd.DataFrame({"bin": vc.index.to_numpy(),
                             "c": vc.to_numpy().astype("int64")})

    def fold(stream) -> np.ndarray:
        parts = stream.map_batches(bin_counts, batch_format="pandas",
                                   batch_size=None).to_pandas()
        out = np.zeros(10, dtype=np.float64)
        agg = parts.groupby("bin")["c"].sum()
        out[agg.index.to_numpy()] = agg.to_numpy()
        return out

    ca, cb = fold(a), fold(b)
    pa = (ca + 1.0) / (ca.sum() + 10)
    pb = (cb + 1.0) / (cb.sum() + 10)
    psi = float(((pa - pb) * np.log(pa / pb)).sum())
    return pd.DataFrame({"psi": [psi],
                         "n_bins": pd.Series([10], dtype="int64")})


SQL_VALUE_DRIFT_PSI = """
WITH a AS (SELECT value FROM events WHERE ts < TIMESTAMP '2024-01-16'),
b AS (SELECT value FROM events WHERE ts >= TIMESTAMP '2024-01-16'),
q AS (
  SELECT unnest([quantile_disc(value, 0.1), quantile_disc(value, 0.2),
                 quantile_disc(value, 0.3), quantile_disc(value, 0.4),
                 quantile_disc(value, 0.5), quantile_disc(value, 0.6),
                 quantile_disc(value, 0.7), quantile_disc(value, 0.8),
                 quantile_disc(value, 0.9)]) AS bnd
  FROM a
), bins AS (SELECT i AS bin FROM range(0, 10) r(i)),
ac AS (
  SELECT (SELECT count(*) FROM q WHERE q.bnd < a.value) AS bin,
         count(*) AS c
  FROM a GROUP BY 1
), bc AS (
  SELECT (SELECT count(*) FROM q WHERE q.bnd < b.value) AS bin,
         count(*) AS c
  FROM b GROUP BY 1
), na AS (SELECT sum(c) AS n FROM ac),
nb AS (SELECT sum(c) AS n FROM bc),
j AS (
  SELECT bins.bin,
         (coalesce(ac.c, 0) + 1.0) / (na.n + 10) AS pa,
         (coalesce(bc.c, 0) + 1.0) / (nb.n + 10) AS pb
  FROM bins LEFT JOIN ac USING (bin) LEFT JOIN bc USING (bin), na, nb
)
SELECT sum((pa - pb) * ln(pa / pb)) AS psi,
       CAST(count(*) AS BIGINT) AS n_bins
FROM j
"""


def q_purchase_error_overlap(sf_dir: str):
    """INTERVAL OVERLAP join (stages/temporal.interval_overlap_join):
    per-user purchase windows [ts, ts+1h] × error windows
    [ts, ts+30m] that overlap — grid-partitioned (1h cells) so one
    merge join on (user, cell) finds every pair, exact predicate +
    distinct afterwards."""
    import ray.data as rd

    from sigraph_ray.stages.temporal import interval_overlap_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def windows(kind: str, minutes: int, idc: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            d = df[df["event_type"] == kind]
            return pd.DataFrame({
                "user_id": d["user_id"].astype("int64"),
                idc: d["event_id"].astype("int64"),
                "start": d["ts"],
                "end": d["ts"] + pd.Timedelta(minutes=minutes)})
        return ev.map_batches(f, batch_format="pandas")

    a = windows("purchase", 60, "purchase_id")
    b = windows("error", 30, "error_id")
    out = interval_overlap_join(
        a, b, key="user_id", id_l="purchase_id", start_l="start",
        end_l="end", id_r="error_id", start_r="start", end_r="end",
        grid_us=3_600_000_000)
    return out.map_batches(
        lambda df: df.astype({"user_id": "int64",
                              "purchase_id": "int64",
                              "error_id": "int64"}),
        batch_format="pandas")


SQL_PURCHASE_ERROR_OVERLAP = """
SELECT a.user_id, a.event_id AS purchase_id, b.event_id AS error_id
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE a.event_type = 'purchase' AND b.event_type = 'error'
  AND a.ts <= b.ts + INTERVAL 30 MINUTE
  AND b.ts <= a.ts + INTERVAL 1 HOUR
ORDER BY 1, 2, 3
"""


def q_incremental_traces(sf_dir: str):
    """U2 through the INCREMENTAL-maintenance path
    (stages/incremental): the event stream is split deterministically
    into a base (~15/16) and a delta (~1/16), the base is aggregated to
    its mergeable encoded state, and the delta is merged in with ZERO
    shuffle over the base (one vectorized patch pass against the
    broadcast delta aggregate). The result must be bit-identical to the
    full rebuild — the oracle is the full-rebuild SQL. Reference
    analog: the per-event Neo4j MERGE steady state
    (element_behavior.py:350-381), re-expressed as mergeable-state
    maintenance."""
    from sigraph_ray.stages import incremental as I
    from sigraph_ray.stages import provenance_graph as G

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    base, delta = I.split_base_delta(ok)
    return I.decode_trace_state(
        I.merge_trace_delta(I.trace_state(base), delta))


SQL_INCREMENTAL_TRACES = SQL_PROV_TRACES


def q_incremental_edges(sf_dir: str):
    """U3 (last-writer-wins edge merge) through the incremental path —
    the arg-max payload is mergeable, so base state + delta aggregate
    equals the full rebuild exactly (see q_incremental_traces)."""
    from sigraph_ray.stages import incremental as I
    from sigraph_ray.stages import provenance_graph as G

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    base, delta = I.split_base_delta(ok)
    return I.decode_edge_state(
        I.merge_edge_delta(I.edge_state(base), delta))


SQL_INCREMENTAL_EDGES = SQL_PROV_EDGES


def q_kg_incremental_edges(sf_dir: str):
    """KG steady-state maintenance (stages/incremental.merge_kg_edge_delta,
    sum mode): the corpus splits deterministically into base (~15/16 of
    documents, "yesterday's crawl") and delta by the first md5 nibble
    of doc_id; the base's aggregated edge state — the persisted KG
    edge-weight table, here adjacent-token bigram counts of
    documents.text, the same grouped-sum shape the flagship's
    (subj,pred,obj) aggregate maintains — is patched by the BROADCAST
    delta state in one vectorized pass with NO shuffle (and at scale
    no re-read) over the base.  Weight sums are associative, so the
    merged table must equal the full rebuild over ALL documents
    bit-exactly: that is what this oracle checks."""
    import re

    import ray.data as rd

    from sigraph_ray.functions.hashing import md5_hex
    from sigraph_ray.stages import incremental as I
    from sigraph_ray.stages.collect import sorted_groupby_sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    rx = re.compile(r"[a-z0-9]+")

    def half(want_delta: bool):
        def split(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            nib = np.fromiter(
                (int(h[0], 16)
                 for h in md5_hex(df["doc_id"].astype(str).tolist())),
                dtype=np.int64, count=len(df))
            m = (nib == 0) if want_delta else (nib != 0)
            return df[m]

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            toks = df["text"].str.lower().str.findall(rx)
            s = toks.explode().dropna()
            gram = s + " " + s.groupby(level=0).shift(-1)
            vc = gram.dropna().value_counts()
            return pd.DataFrame({"k": vc.index.astype(str),
                                 "cnt": vc.to_numpy().astype("int64")})

        parts = (ds.map_batches(split, batch_format="pandas")
                 .map_batches(partial, batch_format="pandas"))
        return sorted_groupby_sum(parts, key="k",
                                  sum_cols={"weight": "cnt"})

    merged = I.merge_kg_edge_delta(half(False), half(True))

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        sp = df["k"].str.split(" ", n=1, expand=True)
        if len(df) == 0:
            return pd.DataFrame({"src": pd.Series(dtype="object"),
                                 "dst": pd.Series(dtype="object"),
                                 "weight": pd.Series(dtype="int64")})
        return pd.DataFrame({"src": sp[0], "dst": sp[1],
                             "weight": df["weight"].astype("int64")})

    return merged.map_batches(decode, batch_format="pandas")


SQL_KG_INCREMENTAL_EDGES = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
  FROM documents
), toks AS (
  SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS ord
  FROM t
), bg AS (
  SELECT term AS src,
         lead(term, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS dst
  FROM toks
)
SELECT src, dst, count(*) AS weight FROM bg WHERE dst IS NOT NULL
GROUP BY src, dst
"""


def q_pmi_collocations(sf_dir: str):
    """PMI collocation mining (stages/textstats.pmi_collocations) —
    the multi-word-expression / entity-phrase discovery step ahead of
    KG extraction: top-50 adjacent-bigram collocations by pointwise
    mutual information, bigram count ≥ 3."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import pmi_collocations

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    return pmi_collocations(ds, min_count=3, k=50)


SQL_PMI_COLLOCATIONS = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
  FROM documents
), toks AS (
  SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS ord
  FROM t
), uni AS (
  SELECT term, count(*) AS c FROM toks GROUP BY 1
), n AS (SELECT count(*) AS n FROM toks),
bg AS (
  SELECT term AS w1,
         lead(term, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
  FROM toks
), bc AS (
  SELECT w1, w2, count(*) AS c_xy FROM bg WHERE w2 IS NOT NULL
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT bc.w1, bc.w2, c_xy,
       ln(CAST(c_xy AS DOUBLE) * n.n / (u1.c * u2.c)) AS pmi
FROM bc JOIN uni u1 ON bc.w1 = u1.term
        JOIN uni u2 ON bc.w2 = u2.term, n
ORDER BY pmi DESC, w1, w2 LIMIT 50
"""


GAZETTEER_TERMS = ["hash join", "merge part", "quantum flux", "spark",
                   "table scan", "window"]
# SQL_GAZETTEER_MENTIONS splices these terms into its regex UNESCAPED
# ('\b' || term || '\b' — DuckDB has no regexp-escape function) while
# the Python side re.escape()s each term, so a metacharacter would
# silently diverge between the engines. Enforce the shared contract at
# the definition:
import re as _re

if not all(_re.fullmatch(r"[a-z0-9 ]+", _t) for _t in GAZETTEER_TERMS):
    raise ValueError(
        "GAZETTEER_TERMS must be lowercase alphanumeric+space only "
        "(regex metacharacters diverge between the Ray and SQL sides)")


def q_gazetteer_mentions(sf_dir: str):
    """Lexicon-match NER (stages/textstats.gazetteer_mentions) — the
    dictionary-tagging step of KG construction: per-phrase mention and
    document counts over the corpus (one planted zero-hit phrase
    proves absent-term handling)."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import gazetteer_mentions

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return gazetteer_mentions(ds, GAZETTEER_TERMS)


SQL_GAZETTEER_MENTIONS = r"""
WITH terms(term) AS (VALUES ('hash join'), ('merge part'),
                            ('quantum flux'), ('spark'),
                            ('table scan'), ('window'))
SELECT t.term,
       CAST(sum(len(regexp_extract_all(
           lower(d.text), '\b' || t.term || '\b'))) AS BIGINT)
           AS n_mentions,
       CAST(sum(CASE WHEN regexp_matches(
           lower(d.text), '\b' || t.term || '\b')
           THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
FROM terms t, documents d
GROUP BY 1 ORDER BY 1
"""


def q_part_skyline(sf_dir: str):
    """2-D Pareto frontier (stages/stats.skyline): parts not dominated
    on (cheaper price, larger size) — partial-skyline-per-block then
    one bounded final reduce (Börzsönyi ICDE'01), never the quadratic
    NOT EXISTS self-join the oracle runs."""
    import ray.data as rd

    from sigraph_ray.stages.stats import skyline

    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_retailprice", "p_size"])
    return skyline(ds, minimize="p_retailprice", maximize="p_size")


SQL_PART_SKYLINE = """
SELECT p_partkey, p_retailprice, p_size FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
"""


def q_basket_pairs(sf_dir: str):
    """Market-basket pair mining (stages/itemsets.frequent_pairs):
    top-20 co-purchased part pairs by distinct-order support ≥ 2 —
    the entity co-occurrence edge-mining shape of KG construction."""
    import ray.data as rd

    from sigraph_ray.stages.itemsets import frequent_pairs

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    return frequent_pairs(ds, group="l_orderkey", item="l_partkey",
                          min_support=2, k=20)


SQL_BASKET_PAIRS = """
WITH pi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       count(*) AS support
FROM pi a JOIN pi b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY support DESC, p1, p2 LIMIT 20
"""


def q_chi2_type_weekday(sf_dir: str):
    """Pearson χ² independence (stages/stats.chi2_independence) between
    event_type and ISO weekday — the drift/association screen of a
    data-quality pass; contingency partials per block, one bounded
    final fold."""
    import ray.data as rd

    from sigraph_ray.stages.stats import chi2_independence

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    prep = ds.map_batches(
        lambda df: pd.DataFrame(
            {"event_type": df["event_type"],
             "dow": (df["ts"].dt.dayofweek + 1).astype("int64")}),
        batch_format="pandas")
    return chi2_independence(prep, a="event_type", b="dow")


SQL_CHI2_TYPE_WEEKDAY = """
WITH obs AS (
  SELECT event_type AS a, isodow(ts) AS b,
         CAST(count(*) AS DOUBLE) AS o
  FROM events GROUP BY 1, 2
), ra AS (SELECT a, sum(o) AS ra FROM obs GROUP BY 1),
cb AS (SELECT b, sum(o) AS cb FROM obs GROUP BY 1),
nn AS (SELECT sum(o) AS n FROM obs),
grid AS (SELECT ra.a, cb.b, ra.ra * cb.cb / nn.n AS e FROM ra, cb, nn),
cells AS (
  SELECT grid.a, grid.b, coalesce(obs.o, 0) AS o, grid.e
  FROM grid LEFT JOIN obs ON grid.a = obs.a AND grid.b = obs.b)
SELECT sum((o - e) * (o - e) / e) AS chi2,
       CAST((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS BIGINT)
           AS dof,
       CAST(sum(o) AS BIGINT) AS n
FROM cells
"""


def q_embed_covariance(sf_dir: str):
    """Full d×d sample covariance of the embedding column
    (stages/linalg.covariance_matrix): per-block Gram partials (one
    matmul each), one grouped-sum fold of d² scalars, one bounded
    finish task — the corpus streams, only d×d state moves."""
    import ray.data as rd

    from sigraph_ray.stages.linalg import covariance_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    return covariance_matrix(ds)


SQL_EMBED_COVARIANCE = """
WITH v AS (
  SELECT vec_id, unnest(embedding) AS val,
         unnest(range(1, len(embedding) + 1)) AS ord
  FROM embeddings
)
SELECT a.ord AS i, b.ord AS j, covar_samp(a.val, b.val) AS cov
FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.ord <= b.ord
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_pca_embeddings(sf_dir: str):
    """PCA to 4 components (stages/linalg.pca_project): streaming Gram
    fold → one d×d eigendecomposition (embedding-width-sized, never
    corpus-sized) → broadcast projection pass. Sign-fixed components
    make the output deterministic. No SQL analog (eigendecomposition);
    gated by pytest against a single-process numpy reference."""
    import ray.data as rd

    from sigraph_ray.stages.linalg import pca_project

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return pca_project(ds, n_components=4)


def q_softmax_train(sf_dir: str):
    """Distributed multinomial logistic regression
    (stages/linalg.softmax_train): 30 full-batch GD epochs, gradient
    partials folded per epoch, model state broadcast by closure —
    the iterative-training loop as dataflow. Returns the per-class
    weight-norm table. No SQL analog (iterative optimization); gated
    by pytest vs a single-process numpy reference."""
    import ray.data as rd

    from sigraph_ray.stages.linalg import softmax_train

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding", "label"])
    norms, hist, _ = softmax_train(ds, n_classes=10, epochs=30)
    if not hist["accuracy"].iloc[-1] > hist["accuracy"].iloc[0]:
        # production invariant (assert would vanish under python -O)
        raise RuntimeError(
            "softmax_train: accuracy did not improve over training "
            f"({hist['accuracy'].iloc[0]} -> {hist['accuracy'].iloc[-1]})")
    return norms


def q_ip_jaccard(sf_dir: str):
    """Common-neighbor (Jaccard) link prediction
    (stages/itemsets.jaccard_neighbors) over the trace↔IP bipartite
    observation table — proposes relatedness edges between NETWORK
    artifacts sharing traces; wedge counting reuses the pair-support
    core, marginals attach by bounded sorted-merge joins."""
    import ray.data as rd

    from sigraph_ray.stages.itemsets import jaccard_neighbors

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"]).filter(
            expr="event_type == 'purchase'")

    def to_pairs(t: pa.Table) -> pa.Table:
        eid = t.column("event_id")
        uid = t.column("user_id").cast(pa.string())
        ip = pc.binary_join_element_wise(
            "10.0.0.",
            pc.cast(pc.subtract(eid, pc.multiply(
                pc.divide(eid, 256), 256)), pa.string()), "")
        tid = pc.binary_join_element_wise("trace_", uid, "")
        return pa.table({"tid": tid, "ip": ip})

    pairs = ev.map_batches(to_pairs, batch_format="pyarrow")
    return jaccard_neighbors(pairs, group="tid", item="ip",
                             min_common=2, k=20)


SQL_IP_JACCARD = """
WITH p AS (
  SELECT DISTINCT 'trace_' || CAST(user_id AS VARCHAR) AS tid,
         '10.0.0.' || CAST(event_id % 256 AS VARCHAR) AS ip
  FROM events WHERE event_type = 'purchase'
), inter AS (
  SELECT a.ip AS p1, b.ip AS p2, count(*) AS common
  FROM p a JOIN p b ON a.tid = b.tid AND a.ip < b.ip
  GROUP BY 1, 2 HAVING count(*) >= 2
), deg AS (SELECT ip, count(*) AS d FROM p GROUP BY 1)
SELECT i.p1, i.p2, i.common,
       CAST(i.common AS DOUBLE) / (d1.d + d2.d - i.common) AS jaccard
FROM inter i JOIN deg d1 ON i.p1 = d1.ip JOIN deg d2 ON i.p2 = d2.ip
ORDER BY jaccard DESC, p1, p2 LIMIT 20
"""


def q_association_rules(sf_dir: str):
    """Directed association rules over order baskets
    (stages/itemsets.association_rules): top-20 part→part rules by
    lift with support ≥ 2 — the co-occurrence edge WEIGHTING step
    after pair mining."""
    import ray.data as rd

    from sigraph_ray.stages.itemsets import association_rules

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    return association_rules(ds, group="l_orderkey", item="l_partkey",
                             min_support=2, k=20)


SQL_ASSOCIATION_RULES = """
WITH pi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nn AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n FROM pi),
deg AS (SELECT l_partkey, count(*) AS d FROM pi GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS c
  FROM pi a JOIN pi b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
), dir AS (
  SELECT p1 AS ant, p2 AS cons, c FROM pairs
  UNION ALL SELECT p2, p1, c FROM pairs
)
SELECT ant, cons, c AS support,
       CAST(c AS DOUBLE) / da.d AS confidence,
       CAST(c AS DOUBLE) * nn.n / (da.d * dc.d) AS lift
FROM dir JOIN deg da ON dir.ant = da.l_partkey
         JOIN deg dc ON dir.cons = dc.l_partkey, nn
ORDER BY lift DESC, ant, cons LIMIT 20
"""


def q_mention_snippets(sf_dir: str):
    """Evidence-snippet extraction (stages/textstats.mention_snippets):
    first-occurrence KWIC window per (gazetteer term, document) —
    the provenance column a KG keeps so every mined edge cites its
    source span."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import mention_snippets

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return mention_snippets(ds, ["hash join", "table scan", "spark"],
                            window=20, k=100)


SQL_MENTION_SNIPPETS = """
WITH terms(term) AS (VALUES ('hash join'), ('spark'), ('table scan')),
hits AS (
  SELECT t.term, d.doc_id,
         strpos(lower(d.text), t.term) AS pos, d.text
  FROM terms t, documents d
  WHERE strpos(lower(d.text), t.term) > 0
)
SELECT term, doc_id, pos,
       substr(text, greatest(pos - 20, 1),
              pos + len(term) + 20 - greatest(pos - 20, 1)) AS snippet
FROM hits ORDER BY term, doc_id LIMIT 100
"""


def q_knn_label_agreement(sf_dir: str):
    """Label-noise screen: per-label mean fraction of each vector's
    top-5 cosine neighbors sharing its label (kNN agreement — the
    standard label-quality signal for curating classification data).
    Composes the exact all-pairs kNN with two bounded sorted-merge
    label joins and one grouped fold."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.joins import sorted_merge_join
    from sigraph_ray.stages.similarity import knn_self_join

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
    knn = knn_self_join(
        emb.drop_columns(["label"]), k=5)      # vec_id, rank, nbr_id
    labels = emb.map_batches(
        lambda df: pd.DataFrame({"vec_id": df["vec_id"],
                                 "label": df["label"].astype("int64")}),
        batch_format="pandas")

    own = labels
    nbr = labels.map_batches(
        lambda df: df.rename(columns={"vec_id": "nbr_id",
                                      "label": "nbr_label"}),
        batch_format="pandas")
    j1 = sorted_merge_join(knn, own, on="vec_id",
                           left_cols=["rank", "nbr_id"],
                           right_cols=["label"])
    j2 = sorted_merge_join(j1, nbr, on="nbr_id",
                           left_cols=["vec_id", "rank", "label"],
                           right_cols=["nbr_label"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "label": df["label"],
            "same": (df["label"] == df["nbr_label"]).astype("int64"),
            "one": np.ones(len(df), dtype="int64"),
            "first": (df["rank"] == 1).astype("int64")})

    agg = sorted_groupby_agg(
        j2.map_batches(partial, batch_format="pandas"),
        key="label",
        aggs={"same": ("same", "sum"), "one": ("one", "sum"),
              "first": ("first", "sum")})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({
            "label": df["label"].astype("int64"),
            "n_vecs": df["first"].astype("int64"),
            "mean_agreement": df["same"].to_numpy(np.float64)
            / df["one"].to_numpy(np.float64)})
            .sort_values("label").reset_index(drop=True))

    return finish(agg.to_pandas())


SQL_KNN_LABEL_AGREEMENT = """
WITH scored AS (
  SELECT a.vec_id, b.vec_id AS nbr_id,
         round(list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])), 9) AS cos
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, nbr_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, nbr_id ASC) AS rank
  FROM scored
), knn AS (SELECT vec_id, nbr_id, rank FROM ranked WHERE rank <= 5),
lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings)
SELECT la.label,
       CAST(sum(CASE WHEN k.rank = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_vecs,
       CAST(sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END)
            AS DOUBLE) / count(*) AS mean_agreement
FROM knn k JOIN lab la ON k.vec_id = la.vec_id
           JOIN lab lb ON k.nbr_id = lb.vec_id
GROUP BY 1 ORDER BY 1
"""


BM25_QUERY_TERMS = ["spark", "window", "hash", "join"]


def q_bm25_topk(sf_dir: str):
    """BM25 retrieval (stages/textstats.bm25_topk): top-20 documents
    for a broadcast 4-term query — one tokenizing scan, scalar-fold
    corpus statistics, closure-broadcast idf, two-phase top-k."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import bm25_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bm25_topk(ds, BM25_QUERY_TERMS, k=20)


SQL_BM25_TOPK = r"""
WITH s AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl,
         len(regexp_extract_all(lower(text), '\bspark\b'))  AS tf_spark,
         len(regexp_extract_all(lower(text), '\bwindow\b')) AS tf_window,
         len(regexp_extract_all(lower(text), '\bhash\b'))   AS tf_hash,
         len(regexp_extract_all(lower(text), '\bjoin\b'))   AS tf_join
  FROM documents
), g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(CAST(dl AS DOUBLE)) / count(*) AS avgdl,
         CAST(sum(CASE WHEN tf_spark  > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_spark,
         CAST(sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_window,
         CAST(sum(CASE WHEN tf_hash   > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_hash,
         CAST(sum(CASE WHEN tf_join   > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_join
  FROM s
)
SELECT doc_id,
       ln(1 + (n - df_spark + 0.5) / (df_spark + 0.5))
         * tf_spark / (tf_spark + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
     + ln(1 + (n - df_window + 0.5) / (df_window + 0.5))
         * tf_window / (tf_window + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
     + ln(1 + (n - df_hash + 0.5) / (df_hash + 0.5))
         * tf_hash / (tf_hash + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
     + ln(1 + (n - df_join + 0.5) / (df_join + 0.5))
         * tf_join / (tf_join + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
       AS score
FROM s, g
ORDER BY score DESC, doc_id LIMIT 20
"""


def q_user_trigrams(sf_dir: str):
    """Top-20 per-user event-type trigrams (behavioral sequence
    motifs): one sorted_collect co-locates each user's ordered
    sequence, n-grams expand vectorized per block (the PMI shift
    pattern), one grouped-sum stitch, two-phase top-k. At web scale a
    degenerate user (bot with ~10⁹ events) is the hot key —
    ``sorted_collect(max_members=...)`` is the documented cap (same
    contract as the LSH bucket cap); uncapped here because user
    activity in this schema is bounded."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_collect, sorted_groupby_sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "event_type"])
    seqs = sorted_collect(ev, key="user_id", order_col="event_id",
                          value="event_type")

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"gram": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        s = df["values"].explode().dropna().astype(str)
        g2 = s.groupby(level=0).shift(-1)
        g3 = s.groupby(level=0).shift(-2)
        gram = (s + ">" + g2 + ">" + g3).dropna()
        vc = gram.value_counts()
        return pd.DataFrame({"gram": vc.index.astype(str),
                             "c": vc.to_numpy().astype("int64")})

    counts = sorted_groupby_sum(
        seqs.map_batches(grams, batch_format="pandas"),
        key="gram", sum_cols={"cnt": "c"})

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["cnt", "gram"],
                               ascending=[False, True]).head(20)
                .astype({"cnt": "int64"}))

    partials = counts.map_batches(topk, batch_format="pandas").to_pandas()
    return (partials.sort_values(["cnt", "gram"],
                                 ascending=[False, True])
            .head(20).reset_index(drop=True))


SQL_USER_TRIGRAMS = """
WITH g AS (
  SELECT event_type || '>'
         || lead(event_type, 1) OVER w || '>'
         || lead(event_type, 2) OVER w AS gram
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
)
SELECT gram, count(*) AS cnt FROM g WHERE gram IS NOT NULL
GROUP BY 1 ORDER BY cnt DESC, gram LIMIT 20
"""


def q_recency_score(sf_dir: str):
    """Exponential-decay recency-weighted activity per user (τ = 1
    day) — the freshness prior a crawl/training pipeline attaches to
    sources. One scalar fold finds the corpus max timestamp; one
    combiner pass sums decayed weights per user (µs-exact deltas so
    the SQL twin matches bit-for-bit)."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    tmax = ds.max("ts")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dt_us = (tmax - df["ts"]).to_numpy() \
            .astype("timedelta64[us]").astype("int64")
        w = np.exp(-dt_us.astype(np.float64) / 86400000000.0)
        g = (pd.DataFrame({"user_id": df["user_id"], "w": w})
             .groupby("user_id", sort=False)["w"].sum().reset_index())
        return g

    out = sorted_groupby_sum(
        ds.map_batches(partial, batch_format="pandas"),
        key="user_id", sum_cols={"recency": "w"}).to_pandas()
    return (out.sort_values("user_id").reset_index(drop=True)
            .astype({"user_id": "int64"}))


SQL_RECENCY_SCORE = """
WITH m AS (SELECT max(ts) AS tmax FROM events)
SELECT user_id,
       sum(exp(-CAST(date_diff('microsecond', ts, m.tmax) AS DOUBLE)
               / 86400000000.0)) AS recency
FROM events, m GROUP BY 1 ORDER BY 1
"""


def q_winsorized_value(sf_dir: str):
    """Winsorized mean of the event value column: exact distributed
    p01/p99 (stages/quantiles.exact_quantiles — the quantile_disc
    rule) broadcast as clip bounds into one moment-fold pass. The
    outlier-robust rescaling step of numeric feature curation."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    qv = exact_quantiles(ds, "value", [0.01, 0.99])
    lo, hi = float(qv["value"].iloc[0]), float(qv["value"].iloc[1])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64).clip(lo, hi)
        return pd.DataFrame({"s": [v.sum()], "n": [float(len(v))]})

    g = (ds.map_batches(partial, batch_format="pandas")
         .to_pandas().sum())
    return pd.DataFrame({"lo": [lo], "hi": [hi],
                         "wins_mean": [float(g["s"]) / float(g["n"])],
                         "n": [int(g["n"])]})


SQL_WINSORIZED_VALUE = """
WITH q AS (
  SELECT quantile_disc(value, 0.01) AS lo,
         quantile_disc(value, 0.99) AS hi
  FROM events
)
SELECT q.lo AS lo, q.hi AS hi,
       avg(CASE WHEN value < q.lo THEN q.lo
                WHEN value > q.hi THEN q.hi ELSE value END) AS wins_mean,
       count(*) AS n
FROM events, q GROUP BY q.lo, q.hi
"""


def q_hits_cooccur(sf_dir: str):
    """HITS hubs/authorities (stages/graphalgo.hits, broadcast tier)
    over the provenance edge table — process hubs vs artifact
    authorities. Rows-only: iterative/fixed-point, not
    SQL-expressible; the pytest gate matches a dense power iteration
    iteration-exactly."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages.graphalgo import hits

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    edges = G.build_edges(ok)
    out = hits(edges, src="src", dst="dst", n_iter=10)
    return out.sort_values("node").reset_index(drop=True)


def q_ks_doclen(sf_dir: str):
    """Exact two-sample KS statistic (stages/stats.ks_two_sample)
    between src0 and src1 document-length distributions — the
    binning-free drift screen next to PSI."""
    import ray.data as rd

    from sigraph_ray.stages.stats import ks_two_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["n_chars", "source"])
    return ks_two_sample(ds, value="n_chars", group="source",
                         a="src0", b="src1")


SQL_KS_DOCLEN = """
WITH c AS (
  SELECT n_chars AS v,
         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c2
  FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1
), t AS (
  SELECT CAST(sum(c1) AS DOUBLE) AS n1, CAST(sum(c2) AS DOUBLE) AS n2
  FROM c
), e AS (
  SELECT sum(c1) OVER (ORDER BY v) / t.n1 AS f1,
         sum(c2) OVER (ORDER BY v) / t.n2 AS f2
  FROM c, t
)
SELECT max(abs(e.f1 - e.f2)) AS ks,
       CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2
FROM e, t GROUP BY t.n1, t.n2
"""


def q_vocab_summary(sf_dir: str):
    """Corpus vocabulary summary (stages/textstats.vocab_summary):
    distinct terms, hapax legomena, total tokens — Heaps'-law inputs
    for corpus-health monitoring."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import vocab_summary

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return vocab_summary(ds)


SQL_VOCAB_SUMMARY = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
), c AS (SELECT term, count(*) AS c FROM toks GROUP BY 1)
SELECT count(*) AS vocab,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(sum(c) AS BIGINT) AS tokens
FROM c
"""


def q_rrf_hybrid(sf_dir: str):
    """Reciprocal-rank fusion (stages/textstats.rrf_fuse) of two BM25
    rankers' top-50 lists — the hybrid-retrieval merge step; each
    ranker runs fully distributed, the fuse folds two bounded top-k
    lists."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import bm25_topk, rrf_fuse

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    a = bm25_topk(ds, ["spark", "join"], k=50)
    b = bm25_topk(ds, ["window", "hash"], k=50)
    for r in (a, b):
        r["rank"] = np.arange(1, len(r) + 1, dtype="int64")
    return rrf_fuse([a, b], id_col="doc_id", c=60, k=20)


SQL_RRF_HYBRID = r"""
WITH s AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl,
         len(regexp_extract_all(lower(text), '\bspark\b'))  AS tf_spark,
         len(regexp_extract_all(lower(text), '\bjoin\b'))   AS tf_join,
         len(regexp_extract_all(lower(text), '\bwindow\b')) AS tf_window,
         len(regexp_extract_all(lower(text), '\bhash\b'))   AS tf_hash
  FROM documents
), g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(CAST(dl AS DOUBLE)) / count(*) AS avgdl,
         CAST(sum(CASE WHEN tf_spark  > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_spark,
         CAST(sum(CASE WHEN tf_join   > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_join,
         CAST(sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_window,
         CAST(sum(CASE WHEN tf_hash   > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_hash
  FROM s
), sa AS (
  SELECT doc_id,
         ln(1 + (n - df_spark + 0.5) / (df_spark + 0.5))
           * tf_spark / (tf_spark + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
       + ln(1 + (n - df_join + 0.5) / (df_join + 0.5))
           * tf_join / (tf_join + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
         AS score
  FROM s, g
), sb AS (
  SELECT doc_id,
         ln(1 + (n - df_window + 0.5) / (df_window + 0.5))
           * tf_window / (tf_window + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
       + ln(1 + (n - df_hash + 0.5) / (df_hash + 0.5))
           * tf_hash / (tf_hash + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
         AS score
  FROM s, g
), ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM sa QUALIFY r <= 50
), rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM sb QUALIFY r <= 50
)
SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
       coalesce(1.0 / (60 + ra.r), 0) + coalesce(1.0 / (60 + rb.r), 0)
         AS rrf
FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
ORDER BY rrf DESC, doc_id LIMIT 20
"""


def q_edge_type_signatures(sf_dir: str):
    """KG schema induction: per edge type, the (src label, dst label)
    signature histogram over the aggregated edge table — the ontology
    summary a KG pipeline publishes (reference analog: the fixed
    label/verb vocabulary in graph/schema.py, here DERIVED from data).
    One vectorized label-extract pass over the already-aggregated
    edges + one tiny grouped-sum stitch."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages.collect import sorted_groupby_agg

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    edges = G.build_edges(ok)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "type": df["type"],
            "src_label": df["src"].str.extract(r"@([A-Z]+)$")[0],
            "dst_label": df["dst"].str.extract(r"@([A-Z]+)$")[0]})
        g = (out.groupby(["type", "src_label", "dst_label"], sort=False)
             .size().rename("c").reset_index())
        return g

    agg = sorted_groupby_agg(
        edges.map_batches(partial, batch_format="pandas"),
        key=["type", "src_label", "dst_label"],
        aggs={"n_edges": ("c", "sum")}).to_pandas()
    return (agg.sort_values(["type", "src_label", "dst_label"])
            .reset_index(drop=True).astype({"n_edges": "int64"}))


SQL_EDGE_TYPE_SIGNATURES = f"""
WITH {_SQL_BASE},
edges_raw AS (
  SELECT CASE WHEN actor_type = 'READ_RECV' THEN artifact ELSE parent_key END AS src,
         CASE WHEN actor_type = 'READ_RECV' THEN parent_key ELSE artifact END AS dst,
         action_type AS type
  FROM valid WHERE parent_key IS NOT NULL AND parent_span_id IS NOT NULL
), agg AS (
  SELECT DISTINCT src, dst, type FROM edges_raw
)
SELECT type,
       regexp_extract(src, '@([A-Z]+)$', 1) AS src_label,
       regexp_extract(dst, '@([A-Z]+)$', 1) AS dst_label,
       count(*) AS n_edges
FROM agg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_charclass_entropy(sf_dir: str):
    """Per-source character-class entropy screen
    (stages/textstats.charclass_entropy_by_source) — gibberish /
    boilerplate detection for corpus quality scoring."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import charclass_entropy_by_source

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])
    return charclass_entropy_by_source(ds)


SQL_CHARCLASS_ENTROPY = """
WITH s AS (
  SELECT source,
         CAST(len(lower(text)) AS DOUBLE) AS total,
         CAST(len(regexp_extract_all(lower(text), '[a-z]')) AS DOUBLE) AS a,
         CAST(len(regexp_extract_all(lower(text), '[0-9]')) AS DOUBLE) AS d,
         CAST(len(regexp_extract_all(lower(text), ' ')) AS DOUBLE) AS sp,
         CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS DOUBLE) AS o
  FROM documents
), h AS (
  SELECT source,
         -(CASE WHEN a  > 0 THEN a  / total * ln(a  / total) ELSE 0 END
         + CASE WHEN d  > 0 THEN d  / total * ln(d  / total) ELSE 0 END
         + CASE WHEN sp > 0 THEN sp / total * ln(sp / total) ELSE 0 END
         + CASE WHEN o  > 0 THEN o  / total * ln(o  / total) ELSE 0 END)
           AS h
  FROM s
)
SELECT source, avg(h) AS mean_entropy, count(*) AS n_docs
FROM h GROUP BY 1 ORDER BY 1
"""


def q_lexical_diversity(sf_dir: str):
    """Per-source mean type-token ratio
    (stages/textstats.lexical_diversity_by_source) — the lexical-
    diversity quality signal; token-empty docs excluded in BOTH
    engines."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import lexical_diversity_by_source

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])
    return lexical_diversity_by_source(ds)


SQL_LEXICAL_DIVERSITY = """
WITH s AS (
  SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
  FROM documents
), t AS (
  SELECT source,
         CAST(len(list_distinct(arr)) AS DOUBLE) / len(arr) AS ttr
  FROM s WHERE len(arr) > 0
)
SELECT source, avg(ttr) AS mean_ttr, count(*) AS n_docs
FROM t GROUP BY 1 ORDER BY 1
"""


def q_mmr_rerank(sf_dir: str):
    """MMR diversified re-ranking (stages/textstats.mmr_diversify) of
    the BM25 top-50 down to 10 — the redundancy-aware retrieval step
    for RAG context assembly. Rows-only: greedy/iterative; gated by a
    hand-value pytest (a planted near-duplicate must be displaced)."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import bm25_topk, mmr_diversify

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    top = bm25_topk(ds, BM25_QUERY_TERMS, k=50)
    ids = pa.array(top["doc_id"].tolist(), pa.int64())
    texts = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("doc_id"), value_set=ids)),
        batch_format="pyarrow").to_pandas()     # ≤50 rows by construction
    cand = top.merge(texts, on="doc_id")
    return mmr_diversify(cand, id_col="doc_id", text_col="text",
                         score_col="score", k=10, lam=0.7)


def q_kg_negative_samples(sf_dir: str):
    """Deterministic corrupted-tail negative sampling
    (stages/kgtrain.negative_samples) over the provenance edge table —
    the training-pair generator for KG-embedding models; self- and
    accidental-true corruptions filtered exactly."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages.kgtrain import negative_samples

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    edges = G.build_edges(ok)
    out = negative_samples(edges).to_pandas()
    return (out.sort_values(["src", "type", "neg_dst"])
            .reset_index(drop=True))


SQL_KG_NEGATIVE_SAMPLES = f"""
WITH {_SQL_BASE},
edges_raw AS (
  SELECT CASE WHEN actor_type = 'READ_RECV' THEN artifact ELSE parent_key END AS src,
         CASE WHEN actor_type = 'READ_RECV' THEN parent_key ELSE artifact END AS dst,
         action_type AS type
  FROM valid WHERE parent_key IS NOT NULL AND parent_span_id IS NOT NULL
), edges AS (SELECT DISTINCT src, dst, type FROM edges_raw),
ents AS (
  SELECT dst AS ent, row_number() OVER (ORDER BY dst) - 1 AS rank
  FROM (SELECT DISTINCT dst FROM edges)
), n AS (SELECT count(*) AS n FROM ents),
corrupt AS (
  SELECT e.src, e.type, e.dst,
         ((strpos('0123456789abcdef', substr(md5(e.src || '|' || e.type || '|' || e.dst), 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef', substr(md5(e.src || '|' || e.type || '|' || e.dst), 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef', substr(md5(e.src || '|' || e.type || '|' || e.dst), 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(md5(e.src || '|' || e.type || '|' || e.dst), 4, 1)) - 1)) % n.n
           AS idx
  FROM edges e, n
), neg AS (
  SELECT c.src, c.type, c.dst, ents.ent AS neg_dst
  FROM corrupt c JOIN ents ON c.idx = ents.rank
)
SELECT src, type, neg_dst FROM neg
WHERE neg_dst <> dst
  AND NOT EXISTS (SELECT 1 FROM edges t
                  WHERE t.src = neg.src AND t.type = neg.type
                    AND t.dst = neg.neg_dst)
ORDER BY src, type, neg_dst
"""


def q_transe_epoch(sf_dir: str):
    """One TransE training epoch (stages/kgtrain.transe_epoch) over
    the provenance edge table — KG-embedding training as dataflow
    (sparse gradient stitch = the parameter-server update). Rows-only:
    iterative optimization; the pytest gate matches a single-process
    numpy epoch to 1e-9 and requires the margin loss to drop."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages.kgtrain import transe_epoch

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    edges = G.build_edges(ok)
    summary, _, _ = transe_epoch(edges, dim=16, lr=0.1, margin=1.0)
    if not summary["loss_after"].iloc[0] < summary["loss_before"].iloc[0]:
        # production invariant (assert would vanish under python -O)
        raise RuntimeError(
            "transe_epoch: loss did not decrease "
            f"({summary['loss_before'].iloc[0]} -> "
            f"{summary['loss_after'].iloc[0]})")
    return summary


def q_transe_rank_eval(sf_dir: str):
    """Raw link-prediction evaluation (stages/kgtrain.transe_rank_eval)
    of the one-epoch TransE embeddings on the provenance edges —
    construct → corrupt → train → EVALUATE, the full KG-embedding
    lane as dataflow. Rows-only: iterative + ranking; numpy-exact
    pytest gate."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages.kgtrain import transe_epoch, transe_rank_eval

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    edges = G.build_edges(ok)
    _, (ent_ids, E2), (rel_ids, R2) = transe_epoch(
        edges, dim=16, lr=0.1, margin=1.0)
    return transe_rank_eval(edges, ent_ids, E2, rel_ids, R2)


def q_random_walks(sf_dir: str):
    """Deterministic DeepWalk corpus (stages/kgtrain.random_walks) over
    the provenance edges: one 5-node walk per node, each step a
    bounded sorted-merge join. Rows-only: hash-driven iteration; the
    pytest gate replays every step independently."""
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages.kgtrain import random_walks

    parsed = _parsed_events(sf_dir)
    ok, _ = G.split_quarantine(parsed)
    edges = G.build_edges(ok)
    out = random_walks(edges, length=4).to_pandas()
    return out.sort_values("walk_id").reset_index(drop=True)


def q_media_features(sf_dir: str):
    """Multimodal feature pipeline (stages/multimodal): deterministic
    synthetic media table → actor-pool feature extraction (payload
    dropped at the stage boundary) → per-kind summary. The decoders
    are the documented stub boundary (no image/audio libs in this
    runtime; decoder='fake' derives deterministic pseudo-features) —
    the Ray plumbing (schema, small batches for wide payloads, actor
    signature, payload-drop discipline) is the real deliverable.
    Rows-only: binary payloads have no SQL analog; gated by
    tests/test_multimodal.py. ``sf_dir`` sets the row count seed
    surface only (media is synthesized, like the reference's
    uploads)."""
    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.multimodal import (extract_media_features,
                                               synth_media)

    n = 600 if "0.01" in sf_dir else 200
    feats = extract_media_features(synth_media(n, parallelism=4),
                                   concurrency=2, batch_size=64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("kind", sort=False)
             .agg(n=("media_id", "size"),
                  bytes_total=("payload_bytes", "sum"))
             .reset_index())
        return g

    out = sorted_groupby_agg(
        feats.map_batches(partial, batch_format="pandas"),
        key="kind", aggs={"n": ("n", "sum"),
                          "bytes_total": ("bytes_total", "sum")}
    ).to_pandas()
    return (out.sort_values("kind").reset_index(drop=True)
            .astype({"n": "int64", "bytes_total": "int64"}))


def q_doclen_gini(sf_dir: str):
    """Gini coefficient of document lengths
    (stages/stats.gini_coefficient) — the corpus-concentration audit
    (is the byte mass dominated by a few giant pages?)."""
    import ray.data as rd

    from sigraph_ray.stages.stats import gini_coefficient

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["n_chars"])
    return gini_coefficient(ds, value="n_chars")


SQL_DOCLEN_GINI = """
WITH r AS (
  SELECT CAST(n_chars AS DOUBLE) AS x,
         row_number() OVER (ORDER BY n_chars) AS i
  FROM documents
)
SELECT 2.0 * sum(i * x) / (count(*) * sum(x))
       - (count(*) + 1.0) / count(*) AS gini,
       count(*) AS n
FROM r
"""


def q_hourly_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the observed hourly event-count series
    — the seasonality screen next to burst detection. The count table
    folds distributed (grouped-sum stitch, one row per observed hour);
    the r₁ formula runs in one bounded final step over the
    time-range-bounded series (documented: hours, not events)."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].dt.floor("h")
        return h.value_counts().rename("c").rename_axis("hour")\
            .reset_index()

    counts = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key="hour", aggs={"c": ("c", "sum")}).to_pandas()
    s = counts.sort_values("hour")["c"].to_numpy(np.float64)
    d = s - s.mean() if len(s) else s
    denom = float((d * d).sum())
    # <2 observed hours (or a constant series) has no lag-1
    # autocorrelation — NaN beats a ZeroDivisionError
    r1 = float((d[:-1] * d[1:]).sum() / denom) if denom > 0.0 \
        else float("nan")
    return pd.DataFrame({"r1": [r1], "n_hours": [len(s)]})


SQL_HOURLY_AUTOCORR = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS hour,
         CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1
), m AS (SELECT avg(c) AS mu FROM c),
d AS (
  SELECT c - m.mu AS d,
         lead(c) OVER (ORDER BY hour) - m.mu AS d_next
  FROM c, m
)
SELECT sum(CASE WHEN d_next IS NOT NULL THEN d * d_next ELSE 0 END)
       / sum(d * d) AS r1,
       count(*) AS n_hours
FROM d
"""


def q_props_stats(sf_dir: str):
    """Semi-structured JSON column handling: extract props.k (the
    events table's JSON payload) and aggregate per event type — the
    dynamic-mapping surface (reference S4) over a generic JSON column.
    Extraction is the vectorized regex fast path for flat scalar keys;
    a nested-JSON corpus swaps in the per-actor parser tier
    (stages/jsoncol.JsonPathExtractor — exercised by q_props_parsed)
    at the same stage boundary. Matches DuckDB json_extract on this
    shape."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = (df["props"].str.extract(r'"k":\s*(-?\d+)')[0]
             .astype("int64"))
        g = (pd.DataFrame({"event_type": df["event_type"], "k": k})
             .groupby("event_type", sort=False)
             .agg(n=("k", "size"), sum_k=("k", "sum"),
                  max_k=("k", "max"))
             .reset_index())
        return g

    agg = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key="event_type",
        aggs={"n": ("n", "sum"), "sum_k": ("sum_k", "sum"),
              "max_k": ("max_k", "max")}).to_pandas()
    out = pd.DataFrame({
        "event_type": agg["event_type"],
        "n": agg["n"].astype("int64"),
        "avg_k": agg["sum_k"].to_numpy(np.float64)
        / agg["n"].to_numpy(np.float64),
        "max_k": agg["max_k"].astype("int64")})
    return out.sort_values("event_type").reset_index(drop=True)


SQL_PROPS_STATS = """
SELECT event_type, count(*) AS n,
       avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY 1 ORDER BY 1
"""


def q_props_parsed(sf_dir: str):
    """The GENERAL JSON tier (stages/jsoncol.JsonPathExtractor — the
    per-actor parser q_props_stats' regex fast path names): dotted-path
    plan compiled once per actor, each document parsed once for all
    paths, nulls for missing/mistyped keys. Aggregates per event type:
    parsed-key count, min, and odd-value share."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.jsoncol import extract_json_paths

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    parsed = extract_json_paths(ds, {"k": ("k", "int64")},
                                concurrency=_conc(0.25))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["k"]
        return (pd.DataFrame({
            "event_type": df["event_type"],
            "n_k": k.notna().astype("int64"),
            "min_k": k.astype("float64"),
            "odd": (k % 2 != 0).fillna(False).astype("int64")})
            .groupby("event_type", sort=False)
            .agg(n_k=("n_k", "sum"), min_k=("min_k", "min"),
                 odd=("odd", "sum")).reset_index())

    agg = sorted_groupby_agg(
        parsed.map_batches(partial, batch_format="pandas"),
        key="event_type",
        aggs={"n_k": ("n_k", "sum"), "min_k": ("min_k", "min"),
              "odd": ("odd", "sum")}).to_pandas()
    out = pd.DataFrame({
        "event_type": agg["event_type"],
        "n_k": agg["n_k"].astype("int64"),
        "min_k": agg["min_k"].astype("int64"),
        "odd_share": agg["odd"].to_numpy(np.float64)
        / agg["n_k"].to_numpy(np.float64)})
    return out.sort_values("event_type").reset_index(drop=True)


SQL_PROPS_PARSED = """
WITH p AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, count(k) AS n_k, min(k) AS min_k,
       avg(CASE WHEN k % 2 <> 0 THEN 1.0 ELSE 0.0 END) AS odd_share
FROM p GROUP BY 1 ORDER BY 1
"""


def q_embed_clusters(sf_dir: str):
    """K-means clustering of the embedding corpus as a first-class
    capability: deterministic spherical k-means
    (stages/similarity.ivf_train — content-keyed bounded sample, hash
    init) trains 8 centroids, then ONE broadcast assignment pass
    computes per-cluster size and mean within-cluster cosine (the
    cohesion diagnostic). Rows-only: iterative Lloyd steps; the
    IVF recall gates in tests/test_similarity.py cover the trainer."""
    import ray
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.similarity import _normalize, ivf_train

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cent = ivf_train(ds, n_centroids=8)
    cent_ref = ray.put(cent)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        mat = _normalize(np.stack(df["embedding"].to_numpy())
                         .astype(np.float64))
        sims = mat @ c.T
        cell = sims.argmax(axis=1)
        best = sims[np.arange(len(df)), cell]
        g = (pd.DataFrame({"cluster": cell.astype("int64"),
                           "n": 1, "sim": best})
             .groupby("cluster", sort=False)
             .agg(n=("n", "sum"), sim=("sim", "sum")).reset_index())
        return g

    agg = sorted_groupby_agg(
        ds.map_batches(assign, batch_format="pandas"),
        key="cluster", aggs={"n": ("n", "sum"), "sim": ("sim", "sum")}
    ).to_pandas()
    out = pd.DataFrame({
        "cluster": agg["cluster"].astype("int64"),
        "n": agg["n"].astype("int64"),
        "mean_cosine": agg["sim"].to_numpy(np.float64)
        / agg["n"].to_numpy(np.float64)})
    return out.sort_values("cluster").reset_index(drop=True)


def q_cumulative_users(sf_dir: str):
    """Expanding COUNT DISTINCT over time — cumulative unique users by
    day — via the first-appearance identity: a user contributes on
    exactly their MIN day, so the expanding distinct equals a grouped
    min (one stitch) + per-day counts + a cumulative sum over the
    bounded day series. The classic growth curve without a
    per-window distinct scan."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({"user_id": df["user_id"],
                           "day": df["ts"].dt.floor("D")})
             .groupby("user_id", sort=False)["day"].min().reset_index())
        return g

    firsts = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key="user_id", aggs={"day": ("day", "min")}).to_pandas()
    per_day = (firsts.groupby("day").size().rename("new_users")
               .reset_index().sort_values("day"))
    per_day["cum_users"] = per_day["new_users"].cumsum().astype("int64")
    per_day["new_users"] = per_day["new_users"].astype("int64")
    return per_day.reset_index(drop=True)


SQL_CUMULATIVE_USERS = """
WITH f AS (
  SELECT user_id, min(date_trunc('day', ts)) AS day
  FROM events GROUP BY 1
), d AS (
  SELECT day, count(*) AS new_users FROM f GROUP BY 1
)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d ORDER BY day
"""


def q_keyness_src0(sf_dir: str):
    """Keyness analysis (Monroe et al. 2008 log-odds with +1 prior):
    top-25 terms most characteristic of src0 vs the rest of the
    corpus — the per-source vocabulary-drift diagnostic behind the KL
    metric, but per TERM. One tokenizing scan emits per-term
    (src0, rest) count columns; one grouped-sum stitch; the score is
    a vectorized final map over the vocabulary-sized table."""
    import re

    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_sum
    from sigraph_ray.stages.textstats import _WORD_RE

    rx = re.compile(_WORD_RE)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(rx)
        ex = pd.DataFrame({
            "term": toks.explode(),
            "is0": df["source"].eq("src0").reindex(toks.explode().index)
        }).dropna(subset=["term"])
        g = (ex.groupby("term", sort=False)["is0"]
             .agg(a="sum", t="size").reset_index())
        g["a"] = g["a"].astype("int64")
        g["b"] = (g["t"] - g["a"]).astype("int64")
        return g[["term", "a", "b"]]

    counts = sorted_groupby_sum(
        ds.map_batches(partial, batch_format="pandas"),
        key="term", sum_cols={"a": "a", "b": "b"})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "log_odds": pd.Series(dtype="float64")})
        a = df["a"].to_numpy(np.float64)
        b = df["b"].to_numpy(np.float64)
        lo = np.log((a + 1.0) / (b + 1.0))
        out = pd.DataFrame({"term": df["term"],
                            "a": df["a"].astype("int64"),
                            "b": df["b"].astype("int64"),
                            "log_odds": lo})
        return out.sort_values(["log_odds", "term"],
                               ascending=[False, True]).head(25)

    partials = counts.map_batches(score, batch_format="pandas").to_pandas()
    return (partials.sort_values(["log_odds", "term"],
                                 ascending=[False, True])
            .head(25).reset_index(drop=True))


SQL_KEYNESS_SRC0 = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         source = 'src0' AS is0
  FROM documents
), c AS (
  SELECT term,
         CAST(sum(CASE WHEN is0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN is0 THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM toks GROUP BY 1
)
SELECT term, a, b,
       ln((a + 1.0) / (b + 1.0)) AS log_odds
FROM c ORDER BY log_odds DESC, term LIMIT 25
"""


def q_type_gap_stats(sf_dir: str):
    """Per-event-type inter-arrival cadence
    (stages/temporal.grouped_gap_stats): mean/max gap seconds and gap
    count over each type's time-ordered stream — seam-stitched like
    the transition table."""
    import ray.data as rd

    from sigraph_ray.stages.temporal import grouped_gap_stats

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "event_id"])
    return grouped_gap_stats(ds, key="event_type", ts="ts",
                             tiebreak="event_id")


SQL_TYPE_GAP_STATS = """
WITH s AS (
  SELECT event_type,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
)
SELECT event_type,
       avg(CAST(gap AS DOUBLE)) / 1000000.0 AS mean_gap_s,
       CAST(max(gap) AS DOUBLE) / 1000000.0 AS max_gap_s,
       CAST(count(gap) AS BIGINT) AS n_gaps
FROM s WHERE gap IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def q_mi_type_weekday(sf_dir: str):
    """Mutual information between event type and ISO weekday
    (stages/stats.mutual_information) — the effect-size companion to
    the χ² test, same contingency dataflow."""
    import ray.data as rd

    from sigraph_ray.stages.stats import mutual_information

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    prep = ds.map_batches(
        lambda df: pd.DataFrame(
            {"event_type": df["event_type"],
             "dow": (df["ts"].dt.dayofweek + 1).astype("int64")}),
        batch_format="pandas")
    return mutual_information(prep, a="event_type", b="dow")


SQL_MI_TYPE_WEEKDAY = """
WITH obs AS (
  SELECT event_type AS a, isodow(ts) AS b,
         CAST(count(*) AS DOUBLE) AS o
  FROM events GROUP BY 1, 2
), nn AS (SELECT sum(o) AS n FROM obs),
p AS (
  SELECT o / nn.n AS pxy,
         sum(o) OVER (PARTITION BY a) / nn.n AS pa,
         sum(o) OVER (PARTITION BY b) / nn.n AS pb,
         nn.n AS n
  FROM obs, nn
)
SELECT sum(pxy * ln(pxy / (pa * pb))) AS mi,
       CAST(max(n) AS BIGINT) AS n
FROM p
"""


def q_lineitem_covariance(sf_dir: str):
    """Covariance matrix across the lineitem numeric measures —
    the scalar-column face of stages/linalg.covariance_matrix (columns
    packed into a vector per row, then the same d² Gram-partial
    fold); 1-indexed (i, j) in column order quantity, extendedprice,
    discount, tax."""
    import ray.data as rd

    from sigraph_ray.stages.linalg import covariance_matrix

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    # numeric conditioning, applied IDENTICALLY in the SQL twin:
    # price in k$ (unit scale, keeps every covariance ≤ ~1e3 so the
    # 6-decimal hash compare sits far above both engines' float64
    # accumulation error) and shift-centering (covariance is
    # shift-invariant; keeps Σxy partials variance-sized — the
    # stats.py x_base guard)
    shifts = {"l_quantity": 25.0, "l_extendedprice": 35.0,
              "l_discount": 0.05, "l_tax": 0.04}
    scale = {"l_extendedprice": 1e-3}
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
    packed = ds.map_batches(
        lambda df: pd.DataFrame({"embedding": list(
            np.stack([df[c].to_numpy(np.float64) * scale.get(c, 1.0)
                      - shifts[c] for c in cols], axis=1))}),
        batch_format="pandas")
    return covariance_matrix(packed)


SQL_LINEITEM_COVARIANCE = """
WITH s AS (
  SELECT l_quantity AS q, l_extendedprice / 1000.0 AS p,
         l_discount AS d, l_tax AS t
  FROM lineitem
)
SELECT 1 AS i, 1 AS j, covar_samp(q, q) AS cov FROM s
UNION ALL SELECT 1, 2, covar_samp(q, p) FROM s
UNION ALL SELECT 1, 3, covar_samp(q, d) FROM s
UNION ALL SELECT 1, 4, covar_samp(q, t) FROM s
UNION ALL SELECT 2, 2, covar_samp(p, p) FROM s
UNION ALL SELECT 2, 3, covar_samp(p, d) FROM s
UNION ALL SELECT 2, 4, covar_samp(p, t) FROM s
UNION ALL SELECT 3, 3, covar_samp(d, d) FROM s
UNION ALL SELECT 3, 4, covar_samp(d, t) FROM s
UNION ALL SELECT 4, 4, covar_samp(t, t) FROM s
ORDER BY i, j
"""


def q_mahalanobis_outliers(sf_dir: str):
    """Multivariate (2-D) Mahalanobis outlier detection over
    (quantity, price-k$): the Gram fold supplies means and the 2×2
    sample covariance, its closed-form inverse broadcasts into one
    scoring pass, top-20 by (distance² DESC, orderkey, linenumber).
    The multivariate sibling of the per-column MAD screen — identical
    expression tree in the SQL twin, so the float compare is exact."""
    import ray.data as rd

    from sigraph_ray.stages.linalg import _unpack, gram_partials

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice"])
    packed = ds.map_batches(
        lambda df: pd.DataFrame({"embedding": list(np.stack(
            [df["l_quantity"].to_numpy(np.float64) - 25.0,
             df["l_extendedprice"].to_numpy(np.float64) / 1000.0 - 35.0],
            axis=1))}),
        batch_format="pandas")
    n, sums, gram = _unpack(gram_partials(packed).to_pandas())
    mx, my = sums[0] / n, sums[1] / n
    sxx = (gram[0, 0] - sums[0] * sums[0] / n) / (n - 1.0)
    syy = (gram[1, 1] - sums[1] * sums[1] / n) / (n - 1.0)
    sxy = (gram[0, 1] - sums[0] * sums[1] / n) / (n - 1.0)
    det = sxx * syy - sxy * sxy

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dx = (df["l_quantity"].to_numpy(np.float64) - 25.0) - mx
        dy = (df["l_extendedprice"].to_numpy(np.float64) / 1000.0
              - 35.0) - my
        d2 = (dx * (syy * dx - sxy * dy)
              + dy * (sxx * dy - sxy * dx)) / det
        out = pd.DataFrame({"l_orderkey": df["l_orderkey"],
                            "l_linenumber": df["l_linenumber"]
                            .astype("int64"),
                            "dist2": d2})
        return out.sort_values(["dist2", "l_orderkey", "l_linenumber"],
                               ascending=[False, True, True]).head(20)

    partials = ds.map_batches(score, batch_format="pandas").to_pandas()
    return (partials.sort_values(["dist2", "l_orderkey", "l_linenumber"],
                                 ascending=[False, True, True])
            .head(20).reset_index(drop=True))


SQL_MAHALANOBIS_OUTLIERS = """
WITH s AS (
  SELECT l_orderkey, l_linenumber,
         l_quantity - 25.0 AS x,
         l_extendedprice / 1000.0 - 35.0 AS y
  FROM lineitem
), g AS (
  SELECT avg(x) AS mx, avg(y) AS my,
         covar_samp(x, x) AS sxx, covar_samp(y, y) AS syy,
         covar_samp(x, y) AS sxy
  FROM s
)
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       ((x - mx) * (syy * (x - mx) - sxy * (y - my))
        + (y - my) * (sxx * (y - my) - sxy * (x - mx)))
       / (sxx * syy - sxy * sxy) AS dist2
FROM s, g
ORDER BY dist2 DESC, l_orderkey, l_linenumber LIMIT 20
"""


def q_brand_revenue(sf_dir: str):
    """Top-10 part brands by discounted revenue: per-batch integer
    combiner (exact cent×discount units, the lineitem_agg trick) keyed
    by partkey, ONE grouped-sum stitch, then the bounded part→brand
    dimension attaches by zero-copy broadcast (ray.put Arrow view, task
    pool — no actor cold start) and the brand re-fold is tiny."""
    import ray
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_sum

    part = pd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    ref = ray.put(pa.Table.from_pandas(part, preserve_index=False))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["l_extendedprice"].to_numpy() * 100)\
            .astype("int64")
        disc = np.round((1.0 - df["l_discount"].to_numpy()) * 100)\
            .astype("int64")
        g = (pd.DataFrame({"l_partkey": df["l_partkey"],
                           "units": cents * disc})
             .groupby("l_partkey", sort=False)["units"].sum()
             .reset_index())
        return g

    per_part = sorted_groupby_sum(
        li.map_batches(partial, batch_format="pandas"),
        key="l_partkey", sum_cols={"units": "units"})

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(ref).to_pandas()
        m = df.merge(dim, left_on="l_partkey", right_on="p_partkey")
        return (m.groupby("p_brand", sort=False)["units"].sum()
                .reset_index())

    folded = (per_part.map_batches(attach, batch_format="pandas")
              .to_pandas()
              .groupby("p_brand", as_index=False)["units"].sum())
    folded["revenue"] = folded["units"].astype("float64") / 1e4
    out = (folded[["p_brand", "revenue"]]
           .sort_values(["revenue", "p_brand"],
                        ascending=[False, True])
           .head(10).reset_index(drop=True))
    return out


SQL_BRAND_REVENUE = """
SELECT p_brand,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round((1 - l_discount) * 100) AS BIGINT))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY revenue DESC, p_brand LIMIT 10
"""


def q_weighted_quantity_quantiles(sf_dir: str):
    """Revenue-weighted quantity quantiles
    (stages/quantiles.weighted_quantiles): the quantity levels below
    which 25/50/75/95 % of discounted revenue sits — integer revenue
    units so the weights are exact in both engines."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import weighted_quantiles

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice",
                                  "l_discount"])

    def units(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["l_extendedprice"].to_numpy() * 100)\
            .astype("int64")
        disc = np.round((1.0 - df["l_discount"].to_numpy()) * 100)\
            .astype("int64")
        return pd.DataFrame({"qty": df["l_quantity"].astype("int64"),
                             "units": cents * disc})

    out = weighted_quantiles(ds.map_batches(units, batch_format="pandas"),
                             value="qty", weight="units",
                             qs=[0.25, 0.5, 0.75, 0.95])
    out["value"] = out["value"].astype("int64")
    return out


SQL_WEIGHTED_QUANTITY_QUANTILES = """
WITH u AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT)
         * CAST(round((1 - l_discount) * 100) AS BIGINT) AS units
  FROM lineitem
), c AS (
  SELECT qty, CAST(sum(units) AS DOUBLE) AS w FROM u GROUP BY 1
), e AS (
  SELECT qty, sum(w) OVER (ORDER BY qty) AS cumw,
         sum(w) OVER () AS total
  FROM c
)
SELECT q, min(qty) AS value
FROM (VALUES (0.25), (0.5), (0.75), (0.95)) AS t(q), e
WHERE e.cumw >= t.q * e.total
GROUP BY 1 ORDER BY 1
"""


def q_weighted_price_quantiles(sf_dir: str):
    """Quantity-weighted CONTINUOUS-value quantiles
    (stages/quantiles.weighted_quantiles_ranked — the rank-selection
    tier: one range sort, four scalars per block probed, residual-mass
    picks on only the crossing blocks; no per-value table exists
    because the value column is continuous): the price levels below
    which 25/50/75/95 % of shipped quantity sits."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import weighted_quantiles_ranked

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_quantity"])
    return weighted_quantiles_ranked(ds, value="l_extendedprice",
                                     weight="l_quantity",
                                     qs=[0.25, 0.5, 0.75, 0.95])


SQL_WEIGHTED_PRICE_QUANTILES = """
WITH e AS (
  SELECT l_extendedprice AS v,
         sum(CAST(l_quantity AS BIGINT)) OVER (ORDER BY l_extendedprice)
           AS cumw,
         sum(CAST(l_quantity AS BIGINT)) OVER () AS total
  FROM lineitem
)
SELECT q, min(v) AS value
FROM (VALUES (0.25), (0.5), (0.75), (0.95)) AS t(q), e
WHERE e.cumw >= t.q * e.total
GROUP BY 1 ORDER BY 1
"""


def q_cluster_exemplars(sf_dir: str):
    """Cluster exemplar (medoid-to-centroid) selection: for each
    k-means cluster the vector closest to its centroid — the
    representative a human labels first in an active-learning loop.
    One broadcast assignment pass emits per-block per-cluster argmin
    partials (≤ k rows each); the fold keeps the global (min cosine
    distance, min id) per cluster. Rows-only (clustering is
    iterative); deterministic end to end."""
    import ray
    import ray.data as rd

    from sigraph_ray.stages.similarity import _normalize, ivf_train

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cent = ivf_train(ds, n_centroids=8)
    cent_ref = ray.put(cent)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        mat = _normalize(np.stack(df["embedding"].to_numpy())
                         .astype(np.float64))
        sims = mat @ c.T
        cell = sims.argmax(axis=1)
        best = sims[np.arange(len(df)), cell]
        d = pd.DataFrame({"cluster": cell.astype("int64"),
                          "vec_id": df["vec_id"].to_numpy(),
                          "cosine": best})
        # per-block argmax cosine per cluster, deterministic id tiebreak
        d = d.sort_values(["cluster", "cosine", "vec_id"],
                          ascending=[True, False, True])
        return d.groupby("cluster", sort=False).head(1)

    parts = (ds.map_batches(partial, batch_format="pandas")
             .to_pandas()
             .sort_values(["cluster", "cosine", "vec_id"],
                          ascending=[True, False, True]))
    out = (parts.groupby("cluster", as_index=False).head(1)
           .sort_values("cluster").reset_index(drop=True))
    return out[["cluster", "vec_id", "cosine"]]


def q_knn_label_prop(sf_dir: str):
    """Semi-supervised kNN label propagation: 20 % hash-seeded labels
    spread to the rest by two rounds of neighbor majority vote over
    the exact top-5 cosine graph (Zhu & Ghahramani 2002, the hard-label
    variant). Per round: one sorted-merge label attach + one
    grouped-mode stitch; unknowns with no labeled neighbor stay
    unknown. Returns per-true-label coverage and accuracy on the
    PROPAGATED (non-seed) vectors. Rows-only: iterative; deterministic
    (hash seeds, smaller-label tie-break)."""
    import ray.data as rd

    from sigraph_ray.stages.collect import grouped_mode, sorted_groupby_agg
    from sigraph_ray.stages.joins import sorted_merge_join
    from sigraph_ray.stages.similarity import knn_self_join

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
    knn = knn_self_join(emb.drop_columns(["label"]), k=5).materialize()

    labels = emb.map_batches(
        lambda df: pd.DataFrame({
            "vec_id": df["vec_id"],
            "true": df["label"].astype("int64"),
            "seed": (df["vec_id"] % 5 == 0),
            "cur": np.where(df["vec_id"] % 5 == 0,
                            df["label"].astype("int64"), -1)}),
        batch_format="pandas").materialize()

    for _ in range(2):
        nbr = labels.map_batches(
            lambda df: pd.DataFrame({"nbr_id": df["vec_id"],
                                     "nbr_cur": df["cur"]}),
            batch_format="pandas")
        j = sorted_merge_join(knn, nbr, on="nbr_id",
                              left_cols=["vec_id"],
                              right_cols=["nbr_cur"])
        known = j.map_batches(lambda df: df[df["nbr_cur"] >= 0],
                              batch_format="pandas")
        vote = grouped_mode(known, key="vec_id", value="nbr_cur")
        vote = vote.map_batches(
            lambda df: pd.DataFrame({"vec_id": df["vec_id"],
                                     "mode": df["mode_value"]
                                     .astype("int64")}),
            batch_format="pandas")
        upd = sorted_merge_join(labels, vote, on="vec_id",
                                left_cols=["true", "seed", "cur"],
                                right_cols=["mode"], how="left")
        labels = upd.map_batches(
            lambda df: pd.DataFrame({
                "vec_id": df["vec_id"],
                "true": df["true"].astype("int64"),
                "seed": df["seed"].astype(bool),
                "cur": np.where(df["seed"].astype(bool), df["cur"],
                                df["mode"].fillna(df["cur"])
                                .astype("int64")).astype("int64")}),
            batch_format="pandas").materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[~df["seed"].astype(bool)]
        g = (pd.DataFrame({
            "label": d["true"],
            "n": 1,
            "labeled": (d["cur"] >= 0).astype("int64"),
            "correct": (d["cur"] == d["true"]).astype("int64")})
            .groupby("label", sort=False).sum().reset_index())
        return g

    agg = sorted_groupby_agg(
        labels.map_batches(partial, batch_format="pandas"),
        key="label", aggs={"n": ("n", "sum"),
                           "labeled": ("labeled", "sum"),
                           "correct": ("correct", "sum")}).to_pandas()
    out = pd.DataFrame({
        "label": agg["label"].astype("int64"),
        "n_nonseed": agg["n"].astype("int64"),
        "coverage": agg["labeled"].to_numpy(np.float64)
        / agg["n"].to_numpy(np.float64),
        "accuracy": agg["correct"].to_numpy(np.float64)
        / np.maximum(agg["labeled"].to_numpy(np.float64), 1.0)})
    return out.sort_values("label").reset_index(drop=True)


def _tagged_day_sets(sf_dir: str, type_a: str, type_b: str):
    """Shared core for the set-algebra queries: ONE scan emits tagged
    (user, day) membership flags, one grouped-max stitch folds them —
    SET membership as dataflow, no per-side distinct passes and no
    anti-join."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({
            "user_id": df["user_id"],
            "day": df["ts"].dt.floor("D"),
            "a": (df["event_type"] == type_a).astype("int64"),
            "b": (df["event_type"] == type_b).astype("int64")})
            .groupby(["user_id", "day"], sort=False).max()
            .reset_index())
        return g

    return sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key=["user_id", "day"],
        aggs={"a": ("a", "max"), "b": ("b", "max")})


def q_userdays_except(sf_dir: str):
    """SQL EXCEPT as dataflow: (user, day) pairs with a purchase but
    no error that day — tagged membership flags through one
    grouped-max stitch, then a vectorized filter."""
    sets = _tagged_day_sets(sf_dir, "purchase", "error").to_pandas()
    out = sets[(sets["a"] == 1) & (sets["b"] == 0)][["user_id", "day"]]
    return (out.astype({"user_id": "int64"})
            .sort_values(["user_id", "day"]).reset_index(drop=True))


SQL_USERDAYS_EXCEPT = """
SELECT user_id, date_trunc('day', ts) AS day FROM events
WHERE event_type = 'purchase'
EXCEPT
SELECT user_id, date_trunc('day', ts) FROM events
WHERE event_type = 'error'
ORDER BY user_id, day
"""


def q_userdays_intersect(sf_dir: str):
    """SQL INTERSECT as dataflow (same tagged-flag stitch): (user,
    day) pairs with BOTH a signup and a purchase that day."""
    sets = _tagged_day_sets(sf_dir, "signup", "purchase").to_pandas()
    out = sets[(sets["a"] == 1) & (sets["b"] == 1)][["user_id", "day"]]
    return (out.astype({"user_id": "int64"})
            .sort_values(["user_id", "day"]).reset_index(drop=True))


SQL_USERDAYS_INTERSECT = """
SELECT user_id, date_trunc('day', ts) AS day FROM events
WHERE event_type = 'signup'
INTERSECT
SELECT user_id, date_trunc('day', ts) FROM events
WHERE event_type = 'purchase'
ORDER BY user_id, day
"""


# ---------------------------------------------------------------------------
# round 5: multi-grouping-set / window-distribution / unpivot / regression
# ---------------------------------------------------------------------------


def q_cube_revenue(sf_dir: str):
    """SQL ``GROUP BY CUBE(l_returnflag, l_linestatus)`` in ONE narrow
    shuffle: the per-batch combiner folds to the FINEST grouping set
    (flag x status, <= ~6 keys), one sorted stitch sums the integer
    partials, and all four grouping sets derive from that tiny folded
    table on the driver (rollups of an additive aggregate are exact
    re-folds). A naive translation runs one shuffle per grouping set —
    4x the exchange volume for bytes that a <=6-row table already
    carries. Money/quantity stay integer (cents x discount-percent
    units, the lineitem_agg trick) until the final division, so the
    comparison is aggregation-order-proof. grp_id follows SQL
    ``GROUPING(l_returnflag, l_linestatus)`` (bit 1 = flag rolled up,
    bit 0 = status rolled up); rolled-up keys surface as '(all)'."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_quantity", "l_extendedprice",
                                  "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qty = np.round(df["l_quantity"].to_numpy() * 100).astype("int64")
        cents = np.round(df["l_extendedprice"].to_numpy() * 100)\
            .astype("int64")
        disc = np.round((1.0 - df["l_discount"].to_numpy()) * 100)\
            .astype("int64")
        g = (pd.DataFrame({"l_returnflag": df["l_returnflag"],
                           "l_linestatus": df["l_linestatus"],
                           "qty_units": qty,
                           "rev_units": cents * disc,
                           "n_rows": np.ones(len(df), dtype="int64")})
             .groupby(["l_returnflag", "l_linestatus"], sort=False,
                      as_index=False)
             .sum())
        return g

    fine = sorted_groupby_agg(
        li.map_batches(partial, batch_format="pandas"),
        key=["l_returnflag", "l_linestatus"],
        aggs={"qty_units": ("qty_units", "sum"),
              "rev_units": ("rev_units", "sum"),
              "n_rows": ("n_rows", "sum")}).to_pandas()

    sets = []
    num = ["qty_units", "rev_units", "n_rows"]
    for grp_id, keys in ((0, ["l_returnflag", "l_linestatus"]),
                         (1, ["l_returnflag"]),
                         (2, ["l_linestatus"]),
                         (3, [])):
        if keys:
            s = fine.groupby(keys, sort=False, as_index=False)[num].sum()
        else:
            s = fine[num].sum().to_frame().T
        for col in ("l_returnflag", "l_linestatus"):
            if col not in keys:
                s[col] = "(all)"
        s["grp_id"] = np.int64(grp_id)
        sets.append(s)
    out = pd.concat(sets, ignore_index=True)
    out["sum_qty"] = out["qty_units"].astype("float64") / 100.0
    out["revenue"] = out["rev_units"].astype("float64") / 10000.0
    out = out[["grp_id", "l_returnflag", "l_linestatus",
               "sum_qty", "revenue", "n_rows"]]
    out["n_rows"] = out["n_rows"].astype("int64")
    return (out.sort_values(["grp_id", "l_returnflag", "l_linestatus"])
            .reset_index(drop=True))


SQL_CUBE_REVENUE = """
SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grp_id,
       COALESCE(l_returnflag, '(all)') AS l_returnflag,
       COALESCE(l_linestatus, '(all)') AS l_linestatus,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round((1 - l_discount) * 100) AS BIGINT))
            AS DOUBLE) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY grp_id, l_returnflag, l_linestatus
"""


def q_grouped_cume_dist(sf_dir: str):
    """Per-partition ``cume_dist() OVER (PARTITION BY event_type ORDER
    BY value)`` as a transform on every event row — the grouped
    cumulative-distribution feature (percentile-within-segment) that
    rank-normalizes a metric per cohort before training. Same shape as
    stages/quantiles.percent_rank_transform but per KEY: per-batch
    (type, value)-count partials fold to the distinct-value table (one
    narrow stitch — the data rows themselves never shuffle), the driver
    cumsums each type's counts into an inclusive-rank table, broadcasts
    it once via ray.put, and every batch probes by searchsorted.
    Bound (same as percent_rank): the distinct-(key, value) table must
    fit the object store — true for bounded-precision metrics like
    this 2-decimal column; near-unique continuous values need the
    ranked range-sort tier instead."""
    import ray
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def vc_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({
            "event_type": df["event_type"],
            "vc": np.round(df["value"].to_numpy() * 100).astype("int64"),
            "c": np.ones(len(df), dtype="int64")})
            .groupby(["event_type", "vc"], sort=False, as_index=False)
            .sum())
        return g

    counts = sorted_groupby_agg(
        ds.map_batches(vc_partial, batch_format="pandas"),
        key=["event_type", "vc"],
        aggs={"c": ("c", "sum")}).to_pandas()
    counts = counts.sort_values(["event_type", "vc"],
                                kind="stable").reset_index(drop=True)
    table = {}
    for et, g in counts.groupby("event_type", sort=False):
        vals = g["vc"].to_numpy()
        incl = np.cumsum(g["c"].to_numpy(dtype="int64"))
        table[et] = (vals, incl, int(incl[-1]))
    ref = ray.put(table)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        tab = ray.get(ref)
        vc = np.round(df["value"].to_numpy() * 100).astype("int64")
        cd = np.empty(len(df), dtype="float64")
        types = df["event_type"].to_numpy()
        for et in pd.unique(types):
            vals, incl, n = tab[et]
            m = types == et
            pos = np.searchsorted(vals, vc[m], side="right")
            cd[m] = incl[pos - 1] / n
        out = df[["event_id", "event_type", "value"]].copy()
        out["cd"] = cd
        return out

    return ds.map_batches(probe, batch_format="pandas")


SQL_GROUPED_CUME_DIST = """
SELECT event_id, event_type, value,
       cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
FROM events ORDER BY event_id
"""


def q_melt_source_metrics(sf_dir: str):
    """Wide-to-long UNPIVOT (pandas ``melt``) over per-source corpus
    aggregates — the reporting layout metric stores / dashboards ingest
    (one (entity, metric, value) row per cell). One per-batch combiner
    + one narrow stitch computes the wide table (count / sum / max in
    a single pass); the melt itself is a driver-side reshape of the
    per-source result (#sources rows). Integer partials; avg_chars is
    the only float and both sides compute it as the same single
    double division."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False)["n_chars"]\
            .agg(t="sum", m="max", n="count").reset_index()
        return g.astype({"t": "int64", "m": "int64", "n": "int64"})

    wide = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key="source",
        aggs={"t": ("t", "sum"), "m": ("m", "max"),
              "n": ("n", "sum")}).to_pandas()
    wide["n_docs"] = wide["n"].astype("float64")
    wide["total_chars"] = wide["t"].astype("float64")
    wide["max_chars"] = wide["m"].astype("float64")
    wide["avg_chars"] = wide["t"].astype("float64") / wide["n"]\
        .astype("float64")
    out = wide.melt(id_vars=["source"],
                    value_vars=["n_docs", "total_chars", "max_chars",
                                "avg_chars"],
                    var_name="metric", value_name="value")
    return (out.sort_values(["source", "metric"])
            .reset_index(drop=True))


SQL_MELT_SOURCE_METRICS = """
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS t,
         CAST(max(n_chars) AS BIGINT) AS m
  FROM documents GROUP BY source)
SELECT source, 'n_docs' AS metric, CAST(n AS DOUBLE) AS value FROM s
UNION ALL
SELECT source, 'total_chars', CAST(t AS DOUBLE) FROM s
UNION ALL
SELECT source, 'max_chars', CAST(m AS DOUBLE) FROM s
UNION ALL
SELECT source, 'avg_chars', CAST(t AS DOUBLE) / CAST(n AS DOUBLE) FROM s
ORDER BY source, metric
"""


def q_type_value_regression(sf_dir: str):
    """Per-group simple linear regression (SQL ``regr_slope`` /
    ``regr_intercept`` semantics: value vs. time) via exact integer
    sufficient statistics — the per-segment trend fit run over metric
    streams (drift detection, forecasting features). Per-batch
    combiner folds (n, sum_x, sum_y, sum_xy, sum_xx) per event_type
    with x = hour index (int) and y = value cents (int); one narrow
    stitch sums them; the closed form runs on the driver in unbounded
    Python ints, with ONE float conversion at the end. The oracle
    mirrors the identical integer formula (DuckDB HUGEINT sums), so
    the match is aggregation-order-proof where a naive
    ``regr_slope(value, x)`` float accumulation would not be."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = (df["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
             // 3_600_000_000)
        y = np.round(df["value"].to_numpy() * 100).astype("int64")
        g = (pd.DataFrame({"event_type": df["event_type"],
                           "n_rows": np.ones(len(df), dtype="int64"),
                           "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
             .groupby("event_type", sort=False, as_index=False)
             .sum())
        return g

    agg = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key="event_type",
        aggs={c: (c, "sum")
              for c in ("n_rows", "sx", "sy", "sxy", "sxx")}).to_pandas()

    rows = []
    for r in agg.itertuples(index=False):
        n, sx, sy, sxy, sxx = (int(r.n_rows), int(r.sx), int(r.sy),
                               int(r.sxy), int(r.sxx))
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:
            # zero x-variance (single event, or one hour bucket):
            # SQL x/0.0 is NULL — mirror it
            slope = intercept = float("nan")
        else:
            slope = float(num) / float(den) / 100.0
            intercept = (float(sy) / 100.0 / float(n)
                         - slope * (float(sx) / float(n)))
        rows.append((r.event_type, n, slope, intercept))
    out = pd.DataFrame(rows, columns=["event_type", "n_rows",
                                      "slope", "intercept"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_TYPE_VALUE_REGRESSION = """
WITH b AS (
  SELECT event_type,
         -- floor division (SQL // truncates toward zero; Python //
         -- floors — they differ on pre-epoch timestamps): subtract the
         -- positive remainder first so the quotient is exact
         (epoch_us(ts) - ((epoch_us(ts) % 3600000000 + 3600000000)
                          % 3600000000)) // 3600000000 AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events),
a AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * y) AS HUGEINT) AS sxy,
         CAST(sum(x * x) AS HUGEINT) AS sxx
  FROM b GROUP BY event_type)
SELECT event_type, n_rows,
       CAST(n_rows * sxy - sx * sy AS DOUBLE)
         / CAST(n_rows * sxx - sx * sx AS DOUBLE) / 100.0 AS slope,
       CAST(sy AS DOUBLE) / 100.0 / CAST(n_rows AS DOUBLE)
         - (CAST(n_rows * sxy - sx * sy AS DOUBLE)
            / CAST(n_rows * sxx - sx * sx AS DOUBLE) / 100.0)
           * (CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE)) AS intercept
FROM a ORDER BY event_type
"""


def q_full_outer_daily(sf_dir: str):
    """FULL OUTER JOIN of two per-day aggregate streams (events vs
    orders) expressed as the Ray-native equivalent for ADDITIVE
    aggregates: tag each side's per-batch partials with the other
    side's columns zeroed, ``union`` the two datasets, and fold with
    ONE narrow stitch — a full outer join of grouped sums is exactly a
    union + re-sum, so no join operator (and no second shuffle) is
    needed, and days present on only one side surface with honest
    zeros (the COALESCE(…, 0) the SQL spells out). Money stays in
    integer cents until the final division. Scale: both partial
    streams are per-batch pre-folded to #days rows; the single stitch
    moves O(#blocks x #days) tiny partials."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])

    def ev_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
             // 86_400_000_000)
        cents = np.round(df["value"].to_numpy() * 100).astype("int64")
        g = (pd.DataFrame({"day_idx": d,
                           "n_events": np.ones(len(df), dtype="int64"),
                           "value_cents": cents})
             .groupby("day_idx", sort=False, as_index=False).sum())
        g["n_orders"] = np.int64(0)
        g["total_cents"] = np.int64(0)
        return g

    def od_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["o_orderdate"].to_numpy(dtype="datetime64[us]")
             .astype("int64") // 86_400_000_000)
        cents = np.round(df["o_totalprice"].to_numpy() * 100)\
            .astype("int64")
        g = (pd.DataFrame({"day_idx": d,
                           "n_orders": np.ones(len(df), dtype="int64"),
                           "total_cents": cents})
             .groupby("day_idx", sort=False, as_index=False).sum())
        g["n_events"] = np.int64(0)
        g["value_cents"] = np.int64(0)
        return g

    cols = ["day_idx", "n_events", "value_cents", "n_orders",
            "total_cents"]
    parts = (ev.map_batches(lambda df: ev_partial(df)[cols],
                            batch_format="pandas")
             .union(od.map_batches(lambda df: od_partial(df)[cols],
                                   batch_format="pandas")))
    agg = sorted_groupby_agg(
        parts, key="day_idx",
        aggs={c: (c, "sum") for c in cols[1:]}).to_pandas()
    out = pd.DataFrame({
        "day_idx": agg["day_idx"].astype("int64"),
        "n_events": agg["n_events"].astype("int64"),
        "sum_value": agg["value_cents"].astype("float64") / 100.0,
        "n_orders": agg["n_orders"].astype("int64"),
        "sum_total": agg["total_cents"].astype("float64") / 100.0})
    return out.sort_values("day_idx").reset_index(drop=True)


SQL_FULL_OUTER_DAILY = """
WITH e AS (
  -- floor division (see SQL_TYPE_VALUE_REGRESSION note): exact for
  -- pre-epoch timestamps too
  SELECT (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000)
                          % 86400000000)) // 86400000000 AS day_idx,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events GROUP BY 1),
o AS (
  SELECT (epoch_us(o_orderdate)
          - ((epoch_us(o_orderdate) % 86400000000 + 86400000000)
             % 86400000000)) // 86400000000 AS day_idx,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM orders GROUP BY 1)
SELECT CAST(COALESCE(e.day_idx, o.day_idx) AS BIGINT) AS day_idx,
       CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(e.value_cents, 0) AS DOUBLE) / 100.0 AS sum_value,
       CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(o.total_cents, 0) AS DOUBLE) / 100.0 AS sum_total
FROM e FULL OUTER JOIN o ON e.day_idx = o.day_idx
ORDER BY day_idx
"""


def q_quantity_skewkurt(sf_dir: str):
    """Per-group higher moments — SQL ``skewness()`` / ``kurtosis()``
    (sample-adjusted G1 / excess G2, DuckDB semantics) — from EXACT
    integer power sums: the per-batch combiner folds
    (n, Σx, Σx², Σx³, Σx⁴) per group with x = l_quantity (integer-
    valued, ≤50, so x⁴ ≤ 6.25e6 and the int64 partials are exact up to
    ~1.5e12 rows per group — document-scale safe; wider inputs need
    the shifted-moment merge instead), ONE narrow stitch sums them,
    and the closed form runs on the driver in unbounded Python ints
    with a single float conversion at the end — so the comparison is
    aggregation-order-proof, unlike a naive float accumulation whose
    value depends on block layout."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.round(df["l_quantity"].to_numpy()).astype("int64")
        g = (pd.DataFrame({"l_returnflag": df["l_returnflag"],
                           "n_rows": np.ones(len(df), dtype="int64"),
                           "s1": x, "s2": x * x, "s3": x * x * x,
                           "s4": x * x * x * x})
             .groupby("l_returnflag", sort=False, as_index=False)
             .sum())
        return g

    agg = sorted_groupby_agg(
        li.map_batches(partial, batch_format="pandas"),
        key="l_returnflag",
        aggs={c: (c, "sum")
              for c in ("n_rows", "s1", "s2", "s3", "s4")}).to_pandas()

    rows = []
    for r in agg.itertuples(index=False):
        n, s1, s2, s3, s4 = (int(r.n_rows), int(r.s1), int(r.s2),
                             int(r.s3), int(r.s4))
        # exact integer central-moment numerators:
        #   B = n²·m2, A = n³·m3, C = n⁴·m4
        b = n * s2 - s1 * s1
        # DuckDB NULL contract (verified): skewness needs n >= 3 and
        # a non-constant group; kurtosis needs n >= 4 — mirror as NaN
        if n < 3 or b == 0:
            skew = float("nan")
        else:
            a3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
            g1 = float(a3) / float(b) ** 1.5      # m3 / m2^1.5
            skew = g1 * (float(n * (n - 1)) ** 0.5) / (n - 2)
        if n < 4 or b == 0:
            kurt = float("nan")
        else:
            c4 = (n ** 3 * s4 - 4 * n * n * s1 * s3
                  + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
            g2 = float(c4) / float(b) ** 2 - 3.0  # m4 / m2²  - 3
            kurt = (((n + 1) * g2 + 6.0) * (n - 1)
                    / ((n - 2) * (n - 3)))
        rows.append((r.l_returnflag, n, float(s1) / n, skew, kurt))
    out = pd.DataFrame(rows, columns=["l_returnflag", "n_rows",
                                      "avg_qty", "skew", "kurt"])
    return out.sort_values("l_returnflag").reset_index(drop=True)


SQL_QUANTITY_SKEWKURT = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
       avg(l_quantity) AS avg_qty,
       skewness(l_quantity) AS skew,
       kurtosis(l_quantity) AS kurt
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_ewma_daily(sf_dir: str):
    """Per-key exponentially-weighted moving average over a daily
    aggregate stream (α = 0.3) — the smoothing pass behind drift
    monitors and forecasting features. The corpus-scale work is ONE
    per-batch combiner + one narrow stitch to the per-(type, day)
    integer-cents table; the recurrence ewma_i = α·x_i + (1-α)·ewma_{i-1}
    then runs per type over that tiny table (#types × #days rows) on
    the driver, in the EXACT float-op order the oracle's recursive CTE
    uses, so the values agree bit-for-bit. Scale bound: the recurrence
    input is the post-aggregation table, never the event stream; an
    unbounded day range would move the scan into
    groupby(type).map_groups with per-group sorted segments."""
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
             // 86_400_000_000)
        cents = np.round(df["value"].to_numpy() * 100).astype("int64")
        g = (pd.DataFrame({"event_type": df["event_type"],
                           "day_idx": d, "cents": cents})
             .groupby(["event_type", "day_idx"], sort=False,
                      as_index=False).sum())
        return g

    daily = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key=["event_type", "day_idx"],
        aggs={"cents": ("cents", "sum")}).to_pandas()
    daily = daily.sort_values(["event_type", "day_idx"],
                              kind="stable").reset_index(drop=True)
    out_frames = []
    for et, g in daily.groupby("event_type", sort=False):
        x = g["cents"].to_numpy(dtype="int64").astype("float64") / 100.0
        e = np.empty(len(x), dtype="float64")
        e[0] = x[0]
        for i in range(1, len(x)):
            e[i] = 0.3 * x[i] + 0.7 * e[i - 1]
        out_frames.append(pd.DataFrame({
            "event_type": et,
            "day_idx": g["day_idx"].astype("int64").to_numpy(),
            "day_value": x, "ewma": e}))
    out = pd.concat(out_frames, ignore_index=True)
    return (out.sort_values(["event_type", "day_idx"])
            .reset_index(drop=True))


SQL_EWMA_DAILY = """
WITH RECURSIVE b AS (
  -- floor division (see SQL_TYPE_VALUE_REGRESSION note)
  SELECT event_type,
         (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000)
                          % 86400000000)) // 86400000000 AS day_idx,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
           AS day_value
  FROM events GROUP BY 1, 2),
r AS (
  SELECT event_type, day_idx, day_value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY day_idx) AS rn
  FROM b),
e AS (
  SELECT event_type, day_idx, day_value, rn, day_value AS ewma
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.event_type, r.day_idx, r.day_value, r.rn,
         0.3 * r.day_value + 0.7 * e.ewma
  FROM r JOIN e ON r.event_type = e.event_type AND r.rn = e.rn + 1)
SELECT event_type, CAST(day_idx AS BIGINT) AS day_idx, day_value, ewma
FROM e ORDER BY event_type, day_idx
"""


def q_running_user_value(sf_dir: str):
    """Running per-user extremes of the event value — the cumulative
    window transform (ROWS UNBOUNDED PRECEDING) behind monotone
    feature engineering (peak-so-far, trough-so-far). One range sort by
    (user, ts, id); every interior key resolves with a vectorized
    per-block cummax/cummin; only the O(#blocks) boundary-straddling
    keys re-resolve on the driver (stages/temporal.running_extremes).
    No arithmetic — values pass through comparisons only, so float
    equality with the window oracle is exact."""
    import ray.data as rd

    from sigraph_ray.stages.temporal import running_extremes

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    out = running_extremes(ds, key="user_id", ts="ts",
                           tiebreak="event_id", value="value")
    pdf = out.to_pandas()[["event_id", "user_id", "value",
                           "run_max", "run_min"]]
    pdf["event_id"] = pdf["event_id"].astype("int64")
    pdf["user_id"] = pdf["user_id"].astype("int64")
    return pdf.sort_values("event_id").reset_index(drop=True)


SQL_RUNNING_USER_VALUE = """
SELECT event_id, user_id, value,
       max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_max,
       min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_min
FROM events ORDER BY event_id
"""


def q_name_jw_pairs(sf_dir: str):
    """Blocked Jaro-Winkler fuzzy-name join
    (stages/dedup.blocked_jaro_winkler_pairs): part-name pairs at
    jaro_winkler ≥ 0.8 within the same (brand, size) blocking cell —
    the record-linkage metric that rewards shared prefixes, next to
    the whole-edit-charging levenshtein join. The per-pair scorer is
    fuzz-verified value-identical to DuckDB (floor-halved
    transpositions, boost above 0.7, prefix cap 4)."""
    import ray.data as rd

    from sigraph_ray.stages.dedup import blocked_jaro_winkler_pairs

    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_brand",
                                  "p_size"])
    out = blocked_jaro_winkler_pairs(
        ds, id_col="p_partkey", text_col="p_name",
        block_cols=["p_brand", "p_size"], threshold=0.8).to_pandas()
    if out.empty:
        # Ray drops the schema of an all-empty map_groups output —
        # reassert the contract columns so a rowless result still
        # schema-matches the oracle (hit at sf0.001)
        out = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                            "id_b": pd.Series(dtype="int64"),
                            "jw": pd.Series(dtype="float64")})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


SQL_NAME_JW_PAIRS = """
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       jaro_winkler_similarity(a.p_name, b.p_name) AS jw
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8
ORDER BY 1, 2
"""


def q_approx_betweenness(sf_dir: str):
    """Sampled-source betweenness centrality
    (stages/graphalgo.approx_betweenness, Brandes–Pich) over the IP
    co-occurrence graph — which nodes bridge the most shortest paths.
    Rows-only by design (sampled approximation; the exact all-sources
    tier is pytest-gated against an independent textbook Brandes)."""
    import ray.data as rd

    from sigraph_ray.stages.collect import (sorted_collect,
                                            sorted_distinct,
                                            sorted_groupby_agg)
    from sigraph_ray.stages.graphalgo import approx_betweenness

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"]).filter(
            expr="event_type == 'purchase'")

    def to_pairs(t: pa.Table) -> pa.Table:
        eid = t.column("event_id")
        uid = t.column("user_id").cast(pa.string())
        ip = pc.binary_join_element_wise(
            "10.0.0.",
            pc.cast(pc.subtract(eid, pc.multiply(
                pc.divide(eid, 256), 256)), pa.string()), "")
        tid = pc.binary_join_element_wise("trace_", uid, "")
        return pa.table({"tid": tid, "ip": ip})

    pairs = sorted_distinct(
        ev.map_batches(to_pairs, batch_format="pyarrow"), ["tid", "ip"])
    per_trace = sorted_collect(pairs, key="tid", order_col="ip",
                               value="ip")

    def clique_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a_, b_ = [], []
        for vals in df["values"]:
            if len(vals) > 1:
                arr = np.asarray(vals)
                iu, iv = np.triu_indices(len(arr), 1)
                a_.append(arr[iu])
                b_.append(arr[iv])
        if not a_:
            return pd.DataFrame({"u": pd.Series(dtype="object"),
                                 "v": pd.Series(dtype="object"),
                                 "one": pd.Series(dtype="int64")})
        a = np.concatenate(a_)
        return pd.DataFrame({"u": a, "v": np.concatenate(b_),
                             "one": np.ones(len(a), dtype=np.int64)})

    und = sorted_groupby_agg(
        per_trace.map_batches(clique_pairs, batch_format="pandas"),
        key=["u", "v"], aggs={"cnt": ("one", "sum")})
    return approx_betweenness(und, n_sources=64, seed=7)


def q_event_forest_roots(sf_dir: str):
    """Forest ancestor resolution by pointer doubling
    (stages/graphalgo.pointer_double_roots): every node's root and
    depth in O(log depth) self-join rounds over a deterministic
    parent forest derived from event ids (parent = e-1-(e%16), roots
    at e%7==0 — acyclic since parent < node). The hierarchy-rollup /
    dependency-attribution primitive; the oracle walks the same forest
    top-down with a recursive CTE."""
    import ray.data as rd

    from sigraph_ray.stages.graphalgo import pointer_double_roots

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id"])

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        e = df["event_id"].astype("int64")
        cand = e - 1 - (e % 16)
        parent = cand.astype("Int64").where((e % 7 != 0) & (cand >= 0))
        return pd.DataFrame({"node": e, "parent": parent})

    out = pointer_double_roots(
        ds.map_batches(to_nodes, batch_format="pandas")).to_pandas()
    out["node"] = out["node"].astype("int64")
    out["root"] = out["root"].astype("int64")
    out["depth"] = out["depth"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


SQL_EVENT_FOREST_ROOTS = """
WITH RECURSIVE nodes AS (
  SELECT event_id AS node,
         CASE WHEN event_id % 7 = 0
                OR event_id - 1 - (event_id % 16) < 0
              THEN NULL
              ELSE event_id - 1 - (event_id % 16) END AS parent
  FROM events),
r AS (
  SELECT node, node AS root, 0 AS depth FROM nodes WHERE parent IS NULL
  UNION ALL
  SELECT n.node, r.root, r.depth + 1
  FROM nodes n JOIN r ON n.parent = r.node)
SELECT node, root, CAST(depth AS BIGINT) AS depth
FROM r ORDER BY node
"""
