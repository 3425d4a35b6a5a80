"""Join-input hygiene for Ray Data hash joins.

Ray's hash-join aggregators (ray/data/_internal/execution/operators/
join.py) concatenate the partition shards they receive and hand the
result straight to the Acero ``Table.join`` kernel. Sort/groupby
outputs at small-per-partition cardinality legitimately contain EMPTY
blocks whose columns are typed ``null`` (or carry no schema at all);
when every shard of a hash partition comes from such a block, the
aggregator builds a schema-less partition and Acero fails with
``No match or multiple matches for key field reference …``.

Worse, the shuffle map task RETURNS EARLY for an empty input block
(hash_shuffle.py:223-225) — even when that block was the designated
schema-broadcast carrier — so a sparse dataset whose first block is
empty never delivers its schema to the aggregators at all.

:func:`typed` fixes both: it normalizes every batch to one explicit
Arrow schema (adding missing columns as nulls, casting null-typed
columns) AND coalesces across blocks (``batch_size``) so the output
contains no empty blocks. Apply it to any join input that can be
sparse relative to the partition count — cheap (a cast per batch) and
deterministic.
"""

from __future__ import annotations

import pyarrow as pa


def column_type(ds, col: str) -> pa.DataType:
    """Arrow type of one column, tolerant of pandas-block datasets
    (object dtype → string)."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base.field(col).type
    i = list(base.names).index(col)
    try:
        return pa.from_numpy_dtype(base.types[i])
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()


def typed(ds, schema: pa.Schema, *, batch_size: int = 65536):
    """Cast ``ds`` to ``schema`` (missing columns become all-null,
    null-typed empties become typed) and coalesce away empty blocks
    (see module docstring)."""
    def f(t: pa.Table) -> pa.Table:
        cols = {}
        for field in schema:
            if field.name in t.column_names:
                cols[field.name] = t.column(field.name)
            else:
                cols[field.name] = pa.nulls(t.num_rows, field.type)
        return pa.table(cols).cast(schema)
    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def _aggregator_args(num_partitions: int) -> dict:
    """Cap one join's aggregator pool at ~1/8 of cluster CPUs.

    Ray's default gives every hash-join pool CPU/2; two pools alive at
    once (e.g. the two label-propagation joins of one connected-
    components round, or one pool draining while the next starts)
    then reserve every CPU and the upstream map tasks starve,
    deadlocking the pipeline (observed at 4 CPUs; the arithmetic is
    proportional, so the same holds on any cluster size)."""
    import ray

    try:
        cpus = ray.cluster_resources().get("CPU") or 8
    except Exception:  # not initialised (e.g. schema-only planning)
        cpus = 8
    per = max(0.01, (cpus / 8.0) / num_partitions)
    return {"num_cpus": per, "scheduling_strategy": "SPREAD"}


def safe_join(left, right, join_type: str, num_partitions: int,
              on, *, left_schema: pa.Schema | None,
              right_schema: pa.Schema | None, right_on=None):
    """``Dataset.join`` with inputs schema-normalized (see module
    docstring) and a bounded aggregator pool. Pass ``None`` to skip
    normalization for a side whose blocks are known well-typed (e.g. a
    materialized dense table)."""
    if left_schema is not None:
        left = typed(left, left_schema)
    if right_schema is not None:
        right = typed(right, right_schema)
    return left.join(right, join_type, num_partitions,
                     on=on, right_on=right_on,
                     aggregator_ray_remote_args=_aggregator_args(
                         num_partitions))


def sorted_merge_join(left, right, *, on, left_cols: list[str],
                      right_cols: list[str], how: str = "inner"):
    """Large×large EQUI-join on the sorted-stitch skeleton
    (stages/collect): union the two side-tagged streams, ONE range sort
    by the join key, a vectorized per-block ``pandas.merge`` for keys
    fully interior to a block, and a driver-side merge of only the
    O(#blocks) boundary KEYS' rows.

    Why it exists next to :func:`safe_join`: Ray's hash join spins an
    aggregator actor pool per join (~15-20 s fixed at 32 cpus even for
    kilobyte tables — measured, BASELINE.md), which dominates mid-size
    fact⨝fact joins; the merge join pays one range sort instead and
    reuses the stitch machinery every other wide op here runs on. At
    100 TB both tiers remain: hash join for unbounded-fan-out keys,
    merge join when per-key row counts are bounded.

    Partitioning assumption (documented per the brief): the rows of one
    join key across BOTH sides fit in a worker block plus the boundary
    fragments — true for bounded-fan-out foreign-key joins (an order
    has ≤7 line items; a doc has bounded chunks). For unbounded keys
    use :func:`safe_join`.

    ``on`` is the key column (or list) present on both sides;
    ``left_cols`` / ``right_cols`` are the NON-key payload columns to
    carry (must be disjoint names). ``how`` is ``inner`` or ``left``.
    Output columns: keys + left_cols + right_cols; row order is
    unspecified (sort downstream if needed).
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    if how not in ("inner", "left"):
        raise ValueError(how)
    keys = [on] if isinstance(on, str) else list(on)
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")

    # union schema: keys typed from the left side, payloads from their
    # own side; the other side's payload columns ride along as nulls
    fields = [pa.field(k, column_type(left, k)) for k in keys]
    fields += [pa.field(c, column_type(left, c)) for c in left_cols]
    fields += [pa.field(c, column_type(right, c)) for c in right_cols]
    fields += [pa.field("_side", pa.int8())]
    schema = pa.schema(fields)

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_side", pa.array(np.full(t.num_rows, side, dtype=np.int8)))
        return f

    tagged = typed(
        left.select_columns(keys + left_cols)
        .map_batches(tag(0), batch_format="pyarrow"), schema).union(
        typed(right.select_columns(keys + right_cols)
              .map_batches(tag(1), batch_format="pyarrow"), schema))

    out_cols = keys + left_cols + right_cols

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = {c: pd.Series(dtype="object") for c in out_cols}
            out["_side"] = pd.Series(dtype="int8")
            out["_raw"] = pd.Series(dtype="bool")
            return pd.DataFrame(out)
        kf = df[keys]
        is_bound = ((kf == kf.iloc[0]).all(axis=1)
                    | (kf == kf.iloc[-1]).all(axis=1)).to_numpy()
        raw = df[is_bound].copy()
        raw["_raw"] = True
        inner = df[~is_bound]
        lhs = inner[inner["_side"] == 0][keys + left_cols]
        rhs = inner[inner["_side"] == 1][keys + right_cols]
        joined = lhs.merge(rhs, on=keys, how=how)
        joined["_side"] = np.int8(-1)
        joined["_raw"] = False
        return pd.concat([joined[out_cols + ["_side", "_raw"]],
                          raw[out_cols + ["_side", "_raw"]]],
                         ignore_index=True)

    parts = tagged.sort(keys).map_batches(
        per_block, batch_format="pandas", batch_size=None)
    # pin the interior/boundary split (re-executing the sort can move
    # a key across the split; same rule as sorted_collect)
    parts = parts.materialize()
    interior = parts.filter(expr="_raw == False").map_batches(
        lambda df: df[out_cols], batch_format="pandas")
    bdf = parts.filter(expr="_raw == True").to_pandas()
    if len(bdf):
        # fragments concatenate exactly (each physical row lives in ONE
        # block, so no cross-block dedup — duplicate rows must each join)
        lhs = bdf[bdf["_side"] == 0][keys + left_cols]
        rhs = bdf[bdf["_side"] == 1][keys + right_cols]
        merged = lhs.merge(rhs, on=keys, how=how)[out_cols]
    else:
        merged = pd.DataFrame({c: pd.Series(dtype="object")
                               for c in out_cols})
    return interior.union(
        rd.from_pandas(merged).map_batches(lambda df: df,
                                           batch_format="pandas"))


def broadcast_semi_anti(left, right, *, left_key: str, right_key: str,
                        anti: bool = False):
    """Broadcast SEMI (``anti=False``) or ANTI (``anti=True``) join:
    keep left rows whose key does / does not appear in ``right``.

    The probe side is reduced to its DISTINCT key set first
    (``sorted_distinct`` — one range sort, vectorized per-block dedup),
    sorted into one numpy array, ``ray.put`` once, and membership-tested
    per batch with a zero-copy ``searchsorted``. Bound, documented per
    the brief: the probe side's DISTINCT key set must fit the object
    store as one array (10⁹ int64 keys = 8 GB — fine for dimension /
    id-set probes at 100 TB); beyond that, hash-partition both sides
    and run the per-partition anti locally instead."""
    import numpy as np
    import ray

    from sigraph_ray.stages.collect import sorted_distinct

    kdf = sorted_distinct(right, [right_key]).to_pandas()
    # an empty probe side comes back schema-less from the stitch
    keys = (kdf[right_key].to_numpy() if right_key in kdf.columns
            else np.empty(0))
    keys_ref = ray.put(np.sort(keys))

    def probe(df):
        ks = ray.get(keys_ref)
        if len(ks) == 0:
            hit = np.zeros(len(df), dtype=bool)
        else:
            v = df[left_key].to_numpy()
            hit = ks[np.searchsorted(ks, v).clip(max=len(ks) - 1)] == v
        return df[~hit] if anti else df[hit]

    return left.map_batches(probe, batch_format="pandas")


def salted_merge_join(left, right, *, on: str, left_cols: list[str],
                      right_cols: list[str], salt_col: str,
                      buckets: int = 8, hot_keys=None):
    """Skew-treated equi-join — the salting tier that repairs
    :func:`sorted_merge_join`'s bounded-fan-out assumption when the
    LEFT side has hot keys (a per-source enrichment join where one
    source holds 30% of the corpus; the hot keys come straight from
    ``stages/profile.key_skew``). Standard replicate-salt scheme:

    - left rows of a hot key get a deterministic salt
      ``splitmix64(salt_col) % buckets`` (PYTHONHASHSEED-independent,
      so any block layout salts a row identically);
    - right rows of a hot key are REPLICATED once per bucket (the
      right side per hot key is small — here it's one aggregate row);
    - one :func:`sorted_merge_join` on the composite ``(on, _salt)``
      key, whose per-key fan-out is now ≤ hot-key-rows / buckets.

    ``hot_keys=None`` salts every key (right side replicated
    ``buckets`` ×) — the safe default when the right side is a small
    per-key aggregate. The result equals the unsalted join for ANY
    bucket count (property-tested)."""
    import numpy as np
    import pandas as pd

    from sigraph_ray.functions.hashing import splitmix64

    hot = set(hot_keys) if hot_keys is not None else None

    def salt_left(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df = df.copy()
            df["_salt"] = pd.Series(dtype="int64")
            return df
        h = splitmix64(
            pd.util.hash_pandas_object(
                df[salt_col].reset_index(drop=True), index=False)
            .to_numpy().astype(np.uint64))
        s = (h % np.uint64(buckets)).astype(np.int64)
        if hot is not None:
            s = np.where(df[on].isin(hot).to_numpy(), s, 0)
        df = df.copy()
        df["_salt"] = s
        return df

    def replicate_right(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df = df.copy()
            df["_salt"] = pd.Series(dtype="int64")
            return df
        reps = np.full(len(df), buckets, dtype=np.int64)
        if hot is not None:
            reps = np.where(df[on].isin(hot).to_numpy(), reps, 1)
        out = df.loc[df.index.repeat(reps)].copy()
        out["_salt"] = np.concatenate(
            [np.arange(r, dtype=np.int64) for r in reps])
        return out

    joined = sorted_merge_join(
        left.map_batches(salt_left, batch_format="pandas"),
        right.map_batches(replicate_right, batch_format="pandas"),
        on=[on, "_salt"], left_cols=left_cols, right_cols=right_cols)
    return joined.map_batches(
        lambda df: df.drop(columns=["_salt"]), batch_format="pandas")
