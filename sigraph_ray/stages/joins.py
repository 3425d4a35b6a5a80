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
