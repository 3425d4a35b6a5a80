"""Per-partition lineage manifest + resumable stage output (SURVEY.md
§4.2 "Checkpoint / resume").

The reference has NO checkpointing — durability is delegated to
Neo4j/OpenSearch and a failed request is simply lost (exceptions
swallowed at src/graph/graph_session.py:128-132). The north rule
requires the opposite: every partition emits a lineage record and a
restarted job skips completed partitions.

Layout (one directory per stage):

    out/<stage>/part-<idx>/…parquet       (atomic: tmp dir + rename)
    out/<stage>/_manifest/part-<idx>.json (lineage record, written last)

A partition is complete iff its manifest record exists — the record is
written only after the data rename succeeds, so a crash mid-write
leaves either nothing or an orphan tmp dir (ignored and overwritten on
retry). Lineage record fields: partition id, input description, row
count, byte size, wall seconds, content hash (order-insensitive
row-hash xor — stable across block orders), engine version.

Partition identity is CONTENT-derived on the scale path: pass
``key=<column>`` to ``write_stage`` and rows are hash-assigned to
partitions by that key, so the same row reaches the same partition on
every run even though the streaming executor delivers blocks in
completion order (``preserve_order=False``); workers write their own
partitions. The key-less mode is positional and forces
``preserve_order=True`` for the duration of the write. Both modes
re-verify an existing partition's content hash before skipping it.

Resume = rerun the same ``write_stage``: completed partitions are
skipped by manifest lookup; only missing partitions execute
(stage-granular resume; mid-shuffle resume works by materializing the
pre-shuffle stage through this writer, then re-running the shuffle over
the completed stage directory — SURVEY.md §4.2).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from sigraph_ray import __version__


def _content_hash(table: pa.Table) -> str:
    """Order-insensitive 64-bit content hash: xor of per-row hashes of
    the column-sorted table (identical for any row/block order)."""
    import numpy as np

    df = table.select(sorted(table.column_names)).to_pandas()
    h = pd.util.hash_pandas_object(df.astype(str), index=False).to_numpy()
    return format(int(np.bitwise_xor.reduce(h.astype(np.uint64))), "016x") \
        if len(h) else "0" * 16


def partition_done(stage_dir: str, part: int) -> bool:
    return os.path.exists(os.path.join(stage_dir, "_manifest",
                                       f"part-{part:05d}.json"))


def write_partition(stage_dir: str, part: int, table: pa.Table,
                    input_desc: str = "") -> dict:
    """Atomically write one partition + its lineage record.
    Returns the record. Skips (returning the existing record) if the
    partition is already complete."""
    man_dir = os.path.join(stage_dir, "_manifest")
    os.makedirs(man_dir, exist_ok=True)
    man_path = os.path.join(man_dir, f"part-{part:05d}.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            rec = json.load(f)
        rec["skipped"] = True   # in-memory marker only, never persisted
        return rec

    final_dir = os.path.join(stage_dir, f"part-{part:05d}")
    tmp_dir = final_dir + ".tmp"
    t0 = time.time()
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    pq.write_table(table, os.path.join(tmp_dir, "data.parquet"))
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.rename(tmp_dir, final_dir)

    record = {
        "partition": part,
        "input": input_desc,
        "rows": table.num_rows,
        "bytes": table.nbytes,
        "wall_s": round(time.time() - t0, 4),
        "content_hash": _content_hash(table),
        "engine_version": __version__,
        "completed_at_unix": int(time.time()),
    }
    tmp_man = man_path + ".tmp"
    with open(tmp_man, "w") as f:
        json.dump(record, f)
    os.rename(tmp_man, man_path)
    return record


def write_stage(ds, stage_dir: str, *, input_desc: str = "",
                key: str | None = None, num_partitions: int = 32,
                verify: bool = True) -> list[dict]:
    """Write a Dataset as a resumable stage, skipping partitions already
    recorded in the manifest. Two modes:

    - ``key=<column>`` (the scale path): partition id =
      ``stable_hash(key) % num_partitions`` — a pure function of row
      CONTENT, so the same row lands in the same partition on every
      run regardless of block arrival order, and each partition is
      written BY A WORKER (``groupby(part).map_groups``; the driver
      only collects the tiny lineage records). This is what makes
      skip-on-resume sound under ``preserve_order=False``.
    - ``key=None`` (ordered mode, small stages): partitions follow
      stream position, and ``preserve_order`` is FORCED on for the
      duration of the write — under the default out-of-order streaming
      execution a partition index could otherwise hold different rows
      across runs, silently dropping/duplicating rows on resume.

    In both modes a partition that already has a manifest record is
    re-verified against the freshly computed content hash when
    ``verify`` (the upstream recompute already produced the rows);
    a mismatch (changed input) rewrites instead of skipping.
    Returns all lineage records (existing + new)."""
    os.makedirs(stage_dir, exist_ok=True)
    if key is not None:
        return _write_stage_keyed(ds, stage_dir, key=key,
                                  num_partitions=num_partitions,
                                  input_desc=input_desc, verify=verify)

    # A Dataset captures its own DataContext COPY at creation
    # (Dataset.context → self._plan._context), so flipping the global
    # DataContext here would not affect an already-constructed ``ds`` —
    # the flag must be set on the dataset's own context (observed: with
    # only the global flag set, partition contents shifted across runs
    # under full-suite CPU pressure).
    ctx = ds.context
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        # Deterministic positional partitions: block boundaries under the
        # streaming executor can shift run-to-run (dynamic block splitting
        # under memory/CPU pressure) even with preserve_order=True, which
        # would make a block-based "partition i" hold different rows across
        # runs and defeat skip-on-resume. Instead the row stream is
        # re-chunked by an EXACT row count (iter_batches with a concrete
        # batch_size yields exactly-sized batches regardless of block
        # layout), so partition i = rows [i*B, (i+1)*B) of the preserved
        # order — a pure function of the input. The count() pre-pass is the
        # documented cost of the key-less mode (small stages only; the
        # scale path is key=<column>).
        n = ds.count()
        bsize = max(1, -(-n // max(1, num_partitions)))
        records = []
        for part, batch in enumerate(
                ds.iter_batches(batch_format="pyarrow", batch_size=bsize)):
            records.append(
                _write_or_verify(stage_dir, part, batch, input_desc, verify))
        return records
    finally:
        ctx.execution_options.preserve_order = prev


def _write_or_verify(stage_dir: str, part: int, table: pa.Table,
                     input_desc: str, verify: bool) -> dict:
    if partition_done(stage_dir, part):
        rec = read_record(stage_dir, part)
        if not verify or rec["content_hash"] == _content_hash(table):
            rec["skipped"] = True   # in-memory marker only
            return rec
        # stale partition (input changed or prior run had a different
        # row→partition assignment): rewrite
        os.remove(os.path.join(stage_dir, "_manifest",
                               f"part-{part:05d}.json"))
    return write_partition(stage_dir, part, table, input_desc)


def _write_stage_keyed(ds, stage_dir: str, *, key: str,
                       num_partitions: int, input_desc: str,
                       verify: bool) -> list[dict]:
    import numpy as np

    from sigraph_ray.functions.hashing import splitmix64

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            df[key].astype(str), index=False).to_numpy()
        df = df.copy()
        # fixed-key siphash + splitmix64: identical across processes
        # and runs (PYTHONHASHSEED-independent)
        df["__part_id"] = (splitmix64(h.astype(np.uint64))
                           % np.uint64(num_partitions)).astype(np.int64)
        return df

    def write_group(group: pa.Table) -> pa.Table:
        part = int(group.column("__part_id")[0].as_py())
        table = group.drop_columns(["__part_id"])
        rec = _write_or_verify(stage_dir, part, table, input_desc, verify)
        return pa.table({"record": [json.dumps(rec)]})

    recs = (ds.map_batches(assign, batch_format="pandas")
            .groupby("__part_id")
            .map_groups(write_group, batch_format="pyarrow")
            .to_pandas())
    return sorted((json.loads(r) for r in recs["record"]),
                  key=lambda r: r["partition"])


def read_record(stage_dir: str, part: int) -> dict:
    with open(os.path.join(stage_dir, "_manifest",
                           f"part-{part:05d}.json")) as f:
        return json.load(f)


def read_stage(stage_dir: str):
    """Load a completed stage directory as a Dataset (only partitions
    with manifest records)."""
    import ray.data as rd

    parts = sorted(
        p for p in os.listdir(os.path.join(stage_dir, "_manifest"))
        if p.endswith(".json"))
    paths = [os.path.join(stage_dir, p[:-5], "data.parquet") for p in parts]
    return rd.read_parquet(paths)


def stage_summary(stage_dir: str) -> dict:
    """Aggregate counters across partition records (the batch analog of
    the reference's SigraphSummary, element.py:442-455 / U6)."""
    man_dir = os.path.join(stage_dir, "_manifest")
    total = {"partitions": 0, "rows": 0, "bytes": 0, "wall_s": 0.0}
    for p in sorted(os.listdir(man_dir)):
        if not p.endswith(".json"):
            continue
        with open(os.path.join(man_dir, p)) as f:
            r = json.load(f)
        total["partitions"] += 1
        total["rows"] += r["rows"]
        total["bytes"] += r["bytes"]
        total["wall_s"] += r["wall_s"]
    return total
