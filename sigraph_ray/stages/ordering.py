"""Training-order operators — deterministic corpus shuffle, source
interleaving, and token-balanced shard planning.

A pretraining export needs a SINGLE global document order that is (a)
pseudo-random (no source/time clumping), (b) reproducible bit-for-bit
across reruns and parallelism levels, and (c) computable without a
driver-side pass over the corpus. All three operators here derive the
order from content hashes + the O(#blocks) prefix-sum stitch used by
``stages/packing.pack_sequences``: one range sort of a narrow key
table, a per-block scalar probe to the driver, then each block
independently emits its rows given its global starting offset. The
document TEXT never moves — only ids, hashes and counts.

Reference analog: the reference exports its graph/doc tables in sorted
deterministic order (src/db/schema.py bulk writers); the training-order
operators generalize that determinism to corpus-scale shuffling, the
standard practice for web-scale pretraining data (public practice:
hash-ordered "deterministic shuffle" in data-juicer / dolma-style
curation pipelines).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _md5_of(prefix: str, keys) -> list[str]:
    """md5 hex of f'{prefix}{key}' per key — matches DuckDB
    md5(prefix || CAST(key AS VARCHAR)) byte-for-byte."""
    p = prefix.encode("utf-8")
    return [hashlib.md5(p + str(k).encode("utf-8")).hexdigest()
            for k in keys]


def _global_positions(sorted_ds, make_out):
    """The O(#blocks) row-offset stitch: materialize an already
    globally-sorted Dataset, probe each block's (first-sort-key,
    n_rows), then emit per block with its global starting position.

    ``make_out(table, offset) -> pa.Table`` runs remotely per block.
    Blocks are ordered by the first row's (col0, col1) COMPOSITE — the
    full sort key, so block order is total whenever (col0, col1) is
    row-unique (true for (hash, id) and (rank, source) here); a
    single-column probe would tie across block boundaries."""
    import ray
    import ray.data as rd

    refs = sorted_ds.materialize().to_arrow_refs()

    @ray.remote
    def probe(t):
        if not t.num_rows:
            return None, 0
        return (t.column(0)[0].as_py(), t.column(1)[0].as_py()), \
            t.num_rows

    emit = ray.remote(make_out)
    probed = ray.get([probe.remote(r) for r in refs])
    pairs = sorted(
        ((fk, n, r) for (fk, n), r in zip(probed, refs) if fk is not None),
        key=lambda p: p[0])
    out_refs, offset = [], 0
    for _, n, r in pairs:
        out_refs.append(emit.remote(r, offset))
        offset += n
    if not out_refs:
        return None
    return rd.from_arrow_refs(out_refs)


def deterministic_shuffle(ds, *, key: str = "doc_id", seed: str = "s0",
                          keep_cols: list[str] | None = None):
    """Global deterministic corpus shuffle: position ``pos`` =
    rank of ``md5(seed || ':' || key)`` (ties by key). A pure function
    of (seed, key) — rerunning with the same seed yields the identical
    order at any block layout; a new seed is a fresh permutation.

    One range sort of the narrow (hash, key) projection + the row
    stitch. O(#blocks) scalars on the driver; nothing corpus-sized."""
    keep_cols = keep_cols or []
    pre = f"{seed}:"

    def hashed(t: pa.Table) -> pa.Table:
        cols = {"h": pa.array(_md5_of(pre, t.column(key).to_pylist()),
                              pa.string()),
                key: t.column(key)}
        for c in keep_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    sorted_ds = (ds.map_batches(hashed, batch_format="pyarrow")
                 .sort(["h", key]))

    def emit(t: pa.Table, offset: int) -> pa.Table:
        out = {"pos": pa.array(
            np.arange(offset, offset + t.num_rows, dtype=np.int64))}
        out[key] = t.column(key)
        for c in keep_cols:
            out[c] = t.column(c)
        return pa.table(out)

    out = _global_positions(sorted_ds, emit)
    if out is None:
        import ray.data as rd
        return rd.from_arrow(pa.table(
            {"pos": pa.array([], pa.int64()),
             key: pa.array([], pa.int64())}))
    return out


def interleave_sources(ds, *, key: str = "doc_id",
                       source: str = "source"):
    """Round-robin source interleaving: within each source, docs are
    ranked by ``md5(key)`` (the per-source deterministic shuffle);
    globally, docs are ordered by (rank, source) — rank-0 docs of every
    source first, then rank-1, ... — so a sequential reader sees the
    sources interleaved ~uniformly even when one source dominates
    (the curriculum/mixing guarantee a streaming trainer needs).

    Two narrow range sorts + two O(#blocks) stitches: per-source ranks
    come from a (source, hash) sort with a per-block {source: count}
    probe (#sources × #blocks scalars on the driver), then the global
    position from the (rank, source) sort with the row stitch."""
    import ray
    import ray.data as rd

    def hashed(t: pa.Table) -> pa.Table:
        return pa.table({
            source: t.column(source),
            "h": pa.array(_md5_of("", t.column(key).to_pylist()),
                          pa.string()),
            key: t.column(key)})

    by_src = (ds.map_batches(hashed, batch_format="pyarrow")
              .sort([source, "h", key]).materialize())
    refs = by_src.to_arrow_refs()

    @ray.remote
    def probe(t):
        if not t.num_rows:
            return None, {}
        src = t.column(source).to_pylist()
        counts: dict = {}
        for s in src:
            counts[s] = counts.get(s, 0) + 1
        # composite (source, hash) first-row key: the sort key prefix,
        # row-unique, so block order is total (source alone ties —
        # a source spans many blocks)
        return (src[0], t.column("h")[0].as_py()), counts

    @ray.remote
    def rank_block(t, offsets: dict):
        if not t.num_rows:
            return pa.table({"rank": pa.array([], pa.int64()),
                             source: pa.array([], pa.string()),
                             key: pa.array([], pa.int64())})
        src = np.asarray(t.column(source).to_pylist(), dtype=object)
        # local rank within each source run: positions are contiguous
        # (block is sorted by source), so rank = idx - run_start + base
        idx = np.arange(len(src), dtype=np.int64)
        change = np.concatenate(([True], src[1:] != src[:-1]))
        run_start = idx[change]
        run_id = np.cumsum(change) - 1
        base = np.asarray([offsets.get(s, 0) for s in src[change]],
                          dtype=np.int64)
        rank = idx - run_start[run_id] + base[run_id]
        return pa.table({"rank": pa.array(rank),
                         source: t.column(source),
                         key: t.column(key)})

    probed = ray.get([probe.remote(r) for r in refs])
    pairs = sorted(
        ((fk, cnt, r) for (fk, cnt), r in zip(probed, refs)
         if fk is not None),
        key=lambda p: p[0])
    seen: dict = {}
    ranked_refs = []
    for _, cnt, r in pairs:
        ranked_refs.append(rank_block.remote(r, dict(seen)))
        for s, n in cnt.items():
            seen[s] = seen.get(s, 0) + n
    if not ranked_refs:
        return rd.from_arrow(pa.table(
            {"pos": pa.array([], pa.int64()),
             key: pa.array([], pa.int64()),
             source: pa.array([], pa.string())}))

    ranked = rd.from_arrow_refs(ranked_refs).sort(["rank", source])

    def emit(t: pa.Table, offset: int) -> pa.Table:
        return pa.table({
            "pos": pa.array(np.arange(offset, offset + t.num_rows,
                                      dtype=np.int64)),
            key: t.column(key),
            source: t.column(source)})

    out = _global_positions(ranked, emit)
    if out is None:
        return rd.from_arrow(pa.table(
            {"pos": pa.array([], pa.int64()),
             key: pa.array([], pa.int64()),
             source: pa.array([], pa.string())}))
    return out


def shard_plan(ds, *, budget: int = 4096, id_col: str = "doc_id",
               text_col: str = "text"):
    """Token-balanced shard planning: assign each document (whole) to
    training shard ``floor(tokens_before_it / budget)`` over the
    ``id_col``-ordered concatenation — contiguous shards of ~``budget``
    tokens each (docs are never split; a shard may overflow by at most
    one document, the standard writer-side plan). Output
    ``(doc_id, n_tokens, shard)``.

    Same prefix-sum stitch as packing: only (id, token-count) moves."""
    import ray.data as rd

    def count(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pc.cast(pc.count_substring_regex(
                t.column(text_col), r"\S+"), pa.int64())})

    counts = ds.map_batches(count, batch_format="pyarrow").sort(id_col)

    import ray

    refs = counts.materialize().to_arrow_refs()

    @ray.remote
    def probe(t):
        if not t.num_rows:
            return None, 0
        return (t.column(id_col)[0].as_py(),
                int(pa.compute.sum(t.column("n_tokens")).as_py() or 0))

    @ray.remote
    def emit(t, offset: int):
        n = t.column("n_tokens").to_numpy()
        before = offset + np.concatenate(([0], np.cumsum(n)[:-1])) \
            if len(n) else np.empty(0, np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": t.column("n_tokens"),
            "shard": pa.array((before // budget).astype(np.int64))})

    probed = ray.get([probe.remote(r) for r in refs])
    pairs = sorted(
        ((fk, tot, r) for (fk, tot), r in zip(probed, refs)
         if fk is not None),
        key=lambda p: p[0])
    out_refs, offset = [], 0
    for _, tot, r in pairs:
        out_refs.append(emit.remote(r, offset))
        offset += tot
    if not out_refs:
        return rd.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64()),
             "shard": pa.array([], pa.int64())}))
    return rd.from_arrow_refs(out_refs)
