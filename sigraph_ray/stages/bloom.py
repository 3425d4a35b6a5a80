"""Bloom-prefiltered SEMI / ANTI join — the scale tier between
``joins.broadcast_semi_anti`` (exact key set broadcast; bounded by the
probe key set fitting the object store as one array) and a full
two-sided hash-join shuffle (every row of both sides moves).

Semantics are EXACT — the Bloom filter is only a prefilter, so this
shares its SQL oracle with the plain semi/anti join:

1. **Build** — every right-side block folds its keys into one fixed-size
   bitmap (``m_bits``; k positions via splitmix64 re-mixes of a stable
   64-bit value hash). Partials merge by bitwise OR — associative and
   layout-independent — so the driver stitch is O(#blocks × m_bits/8)
   bytes, the same bounded-stitch class as the HLL/CMS sketches, and the
   merged bitmap is ``ray.put`` once (never re-shipped per batch).
2. **Probe** — each left block tests membership vectorized; Bloom
   NEGATIVES are definite non-members (zero false negatives), so for a
   SEMI join they are dropped immediately and for an ANTI join they are
   emitted immediately — in both cases WITHOUT ever entering a shuffle.
3. **Verify** — only the Bloom-POSITIVE survivors (true members plus
   ~(1-e^{-kn/m})^k false positives) are exact-checked with one hash
   join against the deduplicated right key set.

At 100 TB this turns "shuffle every left row" into "shuffle the
matching fraction + ε": with m_bits sized ≥ ~10 bits/key the false-
positive rate is <1 %, so a 1 %-selectivity semi-join moves ~2 % of the
left side instead of 100 %. The bitmap cost is fixed and small
(default 2^23 bits = 1 MiB) regardless of data size; raise ``m_bits``
with the right-side key cardinality (~1.2·n·k/ln2 bits for target fp).

Reference analog: none — the reference's only membership filters are
Neo4j index point-reads (`element_behavior.py`); this is a batch
re-expression of the same "is this key in the set" primitive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from sigraph_ray.functions import hashing as H
from sigraph_ray.stages.joins import column_type, safe_join

# fixed odd mixing seeds, one per hash function (constants → partials
# built on any worker merge exactly)
_BLOOM_SEEDS = np.array([0xA24BAED4963EE407, 0x9FB21C651E98DF25,
                         0xD6E8FEB86659FD93, 0xCA5A826395121157,
                         0x8CB92BA72F3D8DD7, 0xABCB39463EAE5603],
                        dtype=np.uint64)


def _positions(series: pd.Series, k: int, m_bits: int) -> np.ndarray:
    """(k, n) bit positions for each value — stable across processes."""
    h = pd.util.hash_pandas_object(series, index=False) \
        .to_numpy().astype(np.uint64)
    return np.stack([
        (H.splitmix64(h ^ _BLOOM_SEEDS[i]) % np.uint64(m_bits))
        .astype(np.int64)
        for i in range(k)
    ])


def _build_bitmap(right, right_key: str, k: int, m_bits: int):
    words = m_bits // 64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(words, dtype=np.uint64)
        if len(df):
            pos = _positions(df[right_key], k, m_bits).ravel()
            np.bitwise_or.at(bits, pos >> 6,
                             np.uint64(1) << (pos.astype(np.uint64)
                                              & np.uint64(63)))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # tree-combine level (OR is associative): driver folds
        # O(#blocks/64) bitmaps even at extreme block counts
        acc = np.zeros(words, dtype=np.uint64)
        for b in df["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint64)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    merged = np.zeros(words, dtype=np.uint64)
    for row in (right.map_batches(partial, batch_format="pandas",
                                  batch_size=None)
                .map_batches(merge, batch_format="pandas",
                             batch_size=64).take_all()):
        merged |= np.frombuffer(row["bits"], dtype=np.uint64)
    return merged


def bloom_semi_anti(left, right, *, left_key: str, right_key: str,
                    anti: bool = False, m_bits: int = 1 << 23,
                    k: int = 4, num_partitions: int = 16):
    """Exact SEMI (``anti=False``) / ANTI (``anti=True``) join of
    ``left`` against ``right``'s key set, Bloom-prefiltered so only
    Bloom-positive left rows reach the verification shuffle."""
    import ray

    from sigraph_ray.stages.collect import sorted_distinct

    bits_ref = ray.put(_build_bitmap(right, right_key, k, m_bits))

    def probe(df: pd.DataFrame, *, keep_positive: bool) -> pd.DataFrame:
        if not len(df):
            return df
        bits = ray.get(bits_ref)
        pos = _positions(df[left_key], k, m_bits)
        hit = np.ones(len(df), dtype=bool)
        for i in range(k):
            hit &= (bits[pos[i] >> 6]
                    >> (pos[i].astype(np.uint64) & np.uint64(63))
                    ).astype(np.uint64) & np.uint64(1) > 0
        return df[hit] if keep_positive else df[~hit]

    survivors = left.map_batches(
        lambda df: probe(df, keep_positive=True),
        batch_format="pandas").materialize()

    keys = sorted_distinct(right, [right_key])
    if right_key != left_key:
        keys = keys.map_batches(
            lambda t: t.rename_columns([left_key]),
            batch_format="pyarrow")
    key_type = column_type(right, right_key)
    left_schema = left.schema().base_schema
    if not isinstance(left_schema, pa.Schema):
        # pandas-block datasets report a pandas schema; reconstruct an
        # Arrow one so sparse/filtered blocks are normalized before the
        # Acero join (see joins.py module docstring)
        left_schema = pa.schema(
            [(n, column_type(left, n)) for n in left.schema().names])

    # an ENTIRELY empty survivor set never delivers a schema to the
    # hash-shuffle aggregators (hash_shuffle early-return; joins.py
    # docstring) — and needs no verify join anyway: semi = nothing,
    # anti = every Bloom-negative row
    if survivors.count() == 0:
        import ray.data as rd

        if anti:
            return left.map_batches(
                lambda df: probe(df, keep_positive=False),
                batch_format="pandas")
        return rd.from_arrow(left_schema.empty_table()) \
            if left_schema is not None else survivors

    if not anti:
        return safe_join(
            survivors, keys, "left_semi", num_partitions, on=(left_key,),
            left_schema=left_schema,
            right_schema=pa.schema([(left_key, key_type)]))

    negatives = left.map_batches(
        lambda df: probe(df, keep_positive=False), batch_format="pandas")
    false_pos = safe_join(
        survivors, keys, "left_anti", num_partitions, on=(left_key,),
        left_schema=left_schema,
        right_schema=pa.schema([(left_key, key_type)]))
    return negatives.union(false_pos)
