"""Data-size-proportional block sizing for shuffle inputs.

Every Ray Data wide op (sort / groupby-aggregate / repartition) runs a
map-blocks × reduce-partitions exchange whose task count follows the
INPUT block count — so a stream that arrives in many near-empty blocks
(e.g. a 64-block read of a 3 MB table under a cluster-sized
``read_op_min_num_blocks``) pays a full-width shuffle of almost nothing,
once per consumer. ``right_size`` coalesces a MATERIALIZED dataset to
~``target_block_bytes`` blocks before its consumers fan out, clamped so
big data keeps cluster-wide parallelism: at 100 TB the same rule yields
thousands of blocks, so this is scale-proportional sizing, not a
small-data special case.
"""

from __future__ import annotations

# 16 MB: small enough that a mid-size combiner-output stream still
# spreads across a whole node's cores for the downstream sort, large
# enough that per-task overhead stays negligible. (64 MB coalesced a
# 330 MB sort input to 6 blocks and the sort ran on 6 of 32 cpus.)
TARGET_BLOCK_BYTES = 16 << 20


def right_size(ds, *, target_block_bytes: int = TARGET_BLOCK_BYTES,
               min_blocks: int = 8, max_blocks: int = 8192):
    """Coalesce a materialized dataset to a byte-proportional block
    count. No-op (returns ``ds``) when the current block count is
    already within 2× of the target — a repartition is itself an
    exchange, only worth paying when it removes a larger one
    downstream. The result is materialized (block metadata known, safe
    to fan out to several consumers)."""
    try:
        nbytes = ds.size_bytes()
        nblocks = ds.num_blocks()
    except Exception:
        return ds
    if not nblocks or nbytes is None:
        # unknown size must NOT read as 0 bytes — that would coalesce
        # a large dataset to min_blocks and serialize its consumers
        return ds
    target = max(min_blocks,
                 min(max_blocks, nbytes // target_block_bytes + 1))
    if nblocks <= target * 2:
        return ds
    return ds.repartition(int(target)).materialize()
