"""Sequence packing — map every document onto fixed-length training
sequences formed by concatenating the corpus in ``doc_id`` order and
slicing every ``max_tokens`` tokens (the standard GPT-style pretraining
packing; public practice). Output is the doc→sequence span table: one
row per (document, sequence) overlap with the in-document offset and
the number of tokens the document contributes to that sequence.

Deterministic and layout-independent by construction: spans are pure
arithmetic on the global token prefix-sum in ``doc_id`` order, so any
block layout / parallelism level yields byte-identical output (unlike
per-block greedy bin packing, whose bins depend on block boundaries).

Distributed shape (the prefix-sum stitch, same class as
``stages/collect``): one range sort of the tiny ``(doc_id, n_tokens)``
table, a per-block token-total probe (one scalar per block to the
driver — O(#blocks)), then each block independently emits its spans
given its global starting offset. The document TEXT never moves — only
token counts — so the wide input is read once with ``columns=`` pruning
and nothing corpus-sized ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_sequences(ds, *, max_tokens: int = 512,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Return a Dataset of ``(doc_id, seq_id, doc_offset, n_tokens)``
    spans: document ``doc_id`` contributes ``n_tokens`` tokens starting
    at its own ``doc_offset`` to training sequence ``seq_id``.
    Zero-token documents contribute nothing and are excluded."""
    import ray

    def count(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            id_col: t.column(id_col),
            "n": pc.cast(pc.count_substring_regex(
                t.column(text_col), r"\S+"), pa.int64()),
        })

    counts = (ds.map_batches(count, batch_format="pyarrow")
              .sort(id_col).materialize())
    refs = counts.to_arrow_refs()

    @ray.remote
    def block_total(t):
        return (int(t.column(id_col)[0].as_py()) if t.num_rows else None,
                int(pa.compute.sum(t.column("n")).as_py() or 0))

    @ray.remote
    def emit(t, offset: int):
        n = t.column("n").to_numpy()
        doc = t.column(id_col).to_numpy()
        keep = n > 0
        n, doc = n[keep], doc[keep]
        start = offset + np.concatenate(([0], np.cumsum(n)[:-1]))
        first = start // max_tokens
        last = (start + n - 1) // max_tokens
        reps = (last - first + 1).astype(np.int64)
        doc_r = np.repeat(doc, reps)
        start_r = np.repeat(start, reps)
        n_r = np.repeat(n, reps)
        # per-doc sequence index ranges, flattened (vectorized
        # repeat+ramp — no Python loop over documents)
        ramp = (np.arange(int(reps.sum()))
                - np.repeat(np.concatenate(([0], np.cumsum(reps)[:-1])),
                            reps)) if len(reps) else np.empty(0, np.int64)
        seq = np.repeat(first, reps) + ramp
        lo = np.maximum(start_r, seq * max_tokens)
        hi = np.minimum(start_r + n_r, (seq + 1) * max_tokens)
        return pa.table({
            id_col: doc_r,
            "seq_id": seq.astype("int64"),
            "doc_offset": (lo - start_r).astype("int64"),
            "n_tokens": (hi - lo).astype("int64"),
        })

    probed = ray.get([block_total.remote(r) for r in refs])
    pairs = sorted(
        ((fid, tot, r) for (fid, tot), r in zip(probed, refs)
         if fid is not None),
        key=lambda p: p[0])
    out_refs, offset = [], 0
    for _, tot, r in pairs:
        out_refs.append(emit.remote(r, offset))
        offset += tot
    if not out_refs:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "seq_id": pa.array([], pa.int64()),
            "doc_offset": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64())}))
    import ray.data as rd
    return rd.from_arrow_refs(out_refs)
