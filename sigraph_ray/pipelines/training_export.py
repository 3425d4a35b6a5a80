"""Training-shard export — the terminal sink of the corpus family:
documents → deterministic token ids → GPT-style packed fixed-length
sequences → partitioned Parquet shards a trainer can map straight into
fixed-shape batches.

Composition (every stage is an existing operator):

1. token ids per document — ``\\S+`` tokens hashed to a 16-bit id
   space (splitmix64; the honest stand-in for a BPE vocab lookup in
   this container — swap ``_token_ids`` for a real tokenizer table and
   nothing else changes), carried as one int32 blob per doc;
2. span map from :func:`sigraph_ray.stages.packing.pack_sequences` —
   layout-invariant (doc, seq, offset, n) arithmetic on the global
   token prefix sum;
3. one hash join spans ⨝ ids on doc_id (the only shuffle: spans and
   id arrays are both doc-sized, never token-sized on the driver),
   then ``groupby(seq_id).map_groups`` assembles each sequence from
   its ≤ few document slices, zero-padding only the final short
   sequence;
4. ``write_parquet(out_dir)`` — multi-file output; a resumable staged
   run wraps this exactly like ``jobs/run_kg.py`` wraps the KG build
   (state/manifest).

Output schema: ``seq_id:int64, input_ids:list<int32>[max_tokens],
n_real:int64`` — fixed shape, trainer-ready.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from sigraph_ray.functions import hashing as H


def _token_ids(texts: pd.Series, vocab_mask: int) -> pd.Series:
    """Per-row int32 id arrays for every ``\\S+`` token (vectorized:
    one explode + one hash pass per batch, re-split by row)."""
    toks = texts.str.findall(r"\S+")
    lens = toks.str.len().to_numpy(dtype="int64")
    ex = toks.explode().dropna()
    if not len(ex):
        return pd.Series([np.empty(0, np.int32)] * len(texts),
                         index=texts.index)
    h = pd.util.hash_pandas_object(ex.reset_index(drop=True),
                                   index=False).to_numpy()
    ids = (H.splitmix64(h.astype(np.uint64))
           & np.uint64(vocab_mask)).astype(np.int32)
    splits = np.cumsum(lens)[:-1]
    return pd.Series(np.split(ids, splits), index=texts.index)


def export_training_shards(ds, out_dir: str, *, max_tokens: int = 512,
                           vocab_bits: int = 16,
                           num_partitions: int = 8,
                           text_col: str = "text",
                           id_col: str = "doc_id"):
    """Pack ``ds``'s documents into fixed-``max_tokens`` id sequences
    and write them as Parquet shards under ``out_dir``. Returns the
    written row count."""
    import ray.data as rd

    from sigraph_ray.stages.joins import safe_join
    from sigraph_ray.stages.packing import pack_sequences

    mask = (1 << vocab_bits) - 1

    def ids_batch(df: pd.DataFrame) -> pa.Table:
        # int32 arrays travel as binary blobs: Acero hash joins reject
        # list-typed non-key fields (same limitation frontier.py works
        # around), and bytes are the zero-copy representation anyway
        arrs = _token_ids(df[text_col], mask)
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
            "ids_blob": pa.array([a.tobytes() for a in arrs],
                                 pa.binary()),
        })

    ids = ds.map_batches(ids_batch, batch_format="pandas")
    spans = pack_sequences(ds, max_tokens=max_tokens,
                           text_col=text_col, id_col=id_col)
    joined = safe_join(
        spans, ids, "inner", num_partitions, on=(id_col,),
        left_schema=pa.schema([(id_col, pa.int64()),
                               ("seq_id", pa.int64()),
                               ("doc_offset", pa.int64()),
                               ("n_tokens", pa.int64())]),
        right_schema=pa.schema([(id_col, pa.int64()),
                                ("ids_blob", pa.binary())]))

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        # slices within one sequence follow the global doc_id packing
        # order (a continuation slice of an earlier doc precedes whole
        # later docs, whatever its doc_offset); groups are a handful of
        # rows, so the per-row slice loop is bounded
        g = group.sort_values(id_col, kind="stable")
        parts = [np.frombuffer(r["ids_blob"], dtype=np.int32)
                 [r["doc_offset"]:r["doc_offset"] + r["n_tokens"]]
                 for _, r in g.iterrows()]
        seq = np.concatenate(parts) if parts else np.empty(0, np.int32)
        n_real = len(seq)
        if n_real != int(group["n_tokens"].sum()):
            raise AssertionError("span arithmetic violated")
        if n_real < max_tokens:   # only the final sequence is short
            seq = np.concatenate(
                [seq, np.zeros(max_tokens - n_real, np.int32)])
        out = np.empty(1, dtype=object)
        out[0] = seq.tolist()
        return pd.DataFrame({"seq_id": [int(group["seq_id"].iloc[0])],
                             "input_ids": out,
                             "n_real": [n_real]})

    seqs = joined.groupby("seq_id").map_groups(assemble,
                                               batch_format="pandas")
    seqs.write_parquet(out_dir)
    return rd.read_parquet(out_dir).count()
