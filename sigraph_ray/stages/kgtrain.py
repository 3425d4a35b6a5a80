"""KG-embedding training-data operators — the step after graph
materialization when the graph feeds a TransE/DistMult-style trainer:
every true triple needs corrupted negatives, sampled DETERMINISTICALLY
so shards are reproducible at any parallelism (Bordes et al., NeurIPS
2013 negative sampling, made hash-deterministic).

Beyond-reference operator (the reference stops at the Neo4j graph;
SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _h16(keys: list[str]) -> np.ndarray:
    from sigraph_ray.functions.hashing import md5_hex

    return np.array([int(h[:4], 16) for h in md5_hex(keys)],
                    dtype="int64")


def negative_samples(edges, *, src: str = "src", type_col: str = "type",
                     dst: str = "dst"):
    """One deterministic corrupted-tail negative per true edge:
    ``neg_dst = entity[ md5_16(src|type|dst) mod |entities| ]``, with
    self-corruptions (``neg_dst == dst``) and accidental TRUE triples
    filtered exactly.

    Dataflow: the entity vocabulary is ranked once (one sort + the
    O(#blocks) row-offset stitch — vocabulary-sized, not edge-sized);
    corrupted tails attach by ONE sorted-merge join on the rank; the
    accidental-positive filter is the Bloom-prefiltered exact ANTI
    join (only Bloom-positive candidates reach a shuffle). Every
    stage is a pure function of the triple bytes, so output is
    identical at any block layout — the property a resumable training
    export needs."""
    from sigraph_ray.stages.bloom import bloom_semi_anti
    from sigraph_ray.stages.collect import sorted_distinct
    from sigraph_ray.stages.joins import sorted_merge_join
    from sigraph_ray.stages.ordering import _global_positions

    uniq = sorted_distinct(edges, [src, type_col, dst]).materialize()

    # --- entity vocabulary, globally ranked ------------------------------
    ents = sorted_distinct(
        uniq.map_batches(lambda t: pa.table({"ent": t.column(dst),
                                             "ent2": t.column(dst)}),
                         batch_format="pyarrow"), ["ent", "ent2"])
    ents_sorted = ents.sort(["ent", "ent2"])

    def make_out(t: pa.Table, offset: int) -> pa.Table:
        return pa.table({"idx": pa.array(
            np.arange(offset, offset + t.num_rows, dtype="int64")),
            "neg_dst": t.column("ent")})

    ranked = _global_positions(ents_sorted, make_out)
    n_ents = int(ranked.count())

    # --- deterministic corrupted index per true edge ----------------------
    def corrupt(df: pd.DataFrame) -> pd.DataFrame:
        keys = (df[src] + "|" + df[type_col] + "|" + df[dst]).tolist()
        return pd.DataFrame({src: df[src], type_col: df[type_col],
                             dst: df[dst],
                             "idx": _h16(keys) % n_ents})

    cand = sorted_merge_join(
        uniq.map_batches(corrupt, batch_format="pandas"),
        ranked, on="idx",
        left_cols=[src, type_col, dst], right_cols=["neg_dst"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["neg_dst"] != df[dst]]
        out = d[[src, type_col, "neg_dst"]].copy()
        out["negk"] = d[src] + "|" + d[type_col] + "|" + d["neg_dst"]
        return out

    true_keys = uniq.map_batches(
        lambda df: pd.DataFrame(
            {"truek": df[src] + "|" + df[type_col] + "|" + df[dst]}),
        batch_format="pandas")

    neg = bloom_semi_anti(
        cand.map_batches(keyed, batch_format="pandas"), true_keys,
        left_key="negk", right_key="truek", anti=True)
    return neg.map_batches(
        lambda df: df[[src, type_col, "neg_dst"]],
        batch_format="pandas")
