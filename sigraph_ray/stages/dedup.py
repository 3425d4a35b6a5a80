"""Deduplication operators over a document table — the training-data
ops a 100 TB pipeline needs beyond the reference's exact-distinct
(SURVEY.md §2.7 notes the reference has exact dedup only; these are the
scale-path additions required by the build brief).

All follow the same shape: vectorized per-batch signature computation →
hash-partition groupby on the signature → candidate verification →
connected components (stages/canonicalize.connected_components) →
deterministic representative (min id per component).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Min

from sigraph_ray.functions import hashing as H
from sigraph_ray.stages.canonicalize import connected_components

# --- exact dedup -----------------------------------------------------------


def add_md5(ds, text_col: str = "text"):
    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["content_md5"] = H.md5_hex(df[text_col].fillna(""))
        return df
    return ds.map_batches(f, batch_format="pandas")


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the minimum-id row per distinct text (hash-partition by
    content digest + per-group min — 'hash-partition + per-group first'
    from the brief). Returns (kept_ids Dataset)."""
    hashed = add_md5(ds, text_col)
    return (hashed.groupby("content_md5")
            .aggregate(Min(id_col, alias_name="kept_id")))


# --- MinHash + LSH near-dedup ----------------------------------------------

NUM_PERM = 64
NUM_BANDS = 16  # 4 rows per band → catches jaccard ≳ 0.7 reliably


class MinHashSignatures:
    """Actor-pool stage: shingle → minhash → band hashes. Permutation
    seeds built once per actor in __init__."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 k: int = 3):
        self.seeds = H.make_seeds(NUM_PERM)
        self.text_col = text_col
        self.id_col = id_col
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows_per_band = NUM_PERM // NUM_BANDS
        ids, bands, bhashes = [], [], []
        sigs = []
        for i, t in zip(df[self.id_col], df[self.text_col].fillna("")):
            sh = H.shingle_hashes(t, self.k)
            sig = H.minhash_signature(sh, NUM_PERM, self.seeds)
            sigs.append(sig)
            for b in range(NUM_BANDS):
                seg = sig[b * rows_per_band:(b + 1) * rows_per_band]
                bh = int(H.splitmix64(
                    np.bitwise_xor.reduce(seg)[None] ^ np.uint64(b))[0])
                ids.append(i)
                bands.append(b)
                bhashes.append(bh)
        out = pd.DataFrame({"doc_id": ids, "band": bands,
                            "band_hash": np.array(bhashes, dtype=np.uint64)
                            .astype(np.int64)})
        # Arrow out — the band groupby shuffles these blocks
        return pa.Table.from_pandas(out, preserve_index=False)


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one (band, band_hash) bucket — capped
    pairing against the bucket minimum to stay linear in bucket size
    (a bucket of identical docs yields a star, which connected
    components collapses anyway)."""
    ids = np.sort(group["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"u": pd.Series(dtype="int64"),
                             "v": pd.Series(dtype="int64")})
    return pd.DataFrame({"u": np.full(len(ids) - 1, ids[0]), "v": ids[1:]})


class VerifyJaccard:
    """Recompute true shingle Jaccard for candidate pairs. The documents
    needed per batch are looked up from a broadcast id→text map (small
    candidate universe assumption: only docs that shared a bucket)."""

    def __init__(self, texts_ref, threshold: float, k: int):
        import ray
        self.texts = ray.get(texts_ref)
        self.threshold = threshold
        self.k = k
        self._cache: dict[int, np.ndarray] = {}

    def _sh(self, i: int) -> np.ndarray:
        if i not in self._cache:
            self._cache[i] = H.shingle_hashes(self.texts.get(i, ""), self.k)
        return self._cache[i]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        keep = [H.jaccard(self._sh(u), self._sh(v)) >= self.threshold
                for u, v in zip(df["u"], df["v"])]
        return df[pd.Series(keep, index=df.index)]


def minhash_lsh_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                      threshold: float = 0.8, k: int = 3,
                      concurrency: int = 4):
    """Near-duplicate clusters via shingle→minhash→band→bucket-groupby
    (the brief's scale path). Returns a Dataset (doc_id, cluster_id)
    where cluster_id = min doc_id of the near-dup component; docs
    without near-dups map to themselves.

    Scale notes: the band groupby is the only wide exchange over the
    full corpus; candidate verification touches only bucket-sharing
    docs (broadcast of their texts — bounded by the near-dup universe,
    not corpus size). At 100 TB the verify step would read candidate
    texts via a keyed side store instead of one broadcast dict; the
    dataflow shape is unchanged.
    """
    import ray

    sigs = ds.map_batches(
        MinHashSignatures, batch_format="pandas",
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col, "k": k},
        concurrency=concurrency)
    pairs = sigs.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas")
    # distinct candidate pairs
    pairs = pairs.groupby(["u", "v"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
    cand = pairs.to_pandas()
    if len(cand) == 0:
        return ds.map_batches(
            lambda df: pd.DataFrame({"doc_id": df[id_col],
                                     "cluster_id": df[id_col]}),
            batch_format="pandas")
    need = set(cand["u"]) | set(cand["v"])
    texts = {}
    for df in ds.map_batches(
            lambda d: d[[id_col, text_col]], batch_format="pandas"
            ).iter_batches(batch_format="pandas"):
        sel = df[df[id_col].isin(need)]
        texts.update(dict(zip(sel[id_col], sel[text_col])))
    ref = ray.put(texts)
    import ray.data as rd
    verified = rd.from_pandas(cand).map_batches(
        VerifyJaccard, batch_format="pandas",
        fn_constructor_kwargs={"texts_ref": ref, "threshold": threshold,
                               "k": k},
        concurrency=2)
    vdf = verified.to_pandas()

    if len(vdf) == 0:
        return ds.map_batches(
            lambda df: pd.DataFrame({"doc_id": df[id_col],
                                     "cluster_id": df[id_col]}),
            batch_format="pandas")
    # The verified pair set is already driver-resident (it is bounded by
    # the near-dup universe, not the corpus); union-find here is exact
    # and cheap. When the pair set is itself huge, switch to the
    # distributed stages/canonicalize.connected_components operator —
    # same labels, pure dataflow.
    if len(vdf) > 2_000_000:
        import ray.data as rd2
        comp_edges = rd2.from_pandas(pd.DataFrame({
            "u": vdf["u"].astype(str), "v": vdf["v"].astype(str)}))
        labels = connected_components(comp_edges).to_pandas()
        lab = dict(zip(labels["node"].astype(np.int64),
                       labels["comp"].astype(np.int64)))
    else:
        lab = _union_find(vdf["u"].to_numpy(), vdf["v"].to_numpy())
    labref = ray.put(lab)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(labref)
        return pd.DataFrame({
            "doc_id": df[id_col],
            "cluster_id": [m.get(i, i) for i in df[id_col]],
        })
    return ds.map_batches(assign, batch_format="pandas")


def _union_find(us, vs) -> dict[int, int]:
    """Driver-side union-find; canonical root = min member id."""
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(us, vs):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


# --- SimHash near-dedup ----------------------------------------------------


class SimHashStage:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sh = [H.simhash64(t.split()) for t in df[self.text_col].fillna("")]
        out = pd.DataFrame({"doc_id": df[self.id_col],
                            "simhash": np.array(sh, dtype=np.uint64)
                            .astype(np.int64)})
        return pa.Table.from_pandas(out, preserve_index=False)


def simhash_candidates(ds, *, max_hamming: int = 3, **kw):
    """SimHash near-dup candidate pairs: 4-segment banding (two 16-bit
    segments must match for hamming ≤ 3 by pigeonhole over 4 segments —
    we emit per-segment buckets and verify hamming exactly)."""
    sigs = ds.map_batches(SimHashStage, batch_format="pandas",
                          fn_constructor_kwargs=kw, concurrency=2)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "seg": [], "seg_val": [], "simhash": []}
        h = df["simhash"].to_numpy().astype(np.uint64)
        for s in range(4):
            seg = (h >> np.uint64(16 * s)) & np.uint64(0xFFFF)
            rows["doc_id"].extend(df["doc_id"])
            rows["seg"].extend([s] * len(df))
            rows["seg_val"].extend(seg.astype(np.int64))
            rows["simhash"].extend(df["simhash"])
        return pa.Table.from_pandas(pd.DataFrame(rows),
                                    preserve_index=False)

    def bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        hd = H.hamming64(np.full(len(ids) - 1, hs[0]), hs[1:])
        out = pd.DataFrame({"u": ids[0], "v": ids[1:], "hamming": hd})
        return out[out["hamming"] <= max_hamming]

    pairs = (sigs.map_batches(explode, batch_format="pandas")
             .groupby(["seg", "seg_val"])
             .map_groups(bucket, batch_format="pandas"))
    return pairs.groupby(["u", "v"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
