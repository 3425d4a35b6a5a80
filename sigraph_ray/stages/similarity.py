"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix (``ray.put`` once, ``ray.get`` in actor
``__init__``), then a two-phase top-k reduce (per-batch partial top-k →
per-query final top-k). No stage ever materializes the corpus.

Scale path: LSH-bucketed variant — random-hyperplane signatures put
corpus and queries into buckets; only same-bucket candidates are scored
(multi-probe over all bit-flips of distance 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sigraph_ray.functions import hashing as H


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = mat.astype(np.float64)
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


class BruteForceTopK:
    """Per-batch partial top-k: scores batch rows against every query
    (queries broadcast once per actor)."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 emb_col: str = "embedding"):
        import ray
        qdf = ray.get(queries_ref)
        self.qids = qdf["qid"].to_numpy()
        self.qmat = _normalize(np.stack(qdf["vec"].to_numpy()))
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df[self.id_col].to_numpy()
        mat = _normalize(np.stack(df[self.emb_col].to_numpy()))
        sims = self.qmat @ mat.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        out = {"qid": [], "vec_id": [], "cosine": []}
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        for qi in range(sims.shape[0]):
            sel = idx[qi]
            out["qid"].extend([self.qids[qi]] * len(sel))
            out["vec_id"].extend(ids[sel])
            out["cosine"].extend(sims[qi, sel])
        return pd.DataFrame(out)


def _final_topk_factory(k: int):
    def final(group: pd.DataFrame) -> pd.DataFrame:
        # deterministic: cosine rounded to 9 dp, ties by vec_id asc
        g = group.copy()
        g["cosine_r"] = g["cosine"].round(9)
        g = g.sort_values(["cosine_r", "vec_id"],
                          ascending=[False, True], kind="stable").head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "rank", "vec_id", "cosine_r"]].rename(
            columns={"cosine_r": "cosine"})
    return final


def _brute_topk_batch(df: pd.DataFrame, **kw) -> pd.DataFrame:
    from sigraph_ray.stages.memo import memo_stage

    return memo_stage(BruteForceTopK, kw)(df)


# partial top-k tables at or below this finish on the driver (one
# pandas groupby — the table is #blocks × n_queries × k rows); above
# it the distributed groupby runs unchanged
_DRIVER_TOPK_BYTES = 64 * 2 ** 20


def knn_cosine(corpus, queries_df: pd.DataFrame, *, k: int = 5,
               id_col: str = "vec_id", emb_col: str = "embedding",
               concurrency: int | None = None):
    """corpus Dataset × small query set → (qid, rank, vec_id, cosine).

    ``queries_df`` needs columns (qid, vec). Two-phase: partial top-k
    per batch (memoized tasks — the query matrix builds once per
    worker, no actor-pool spin-up), final top-k per qid. The partial
    table is (#blocks × n_queries × k) rows; under the byte gate the
    final phase is one driver-side pandas groupby (identical ranking
    code), beyond it the distributed groupby runs. Exclude-self is the
    caller's choice (filter qid != vec_id afterwards if ids share a
    namespace).
    """
    import ray

    ref = ray.put(queries_df)
    partial = corpus.map_batches(
        _brute_topk_batch, batch_format="pandas",
        fn_kwargs={"queries_ref": ref, "k": k,
                   "id_col": id_col, "emb_col": emb_col}).materialize()
    final = _final_topk_factory(k)
    psize = partial.size_bytes()
    if psize is not None and psize <= _DRIVER_TOPK_BYTES:
        import ray.data as rd

        pdf = partial.to_pandas()
        if len(pdf) == 0:
            return rd.from_pandas(pd.DataFrame({
                "qid": pd.Series(dtype="int64"),
                "rank": pd.Series(dtype="int64"),
                "vec_id": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64")}))
        # vectorized whole-frame rank (no per-group apply): same
        # deterministic ordering as _final_topk_factory — cosine
        # rounded to 9 dp desc, ties by vec_id asc, top-k per qid
        pdf = pdf.assign(cosine_r=pdf["cosine"].round(9)).sort_values(
            ["qid", "cosine_r", "vec_id"],
            ascending=[True, False, True], kind="stable")
        fin = pdf.groupby("qid", sort=False).head(k).copy()
        fin["rank"] = fin.groupby("qid", sort=False).cumcount() + 1
        fin = (fin[["qid", "rank", "vec_id", "cosine_r"]]
               .rename(columns={"cosine_r": "cosine"})
               .reset_index(drop=True))
        return rd.from_pandas(fin)
    return partial.groupby("qid").map_groups(
        final, batch_format="pandas")


# --- LSH-bucketed variant (scale path) -------------------------------------


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from splitmix64 bits
    (no RNG state; same planes on every node)."""
    raw = H.splitmix64(np.arange(dim * n_bits, dtype=np.uint64)
                       + np.uint64(seed) * np.uint64(0x9E3779B9))
    # map to (-1, 1) floats
    vals = (raw.astype(np.float64) / 2**64) * 2.0 - 1.0
    return vals.reshape(n_bits, dim)


def _signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0
    out = np.zeros(len(mat), dtype=np.uint64)
    for b in range(planes.shape[0]):
        out |= bits[:, b].astype(np.uint64) << np.uint64(b)
    return out


class LshBucketTopK:
    """Score only rows whose LSH bucket is within the query's probe set
    (exact bucket + all 1-bit flips)."""

    def __init__(self, queries_ref, k: int, n_bits: int = 8,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        import ray
        qdf = ray.get(queries_ref)
        self.qids = qdf["qid"].to_numpy()
        self.qmat = _normalize(np.stack(qdf["vec"].to_numpy()))
        self.planes = _hyperplanes(self.qmat.shape[1], n_bits)
        qs = _signatures(self.qmat, self.planes)
        probes = [qs]
        for b in range(n_bits):
            probes.append(qs ^ (np.uint64(1) << np.uint64(b)))
        self.probe = np.stack(probes, axis=1)  # (n_q, n_bits+1)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df[self.id_col].to_numpy()
        mat = _normalize(np.stack(df[self.emb_col].to_numpy()))
        sig = _signatures(mat, self.planes)
        out = {"qid": [], "vec_id": [], "cosine": []}
        for qi in range(len(self.qids)):
            mask = np.isin(sig, self.probe[qi])
            if not mask.any():
                continue
            sims = mat[mask] @ self.qmat[qi]
            sel_ids = ids[mask]
            k = min(self.k, len(sims))
            top = np.argpartition(-sims, k - 1)[:k] if len(sims) > k else \
                np.arange(len(sims))
            out["qid"].extend([self.qids[qi]] * len(top))
            out["vec_id"].extend(sel_ids[top])
            out["cosine"].extend(sims[top])
        return pd.DataFrame(out)


def knn_cosine_lsh(corpus, queries_df: pd.DataFrame, *, k: int = 5,
                   n_bits: int = 8, concurrency: int = 2, **kw):
    import ray

    ref = ray.put(queries_df)
    partial = corpus.map_batches(
        LshBucketTopK, batch_format="pandas",
        fn_constructor_kwargs={"queries_ref": ref, "k": k,
                               "n_bits": n_bits, **kw},
        concurrency=concurrency)
    return partial.groupby("qid").map_groups(
        _final_topk_factory(k), batch_format="pandas")


# --- IVF variant (scale path for large query sets / corpora) ---------------


def _kmeans_fit(sample: np.ndarray, n_centroids: int,
                iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means on a (bounded) training sample:
    init = first n_centroids rows of the hash-ordered sample, Lloyd
    iterations with cosine assignment, empty cells keep their previous
    centroid. No RNG anywhere."""
    sample = _normalize(sample)
    n_centroids = min(n_centroids, len(sample))
    cent = sample[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def ivf_train(corpus, *, n_centroids: int = 16, sample_every: int = 7,
              max_sample: int = 4096, id_col: str = "vec_id",
              emb_col: str = "embedding") -> np.ndarray:
    """Train IVF centroids on a deterministic content-keyed sample:
    rows whose stable id hash ≡ 0 (mod sample_every) — the same rows on
    every run and any block order (a ``limit()`` sample would depend on
    arrival order). The sample is the only data that reaches the
    driver, capped at ``max_sample`` rows in hash order."""
    return _kmeans_fit(
        _keyed_sample(corpus, id_col=id_col, emb_col=emb_col,
                      sample_every=sample_every, max_sample=max_sample),
        n_centroids)


class IvfTopK:
    """Score only rows whose IVF cell is within the query's ``nprobe``
    nearest cells — centroids broadcast once per actor; assignment is
    one matmul per batch."""

    def __init__(self, queries_ref, centroids_ref, k: int, nprobe: int,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        import ray
        qdf = ray.get(queries_ref)
        self.cent = ray.get(centroids_ref)
        self.qids = qdf["qid"].to_numpy()
        self.qmat = _normalize(np.stack(qdf["vec"].to_numpy()))
        qsims = self.qmat @ self.cent.T
        nprobe = min(nprobe, self.cent.shape[0])
        self.probe = np.argsort(-qsims, axis=1)[:, :nprobe]
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df[self.id_col].to_numpy()
        mat = _normalize(np.stack(df[self.emb_col].to_numpy()))
        cell = np.argmax(mat @ self.cent.T, axis=1)
        out = {"qid": [], "vec_id": [], "cosine": []}
        for qi in range(len(self.qids)):
            mask = np.isin(cell, self.probe[qi])
            if not mask.any():
                continue
            sims = mat[mask] @ self.qmat[qi]
            sel_ids = ids[mask]
            k = min(self.k, len(sims))
            top = np.argpartition(-sims, k - 1)[:k] if len(sims) > k else \
                np.arange(len(sims))
            out["qid"].extend([self.qids[qi]] * len(top))
            out["vec_id"].extend(sel_ids[top])
            out["cosine"].extend(sims[top])
        return pd.DataFrame(out)


def knn_cosine_ivf(corpus, queries_df: pd.DataFrame, *, k: int = 5,
                   n_centroids: int = 16, nprobe: int = 4,
                   concurrency: int = 2, id_col: str = "vec_id",
                   emb_col: str = "embedding"):
    """IVF ANN: deterministic k-means coarse quantizer (trained on a
    content-keyed sample), then a probed scan — each batch computes one
    assignment matmul and scores only probe-cell rows. The corpus is
    never materialized; only the bounded training sample and the
    (n_centroids × dim) centroid table leave the stream."""
    import ray

    centroids = ivf_train(corpus, n_centroids=n_centroids,
                          id_col=id_col, emb_col=emb_col)
    partial = corpus.map_batches(
        IvfTopK, batch_format="pandas",
        fn_constructor_kwargs={"queries_ref": ray.put(queries_df),
                               "centroids_ref": ray.put(centroids),
                               "k": k, "nprobe": nprobe,
                               "id_col": id_col, "emb_col": emb_col},
        concurrency=concurrency)
    return partial.groupby("qid").map_groups(
        _final_topk_factory(k), batch_format="pandas")


# --- document embedding stage (KG side) ------------------------------------


class DocEmbedder:
    """Actor-pool stage adding a deterministic ``embedding`` column
    (functions/embed.py hashed-ngram stand-in; a real model's weights
    would load HERE, once per actor — ai_agent.py:126-138 Document
    nodes carry text + embedding)."""

    def __init__(self, text_col: str = "text", dim: int = 32):
        from sigraph_ray.functions.embed import embed_texts

        self._embed = embed_texts
        self.text_col = text_col
        self.dim = dim

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["embedding"] = self._embed(df[self.text_col].fillna(""),
                                      dim=self.dim)
        return df


def add_embeddings(ds, *, text_col: str = "text", dim: int = 32,
                   concurrency: int = 2):
    """docs → docs + unit-norm ``embedding`` (list<float>) column."""
    return ds.map_batches(
        DocEmbedder, batch_format="pandas",
        fn_constructor_kwargs={"text_col": text_col, "dim": dim},
        concurrency=concurrency)


def _table_matrix(t, emb_col: str) -> np.ndarray:
    """(n, d) float64 matrix from an Arrow block's embedding column —
    handles list/fixed-size-list arrays AND Ray's tensor extension
    type (from_pandas blocks), which plain ``to_pandas`` rejects."""
    import pyarrow as _pa

    arr = t.column(emb_col).combine_chunks()
    if _pa.types.is_list(arr.type) or _pa.types.is_fixed_size_list(arr.type):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), -1).astype(np.float64)
    try:  # Ray ArrowTensorArray
        return np.asarray(arr.to_numpy(zero_copy_only=False)
                          .tolist(), dtype=np.float64)
    except Exception:
        return np.stack([np.asarray(x, dtype=np.float64)
                         for x in arr.to_pylist()])


class _CosinePairScan:
    """Per-batch block of rows × full normalized corpus matrix (built
    once per actor from object-store block refs) → (u, v) pairs with
    cosine ≥ threshold and u < v (float64 throughout)."""

    def __init__(self, mat_refs: list, threshold: float,
                 id_col: str, emb_col: str):
        import ray

        ids, vecs = [], []
        for t in ray.get(list(mat_refs)):
            if t.num_rows:
                ids.append(t.column(id_col).to_numpy(
                    zero_copy_only=False))
                vecs.append(_table_matrix(t, emb_col))
        self.ids = np.concatenate(ids)
        self.mat = _normalize(np.concatenate(vecs))
        order = np.argsort(self.ids, kind="stable")
        self.ids = self.ids[order]
        self.mat = self.mat[order]
        self.threshold = threshold
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        bids = df[self.id_col].to_numpy()
        bmat = _normalize(np.stack(df[self.emb_col].to_numpy())
                          .astype(np.float64))
        sims = bmat @ self.mat.T                 # (batch, corpus)
        # strict upper triangle by ID: v > u avoids self and mirrors
        hit_r, hit_c = np.nonzero(
            (sims >= self.threshold) & (self.ids[None, :] > bids[:, None]))
        return pd.DataFrame({"u": bids[hit_r], "v": self.ids[hit_c]})


def embed_cosine_pairs(ds, *, id_col: str = "vec_id",
                       emb_col: str = "embedding",
                       threshold: float = 0.4, concurrency: int = 2):
    """Embedding-cosine near-dup pairs, EXACT (u < v, cosine ≥ t).

    Baseline tier per the build brief: blockwise matmul of the streamed
    corpus against the full normalized matrix broadcast as block refs —
    O(n²/p) compute, memory-bound by (corpus rows × dim) floats per
    actor, the same bound as :class:`BruteForceTopK`'s query side.
    Beyond that bound use the LSH/IVF ANN variants in this module
    (probabilistic) — this exact form is the oracle baseline they are
    recall-gated against."""
    pinned = ds.materialize()
    refs = list(pinned.to_arrow_refs())
    return pinned.map_batches(
        _CosinePairScan, batch_format="pandas",
        fn_constructor_kwargs={"mat_refs": refs, "threshold": threshold,
                               "id_col": id_col, "emb_col": emb_col},
        concurrency=concurrency)


def knn_self_join(ds, *, k: int = 5, id_col: str = "vec_id",
                  emb_col: str = "embedding"):
    """All-pairs top-k neighbor self-join: for EVERY row, its k most
    cosine-similar OTHER rows → Dataset of (vec_id, rank, nbr_id).

    Exact broadcast tier: the normalized corpus matrix is assembled
    once (float32, 10⁸ × 256-d ≈ 100 GB — the object-store bound,
    documented like ``joins.broadcast_semi_anti``) INSIDE one Ray
    worker task that reads the materialized blocks from the object
    store — the driver holds only the ObjectRef, never the matrix
    (the ``canonicalize._union_find_task_labels`` idiom); each corpus
    block then computes block × corpusᵀ and its own top-k rows
    independently — O(n²/blocks) flops per task, zero shuffle.
    Past the broadcast bound use the bucketed tiers that already serve
    this family at scale: `embed_cosine_pairs` (LSH-bucketed near-dup
    pairs) or `ivf_topk` (probed centroid scan) — this operator is the
    exact baseline they are recall-gated against. Determinism matches
    the SQL oracle: cosine rounded to 9 dp, ties by neighbor id asc."""
    import ray

    @ray.remote
    def _assemble(refs):
        ids_l, mats = [], []
        for t in ray.get(list(refs)):
            if t.num_rows == 0 or id_col not in t.column_names:
                continue  # empty blocks may carry degenerate schemas
            df = t.to_pandas()
            ids_l.append(df[id_col].to_numpy())
            mats.append(np.stack(df[emb_col].to_numpy()))
        ids = np.concatenate(ids_l)
        mat = _normalize(np.vstack(mats).astype(np.float64))
        order = np.argsort(ids)
        # the tuple lands in the worker's local object store; only the
        # ref travels back to the driver
        return ids[order], mat[order]

    ds = ds.materialize()
    corpus_ref = _assemble.remote(list(ds.to_arrow_refs()))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        cids, cmat = ray.get(corpus_ref)
        bids = df[id_col].to_numpy()
        bmat = _normalize(np.stack(df[emb_col].to_numpy())
                          .astype(np.float64))
        sims = np.round(bmat @ cmat.T, 9)
        # exclude self-matches by id
        self_pos = np.searchsorted(cids, bids)
        sims[np.arange(len(bids)), self_pos] = -np.inf
        kk = min(k, sims.shape[1] - 1)
        out_v, out_r, out_n = [], [], []
        # deterministic top-k: FULL per-row sort by (-cos, nbr_id) —
        # argpartition prefilters can split a rounded-cosine tie
        # plateau and diverge from the oracle's total order
        for i in range(len(bids)):
            cand = np.lexsort((cids, -sims[i]))[:kk]
            out_v.extend([bids[i]] * kk)
            out_r.extend(range(1, kk + 1))
            out_n.extend(cids[cand])
        return pd.DataFrame({id_col: out_v,
                             "rank": np.array(out_r, dtype="int64"),
                             "nbr_id": out_n})

    return ds.map_batches(topk, batch_format="pandas")


# --- Product-quantization variant (the IVF-PQ memory-scale path) -----------


def _keyed_sample(corpus, *, id_col: str, emb_col: str,
                  sample_every: int = 7,
                  max_sample: int = 4096) -> np.ndarray:
    """Deterministic content-keyed training sample (same discipline as
    :func:`ivf_train`): id-hash ≡ 0 (mod sample_every), hash-ordered,
    capped; degrades to all-rows on tiny corpora."""
    def pick_factory(every: int):
        def pick(df: pd.DataFrame) -> pd.DataFrame:
            h = H.splitmix64(pd.util.hash_pandas_object(
                df[id_col].astype(str), index=False).to_numpy()
                .astype(np.uint64))
            out = df[[id_col, emb_col]].copy()
            out["__h"] = h
            return out[(h % np.uint64(every)) == 0]
        return pick

    sample = corpus.map_batches(pick_factory(sample_every),
                                batch_format="pandas").to_pandas()
    if sample.empty:
        sample = corpus.map_batches(pick_factory(1),
                                    batch_format="pandas").to_pandas()
        if sample.empty:
            raise ValueError("keyed sample: corpus has no rows")
    sample = sample.sort_values("__h").head(max_sample)
    return np.stack(sample[emb_col].to_numpy())


def _kmeans_l2(sample: np.ndarray, n_codes: int,
               iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd k-means under L2 (init = first rows of the
    hash-ordered sample; empty cells keep their previous centroid)."""
    n_codes = min(n_codes, len(sample))
    cent = sample[:n_codes].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(n_codes):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_train(corpus, *, m: int = 8, n_codes: int = 16,
             id_col: str = "vec_id", emb_col: str = "embedding",
             sample_every: int = 7, max_sample: int = 4096) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al. 2011, public
    method): unit-normalize, split the dimension into ``m`` subspaces,
    one deterministic L2 k-means per subspace → ``(m, n_codes, d/m)``
    array. Only the bounded keyed sample reaches the driver."""
    sample = _normalize(_keyed_sample(
        corpus, id_col=id_col, emb_col=emb_col,
        sample_every=sample_every, max_sample=max_sample))
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack([
        _kmeans_l2(np.ascontiguousarray(sample[:, j * dsub:(j + 1) * dsub]),
                   n_codes)
        for j in range(m)])


class PqTopK:
    """Asymmetric-distance PQ scan: codebooks broadcast once per actor;
    each batch is ENCODED (m subspace argmins) and scored against every
    query through a per-query ``(m, n_codes)`` inner-product lookup
    table — the corpus is touched once, at ~log₂(n_codes)·m bits per
    vector equivalent work, the memory shape that makes 100 TB
    embedding search feasible (codes are 8 bytes/vector at m=8)."""

    def __init__(self, queries_ref, codebooks_ref, k: int,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        import ray

        qdf = ray.get(queries_ref)
        self.cb = ray.get(codebooks_ref)          # (m, n_codes, dsub)
        self.qids = qdf["qid"].to_numpy()
        qmat = _normalize(np.stack(qdf["vec"].to_numpy()))
        m, n_codes, dsub = self.cb.shape
        # LUT[q, j, c] = <q_subj, codebook[j, c]>
        self.lut = np.einsum("qjd,jcd->qjc",
                             qmat.reshape(len(qmat), m, dsub), self.cb)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df[self.id_col].to_numpy()
        mat = _normalize(np.stack(df[self.emb_col].to_numpy()))
        m, n_codes, dsub = self.cb.shape
        sub = mat.reshape(len(mat), m, dsub)
        # encode: per subspace, argmin ||x - c||² = argmax <x,c> - ||c||²/2
        norms = (self.cb ** 2).sum(axis=2) / 2.0       # (m, n_codes)
        codes = np.empty((len(mat), m), dtype=np.int64)
        for j in range(m):
            codes[:, j] = np.argmax(sub[:, j, :] @ self.cb[j].T
                                    - norms[j], axis=1)
        # ADC: approx cosine = Σ_j LUT[q, j, codes[:, j]]
        out = {"qid": [], "vec_id": [], "cosine": []}
        for qi in range(len(self.qids)):
            sims = self.lut[qi][np.arange(m), codes].sum(axis=1)
            k = min(self.k, len(sims))
            top = np.argpartition(-sims, k - 1)[:k] if len(sims) > k \
                else np.arange(len(sims))
            out["qid"].extend([self.qids[qi]] * len(top))
            out["vec_id"].extend(ids[top])
            out["cosine"].extend(sims[top])
        return pd.DataFrame(out)


def knn_cosine_pq(corpus, queries_df: pd.DataFrame, *, k: int = 5,
                  m: int = 8, n_codes: int = 16, concurrency: int = 2,
                  id_col: str = "vec_id", emb_col: str = "embedding"):
    """PQ ANN top-k: deterministic per-subspace codebooks (content-
    keyed sample) + asymmetric-distance scan + the shared two-phase
    deterministic top-k. Approximate by design — recall vs brute is
    pytest-gated; the returned ``cosine`` is the ADC estimate."""
    import ray

    cb = pq_train(corpus, m=m, n_codes=n_codes,
                  id_col=id_col, emb_col=emb_col)
    partial = corpus.map_batches(
        PqTopK, batch_format="pandas",
        fn_constructor_kwargs={"queries_ref": ray.put(queries_df),
                               "codebooks_ref": ray.put(cb),
                               "k": k, "id_col": id_col,
                               "emb_col": emb_col},
        concurrency=concurrency)
    return partial.groupby("qid").map_groups(
        _final_topk_factory(k), batch_format="pandas")


def grouped_centroid(ds, *, group: str, vec_col: str):
    """Per-group embedding centroid in long form ``(group, dim,
    mean)`` — the class/source prototype vector (IVF seeds, per-lang
    quality anchors, topic summaries). Per-batch combiner: one numpy
    sum per group (vectors stacked once, float64 accumulate), exploded
    to (group, dim, s_p, n_p) partial rows — #groups × dim per block,
    never row-scale; exact grouped sums then come from ONE
    sorted_groupby_agg stitch and the mean is a per-row division."""
    from sigraph_ray.stages.collect import sorted_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({group: pd.Series(dtype="object"),
                              "dim": pd.Series(dtype="int64"),
                              "s_p": pd.Series(dtype="float64"),
                              "n_p": pd.Series(dtype="int64")})
        if len(df) == 0:
            return empty
        mat = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        dim = mat.shape[1]
        gs, ss, ns = [], [], []
        for g, sub in df.groupby(group, sort=False).indices.items():
            gs.append(g)
            ss.append(mat[sub].sum(axis=0))
            ns.append(len(sub))
        k = len(gs)
        return pd.DataFrame({
            group: np.repeat(np.asarray(gs), dim),
            "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64), k),
            "s_p": np.concatenate(ss),
            "n_p": np.repeat(np.asarray(ns, np.int64), dim),
        })

    sums = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key=[group, "dim"],
        aggs={"s": ("s_p", "sum"), "n": ("n_p", "sum")})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["mean"] = out["s"].to_numpy() / out["n"].to_numpy()
        out["dim"] = out["dim"].astype("int64")
        return out[[group, "dim", "mean"]]

    return sums.map_batches(finish, batch_format="pandas")
