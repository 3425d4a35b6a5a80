"""Similarity search: brute-force top-k vs exact numpy reference; LSH
variant recall on planted neighborhood structure."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

DIM = 32


def _vectors(n: int, seed: int = 7, n_clusters: int = 30) -> pd.DataFrame:
    """Clustered vectors (center + small noise): true nearest neighbors
    are same-cluster, the structure ANN variants are built for."""
    from sigraph_ray.functions.hashing import splitmix64

    def rand(count, salt):
        raw = splitmix64(np.arange(count, dtype=np.uint64)
                         + np.uint64(seed * 1000 + salt)).astype(np.float64)
        return (raw / 2**64) - 0.5

    centers = rand(n_clusters * DIM, 1).reshape(n_clusters, DIM)
    noise = rand(n * DIM, 2).reshape(n, DIM) * 0.15
    mat = centers[np.arange(n) % n_clusters] + noise
    return pd.DataFrame({"vec_id": np.arange(n),
                         "embedding": [mat[i] for i in range(n)]})


@pytest.fixture(scope="module")
def vecs(ray_session):
    return _vectors(300)


def _exact_topk(df: pd.DataFrame, qids, k: int):
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in qids:
        sims = mat @ mat[q]
        order = sorted(
            ((round(s, 9), -i) for i, s in enumerate(sims) if i != q),
            reverse=True)
        out[q] = [-i for (_, i) in order[:k]]
    return out


def test_brute_force_matches_exact(ray_session, vecs):
    import ray.data as rd

    from sigraph_ray.stages.similarity import knn_cosine

    qids = [0, 1, 2]
    qdf = pd.DataFrame({
        "qid": qids,
        "vec": [vecs["embedding"][q] for q in qids]})
    corpus = rd.from_pandas(vecs).repartition(4)
    got = knn_cosine(corpus, qdf, k=6, concurrency=2).to_pandas()
    want = _exact_topk(vecs, qids, 6)
    for q in qids:
        g = got[got["qid"] == q].sort_values("rank")
        # self is rank 1 (cos=1); exact ref excludes self
        assert g.iloc[0]["vec_id"] == q
        assert list(g["vec_id"][1:]) == want[q][:5]


def test_lsh_recall(ray_session, vecs):
    import ray.data as rd

    from sigraph_ray.stages.similarity import knn_cosine, knn_cosine_lsh

    qids = list(range(8))
    qdf = pd.DataFrame({"qid": qids,
                        "vec": [vecs["embedding"][q] for q in qids]})
    corpus = rd.from_pandas(vecs).repartition(4)
    exact = knn_cosine(corpus, qdf, k=5, concurrency=2).to_pandas()
    approx = knn_cosine_lsh(corpus, qdf, k=5, n_bits=6,
                            concurrency=2).to_pandas()
    hits = 0
    total = 0
    for q in qids:
        e = set(exact[exact["qid"] == q]["vec_id"])
        a = set(approx[approx["qid"] == q]["vec_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.5, f"LSH recall {hits / total}"
