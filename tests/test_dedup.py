"""Dedup family: exact, MinHash-LSH, SimHash — planted-duplicate corpus
(the driver's documents table is mostly unique, so we plant our own)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

BASE = ("the quick brown fox jumps over the lazy dog while the "
        "spark engine shuffles blocks across the cluster nodes "
        "and the reducer merges sorted runs into one output file")


def _corpus() -> pd.DataFrame:
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "text": f"unique document {i} " + " ".join(
            f"tok{i}_{j}" for j in range(30))})
    # exact dupes of doc 100
    rows.append({"doc_id": 100, "text": BASE})
    rows.append({"doc_id": 101, "text": BASE})
    # near-dup: one word changed
    rows.append({"doc_id": 102, "text": BASE.replace("lazy", "sleepy")})
    # near-dup: small suffix added
    rows.append({"doc_id": 103, "text": BASE + " extra trailing words"})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data as rd

    return rd.from_pandas(_corpus()).repartition(3)


def test_exact_dedup(corpus):
    from sigraph_ray.stages.dedup import exact_dedup

    kept = exact_dedup(corpus).to_pandas()
    ids = set(kept["kept_id"])
    assert 100 in ids and 101 not in ids  # min doc_id kept per text
    assert len(kept) == 43  # 44 docs - 1 exact dupe


def test_minhash_lsh_clusters(corpus):
    from sigraph_ray.stages.dedup import minhash_lsh_dedup

    out = minhash_lsh_dedup(corpus, threshold=0.6, concurrency=2).to_pandas()
    lab = dict(zip(out["doc_id"], out["cluster_id"]))
    # the whole planted family collapses to min id 100
    assert lab[100] == lab[101] == lab[102] == lab[103] == 100
    # unique docs map to themselves
    assert all(lab[i] == i for i in range(40))


def test_simhash_candidates(corpus):
    from sigraph_ray.stages.dedup import simhash_candidates

    pairs = simhash_candidates(corpus, max_hamming=6).to_pandas()
    got = set(map(tuple, pairs[["u", "v"]].values))
    assert any({100, 101} <= {u, v} for u, v in got)  # exact dupes found
    assert all(p["hamming"] <= 6 for _, p in pairs.iterrows())


def test_minhash_bucket_cap_degenerate_corpus(ray_session, caplog):
    """Adversarial LSH input: a corpus that is mostly ONE byte-identical
    document concentrates every band key of that text into a single
    bucket. The bucket-width cap must skip those buckets (identical
    texts are exact-dedup's job) without a worker-block blowup, while a
    small below-cap near-dup family elsewhere in the corpus still
    clusters."""
    import logging

    import ray.data as rd

    from sigraph_ray.stages.dedup import minhash_lsh_dedup

    rows = [{"doc_id": i, "text": BASE} for i in range(300)]
    rows.append({"doc_id": 1000, "text": "totally different payload "
                 + " ".join(f"w{j}" for j in range(40))})
    rows.append({"doc_id": 1001, "text": "totally different payload "
                 + " ".join(f"w{j}" for j in range(40)) + " tail"})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    with caplog.at_level(logging.WARNING, logger="sigraph_ray.stages.dedup"):
        out = minhash_lsh_dedup(ds, threshold=0.6, concurrency=2,
                                max_bucket=64).to_pandas()
    assert any("oversized buckets" in r.message for r in caplog.records)
    lab = dict(zip(out["doc_id"], out["cluster_id"]))
    # the degenerate mass was NOT pair-expanded (300 docs -> 300^2/2
    # pairs would be the blowup); every capped doc stays a singleton
    assert all(lab[i] == i for i in range(300))
    # the sane near-dup family still found through its own buckets
    assert lab[1000] == lab[1001] == 1000


def test_hashing_stable_across_processes():
    """Signatures must be identical across worker processes
    (PYTHONHASHSEED-independent)."""
    import subprocess
    import sys

    code = ("from sigraph_ray.functions.hashing import shingle_hashes;"
            "print(shingle_hashes('a b c d e').tolist())")
    outs = {
        subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                       env={"PYTHONHASHSEED": str(seed), "PATH": "/usr/bin:/bin",
                            "HOME": "/root"},
                       capture_output=True, text=True).stdout
        for seed in ("0", "42")
    }
    assert len(outs) == 1 and next(iter(outs)).strip()


def test_ngram_jaccard_pairs_exact(corpus):
    """PPJoin-prefix candidates + exact verify == brute-force pairwise
    Jaccard over the planted corpus (guarantees no pair is MISSED by
    the prefix filter, the property minhash can't give)."""
    from sigraph_ray.stages.dedup import _ngram_set, ngram_jaccard_pairs

    got = ngram_jaccard_pairs(corpus, n=3, threshold=0.7,
                              concurrency=2).to_pandas()
    gotset = set(map(tuple, got[["u", "v"]].values))
    df = _corpus()
    grams = {r.doc_id: set(_ngram_set(r.text, 3))
             for r in df.itertuples() if len(_ngram_set(r.text, 3))}
    want = set()
    ids = sorted(grams)
    for i, u in enumerate(ids):
        for v in ids[i + 1:]:
            a, b = grams[u], grams[v]
            inter = len(a & b)
            if inter and inter / (len(a) + len(b) - inter) >= 0.7:
                want.add((u, v))
    assert gotset == want
    assert (100, 101) in gotset          # exact dup pair found
    assert all(u < v for u, v in gotset)


def test_embed_cosine_pairs_exact(ray_session):
    """Blockwise broadcast matmul == brute-force numpy pairs."""
    import ray.data as rd

    from sigraph_ray.stages.similarity import embed_cosine_pairs

    rng = np.random.default_rng(7)
    n, d = 60, 16
    M = rng.normal(size=(n, d)).astype(np.float32)
    M[10] = M[3] + rng.normal(scale=0.05, size=d).astype(np.float32)
    M[20] = M[5] * 1.7                    # same direction, cos = 1
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(M)})
    ds = rd.from_pandas(df).repartition(4)
    got = embed_cosine_pairs(ds, threshold=0.6,
                             concurrency=2).to_pandas()
    gotset = set(map(tuple, got[["u", "v"]].values))
    X = M.astype(np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    C = X @ X.T
    iu, iv = np.triu_indices(n, 1)
    want = {(int(a), int(b)) for a, b, c in
            zip(iu, iv, C[iu, iv]) if c >= 0.6}
    assert gotset == want
    assert (3, 10) in gotset and (5, 20) in gotset


def test_dup_passages_planted(ray_session):
    """A 6-token passage planted in two docs is counted in both; a doc
    with no shared windows scores zero; short docs are excluded."""
    import ray.data as rd

    from sigraph_ray.stages.dedup import dup_passages

    shared = "alpha beta gamma delta epsilon zeta"
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"one two {shared} three four",
            f"{shared} completely different tail words here",
            "nothing in common with the others at all nine ten",
            "tiny doc",  # < 6 tokens → no windows → excluded
        ],
    })
    out = (dup_passages(rd.from_pandas(df).repartition(2), n=6)
           .to_pandas().set_index("doc_id").sort_index())
    assert list(out.index) == [1, 2, 3]
    # doc 1: tokens one two a..zeta three four = 10 tokens → 5 windows,
    # windows fully inside the shared span: exactly 1 ("alpha..zeta")
    assert out.loc[1, "n_windows"] == 5
    assert out.loc[1, "n_dup_windows"] == 1
    assert out.loc[2, "n_dup_windows"] == 1
    assert out.loc[3, "n_dup_windows"] == 0
    assert out.loc[3, "dup_fraction"] == 0.0


def test_remove_dup_passages_planted(ray_session):
    """Rewrite tier: the min-doc keeper keeps its copy, every other
    occurrence is deleted; overlapping duplicate windows remove their
    UNION of positions (no double-count); zero-token docs are
    excluded; fully-duplicated docs come back empty."""
    import ray.data as rd

    from sigraph_ray.stages.dedup import remove_dup_passages

    shared = "alpha beta gamma delta epsilon zeta"      # 6 tokens
    shared7 = "p q r s t u v"                           # 7 tokens
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "text": [
            f"one two {shared} three four",
            f"{shared} completely different tail words here",
            "nothing in common with the others at all nine ten",
            "   ",                       # zero tokens → excluded
            shared7,                     # keeper of the 7-token span
            f"x {shared7} y",            # overlapping windows → union
            shared,                      # fully duplicated (keeper=1)
            shared,                      # fully duplicated (keeper=1)
        ],
    })
    out = (remove_dup_passages(rd.from_pandas(df).repartition(3), n=6)
           .to_pandas().set_index("doc_id").sort_index())
    assert list(out.index) == [1, 2, 3, 5, 6, 7, 8]
    # doc 1 is the keeper (min doc_id over {1, 2, 7, 8}) → unchanged
    assert out.loc[1, "n_removed"] == 0
    assert out.loc[1, "clean_text"] == f"one two {shared} three four"
    # doc 2 loses exactly the 6 covered tokens
    assert out.loc[2, "n_removed"] == 6
    assert out.loc[2, "clean_text"] == \
        "completely different tail words here"
    assert out.loc[3, "n_removed"] == 0
    # doc 6: two overlapping duplicate windows cover positions 1-7 →
    # 7 tokens removed once, not 12
    assert out.loc[5, "n_removed"] == 0
    assert out.loc[6, "n_tokens"] == 9
    assert out.loc[6, "n_removed"] == 7
    assert out.loc[6, "clean_text"] == "x y"
    # docs 7/8 are non-keeper copies of the doc-1 span → emptied
    for d in (7, 8):
        assert out.loc[d, "n_removed"] == 6
        assert out.loc[d, "clean_text"] == ""


def test_levenshtein_matches_textbook_dp():
    import random

    from sigraph_ray.stages.dedup import _levenshtein

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            ndp = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                ndp[j] = min(dp[j] + 1, ndp[j - 1] + 1,
                             dp[j - 1] + (a[i - 1] != b[j - 1]))
            dp = ndp
        return dp[-1]

    rng = random.Random(5)
    for _ in range(300):
        a = "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 14)))
        b = "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 14)))
        assert _levenshtein(a, b) == ref(a, b), (a, b)


def test_blocked_levenshtein_pairs_planted(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.dedup import blocked_levenshtein_pairs

    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5],
        "name": ["alpha beta", "alpha betz",      # dist 1, same block
                 "alpha beta",                    # dist 0 vs id1 — other block
                 "totally different name here",   # same block as 1,2
                 "alpha bet"],                    # dist 1 vs id1, same block
        "blk": ["x", "x", "y", "x", "x"],
    })
    got = (blocked_levenshtein_pairs(
        rd.from_pandas(df).repartition(3), id_col="id",
        text_col="name", block_cols=["blk"], max_dist=2)
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert [tuple(r) for r in got.to_numpy()] == [
        (1, 2, 1), (1, 5, 1), (2, 5, 1)]


def test_tfidf_cosine_pairs_planted_and_capped(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.dedup import tfidf_cosine_pairs

    # docs 1/2 share most rare terms (high cosine); doc 3 disjoint;
    # "common" appears in EVERY doc → df over the cap → contributes
    # nothing (else 3 would pair with everyone)
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "common zebra quark nebula fjord",
            "common zebra quark nebula blimp",
            "common unrelated words entirely here",
            "common other stuff again altogether",
            "common zebra quark nebula fjord",   # exact dup of 1
        ],
    })
    got = (tfidf_cosine_pairs(rd.from_pandas(df).repartition(3),
                              threshold=0.3, df_cap=4)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (1, 5) in pairs and (1, 2) in pairs and (2, 5) in pairs
    assert all(a in (1, 2, 5) and b in (1, 2, 5) for a, b in pairs)
    exact = got.set_index(["id_a", "id_b"])["cos"]
    assert abs(exact[(1, 5)] - 1.0) < 1e-12
    assert 0.3 <= exact[(1, 2)] < 0.999
