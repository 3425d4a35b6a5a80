"""Unit tests for the round-3 additions: exact distributed quantiles,
grouped top-k on the sorted stitch, vocabulary heavy hitters, and
deterministic stratified sampling — each forced through multi-block
layouts so the boundary/stitch paths are exercised."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from sigraph_ray.stages.collect import sorted_grouped_topk
from sigraph_ray.stages.quantiles import exact_quantiles
from sigraph_ray.stages.sample import stratified_hash_sample
from sigraph_ray.stages.textstats import term_topk

QS = [0.01, 0.25, 0.5, 0.75, 0.99]


def _disc(values: np.ndarray, q: float) -> float:
    """DuckDB quantile_disc reference: idx = max(0, ceil(q*n) - 1)."""
    v = np.sort(values)
    n = len(v)
    return v[min(max(0, math.ceil(q * n) - 1), n - 1)]


@pytest.mark.parametrize("blocks", [1, 4, 9])
def test_exact_quantiles_matches_disc_rule(ray_session, blocks):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vals = np.round(rng.normal(100.0, 25.0, size=5000), 2)
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(blocks)
    out = exact_quantiles(ds, "x", QS)
    assert list(out["q"]) == QS
    for q, got in zip(out["q"], out["value"]):
        assert got == _disc(vals, q), q


def test_exact_quantiles_constant_column(ray_session):
    """Blocks with identical (first, last) signatures — the ambiguous
    block-order case — must still select the single repeated value."""
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"x": np.full(600, 3.5)})).repartition(5)
    out = exact_quantiles(ds, "x", [0.1, 0.9])
    assert list(out["value"]) == [3.5, 3.5]


@pytest.mark.parametrize("blocks,k", [(1, 2), (5, 2), (8, 3)])
def test_sorted_grouped_topk_matches_pandas(ray_session, blocks, k):
    import ray.data as rd

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.integers(0, 60, size=900),
        "score": np.round(rng.random(900) * 100, 3),
        "uid": np.arange(900),
    })
    want = df.sort_values(["g", "score", "uid"],
                          ascending=[True, False, True]).copy()
    want["rank"] = want.groupby("g").cumcount() + 1
    want = want[want["rank"] <= k].reset_index(drop=True)

    ds = rd.from_pandas(df.sample(frac=1, random_state=2)).repartition(blocks)
    got = sorted_grouped_topk(ds, key="g", order_by=["score", "uid"],
                              descending=[True, False], k=k).to_pandas()
    got = got.sort_values(["g", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["g", "score", "uid", "rank"]],
        want[["g", "score", "uid", "rank"]], check_dtype=False)


def test_sorted_grouped_topk_hot_key(ray_session):
    """One group spanning every block: fragments stitch to the true
    global top-k, and small groups keep all their rows."""
    import ray.data as rd

    df = pd.DataFrame({"g": ["hot"] * 400 + ["cold"],
                       "score": list(range(400)) + [5],
                       "uid": range(401)})
    ds = rd.from_pandas(df.sample(frac=1, random_state=3)).repartition(7)
    got = sorted_grouped_topk(ds, key="g", order_by=["score", "uid"],
                              descending=[True, False], k=3).to_pandas()
    hot = got[got["g"] == "hot"].sort_values("rank")
    assert list(hot["score"]) == [399, 398, 397]
    assert len(got[got["g"] == "cold"]) == 1


def test_term_topk_matches_pandas(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({"text": [
        "The cat and the dog", "Dog eats dog world", "a A a b B c",
        "numbers 42 42 42 and words", ""] * 10})
    want = (docs["text"].str.lower().str.findall(r"[a-z0-9]+")
            .explode().dropna().value_counts())
    want = (want.rename_axis("term").reset_index(name="freq")
            .sort_values(["freq", "term"], ascending=[False, True])
            .head(5).reset_index(drop=True))
    ds = rd.from_pandas(docs).repartition(4)
    got = term_topk(ds, k=5).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stratified_sample_deterministic_and_stratified(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(4000),
                       "lang": ["en", "de", "fr", "en"] * 1000})
    outs = []
    for blocks in (1, 6):
        ds = rd.from_pandas(df).repartition(blocks)
        out = stratified_hash_sample(
            ds, key="doc_id", stratum="lang",
            buckets={"en": 2}, default_buckets=4).to_pandas()
        outs.append(out.sort_values("doc_id").reset_index(drop=True))
    # identical rows at every block layout (pure function of the key)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    rates = outs[0]["lang"].value_counts() / df["lang"].value_counts()
    # en ≈ 2/16, minority ≈ 4/16 (binomial tolerance)
    assert abs(rates["en"] - 2 / 16) < 0.04
    assert abs(rates["de"] - 4 / 16) < 0.06
    assert abs(rates["fr"] - 4 / 16) < 0.06


def test_tfidf_topk_hand_checked(ray_session):
    import math

    import ray.data as rd

    from sigraph_ray.stages.textstats import tfidf_topk

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["apple apple banana", "banana cherry", "cherry cherry date"],
    })
    out = (tfidf_topk(rd.from_pandas(docs).repartition(3), k=2)
           .to_pandas().sort_values(["doc_id", "rank"])
           .reset_index(drop=True))
    # df: apple 1, banana 2, cherry 2, date 1; N=3
    top1 = out[out["doc_id"] == 1]
    assert list(top1["term"]) == ["apple", "banana"]
    assert top1["tfidf"].iloc[0] == pytest.approx(2 * math.log(3 / 1), abs=1e-6)
    # doc 3: date tf=1 df=1 → ln 3 ≈ 1.099 beats cherry tf=2 df=2 →
    # 2·ln 1.5 ≈ 0.811
    top3 = out[out["doc_id"] == 3]
    assert list(top3["term"]) == ["date", "cherry"]
    assert top3["tfidf"].iloc[0] == pytest.approx(math.log(3.0), abs=1e-6)


def test_tfidf_topk_block_invariant(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.textstats import tfidf_topk

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    docs = pd.DataFrame({
        "doc_id": np.arange(60),
        "text": [" ".join(rng.choice(vocab, size=rng.integers(5, 25)))
                 for _ in range(60)],
    })
    outs = []
    for blocks in (1, 5):
        out = (tfidf_topk(rd.from_pandas(docs).repartition(blocks), k=3)
               .to_pandas().sort_values(["doc_id", "rank"])
               .reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_sliding_window_peers_and_hot_key(ray_session):
    """RANGE frames include equal-ts peers (even later by tiebreak),
    and a key spanning every block resolves exactly in the stitch."""
    import ray.data as rd

    from sigraph_ray.stages.temporal import sliding_window_agg

    base = pd.Timestamp("2026-01-01")
    hr = pd.Timedelta("1h")
    df = pd.DataFrame({
        "k": ["u"] * 5 + ["w"] * 200,
        "ts": [base, base + hr / 2, base + hr / 2, base + 2 * hr,
               base + 2 * hr + pd.Timedelta("1us")]
        + [base + i * pd.Timedelta("10min") for i in range(200)],
        "uid": range(205),
        "v": [1.0] * 5 + [2.0] * 200,
    })
    got = (sliding_window_agg(
        rd.from_pandas(df.sample(frac=1, random_state=4)).repartition(6),
        key="k", ts="ts", tiebreak="uid", window="1h", value="v")
        .to_pandas().sort_values("uid").reset_index(drop=True))
    u = got[got["k"] == "u"]
    # row0: itself; rows 1-2: equal-ts peers BOTH counted for BOTH rows
    # (+ row0 in window); row3: only itself (gap > 1h from peers at
    # +30min? no — 2h-0.5h = 1.5h > 1h ⇒ only itself); row4: row3+itself
    assert list(u["n_window"]) == [1, 3, 3, 1, 2]
    w = got[got["k"] == "w"]
    # trailing 1h at 10min cadence: ramps 1..7 then stays 7 (inclusive)
    assert list(w["n_window"][:8]) == [1, 2, 3, 4, 5, 6, 7, 7]
    assert w["sum_value_window"].iloc[-1] == pytest.approx(14.0)


def test_broadcast_semi_anti_modes(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.joins import broadcast_semi_anti

    left = rd.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3, 4, 5], "v": list("abcde")}))
    right = rd.from_pandas(pd.DataFrame({"rk": [2, 4, 4, 9]}))
    semi = broadcast_semi_anti(left, right, left_key="k",
                               right_key="rk").to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    anti = broadcast_semi_anti(left, right, left_key="k",
                               right_key="rk", anti=True).to_pandas()
    assert sorted(anti["k"]) == [1, 3, 5]
    # empty probe side: semi keeps nothing, anti keeps everything
    empty = rd.from_pandas(pd.DataFrame({"rk": pd.Series(dtype="int64")}))
    assert len(broadcast_semi_anti(left, empty, left_key="k",
                                   right_key="rk").to_pandas()) == 0
    assert len(broadcast_semi_anti(left, empty, left_key="k",
                                   right_key="rk",
                                   anti=True).to_pandas()) == 5


def test_cms_heavy_hitters_vs_exact(ray_session):
    """On Zipf data the CM-sketch top-k equals the exact top-k and
    estimates only OVERcount, within the eN sketch bound."""
    import ray.data as rd

    from sigraph_ray.stages.sketch import approx_heavy_hitters

    rng = np.random.default_rng(9)
    vals = (rng.zipf(1.6, size=20000) % 500).astype(str)
    df = pd.DataFrame({"v": vals})
    exact = df["v"].value_counts()
    want = (exact.rename_axis("value").reset_index(name="freq")
            .sort_values(["freq", "value"], ascending=[False, True])
            .head(10).reset_index(drop=True))
    got = approx_heavy_hitters(
        rd.from_pandas(df).repartition(6), "v", k=10)
    assert list(got["value"]) == list(want["value"])
    over = got["est_freq"].to_numpy() - want["freq"].to_numpy()
    assert (over >= 0).all()                       # CM never undercounts
    assert over.max() <= np.e / 4096 * len(df) * 3  # well inside the bound


def test_cms_heavy_hitters_tokenized_layout_invariant_topk(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.sketch import approx_heavy_hitters

    docs = pd.DataFrame({"text": ["the quick brown fox the the"] * 30
                         + ["lazy dog the dog"] * 20})
    tops = []
    for blocks in (1, 5):
        got = approx_heavy_hitters(
            rd.from_pandas(docs).repartition(blocks), "text",
            k=4, tokenize=True)
        tops.append(got)
    pd.testing.assert_frame_equal(tops[0], tops[1])
    assert tops[0]["value"].iloc[0] == "the"
    assert tops[0]["est_freq"].iloc[0] >= 110


def test_bloom_semi_anti_exact_vs_broadcast(ray_session):
    """Bloom tier must agree exactly with the broadcast exact tier on
    string keys, in both semi and anti modes."""
    import ray.data as rd

    from sigraph_ray.stages.bloom import bloom_semi_anti
    from sigraph_ray.stages.joins import broadcast_semi_anti

    rng = np.random.default_rng(17)
    left = pd.DataFrame({"k": [f"key{int(i)}" for i in
                               rng.integers(0, 400, 3000)],
                         "v": np.arange(3000)})
    right = pd.DataFrame({"rk": [f"key{int(i)}" for i in
                                 rng.integers(0, 200, 500)]})
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(4)
    for anti in (False, True):
        got = (bloom_semi_anti(lds, rds, left_key="k", right_key="rk",
                               anti=anti, num_partitions=4)
               .to_pandas().sort_values("v").reset_index(drop=True))
        want = (broadcast_semi_anti(lds, rds, left_key="k",
                                    right_key="rk", anti=anti)
                .to_pandas().sort_values("v").reset_index(drop=True))
        pd.testing.assert_frame_equal(got[["k", "v"]], want[["k", "v"]])


def test_bloom_semi_anti_exact_under_heavy_false_positives(ray_session):
    """A deliberately tiny bitmap (64 bits, 500 keys → ~every probe is
    Bloom-positive) must still give the exact answer: the verify join
    carries correctness, the bloom only prunes."""
    import ray.data as rd

    from sigraph_ray.stages.bloom import bloom_semi_anti

    left = pd.DataFrame({"k": np.arange(1000, 2000, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 500, dtype=np.int64)})
    lds = rd.from_pandas(left).repartition(3)
    rds = rd.from_pandas(right).repartition(2)
    semi = bloom_semi_anti(lds, rds, left_key="k", right_key="k",
                           m_bits=64, k=2, num_partitions=4).to_pandas()
    assert len(semi) == 0          # disjoint key ranges
    anti = bloom_semi_anti(lds, rds, left_key="k", right_key="k",
                           anti=True, m_bits=64, k=2,
                           num_partitions=4).to_pandas()
    assert sorted(anti["k"]) == list(range(1000, 2000))


def test_approx_quantiles_rank_error_bound(ray_session):
    """Merged-summary quantiles stay within the documented rank-error
    bound (N/per_block + #blocks) of the exact answer."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import approx_quantiles

    rng = np.random.default_rng(11)
    x = np.sort(rng.lognormal(0.0, 1.0, size=60000))
    blocks = 8
    ds = rd.from_pandas(pd.DataFrame({"v": rng.permutation(x)})) \
        .repartition(blocks)
    per_block = 512
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    got = approx_quantiles(ds, "v", qs, per_block=per_block)
    bound = len(x) / per_block + blocks
    for q, v in zip(got["q"], got["value"]):
        target = min(max(0, int(np.ceil(q * len(x))) - 1), len(x) - 1)
        rank = np.searchsorted(x, v)
        assert abs(rank - target) <= bound, (q, rank, target)


def test_approx_quantiles_exact_on_tiny_blocks(ray_session):
    """When every block fits inside per_block the summary is lossless,
    so the result must equal the exact tier."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import approx_quantiles, \
        exact_quantiles

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"v": rng.integers(0, 1000, 5000).astype("int64")})
    ds = rd.from_pandas(df).repartition(7)
    qs = [0.1, 0.5, 0.9]
    got = approx_quantiles(ds, "v", qs, per_block=10000)
    want = exact_quantiles(ds, "v", qs)
    pd.testing.assert_frame_equal(got.astype({"value": "int64"}),
                                  want.astype({"value": "int64"}))


def test_grouped_approx_distinct_error_gate(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.sketch import grouped_approx_distinct

    rng = np.random.default_rng(61)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 30000, p=[0.6, 0.3, 0.1]),
        "u": rng.integers(0, 5000, 30000),
    })
    got = grouped_approx_distinct(
        rd.from_pandas(df).repartition(5), group="g", cols=["u"])
    exact = df.groupby("g")["u"].nunique()
    for _, row in got.iterrows():
        rel = abs(row["approx_distinct"] - exact[row["g"]]) \
            / exact[row["g"]]
        assert rel < 0.05, (row["g"], rel)
    # layout invariance: identical estimates at a different block count
    got2 = grouped_approx_distinct(
        rd.from_pandas(df).repartition(1), group="g", cols=["u"])
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  got2.reset_index(drop=True))


@pytest.mark.parametrize("blocks", [1, 5])
def test_grouped_hash_cap_bound_and_layout_invariant(ray_session, blocks):
    import ray.data as rd

    from sigraph_ray.stages.sample import grouped_hash_cap

    df = pd.DataFrame({
        "k": [f"id{i}" for i in range(300)],
        "g": [f"h{i % 3}" for i in range(300)],
    })
    out = (grouped_hash_cap(
        rd.from_pandas(df).repartition(blocks), key="k", group="g", k=7)
        .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True))
    # cap binds: exactly 7 per group, ranks 1..7
    assert out.groupby("g").size().eq(7).all()
    assert (out.groupby("g")["rank"].apply(list)
            .map(lambda r: r == list(range(1, 8))).all())
    # pure function of content: matches the hand-computed md5 order
    from sigraph_ray.functions.hashing import md5_hex
    ref = df.assign(h=md5_hex(df["k"].tolist()))
    ref = (ref.sort_values(["g", "h", "k"])
           .groupby("g").head(7))
    assert set(map(tuple, out[["g", "k"]].to_numpy())) == \
        set(map(tuple, ref[["g", "k"]].to_numpy()))


def test_grouped_hash_cap_degenerate_group(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.sample import grouped_hash_cap

    # one group owns 95% of rows — fragments stay capped at k
    df = pd.DataFrame({
        "k": [f"id{i}" for i in range(400)],
        "g": ["hot"] * 380 + [f"cold{i}" for i in range(20)],
    })
    out = grouped_hash_cap(rd.from_pandas(df).repartition(8),
                           key="k", group="g", k=5).to_pandas()
    assert (out[out.g == "hot"].shape[0] == 5
            and out[out.g != "hot"].shape[0] == 20)


@pytest.mark.parametrize("blocks", [1, 6])
def test_temperature_mixture_rates(ray_session, blocks):
    import ray.data as rd

    from sigraph_ray.stages.sample import temperature_mixture

    # skewed strata: 1600 / 400 / 100 → keep rates 0.25 / 0.5 / 1.0
    rows = ([("a", i) for i in range(1600)]
            + [("b", i) for i in range(1600, 2000)]
            + [("c", i) for i in range(2000, 2100)])
    df = pd.DataFrame(rows, columns=["s", "k"])
    out = temperature_mixture(
        rd.from_pandas(df).repartition(blocks),
        key="k", stratum="s", alpha=0.5).to_pandas()
    kept = out.groupby("s").size()
    # rarest stratum fully kept (rate exactly 1.0)
    assert kept["c"] == 100
    # md5 is uniform: kept fraction within ±6 pp of sqrt(n_min/n_s)
    assert abs(kept["a"] / 1600 - 0.25) < 0.06
    assert abs(kept["b"] / 400 - 0.5) < 0.06
    # layout invariance: pure function of the key
    out1 = temperature_mixture(rd.from_pandas(df).repartition(1),
                               key="k", stratum="s",
                               alpha=0.5).to_pandas()
    assert set(out["k"]) == set(out1["k"])


def test_profile_table_exact_and_nulls(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.profile import profile_table

    df = pd.DataFrame({
        "i": [9, 10, 2, None, 5],          # numeric min must not be lexical
        "s": ["b", None, "a", "z", None],
    })
    out = profile_table(rd.from_pandas(df).repartition(3), ["i", "s"])
    r = {row["col"]: row for _, row in out.iterrows()}
    assert r["i"]["n_rows"] == 5 and r["i"]["n_null"] == 1
    assert float(r["i"]["min_value"]) == 2 and float(r["i"]["max_value"]) == 10
    assert r["s"]["n_rows"] == 5 and r["s"]["n_null"] == 2
    assert r["s"]["min_value"] == "a" and r["s"]["max_value"] == "z"


def test_profile_table_all_null_column(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.profile import profile_table

    df = pd.DataFrame({"x": pd.Series([None, None], dtype="object")})
    out = profile_table(rd.from_pandas(df).repartition(2), ["x"])
    row = out.iloc[0]
    assert row["n_null"] == 2 and row["min_value"] is None \
        and row["max_value"] is None


def test_pmi_collocations_hand_values(ray_session):
    """PMI against an independent Counter-based computation on a tiny
    planted corpus: 'san francisco' is a perfect collocation (every
    occurrence of either word is in the pair), 'the data' is frequent
    but independent — PMI must rank the planted pair first."""
    import math
    from collections import Counter

    import ray.data as rd

    from sigraph_ray.stages.textstats import pmi_collocations

    docs = (["san francisco is far from here you know"] * 4
            + ["the data and the data and the story of the data"] * 4)
    out = pmi_collocations(
        rd.from_pandas(pd.DataFrame({"text": docs})).repartition(3),
        min_count=3, k=20)

    toks = [d.split() for d in docs]
    uni = Counter(t for ts in toks for t in ts)
    bi = Counter((a, b) for ts in toks for a, b in zip(ts, ts[1:]))
    n = sum(uni.values())
    want = {(a, b): math.log(c * n / (uni[a] * uni[b]))
            for (a, b), c in bi.items() if c >= 3}
    got = {(r["w1"], r["w2"]): r["pmi"] for _, r in out.iterrows()}
    assert set(got) == set(want)
    for k_, v in want.items():
        assert abs(got[k_] - v) < 1e-12, k_
    assert (out.iloc[0]["w1"], out.iloc[0]["w2"]) != ("the", "data")
    assert ("san", "francisco") in got


def test_skyline_vs_bruteforce(ray_session):
    """Partial-skyline merge vs the quadratic NOT-EXISTS definition on
    a seeded random set with planted ties (duplicate non-dominated
    pairs must BOTH survive; equal-price-worse-size must drop)."""
    import ray.data as rd

    from sigraph_ray.stages.stats import skyline

    rng = np.random.RandomState(7)
    df = pd.DataFrame({"id": np.arange(60),
                       "lo": rng.randint(0, 12, 60).astype("float64"),
                       "hi": rng.randint(0, 12, 60)})
    # planted: duplicate pair at an extreme corner → both survive
    df = pd.concat([df, pd.DataFrame({"id": [100, 101],
                                      "lo": [-1.0, -1.0],
                                      "hi": [99, 99]})],
                   ignore_index=True)
    got = (skyline(rd.from_pandas(df).repartition(5),
                   minimize="lo", maximize="hi")
           .to_pandas().sort_values("id").reset_index(drop=True))
    keep = []
    for _, p in df.iterrows():
        dominated = ((df["lo"] <= p["lo"]) & (df["hi"] >= p["hi"])
                     & ((df["lo"] < p["lo"]) | (df["hi"] > p["hi"])))
        if not dominated.any():
            keep.append(p["id"])
    want = df[df["id"].isin(keep)].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert {100, 101}.issubset(set(got["id"]))


def test_frequent_pairs_hand_counts(ray_session):
    """Hand-counted baskets: (a,b) co-occurs in 3 baskets, (a,c) in 2,
    (b,c) in 1 (below min_support); duplicate items inside one basket
    count once."""
    import ray.data as rd

    from sigraph_ray.stages.itemsets import frequent_pairs

    rows = [(1, "a"), (1, "b"), (1, "c"), (1, "a"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b"),
            (4, "a"), (4, "c")]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["g", "i"])).repartition(3)
    out = frequent_pairs(ds, group="g", item="i", min_support=2, k=10)
    got = {(r.p1, r.p2): r.support for r in out.itertuples()}
    assert got == {("a", "b"): 3, ("a", "c"): 2}
    assert out.iloc[0]["support"] == 3


def test_frequent_pairs_basket_cap_drops_degenerate_group(ray_session):
    """A degenerate giant basket is dropped by max_basket instead of
    expanding quadratically; normal baskets are unaffected."""
    import ray.data as rd

    from sigraph_ray.stages.itemsets import frequent_pairs

    rows = [(99, f"x{j}") for j in range(50)]          # giant basket
    rows += [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["g", "i"])).repartition(4)
    out = frequent_pairs(ds, group="g", item="i", min_support=2, k=10,
                         max_basket=10)
    got = {(r.p1, r.p2): r.support for r in out.itertuples()}
    assert got == {("a", "b"): 2}


def test_chi2_independence_hand_value(ray_session):
    """χ² against a hand-computed 2×2 contingency table, including a
    zero-observed cell (which still contributes its expected mass)."""
    import ray.data as rd

    from sigraph_ray.stages.stats import chi2_independence

    # obs: (x,1)=10, (x,2)=20, (y,1)=30, (y,2)=0
    df = pd.DataFrame({"a": ["x"] * 30 + ["y"] * 30,
                       "b": [1] * 10 + [2] * 20 + [1] * 30})
    out = chi2_independence(rd.from_pandas(df).repartition(4),
                            a="a", b="b").to_pandas()
    obs = np.array([[10.0, 20.0], [30.0, 0.0]])
    exp = np.outer(obs.sum(1), obs.sum(0)) / obs.sum()
    want = (((obs - exp) ** 2) / exp).sum()
    assert out.shape == (1, 3)
    assert abs(out.iloc[0]["chi2"] - want) < 1e-9
    assert out.iloc[0]["dof"] == 1 and out.iloc[0]["n"] == 60


def test_gazetteer_mentions_counts_and_boundaries(ray_session):
    """Word-boundary + non-overlap semantics: 'scan' must not match
    inside 'rescan'; multi-word phrases count non-overlapping hits;
    absent terms report explicit zeros."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import gazetteer_mentions

    docs = ["table scan then table scan again", "a rescan happened",
            "Table Scan uppercase"]
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(2)
    out = gazetteer_mentions(ds, ["table scan", "scan", "ghost"])
    got = {r.term: (r.n_mentions, r.n_docs) for r in out.itertuples()}
    assert got == {"table scan": (3, 2), "scan": (3, 2),
                   "ghost": (0, 0)}


def _emb_frame(n=120, d=6, seed=3):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d) * np.linspace(3.0, 0.5, d)  # distinct spectrum
    y = (x[:, 0] > 0).astype("int64") + 2 * (x[:, 1] > 0).astype("int64")
    return pd.DataFrame({"vec_id": np.arange(n),
                         "embedding": [r.astype("float32") for r in x],
                         "label": y})


def test_covariance_matrix_vs_numpy(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.linalg import covariance_matrix

    df = _emb_frame()
    out = covariance_matrix(
        rd.from_pandas(df).repartition(5)).to_pandas()
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    want = np.cov(x, rowvar=False, ddof=1)
    assert len(out) == 6 * 7 // 2
    for r in out.itertuples():
        assert abs(r.cov - want[r.i - 1, r.j - 1]) < 1e-9


def test_pca_project_vs_numpy(ray_session):
    """Distributed PCA equals the single-process eigendecomposition
    under the same sign convention; components capture decreasing
    variance."""
    import ray.data as rd

    from sigraph_ray.stages.linalg import pca_project

    df = _emb_frame()
    got = (pca_project(rd.from_pandas(df).repartition(5),
                       n_components=3)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    xc = x - x.mean(axis=0)
    w, v = np.linalg.eigh(np.cov(x, rowvar=False, ddof=1))
    order = np.argsort(w)[::-1][:3]
    comps = v[:, order]
    comps = comps * np.sign(comps[np.abs(comps).argmax(axis=0),
                                  np.arange(3)])
    want = xc @ comps
    np.testing.assert_allclose(
        got[["pc1", "pc2", "pc3"]].to_numpy(), want, atol=1e-8)
    vars_ = got[["pc1", "pc2", "pc3"]].var().to_numpy()
    assert vars_[0] > vars_[1] > vars_[2]


def test_softmax_train_vs_numpy(ray_session):
    """Distributed full-batch GD matches the single-process loop
    step-for-step and learns (accuracy strictly improves on a
    separable planted labeling)."""
    import ray.data as rd

    from sigraph_ray.stages.linalg import softmax_train

    df = _emb_frame()
    norms, hist, (w_got, b_got) = softmax_train(
        rd.from_pandas(df).repartition(4), n_classes=4,
        lr=0.5, epochs=15)

    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    y = df["label"].to_numpy()
    w = np.zeros((6, 4)); b = np.zeros(4)
    for _ in range(15):
        z = x @ w + b
        z -= z.max(axis=1, keepdims=True)
        p = np.exp(z); p /= p.sum(axis=1, keepdims=True)
        oh = np.zeros_like(p); oh[np.arange(len(y)), y] = 1.0
        w -= 0.5 * (x.T @ (p - oh)) / len(y)
        b -= 0.5 * (p - oh).sum(axis=0) / len(y)
    np.testing.assert_allclose(w_got, w, atol=1e-8)
    np.testing.assert_allclose(b_got, b, atol=1e-8)
    assert hist["accuracy"].iloc[-1] > hist["accuracy"].iloc[0]
    assert hist["loss"].iloc[-1] < hist["loss"].iloc[0]
    assert len(norms) == 4


def test_jaccard_neighbors_hand_values(ray_session):
    """groups: a∈{1,2,3}, b∈{1,2,4}, c∈{1,2}: J(a,b)=2/4, J(a,c)=2/3,
    J(b,c)=2/3 — ranked by (jaccard DESC, p1, p2)."""
    import ray.data as rd

    from sigraph_ray.stages.itemsets import jaccard_neighbors

    rows = [(1, "a"), (2, "a"), (3, "a"),
            (1, "b"), (2, "b"), (4, "b"),
            (1, "c"), (2, "c")]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["g", "i"])).repartition(3)
    out = jaccard_neighbors(ds, group="g", item="i", min_common=2, k=10)
    got = [(r.p1, r.p2, r.common, round(r.jaccard, 9))
           for r in out.itertuples()]
    assert got == [("a", "c", 2, round(2 / 3, 9)),
                   ("b", "c", 2, round(2 / 3, 9)),
                   ("a", "b", 2, 0.5)]


def test_association_rules_hand_values(ray_session):
    """N=5 baskets {ab, ab, ac, ac, b}: supp(a)=4, supp(b)=3,
    supp(c)=2, supp(ab)=supp(ac)=2 → lift(a,b)=2·5/(4·3)=5/6,
    lift(a,c)=2·5/(4·2)=1.25; directions share lift but not
    confidence (conf(c→a)=1 vs conf(a→c)=0.5)."""
    import ray.data as rd

    from sigraph_ray.stages.itemsets import association_rules

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"),
            (3, "a"), (3, "c"), (4, "a"), (4, "c"),
            (5, "b"), (3, "a")]            # dup inside basket ignored
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["g", "i"])).repartition(3)
    out = association_rules(ds, group="g", item="i",
                            min_support=2, k=10)
    got = {(r.ant, r.cons): (r.support, round(r.confidence, 9),
                             round(r.lift, 9)) for r in out.itertuples()}
    assert got == {
        ("a", "b"): (2, 0.5, round(5 / 6, 9)),
        ("b", "a"): (2, round(2 / 3, 9), round(5 / 6, 9)),
        ("a", "c"): (2, 0.5, 1.25),
        ("c", "a"): (2, 1.0, 1.25),
    }
    # ranked by lift first
    assert round(out.iloc[0]["lift"], 9) == 1.25


def test_mention_snippets_positions_and_windows(ray_session):
    """First-occurrence position is 1-based; the window clamps at the
    string start; case-insensitive match returns the ORIGINAL text."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import mention_snippets

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["Spark at start", "no match here",
                 "x" * 30 + " spark tail spark"]})
    out = mention_snippets(rd.from_pandas(docs).repartition(2),
                           ["spark"], window=5, k=10)
    got = {r.doc_id: (r.pos, r.snippet) for r in out.itertuples()}
    # doc 1: pos 1, window clamps to start, extends 5 past the term
    assert got[1] == (1, "Spark at s")
    # doc 3: first occurrence only (pos 32 — 30 x's + the space),
    # window covers chars 27..41: 4 x's, the space, term, " tail"
    assert got[3] == (32, "xxxx spark tail")
    assert 2 not in got


def test_bm25_hand_values(ray_session):
    """BM25 against an independent Counter-based computation on a tiny
    corpus; token-exact matching ('join' must not hit 'joins')."""
    from collections import Counter

    import ray.data as rd

    from sigraph_ray.stages.textstats import bm25_topk

    docs = ["spark join spark", "joins only here", "spark and nothing",
            "join join join join", "totally unrelated text"]
    terms = ["spark", "join"]
    out = bm25_topk(
        rd.from_pandas(pd.DataFrame({"doc_id": range(5), "text": docs}))
        .repartition(3), terms, k=5)

    toks = [d.split() for d in docs]
    n = len(docs)
    avgdl = sum(len(t) for t in toks) / n
    want = {}
    for i, ts in enumerate(toks):
        c = Counter(ts)
        s = 0.0
        for t in terms:
            df_t = sum(1 for tt in toks if t in tt)
            idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
            tf = c[t]
            s += idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * len(ts) / avgdl))
        want[i] = s
    got = dict(zip(out["doc_id"], out["score"]))
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-12, i
    # doc 1 ('joins only here') scores 0 — token-exact
    assert abs(got[1]) < 1e-12
    # tf saturation: the two-term doc beats four repeats of one term
    assert out.iloc[0]["doc_id"] == 0
    assert want[0] > want[3] > 0


def test_user_trigrams_hand_counts(ray_session):
    """Trigram counts respect per-user ordering and never cross
    users."""
    import ray.data as rd
    from sigraph_ray.pipelines.queries import q_user_trigrams  # noqa: F401
    from sigraph_ray.stages.collect import sorted_collect, sorted_groupby_sum

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2, 2],
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "event_type": ["a", "b", "a", "b", "a", "b", "a"]})
    seqs = sorted_collect(rd.from_pandas(ev).repartition(3),
                          key="user_id", order_col="event_id",
                          value="event_type")

    def grams(df):
        s = df["values"].explode().dropna().astype(str)
        g2 = s.groupby(level=0).shift(-1)
        g3 = s.groupby(level=0).shift(-2)
        gram = (s + ">" + g2 + ">" + g3).dropna()
        vc = gram.value_counts()
        return pd.DataFrame({"gram": vc.index.astype(str),
                             "c": vc.to_numpy().astype("int64")})

    out = sorted_groupby_sum(
        seqs.map_batches(grams, batch_format="pandas"),
        key="gram", sum_cols={"cnt": "c"}).to_pandas()
    got = dict(zip(out["gram"], out["cnt"].astype(int)))
    # user1: a>b>a, b>a>b; user2: a>b>a — no cross-user b>a>a etc.
    assert got == {"a>b>a": 2, "b>a>b": 1}


def test_hits_matches_dense_power_iteration(ray_session):
    """Distributed HITS equals the dense adjacency-matrix iteration
    step-for-step (same init, normalization, iteration count), with
    parallel edges counted once each."""
    import ray.data as rd

    from sigraph_ray.stages.graphalgo import hits

    edges = pd.DataFrame({
        "src": ["a", "a", "b", "c", "c", "d", "a"],
        "dst": ["b", "c", "c", "d", "b", "a", "b"]})  # a→b twice
    got = (hits(rd.from_pandas(edges).repartition(3), n_iter=8)
           .sort_values("node").reset_index(drop=True))

    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    ix = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((4, 4))
    for s, d in edges.itertuples(index=False):
        A[ix[s], ix[d]] += 1.0   # multigraph: parallel edges add
    h = np.full(4, 0.5); a = np.full(4, 0.5)
    for _ in range(8):
        a = A.T @ h; a /= np.linalg.norm(a)
        h = A @ a; h /= np.linalg.norm(h)
    np.testing.assert_allclose(got["authority"].to_numpy(), a, atol=1e-10)
    np.testing.assert_allclose(got["hub"].to_numpy(), h, atol=1e-10)
    # sanity: node b is the strongest authority (3 in-edges incl dup)
    assert got.loc[got["authority"].idxmax(), "node"] == "b"


def test_ks_two_sample_hand_values(ray_session):
    """Disjoint supports → KS = 1; identical samples → KS = 0; a
    half-shifted case matches the hand ECDF computation."""
    import ray.data as rd

    from sigraph_ray.stages.stats import ks_two_sample

    def run(va, vb):
        df = pd.DataFrame({"v": va + vb,
                           "g": ["a"] * len(va) + ["b"] * len(vb)})
        out = ks_two_sample(rd.from_pandas(df).repartition(3),
                            value="v", group="g", a="a", b="b").to_pandas()
        return out.iloc[0]

    r = run([1, 2, 3], [10, 11, 12])
    assert r["ks"] == 1.0 and r["n1"] == 3 and r["n2"] == 3
    r = run([1, 2, 3, 4], [1, 2, 3, 4])
    assert r["ks"] == 0.0
    # a={1,2,3,4}, b={3,4,5,6}: at v=2 F_a=0.5, F_b=0 → KS=0.5
    r = run([1, 2, 3, 4], [3, 4, 5, 6])
    assert abs(r["ks"] - 0.5) < 1e-12


def test_rrf_fuse_hand_values(ray_session):
    from sigraph_ray.stages.textstats import rrf_fuse

    a = pd.DataFrame({"doc_id": [10, 20, 30], "rank": [1, 2, 3]})
    b = pd.DataFrame({"doc_id": [20, 40], "rank": [1, 2]})
    out = rrf_fuse([a, b], id_col="doc_id", c=60, k=10)
    got = dict(zip(out["doc_id"], out["rrf"]))
    assert abs(got[20] - (1 / 62 + 1 / 61)) < 1e-15
    assert abs(got[10] - 1 / 61) < 1e-15
    assert abs(got[40] - 1 / 62) < 1e-15
    assert out.iloc[0]["doc_id"] == 20  # appears in both lists


def test_charclass_entropy_hand_values(ray_session):
    """Single-class docs score H=0; a 50/50 two-class doc scores ln 2;
    empty docs count with H=0 (both engines keep them)."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import charclass_entropy_by_source

    docs = pd.DataFrame({
        "source": ["s1", "s1", "s2", "s3"],
        "text": ["aaaa", "ab12", "aa11", ""]})
    out = charclass_entropy_by_source(
        rd.from_pandas(docs).repartition(2))
    got = dict(zip(out["source"], out["mean_entropy"]))
    # s1: doc1 H=0 (all alpha); doc2 half alpha half digit → ln 2
    assert abs(got["s1"] - math.log(2) / 2) < 1e-12
    assert abs(got["s2"] - math.log(2)) < 1e-12
    assert got["s3"] == 0.0
    assert dict(zip(out["source"], out["n_docs"])) == \
        {"s1": 2, "s2": 1, "s3": 1}


def test_lexical_diversity_hand_values(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.textstats import lexical_diversity_by_source

    docs = pd.DataFrame({
        "source": ["s1", "s1", "s2", "s2"],
        "text": ["a b c d", "a a a a", "x y", "!!!"]})  # last: no tokens
    out = lexical_diversity_by_source(
        rd.from_pandas(docs).repartition(2))
    got = dict(zip(out["source"], out["mean_ttr"]))
    assert abs(got["s1"] - (1.0 + 0.25) / 2) < 1e-12
    assert got["s2"] == 1.0
    assert dict(zip(out["source"], out["n_docs"])) == {"s1": 2, "s2": 1}


def test_mmr_displaces_near_duplicate(ray_session):
    """Greedy MMR must pick the distinct mid-relevance doc over an
    exact duplicate of the top hit; pure-relevance order would not."""
    from sigraph_ray.stages.textstats import mmr_diversify

    cand = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["spark streaming joins explained",
                 "spark streaming joins explained",   # dup of #1
                 "completely different topic entirely"],
        "score": [10.0, 9.9, 5.0]})
    out = mmr_diversify(cand, id_col="doc_id", text_col="text",
                        score_col="score", k=2, lam=0.5)
    assert list(out["doc_id"]) == [1, 3]
    # and with lam=1.0 (pure relevance) the duplicate wins instead
    out2 = mmr_diversify(cand, id_col="doc_id", text_col="text",
                         score_col="score", k=2, lam=1.0)
    assert list(out2["doc_id"]) == [1, 2]


def test_negative_samples_properties(ray_session):
    """Negatives are layout-invariant (pure function of triple bytes),
    never equal the true tail, and never collide with ANY true edge."""
    import ray.data as rd

    from sigraph_ray.stages.kgtrain import negative_samples

    rng = np.random.RandomState(11)
    edges = pd.DataFrame({
        "src": [f"s{i % 7}" for i in range(60)],
        "type": [["CALLS", "READS"][i % 2] for i in range(60)],
        "dst": [f"d{rng.randint(0, 12)}" for i in range(60)],
    }).drop_duplicates()
    true_set = set(map(tuple, edges.to_numpy()))

    outs = []
    for blocks in (1, 5):
        out = (negative_samples(rd.from_pandas(edges).repartition(blocks))
               .to_pandas()
               .sort_values(["src", "type", "neg_dst"])
               .reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    assert len(got) > 0
    ents = set(edges["dst"])
    for s, t, nd in got.to_numpy():
        assert (s, t, nd) not in true_set
        assert nd in ents


def test_transe_epoch_matches_numpy(ray_session):
    """The distributed TransE epoch equals a single-process numpy
    epoch (same hash init, same deterministic corruption) and the
    margin loss drops after the SGD step."""
    import ray.data as rd

    from sigraph_ray.stages.kgtrain import _h16, _init_vecs, transe_epoch

    rng = np.random.RandomState(5)
    edges = pd.DataFrame({
        "src": [f"s{i % 6}" for i in range(40)],
        "type": [["R1", "R2"][i % 2] for i in range(40)],
        "dst": [f"d{rng.randint(0, 9)}" for i in range(40)],
    }).drop_duplicates().reset_index(drop=True)

    summary, (ent_ids, E2), (rel_ids, R2) = transe_epoch(
        rd.from_pandas(edges).repartition(4), dim=8, lr=0.1, margin=1.0)

    # --- independent numpy replay ---------------------------------------
    ents = np.sort(pd.unique(pd.concat([edges["dst"], edges["src"]])))
    rels = np.sort(edges["type"].unique())
    E = _init_vecs(ents, 8, "ent")
    R = _init_vecs(rels, 8, "rel")
    eix = {e: i for i, e in enumerate(ents)}
    rix = {r: i for i, r in enumerate(rels)}
    keys = (edges["src"] + "|" + edges["type"] + "|" + edges["dst"]).tolist()
    neg = [ents[h % len(ents)] for h in _h16(keys)]
    gE = np.zeros_like(E); gR = np.zeros_like(R)
    loss0 = 0.0; n = 0
    for (s, t, d), nd in zip(edges.to_numpy(), neg):
        if nd == d:
            continue
        n += 1
        dp = E[eix[s]] + R[rix[t]] - E[eix[d]]
        dn = E[eix[s]] + R[rix[t]] - E[eix[nd]]
        m = 1.0 + np.linalg.norm(dp) - np.linalg.norm(dn)
        if m > 0:
            loss0 += m
            u = dp / np.linalg.norm(dp) if np.linalg.norm(dp) > 0 else 0
            v = dn / np.linalg.norm(dn) if np.linalg.norm(dn) > 0 else 0
            gE[eix[s]] += u - v
            gE[eix[d]] -= u
            gE[eix[nd]] += v
            gR[rix[t]] += u - v
    E_want = E - 0.1 * gE
    R_want = R - 0.1 * gR

    assert list(ent_ids) == list(ents) and list(rel_ids) == list(rels)
    np.testing.assert_allclose(E2, E_want, atol=1e-9)
    np.testing.assert_allclose(R2, R_want, atol=1e-9)
    assert summary["n_pairs"].iloc[0] == n
    assert abs(summary["loss_before"].iloc[0] - loss0 / n) < 1e-9
    assert summary["loss_after"].iloc[0] < summary["loss_before"].iloc[0]


def test_transe_rank_eval_matches_numpy(ray_session):
    """Raw MRR/Hits@k equal the dense numpy ranking (squared-distance
    ranks, deterministic tie-break by entity order)."""
    import ray.data as rd

    from sigraph_ray.stages.kgtrain import _init_vecs, transe_rank_eval

    rng = np.random.RandomState(9)
    edges = pd.DataFrame({
        "src": [f"s{i % 5}" for i in range(30)],
        "type": [["R1", "R2"][i % 2] for i in range(30)],
        "dst": [f"d{rng.randint(0, 8)}" for i in range(30)],
    }).drop_duplicates().reset_index(drop=True)
    ents = np.sort(pd.unique(pd.concat([edges["dst"], edges["src"]])))
    rels = np.sort(edges["type"].unique())
    E = _init_vecs(ents, 8, "ent")
    R = _init_vecs(rels, 8, "rel")

    out = transe_rank_eval(
        rd.from_pandas(edges).repartition(3),
        ents, E, rels, R)

    eix = {e: i for i, e in enumerate(ents)}
    rix = {r: i for i, r in enumerate(rels)}
    en = (E * E).sum(axis=1)
    rr, h1, h10 = [], 0, 0
    for s, t, d in edges.to_numpy():
        q = E[eix[s]] + R[rix[t]]
        d2 = en - 2.0 * (E @ q)
        dt = d2[eix[d]]
        rank = 1 + int((d2 < dt).sum()) + int(
            ((d2 == dt) & (np.arange(len(ents)) < eix[d])).sum())
        rr.append(1.0 / rank)
        h1 += rank <= 1
        h10 += rank <= 10
    assert abs(out["mrr"].iloc[0] - np.mean(rr)) < 1e-12
    assert abs(out["hits1"].iloc[0] - h1 / len(edges)) < 1e-12
    assert abs(out["hits10"].iloc[0] - h10 / len(edges)) < 1e-12
    assert out["n"].iloc[0] == len(edges)


def test_random_walks_valid_and_deterministic(ray_session):
    """Every consecutive walk pair is a true edge (or a sink
    self-stay), each step matches an independent hash replay, and the
    corpus is identical at different block layouts."""
    import ray.data as rd

    from sigraph_ray.stages.kgtrain import _h16, random_walks

    edges = pd.DataFrame({
        "src": ["a", "a", "b", "c", "c", "d"],
        "dst": ["b", "c", "c", "d", "a", "e"]})  # e is a sink
    adj = {s: sorted(g["dst"]) for s, g in edges.groupby("src")}

    outs = []
    for blocks in (1, 3):
        out = (random_walks(rd.from_pandas(edges).repartition(blocks),
                            length=3)
               .to_pandas().sort_values("walk_id")
               .reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    assert set(got["walk_id"]) == {"a", "b", "c", "d", "e"}
    for wid, path in got[["walk_id", "path"]].to_numpy():
        nodes = path.split(">")
        assert len(nodes) == 4 and nodes[0] == wid
        cur = wid
        for step, nxt in enumerate(nodes[1:]):
            if cur in adj:
                want = adj[cur][int(_h16([f"{wid}|{step}"])[0])
                                % len(adj[cur])]
                assert nxt == want, (wid, step)
            else:
                assert nxt == cur  # sink self-stay
            cur = nxt


def test_gini_hand_values(ray_session):
    """Perfect equality → 0; extreme concentration → →1; a hand case
    matches the rank-sum identity; layout-invariant."""
    import ray.data as rd

    from sigraph_ray.stages.stats import gini_coefficient

    def run(vals, blocks=3):
        ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(blocks)
        return gini_coefficient(ds, value="v").iloc[0]["gini"]

    assert abs(run([5.0] * 40)) < 1e-12
    # one holder of everything among n: G = (n-1)/n
    assert abs(run([0.0] * 9 + [100.0]) - 0.9) < 1e-12
    # hand case [1,2,3,4]: G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    assert abs(run([1.0, 2.0, 3.0, 4.0]) - 0.25) < 1e-12
    assert abs(run([1.0, 2.0, 3.0, 4.0], blocks=1)
               - run([4.0, 3.0, 2.0, 1.0], blocks=4)) < 1e-15


def test_hits_join_tier_matches_broadcast(ray_session):
    """The dataset-resident join tier produces the same hubs and
    authorities as the broadcast tier (which is itself gated against
    the dense power iteration)."""
    import ray.data as rd

    from sigraph_ray.stages.graphalgo import hits, hits_join_tier

    edges = pd.DataFrame({
        "src": ["a", "a", "b", "c", "c", "d", "a", "e"],
        "dst": ["b", "c", "c", "d", "b", "a", "b", "a"]})
    ds = rd.from_pandas(edges).repartition(3)
    want = hits(ds, n_iter=5).sort_values("node").reset_index(drop=True)
    got = (hits_join_tier(ds, n_iter=5, num_partitions=4).to_pandas()
           .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["node", "hub", "authority"]],
        want[["node", "hub", "authority"]], check_dtype=False,
        atol=1e-9, rtol=1e-9)


def test_grouped_gap_stats_seams(ray_session):
    """Gaps crossing block seams are stitched exactly; max/mean/count
    match a hand computation."""
    import ray.data as rd

    from sigraph_ray.stages.temporal import grouped_gap_stats

    base = pd.Timestamp("2026-01-01")
    rows = []
    for i, off in enumerate([0, 10, 40, 41]):          # gaps 10,30,1 s
        rows.append(("a", base + pd.Timedelta(seconds=off), i))
    rows.append(("b", base, 100))                      # single: no gap
    df = pd.DataFrame(rows, columns=["k", "ts", "uid"])
    out = (grouped_gap_stats(
        rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(4),
        key="k", ts="ts", tiebreak="uid")
        .sort_values("k").reset_index(drop=True))
    assert list(out["k"]) == ["a"]
    r = out.iloc[0]
    assert r["n_gaps"] == 3
    assert abs(r["mean_gap_s"] - (10 + 30 + 1) / 3) < 1e-9
    assert abs(r["max_gap_s"] - 30.0) < 1e-12


def test_mutual_information_hand_value(ray_session):
    """Independent columns → MI 0; a deterministic mapping →
    MI = H(marginal)."""
    import ray.data as rd

    from sigraph_ray.stages.stats import mutual_information

    ind = pd.DataFrame({"a": ["x", "x", "y", "y"] * 10,
                        "b": [1, 2, 1, 2] * 10})
    out = mutual_information(rd.from_pandas(ind).repartition(3),
                             a="a", b="b").to_pandas()
    assert abs(out.iloc[0]["mi"]) < 1e-12
    dep = pd.DataFrame({"a": ["x", "y", "z"] * 10,
                        "b": [1, 2, 3] * 10})
    out = mutual_information(rd.from_pandas(dep).repartition(3),
                             a="a", b="b").to_pandas()
    assert abs(out.iloc[0]["mi"] - math.log(3)) < 1e-12


def test_weighted_quantiles_hand_values(ray_session):
    """min v with F(v) ≥ q·W on a hand-weighted set: values 1,2,3 with
    weights 10,10,80 → q=0.5 falls on 3, q=0.1 on 1, q=0.2 on 2."""
    import ray.data as rd

    from sigraph_ray.stages.quantiles import weighted_quantiles

    df = pd.DataFrame({"v": [1, 2, 3], "w": [10, 10, 80]})
    out = weighted_quantiles(
        rd.from_pandas(df).repartition(2), value="v", weight="w",
        qs=[0.1, 0.2, 0.5, 1.0])
    got = dict(zip(out["q"], out["value"]))
    assert got == {0.1: 1, 0.2: 2, 0.5: 3, 1.0: 3}


def test_knn_label_prop_separable_corpus(ray_session, tmp_path):
    """On a separable planted embedding set, two propagation rounds
    label every non-seed vector correctly; the run is layout-invariant
    by construction (hash seeds, deterministic votes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sigraph_ray.pipelines.queries import q_knn_label_prop

    rng = np.random.RandomState(3)
    n_per, d = 40, 16
    vecs, labels = [], []
    for c in range(3):
        center = np.zeros(d); center[c] = 10.0
        vecs.append(center + 0.1 * rng.randn(n_per, d))
        labels += [c] * n_per
    x = np.vstack(vecs).astype("float32")
    tbl = pa.table({
        "vec_id": pa.array(range(len(labels)), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.ravel(), pa.float32()), d),
        "label": pa.array(labels, pa.int32())})
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    out = q_knn_label_prop(str(tmp_path))
    assert (out["coverage"] == 1.0).all()
    assert (out["accuracy"] == 1.0).all()
    assert out["n_nonseed"].sum() == len(labels) - len(labels) // 5


def test_weighted_quantiles_ranked_matches_grouped_tier(ray_session):
    """The continuous-value rank-selection tier and the per-value
    grouped tier implement the same selection rule — identical output
    on overlapping inputs, any block layout."""
    import ray.data as rd

    from sigraph_ray.functions.hashing import splitmix64
    from sigraph_ray.stages.quantiles import (weighted_quantiles,
                                              weighted_quantiles_ranked)

    raw = splitmix64(np.arange(4000, dtype=np.uint64)).astype(np.float64)
    df = pd.DataFrame({"v": np.round(raw / 2**54, 4),
                       "w": (raw % np.uint64(9)).astype("int64") + 1})
    qs = [0.0, 0.1, 0.5, 0.9, 0.95, 1.0]
    for blocks in (1, 7):
        ds = rd.from_pandas(df).repartition(blocks)
        a = weighted_quantiles(ds, value="v", weight="w", qs=qs)
        b = weighted_quantiles_ranked(ds, value="v", weight="w", qs=qs)
        assert list(a["value"]) == list(b["value"])
    # min v with F(v) >= q*W against a numpy oracle
    d = df.sort_values("v")
    cw = d["w"].to_numpy(np.float64).cumsum()
    want = [d["v"].to_numpy()[np.searchsorted(cw, q * cw[-1], "left")]
            for q in qs]
    assert list(b["value"]) == want


def test_empty_input_guards(ray_session):
    """Round-3 advice: degenerate inputs get typed-empty/NaN returns,
    not crashes — softmax_train, weighted_quantiles (both tiers),
    bm25_topk, ks_two_sample."""
    import ray.data as rd

    from sigraph_ray.stages.linalg import softmax_train
    from sigraph_ray.stages.quantiles import (weighted_quantiles,
                                              weighted_quantiles_ranked)
    from sigraph_ray.stages.stats import ks_two_sample
    from sigraph_ray.stages.textstats import bm25_topk

    empty_vec = rd.from_pandas(pd.DataFrame(
        {"embedding": pd.Series(dtype="object"),
         "label": pd.Series(dtype="int64")}))
    norms, hist, _ = softmax_train(empty_vec, n_classes=3, epochs=2)
    assert norms.empty and hist.empty

    empty_vw = rd.from_pandas(pd.DataFrame(
        {"v": pd.Series(dtype="float64"),
         "w": pd.Series(dtype="float64")}))
    for fn in (weighted_quantiles, weighted_quantiles_ranked):
        out = fn(empty_vw, value="v", weight="w", qs=[0.5])
        assert len(out) == 1 and np.isnan(out["value"].iloc[0])

    empty_docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series(dtype="object"),
         "text": pd.Series(dtype="object")}))
    assert bm25_topk(empty_docs, ["spark"]).empty

    one_group = rd.from_pandas(pd.DataFrame(
        {"v": [1.0, 2.0], "g": ["a", "a"]}))
    got = ks_two_sample(one_group, value="v", group="g",
                        a="a", b="b").to_pandas()
    assert got.empty  # absent sample -> typed empty, not NaN


def test_rrf_fuse_requires_rank_column():
    from sigraph_ray.stages.textstats import rrf_fuse

    good = pd.DataFrame({"doc id": ["a", "b"], "rank": [1, 2]})
    out = rrf_fuse([good, good], id_col="doc id", k=2)
    assert list(out["doc id"]) == ["a", "b"]  # non-identifier col ok
    with __import__("pytest").raises(ValueError, match="rank"):
        rrf_fuse([good.drop(columns=["rank"])], id_col="doc id")


def test_json_path_extractor_nested_and_nulls(ray_session):
    """The general JSON tier: nested dotted paths, missing keys,
    type mismatches and broken documents all yield nulls — never
    raise (ingestion quarantines by predicate, M5 contract)."""
    import ray.data as rd

    from sigraph_ray.stages.jsoncol import extract_json_paths

    docs = pd.DataFrame({"props": [
        '{"a": {"b": 7, "name": "x"}, "flag": true}',
        '{"a": {"b": "notint"}, "flag": 0}',
        '{"a": 3}',            # path steps into a scalar
        'not json at all',
        '{"a": {"b": -2, "name": "y"}, "flag": false}']})
    out = extract_json_paths(
        rd.from_pandas(docs),
        {"b": ("a.b", "int64"), "nm": ("a.name", "string"),
         "fl": ("flag", "bool")}).to_pandas()
    assert list(out["b"].astype("object").where(out["b"].notna(), None)) \
        == [7, None, None, None, -2]
    assert list(out["nm"].where(out["nm"].notna(), None)) \
        == ["x", None, None, None, "y"]
    assert list(out["fl"].astype("object").where(out["fl"].notna(), None)) \
        == [True, None, None, None, False]
    assert "props" not in out.columns  # extract-then-discard


def test_link_mentions_hand_values(ray_session, tmp_path):
    """q_link_mentions end-to-end on a designed corpus: identity links
    score 1.0, a one-letter-off bigram links to its canonical surface
    at the hand-computed trigram Jaccard (9 shared / 13 union), and a
    dissimilar mention is absent (below threshold 0.6)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sigraph_ray.pipelines.queries import q_link_mentions

    docs = ["alpha beta common token"] * 3 + ["alpha betz something"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())}),
        tmp_path / "documents.parquet")
    out = q_link_mentions(str(tmp_path)).to_pandas()
    got = dict(zip(out["mention"], zip(out["link"], out["score"])))
    # vocabulary = the df-3 bigrams of the repeated doc; identity links
    for v in ("alpha beta", "beta common", "common token"):
        assert got[v] == (v, 1.0)
    link, score = got["alpha betz"]
    assert link == "alpha beta"
    assert abs(score - 9 / 13) < 1e-12
    assert "betz something" not in got  # nothing similar in the vocab


def test_full_outer_daily_union_semantics(ray_session, tmp_path):
    """Days present on only one side must surface with zero counts on
    the other — the COALESCE contract of a FULL OUTER join — and the
    fold must be layout-invariant (multi-block parquet)."""
    from sigraph_ray.pipelines.queries import q_full_outer_daily

    d = tmp_path / "sf"
    d.mkdir()
    ev = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 05:00", "2024-01-01 06:00",
                              "2024-01-03 09:00"]),
        "value": [1.25, 2.50, 4.00],
        "event_id": [1, 2, 3], "user_id": [1, 1, 2],
        "event_type": ["click"] * 3, "props": ["{}"] * 3})
    od = pd.DataFrame({
        "o_orderkey": [1, 2], "o_custkey": [1, 2],
        "o_orderstatus": ["F", "O"],
        "o_totalprice": [10.00, 20.00],
        "o_orderdate": pd.to_datetime(["2024-01-02", "2024-01-03"]),
        "o_orderpriority": ["1-URGENT"] * 2})
    ev.to_parquet(d / "events.parquet", row_group_size=1)
    od.to_parquet(d / "orders.parquet", row_group_size=1)
    out = q_full_outer_daily(str(d))
    assert len(out) == 3                       # 1/1, 1/2, 1/3
    day1, day2, day3 = (out.iloc[i] for i in range(3))
    assert day1.n_events == 2 and day1.n_orders == 0
    assert day1.sum_value == 3.75 and day1.sum_total == 0.0
    assert day2.n_events == 0 and day2.n_orders == 1
    assert day3.n_events == 1 and day3.n_orders == 1
    assert str(out["n_events"].dtype) == "int64"
    assert str(out["n_orders"].dtype) == "int64"


def test_skewkurt_matches_direct_formula(ray_session, tmp_path):
    """Integer-power-sum closed form == the sample-adjusted G1/G2
    formulas computed directly (DuckDB skewness()/kurtosis()
    semantics), on an asymmetric hand distribution."""
    from sigraph_ray.pipelines.queries import q_quantity_skewkurt

    d = tmp_path / "sf"
    d.mkdir()
    qty = np.array([1, 1, 2, 3, 5, 8, 13, 21, 34, 50], dtype="float64")
    li = pd.DataFrame({
        "l_orderkey": np.arange(10, dtype="int64"),
        "l_partkey": np.zeros(10, dtype="int64"),
        "l_suppkey": np.zeros(10, dtype="int64"),
        "l_linenumber": np.zeros(10, dtype="int32"),
        "l_quantity": qty,
        "l_extendedprice": qty, "l_discount": np.zeros(10),
        "l_tax": np.zeros(10),
        "l_returnflag": ["A"] * 10, "l_linestatus": ["O"] * 10,
        "l_shipdate": pd.to_datetime(["2024-01-01"] * 10)})
    li.to_parquet(d / "lineitem.parquet", row_group_size=3)
    out = q_quantity_skewkurt(str(d))
    n = len(qty)
    m = qty.mean()
    m2 = ((qty - m) ** 2).sum() / n
    m3 = ((qty - m) ** 3).sum() / n
    m4 = ((qty - m) ** 4).sum() / n
    g1 = m3 / m2 ** 1.5
    g2 = m4 / m2 ** 2 - 3
    G1 = g1 * math.sqrt(n * (n - 1)) / (n - 2)
    G2 = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    assert out.iloc[0]["n_rows"] == n
    assert abs(out.iloc[0]["skew"] - G1) < 1e-12
    assert abs(out.iloc[0]["kurt"] - G2) < 1e-12


def test_ewma_daily_recurrence(ray_session, tmp_path):
    """ewma_0 = x_0; ewma_i = 0.3 x_i + 0.7 ewma_{i-1}, per key, over
    the observed (possibly gapped) day sequence."""
    from sigraph_ray.pipelines.queries import q_ewma_daily

    d = tmp_path / "sf"
    d.mkdir()
    ev = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-05",
                              "2024-01-01"]),
        "value": [10.0, 20.0, 40.0, 7.0],
        "event_id": [1, 2, 3, 4], "user_id": [1, 1, 1, 2],
        "event_type": ["click", "click", "click", "view"],
        "props": ["{}"] * 4})
    ev.to_parquet(d / "events.parquet", row_group_size=1)
    out = q_ewma_daily(str(d))
    ck = out[out.event_type == "click"].reset_index(drop=True)
    assert list(ck["day_value"]) == [10.0, 20.0, 40.0]
    assert ck.iloc[0]["ewma"] == 10.0
    assert abs(ck.iloc[1]["ewma"] - (0.3 * 20 + 0.7 * 10.0)) < 1e-12
    assert abs(ck.iloc[2]["ewma"]
               - (0.3 * 40 + 0.7 * (0.3 * 20 + 0.7 * 10.0))) < 1e-12
    vw = out[out.event_type == "view"].reset_index(drop=True)
    assert len(vw) == 1 and vw.iloc[0]["ewma"] == 7.0


@pytest.mark.parametrize("blocks", [1, 5])
def test_running_extremes_boundary_keys(ray_session, blocks):
    """Keys that straddle block boundaries must carry their running
    state across blocks — compare against a single-frame cummax/cummin
    at every layout."""
    import ray.data as rd

    from sigraph_ray.stages.temporal import running_extremes

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 7, size=n),          # few keys → all straddle
        "ts": rng.integers(0, 10_000, size=n),
        "id": np.arange(n, dtype="int64"),
        "v": np.round(rng.normal(0, 50, size=n), 2)})
    ds = rd.from_pandas(df).repartition(blocks)
    got = (running_extremes(ds, key="k", ts="ts", tiebreak="id",
                            value="v")
           .to_pandas().sort_values("id").reset_index(drop=True))
    ref = df.sort_values(["k", "ts", "id"], kind="stable").copy()
    g = ref.groupby("k", sort=False)["v"]
    ref["run_max"], ref["run_min"] = g.cummax(), g.cummin()
    ref = ref.sort_values("id").reset_index(drop=True)
    assert np.array_equal(got["run_max"].to_numpy(),
                          ref["run_max"].to_numpy())
    assert np.array_equal(got["run_min"].to_numpy(),
                          ref["run_min"].to_numpy())


def test_association_rules_float_items_not_truncated(ray_session):
    """Genuinely-float item ids must pass through unchanged — the
    merge-upcast cast-back only applies to integer-typed items."""
    import ray.data as rd

    from sigraph_ray.stages.itemsets import association_rules

    rows = [(1, 2.5), (1, 3.5), (2, 2.5), (2, 3.5), (3, 2.5)]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["g", "i"]))
    out = association_rules(ds, group="g", item="i",
                            min_support=2, k=10)
    assert set(out["ant"]) == {2.5, 3.5}
    assert str(out["ant"].dtype) == "float64"


def test_skewkurt_null_contract_matches_duckdb(ray_session, tmp_path):
    """Groups with n<3 (skew), n<4 (kurt) or constant values must give
    NaN exactly where DuckDB skewness()/kurtosis() give NULL."""
    import duckdb

    from sigraph_ray.pipelines.queries import (SQL_QUANTITY_SKEWKURT,
                                               q_quantity_skewkurt)

    d = tmp_path / "sf"
    d.mkdir()
    # A: n=2; B: n=3 non-constant; C: n=4 constant; D: n=5 varied
    flags = ["A"] * 2 + ["B"] * 3 + ["C"] * 4 + ["D"] * 5
    qty = [1.0, 2.0, 1.0, 2.0, 4.0, 7.0, 7.0, 7.0, 7.0,
           1.0, 3.0, 9.0, 27.0, 50.0]
    n = len(qty)
    li = pd.DataFrame({
        "l_orderkey": np.arange(n, dtype="int64"),
        "l_partkey": np.zeros(n, dtype="int64"),
        "l_suppkey": np.zeros(n, dtype="int64"),
        "l_linenumber": np.zeros(n, dtype="int32"),
        "l_quantity": qty, "l_extendedprice": qty,
        "l_discount": np.zeros(n), "l_tax": np.zeros(n),
        "l_returnflag": flags, "l_linestatus": ["O"] * n,
        "l_shipdate": pd.to_datetime(["2024-01-01"] * n)})
    li.to_parquet(d / "lineitem.parquet", row_group_size=4)
    got = q_quantity_skewkurt(str(d))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
            f"'{d}/lineitem.parquet'")
    want = con.sql(SQL_QUANTITY_SKEWKURT).df()
    for c in ("n_rows", "avg_qty", "skew", "kurt"):
        gv, wv = got[c].to_numpy(), want[c].to_numpy()
        both_nan = pd.isna(gv) & pd.isna(wv)
        assert (both_nan | (np.abs(gv - wv) < 1e-9)).all(), c


def test_jaro_winkler_blocked_join_hand_values(ray_session):
    """Known JW values through the blocked join (one blocking cell):
    martha/marhta = 0.9611..., dwayne/duane = 0.84; sub-threshold and
    cross-block pairs are excluded."""
    import ray.data as rd

    from sigraph_ray.stages.dedup import blocked_jaro_winkler_pairs

    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5],
        "name": ["martha", "marhta", "dwayne", "duane", "zzzz"],
        "blk": ["x", "x", "x", "x", "y"]})
    out = (blocked_jaro_winkler_pairs(
        rd.from_pandas(df).repartition(2), id_col="id",
        text_col="name", block_cols=["blk"], threshold=0.8)
        .to_pandas().sort_values(["id_a", "id_b"])
        .reset_index(drop=True))
    got = {(a, b): s for a, b, s in
           zip(out["id_a"], out["id_b"], out["jw"])}
    assert abs(got[(1, 2)] - 0.9611111111111111) < 1e-12
    assert abs(got[(3, 4)] - 0.84) < 1e-12
    assert all(5 not in k for k in got)          # other block


def _brandes_reference(adj: dict, nodes: list) -> dict:
    """Independent textbook Brandes (2001), dict/queue based."""
    from collections import deque

    bc = {x: 0.0 for x in nodes}
    for s in nodes:
        stack, preds = [], {x: [] for x in nodes}
        sigma = {x: 0.0 for x in nodes}
        dist = {x: -1 for x in nodes}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            x = q.popleft()
            stack.append(x)
            for w in adj.get(x, ()):
                if dist[w] < 0:
                    dist[w] = dist[x] + 1
                    q.append(w)
                if dist[w] == dist[x] + 1:
                    sigma[w] += sigma[x]
                    preds[w].append(x)
        delta = {x: 0.0 for x in nodes}
        while stack:
            w = stack.pop()
            for x in preds[w]:
                delta[x] += sigma[x] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {x: val / 2.0 for x, val in bc.items()}


@pytest.mark.parametrize("blocks", [1, 4])
def test_betweenness_exact_gate(ray_session, blocks):
    """All-sources approx_betweenness == independent textbook Brandes
    on a seeded random graph, at any block layout."""
    import ray.data as rd

    from sigraph_ray.stages.graphalgo import approx_betweenness

    rng = np.random.default_rng(5)
    n = 40
    pairs = set()
    while len(pairs) < 90:
        a, b = sorted(rng.integers(0, n, size=2))
        if a != b:
            pairs.add((f"n{a:02d}", f"n{b:02d}"))
    pdf = pd.DataFrame(sorted(pairs), columns=["u", "v"])
    ds = rd.from_pandas(pdf).repartition(blocks)
    got = approx_betweenness(ds, n_sources=None)
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    want = _brandes_reference(adj, sorted(adj))
    for node, bc in zip(got["node"], got["bc"]):
        assert abs(bc - want[node]) < 1e-9, node


def test_betweenness_sampled_deterministic(ray_session):
    """Sampled-source run is a pure function of (graph, seed) — same
    result at different layouts — and scales by n/k."""
    import ray.data as rd

    from sigraph_ray.stages.graphalgo import approx_betweenness

    rng = np.random.default_rng(9)
    pairs = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, 60, size=(200, 2))
                    if a != b})
    pdf = pd.DataFrame(pairs, columns=["u", "v"])
    r1 = approx_betweenness(rd.from_pandas(pdf), n_sources=16, seed=3)
    r2 = approx_betweenness(rd.from_pandas(pdf).repartition(5),
                            n_sources=16, seed=3)
    pd.testing.assert_frame_equal(r1, r2)


def test_pointer_doubling_deep_chain(ray_session):
    """One chain of depth 200 (needs 8 rounds: 2^8=256) plus scattered
    roots — exact root/depth at a multi-block layout."""
    import ray.data as rd

    from sigraph_ray.stages.graphalgo import pointer_double_roots

    n = 201
    df = pd.DataFrame({
        "node": np.arange(n, dtype="int64"),
        "parent": pd.array([None] + list(range(n - 1)), dtype="Int64")})
    out = (pointer_double_roots(rd.from_pandas(df).repartition(5))
           .to_pandas().sort_values("node").reset_index(drop=True))
    # join machinery upcasts key dtypes; compare values (the query
    # layer casts back — parity-gated)
    assert (out["root"].astype("int64") == 0).all()
    assert list(out["depth"].astype("int64")) == list(range(n))


def test_pointer_doubling_nonconvergence_raises(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.graphalgo import pointer_double_roots

    n = 40
    df = pd.DataFrame({
        "node": np.arange(n, dtype="int64"),
        "parent": pd.array([None] + list(range(n - 1)), dtype="Int64")})
    with pytest.raises(RuntimeError, match="did not converge"):
        pointer_double_roots(rd.from_pandas(df), max_rounds=3)  # 2^3 < 39
