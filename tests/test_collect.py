"""sorted_collect — ordered grouped list collection across block
boundaries, at multiple block counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sigraph_ray.stages.collect import sorted_collect


def _data(n_keys: int, per_key: int, seed: int = 3) -> pd.DataFrame:
    from sigraph_ray.functions.hashing import splitmix64

    n = n_keys * per_key
    keys = [f"k{i % n_keys:04d}" for i in range(n)]
    ordv = splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed))
    return pd.DataFrame({
        "key": keys,
        "ord": [f"{v:020d}" for v in ordv],  # unique order values
        "val": [f"v{i}" for i in range(n)],
    })


@pytest.mark.parametrize("blocks", [1, 3, 8])
def test_sorted_collect_matches_pandas(ray_session, blocks):
    import ray.data as rd

    df = _data(40, 7)
    want = (df.sort_values(["key", "ord"]).groupby("key")["val"]
            .agg(list).to_dict())
    ds = rd.from_pandas(df.sample(frac=1, random_state=0)).repartition(blocks)
    out = sorted_collect(ds, key="key", order_col="ord", value="val").to_pandas()
    got = dict(zip(out["key"], (list(v) for v in out["values"])))
    assert got == want


def test_sorted_collect_single_hot_key(ray_session):
    """One key spanning every block (worst-case boundary stitch)."""
    import ray.data as rd

    df = _data(1, 200)
    want = df.sort_values("ord")["val"].tolist()
    ds = rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(6)
    out = sorted_collect(ds, key="key", order_col="ord", value="val").to_pandas()
    assert len(out) == 1
    assert list(out["values"][0]) == want


def test_sorted_collect_empty(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"key": [], "ord": [], "val": []}))
    out = sorted_collect(ds, key="key", order_col="ord", value="val").to_pandas()
    assert len(out) == 0


def test_sorted_collect_dedup_keep_first(ray_session):
    """dedup=True keeps each member's min-order occurrence only, across
    block boundaries (the collapsed pre-sort distinct-groupby)."""
    import pandas as pd
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_collect

    df = pd.DataFrame({
        "k": ["a"] * 6 + ["b"] * 2,
        "o": ["1", "2", "3", "4", "5", "6", "1", "2"],
        "v": ["x", "y", "x", "z", "y", "w", "q", "q"],
    })
    for blocks in (1, 4):
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=3)
                            ).repartition(blocks)
        out = sorted_collect(ds, key="k", order_col="o", value="v",
                             dedup=True).to_pandas()
        got = dict(zip(out["k"], out["values"].map(list)))
        assert got == {"a": ["x", "y", "z", "w"], "b": ["q"]}


@pytest.mark.parametrize("blocks", [1, 3, 8])
def test_sorted_groupby_sum_matches_pandas(ray_session, blocks):
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_sum

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.integers(0, 50, 400),
                       "a": rng.integers(0, 1000, 400).astype("float64"),
                       "b": rng.integers(0, 7, 400).astype("float64")})
    ds = rd.from_pandas(df).repartition(blocks)
    got = (sorted_groupby_sum(ds, key="k",
                              sum_cols={"sa": "a", "sb": "b"})
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.groupby("k").agg(sa=("a", "sum"), sb=("b", "sum"))
            .reset_index().sort_values("k").reset_index(drop=True))
    got["k"] = got["k"].astype(want["k"].dtype)
    pd.testing.assert_frame_equal(got[["k", "sa", "sb"]], want)


@pytest.mark.parametrize("blocks", [1, 4])
def test_sorted_distinct_matches_pandas(ray_session, blocks):
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_distinct

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"u": rng.integers(0, 12, 300),
                       "v": rng.integers(0, 12, 300)})
    ds = rd.from_pandas(df).repartition(blocks)
    got = (sorted_distinct(ds, ["u", "v"]).to_pandas()
           .sort_values(["u", "v"]).reset_index(drop=True))
    want = (df.drop_duplicates(["u", "v"]).sort_values(["u", "v"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("blocks", [1, 5])
def test_sorted_groupby_agg_all_ops(ray_session, blocks):
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_groupby_agg

    rng = np.random.default_rng(23)
    df = pd.DataFrame({"k": rng.integers(0, 30, 500),
                       "x": rng.normal(size=500),
                       "y": rng.integers(-50, 50, 500)})
    ds = rd.from_pandas(df).repartition(blocks)
    got = (sorted_groupby_agg(
        ds, key="k", aggs={"sx": ("x", "sum"), "mn": ("y", "min"),
                           "mx": ("y", "max"), "n": ("y", "count")})
        .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.groupby("k")
            .agg(sx=("x", "sum"), mn=("y", "min"), mx=("y", "max"),
                 n=("y", "size")).reset_index()
            .sort_values("k").reset_index(drop=True))
    got["k"] = got["k"].astype(want["k"].dtype)
    got["n"] = got["n"].astype(want["n"].dtype)
    pd.testing.assert_frame_equal(got[["k", "sx", "mn", "mx", "n"]], want)


@pytest.mark.parametrize("blocks", [1, 6])
def test_approx_distinct_accuracy(ray_session, blocks):
    import ray.data as rd

    from sigraph_ray.stages.sketch import approx_distinct

    rng = np.random.default_rng(3)
    n, true = 50_000, None
    df = pd.DataFrame({"a": rng.integers(0, 4000, n),
                       "b": rng.integers(0, 5, n)})
    true = len(df.drop_duplicates(["a", "b"]))
    ds = rd.from_pandas(df).repartition(blocks)
    est = approx_distinct(ds, ["a", "b"])
    assert abs(est - true) / true < 0.03, (est, true)


def test_salted_groupby_agg_equals_unsalted(ray_session):
    """Explicit salting spreads a Zipf-hot key across reducers without
    changing any aggregate, for any bucket count."""
    import ray.data as rd

    from sigraph_ray.stages.collect import salted_groupby_agg, \
        sorted_groupby_agg

    rng = np.random.default_rng(31)
    # one key owns 80 % of the rows (the hot-entity shape)
    keys = np.where(rng.random(20000) < 0.8, "hot",
                    rng.integers(0, 200, 20000).astype(str))
    df = pd.DataFrame({"k": keys,
                       "v": rng.integers(0, 1000, 20000).astype("int64")})
    ds = rd.from_pandas(df).repartition(6)
    aggs = {"total": ("v", "sum"), "lo": ("v", "min"),
            "hi": ("v", "max"), "n": ("v", "count")}
    want = (sorted_groupby_agg(ds, key="k", aggs=aggs).to_pandas()
            .sort_values("k").reset_index(drop=True))
    for buckets in (1, 4, 32):
        got = (salted_groupby_agg(ds, key="k", aggs=aggs,
                                  salt_buckets=buckets).to_pandas()
               .sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(want.dtypes), want, check_dtype=False)


def test_grouped_exact_quantiles_matches_rank_rule(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.quantiles import grouped_exact_quantiles

    rng = np.random.default_rng(43)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], 5000,
                        p=[0.7, 0.2, 0.05, 0.05]),   # skewed groups
        "v": rng.integers(0, 10000, 5000).astype("int64"),
    })
    qs = [0.1, 0.5, 0.99]
    got = grouped_exact_quantiles(
        rd.from_pandas(df).repartition(6), key="k", col="v", qs=qs)
    for k, sub in df.groupby("k"):
        vals = np.sort(sub["v"].to_numpy())
        for q in qs:
            rank = min(max(0, int(np.ceil(q * len(vals))) - 1),
                       len(vals) - 1)
            want = vals[rank]
            g = got[(got["k"] == k) & (got["q"] == q)]["value"]
            assert int(g.iloc[0]) == want, (k, q)


def test_compact_upserts_semantics(ray_session):
    """Newer updates replace, version ties go to the updates side,
    stale updates lose; layout-invariant."""
    import ray.data as rd

    from sigraph_ray.stages.upsert import compact_upserts

    base = pd.DataFrame({"k": ["a", "b", "c", "d"],
                         "v": [1.0, 2.0, 3.0, 4.0],
                         "version": [10, 10, 10, 10]})
    upd = pd.DataFrame({"k": ["a", "b", "c"],
                        "v": [100.0, 200.0, 300.0],
                        "version": [20, 10, 5]})
    outs = []
    for blocks in (1, 3):
        got = (compact_upserts(
            rd.from_pandas(base).repartition(blocks),
            rd.from_pandas(upd).repartition(blocks),
            key="k", version="version")
            .to_pandas().sort_values("k").reset_index(drop=True))
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    assert list(got["k"]) == ["a", "b", "c", "d"]
    # a: newer update wins; b: tie → update; c: stale → base; d: no upd
    assert list(got["v"]) == [100.0, 200.0, 3.0, 4.0]
    assert list(got["version"]) == [20, 10, 10, 10]


def test_zorder_locality_beats_single_column_sort(ray_session):
    """Clustering by the Morton key localizes BOTH dimensions: a
    narrow band on the secondary dimension touches far fewer
    fixed-size 'files' than under a primary-column sort, and the key
    round-trips its input bits."""
    import ray.data as rd

    from sigraph_ray.stages.zorder import BITS, morton_key, zorder_sort

    # interleave round-trip
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << BITS, 500).astype(np.uint64)
    b = rng.integers(0, 1 << BITS, 500).astype(np.uint64)
    z = morton_key(a, b)
    back_a = np.zeros_like(a)
    back_b = np.zeros_like(b)
    for i in range(BITS):
        back_a |= ((z >> np.uint64(2 * i)) & np.uint64(1)) << np.uint64(i)
        back_b |= ((z >> np.uint64(2 * i + 1)) & np.uint64(1)) << np.uint64(i)
    assert (back_a == a).all() and (back_b == b).all()

    n = 20000
    df = pd.DataFrame({"x": rng.uniform(0, 1000, n),
                       "y": rng.uniform(0, 1000, n)})
    file_rows = 500
    band = (df["y"] >= 100) & (df["y"] < 140)   # 4 % band on y

    z_sorted = (zorder_sort(rd.from_pandas(df).repartition(4),
                            cols=("x", "y"),
                            bounds=((0, 1000), (0, 1000)))
                .to_pandas().reset_index(drop=True))
    zb = (z_sorted.index[(z_sorted["y"] >= 100) & (z_sorted["y"] < 140)]
          // file_rows).nunique()
    x_sorted = df.sort_values("x").reset_index(drop=True)
    xb = (x_sorted.index[(x_sorted["y"] >= 100) & (x_sorted["y"] < 140)]
          // file_rows).nunique()
    total_files = n // file_rows
    assert xb >= total_files * 0.9      # x-sort scatters y everywhere
    assert zb <= total_files * 0.6      # z-order localizes y


@pytest.mark.parametrize("blocks", [1, 3, 8])
def test_sorted_merge_join_matches_pandas(ray_session, blocks):
    """Inner/left sort-merge join vs pandas.merge: duplicate rows on
    both sides, keys present on only one side, multiple block counts."""
    import ray.data as rd

    from sigraph_ray.stages.joins import sorted_merge_join

    rng = np.random.default_rng(11)
    lk = rng.integers(0, 50, 120)
    rk = rng.integers(25, 75, 90)
    left = pd.DataFrame({"k": lk, "a": np.arange(120, dtype=np.int64)})
    # plant exact duplicate right rows (must each join)
    right = pd.DataFrame({"k": np.concatenate([rk, rk[:5]]),
                          "b": np.concatenate([
                              np.arange(90, dtype=np.int64),
                              np.arange(5, dtype=np.int64)])})
    for how in ("inner", "left"):
        got = sorted_merge_join(
            rd.from_pandas(left).repartition(blocks),
            rd.from_pandas(right).repartition(max(1, blocks - 1)),
            on="k", left_cols=["a"], right_cols=["b"],
            how=how).to_pandas()
        want = left.merge(right, on="k", how=how)
        key = ["k", "a", "b"]
        g = got[key].sort_values(key, kind="stable").reset_index(drop=True)
        w = want[key].sort_values(key, kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(g.astype("float64"),
                                      w.astype("float64"))


def test_sorted_merge_join_hot_key_spans_blocks(ray_session):
    """One key owning most rows on both sides: every block's boundary
    fragment carries it; the stitch must join each row exactly once."""
    import ray.data as rd

    from sigraph_ray.stages.joins import sorted_merge_join

    left = pd.DataFrame({"k": [7] * 40 + [1, 2],
                         "a": np.arange(42, dtype=np.int64)})
    right = pd.DataFrame({"k": [7] * 3 + [2, 3],
                          "b": np.arange(5, dtype=np.int64)})
    got = sorted_merge_join(
        rd.from_pandas(left).repartition(6),
        rd.from_pandas(right).repartition(2),
        on="k", left_cols=["a"], right_cols=["b"]).to_pandas()
    want = left.merge(right, on="k")
    assert len(got) == len(want) == 40 * 3 + 1
    key = ["k", "a", "b"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True).astype("int64"),
        want[key].sort_values(key).reset_index(drop=True).astype("int64"))


def test_sorted_merge_join_rejects_collisions(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.joins import sorted_merge_join

    ds = rd.from_pandas(pd.DataFrame({"k": [1], "a": [1]}))
    with pytest.raises(ValueError):
        sorted_merge_join(ds, ds, on="k", left_cols=["a"],
                          right_cols=["a"])


def test_grouped_mode_tiebreak_and_layouts(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.collect import grouped_mode

    df = pd.DataFrame({
        # u1: b×3 beats a×2; u2: tie a×2 vs b×2 → smaller value 'a'
        "u": [1, 1, 1, 1, 1, 2, 2, 2, 2],
        "v": ["a", "b", "b", "a", "b", "b", "a", "b", "a"],
    })
    for parts in (1, 5):
        got = (grouped_mode(rd.from_pandas(df).repartition(parts),
                            key="u", value="v")
               .to_pandas().sort_values("u").reset_index(drop=True))
        assert list(got["mode_value"]) == ["b", "a"]
        assert list(got["cnt"]) == [3, 2]


def test_ntile_small_n_and_exact_split(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.quantiles import ntile_transform

    # n < k: each row its own bucket, ordered by (value, id)
    df = pd.DataFrame({"id": [3, 1, 2], "value": [9.0, 5.0, 7.0]})
    got = (ntile_transform(rd.from_pandas(df).repartition(2),
                           value_col="value", id_col="id", k=8)
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    assert list(got["id"]) == [1, 2, 3]
    assert list(got["bucket"]) == [1, 2, 3]
    # n = 10, k = 4 → bucket sizes 3,3,2,2 (SQL ntile split)
    df = pd.DataFrame({"id": range(10),
                       "value": [float(9 - i) for i in range(10)]})
    got = (ntile_transform(rd.from_pandas(df).repartition(3),
                           value_col="value", id_col="id", k=4)
           .to_pandas())
    sizes = got["bucket"].value_counts().sort_index()
    assert list(sizes) == [3, 3, 2, 2]
    # lowest values land in bucket 1
    assert set(got.loc[got["bucket"] == 1, "id"]) == {9, 8, 7}


def test_salted_merge_join_equals_plain_merge(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.joins import salted_merge_join

    rng = np.random.default_rng(31)
    n = 500
    # one giant key (70% of rows) + a tail — the skew case
    left = pd.DataFrame({
        "k": np.where(rng.uniform(size=n) < 0.7, "hot",
                      rng.choice(["a", "b", "c"], n)),
        "rid": np.arange(n, dtype=np.int64),
    })
    right = (left.groupby("k").size().rename("cnt").reset_index())
    want = (left.merge(right, on="k")
            .sort_values("rid").reset_index(drop=True))
    for buckets in (1, 4, 16):
        got = (salted_merge_join(
            rd.from_pandas(left).repartition(6),
            rd.from_pandas(right), on="k", left_cols=["rid"],
            right_cols=["cnt"], salt_col="rid", buckets=buckets)
            .to_pandas().sort_values("rid").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["k", "rid", "cnt"]].astype({"rid": "int64",
                                             "cnt": "int64"}),
            want[["k", "rid", "cnt"]].astype({"rid": "int64",
                                              "cnt": "int64"}))


def test_salted_merge_join_hot_keys_only(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.joins import salted_merge_join

    left = pd.DataFrame({"k": ["h"] * 40 + ["x", "y"] * 5,
                         "rid": np.arange(50, dtype=np.int64)})
    right = pd.DataFrame({"k": ["h", "x", "y"],
                          "v": [1, 2, 3]})
    got = (salted_merge_join(
        rd.from_pandas(left).repartition(4), rd.from_pandas(right),
        on="k", left_cols=["rid"], right_cols=["v"], salt_col="rid",
        buckets=4, hot_keys=["h"])
        .to_pandas().sort_values("rid").reset_index(drop=True))
    want = (left.merge(right, on="k").sort_values("rid")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["k", "rid", "v"]].astype({"rid": "int64", "v": "int64"}),
        want[["k", "rid", "v"]].astype({"rid": "int64", "v": "int64"}))


def test_sorted_count_distinct_layout_invariant(ray_session):
    """COUNT(DISTINCT) GROUP BY in one range sort: exact at any block
    layout, including pairs and keys spanning block edges and
    single-pair blocks."""
    import numpy as np
    import ray.data as rd

    from sigraph_ray.stages.collect import sorted_count_distinct

    from sigraph_ray.functions.hashing import splitmix64

    h = splitmix64(np.arange(2500, dtype=np.uint64))
    df = pd.DataFrame({"k": (h % np.uint64(31)).astype(str),
                       "d": ((h >> np.uint64(8)) % np.uint64(7))
                       .astype(str)})
    want = df.groupby("k")["d"].nunique()
    for blocks in (1, 3, 17):
        got = (sorted_count_distinct(
            rd.from_pandas(df).repartition(blocks), key="k", dcol="d")
            .to_pandas().set_index("k")["n"])
        assert got.sort_index().astype(int).equals(want.sort_index())
    # hot single-pair key across many blocks
    hot = pd.DataFrame({"k": ["a"] * 400 + ["b"],
                        "d": ["x"] * 400 + ["y"]})
    got = (sorted_count_distinct(rd.from_pandas(hot).repartition(19),
                                 key="k", dcol="d").to_pandas())
    assert dict(zip(got["k"], got["n"])) == {"a": 1, "b": 1}
