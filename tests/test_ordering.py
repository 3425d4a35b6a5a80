"""Training-order operators (stages/ordering): deterministic shuffle,
source interleaving, token-balanced shard planning — permutation
validity, bit-reproducibility across block layouts, and the balance /
budget invariants a streaming trainer relies on."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from sigraph_ray.stages.ordering import (deterministic_shuffle,
                                         interleave_sources,
                                         shard_plan)


def _docs(n=120, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice(["a", "b", "c"], size=n,
                             p=[0.6, 0.3, 0.1]).astype(object),
        "text": [" ".join(f"w{int(x)}" for x in
                          rng.integers(0, 50, rng.integers(1, 40)))
                 for _ in range(n)],
    })


def test_shuffle_is_permutation_and_layout_invariant(ray_session):
    docs = _docs()
    outs = []
    for parts in (2, 9):
        ds = rd.from_pandas(docs[["doc_id", "source"]]).repartition(parts)
        out = (deterministic_shuffle(ds, key="doc_id", seed="s0",
                                     keep_cols=["source"])
               .to_pandas().sort_values("pos").reset_index(drop=True))
        outs.append(out)
    a, b = outs
    # identical order at both block layouts
    pd.testing.assert_frame_equal(a, b)
    # a true permutation: positions dense 0..n-1, every doc once
    assert list(a["pos"]) == list(range(len(docs)))
    assert sorted(a["doc_id"]) == sorted(docs["doc_id"])
    # seed changes the order
    ds = rd.from_pandas(docs[["doc_id", "source"]]).repartition(4)
    other = (deterministic_shuffle(ds, key="doc_id", seed="s1")
             .to_pandas().sort_values("pos").reset_index(drop=True))
    assert list(other["doc_id"]) != list(a["doc_id"])


def test_interleave_mixes_sources_evenly(ray_session):
    docs = _docs(n=150, seed=11)
    ds = rd.from_pandas(docs[["doc_id", "source"]]).repartition(5)
    out = (interleave_sources(ds, key="doc_id", source="source")
           .to_pandas().sort_values("pos").reset_index(drop=True))
    assert list(out["pos"]) == list(range(len(docs)))
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])
    # rank-k docs of every live source precede every rank-(k+1) doc:
    # in any prefix, per-source counts differ by at most 1 while all
    # sources are still live (check the first 3 × min-source-count
    # rows, where all three sources are guaranteed live)
    counts = docs["source"].value_counts()
    live = 3 * int(counts.min())
    head = out.iloc[:live]
    per = head["source"].value_counts()
    assert per.max() - per.min() <= 1
    # layout invariance
    ds2 = rd.from_pandas(docs[["doc_id", "source"]]).repartition(11)
    out2 = (interleave_sources(ds2, key="doc_id", source="source")
            .to_pandas().sort_values("pos").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)


def test_shard_plan_budget_invariants(ray_session):
    docs = _docs(n=80, seed=23)
    budget = 100
    ds = rd.from_pandas(docs[["doc_id", "text"]]).repartition(6)
    out = (shard_plan(ds, budget=budget, id_col="doc_id",
                      text_col="text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want_tokens = docs["text"].str.count(r"\S+").astype("int64")
    assert list(out["n_tokens"]) == list(want_tokens)
    # shard = floor(tokens_before / budget) over doc_id order
    before = np.concatenate(([0], np.cumsum(out["n_tokens"])[:-1]))
    assert list(out["shard"]) == list(before // budget)
    # shards are contiguous in doc_id order and non-decreasing
    assert (np.diff(out["shard"]) >= 0).all()
    # every shard except the last holds ≥ budget − max_doc tokens and
    # overflows by < one document
    sizes = out.groupby("shard")["n_tokens"].sum()
    max_doc = int(out["n_tokens"].max())
    assert (sizes.iloc[:-1] >= budget - max_doc + 1).all()
    assert (sizes.iloc[:-1] < budget + max_doc).all()
