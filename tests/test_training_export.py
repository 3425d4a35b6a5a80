"""End-to-end training-shard export: docs → token ids → packed
512-token sequences → parquet; shape, coverage and determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from sigraph_ray.pipelines.training_export import (_token_ids,
                                                   export_training_shards)


def _docs(n=50, seed=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n),
        "text": [" ".join(f"w{int(x)}" for x in
                          rng.integers(0, 200, rng.integers(0, 90)))
                 for _ in range(n)],
    })


def test_export_shapes_and_coverage(ray_session, tmp_path):
    docs = _docs()
    out = str(tmp_path / "shards")
    n_seqs = export_training_shards(
        rd.from_pandas(docs).repartition(4), out, max_tokens=64,
        num_partitions=2)
    t = pq.read_table(out).to_pandas().sort_values("seq_id") \
        .reset_index(drop=True)
    assert len(t) == n_seqs
    total_tokens = int(docs["text"].str.count(r"\S+").sum())
    # seq ids are dense 0..N-1; every real token lands exactly once
    assert list(t["seq_id"]) == list(range(len(t)))
    assert int(t["n_real"].sum()) == total_tokens
    # fixed shape: every sequence is exactly max_tokens wide
    assert t["input_ids"].map(len).eq(64).all()
    # all but the final sequence are completely real
    assert (t["n_real"].iloc[:-1] == 64).all()
    # padding is zeros
    last = t.iloc[-1]
    assert all(v == 0 for v in last["input_ids"][last["n_real"]:])


def test_export_token_stream_matches_concatenation(ray_session,
                                                   tmp_path):
    """The concatenation of all sequences' real tokens equals the
    doc_id-ordered token-id stream of the corpus."""
    docs = _docs(n=25, seed=29)
    out = str(tmp_path / "shards2")
    export_training_shards(rd.from_pandas(docs).repartition(3), out,
                           max_tokens=32, num_partitions=2)
    t = pq.read_table(out).to_pandas().sort_values("seq_id")
    got = [tok for _, r in t.iterrows()
           for tok in r["input_ids"][:r["n_real"]]]
    want = [tok for arr in _token_ids(docs["text"], (1 << 16) - 1)
            for tok in arr]
    assert got == want
