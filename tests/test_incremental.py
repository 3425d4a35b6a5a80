"""Incremental delta merge == full rebuild, bit-identical.

The mergeable-state contract (stages/incremental): because the U2/U3
aggregates are encoded arg-min / arg-max payloads plus sums, merging
yesterday's materialized state with today's delta aggregate must equal
a full rebuild over the union — for ANY split of the event stream.
"""

from __future__ import annotations

import pandas as pd
import pytest

from sigraph_ray.sources import synth

N_EVENTS = 1200


@pytest.fixture(scope="module")
def parsed(ray_session):
    import ray.data as rd

    from sigraph_ray.stages import provenance_graph as G

    events = rd.range(N_EVENTS, override_num_blocks=5).map_batches(
        lambda b: synth.events_batch(b["id"]), batch_format="numpy")
    p = events.map_batches(G.parse_events_batch, batch_format="pyarrow")
    ok, _ = G.split_quarantine(p)
    return ok.materialize()


def _sorted(df: pd.DataFrame, cols) -> pd.DataFrame:
    return df.sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("nibble", [0, 7])
def test_trace_merge_equals_rebuild(parsed, nibble):
    from sigraph_ray.stages import incremental as I

    base, delta = I.split_base_delta(parsed, delta_nibble=nibble)
    merged = I.decode_trace_state(
        I.merge_trace_delta(I.trace_state(base), delta)).to_pandas()
    full = I.decode_trace_state(I.trace_state(parsed)).to_pandas()
    key = ["unit_id", "trace_id"]
    pd.testing.assert_frame_equal(_sorted(merged, key), _sorted(full, key))


@pytest.mark.parametrize("nibble", [0, 7])
def test_edge_merge_equals_rebuild(parsed, nibble):
    from sigraph_ray.stages import incremental as I

    base, delta = I.split_base_delta(parsed, delta_nibble=nibble)
    merged = I.decode_edge_state(
        I.merge_edge_delta(I.edge_state(base), delta)).to_pandas()
    full = I.decode_edge_state(I.edge_state(parsed)).to_pandas()
    key = ["src", "type", "dst"]
    pd.testing.assert_frame_equal(_sorted(merged, key), _sorted(full, key))


def test_delta_only_keys_are_appended(ray_session):
    """A time-based split guarantees trace/edge keys that exist only in
    the delta — the append path (delta keys absent from base) must
    produce them, and the merge must still equal the full rebuild."""
    import ray.data as rd

    from sigraph_ray.stages import incremental as I
    from sigraph_ray.stages import provenance_graph as G

    def ok(lo: int, hi: int):
        ev = rd.range(hi - lo, override_num_blocks=3).map_batches(
            lambda b: synth.events_batch(b["id"] + lo),
            batch_format="numpy")
        p = ev.map_batches(G.parse_events_batch, batch_format="pyarrow")
        return G.split_quarantine(p)[0]

    # split by event-id range instead of hash: late events open traces
    # the base has never seen
    base, delta, full_ev = ok(0, 900), ok(900, N_EVENTS), ok(0, N_EVENTS)
    base_state = I.trace_state(base).materialize()
    merged = I.decode_trace_state(
        I.merge_trace_delta(base_state, delta)).to_pandas()
    full = I.decode_trace_state(I.trace_state(full_ev)).to_pandas()
    key = ["unit_id", "trace_id"]
    pd.testing.assert_frame_equal(_sorted(merged, key), _sorted(full, key))
    # sanity: the delta really introduced at least one brand-new key,
    # so the append path was exercised
    bk = set(I.decode_trace_state(base_state).to_pandas()
             .set_index(key).index)
    mk = set(merged.set_index(key).index)
    assert mk - bk, "delta introduced no new trace keys; test is vacuous"


def _count_state(rows: list[tuple[str, int]]):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(
        {"k": [r[0] for r in rows],
         "weight": pd.Series([r[1] for r in rows], dtype="int64")}))


def test_sum_merge_equals_rebuild(ray_session):
    """mode="sum" (the KG edge-weight table): touched keys sum, base-only
    keys pass through, delta-only keys append — merge == rebuild."""
    from sigraph_ray.stages import incremental as I

    base = _count_state([("a b", 3), ("b c", 5), ("c d", 1)])
    delta = _count_state([("b c", 2), ("x y", 7)])
    got = (I.merge_kg_edge_delta(base, delta).to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = pd.DataFrame({"k": ["a b", "b c", "c d", "x y"],
                         "weight": pd.Series([3, 7, 1, 7], dtype="int64")})
    pd.testing.assert_frame_equal(got, want)


def test_sum_merge_empty_delta_is_identity(ray_session):
    from sigraph_ray.stages import incremental as I

    base = _count_state([("a b", 3), ("b c", 5)])
    empty = _count_state([])
    got = (I.merge_kg_edge_delta(base, empty).to_pandas()
           .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, base.to_pandas().sort_values("k").reset_index(drop=True))


def test_sum_mode_requires_count_cols():
    from sigraph_ray.stages import incremental as I

    with pytest.raises(ValueError):
        I.merge_state(None, None, mode="sum")


def test_kg_incremental_edges_equals_rebuild(ray_session):
    """The registered query vs a single-process pandas rebuild at
    sf0.001 — the same full-corpus grouped count the SQL oracle runs."""
    import re

    import numpy as np

    from sigraph_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    got = (Q.q_kg_incremental_edges(sf).to_pandas()
           .sort_values(["src", "dst"]).reset_index(drop=True))

    df = pd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    toks = df["text"].str.lower().str.findall(re.compile(r"[a-z0-9]+"))
    s = toks.explode().dropna()
    gram = (s + " " + s.groupby(level=0).shift(-1)).dropna()
    vc = gram.value_counts()
    sp = vc.index.to_series().str.split(" ", n=1, expand=True)
    want = (pd.DataFrame({"src": sp[0].to_numpy(),
                          "dst": sp[1].to_numpy(),
                          "weight": vc.to_numpy().astype("int64")})
            .sort_values(["src", "dst"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["src", "dst", "weight"]], want)
    assert len(got) > 100


def test_empty_delta_is_identity(parsed, ray_session):
    from sigraph_ray.stages import incremental as I

    empty = parsed.filter(expr="unit_id == 'no-such-unit'")
    base_state = I.trace_state(parsed)
    merged = I.merge_trace_delta(base_state, empty)
    a = I.decode_trace_state(merged).to_pandas()
    b = I.decode_trace_state(I.trace_state(parsed)).to_pandas()
    key = ["unit_id", "trace_id"]
    pd.testing.assert_frame_equal(_sorted(a, key), _sorted(b, key))
