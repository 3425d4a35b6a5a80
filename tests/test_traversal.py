"""G2/G4 traversal operators: k-hop related traces on a hand-built
graph, G3 subgraph filters, connected components determinism."""

from __future__ import annotations

import pandas as pd
import pytest


def _mini_graph(ray_session):
    """Hand-built graph:
    unit u: t1 contains a, t2 contains b, a→b action edge (t1~t2 in
    3 hops); t3 contains c (isolated); t4 shares artifact a with t1
    (2 hops). Rule r matches a."""
    import ray.data as rd

    edges = rd.from_pandas(pd.DataFrame({
        "src": ["a@FILE"], "dst": ["b@FILE"], "type": ["CREATE"]}))
    contains = rd.from_pandas(pd.DataFrame({
        "unit_id": ["u"] * 4,
        "trace_id": ["t1", "t2", "t3", "t4"],
        "artifact": ["a@FILE", "b@FILE", "c@FILE", "a@FILE"]}))
    matches = rd.from_pandas(pd.DataFrame({
        "rule_id": ["r"], "artifact": ["a@FILE"]}))
    traces = rd.from_pandas(pd.DataFrame({
        "unit_id": ["u"] * 4, "trace_id": ["t1", "t2", "t3", "t4"]}))
    nodes = rd.from_pandas(pd.DataFrame({
        "artifact": ["a@FILE", "b@FILE", "c@FILE"],
        "artifact_type": ["FILE", "FILE", "FILE"]}))
    return {"edges": edges, "contains": contains, "matches": matches,
            "traces": traces, "nodes": nodes}


def test_related_traces_hops(ray_session):
    from sigraph_ray.stages import traversal as TV

    g = _mini_graph(ray_session)
    out = TV.related_traces(g, max_hop=3).to_pandas()
    got = {(r.trace_a, r.trace_b): r.hops for r in out.itertuples()}
    # t1~t4 share artifact a → 2 hops; t1~t2 via a→b edge → 3 hops;
    # t2~t4 via b→a(undirected)→t4 → 3 hops; t3 isolated.
    assert got == {("t1", "t4"): 2, ("t1", "t2"): 3, ("t2", "t4"): 3}
    assert (out["trace_a"] < out["trace_b"]).all()


def test_related_traces_hop_limit(ray_session):
    from sigraph_ray.stages import traversal as TV

    g = _mini_graph(ray_session)
    out = TV.related_traces(g, max_hop=2).to_pandas()
    got = set(zip(out["trace_a"], out["trace_b"]))
    assert got == {("t1", "t4")}


def test_subgraph_filters(ray_session):
    """G3: src not MODULE; not both endpoints PROCESS; dst contained in
    the same trace (schema.py:141-144)."""
    import ray.data as rd

    from sigraph_ray.stages import traversal as TV

    edges = rd.from_pandas(pd.DataFrame({
        "src": ["m@MODULE", "p@PROCESS", "p@PROCESS", "a@FILE"],
        "dst": ["a@FILE", "q@PROCESS", "a@FILE", "x@FILE"],
        "type": ["LOAD", "LAUNCH", "ACCESS", "CREATE"]}))
    contains = rd.from_pandas(pd.DataFrame({
        "unit_id": ["u"] * 4,
        "trace_id": ["t"] * 4,
        "artifact": ["m@MODULE", "p@PROCESS", "q@PROCESS", "a@FILE"]}))
    g = {
        "edges": edges, "contains": contains,
        "matches": rd.from_pandas(pd.DataFrame({"rule_id": [], "artifact": []})),
        "traces": rd.from_pandas(pd.DataFrame({"unit_id": ["u"], "trace_id": ["t"]})),
        "nodes": rd.from_pandas(pd.DataFrame({
            "artifact": ["m@MODULE", "p@PROCESS", "q@PROCESS", "a@FILE", "x@FILE"],
            "artifact_type": ["MODULE", "PROCESS", "PROCESS", "FILE", "FILE"]})),
    }
    out = TV.provenance_subgraph(g, max_hop=5).to_pandas()
    got = set(zip(out["src"], out["type"], out["dst"]))
    # m@MODULE source excluded; p→q both PROCESS excluded;
    # a→x dst not contained excluded; only p→a survives.
    assert got == {("p@PROCESS", "ACCESS", "a@FILE")}


def test_subgraph_endpoint_semantics(ray_session):
    """G3 filters apply to PATH ENDPOINTS only (QUERY_ALL_PROVENANCE,
    schema.py:127-152): intermediate nodes need not be contained and
    PROCESS→PROCESS hops are allowed mid-path."""
    import ray.data as rd

    from sigraph_ray.stages import traversal as TV

    # f1 → p1 → p2 → f2: endpoints contained FILEs, intermediates are
    # UNCONTAINED processes with a PROCESS→PROCESS hop between them.
    edges = rd.from_pandas(pd.DataFrame({
        "src": ["f1@FILE", "p1@PROCESS", "p2@PROCESS"],
        "dst": ["p1@PROCESS", "p2@PROCESS", "f2@FILE"],
        "type": ["CREATE", "LAUNCH", "WRITE"]}))
    contains = rd.from_pandas(pd.DataFrame({
        "unit_id": ["u", "u"], "trace_id": ["t", "t"],
        "artifact": ["f1@FILE", "f2@FILE"]}))
    g = {
        "edges": edges, "contains": contains,
        "matches": rd.from_pandas(
            pd.DataFrame({"rule_id": [], "artifact": []})),
        "traces": rd.from_pandas(
            pd.DataFrame({"unit_id": ["u"], "trace_id": ["t"]})),
    }
    out = TV.provenance_subgraph(g, max_hop=5).to_pandas()
    got = set(zip(out["src"], out["type"], out["dst"]))
    assert got == {("f1@FILE", "CREATE", "p1@PROCESS"),
                   ("p1@PROCESS", "LAUNCH", "p2@PROCESS"),
                   ("p2@PROCESS", "WRITE", "f2@FILE")}
    # but with max_hop=2 the 3-edge path no longer fits
    out2 = TV.provenance_subgraph(g, max_hop=2).to_pandas()
    assert len(out2) == 0


def _as_pairs(df):
    return {(r.unit_id, r.trace_a, r.trace_b): r.hops
            for r in df.itertuples()}


def test_related_traces_distributed_matches_actor(ray_session):
    """Frontier-join tier (actor_index_max_rows=0 → distributed) must
    reproduce the actor-index tier exactly."""
    from sigraph_ray.stages import traversal as TV

    for hop in (2, 3, 5):
        g = _mini_graph(ray_session)
        act = TV.related_traces(g, max_hop=hop, mode="actor").to_pandas()
        dist = TV.related_traces(g, max_hop=hop,
                                 actor_index_max_rows=0).to_pandas()
        assert _as_pairs(act) == _as_pairs(dist)


def test_subgraph_distributed_matches_actor(ray_session):
    import ray.data as rd

    from sigraph_ray.stages import traversal as TV

    edges = rd.from_pandas(pd.DataFrame({
        "src": ["m@MODULE", "p@PROCESS", "p@PROCESS", "a@FILE",
                "f1@FILE", "p1@PROCESS", "p2@PROCESS"],
        "dst": ["a@FILE", "q@PROCESS", "a@FILE", "x@FILE",
                "p1@PROCESS", "p2@PROCESS", "f2@FILE"],
        "type": ["LOAD", "LAUNCH", "ACCESS", "CREATE",
                 "CREATE", "LAUNCH", "WRITE"]}))
    contains = rd.from_pandas(pd.DataFrame({
        "unit_id": ["u"] * 4 + ["u", "u"],
        "trace_id": ["t"] * 4 + ["t2", "t2"],
        "artifact": ["m@MODULE", "p@PROCESS", "q@PROCESS", "a@FILE",
                     "f1@FILE", "f2@FILE"]}))
    g = {
        "edges": edges, "contains": contains,
        "matches": rd.from_pandas(
            pd.DataFrame({"rule_id": [], "artifact": []})),
        "traces": rd.from_pandas(
            pd.DataFrame({"unit_id": ["u", "u"], "trace_id": ["t", "t2"]})),
    }
    for hop in (2, 5):
        act = TV.provenance_subgraph(g, max_hop=hop,
                                     mode="actor").to_pandas()
        dist = TV.provenance_subgraph(g, max_hop=hop,
                                      actor_index_max_rows=0).to_pandas()
        key = ["unit_id", "trace_id", "src", "type", "dst"]
        assert (set(map(tuple, act[key].to_numpy()))
                == set(map(tuple, dist[key].to_numpy())))


def test_random_graph_both_tiers_agree(ray_session):
    """Deterministic random graph, both tiers, G2 and G3 — the
    adversarial parity check for the frontier formulation."""
    import numpy as np
    import ray.data as rd

    from sigraph_ray.stages import traversal as TV

    rng = np.random.RandomState(7)
    n_art = 40
    types = np.array(["PROCESS", "FILE", "MODULE", "IP"])
    art = [f"n{i}@{types[rng.randint(len(types))]}" for i in range(n_art)]
    e = rng.randint(0, n_art, size=(120, 2))
    e = e[e[:, 0] != e[:, 1]]
    edges = pd.DataFrame({
        "src": [art[i] for i in e[:, 0]],
        "dst": [art[i] for i in e[:, 1]],
        "type": [["CREATE", "ACCESS"][k % 2] for k in range(len(e))],
    }).drop_duplicates(["src", "type", "dst"])
    c = rng.randint(0, n_art, size=60)
    contains = pd.DataFrame({
        "unit_id": [f"u{k % 2}" for k in range(len(c))],
        "trace_id": [f"t{k % 12}" for k in range(len(c))],
        "artifact": [art[i] for i in c],
    }).drop_duplicates()
    traces = contains[["unit_id", "trace_id"]].drop_duplicates()
    g = {
        "edges": rd.from_pandas(edges),
        "contains": rd.from_pandas(contains),
        "matches": rd.from_pandas(pd.DataFrame(
            {"rule_id": ["r1", "r2"], "artifact": [art[0], art[5]]})),
        "traces": rd.from_pandas(traces),
    }
    act = TV.related_traces(g, max_hop=4, mode="actor").to_pandas()
    dist = TV.related_traces(g, max_hop=4,
                             actor_index_max_rows=0).to_pandas()
    assert _as_pairs(act) == _as_pairs(dist)
    assert len(act) > 0

    act3 = TV.provenance_subgraph(g, max_hop=3, mode="actor").to_pandas()
    dist3 = TV.provenance_subgraph(g, max_hop=3,
                                   actor_index_max_rows=0).to_pandas()
    key = ["unit_id", "trace_id", "src", "type", "dst"]
    assert (set(map(tuple, act3[key].to_numpy()))
            == set(map(tuple, dist3[key].to_numpy())))
    assert len(act3) > 0

    got_a = TV.drift_trace_set(g, "u0", "t0", max_hop=3, mode="actor")
    got_d = TV.drift_trace_set(g, "u0", "t0", max_hop=3,
                               actor_index_max_rows=0)
    assert got_a == got_d


def test_connected_components_deterministic(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.canonicalize import connected_components

    edges = pd.DataFrame({
        "u": ["a", "b", "x", "y", "m"],
        "v": ["b", "c", "y", "z", "m"],  # chain abc, chain xyz, self m
    })
    for blocks in (1, 3):
        for small in (500_000, 0):  # worker-task fast path AND the
            ds = rd.from_pandas(edges).repartition(blocks)  # join rounds
            lab = connected_components(ds, num_partitions=4,
                                       small_graph_rows=small).to_pandas()
            got = dict(zip(lab["node"], lab["comp"]))
            assert got == {"a": "a", "b": "a", "c": "a",
                           "x": "x", "y": "x", "z": "x", "m": "m"}


def test_connected_components_survives_signature_collision(
        ray_session, monkeypatch):
    """Regression (round-3 advice): the per-round convergence signature
    is probabilistic (two 31-bit hash sums); a collision must NOT stop
    iteration early on split labels. Force the worst case — every
    round's signature 'matches' — and require the exact ±1-count
    confirmation to reject premature convergence on a 4-chain that
    needs several propagation rounds."""
    import ray.data as rd

    from sigraph_ray.stages import canonicalize as C

    monkeypatch.setattr(C, "_label_signature", lambda labels: ("same",))
    edges = pd.DataFrame({"u": ["a", "b", "c", "d"],
                          "v": ["b", "c", "d", "e"]})
    ds = rd.from_pandas(edges).repartition(2)
    lab = C.connected_components(ds, num_partitions=4,
                                 small_graph_rows=0).to_pandas()
    got = dict(zip(lab["node"], lab["comp"]))
    assert got == {n: "a" for n in "abcde"}
