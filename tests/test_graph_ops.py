"""S7 validation, J5/U8 IoCs, D1/D2 unit flush, S10 JSON export, A2
entity-link scoring."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def graph(ray_session):
    import ray.data as rd

    from sigraph_ray.sources import synth
    from sigraph_ray.stages import provenance_graph as G

    events = rd.range(600, override_num_blocks=3).map_batches(
        lambda b: synth.events_batch(b["id"]), batch_format="numpy")
    return G.build_graph(events)


def test_validate_graph_uniqueness(graph):
    from sigraph_ray.stages import provenance_graph as G

    counts = G.validate_graph(graph)
    assert counts["nodes"] > 0 and counts["traces"] > 0


def test_extract_iocs_semijoin(graph):
    from sigraph_ray.stages import provenance_graph as G

    iocs = G.extract_iocs(graph, "unit_0").to_pandas()
    assert len(iocs) > 0
    assert (iocs["artifact_type"] != "PROCESS").all()
    unit_traces = set(
        graph["traces"].filter(expr='unit_id == "unit_0"').to_pandas()
        ["trace_id"])
    for ids in iocs["related_trace_ids"]:
        assert set(ids) <= unit_traces


def test_unit_flush(tmp_path, graph):
    from sigraph_ray.stages import provenance_graph as G

    out = str(tmp_path / "graph")
    G.write_unit_partitioned(graph["traces"], out, table="traces")
    G.write_unit_partitioned(graph["contains"], out, table="contains")
    units = sorted(os.listdir(f"{out}/traces"))
    assert any(u.startswith("unit_id=") for u in units)
    removed = G.flush_unit(out, "unit_0", tables=("traces", "contains"))
    assert len(removed) == 2
    assert not os.path.exists(f"{out}/traces/unit_id=unit_0")
    # remaining units still readable
    import ray.data as rd
    left = rd.read_parquet(f"{out}/traces").to_pandas()
    assert "unit_0" not in set(left.get("unit_id", []))


def test_export_json(tmp_path, graph):
    from sigraph_ray.stages import provenance_graph as G

    path = str(tmp_path / "graph.json")
    counts = G.export_json(graph, path)
    with open(path) as f:
        doc = json.load(f)
    assert len(doc["nodes"]) == counts["nodes"] > 0
    assert len(doc["rels"]) == counts["rels"] > 0
    assert {"elementId", "labels", "properties"} <= set(doc["nodes"][0])


def test_entity_link_scorer(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.entity_link import link_entities

    triples = rd.from_pandas(pd.DataFrame({
        "subj": ["xenorat", "xen0rat", "completely different"],
        "obj": ["evil.com", "evil.c0m", "other.org"],
    }))
    out = link_entities(
        triples, ["xenorat", "evil.com"], threshold=0.4,
        concurrency=2).to_pandas()
    by_subj = out.set_index("subj")
    assert by_subj.loc["xenorat", "subj_link"] == "xenorat"
    assert by_subj.loc["xenorat", "subj_link_score"] == 1.0
    assert by_subj.loc["xen0rat", "subj_link"] == "xenorat"  # near match
    assert by_subj.loc["completely different", "subj_link"] == \
        "completely different"  # below threshold keeps mention
    assert by_subj.loc["xen0rat", "obj_link"] == "evil.com"


def _dense_pagerank(edges: pd.DataFrame, n_iter: int,
                    d: float = 0.85) -> pd.DataFrame:
    """Independent dense power iteration (textbook formulation) the
    distributed tiers must match iteration-exactly."""
    import numpy as np

    nodes = np.sort(pd.unique(pd.concat([edges["src"], edges["dst"]])))
    idx = pd.Index(nodes)
    n = len(nodes)
    si = idx.get_indexer(edges["src"])
    di = idx.get_indexer(edges["dst"])
    outdeg = np.bincount(si, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        share = np.where(outdeg > 0, r / np.maximum(outdeg, 1), 0.0)
        s = np.zeros(n)
        np.add.at(s, di, share[si])
        dm = r[outdeg == 0].sum()
        r = (1 - d) / n + d * (s + dm / n)
    return pd.DataFrame({"node": nodes, "rank": r})


def _rand_edges(n_nodes=60, n_edges=400, seed=41) -> pd.DataFrame:
    import numpy as np

    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "src": [f"n{i}" for i in rng.integers(0, n_nodes, n_edges)],
        "dst": [f"n{i}" for i in rng.integers(0, n_nodes, n_edges)],
    })


def test_pagerank_broadcast_matches_dense(ray_session):
    import numpy as np
    import ray.data as rd

    from sigraph_ray.stages.graphalgo import pagerank

    edges = _rand_edges()
    got = (pagerank(rd.from_pandas(edges).repartition(4), n_iter=8)
           .sort_values("node").reset_index(drop=True))
    want = _dense_pagerank(edges, 8)
    assert list(got["node"]) == list(want["node"])
    np.testing.assert_allclose(got["rank"], want["rank"], rtol=1e-10)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_pagerank_join_tier_matches_dense(ray_session):
    import numpy as np
    import ray.data as rd

    from sigraph_ray.stages.graphalgo import pagerank

    edges = _rand_edges(n_nodes=30, n_edges=120, seed=7)
    got = pagerank(rd.from_pandas(edges).repartition(3), n_iter=2,
                   tier="join", num_partitions=2)
    got = (got.to_pandas().sort_values("node").reset_index(drop=True))
    want = _dense_pagerank(edges, 2)
    assert list(got["node"]) == list(want["node"])
    np.testing.assert_allclose(got["rank"], want["rank"], rtol=1e-10)


@pytest.mark.parametrize("blocks", [1, 4])
def test_triangle_counts_matches_bruteforce(ray_session, blocks):
    """Planted K4 + random graph vs an O(n³) numpy reference; zeros
    kept for triangle-free incident nodes; parallel edges / reversed
    duplicates / self-loops collapse."""
    import numpy as np
    import ray.data as rd

    from sigraph_ray.stages.graphalgo import triangle_counts

    rng = np.random.default_rng(7)
    n = 30
    names = np.array([f"n{i:02d}" for i in range(n)])
    dense = rng.random((n, n)) < 0.12
    adj = np.triu(dense, 1)
    adj[0, 1] = adj[0, 2] = adj[0, 3] = True   # plant a K4
    adj[1, 2] = adj[1, 3] = adj[2, 3] = True
    ii, jj = np.where(adj)
    # parallel + reversed duplicates + a self-loop must not change counts
    u = np.concatenate([names[ii], names[jj], names[ii][:5], ["n00"]])
    v = np.concatenate([names[jj], names[ii], names[jj][:5], ["n00"]])
    edges = rd.from_pandas(pd.DataFrame({"u": u, "v": v})).repartition(blocks)

    got = triangle_counts(edges)

    sym = adj | adj.T
    a3 = np.linalg.matrix_power(sym.astype(np.int64), 3)
    want_counts = np.diag(a3) // 2
    incident = sym.any(axis=1)
    want = pd.DataFrame({"node": names[incident],
                         "n_triangles": want_counts[incident]})
    want = want.sort_values("node").reset_index(drop=True)
    got = got.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.set_index("node").loc["n00", "n_triangles"] >= 3


@pytest.mark.parametrize("blocks", [1, 4])
def test_kcore_matches_peeling(ray_session, blocks):
    """Random graph + planted K5: distributed k-core equals exact
    sequential peeling; the clique survives k=4; a chain dies at k=2."""
    import numpy as np
    import ray.data as rd

    from sigraph_ray.stages.graphalgo import kcore

    rng = np.random.default_rng(5)
    n = 40
    names = np.array([f"n{i:02d}" for i in range(n)])
    adj = np.triu(rng.random((n, n)) < 0.08, 1)
    for i in range(5):        # planted K5 on nodes 0-4
        for j in range(i + 1, 5):
            adj[i, j] = True
    adj[30, 31] = adj[31, 32] = adj[32, 33] = True   # chain
    ii, jj = np.where(adj)
    edges = rd.from_pandas(pd.DataFrame(
        {"u": names[ii], "v": names[jj]})).repartition(blocks)

    def peel(adj, k):
        sym = adj | adj.T
        alive = sym.any(axis=1)
        while True:
            deg = sym[np.ix_(alive, alive)].sum(axis=1)
            bad = deg < k
            if not bad.any():
                break
            idx = np.where(alive)[0][bad]
            alive[idx] = False
            if not alive.any():
                break
        deg_final = sym[np.ix_(alive, alive)].sum(axis=1)
        return dict(zip(names[alive], deg_final.astype(int)))

    for k in (2, 4):
        got = kcore(edges, k=k)
        want = peel(adj, k)
        assert dict(zip(got["node"], got["degree_in_core"])) == want
    got4 = kcore(edges, k=4)
    assert {f"n0{i}" for i in range(5)} <= set(got4["node"])


def test_khop_min_dist_matches_dp(ray_session):
    import numpy as np
    import ray.data as rd

    from sigraph_ray.stages.graphalgo import khop_min_dist

    rng = np.random.default_rng(13)
    n, m, k = 25, 120, 3
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    edges = pd.DataFrame({
        "src": [f"n{int(s):02d}" for s in src[keep]],
        "dst": [f"n{int(d):02d}" for d in dst[keep]],
        "w": rng.uniform(0.1, 2.0, int(keep.sum())),
    }).drop_duplicates(["src", "dst"])
    seed = "n00"

    # reference: k rounds of dense Bellman-Ford
    INF = float("inf")
    dist = {seed: 0.0}
    for _ in range(k):
        nxt = dict(dist)
        for r in edges.itertuples():
            d = dist.get(r.src, INF)
            if d + r.w < nxt.get(r.dst, INF):
                nxt[r.dst] = d + r.w
        dist = nxt

    got = (khop_min_dist(rd.from_pandas(edges).repartition(4),
                         seed=seed, k=k)
           .to_pandas().set_index("node")["dist"].to_dict())
    assert set(got) == set(dist)
    for node, d in dist.items():
        assert abs(got[node] - d) < 1e-12, node


def test_entity_link_scorer_matches_brute_force(ray_session):
    """A2 filter soundness: the probe-side prefix + length + overlap
    filters must find EXACTLY the brute-force best candidate for every
    at-threshold mention (the round-4 regression was near-dup pairs of
    unequal length pruned at the overlap-bound boundary when the bound
    used prefix-indexed counts)."""
    import ray

    from sigraph_ray.sources import synth
    from sigraph_ray.stages.entity_link import EntityLinkScorer, _trigrams

    exp = synth.expected_triples(300)
    mentions = sorted(set(exp["subj"]) | set(exp["obj"]))
    # df-ranked vocabulary, as derive_link_vocab builds it
    df = pd.concat([
        exp[["doc_url", "subj"]].rename(columns={"subj": "e"}),
        exp[["doc_url", "obj"]].rename(columns={"obj": "e"}),
    ]).drop_duplicates().groupby("e").size()
    vocab = df[df >= 2].index.tolist()
    # the round-4 regression shape: unequal-length near-dups
    vocab += ["c2-448.evil2.com", "acme corporation"]
    mentions += ["c2-48.evil2.com", "acme corp", "zz-unrelated"]

    sc = EntityLinkScorer(ray.put(vocab), 0.75)
    svocab = sorted(vocab)
    vt = [_trigrams(v) for v in svocab]
    for m in mentions:
        tg = _trigrams(m)
        best, best_s = m, 0.0
        for v, s_ in zip(svocab, vt):
            inter = len(tg & s_)
            if not inter:
                continue
            s = inter / (len(tg) + len(s_) - inter)
            if s > best_s:
                best, best_s = v, s
        want = (best, best_s) if best_s >= 0.75 else (m, best_s)
        got = sc._score(m)
        assert got[0] == want[0], (m, got, want)
        if want[1] >= 0.75:
            assert abs(got[1] - want[1]) < 1e-12, (m, got, want)
