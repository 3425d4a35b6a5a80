"""F3 query-entity extraction + graph-neighborhood retrieval + hybrid
context (ai_agent.py:456-500, prompt.py:151-173)."""

from __future__ import annotations

import pandas as pd
import pytest

from sigraph_ray.stages.query import query_entities, unify_entity


def test_query_entities_iocs():
    q = ("What did  Dropper_7.EXE  do with payload.dll, 10.0.0.5 and "
         "hklm\\software\\run_k3? Also dropper_7.exe again.")
    ents = query_entities(q)
    assert ents == ["dropper_7.exe", "payload.dll", "10.0.0.5",
                    "hklm\\software\\run_k3"]  # unified, first-seen, deduped


def test_unify_entity():
    assert unify_entity("  EVIL.exe ") == "evil.exe"


@pytest.fixture(scope="module")
def mini(ray_session):
    import ray.data as rd

    nodes = rd.from_pandas(pd.DataFrame({
        "artifact": ["a1@FILE", "a2@FILE", "a3@FILE", "b1@PROCESS"]}))
    edges = rd.from_pandas(pd.DataFrame({
        "src": ["a1@FILE", "b1@PROCESS", "a2@FILE", "a1@FILE"],
        "dst": ["b1@PROCESS", "a2@FILE", "a3@FILE", "a3@FILE"],
        "type": ["CREATE", "WRITE", "READ", "MENTIONS"]}))
    return nodes, edges


def test_neighborhood_prefix_limit_and_legs(mini):
    from sigraph_ray.stages.query import neighborhood

    nodes, edges = mini
    out = neighborhood(nodes, edges, ["a", "b1", "zzz"],
                       id_col="artifact", type_col="type")
    by_seed = {s: list(g["line"]) for s, g in out.groupby("seed")}
    # seed 'a': only the 2 smallest matches (a1, a2) count; MENTIONS
    # excluded; out-legs (a1→b1, a2→a3) precede the in-leg (b1→a2)
    assert by_seed["a"] == [
        "a1@FILE - CREATE -> b1@PROCESS",
        "a2@FILE - READ -> a3@FILE",
        "b1@PROCESS - WRITE -> a2@FILE",
    ]
    assert by_seed["b1"] == [
        "b1@PROCESS - WRITE -> a2@FILE",
        "a1@FILE - CREATE -> b1@PROCESS",
    ]
    assert "zzz" not in by_seed


def test_neighborhood_line_cap(mini, ray_session):
    import ray.data as rd

    from sigraph_ray.stages.query import neighborhood

    nodes = rd.from_pandas(pd.DataFrame({"artifact": ["hub@FILE"]}))
    edges = rd.from_pandas(pd.DataFrame({
        "src": ["hub@FILE"] * 80,
        "dst": [f"d{i:03d}@FILE" for i in range(80)],
        "type": ["WRITE"] * 80})).repartition(3)
    out = neighborhood(nodes, edges, ["hub"], id_col="artifact",
                       type_col="type", max_lines=50)
    assert len(out) == 50
    # deterministic: the 50 lexicographically-smallest out-lines
    assert list(out["line"]) == sorted(
        f"hub@FILE - WRITE -> d{i:03d}@FILE" for i in range(80))[:50]


def test_hybrid_context(ray_session):
    import ray.data as rd

    from sigraph_ray.stages.query import hybrid_context
    from sigraph_ray.stages.similarity import add_embeddings

    nodes = rd.from_pandas(pd.DataFrame({"entity": ["evil.exe", "x.dll"]}))
    edges = rd.from_pandas(pd.DataFrame({
        "src": ["evil.exe"], "dst": ["x.dll"], "pred": ["loaded"]}))
    docs = add_embeddings(rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["evil.exe loaded x.dll silently",
                 "the weather is nice today",
                 "cooking pasta with tomatoes"]}))).materialize()
    ctx = hybrid_context(nodes, edges, docs,
                         "tell me about evil.exe", k=2, id_col="entity")
    assert "Graph Data:" in ctx and "Vector Data:" in ctx
    assert "evil.exe - loaded -> x.dll" in ctx
    assert "evil.exe loaded x.dll silently" in ctx
