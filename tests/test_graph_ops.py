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
