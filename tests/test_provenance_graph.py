"""Provenance-graph construction vs a sequential reference simulator.

The simulator below re-implements the reference's per-event
read-modify-write algorithm (element_behavior.py:260-521) as plain
Python dicts, processing events in the batch-deterministic order
``(timestamp, span_id)`` (the stand-in for HTTP arrival order). The Ray
pipeline must produce the identical final graph — that is the whole
architectural claim of SURVEY.md §3.1.
"""

from __future__ import annotations

import pandas as pd
import pytest

from sigraph_ray.functions.provenance import (
    ACTION_TYPES, ACTOR_TYPES, ARTIFACT_TYPES)
from sigraph_ray.sources import synth

N_EVENTS = 1500


# --- sequential simulator (independent oracle) -----------------------------

def _parse_actor_py(s):
    # only the consumed tokens are validated (type_extension.py:253-272
    # + 170-186): last two enums, artifact-type token; names free-form
    if not s or "@" not in s:
        return None
    toks = s.split("@")
    if len(toks) < 4:
        return None
    *name_toks, atype, action, actor = toks
    name = "@".join(name_toks)
    if atype not in ARTIFACT_TYPES or action not in ACTION_TYPES \
            or actor not in ACTOR_TYPES:
        return None
    return name, atype, action, actor


def _parse_parent_py(s):
    if not s or "@" not in s:
        return None
    toks = s.split("@")
    if len(toks) < 2 or toks[1] not in ARTIFACT_TYPES:
        return None
    return toks[0], toks[1]


def sequential_reference(df: pd.DataFrame) -> dict:
    """Reference algorithm over events sorted by (timestamp, span_id)."""
    nodes: dict[str, dict] = {}
    traces: dict[tuple, dict] = {}
    edges: dict[tuple, dict] = {}
    contains: set[tuple] = set()
    matches: set[tuple] = set()
    quarantined = 0

    for _, ev in df.sort_values(["timestamp", "span_id"]).iterrows():
        parsed = _parse_actor_py(ev["system_provenance"])
        if parsed is None or ev["weight"] is None or ev["weight"] < 1:
            quarantined += 1
            continue
        # invalid parent provenance raises mid-event → whole event lost
        # (graph_session.py:128-132); attempted only when BOTH parent
        # fields are present (element_behavior.py:392)
        attempt_parent = (ev["parent_span_id"] is not None
                          and isinstance(ev["parent_system_provenance"], str))
        if attempt_parent and _parse_parent_py(
                ev["parent_system_provenance"]) is None:
            quarantined += 1
            continue
        name, atype, action, actor_t = parsed
        key = f"{name}@{atype}"

        node = nodes.setdefault(key, {
            "artifact_type": atype, "image": None,
            "span_ids": [], "trace_ids": []})
        if ev["span_id"] not in node["span_ids"]:
            node["span_ids"].append(ev["span_id"])
        if ev["trace_id"] not in node["trace_ids"]:
            node["trace_ids"].append(ev["trace_id"])
        pn = ev["process_name"]
        if pn is not None and not (isinstance(pn, float) and pd.isna(pn)):
            node["image"] = pn  # incoming non-null wins (…:339-340)

        tkey = (ev["unit_id"], ev["trace_id"])
        tr = traces.get(tkey)
        if tr is None:
            tr = traces[tkey] = {
                "start_time": ev["timestamp"], "rep": ev["process_name"],
                "span_count": 0}
        if ev["timestamp"] < tr["start_time"]:
            tr["start_time"] = ev["timestamp"]
            tr["rep"] = ev["process_name"]
        tr["span_count"] += 1
        contains.add((ev["unit_id"], ev["trace_id"], key))

        if attempt_parent:
            pp = _parse_parent_py(ev["parent_system_provenance"])
            if pp is not None:
                pkey = f"{pp[0]}@{pp[1]}"
                if pkey not in nodes:
                    nodes[pkey] = {"artifact_type": pp[1], "image": None,
                                   "span_ids": [], "trace_ids": []}
                    contains.add((ev["unit_id"], ev["trace_id"], pkey))
                # direction rule (element.py:192-226)
                if actor_t == "READ_RECV":
                    src, dst = key, pkey
                else:
                    src, dst = pkey, key
                edges[(src, action, dst)] = {
                    "start_time": ev["timestamp"], "weight": int(ev["weight"])}
        for rid in (ev["related_rule_ids"] or []):
            matches.add((rid, key))

    # G1 prune (schema.py:112-125)
    cc: dict[tuple, list] = {}
    for (u, t, a) in contains:
        cc.setdefault((u, t), []).append(a)
    degree: dict[str, int] = {}
    for (src, _, dst) in edges:
        degree[src] = degree.get(src, 0) + 1
        degree[dst] = degree.get(dst, 0) + 1
    for (u, t, a) in contains:
        degree[a] = degree.get(a, 0) + 1
    for (r, a) in matches:
        degree[a] = degree.get(a, 0) + 1
    doomed_nodes = set()
    doomed_traces = set()
    for (u, t), arts in cc.items():
        if len(arts) == 1 and degree.get(arts[0], 0) == 1:
            doomed_nodes.add(arts[0])
            doomed_traces.add((u, t))
    for a in doomed_nodes:
        nodes.pop(a, None)
    for k in doomed_traces:
        traces.pop(k, None)
    contains = {(u, t, a) for (u, t, a) in contains if a not in doomed_nodes}

    return {"nodes": nodes, "traces": traces, "edges": edges,
            "contains": contains, "matches": matches,
            "quarantined": quarantined, "n_pruned": len(doomed_nodes)}


@pytest.fixture(scope="module")
def built(ray_session):
    import ray.data as rd
    from sigraph_ray.stages import provenance_graph as G

    events = rd.range(N_EVENTS, override_num_blocks=6).map_batches(
        lambda b: synth.events_batch(b["id"]), batch_format="numpy")
    g = G.build_graph(events)
    out = {k: (g[k].to_pandas() if k != "n_pruned" else g[k])
           for k in ["nodes", "edges", "traces", "contains", "matches",
                     "quarantined", "n_pruned"]}
    df = pd.DataFrame([synth.event_rows(i) for i in range(N_EVENTS)])
    df["timestamp"] = pd.to_datetime(df["timestamp"], unit="us")
    out["ref"] = sequential_reference(df)
    return out


def test_nodes_match_reference(built):
    ref = built["ref"]["nodes"]
    got = built["nodes"].set_index("artifact")
    assert set(got.index) == set(ref)
    for a, want in ref.items():
        row = got.loc[a]
        assert row["artifact_type"] == want["artifact_type"], a
        assert row["image"] == want["image"] or (
            row["image"] is None and want["image"] is None), a
        assert list(row["related_span_ids"]) == want["span_ids"], a
        assert list(row["related_trace_ids"]) == want["trace_ids"], a


def test_traces_match_reference(built):
    ref = built["ref"]["traces"]
    got = built["traces"].set_index(["unit_id", "trace_id"])
    assert set(got.index) == set(ref)
    for k, want in ref.items():
        row = got.loc[k]
        assert row["start_time"] == want["start_time"], k
        assert row["span_count"] == want["span_count"], k
        rep = row["representative_process_name"]
        assert (rep == want["rep"]) or (rep is None and want["rep"] is None), k


def test_edges_match_reference(built):
    ref = built["ref"]["edges"]
    got = built["edges"].set_index(["src", "type", "dst"])
    assert set(got.index) == set(ref)
    for k, want in ref.items():
        row = got.loc[k]
        assert row["start_time"] == want["start_time"], k
        assert int(row["weight"]) == want["weight"], k


def test_contains_match_reference(built):
    got = set(map(tuple, built["contains"][
        ["unit_id", "trace_id", "artifact"]].values))
    assert got == built["ref"]["contains"]


def test_matches_match_reference(built):
    got = set(map(tuple, built["matches"][["rule_id", "artifact"]].values))
    assert got == built["ref"]["matches"]


def test_quarantine_and_prune_counts(built):
    assert len(built["quarantined"]) == built["ref"]["quarantined"]
    assert built["n_pruned"] == built["ref"]["n_pruned"]


def test_jsonl_roundtrip_graph_identical(ray_session, tmp_path):
    """S2 wire-format fidelity: the graph built from a JSONL copy of
    the event stream is byte-identical to the Arrow-stream build."""
    import ray.data as rd

    from sigraph_ray.sources import synth
    from sigraph_ray.sources.jsonl import (read_events_jsonl,
                                           write_events_jsonl)
    from sigraph_ray.stages import provenance_graph as G

    events = rd.range(400, override_num_blocks=2).map_batches(
        lambda b: synth.events_batch(b["id"]), batch_format="numpy")
    path = str(tmp_path / "events_jsonl")
    write_events_jsonl(events, path)
    via_jsonl = read_events_jsonl(path)
    for key in ("nodes", "edges", "traces"):
        a = G.build_graph(events)[key].to_pandas()
        b = G.build_graph(via_jsonl)[key].to_pandas()
        cols = list(a.columns)
        a = a.sort_values(cols[:2]).reset_index(drop=True)
        b = b.sort_values(cols[:2]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_csv_roundtrip_graph_identical(ray_session, tmp_path):
    """S2 wire-format fidelity (CSV tier): the graph built from a CSV
    copy of the event stream is byte-identical to the Arrow build —
    list column JSON-encoded, timestamps ISO-8601."""
    import ray.data as rd

    from sigraph_ray.sources import synth
    from sigraph_ray.sources.csvsrc import (read_events_csv,
                                            write_events_csv)
    from sigraph_ray.stages import provenance_graph as G

    events = rd.range(400, override_num_blocks=2).map_batches(
        lambda b: synth.events_batch(b["id"]), batch_format="numpy")
    path = str(tmp_path / "events_csv")
    write_events_csv(events, path)
    via_csv = read_events_csv(path)
    for key in ("nodes", "edges", "traces"):
        a = G.build_graph(events)[key].to_pandas()
        b = G.build_graph(via_csv)[key].to_pandas()
        cols = list(a.columns)
        a = a.sort_values(cols[:2]).reset_index(drop=True)
        b = b.sort_values(cols[:2]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
