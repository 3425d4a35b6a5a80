"""Resumable stage output: skip-on-resume, atomicity, counters
(SURVEY.md §5.2 item 5 — resume property)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from sigraph_ray.state import manifest as M


@pytest.fixture()
def stage(tmp_path, ray_session):
    import ray.data as rd

    ds = rd.range(1000, override_num_blocks=4).map_batches(
        lambda b: pd.DataFrame({"x": b["id"], "y": b["id"] * 2}),
        batch_format="numpy")
    return ds, str(tmp_path / "out" / "stage1")


def test_write_and_resume_skips(stage):
    ds, d = stage
    rec1 = M.write_stage(ds, d, input_desc="range(1000)")
    assert sum(r["rows"] for r in rec1) == 1000
    t1 = [r["completed_at_unix"] for r in rec1]
    # re-run: every partition skipped, records identical
    rec2 = M.write_stage(ds, d)
    assert [r["content_hash"] for r in rec1] == \
        [r["content_hash"] for r in rec2]
    assert [r["completed_at_unix"] for r in rec2] == t1  # not rewritten


def test_partial_failure_resume(stage):
    ds, d = stage
    M.write_stage(ds, d)
    # simulate a lost partition: delete data + manifest for part 1
    import shutil
    shutil.rmtree(os.path.join(d, "part-00001"))
    os.remove(os.path.join(d, "_manifest", "part-00001.json"))
    rec = M.write_stage(ds, d)
    total = M.stage_summary(d)
    assert total["rows"] == 1000 and total["partitions"] == len(rec)
    # round-trip read returns every row exactly once
    back = M.read_stage(d).to_pandas()
    assert sorted(back["x"]) == list(range(1000))


def test_content_hash_order_insensitive(stage, ray_session):
    import pyarrow as pa

    t1 = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    t2 = pa.table({"b": ["z", "x", "y"], "a": [3, 1, 2]})
    assert M._content_hash(t1) == M._content_hash(t2)


def test_keyed_write_is_order_invariant(tmp_path, ray_session):
    """Content-keyed partitions: the same rows land in the same
    partition regardless of block layout, so skip-on-resume is sound
    under preserve_order=False (the positional mode cannot promise
    this — ADVICE round 1)."""
    import ray.data as rd

    df = pd.DataFrame({"k": [f"key_{i}" for i in range(500)],
                       "x": range(500)})
    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    rec1 = M.write_stage(rd.from_pandas(df).repartition(2), d1,
                         key="k", num_partitions=8)
    # different block layout AND different row order
    shuffled = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    rec2 = M.write_stage(rd.from_pandas(shuffled).repartition(5), d2,
                         key="k", num_partitions=8)
    h1 = {r["partition"]: r["content_hash"] for r in rec1}
    h2 = {r["partition"]: r["content_hash"] for r in rec2}
    assert h1 == h2

    # resume skips (timestamps untouched), round-trip is lossless
    t1 = [r["completed_at_unix"] for r in rec1]
    rec1b = M.write_stage(rd.from_pandas(df).repartition(3), d1,
                          key="k", num_partitions=8)
    assert [r["completed_at_unix"] for r in rec1b] == t1
    back = M.read_stage(d1).to_pandas()
    assert sorted(back["x"]) == list(range(500))


def test_verify_rewrites_stale_partition(tmp_path, ray_session):
    """A manifest record whose content hash no longer matches the
    recomputed rows (changed input) is rewritten, not skipped."""
    import ray.data as rd

    d = str(tmp_path / "s")
    df = pd.DataFrame({"k": [f"key_{i}" for i in range(100)],
                       "x": range(100)})
    M.write_stage(rd.from_pandas(df), d)
    changed = df.copy()
    changed["x"] = changed["x"] + 1000
    rec = M.write_stage(rd.from_pandas(changed), d)
    back = M.read_stage(d).to_pandas()
    assert sorted(back["x"]) == list(range(1000, 1100))
    assert sum(r["rows"] for r in rec) == 100


def test_graph_pipeline_through_manifest(tmp_path, ray_session):
    """Mid-pipeline stage boundary: parse stage written resumable, graph
    built from the stage directory."""
    import ray.data as rd

    from sigraph_ray.sources import synth
    from sigraph_ray.stages import provenance_graph as G

    events = rd.range(300, override_num_blocks=3).map_batches(
        lambda b: synth.events_batch(b["id"]), batch_format="numpy")
    parsed = events.map_batches(G.parse_events_batch, batch_format="pyarrow")
    d = str(tmp_path / "parsed")
    M.write_stage(parsed, d, input_desc="synth events 300")
    g = G.build_graph_from_parsed(M.read_stage(d))
    assert g["nodes"].count() > 0
