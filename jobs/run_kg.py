"""KG-construction job entry point — the ``ray job submit`` target.

    ray job submit --working-dir . -- python jobs/run_kg.py \
        --pages <parquet dir or 'synth:N'> --out /data/kg-run-1

Also runs standalone (``python jobs/run_kg.py ...``): it owns a Ray
session (guarded init), streams pages → triples → edges/entities, and
writes every output through the resumable manifest layout
(state/manifest.py) — re-submitting the SAME command after a failure
skips completed partitions and finishes the rest (ops gate: per-
partition lineage + counters, BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# script lives in <repo>/jobs/ — make the repo importable for the driver
# AND for Ray workers (PYTHONPATH is exported before ray.init below)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH") else _REPO)


def _n_written(recs: list[dict]) -> int:
    """Partitions actually (re)written this run — skipped-on-resume
    records carry the in-memory ``skipped`` marker from the manifest."""
    return sum(1 for r in recs if not r.get("skipped"))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True,
                    help="parquet path/dir of pages, or synth:N")
    ap.add_argument("--out", required=True, help="output root directory")
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only used when this process owns ray.init")
    ap.add_argument("--link", choices=["auto", "off"], default="auto",
                    help="A2 entity linking with the self-derived "
                         "vocabulary (its own resumable stage)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False
    # session-proportional shuffle parallelism (see bench.py note)
    import os as _os

    _cpus = args.num_cpus or int(_os.environ.get("RAY_GRAFT_CPUS", "8"))
    ctx.min_parallelism = max(_cpus * 2, 16)
    ctx.read_op_min_num_blocks = max(_cpus * 2, 16)

    import ray.data as rd

    from sigraph_ray.pipelines import kg as K
    from sigraph_ray.state import manifest as M

    t0 = time.time()
    if args.pages.startswith("synth:"):
        pages = K.synth_pages(int(args.pages.split(":", 1)[1]),
                              parallelism=max(args.concurrency * 2, 8))
        input_desc = args.pages
    else:
        pages = rd.read_parquet(args.pages)
        input_desc = args.pages

    triples = K.extract_triples_pipeline(
        pages, concurrency=args.concurrency, batch_size=args.batch_size)
    # stage 1: triples — CONTENT-keyed resumable partitions (hash of
    # doc_url), sound under out-of-order streaming execution
    trip_recs = M.write_stage(triples, f"{args.out}/triples",
                              input_desc=input_desc, key="doc_url")
    triples_ds = M.read_stage(f"{args.out}/triples")
    link_recs = []
    if args.link == "auto":
        # stage 1b: A2 entity linking with the self-derived vocabulary
        # (the flagship default) — its own resume boundary. Global
        # adoption dedup: parquet reads of the persisted stage may
        # split a document across blocks, so the doc-local tier's
        # contract does not hold here.
        from sigraph_ray.stages.entity_link import link_entities

        vocab, mset = K.derive_link_vocab(triples_ds, with_mentions=True)
        linked = K.adopt_links(
            link_entities(triples_ds, vocab,
                          concurrency=args.concurrency, mentions=mset),
            scope="global")
        link_recs = M.write_stage(linked, f"{args.out}/linked",
                                  input_desc=f"{args.out}/triples",
                                  key="doc_url")
        triples_ds = M.read_stage(f"{args.out}/linked")
    # stage 2: edge aggregate from the persisted stage
    edges = K.build_kg_edges(triples_ds)
    edge_recs = M.write_stage(edges, f"{args.out}/edges",
                              input_desc=f"{args.out}/triples", key="src")
    # stage 3: entities from the persisted edge stage
    entities = K.entities_from_edges(M.read_stage(f"{args.out}/edges"))
    ent_recs = M.write_stage(entities, f"{args.out}/entities",
                             input_desc=f"{args.out}/edges", key="entity")

    summary = {
        "input": input_desc,
        "out": args.out,
        "wall_s": round(time.time() - t0, 2),
        "link": args.link,
        "stages": {
            "triples": M.stage_summary(f"{args.out}/triples"),
            "edges": M.stage_summary(f"{args.out}/edges"),
            "entities": M.stage_summary(f"{args.out}/entities"),
        },
        "partitions_written_this_run": {
            "triples": _n_written(trip_recs),
            "edges": _n_written(edge_recs),
            "entities": _n_written(ent_recs),
        },
        "partitions_skipped_this_run": {
            "triples": len(trip_recs) - _n_written(trip_recs),
            "edges": len(edge_recs) - _n_written(edge_recs),
            "entities": len(ent_recs) - _n_written(ent_recs),
        },
    }
    if args.link == "auto":
        summary["stages"]["linked"] = M.stage_summary(
            f"{args.out}/linked")
        summary["partitions_written_this_run"]["linked"] = \
            _n_written(link_recs)
        summary["partitions_skipped_this_run"]["linked"] = \
            len(link_recs) - _n_written(link_recs)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
