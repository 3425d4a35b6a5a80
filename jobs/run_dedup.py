"""Corpus-dedup job entry point — the ``ray job submit`` target for the
training-data cleaning path (the brief's 100 TB use case: dedup a
document corpus before it feeds a training pipeline).

    ray job submit --working-dir . -- python jobs/run_dedup.py \
        --docs /root/testdata/sf0.1/documents.parquet --out /tmp/dedup-1

Stages (each a resumable manifest stage; re-submitting the SAME command
after a failure skips completed partitions):

1. ``exact``    — exact dedup kept-ids (content-md5 min-id);
2. ``clusters`` — MinHash-LSH near-dup cluster assignment for the
   exact-surviving docs;
3. ``kept``     — final kept document table: one representative per
   near-dup cluster (min doc id), i.e. the deduplicated corpus.

Standalone use (``python jobs/run_dedup.py ...``) owns a guarded Ray
session, like jobs/run_kg.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH") else _REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True,
                    help="parquet path/dir with (doc_id, text)")
    ap.add_argument("--out", required=True, help="output root directory")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--num-cpus", type=int, default=None)
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

    import pandas as pd
    import ray.data as rd

    from sigraph_ray.stages import dedup as D
    from sigraph_ray.state import manifest as M

    t0 = time.time()
    docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])

    # stage 1: exact dedup — kept ids, content-keyed partitions
    kept = D.exact_dedup(docs)
    M.write_stage(kept, f"{args.out}/exact", input_desc=args.docs,
                  key="content_md5")
    kept_ids = M.read_stage(f"{args.out}/exact")

    # survivors = docs whose id is an exact-dedup kept id (broadcast
    # semi-filter: the kept-id set ships as block refs)
    refs = list(kept_ids.map_batches(
        lambda df: pd.DataFrame({"u": df["kept_id"],
                                 "v": df["kept_id"]}),
        batch_format="pandas").materialize().to_arrow_refs())
    survivors = docs.map_batches(
        D._ParticipantTexts, batch_format="pandas",
        fn_constructor_kwargs={"pair_refs": refs, "id_col": "doc_id",
                               "text_col": "text"},
        concurrency=args.concurrency).map_batches(
        lambda df: df.rename(columns={"side_id": "doc_id",
                                      "side_text": "text"}),
        batch_format="pandas").materialize()
    # ^ stage boundary: chaining this filter pool INTO minhash's
    # signature pool puts two reserved actor pools in one streaming
    # execution and starves the read producer outright (observed
    # deadlock at 8 cpus with 4+4 actors) — same lesson as
    # build_kg_edges_staged

    # stage 2: near-dup clusters over the survivors
    clusters = D.minhash_lsh_dedup(survivors, threshold=args.threshold,
                                   concurrency=args.concurrency)
    M.write_stage(clusters, f"{args.out}/clusters",
                  input_desc=f"{args.out}/exact", key="doc_id")

    # stage 3: final kept corpus — cluster representatives (min doc id
    # == cluster_id by construction)
    reps = (M.read_stage(f"{args.out}/clusters")
            .map_batches(lambda df: df[df["doc_id"] == df["cluster_id"]],
                         batch_format="pandas"))
    rep_refs = list(reps.map_batches(
        lambda df: pd.DataFrame({"u": df["doc_id"], "v": df["doc_id"]}),
        batch_format="pandas").materialize().to_arrow_refs())
    final = docs.map_batches(
        D._ParticipantTexts, batch_format="pandas",
        fn_constructor_kwargs={"pair_refs": rep_refs, "id_col": "doc_id",
                               "text_col": "text"},
        concurrency=args.concurrency).map_batches(
        lambda df: df.rename(columns={"side_id": "doc_id",
                                      "side_text": "text"}),
        batch_format="pandas")
    M.write_stage(final, f"{args.out}/kept",
                  input_desc=f"{args.out}/clusters", key="doc_id")

    summary = {
        "input": args.docs,
        "out": args.out,
        "wall_s": round(time.time() - t0, 2),
        "stages": {name: M.stage_summary(f"{args.out}/{name}")
                   for name in ("exact", "clusters", "kept")},
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
