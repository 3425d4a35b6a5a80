"""End-of-round pre-flight: run EVERY registered query at driver scale
(default sf0.01) against its DuckDB oracle — the strongest local
rehearsal of the driver's CORRECTNESS gate (same normalize as
``tests/test_oracle_parity``, which itself runs at sf0.001 inside the
pytest session).

    python jobs/preflight.py [--sf /root/testdata/sf0.01] [--cpus 32] \
        [--only name1,name2]

Exit code 0 iff every oracled query hash-matches and every rows-only
query executes cleanly. Owns its Ray session (CLI entry point — the
driver contract in ``__ray_entry__`` never calls ``ray.init``).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--only", default="",
                    help="comma-separated query names (default: all)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as em
    from test_oracle_parity import assert_strict_match, normalize

    qs, osql = em.queries(), em.oracle_sql()
    names = [n for n in args.only.split(",") if n] or list(qs)
    fails, t00 = [], time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            got = qs[name](args.sf)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            if name in osql:
                con = duckdb.connect()
                for t in TABLES:
                    con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"'{args.sf}/{t}.parquet'")
                want = con.sql(osql[name]).df()
                g, w = normalize(got), normalize(want)
                assert_strict_match(g, w, name)
                status = "OK"
            else:
                if len(got.columns) == 0:
                    raise AssertionError("empty schema")
                status = "ok(rows-only)"
        except Exception as e:  # noqa: BLE001 — report and continue
            status = "FAIL " + repr(e)[:160]
            fails.append(name)
        print(f"[{i + 1}/{len(names)}] {name}: {status} "
              f"({time.time() - t0:.1f}s)", flush=True)
    print(f"DONE {len(names) - len(fails)}/{len(names)} in "
          f"{time.time() - t00:.0f}s; fails={fails}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
