"""Generic JSON-column extraction — the per-actor parser tier behind
the regex fast path (pipelines/queries.q_props_stats documents the
seam; reference analog: the dynamic-mapping ingestion surface S4,
src/db/db_model.py dynamic templates, which types arbitrary
``raw_data`` payload keys at index time).

The regex fast path (``Series.str.extract``) only works for FLAT
scalar keys whose layout is regular; this stage is the general tier:
an actor-pool ``map_batches`` class whose ``__init__`` compiles the
dotted-path plan once per actor, and whose per-batch call parses each
JSON document once and walks all requested paths — O(bytes + paths)
per row regardless of nesting depth, instead of one regex scan per
path. JSON parsing is inherently per-record (no vectorized nested-JSON
kernel ships in this container); the loop is the documented cost and
the batch/actor plumbing is the production shape — a faster parser
(orjson, simdjson) drops into ``_loads`` without touching the
dataflow.

Missing keys / nulls / type mismatches yield nulls (never raise):
ingestion must quarantine by predicate, not crash the stream —
the same contract as the provenance enum coercers (M5).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

_CASTS = {
    "int64": "Int64",      # pandas nullable int (missing keys → <NA>)
    "float64": "float64",
    "string": "object",
    "bool": "boolean",
}


class JsonPathExtractor:
    """Actor-pool stage: ``paths`` maps output column → (dotted path,
    dtype in int64|float64|string|bool). Appends one typed column per
    path; the JSON column itself is dropped (extract-then-discard, the
    prune-at-the-stage-boundary discipline)."""

    def __init__(self, paths: dict[str, tuple[str, str]],
                 json_col: str = "props", keep_json: bool = False):
        for col, (_, dt) in paths.items():
            if dt not in _CASTS:
                raise ValueError(f"{col!r}: unsupported dtype {dt!r}")
        # the per-actor "compile": split every dotted path once
        self.plan = [(col, path.split("."), dt)
                     for col, (path, dt) in paths.items()]
        self.json_col = json_col
        self.keep_json = keep_json

    @staticmethod
    def _loads(s):
        try:
            return json.loads(s)
        except (TypeError, ValueError):
            return None

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        docs = [self._loads(s) for s in df[self.json_col]]
        out = df if self.keep_json else df.drop(columns=[self.json_col])
        out = out.copy()
        for col, steps, dt in self.plan:
            vals = []
            for doc in docs:
                v = doc
                for step in steps:
                    if not isinstance(v, dict):
                        v = None
                        break
                    v = v.get(step)
                if dt == "int64":
                    vals.append(int(v) if isinstance(v, (int, np.integer))
                                and not isinstance(v, bool) else None)
                elif dt == "float64":
                    vals.append(float(v) if isinstance(
                        v, (int, float, np.integer, np.floating))
                        and not isinstance(v, bool) else None)
                elif dt == "bool":
                    vals.append(v if isinstance(v, bool) else None)
                else:
                    vals.append(v if isinstance(v, str) else None)
            out[col] = pd.array(vals, dtype=_CASTS[dt])
        return out


def extract_json_paths(ds, paths: dict[str, tuple[str, str]], *,
                       json_col: str = "props", concurrency: int = 2,
                       batch_size: int = 4096, num_cpus: float = 1.0):
    """Dataset wrapper: one actor pool, plan compiled per actor in
    ``__init__``, typed columns out."""
    return ds.map_batches(
        JsonPathExtractor, batch_format="pandas", batch_size=batch_size,
        fn_constructor_kwargs={"paths": paths, "json_col": json_col},
        concurrency=concurrency, num_cpus=num_cpus)
