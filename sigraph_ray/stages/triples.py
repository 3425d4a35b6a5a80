"""P3/P5/P6 — triple extraction (actor pool), actor resolution (per-url
groupby), and normalization stages (SURVEY.md §7.1).

The extractor is a callable CLASS so Ray runs it as an actor pool:
regex compilation and vocab tables are built once per actor in
``__init__`` (the batch analog of the reference loading its LLM client
once per process, src/ai/ai_agent.py:104-199), then reused across
batches. With a real model this is where warm weights would live; the
deterministic grammar keeps the same shape at near-zero setup cost.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from sigraph_ray.functions import extract as X
from sigraph_ray.functions import normalize as N
from sigraph_ray.functions import verbs as V


class TripleExtractor:
    """P3+P5: chunk rows → raw triple rows (actor-pool stage).

    ``backend`` is the EXTRACTOR SEAM: any callable mapping chunk rows
    ``(url, chunk_id, text)`` to ``functions.extract.TRIPLE_COLUMNS``
    rows — the place where a model-backed extractor drops in (the
    reference selects gemini/gpt/ollama clients by model-name prefix,
    ai_agent.py:104-199; a real backend would construct its warm client
    HERE, once per actor). Default: the deterministic grammar;
    ``backend="ensemble"`` selects the A3 debate-ensemble
    (functions.extract.extract_triples_ensemble).

    Deterministic per (url, chunk_id) for any deterministic backend —
    required for lineage-based Ray task retries and the
    reproducible-triple-set contract (north rule).
    """

    def __init__(self, backend=None) -> None:
        # resolve + touch compiled patterns so setup cost is paid at
        # actor construction, not first batch
        self._extract = _resolve_backend(backend)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return self._extract(batch)


def _resolve_backend(backend):
    if backend is None:
        return X.extract_triples
    if backend == "ensemble":
        return X.extract_triples_ensemble
    if callable(backend):
        return backend
    raise ValueError(f"unknown extractor backend: {backend!r}")


def resolve_actors_group(group: pd.DataFrame) -> pd.DataFrame:
    """V3 — document-level generic-actor resolution; runs under
    ``groupby("doc_url").map_groups`` so all chunks of a document meet
    in one group regardless of which batch extracted them."""
    return X.resolve_generic_actors(group)


def normalize_batch(batch: pa.Table) -> pa.Table:
    """P6 — E1 strip/lower + E2 defang on both endpoints, E3 sanitize on
    the predicate (ai_agent.py:354-403)."""
    subj = N.normalize_entity_id(batch.column("subj"))
    obj = N.normalize_entity_id(batch.column("obj"))
    pred = N.sanitize_edge_type(batch.column("pred"))
    out = batch.set_column(batch.schema.get_field_index("subj"), "subj", subj)
    out = out.set_column(out.schema.get_field_index("obj"), "obj", obj)
    out = out.set_column(out.schema.get_field_index("pred"), "pred", pred)
    return out


def extract_triples_stage(chunks, *, concurrency: int | tuple[int, int] = 4,
                          batch_size: int = 1024, backend=None):
    """chunks Dataset → normalized triple Dataset.

    The per-url groupby is a shuffle, but on (url → few rows) keys it is
    cheap; documents are small and uniformly distributed, and the group
    function only rewrites the generic-subject minority.
    """
    raw = chunks.map_batches(
        TripleExtractor,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"backend": backend},
    )
    resolved = raw.groupby("doc_url").map_groups(
        resolve_actors_group, batch_format="pandas")
    return resolved.map_batches(normalize_batch, batch_format="pyarrow")


class DocTripleExtractor:
    """Fused doc-local stage: chunk (400/40) → extract (V1-V5) →
    resolve generic actors (V3) → normalize (E1/E2/E3) → per-doc dedup,
    all inside one actor-pool ``map_batches`` over DOCUMENT rows.

    Every one of those steps is document-local (V3 resolves within one
    report, dedup is per (doc_url, subj, pred, obj)), so keeping a
    document's chunks inside one batch eliminates the per-url groupby
    shuffle entirely — the only remaining wide exchanges in the KG
    pipeline are the real canonicalization/edge aggregations. This is
    the throughput path; the unfused stages above exist for
    composability and are semantics-identical (tested).
    """

    def __init__(self, backend=None) -> None:
        from sigraph_ray.functions import text as TXT
        self._chunk = TXT.chunk_text
        self._extract = _resolve_backend(backend)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        urls = batch.column("url").to_pylist()
        texts = pc.utf8_lower(batch.column("text")).to_pylist()
        rows_url: list[str] = []
        rows_cid: list[int] = []
        rows_text: list[str] = []
        for u, t in zip(urls, texts):
            for ci, ch in enumerate(self._chunk(t)):
                rows_url.append(u)
                rows_cid.append(ci)
                rows_text.append(ch)
        cdf = pd.DataFrame({"url": rows_url, "chunk_id": rows_cid,
                            "text": rows_text})
        tr = self._extract(cdf)
        if len(tr):
            tr = X.resolve_generic_actors_batch(tr)
        out = pa.Table.from_pandas(tr, preserve_index=False)
        out = normalize_batch(out)
        # per-doc dedup (doc never spans batches here): keep min ord
        df = out.to_pandas()
        if len(df):
            idx = df.groupby(["doc_url", "subj", "pred", "obj"],
                             sort=False)["ord"].idxmin()
            df = df.loc[idx.values]
        return pa.Table.from_pandas(df, preserve_index=False)


def triples_with_direction(batch: pa.Table) -> pa.Table:
    """Apply sigraph's behavioral-pattern edge typing to the triple
    stream (SURVEY.md §1.4; element.py:192-226): read-like verbs behave
    as READ_RECV (edge obj → subj), everything else as WRITE_SEND
    (edge subj → obj). Adds src/dst/action_type columns."""
    import pyarrow.compute as pc

    pred = batch.column("pred")
    read_like = pc.is_in(pred, value_set=pa.array(sorted(V.READ_LIKE)))
    subj = batch.column("subj")
    obj = batch.column("obj")
    src = pc.if_else(read_like, obj, subj)
    dst = pc.if_else(read_like, subj, obj)
    # action_type via a dictionary lookup on the closed verb vocab
    mapping = {v: V.action_for_verb(v) for v in V.VERBS}
    action_type = _map_strings(pred, mapping)
    out = batch.append_column("src", src)
    out = out.append_column("dst", dst)
    out = out.append_column("action_type", action_type)
    return out


def _map_strings(col: pa.Array | pa.ChunkedArray, mapping: dict[str, str]) -> pa.Array:
    """Vectorized closed-vocabulary string mapping via dictionary
    index_in + take (no per-row Python)."""
    import pyarrow.compute as pc

    keys = pa.array(sorted(mapping))
    vals = pa.array([mapping[k] for k in sorted(mapping)])
    idx = pc.index_in(col, value_set=keys)
    return pc.take(vals, idx)
