"""P1/P2 — HTML→text extraction and chunking stages (SURVEY.md §7.1).

P1 is a stateless ``map_batches`` over zero-copy Arrow batches; the
``html`` binary column is dropped IMMEDIATELY after text extraction so
wide binary blocks never flow further down the pipeline (SURVEY.md §7.3
"Wide rows"). P2 explodes each document into 400/40 chunks
(reference: RecursiveCharacterTextSplitter(400, 40),
src/ai/ai_agent.py:348-352) and lowercases text first (E4,
ai_agent.py:233-234) so everything downstream operates on the
extraction contract's casing.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from sigraph_ray.functions import text as T


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """P1: (url, warc_ts, html, text, lang) → (url, lang, text).

    The extracted text is byte-identical per url across runs and
    parallelism levels (input_hint invariant; RE2 rule chain in
    functions/text.py).
    """
    txt = T.html_to_text(batch.column("html"))
    return pa.table({
        "url": batch.column("url"),
        "lang": batch.column("lang"),
        "text": txt,
    })


def chunk_batch(batch: pa.Table) -> pa.Table:
    """P2: explode documents into (url, chunk_id, text) chunk rows,
    lowercased (E4). Per-document chunking is inherently sequential;
    the outer loop is per document, not per output row."""
    urls = batch.column("url").to_pylist()
    texts = pc.utf8_lower(batch.column("text")).to_pylist()
    out_url: list[str] = []
    out_cid: list[int] = []
    out_text: list[str] = []
    for u, t in zip(urls, texts):
        for ci, ch in enumerate(T.chunk_text(t)):
            out_url.append(u)
            out_cid.append(ci)
            out_text.append(ch)
    return pa.table({
        "url": pa.array(out_url, pa.string()),
        "chunk_id": pa.array(out_cid, pa.int64()),
        "text": pa.array(out_text, pa.string()),
    })


def extract_and_chunk(pages, *, batch_size: int = 256):
    """pages Dataset → chunks Dataset. ``batch_size`` is modest because
    html payloads are wide; at 100 TB the read layer sizes blocks by
    bytes and this stage shrinks them immediately."""
    ds = pages.map_batches(extract_text_batch, batch_format="pyarrow",
                           batch_size=batch_size)
    return ds.map_batches(chunk_batch, batch_format="pyarrow",
                          batch_size=batch_size)
