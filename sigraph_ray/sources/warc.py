"""WARC crawl-archive ingest — the on-disk format Common-Crawl-style
page tables are DERIVED from (ISO 28500 record framing; the
BASELINE.json input_hint's ``(url, warc_ts, html, text, lang)`` parquet
is the post-ingest shape). The reference has no web-ingest surface —
beyond-reference per the brief.

Scale shape: the FILE is the parallel unit (Common Crawl ships ~64k
×~1 GB ``.warc.gz`` segments per crawl), so ``read_warc`` streams
``read_binary_files`` blobs and explodes each into page rows with one
stateless ``map_batches`` — no shuffle, no driver involvement, and the
``html`` payload stays ``binary`` all the way into
``stages/extract.extract_text_batch`` (which drops it right after text
extraction). Record parsing is inherently sequential WITHIN a file
(records are length-prefix framed, each header names the next offset);
across files it is embarrassingly parallel, which is the only
parallelism that matters at 10^12 documents.

Round-trip tested: ``pages_to_warc_bytes`` (also the deterministic
test fixture) → ``records_from_warc_bytes`` reproduces the page table
byte-identically (tests/test_sources.py).
"""

from __future__ import annotations

import gzip

import pandas as pd
import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def _parse_headers(raw: bytes) -> dict:
    """WARC named fields: ``Name: value`` lines, case-insensitive
    names (ISO 28500 §5.1); values are UTF-8."""
    out = {}
    for line in raw.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().lower().decode("ascii", "replace")] = \
                v.strip().decode("utf-8", "replace")
    return out


def records_from_warc_bytes(blob: bytes) -> list[dict]:
    """Parse one WARC file's bytes (plain or gzip — Common Crawl uses
    one gzip member per record, which ``gzip.decompress`` concatenates
    transparently) into page dicts ``{url, warc_ts, html}``.

    Only ``WARC-Type: response`` records yield rows (warcinfo /
    request / metadata records are skipped, as every WARC consumer
    must); the HTTP envelope inside the response block is stripped so
    ``html`` is the raw body bytes.
    """
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    rows, pos, n = [], 0, len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not blob.startswith(b"WARC/", pos):
            raise ValueError(f"not a WARC record at offset {pos}")
        hdr_end = blob.index(_CRLF2, pos)
        headers = _parse_headers(blob[pos:hdr_end])
        length = int(headers["content-length"])
        block = blob[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type") == "response":
            http_split = block.find(_CRLF2)
            body = block[http_split + 4:] if http_split >= 0 else block
            rows.append({
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": pd.Timestamp(
                    headers.get("warc-date", "1970-01-01T00:00:00Z")
                ).tz_localize(None),
                "html": body,
            })
    return rows


def pages_to_warc_bytes(df: pd.DataFrame, *, compress: bool = False,
                        with_warcinfo: bool = True) -> bytes:
    """Serialize page rows (``url``, ``warc_ts``, ``html``) as a WARC
    file — one ``response`` record per page wrapped in a minimal HTTP
    envelope, preceded by a ``warcinfo`` record readers must skip.
    Deterministic (pure function of the rows); with ``compress`` each
    record is its own gzip member, the Common-Crawl layout."""
    def _record(rtype: str, headers: dict, block: bytes) -> bytes:
        h = [b"WARC/1.0",
             f"WARC-Type: {rtype}".encode()]
        h += [f"{k}: {v}".encode() for k, v in headers.items()]
        h.append(f"Content-Length: {len(block)}".encode())
        raw = b"\r\n".join(h) + _CRLF2 + block + _CRLF2
        return gzip.compress(raw, mtime=0) if compress else raw

    out = []
    if with_warcinfo:
        info = b"software: sigraph_ray-synth\r\n"
        out.append(_record("warcinfo",
                           {"Content-Type": "application/warc-fields"},
                           info))
    for r in df.itertuples(index=False):
        html = bytes(r.html)
        envelope = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    + f"Content-Length: {len(html)}".encode() + _CRLF2)
        ts = pd.Timestamp(r.warc_ts)
        out.append(_record(
            "response",
            {"WARC-Target-URI": r.url,
             "WARC-Date": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
             "Content-Type": "application/http; msgtype=response"},
            envelope + html))
    return b"".join(out)


def read_warc(paths, *, text: str = "", lang: str = "und"):
    """WARC file(s) → input_hint-shaped page Dataset
    ``(url, warc_ts, html, text, lang)``. One stateless explode per
    file blob; downstream is the normal page pipeline
    (``extract_text_batch`` fills ``text`` and drops ``html``)."""
    import ray.data as rd

    def explode(batch: pa.Table) -> pa.Table:
        rows = []
        for blob in batch.column("bytes").to_pylist():
            rows.extend(records_from_warc_bytes(blob))
        return pa.table({
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([text] * len(rows), pa.string()),
            "lang": pa.array([lang] * len(rows), pa.string()),
        })

    return rd.read_binary_files(paths).map_batches(
        explode, batch_format="pyarrow")
