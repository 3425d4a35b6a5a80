"""PII redaction over document text — a standard pre-training corpus
cleaning pass (C4/Dolma-style) the reference has no analog for (its
only text path is LLM refinement of threat reports); part of the
build-brief "operations a large-scale training-data pipeline needs".

Pure ``pyarrow.compute`` RE2 kernels, so the DuckDB oracle (also RE2)
reproduces the scan bit-for-bit. The four patterns are applied in a
FIXED order (email → SSN-like id → phone → IPv4) and each pattern's
occurrence count is taken on the text as it stood BEFORE that
pattern's replacement — the SQL oracle chains CTEs in the same order,
so overlap resolution is identical by construction.

Scale shape: embarrassingly parallel ``map_batches`` over zero-copy
Arrow blocks; no shuffle, no state, no driver work — the one family of
operator that is trivially 100 TB-safe as long as it stays vectorized
(RE2 on an Arrow string column; never a Python ``re`` loop per row).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible (no lookaround); identical strings are embedded in the
# SQL oracle (pipelines/queries.py SQL_PII_SCRUB) — keep in sync.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# (pattern, replacement token, count column) — order is load-bearing:
# SSN before generic phone so `123-45-6789` is an <ID> not a partial
# phone; IPv4 last so dotted phone forms are consumed by PHONE first.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (EMAIL_RE, "<EMAIL>", "n_emails"),
    (SSN_RE, "<ID>", "n_ids"),
    (PHONE_RE, "<PHONE>", "n_phones"),
    (IPV4_RE, "<IP>", "n_ips"),
)


def pii_scrub_batch(batch: pa.Table, *, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    txt = batch.column(text_col)
    cols: dict = {id_col: batch.column(id_col)}
    counts = {}
    for pat, token, cnt_col in PII_RULES:
        counts[cnt_col] = pc.cast(
            pc.count_substring_regex(txt, pat), pa.int64())
        txt = pc.replace_substring_regex(txt, pat, token)
    cols[text_col] = txt
    cols.update(counts)
    return pa.table(cols)


def pii_scrub(ds, **kw):
    """Redact emails / SSN-like ids / phone numbers / IPv4 addresses,
    returning the cleaned text plus per-document redaction counts."""
    return ds.map_batches(lambda b: pii_scrub_batch(b, **kw),
                          batch_format="pyarrow")
