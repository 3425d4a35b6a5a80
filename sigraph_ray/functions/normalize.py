"""Entity / edge-type normalization kernels (reference's LLM-KG side).

Semantics reproduced (citations into /root/reference):

- E1 entity-id unification = ``strip().lower()`` applied to every node id
  and relationship endpoint (src/ai/ai_agent.py:401-403, 354-387) and to
  query entities (:473). This is THE canonicalization key function.
- E2 defanged-URL re-activation: ``"[.]" → "."`` on node ids
  (ai_agent.py:394-398).
- E3 relationship-type sanitization: Lucene special characters stripped
  (ai_agent.py:378 via langchain's remove_lucene_chars — the public
  Lucene special set ``+ - && || ! ( ) { } [ ] ^ " ~ * ? : \\ /``).
- E4 whole-report lowercasing before extraction (ai_agent.py:233-234).

All pure pyarrow.compute; operate on string arrays inside
``map_batches(batch_format="pyarrow")``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Public Lucene special characters (E3).
_LUCENE_RE = r'[+\-!(){}\[\]^"~*?:\\/|&]'


def normalize_entity_id(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """E1 + E2: strip whitespace, lowercase, re-activate defanged dots."""
    out = pc.utf8_trim_whitespace(col)
    out = pc.utf8_lower(out)
    out = pc.replace_substring(out, "[.]", ".")
    return out


def sanitize_edge_type(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """E3: Lucene special chars become spaces (matching the public
    ``remove_lucene_chars`` behavior: per-char replace-with-space then
    whitespace re-join), runs collapsed, trimmed."""
    out = pc.replace_substring_regex(col, _LUCENE_RE, " ")
    out = pc.replace_substring_regex(out, r"\s+", " ")
    return pc.utf8_trim_whitespace(out)


def lowercase_text(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """E4: whole-document lowercasing before extraction."""
    return pc.utf8_lower(col)
