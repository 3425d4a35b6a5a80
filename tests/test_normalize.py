"""E1-E4 normalization kernels (ai_agent.py:233-234, 378, 394-403)."""

from __future__ import annotations

import pyarrow as pa

from sigraph_ray.functions import normalize as N


def test_entity_id_unification_strip_lower():
    col = pa.array(["  EvIl.ExE  ", "ALL CAPS", "ok"])
    assert N.normalize_entity_id(col).to_pylist() == ["evil.exe", "all caps", "ok"]


def test_defang_reversal():
    col = pa.array(["evil[.]com", "a[.]b[.]c", "clean.com"])
    assert N.normalize_entity_id(col).to_pylist() == ["evil.com", "a.b.c", "clean.com"]


def test_edge_type_sanitizer_lucene_chars():
    col = pa.array(['net+work:con\\nect*', 'a  &&  b', 'plain'])
    out = N.sanitize_edge_type(col).to_pylist()
    assert out == ["net work con nect", "a b", "plain"]


def test_lowercase_text():
    assert N.lowercase_text(pa.array(["AbC"])).to_pylist() == ["abc"]
