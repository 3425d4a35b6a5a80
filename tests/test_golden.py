"""Committed goldens (FIXTURES.md F5): byte-identical extracted text per
url (input_hint invariant) and the frozen triple oracle. A change to the
extractor or the verb contract fails here FIRST — regenerate goldens
only deliberately (see golden/README note in repo README)."""

from __future__ import annotations

import hashlib
import pathlib

import pandas as pd

from sigraph_ray.functions import text as T
from sigraph_ray.sources import synth

GOLDEN = pathlib.Path(__file__).resolve().parent.parent / "golden"


def test_extracted_text_byte_identity():
    tbl = synth.pages_batch(range(20))
    txt = T.html_to_text(tbl["html"].combine_chunks())
    for u, t in zip(tbl["url"].to_pylist(), txt.to_pylist()):
        h = hashlib.sha256(u.encode()).hexdigest()[:16]
        want = (GOLDEN / "extracted_text" / f"{h}.txt").read_bytes()
        assert t.encode("utf-8") == want, u


def test_golden_triples_frozen():
    want = pd.read_parquet(GOLDEN / "triples.parquet")
    got = synth.expected_triples(200).sort_values(
        ["doc_url", "subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
