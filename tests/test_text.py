"""HTML→text extractor and chunker determinism (input_hint byte-identity
contract; chunker mirrors AI_CHUNK_SIZE/AI_OVERLAP 400/40,
src/app/config.py:25-26)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from sigraph_ray.functions import text as T


def test_html_strip_basics():
    html = pa.array([
        b"<html><head><title>t</title><script>x<y</script></head>"
        b"<body><nav>menu</nav><p>Hello &amp; <b>world</b></p>"
        b"<footer>foot</footer></body></html>"
    ], pa.binary())
    out = T.html_to_text(html)
    assert out.to_pylist() == ["Hello & world"]


def test_html_entities_and_whitespace():
    html = pa.array(["<p>a  &lt;tag&gt;   b</p>\n\n\n\n<p>c&nbsp;d</p>"])
    assert T.html_to_text(html).to_pylist() == ["a <tag> b\n\nc d"]


def test_extractor_is_deterministic_bytes():
    from sigraph_ray.sources import synth
    t1 = T.html_to_text(synth.pages_batch(range(50))["html"].combine_chunks())
    t2 = T.html_to_text(synth.pages_batch(range(50))["html"].combine_chunks())
    assert t1.to_pylist() == t2.to_pylist()


def test_chunk_budget_and_determinism():
    text = " ".join(f"word{i} content." for i in range(200))
    chunks = T.chunk_text(text)
    assert chunks == T.chunk_text(text)
    assert all(len(c) <= T.CHUNK_SIZE for c in chunks)
    # every source character (modulo boundary whitespace) is covered
    joined = " ".join(chunks)
    assert "word0" in joined and "word199" in joined


def test_chunk_overlap_present():
    text = "aaaa " * 200
    chunks = T.chunk_text(text.strip())
    assert len(chunks) > 1
    # consecutive chunks share a suffix/prefix region
    tail = chunks[0][-10:]
    assert tail.strip().split()[-1] in chunks[1][: T.CHUNK_OVERLAP + 10]


def test_short_text_single_chunk():
    assert T.chunk_text("short") == ["short"]
    assert T.chunk_text("") == []


def test_gazetteer_ac_kernel_matches_re2(ray_session):
    """Aho-Corasick tier parity with the RE2 kernel on corpus data AND
    the adversarial overlap/boundary cases (regex counting is
    word-bounded and per-term NON-overlapping)."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import gazetteer_mentions

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["text"])
    terms = ["hash join", "merge part", "quantum flux", "spark",
             "table scan", "window"]
    assert gazetteer_mentions(ds, terms, kernel="re2").equals(
        gazetteer_mentions(ds, terms, kernel="ac"))

    tricky = rd.from_pandas(pd.DataFrame({"text": [
        "a a a a", "sparkspark spark_x spark spark",
        "xx yy xx yy xx", "_window window window_"]}))
    tt = ["a a", "spark", "xx yy xx", "window"]
    assert gazetteer_mentions(tricky, tt, kernel="re2").equals(
        gazetteer_mentions(tricky, tt, kernel="ac"))


def test_gazetteer_ac_big_lexicon(ray_session):
    """≥10⁴-term dictionary through the AC tier: one scan regardless of
    |terms|; planted terms counted exactly, the rest zero; kernel=auto
    routes to AC at this size."""
    import ray.data as rd

    from sigraph_ray.stages.textstats import gazetteer_mentions

    lex = [f"lexterm{i:05d}" for i in range(10_000)]
    docs = pd.DataFrame({"text": [
        "lexterm00007 lexterm00007 and lexterm09999.",
        "nothing here but lexterm00007x (no boundary hit)",
        "lexterm00500, done"]})
    out = gazetteer_mentions(rd.from_pandas(docs).repartition(2), lex,
                             kernel="auto")
    got = dict(zip(out["term"], zip(out["n_mentions"], out["n_docs"])))
    assert got["lexterm00007"] == (2, 1)
    assert got["lexterm09999"] == (1, 1)
    assert got["lexterm00500"] == (1, 1)
    assert out["n_mentions"].sum() == 4 and len(out) == 10_000
