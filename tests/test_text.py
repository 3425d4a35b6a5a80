"""HTML→text extractor and chunker determinism (input_hint byte-identity
contract; chunker mirrors AI_CHUNK_SIZE/AI_OVERLAP 400/40,
src/app/config.py:25-26)."""

from __future__ import annotations

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
