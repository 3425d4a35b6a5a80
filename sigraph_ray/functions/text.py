"""Deterministic HTML→text extraction and chunking.

- The extractor is the engine's analog of the reference's
  report-refinement front end (the reference receives already-plain
  report text over HTTP, src/app/backend/v1/api.py:368-378; our input is
  Common-Crawl-style pages with ``html: binary`` per BASELINE.json
  input_hint). The north rule requires **byte-identical extracted text
  per url**, so the extractor is a frozen, fully deterministic rule set:
  fixed rule order, RE2 regexes (no locale, no dict-order dependence),
  fixed entity table, fixed whitespace normalization. Golden-tested.

- The chunker mirrors the reference's
  ``RecursiveCharacterTextSplitter(chunk_size=400, chunk_overlap=40)``
  (src/ai/ai_agent.py:348-352; defaults src/app/config.py:25-26) as a
  deterministic greedy packer over paragraph/sentence/word boundaries
  with a 40-char whitespace-aligned overlap. The exact boundary
  algorithm is OUR contract (documented here, golden-tested); the
  load-bearing part is determinism + the 400/40 budget.

HTML stripping is vectorized end-to-end with pyarrow.compute RE2
kernels; chunking is per-document Python over already-small strings
(inherently sequential per doc).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

CHUNK_SIZE = 400
CHUNK_OVERLAP = 40

# Rule order is load-bearing (byte-identity contract). All RE2.
_STRIP_BLOCKS = (
    r"(?is)<head\b[^>]*>.*?</head>",
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?is)<nav\b[^>]*>.*?</nav>",
    r"(?is)<header\b[^>]*>.*?</header>",
    r"(?is)<footer\b[^>]*>.*?</footer>",
    r"(?is)<aside\b[^>]*>.*?</aside>",
    r"(?s)<!--.*?-->",
)
_BLOCK_TAG_TO_NL = (
    r"(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|"
    r"blockquote|pre|hr)\b[^>]*>"
)
_ANY_TAG = r"(?s)<[^>]*>"
# Fixed entity table, applied in this exact order (&amp; last so freshly
# produced '&' never re-combines).
_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ("&nbsp;", " "), ("&amp;", "&"),
)


def html_to_text(html: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Strip boilerplate and tags from an Arrow binary/string column of
    HTML, returning the byte-identity-contracted plain text."""
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        text = pc.cast(html, pa.string())
    else:
        text = html
    for pat in _STRIP_BLOCKS:
        text = pc.replace_substring_regex(text, pat, "")
    text = pc.replace_substring_regex(text, _BLOCK_TAG_TO_NL, "\n")
    text = pc.replace_substring_regex(text, _ANY_TAG, "")
    for ent, rep in _ENTITIES:
        text = pc.replace_substring(text, ent, rep)
    # whitespace normalization: tabs/CR → space, trim each line,
    # collapse intra-line space runs, collapse 3+ newlines to 2, trim.
    text = pc.replace_substring_regex(text, r"[\t\r\f\v]", " ")
    text = pc.replace_substring_regex(text, r" *\n *", "\n")
    text = pc.replace_substring_regex(text, r"  +", " ")
    text = pc.replace_substring_regex(text, r"\n{3,}", "\n\n")
    text = pc.utf8_trim_whitespace(text)
    return text


def chunk_text(text: str, size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP) -> list[str]:
    """Deterministic greedy chunker: ≤``size`` chars per chunk, split
    preferentially at paragraph > sentence > word boundaries, each chunk
    after the first prefixed with the previous chunk's last ≤``overlap``
    chars (cut back to a whitespace boundary)."""
    if len(text) <= size:
        return [text] if text else []
    chunks: list[str] = []
    pos = 0
    n = len(text)
    while pos < n:
        end = min(pos + size, n)
        if end < n:
            cut = _best_break(text, pos, end)
            if cut > pos:
                end = cut
        chunk = text[pos:end].strip()
        if chunk:
            chunks.append(chunk)
        if end >= n:
            break
        # overlap: back up ≤overlap chars to a whitespace boundary
        back = max(pos + 1, end - overlap)
        ws = text.rfind(" ", back, end)
        nl = text.rfind("\n", back, end)
        b = max(ws, nl)
        pos = b + 1 if b > back else end
    return chunks


def _best_break(text: str, start: int, end: int) -> int:
    """Best split point in (start, end]: paragraph, newline, sentence
    end, then word boundary; 0 if none (hard cut at end)."""
    for pat in ("\n\n", "\n"):
        i = text.rfind(pat, start + 1, end)
        if i > start:
            return i
    i = text.rfind(". ", start + 1, end)
    if i > start:
        return i + 1  # keep the period with the sentence
    for ch in (" ",):
        i = text.rfind(ch, start + 1, end)
        if i > start:
            return i
    return 0
