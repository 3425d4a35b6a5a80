"""URL canonicalization for web-crawl ingest — the dedup KEY function
for Common-Crawl-style page tables (BASELINE.json input_hint:
``url, warc_ts, html, text, lang``). Crawls revisit the same resource
under cosmetically different URLs (scheme/host case, ``www.``,
default ports, tracking params, fragments, trailing slashes); doc- or
passage-level dedup only fires after these collapse. The reference
has no web-ingest surface — beyond-reference per the brief; rules are
the standard RFC 3986 §6 normalizations plus tracking-param removal.

Doc-local and shuffle-free: one ordered, anchored regex chain per
batch (compiled once per process by pandas' C-backed str kernels),
exactly mirrored in the SQL oracle (pipelines/queries.SQL_HOST_STATS)
— the same ordered-RE2-chain discipline as stages/textclean.pii_scrub.
"""

from __future__ import annotations

import pandas as pd

# (pattern, replacement) applied IN ORDER; each anchored so the chain
# is confluent. Kept in one table so the SQL oracle can be read against
# it rule-for-rule.
CANON_RULES = [
    (r"#.*$", ""),                       # 1. drop fragment
    (r"\?utm_[^#]*$", ""),               # 2. drop tracking-only query
    # 3. lowercase scheme+authority (handled separately — needs a
    #    case function, not a replacement)
    (r"^(https?://)www\.", r"\1"),       # 4. drop leading www.
    (r":(80|443)(/|$)", r"\2"),          # 5. drop default ports
    (r"/$", ""),                         # 6. drop trailing slash
]

_AUTHORITY = r"^[^/]+//[^/]+"
_HOST = r"^https?://([^/:]+)"


def canonicalize_batch(urls: pd.Series) -> pd.Series:
    """Canonical form of each URL (vectorized; rule order above)."""
    u = urls.str.replace(CANON_RULES[0][0], CANON_RULES[0][1], regex=True)
    u = u.str.replace(CANON_RULES[1][0], CANON_RULES[1][1], regex=True)
    auth = u.str.extract(f"({_AUTHORITY})", expand=False).str.lower()
    rest = u.str.replace(_AUTHORITY, "", regex=True)
    u = auth.fillna("") + rest
    for pat, rep in CANON_RULES[2:]:
        u = u.str.replace(pat, rep, regex=True)
    return u


def canonicalize_urls(ds, *, url_col: str = "url"):
    """Add ``canon_url`` and ``host`` columns to a page Dataset —
    stateless ``map_batches``, no shuffle; the canonical URL is the
    downstream exact-dedup / partitioning key."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        canon = canonicalize_batch(df[url_col])
        out = df.copy()
        out["canon_url"] = canon
        out["host"] = canon.str.extract(_HOST, expand=False)
        return out

    return ds.map_batches(f, batch_format="pandas")
