"""Hand-written adversarial KG golden (VERDICT r02 #6).

These pages were written BY HAND, sentence by sentence, specifically to
exercise the extraction contract's edge rules — they are NOT produced
by ``sources/synth.py``'s grammar, and the expected triples below were
labeled by reading the documented prompt contract
(/root/reference/src/ai/prompt.py:60-127; repo tables in
``sigraph_ray/functions/verbs.py``), not by running the extractor. This
de-circularizes the KG P/R gate: the generator-based gate proves
pipeline fidelity to the co-designed grammar, this one pins the
contract itself on text the grammar never saw.

Rules deliberately covered (one or more docs each):
  V4 speculation drop (may/could)          — docs adv01, adv09
  V2 download atomization (+fileless)      — docs adv02, adv03
  V3 generic resolution / generic-only doc — docs adv04, adv05, adv10
  V5 clause + "and then" split, ellipsis   — docs adv06, adv07
  E2 defanged [.] reactivation             — docs adv02, adv03
  E1/E4 lower+strip (mixed-case input)     — every doc
  em-dash / " -- " rationale trim          — docs adv08, adv11
  quoted object trim                       — doc adv10
  non-whitelist verb yields nothing        — docs adv08 ("restarted"),
                                             adv01 ("contact")
"""

from __future__ import annotations

import pandas as pd

# (url, paragraphs) — each paragraph becomes one <p> block (hard \n
# sentence boundary after HTML extraction).
PAGES: list[tuple[str, list[str]]] = [
    ("adv://01", ["XenoRAT may contact evil.example in future campaigns. "
                  "XenoRAT encrypts c:\\users\\victim\\data.db."]),
    ("adv://02", ["LummaStealer fetched "
                  "http://evil[.]example/drop/payload.exe quickly."]),
    ("adv://03", ["The loader pulled http://bad[.]host/stage2 in memory."]),
    ("adv://04", ["Emotet persists via "
                  "hklm\\software\\microsoft\\windows\\currentversion\\run. "
                  "The malware deleted c:\\temp\\sys.log."]),
    ("adv://05", ["The attacker exfiltrated c:\\finance\\q3\\secrets.db."]),
    ("adv://06", ["QakBot connects to 10.12.30.77:443 and then encrypts "
                  "c:\\files\\ledger.doc."]),
    ("adv://07", ["Mimikatz dumps lsass.exe and REvil encrypts "
                  "d:\\share\\docs."]),
    ("adv://08", ["Cobalt Strike beacons c2.badcorp.net — every 60 "
                  "seconds. The service restarted unexpectedly."]),
    ("adv://09", ["Agent Tesla could resolve mail.evil.example. "
                  "Agent Tesla queries smtp.evil.example."]),
    ("adv://10", ["WINWORD.EXE spawned 'powershell.exe' rapidly.",
                  "It wrote c:\\users\\public\\run.ps1 silently."]),
    ("adv://11", ["Emotet copies d:\\tools\\stage.exe -- the staging "
                  "copy."]),
]

# Hand labels: (doc_url, subj, pred, obj) after E1/E2 normalization.
EXPECTED: list[tuple[str, str, str, str]] = [
    # adv01: sentence 1 speculative (may) → dropped; "contact" is not a
    # whitelist surface anyway.
    ("adv://01", "xenorat", "encrypt", "c:\\users\\victim\\data.db"),
    # adv02: V2 atomization; E2 turns [.] into . ; basename → create.
    ("adv://02", "lummastealer", "http_request",
     "http://evil.example/drop/payload.exe"),
    ("adv://02", "lummastealer", "create", "payload.exe"),
    # adv03: fileless marker "in memory" → second atom is inject.
    ("adv://03", "the loader", "http_request", "http://bad.host/stage2"),
    ("adv://03", "the loader", "inject", "in memory"),
    # adv04: "via" preposition consumed; "The malware" (generic)
    # resolves to the doc's first named actor (emotet).
    ("adv://04", "emotet", "persist",
     "hklm\\software\\microsoft\\windows\\currentversion\\run"),
    ("adv://04", "emotet", "delete", "c:\\temp\\sys.log"),
    # adv05: generic-only document → every row dropped (banned actors,
    # prompt.py:60-67). No triples.
    # adv06: "and then" split; elided subject inherits qakbot.
    ("adv://06", "qakbot", "network_connect", "10.12.30.77:443"),
    ("adv://06", "qakbot", "encrypt", "c:\\files\\ledger.doc"),
    # adv07: plain "and" split, both clauses fully subject-ed.
    ("adv://07", "mimikatz", "credential_dump", "lsass.exe"),
    ("adv://07", "revil", "encrypt", "d:\\share\\docs"),
    # adv08: em-dash rationale trimmed; "restarted" must NOT match the
    # "started" surface inside a word.
    ("adv://08", "cobalt strike", "network_connect", "c2.badcorp.net"),
    # adv09: "could" sentence dropped; "queries" → dns_query.
    ("adv://09", "agent tesla", "dns_query", "smtp.evil.example"),
    # adv10: quote-trimmed object; "It" resolves across the paragraph
    # boundary to winword.exe (document-level resolution).
    ("adv://10", "winword.exe", "launch", "powershell.exe"),
    ("adv://10", "winword.exe", "write", "c:\\users\\public\\run.ps1"),
    # adv11: " -- " rationale trim on the object.
    ("adv://11", "emotet", "copy", "d:\\tools\\stage.exe"),
]


def pages_frame() -> pd.DataFrame:
    """The adversarial set in the input_hint page shape."""
    rows = []
    for url, paras in PAGES:
        body = "".join(f"<p>{p}</p>" for p in paras)
        rows.append({
            "url": url,
            "warc_ts": "2026-01-01T00:00:00Z",
            "html": (f"<html><head><title>adv</title></head>"
                     f"<body>{body}</body></html>").encode(),
            "text": "",
            "lang": "en",
        })
    return pd.DataFrame(rows)


def expected_frame() -> pd.DataFrame:
    return pd.DataFrame(EXPECTED,
                        columns=["doc_url", "subj", "pred", "obj"])
