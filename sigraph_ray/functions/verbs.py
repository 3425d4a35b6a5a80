"""Behavior-verb vocabulary and normalization tables (V1-V5).

The reference enforces these rules through an LLM prompt contract
(src/ai/prompt.py:60-127) and a structured-output Literal type
(src/ai/output_format.py:25-30). We make the contract an explicit,
deterministic table so a rule-based batch extractor reproduces it.

Reproduced semantics (citations into /root/reference):

- V0 23-verb whitelist (output_format.py:25-30, prompt.py:69-75).
- V1 surface-verb normalization (prompt.py:77-86):
  ``launch/execute/run → launch``, ``drop → create``,
  ``beacon/call/connect → network_connect`` (``http_request`` when an
  HTTP URL is explicit), plus common inflections.
- V2 download atomization (prompt.py:83-99, 221-226): one
  "download-like" behavior always becomes TWO actions —
  ``http_request|network_request <endpoint>`` then ``create <path>``
  (or ``inject`` in-memory when fileless).
- V3 generic-actor ban (prompt.py:60-67): Attacker/Adversary/Operator/
  Threat actor/Malware/Tool/It must resolve to group > family >
  concrete process, consistently across a document.
- V4 speculation filter (prompt.py:92-95): lines with
  may/might/likely/possibly and no concrete IoC are dropped.
- V5 atomic split (prompt.py:96-99): multi-action sentences split on
  and/then/";" — exactly one whitelist verb per output line.

Also defined here: the behavioral direction class per verb, feeding the
sigraph edge-direction rule (element.py:192-226 via §1.4 of SURVEY.md):
read-like verbs behave as ``READ_RECV`` (object → subject edge), all
others as ``WRITE_SEND`` (subject → object edge).
"""

from __future__ import annotations

# V0 — the 23-verb whitelist, exact tokens.
VERBS: tuple[str, ...] = (
    "launch", "create", "write", "read", "modify", "delete", "move", "copy",
    "inject", "network_connect", "http_request", "network_request",
    "dns_query", "persist", "escalate", "disable_security", "stop_service",
    "credential_dump", "lateral_move", "compress", "decompress", "encrypt",
    "exfiltrate",
)
VERB_SET = frozenset(VERBS)

# V1 — surface form → whitelist verb. Keys are matched case-insensitively
# against the lemma-ish surface (inflections listed explicitly so the
# matcher stays a plain alternation, no stemmer dependency).
SURFACE_TO_VERB: dict[str, str] = {
    # launch family
    "launch": "launch", "launches": "launch", "launched": "launch",
    "execute": "launch", "executes": "launch", "executed": "launch",
    "run": "launch", "runs": "launch", "ran": "launch", "start": "launch",
    "starts": "launch", "started": "launch", "spawn": "launch",
    "spawns": "launch", "spawned": "launch",
    # create family
    "create": "create", "creates": "create", "created": "create",
    "drop": "create", "drops": "create", "dropped": "create",
    # plain file verbs
    "write": "write", "writes": "write", "wrote": "write",
    "read": "read", "reads": "read",
    "modify": "modify", "modifies": "modify", "modified": "modify",
    "delete": "delete", "deletes": "delete", "deleted": "delete",
    "remove": "delete", "removes": "delete", "removed": "delete",
    "move": "move", "moves": "move", "moved": "move",
    "copy": "copy", "copies": "copy", "copied": "copy",
    # injection
    "inject": "inject", "injects": "inject", "injected": "inject",
    # network family
    "beacon": "network_connect", "beacons": "network_connect",
    "beaconed": "network_connect",
    "call": "network_connect", "calls": "network_connect",
    "connect": "network_connect", "connects": "network_connect",
    "connected": "network_connect",
    "network_connect": "network_connect",
    "http_request": "http_request", "request": "http_request",
    "requests": "http_request", "requested": "http_request",
    "network_request": "network_request",
    "dns_query": "dns_query", "resolve": "dns_query", "resolves": "dns_query",
    "resolved": "dns_query", "query": "dns_query", "queries": "dns_query",
    # tactics
    "persist": "persist", "persists": "persist", "persisted": "persist",
    "escalate": "escalate", "escalates": "escalate", "escalated": "escalate",
    "disable_security": "disable_security",
    "disable": "disable_security", "disables": "disable_security",
    "disabled": "disable_security",
    "stop_service": "stop_service", "stop": "stop_service",
    "stops": "stop_service", "stopped": "stop_service",
    "credential_dump": "credential_dump", "dump": "credential_dump",
    "dumps": "credential_dump", "dumped": "credential_dump",
    "lateral_move": "lateral_move",
    "compress": "compress", "compresses": "compress",
    "compressed": "compress",
    "decompress": "decompress", "decompresses": "decompress",
    "decompressed": "decompress",
    "encrypt": "encrypt", "encrypts": "encrypt", "encrypted": "encrypt",
    "exfiltrate": "exfiltrate", "exfiltrates": "exfiltrate",
    "exfiltrated": "exfiltrate",
}

# V2 — download-like surfaces trigger atomization (1 clause → 2 triples).
DOWNLOAD_SURFACES: frozenset[str] = frozenset({
    "download", "downloads", "downloaded",
    "fetch", "fetches", "fetched",
    "retrieve", "retrieves", "retrieved",
    "pull", "pulls", "pulled",
})

# Fileless markers: download-like + fileless ⇒ (http|network)_request + inject.
FILELESS_MARKERS: tuple[str, ...] = ("fileless", "reflective", "in memory", "in-memory")

# V3 — banned generic actors (lowercased surface forms).
GENERIC_ACTORS: frozenset[str] = frozenset({
    "it", "attacker", "the attacker", "adversary", "the adversary",
    "operator", "the operator", "threat actor", "the threat actor",
    "malware", "the malware", "tool", "the tool", "they", "the sample",
    "sample", "the implant", "implant",
})

# V4 — speculation markers; a clause containing one is dropped.
SPECULATION_RE = r"\b(?:may|might|likely|possibly|could|perhaps)\b"

# Direction class per verb: True ⇒ READ_RECV semantics (data flows INTO
# the acting process; edge object → subject per element.py:192-226).
READ_LIKE: frozenset[str] = frozenset({"read", "credential_dump", "decompress"})

# Entity-type inference for triple endpoints (deterministic stand-in for
# the reference's LLM node typing; program/script/software → Process per
# prompt.py:77). Order matters: first match wins.
TYPE_RULES: tuple[tuple[str, str], ...] = (
    # (case-insensitive regex, type)
    (r"^(?:https?|ftp|smb)://", "Network"),
    (r"^\d{1,3}(?:\.\d{1,3}){3}(?::\d+)?$", "Network"),
    (r"^hk(?:lm|cu|cr|u|cc)\\", "Registry"),
    (r"\.(?:exe|dll|ps1|bat|scr|sys|js|vbs)$", "Process"),
    (r"^(?:[a-z0-9-]+\.)+[a-z]{2,}(?::\d+)?(?:/|$)", "Network"),
    (r"[\\/]", "File"),
    (r"\.[a-z0-9]{1,5}$", "File"),
)
DEFAULT_TYPE = "Entity"


def action_for_verb(verb: str) -> str:
    """Map a whitelist verb to a provenance ActionType — the bridge that
    applies sigraph's behavioral-pattern edge typing (type.py:41-63) to
    the extracted triple stream."""
    return _VERB_ACTION[verb]


_VERB_ACTION: dict[str, str] = {
    "launch": "LAUNCH", "create": "CREATE", "write": "MODIFY",
    "read": "RAW_ACCESS_READ", "modify": "MODIFY", "delete": "DELETE",
    "move": "RENAME", "copy": "CREATE", "inject": "REMOTE_THREAD",
    "network_connect": "CONNECT", "http_request": "CONNECT",
    "network_request": "CONNECT", "dns_query": "CONNECT",
    "persist": "REG_SET", "escalate": "TAMPERING",
    "disable_security": "TAMPERING", "stop_service": "TAMPERING",
    "credential_dump": "ACCESS", "lateral_move": "REMOTE_THREAD",
    "compress": "MODIFY", "decompress": "MODIFY", "encrypt": "MODIFY",
    "exfiltrate": "CONNECT",
}
assert set(_VERB_ACTION) == VERB_SET
