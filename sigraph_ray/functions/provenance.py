"""Vectorized SystemProvenance parsing (the reference's string wire format).

Semantics reproduced (citations into /root/reference):

- The wire format is ``"<name>@<ARTIFACT_TYPE>"`` (artifact, 2+ tokens) or
  ``"<name>@<ARTIFACT_TYPE>@<ACTION_TYPE>@<ACTOR_TYPE>"`` (actor, 4+
  tokens); a provenance string must be non-empty and contain ``@``
  (src/graph/provenance/type.py:109-132).
- Artifact parse: the *rightmost* token is the ArtifactType, the name is
  the join of everything before it — names may themselves contain ``@``
  (src/graph/provenance/type_extension.py:148-182; tested with
  ``example@artifact@name@FILE`` in
  src/graph/provenance/tests/test_type_extension.py:20-25).
- Actor parse: the last TWO tokens are ActionType and ActorType; the
  remaining prefix re-parses as an Artifact (type_extension.py:238-277).
- Parent parse: asymmetric — only the FIRST TWO tokens are used
  (``name@TYPE``), so parent names must be ``@``-free
  (type_extension.py:185-208).
- Empty tokens / unknown enum values are rejected
  (type_extension.py:30-35, 81-86, 102-107, 171-177, 258-271).

Batch-engine deviation (deliberate, documented): the reference *raises*
``InvalidInputException`` per bad record; a batch engine must not crash a
trillion-row job on one bad row, so every parser here returns null fields
plus a boolean ``valid`` mask — callers quarantine invalid rows
(SURVEY.md §2.2 M1-M5).

All kernels are pure pyarrow.compute — zero-copy over Arrow batches, no
Python-per-row loops.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Closed vocabularies — src/graph/provenance/type.py:41-106.
ACTION_TYPES: tuple[str, ...] = (
    # process actions
    "LAUNCH", "REMOTE_THREAD", "ACCESS", "TAMPERING",
    # network actions
    "CONNECT", "ACCEPT",
    # file actions
    "CREATE", "RENAME", "DELETE", "MODIFY", "RAW_ACCESS_READ",
    "CREATE_STREAM_HASH",
    # registry actions
    "REG_ADD", "REG_DELETE", "REG_SET", "REG_RENAME", "REG_QUERY",
    # module actions
    "LOAD",
)
ACTOR_TYPES: tuple[str, ...] = ("READ_RECV", "WRITE_SEND", "NOT_ACTOR")
ARTIFACT_TYPES: tuple[str, ...] = ("FILE", "REGISTRY", "NETWORK", "PROCESS", "MODULE")

_ACTION_SET = pa.array(ACTION_TYPES, pa.string())
_ACTOR_SET = pa.array(ACTOR_TYPES, pa.string())
_ARTIFACT_SET = pa.array(ARTIFACT_TYPES, pa.string())

# Sentinel with enough '@'-separated tokens that any reverse-split below
# always yields full-width lists; sentinel-derived values are masked out.
_SENTINEL = "\x00@\x00@\x00@\x00"


def _mask_null(arr: pa.Array, valid: pa.Array) -> pa.Array:
    return pc.if_else(valid, arr, pa.scalar(None, pa.string()))


def _rsplit_fields(col: pa.Array, max_splits: int) -> list[pa.Array]:
    """Split on '@' from the right into exactly ``max_splits + 1`` fields.

    ``col`` must already be sentinel-padded so every row has at least
    ``max_splits`` separators.
    """
    tokens = pc.split_pattern(col, "@", max_splits=max_splits, reverse=True)
    return [pc.list_element(tokens, i) for i in range(max_splits + 1)]


def _well_formed(col: pa.Array) -> pa.Array:
    """SystemProvenance well-formedness (type.py:120-132): non-null,
    non-empty, contains '@'. NOTHING more — the reference validates
    only the specific tokens each parse consumes (the final
    artifact-type token, the two actor trailing tokens), so names may
    contain '@@', lead with '@', or even be empty
    (type_extension.py:170-186 joins the remaining tokens verbatim)."""
    nonnull = pc.is_valid(col)
    filled = pc.if_else(nonnull, col, pa.scalar("", pa.string()))
    ok = pc.and_(nonnull, pc.greater(pc.utf8_length(filled), 0))
    ok = pc.and_(ok, pc.match_substring(filled, "@"))
    return ok


def parse_artifact(col: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Artifact parse: rightmost token is the type, name is the rest.

    Returns ``{"name", "artifact_type", "valid"}``. Mirrors
    type_extension.py:148-182 (name may contain '@').
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ok = _well_formed(col)
    safe = pc.if_else(ok, col, pa.scalar(_SENTINEL, pa.string()))
    name, atype = _rsplit_fields(safe, 1)
    # only the final type token is validated (type_extension.py:175-186:
    # "if not token" + enum check); the name — join of the preceding
    # tokens — may be empty or contain '@'
    ok = pc.and_(ok, pc.is_in(atype, value_set=_ARTIFACT_SET))
    return {
        "name": _mask_null(name, ok),
        "artifact_type": _mask_null(atype, ok),
        "valid": ok,
    }


def parse_actor(col: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Actor parse: last two tokens are ActionType/ActorType; the prefix
    re-parses as an Artifact (so 4+ tokens total).

    Returns ``{"name", "artifact_type", "action_type", "actor_type",
    "valid"}``. Mirrors type_extension.py:238-277.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ok = _well_formed(col)
    # need >= 3 separators overall (name may contain more)
    ok = pc.and_(ok, pc.greater_equal(pc.count_substring(
        pc.if_else(pc.is_valid(col), col, pa.scalar("", pa.string())), "@"), 3))
    safe = pc.if_else(ok, col, pa.scalar(_SENTINEL, pa.string()))
    prefix, action, actor = _rsplit_fields(safe, 2)
    ok = pc.and_(ok, pc.is_in(action, value_set=_ACTION_SET))
    ok = pc.and_(ok, pc.is_in(actor, value_set=_ACTOR_SET))
    art = parse_artifact(pc.if_else(ok, prefix, pa.scalar(_SENTINEL, pa.string())))
    ok = pc.and_(ok, art["valid"])
    return {
        "name": _mask_null(art["name"], ok),
        "artifact_type": _mask_null(art["artifact_type"], ok),
        "action_type": _mask_null(action, ok),
        "actor_type": _mask_null(actor, ok),
        "valid": ok,
    }


def parse_parent(col: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Parent parse: FIRST two tokens only → ``name@TYPE``.

    Deliberately asymmetric with :func:`parse_artifact` — the reference
    coerces a parent provenance to its first two tokens
    (type_extension.py:185-208), so a parent name can never contain '@'.
    Null input rows are returned as invalid (a null parent means "no
    parent edge", handled by the caller).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ok = _well_formed(col)
    safe = pc.if_else(ok, col, pa.scalar(_SENTINEL, pa.string()))
    tokens = pc.split_pattern(safe, "@", max_splits=2)
    name = pc.list_element(tokens, 0)
    ptype = pc.list_element(tokens, 1)
    # only the second (type) token is validated — an empty first token
    # yields an empty parent name, as the reference accepts
    # (from_parent_action joins tokens[0:2] and re-parses)
    ok = pc.and_(ok, pc.is_in(ptype, value_set=_ARTIFACT_SET))
    return {
        "name": _mask_null(name, ok),
        "artifact_type": _mask_null(ptype, ok),
        "valid": ok,
    }


def artifact_key(name: pa.Array, artifact_type: pa.Array) -> pa.Array:
    """Canonical node key ``f"{name}@{type}"`` — the graph primary key
    (src/graph/graph_element/element.py:13-101: node keyed by the
    artifact string, label = artifact type)."""
    return pc.binary_join_element_wise(name, artifact_type, "@")


def edge_endpoints(
    artifact: pa.Array, parent: pa.Array, actor_type: pa.Array
) -> dict[str, pa.Array]:
    """The load-bearing edge-direction rule
    (src/graph/graph_element/element.py:192-226):

    - ``READ_RECV``  → edge artifact → parent (data flows into the process)
    - ``WRITE_SEND`` → edge parent → artifact
    - ``NOT_ACTOR``  → edge parent → artifact (same as WRITE_SEND)

    Inputs are the canonical keys; rows whose actor_type is not one of
    the three values get null endpoints (quarantine upstream).
    """
    is_read = pc.equal(actor_type, "READ_RECV")
    known = pc.is_in(actor_type, value_set=_ACTOR_SET)
    src = pc.if_else(is_read, artifact, parent)
    dst = pc.if_else(is_read, parent, artifact)
    null = pa.scalar(None, pa.string())
    return {
        "src": pc.if_else(known, src, null),
        "dst": pc.if_else(known, dst, null),
    }
