"""Parser conformance — the reference's only test module, ported as a
vectorized accept/reject table (FIXTURES.md F6; reference cases from
src/graph/provenance/tests/test_type_extension.py:13-105).

The reference raises InvalidInputException per bad record; our batch
parsers return a ``valid`` mask instead (quarantine semantics), so every
"raises" case here asserts ``valid == False`` with null fields.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from sigraph_ray.functions import provenance as prov

# (input, expect_name, expect_type) — None name means reject.
ARTIFACT_CASES = [
    ("example_artifact@FILE", "example_artifact", "FILE"),
    ("example@artifact@name@FILE", "example@artifact@name", "FILE"),  # '@' in name
    ("", None, None),                       # empty data
    ("invalid_format", None, None),         # no '@'
    ("invalid_format@WHOAMI", None, None),  # unknown artifact type
    ("example_artifact@", None, None),      # empty token (trailing '@')
    ("example_artifact@INVALID_ARTIFACT", None, None),
]

# (input, expect_artifact_key, expect_action, expect_actor)
ACTOR_CASES = [
    ("example_artifact@FILE@CREATE@WRITE_SEND",
     "example_artifact@FILE", "CREATE", "WRITE_SEND"),
    ("example@artifact@name@FILE@CREATE@WRITE_SEND",
     "example@artifact@name@FILE", "CREATE", "WRITE_SEND"),  # '@' in name
    ("", None, None, None),
    ("invalid_format", None, None, None),
    ("invalid_format@WHOAMI@LAUGH", None, None, None),       # missing tokens
    ("example_artifact@FILE@CREATE@", None, None, None),     # empty token
    ("example_artifact@FILE@INVALID_ACTION@WRITE_SEND", None, None, None),
    ("example_artifact@INVALID_ARTIFACT@CREATE@WRITE_SEND", None, None, None),
    ("example_artifact@FILE@CREATE@INVALID_ACTOR", None, None, None),
]


def test_artifact_parse_table():
    col = pa.array([c[0] for c in ARTIFACT_CASES], pa.string())
    out = prov.parse_artifact(col)
    for i, (inp, name, atype) in enumerate(ARTIFACT_CASES):
        assert out["valid"][i].as_py() is (name is not None), inp
        assert out["name"][i].as_py() == name, inp
        assert out["artifact_type"][i].as_py() == atype, inp


def test_actor_parse_table():
    col = pa.array([c[0] for c in ACTOR_CASES], pa.string())
    out = prov.parse_actor(col)
    key = prov.artifact_key(out["name"], out["artifact_type"])
    for i, (inp, akey, action, actor) in enumerate(ACTOR_CASES):
        assert out["valid"][i].as_py() is (akey is not None), inp
        assert key[i].as_py() == akey, inp
        assert out["action_type"][i].as_py() == action, inp
        assert out["actor_type"][i].as_py() == actor, inp


def test_parent_parse_first_two_tokens_only():
    # Asymmetry with the child parse (type_extension.py:185-208): only the
    # FIRST two tokens are read, so extra tokens are ignored, and an
    # '@'-bearing name in position 0 never survives.
    col = pa.array([
        "parentproc@PROCESS@LAUNCH@NOT_ACTOR",  # full 4-token parent provenance
        "parentproc@PROCESS",
        "a@FILE@whatever@junk",                  # trailing junk ignored
        "x@NOTATYPE@LAUNCH@NOT_ACTOR",           # token[1] not an ArtifactType
        None,                                    # null parent → no edge
        "",
    ])
    out = prov.parse_parent(col)
    assert out["name"].to_pylist() == ["parentproc", "parentproc", "a", None, None, None]
    assert out["artifact_type"].to_pylist() == ["PROCESS", "PROCESS", "FILE", None, None, None]
    assert out["valid"].to_pylist() == [True, True, True, False, False, False]


def test_only_type_token_validated():
    """The reference validates ONLY the final type token
    (type_extension.py:170-186): empty segments and '@'-bearing — even
    empty — names are accepted; a bogus/empty type is not."""
    col = pa.array([None, "a@@FILE", "@FILE", "a@", "a@BOGUS", "FILE"],
                   pa.string())
    out = prov.parse_artifact(col)
    assert out["valid"].to_pylist() == [False, True, True, False, False,
                                        False]
    assert out["name"].to_pylist()[1:3] == ["a@", ""]


def test_edge_direction_rule():
    # element.py:192-226 — READ_RECV: artifact→parent; WRITE_SEND /
    # NOT_ACTOR: parent→artifact; anything else invalid.
    artifact = pa.array(["a@FILE"] * 4)
    parent = pa.array(["p@PROCESS"] * 4)
    actor = pa.array(["READ_RECV", "WRITE_SEND", "NOT_ACTOR", "BOGUS"])
    ep = prov.edge_endpoints(artifact, parent, actor)
    assert ep["src"].to_pylist() == ["a@FILE", "p@PROCESS", "p@PROCESS", None]
    assert ep["dst"].to_pylist() == ["p@PROCESS", "a@FILE", "a@FILE", None]


def test_vocab_sizes():
    # type.py:41-106 — 18 actions, 3 actor types, 5 artifact types.
    assert len(prov.ACTION_TYPES) == 18
    assert len(prov.ACTOR_TYPES) == 3
    assert len(prov.ARTIFACT_TYPES) == 5


def test_chunked_array_input():
    col = pa.chunked_array([["a@FILE"], ["b@PROCESS@LAUNCH@NOT_ACTOR"]])
    assert prov.parse_artifact(col)["valid"].to_pylist() == [True, False]
    # the 4-token form IS a valid artifact whose name is b@PROCESS@LAUNCH?
    # No: rightmost token NOT_ACTOR is not an ArtifactType → reject.
    out = prov.parse_actor(pa.chunked_array([["b@PROCESS@LAUNCH@NOT_ACTOR"]]))
    assert out["valid"].to_pylist() == [True]
