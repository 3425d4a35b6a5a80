"""Property-based checks (hypothesis): the vectorized Arrow parsers
agree with a direct per-row Python implementation of the reference's
parse rules on arbitrary inputs, and the chunker never loses content."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from sigraph_ray.functions import provenance as prov
from sigraph_ray.functions import text as T

# building blocks that stress the '@' grammar
_tok = st.text(alphabet="ab@._- ", min_size=0, max_size=8)
_enum = st.sampled_from(
    list(prov.ARTIFACT_TYPES) + list(prov.ACTION_TYPES)
    + list(prov.ACTOR_TYPES) + ["BOGUS", ""])
_piece = st.one_of(_tok, _enum)
provenance_strings = st.lists(_piece, min_size=0, max_size=6).map("@".join)


def _ref_artifact(s):
    # type_extension.py:170-186: only the final type token is checked;
    # names may be empty or contain '@'
    if not s or "@" not in s:
        return None
    toks = s.split("@")
    name, atype = "@".join(toks[:-1]), toks[-1]
    if atype not in prov.ARTIFACT_TYPES:
        return None
    return name, atype


def _ref_actor(s):
    if not s or "@" not in s:
        return None
    toks = s.split("@")
    if len(toks) < 4:
        return None
    art = _ref_artifact("@".join(toks[:-2]))
    if art is None or toks[-2] not in prov.ACTION_TYPES \
            or toks[-1] not in prov.ACTOR_TYPES:
        return None
    return art[0], art[1], toks[-2], toks[-1]


@settings(max_examples=300, deadline=None)
@given(st.lists(provenance_strings, min_size=1, max_size=20))
def test_artifact_parser_agrees_with_reference(strings):
    out = prov.parse_artifact(pa.array(strings, pa.string()))
    for i, s in enumerate(strings):
        ref = _ref_artifact(s)
        assert out["valid"][i].as_py() is (ref is not None), s
        if ref:
            assert out["name"][i].as_py() == ref[0]
            assert out["artifact_type"][i].as_py() == ref[1]


@settings(max_examples=300, deadline=None)
@given(st.lists(provenance_strings, min_size=1, max_size=20))
def test_actor_parser_agrees_with_reference(strings):
    out = prov.parse_actor(pa.array(strings, pa.string()))
    for i, s in enumerate(strings):
        ref = _ref_actor(s)
        assert out["valid"][i].as_py() is (ref is not None), s
        if ref:
            assert out["name"][i].as_py() == ref[0]
            assert out["action_type"][i].as_py() == ref[2]
            assert out["actor_type"][i].as_py() == ref[3]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcde .\n", min_size=0, max_size=2000))
def test_chunker_covers_all_content(text):
    chunks = T.chunk_text(text)
    # deterministic
    assert chunks == T.chunk_text(text)
    # budget respected
    assert all(0 < len(c) <= T.CHUNK_SIZE for c in chunks)
    # no content lost: every non-whitespace char count preserved or
    # exceeded (overlap duplicates, never drops)
    stripped = "".join(text.split())
    joined = "".join("".join(c.split()) for c in chunks)
    assert len(joined) >= len(stripped)
    if stripped:
        # first and last payload survive
        assert stripped[:10] in joined
        assert stripped[-10:] in joined


# --- round-3 analytic kernels -------------------------------------------

_pairs = st.lists(
    st.tuples(st.integers(-20, 20), st.integers(-20, 20)),
    min_size=1, max_size=40)


@given(_pairs)
@settings(max_examples=200, deadline=None)
def test_pareto_block_matches_bruteforce(pairs):
    """The vectorized per-block skyline equals the quadratic dominance
    definition on arbitrary integer points (ties, duplicates, all)."""
    import pandas as pd

    from sigraph_ray.stages.stats import _pareto_block

    df = pd.DataFrame(pairs, columns=["lo", "hi"])
    df["lo"] = df["lo"].astype("float64")
    got = _pareto_block(df, minimize="lo", maximize="hi")
    keep = []
    for i, p in df.iterrows():
        dom = ((df["lo"] <= p["lo"]) & (df["hi"] >= p["hi"])
               & ((df["lo"] < p["lo"]) | (df["hi"] > p["hi"])))
        if not dom.any():
            keep.append(i)
    assert sorted(got.index) == keep


_sample = st.lists(st.integers(0, 15), min_size=1, max_size=50)


@given(_sample, _sample)
@settings(max_examples=200, deadline=None)
def test_ks_count_path_matches_direct_ecdf(xa, xb):
    """The grouped-count + cumsum KS (the distributed fold's math)
    equals the direct two-sample ECDF sup-distance."""
    import numpy as np
    import pandas as pd

    a = np.array(xa, dtype=float)
    b = np.array(xb, dtype=float)
    # count path (stats.ks_two_sample finish semantics)
    vals = np.unique(np.concatenate([a, b]))
    c1 = np.array([(a == v).sum() for v in vals])
    c2 = np.array([(b == v).sum() for v in vals])
    ks_counts = np.abs(c1.cumsum() / len(a) - c2.cumsum() / len(b)).max()
    # direct ECDF definition
    ks_direct = max(abs((a <= v).mean() - (b <= v).mean()) for v in vals)
    assert abs(ks_counts - ks_direct) < 1e-12


@given(st.lists(st.floats(min_value=0.0, max_value=100.0,
                          allow_nan=False), min_size=2, max_size=30),
       st.integers(1, 5))
@settings(max_examples=100, deadline=None)
def test_mmr_lambda_one_is_pure_relevance(scores, k):
    """With λ=1 MMR degenerates to relevance order regardless of the
    similarity structure."""
    import pandas as pd

    from sigraph_ray.stages.textstats import mmr_diversify

    cand = pd.DataFrame({
        "doc_id": range(len(scores)),
        "text": [f"tok{i} " * 3 for i in range(len(scores))],
        "score": scores})
    out = mmr_diversify(cand, id_col="doc_id", text_col="text",
                        score_col="score", k=k, lam=1.0)
    want = (cand.sort_values(["score", "doc_id"],
                             ascending=[False, True])
            .head(k)["doc_id"].tolist())
    assert list(out["doc_id"]) == want
