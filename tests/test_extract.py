"""Rule-based triple extraction — V1-V5 prompt-contract semantics
(src/ai/prompt.py:60-127) as a deterministic grammar."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from sigraph_ray.functions import extract as X
from sigraph_ray.functions import normalize as N
from sigraph_ray.functions import verbs as V


def _extract(text: str) -> pd.DataFrame:
    df = pd.DataFrame({"url": ["u1"], "chunk_id": [0], "text": [text.lower()]})
    out = X.extract_triples(df)
    return out.groupby("doc_url", group_keys=False)[out.columns.tolist()].apply(
        X.resolve_generic_actors
    )


def triples(text: str) -> set[tuple[str, str, str]]:
    out = _extract(text)
    subj = N.normalize_entity_id(pa.array(out["subj"], pa.string())).to_pylist()
    obj = N.normalize_entity_id(pa.array(out["obj"], pa.string())).to_pylist()
    return set(zip(subj, out["pred"], obj))


def test_verb_normalization_v1():
    # execute/run → launch; drop → create; beacon → network_connect
    assert triples("xenorat executes powershell.exe.") == {
        ("xenorat", "launch", "powershell.exe")}
    assert triples("emotet drops c:\\tmp\\a.exe.") == {
        ("emotet", "create", "c:\\tmp\\a.exe")}
    assert triples("lokibot beacons to evil.com.") == {
        ("lokibot", "network_connect", "evil.com")}


def test_download_atomization_v2():
    # one download → http_request + create basename (prompt.py:83-91)
    got = triples("xenorat downloads http://evil.com/x/payload.exe.")
    assert got == {
        ("xenorat", "http_request", "http://evil.com/x/payload.exe"),
        ("xenorat", "create", "payload.exe"),
    }


def test_download_fileless_inject_v2():
    got = triples(
        "xenorat downloads http://evil.com/a.bin and performs a reflective load.")
    assert ("xenorat", "inject", "in memory") in got
    assert ("xenorat", "http_request", "http://evil.com/a.bin") in got
    assert not any(p == "create" for _, p, _ in got)


def test_non_http_download_is_network_request():
    got = triples("emotet fetches ftp://srv/pl.bin.")
    assert ("emotet", "network_request", "ftp://srv/pl.bin") in got
    assert ("emotet", "create", "pl.bin") in got


def test_generic_actor_resolution_v3():
    got = triples(
        "xenorat executes cmd.exe. The malware beacons to c2.evil.com.")
    assert ("xenorat", "network_connect", "c2.evil.com") in got


def test_generic_only_doc_dropped_v3():
    # no named actor anywhere → generic rows are dropped entirely
    assert triples("The malware beacons to c2.evil.com.") == set()


def test_speculation_filter_v4():
    assert triples("xenorat may possibly connect to backup.evil.com.") == set()
    assert triples("it might beacon to x.com.") == set()


def test_atomic_split_v5_with_ellipsis():
    got = triples(
        "xenorat downloads http://e.com/p.exe and then persists via hklm\\software\\run\\u1.")
    assert ("xenorat", "persist", "hklm\\software\\run\\u1") in got
    assert ("xenorat", "http_request", "http://e.com/p.exe") in got
    assert ("xenorat", "create", "p.exe") in got


def test_semicolon_split():
    got = triples("xenorat injects svchost.exe; it encrypts c:\\tmp\\f.txt.")
    assert got == {
        ("xenorat", "inject", "svchost.exe"),
        ("xenorat", "encrypt", "c:\\tmp\\f.txt"),
    }


def test_background_sentences_dropped():
    assert triples("The campaign was first reported by researchers.") == set()


def test_entity_typing():
    out = _extract("xenorat executes powershell.exe.")
    assert out["subj_type"].tolist() == ["Process"]
    assert out["obj_type"].tolist() == ["Process"]
    out = _extract("xenorat beacons to evil.com.")
    assert out["obj_type"].tolist() == ["Network"]
    out = _extract("xenorat persists via hklm\\software\\x.")
    assert out["obj_type"].tolist() == ["Registry"]


def test_empty_batch():
    out = X.extract_triples(pd.DataFrame({"url": [], "chunk_id": [], "text": []}))
    assert list(out.columns) == X.TRIPLE_COLUMNS and len(out) == 0


def test_generator_oracle_pr_is_1(tmp_path):
    """Full function-chain P/R against generator intent on 150 docs."""
    from sigraph_ray.functions import text as T
    from sigraph_ray.sources import synth

    n = 150
    tbl = synth.pages_batch(range(n))
    txt = T.html_to_text(tbl["html"].combine_chunks())
    rows = []
    for u, t in zip(tbl["url"].to_pylist(), txt.to_pylist()):
        for ci, ch in enumerate(T.chunk_text(t.lower())):
            rows.append({"url": u, "chunk_id": ci, "text": ch})
    tr = X.extract_triples(pd.DataFrame(rows))
    tr = tr.groupby("doc_url", group_keys=False)[tr.columns.tolist()].apply(
        X.resolve_generic_actors)
    tr["subj"] = N.normalize_entity_id(pa.array(tr["subj"], pa.string())).to_pylist()
    tr["obj"] = N.normalize_entity_id(pa.array(tr["obj"], pa.string())).to_pylist()
    got = set(map(tuple, tr[["doc_url", "subj", "pred", "obj"]].drop_duplicates().values))
    exp = synth.expected_triples(n)
    want = set(map(tuple, exp[["doc_url", "subj", "pred", "obj"]].values))
    tp = len(got & want)
    p, r = tp / len(got), tp / len(want)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_verb_action_bridge_total():
    for v in V.VERBS:
        assert V.action_for_verb(v) in {
            "LAUNCH", "REMOTE_THREAD", "ACCESS", "TAMPERING", "CONNECT",
            "CREATE", "RENAME", "DELETE", "MODIFY", "RAW_ACCESS_READ",
            "REG_SET",
        }


def test_ensemble_agrees_on_clean_grammar():
    """A3 ensemble == canonical grammar when variants agree."""
    df = pd.DataFrame({"url": ["u"], "chunk_id": [0], "text": [
        "xenorat executes cmd.exe. xenorat beacons to evil.com."]})
    single = X.extract_triples(df)
    ens = X.extract_triples_ensemble(df)
    cols = ["doc_url", "subj", "pred", "obj"]
    assert sorted(map(tuple, ens[cols].values)) == \
        sorted(map(tuple, single[cols].values))


def test_ensemble_majority_filters_disputed():
    """A clause only the strict-speculation variant drops survives the
    vote (2 of 3 endorse); a hedged sentence all variants except one
    keep... the 'reportedly' hedge is endorsed by variants 0+1 only —
    still majority — while true speculation dies in all variants."""
    df = pd.DataFrame({"url": ["u"], "chunk_id": [0], "text": [
        "xenorat reportedly beacons to evil.com. "
        "xenorat may connect to backup.com."]})
    ens = X.extract_triples_ensemble(df)
    got = set(map(tuple, ens[["pred", "obj"]].values))
    assert ("network_connect", "evil.com") in got         # 2 of 3 votes
    assert not any(o == "backup.com" for _, o in got)     # 0 votes


def test_ensemble_full_corpus_pr():
    """Ensemble mode keeps P/R = 1.0 on the oracle corpus."""
    from sigraph_ray.functions import text as T
    from sigraph_ray.sources import synth

    n = 80
    tbl = synth.pages_batch(range(n))
    txt = T.html_to_text(tbl["html"].combine_chunks())
    rows = []
    for u, t in zip(tbl["url"].to_pylist(), txt.to_pylist()):
        for ci, ch in enumerate(T.chunk_text(t.lower())):
            rows.append({"url": u, "chunk_id": ci, "text": ch})
    tr = X.extract_triples_ensemble(pd.DataFrame(rows))
    tr = tr.groupby("doc_url", group_keys=False)[tr.columns.tolist()].apply(
        X.resolve_generic_actors)
    tr["subj"] = N.normalize_entity_id(pa.array(tr["subj"], pa.string())).to_pylist()
    tr["obj"] = N.normalize_entity_id(pa.array(tr["obj"], pa.string())).to_pylist()
    got = set(map(tuple, tr[["doc_url", "subj", "pred", "obj"]].drop_duplicates().values))
    exp = synth.expected_triples(n)
    want = set(map(tuple, exp[["doc_url", "subj", "pred", "obj"]].values))
    tp = len(got & want)
    assert tp / max(1, len(got)) >= 0.95
    assert tp / max(1, len(want)) >= 0.95


def test_resolve_generic_batch_equals_per_group():
    """The vectorized batch V3 resolver is row-identical to the
    per-document groupby.apply reference across the synthetic corpus
    (including docs with no named actor and all-generic docs)."""
    from sigraph_ray.functions import text as T
    from sigraph_ray.sources import synth

    tbl = synth.pages_batch(range(60))
    txt = T.html_to_text(tbl["html"].combine_chunks())
    rows = []
    for u, t in zip(tbl["url"].to_pylist(), txt.to_pylist()):
        for ci, ch in enumerate(T.chunk_text(t.lower())):
            rows.append({"url": u, "chunk_id": ci, "text": ch})
    tr = X.extract_triples(pd.DataFrame(rows))
    # synthetic edge docs: one with only generic rows, one empty-named
    extra = pd.DataFrame({
        "doc_url": ["only-generic"] * 2,
        "chunk_id": [0, 0], "ord": [0, 1],
        "subj": ["the malware", "the attacker"],
        "subj_is_generic": [True, True],
        "pred": ["launch", "create"], "obj": ["x.exe", "y.exe"],
        "subj_type": ["malware", "malware"],
        "obj_type": ["file", "file"]})
    tr = pd.concat([tr, extra[tr.columns]], ignore_index=True)
    ref = tr.groupby("doc_url", group_keys=False, sort=False)[
        tr.columns.tolist()].apply(X.resolve_generic_actors)
    got = X.resolve_generic_actors_batch(tr)
    # row ORDER may differ (the reference apply re-groups); content
    # must be identical — downstream consumers (idxmin dedup, edge
    # aggregates) are order-free
    key = ["doc_url", "chunk_id", "ord", "subj", "pred", "obj"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        ref.sort_values(key).reset_index(drop=True))
