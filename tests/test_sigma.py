"""Sigma compilation (S8/A5) + syslog raw_data model (S4) + J7 scan.

Reference semantics under test: field-prefix rewrite
(rule/session.py:110-123), logsource.category term + unit term
(db_session.py:256-264), 1024-clause split INCLUDING its
structure-flattening quirk (db_session.py:85-124), Sigma
case-insensitive matching with */? wildcards, and the nested→flat
dynamic-mapping round trip (db_model.py:12-109)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sigraph_ray.functions import sigma as SG

RULES = r"""
title: r_eq
logsource:
  category: click
detection:
  selection:
    User: USER_3
  condition: selection
---
title: r_wild
detection:
  selection:
    TargetFilename: 'file_?7.tmp'
  condition: selection
---
title: r_combo
detection:
  sel_a:
    Image|contains: PROC_3
  sel_b:
    DestinationIp|startswith: '10.0.'
  fil:
    User|endswith: '0'
  condition: (sel_a or sel_b) and not fil
---
title: r_re
detection:
  selection:
    CommandLine|re: 'proc_[0-2]\.exe'
  condition: selection
---
title: r_oneof
detection:
  sel_x:
    EventID: '3'
  sel_y:
    EventID: '4'
  condition: 1 of sel_*
"""

P = "raw_data.Metadata"


def _df(**cols) -> pd.DataFrame:
    n = max(len(v) for v in cols.values())
    return pd.DataFrame({f"{P}.{k}": v for k, v in cols.items()})


def test_compile_shape():
    rules = SG.compile_rules(RULES)
    assert [r.title for r in rules] == [
        "r_eq", "r_wild", "r_combo", "r_re", "r_oneof"]
    assert rules[0].category == "click" and rules[1].category is None
    assert rules[2].n_clauses == 3  # leaves incl. the negated filter


def test_eq_case_insensitive_and_prefix():
    r = SG.compile_rules(RULES)[0]
    df = _df(User=["user_3", "USER_3", "user_30", None])
    assert r.mask(df).tolist() == [True, True, False, False]
    # the prefix rewrite is the field-resolution step: an unprefixed
    # column must NOT match
    assert r.mask(pd.DataFrame({"User": ["user_3"]})).tolist() == [False]


def test_wildcards():
    r = SG.compile_rules(RULES)[1]
    df = _df(TargetFilename=["file_17.tmp", "file_97.tmp", "file_7.tmp",
                             "file_170.tmp"])
    assert r.mask(df).tolist() == [True, True, False, False]


def test_condition_logic():
    r = SG.compile_rules(RULES)[2]
    df = _df(Image=["c:\\proc_3.exe", "x", "c:\\PROC_3.exe", "x"],
             DestinationIp=["9.9.9.9", "10.0.0.5", "8.8.8.8", "10.0.1.2"],
             User=["user_1", "user_2", "user_10", "user_20"])
    # (contains proc_3 OR startswith 10.0.) AND NOT endswith 0
    assert r.mask(df).tolist() == [True, True, False, False]


def test_regex_case_sensitive():
    r = SG.compile_rules(RULES)[3]
    df = _df(CommandLine=["proc_1.exe --x", "PROC_1.EXE", "proc_5.exe"])
    assert r.mask(df).tolist() == [True, False, False]


def test_one_of_pattern():
    r = SG.compile_rules(RULES)[4]
    df = _df(EventID=["3", "4", "5"])
    assert r.mask(df).tolist() == [True, True, False]


def test_clause_split_and_flattening_quirk():
    """db_session.py:85-124: at >=1024 clauses ALL leaves are re-ORed in
    chunks — matches survive across chunk boundaries, and the nested
    NOT is deliberately lost (the reference extracts must_not clauses
    into the flat OR)."""
    sels = "\n".join(
        f"  s{i}:\n    F{i}: 'v{i}'" for i in range(1100))
    yaml_text = ("title: big\ndetection:\n" + sels +
                 "\n  fil:\n    G: 'bad'\n"
                 "  condition: (1 of s*) and not fil\n")
    (rule,) = SG.compile_rules(yaml_text)
    assert rule.n_clauses == 1101
    chunks = rule.chunks()
    assert len(chunks) == 2
    # a doc matching only leaf #1090 (second chunk) still matches
    df = pd.DataFrame({f"{P}.F1090": ["v1090"], f"{P}.G": ["good"]})
    assert rule.mask(df).tolist() == [True]
    # quirk: a doc matching ONLY the negated filter ALSO matches after
    # the split (the NOT was flattened away) — but would not below the
    # threshold
    df2 = pd.DataFrame({f"{P}.G": ["bad"]})
    assert rule.mask(df2).tolist() == [True]
    assert rule.mask(df2, max_clauses=10_000).tolist() == [False]


def test_unsupported_modifier_raises():
    with pytest.raises(ValueError, match="unsupported modifier"):
        SG.compile_rules(
            "title: x\ndetection:\n  s:\n    F|base64: 'v'\n"
            "  condition: s\n")


def test_nest_flatten_roundtrip(ray_session):
    import ray.data as rd

    from sigraph_ray.stages import syslog as SY

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet").limit(200)
    flat = ds.map_batches(SY.syslog_batch, batch_format="pyarrow")
    nested = flat.map_batches(SY.nest_raw_data, batch_format="pyarrow")
    back = nested.map_batches(SY.flatten_raw_data, batch_format="pyarrow")
    a = flat.to_pandas()
    b = back.to_pandas()[list(a.columns)]
    pd.testing.assert_frame_equal(
        a.sort_values("span_id").reset_index(drop=True),
        b.sort_values("span_id").reset_index(drop=True))
    # the nested column is a genuine struct with the Metadata leaves
    sch = nested.schema()
    assert "raw_data" in sch.names


def test_sigma_match_unit_term(ray_session):
    from sigraph_ray.pipelines.queries import SIGMA_DEMO_RULES
    from sigraph_ray.stages import syslog as SY

    docs = SY.derive_syslog("/root/testdata/sf0.001")
    out = SY.sigma_match(docs, SIGMA_DEMO_RULES, unit_id="unit_0").to_pandas()
    assert len(out) > 0
    spans = set(out["span_id"])
    all_docs = docs.to_pandas()
    unit_of = dict(zip(all_docs["span_id"], all_docs["unit_id"]))
    assert all(unit_of[s] == "unit_0" for s in spans)


def test_sigma_trace_ids_and_labeling(ray_session):
    """get_trace_ids_with_lucene_query + the sequence-labeling flow:
    matching traces expand to their FULL sequences (non-matching docs
    of a matching trace included), all labeled."""
    from sigraph_ray.pipelines.queries import SIGMA_DEMO_RULES
    from sigraph_ray.stages import syslog as SY

    docs = SY.derive_syslog("/root/testdata/sf0.001")
    ids = SY.sigma_trace_ids(docs, SIGMA_DEMO_RULES,
                             unit_id="unit_0").to_pandas()
    assert ids["trace_id"].is_unique and len(ids) > 0

    seq = SY.label_sequences(docs, SIGMA_DEMO_RULES, unit_id="unit_0",
                             label="bad").to_pandas()
    assert set(seq["trace_id"]) == set(ids["trace_id"])
    assert (seq["label"] == "bad").all()
    # full sequences: every unit_0 doc of a matching trace is present
    all_docs = docs.to_pandas()
    want = all_docs[(all_docs["unit_id"] == "unit_0")
                    & all_docs["trace_id"].isin(set(ids["trace_id"]))]
    assert len(seq) == len(want)
    # per-trace rows are Timestamp-sorted
    for _, g in seq.groupby("trace_id"):
        assert list(g["timestamp"]) == sorted(g["timestamp"])


def test_doc_store_roundtrip_and_flush(ray_session, tmp_path):
    """D2 end-to-end: the persisted unit-partitioned doc store holds
    exactly the derived document table; sigma_match over the store
    equals sigma_match over the derivation; flushing a unit drops its
    partition directory and its rows."""
    import os

    from sigraph_ray.pipelines.queries import SIGMA_DEMO_RULES as _DEMO
    from sigraph_ray.stages import provenance_graph as G
    from sigraph_ray.stages import syslog as SY

    sf = "/root/testdata/sf0.001"
    base = str(tmp_path / "store")
    table_dir = SY.ensure_doc_store(sf, root=base)
    assert os.path.exists(os.path.join(base, "_SUCCESS"))
    # idempotent: second call reuses (same dir, no rebuild marker churn)
    assert SY.ensure_doc_store(sf, root=base) == table_dir

    import ray.data as rd

    stored = rd.read_parquet(table_dir).to_pandas()
    derived = SY.derive_syslog(sf).to_pandas()
    key = ["unit_id", "span_id"]
    cols = ["unit_id", "trace_id", "span_id", "raw_data.EventName",
            "raw_data.Metadata.User"]
    pd.testing.assert_frame_equal(
        stored[cols].sort_values(key).reset_index(drop=True),
        derived[cols].sort_values(key).reset_index(drop=True))

    a = SY.sigma_match(rd.read_parquet(table_dir), _DEMO,
                       unit_id="unit_0").to_pandas()
    b = SY.sigma_match(SY.derive_syslog(sf), _DEMO,
                       unit_id="unit_0").to_pandas()
    srt = ["rule_title", "span_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(srt).reset_index(drop=True),
        b.sort_values(srt).reset_index(drop=True))

    removed = G.flush_unit(base, "unit_0", tables=("documents",))
    assert removed
    left = rd.read_parquet(table_dir).to_pandas()
    assert "unit_0" not in set(left["unit_id"])
    assert len(left) < len(stored)


def test_null_fields_never_match_contains():
    """Regression (round-3 advice): a null/NaN field value must never
    match ``contains`` — without the presence mask, astype(str) turns
    None/NaN into the literal strings 'None'/'nan' and a rule like
    ``|contains: 'one'`` (or 'nan') matches rows MISSING the field.
    The reference's OpenSearch term queries only hit docs that HAVE
    the field."""
    yaml_rule = """
title: r_null
logsource: {category: click}
detection:
  sel:
    User|contains: 'one'
  condition: sel
---
title: r_null_nan
logsource: {category: click}
detection:
  sel:
    User|contains: 'nan'
  condition: sel
---
title: r_null_re
logsource: {category: click}
detection:
  sel:
    User|re: '.'
  condition: sel
"""
    rules = SG.compile_rules(yaml_rule)
    df = _df(User=[None, float("nan"), "someone", "nanette"])
    assert rules[0].mask(df).tolist() == [False, False, True, False]
    assert rules[1].mask(df).tolist() == [False, False, False, True]
    # |re '.' matches any non-empty PRESENT value, never nulls
    assert rules[2].mask(df).tolist() == [False, False, True, True]
