"""End-to-end KG construction: P/R ≥ 0.95 vs the generator oracle, plus
scale-invariance of the final tables (SURVEY.md §5.2 items 3-4)."""

from __future__ import annotations

import pandas as pd
import pytest

from sigraph_ray.sources import synth

N_DOCS = 400


@pytest.fixture(scope="module")
def kg(ray_session):
    from sigraph_ray.pipelines import kg as K

    pages = K.synth_pages(N_DOCS, parallelism=6)
    out = K.build_kg(pages, concurrency=2)
    return {k: v.to_pandas() for k, v in out.items()}


def test_triple_precision_recall(kg):
    got = set(map(tuple, kg["triples"][
        ["doc_url", "subj", "pred", "obj"]].drop_duplicates().values))
    exp = synth.expected_triples(N_DOCS)
    want = set(map(tuple, exp[["doc_url", "subj", "pred", "obj"]].values))
    tp = len(got & want)
    p = tp / max(1, len(got))
    r = tp / max(1, len(want))
    assert p >= 0.95, f"precision {p}"
    assert r >= 0.95, f"recall {r}"


def test_entities_cover_triple_endpoints(kg):
    ents = set(kg["entities"]["entity"])
    assert set(kg["triples"]["subj"]) <= ents
    assert set(kg["triples"]["obj"]) <= ents
    assert (kg["entities"]["n_mentions"] >= 1).all()


def test_edge_direction_and_typing(kg):
    e = kg["edges"]
    # read-like verbs flip direction: src == obj for pred 'read'
    reads = e[e["pred"] == "read"]
    if len(reads):
        assert (reads["src"] == reads["obj"]).all()
        assert (reads["dst"] == reads["subj"]).all()
    launches = e[e["pred"] == "launch"]
    if len(launches):
        assert (launches["src"] == launches["subj"]).all()
    assert e["action_type"].notna().all()
    assert (e[e["pred"] == "persist"]["action_type"] == "REG_SET").all()


def test_no_generic_subjects_survive(kg):
    from sigraph_ray.functions.verbs import GENERIC_ACTORS

    assert not kg["triples"]["subj"].str.lower().isin(GENERIC_ACTORS).any()


def test_triples_unique_per_doc(kg):
    t = kg["triples"]
    assert not t.duplicated(["doc_url", "subj", "pred", "obj"]).any()


def test_scale_invariance(ray_session, tmp_path):
    """Identical sorted outputs at different block counts — the test
    form of 'partitioning/shuffle handled explicitly' (SURVEY.md §5.2)."""
    from sigraph_ray.pipelines import kg as K

    frames = []
    for blocks in (2, 7):
        pages = K.synth_pages(120, parallelism=blocks)
        t = K.build_kg(pages, concurrency=2)["triples"].to_pandas()
        t = t.sort_values(["doc_url", "subj", "pred", "obj"]).reset_index(drop=True)
        frames.append(t[["doc_url", "subj", "pred", "obj", "subj_type", "obj_type"]])
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_fused_equals_unfused(ray_session):
    """The fused doc-local extraction stage must be semantics-identical
    to the composable chunk→extract→resolve→dedup chain."""
    from sigraph_ray.pipelines import kg as K

    cols = ["doc_url", "subj", "pred", "obj", "subj_type", "obj_type"]
    a = K.build_kg(K.synth_pages(100, parallelism=3), concurrency=2,
                   fused=True)["triples"].to_pandas()
    b = K.build_kg(K.synth_pages(100, parallelism=3), concurrency=2,
                   fused=False)["triples"].to_pandas()
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True))


def test_entities_from_edges_equal(ray_session):
    """entities_from_edges(build_kg_edges(t)) must equal
    canonicalize_entities(t) — same rows, types, mention counts."""
    from sigraph_ray.pipelines import kg as K
    from sigraph_ray.stages import canonicalize as C

    triples = K.extract_triples_pipeline(
        K.synth_pages(120, parallelism=3), concurrency=2).materialize()
    a = C.canonicalize_entities(triples).to_pandas()
    b = K.entities_from_edges(K.build_kg_edges(triples)).to_pandas()
    cols = ["entity", "entity_type", "n_mentions"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values("entity").reset_index(drop=True),
        b[cols].sort_values("entity").reset_index(drop=True))


def test_adopt_links_collapses_aliases(ray_session):
    """A2 in the pipeline: a near-alias surface adopts the canonical
    vocabulary entry and the per-doc dedup folds the two rows into
    one — the entity key space shrinks before the shuffle."""
    import ray.data as rd

    from sigraph_ray.pipelines import kg as K
    from sigraph_ray.stages.entity_link import link_entities

    tri = pd.DataFrame({
        "doc_url": ["d1", "d1", "d2"],
        "chunk_id": [0, 1, 0],
        "ord": [0, 1_000_000, 0],
        "subj": ["acme corp", "acme corporation", "acme corporation"],
        "subj_is_generic": [False] * 3,
        "pred": ["created"] * 3,
        "obj": ["x.txt"] * 3,
        "subj_type": ["Organization"] * 3,
        "obj_type": ["File"] * 3})
    linked = link_entities(rd.from_pandas(tri), ["acme corporation"],
                           threshold=0.45, concurrency=2)
    adopted = K.adopt_links(linked).to_pandas()
    assert set(adopted["subj"]) == {"acme corporation"}
    # the two d1 surfaces collapsed onto ONE canonical triple row
    assert len(adopted[adopted["doc_url"] == "d1"]) == 1
    assert len(adopted) == 2


def test_linked_path_preserves_pr(ray_session):
    """P/R stays ≥0.95 when build_kg routes through the A2 link stage
    with the canonical vocabulary (exact surfaces self-link at 1.0;
    plumbing must not corrupt the stream)."""
    from sigraph_ray.pipelines import kg as K

    n = 100
    exp = synth.expected_triples(n)
    vocab = sorted(set(exp["subj"]) | set(exp["obj"]))
    out = K.build_kg(K.synth_pages(n, parallelism=3), concurrency=2,
                     link_vocab=vocab)
    got = set(map(tuple, out["triples"].to_pandas()[
        ["doc_url", "subj", "pred", "obj"]].drop_duplicates().values))
    want = set(map(tuple, exp[["doc_url", "subj", "pred", "obj"]].values))
    tp = len(got & want)
    assert tp / max(1, len(got)) >= 0.95
    assert tp / max(1, len(want)) >= 0.95


def test_refine_stage_partitions_sentences(ray_session):
    """A3 stage-0/1: the refiner materializes overview + behavior
    columns; every sentence lands in exactly one of the two, and
    triple-bearing sentences land in behavior."""
    import ray.data as rd

    from sigraph_ray.stages.refine import refine_stage

    df = pd.DataFrame({
        "url": ["u1"],
        "lang": ["en"],
        "text": ["The campaign targeted banks in Europe. "
                 "xenorat downloaded http://evil.example/p.exe. "
                 "Analysts described the infrastructure."]})
    out = refine_stage(rd.from_pandas(df)).to_pandas()
    assert {"overview", "behavior"} <= set(out.columns)
    assert "downloaded" in out.loc[0, "behavior"]
    assert "campaign targeted" in out.loc[0, "overview"]
    assert "infrastructure" in out.loc[0, "overview"]
    # partition: every input sentence appears in exactly one column
    assert "downloaded" not in out.loc[0, "overview"]


def test_refined_path_preserves_pr(ray_session):
    """build_kg(refine=...) — extraction over the refined behavior
    column keeps the P/R gate at ≥0.95 and the stage-0/1 intermediate
    is a first-class output with both columns (VERDICT #9 done bar:
    the ensemble backend produces the intermediate column)."""
    from sigraph_ray.pipelines import kg as K

    n = 100
    exp = synth.expected_triples(n)
    out = K.build_kg(K.synth_pages(n, parallelism=3), concurrency=2,
                     refine="ensemble")
    ref = out["refined"].to_pandas()
    assert {"overview", "behavior"} <= set(ref.columns)
    assert (ref["behavior"].str.len() > 0).any()
    got = set(map(tuple, out["triples"].to_pandas()[
        ["doc_url", "subj", "pred", "obj"]].drop_duplicates().values))
    want = set(map(tuple, exp[["doc_url", "subj", "pred", "obj"]].values))
    tp = len(got & want)
    assert tp / max(1, len(got)) >= 0.95
    assert tp / max(1, len(want)) >= 0.95


def test_sorted_materialize_roundtrip(ray_session, tmp_path):
    """O5: sorted Parquet materialization of both pipelines — files are
    written, sorted by the declared keys, and read back identical."""
    import ray.data as rd

    from sigraph_ray.pipelines import kg as K

    def read_in_order(path):
        # the O5 guarantee is "file order = global sort order"; a reader
        # that wants the global order must keep block order on its side
        # (preserve_order on the read dataset's context) — with the
        # default False the streaming executor may emit blocks in
        # completion order
        ds = rd.read_parquet(path)
        ds.context.execution_options.preserve_order = True
        return ds.to_pandas()

    out = K.build_kg(K.synth_pages(60, parallelism=2), concurrency=2)
    paths = K.sorted_materialize(out, str(tmp_path / "kg"))
    tri = read_in_order(paths["triples"])
    key = tri[["doc_url", "subj", "pred", "obj"]].apply(tuple, axis=1)
    assert list(key) == sorted(key)
    ents = read_in_order(paths["entities"])
    assert list(ents["entity"]) == sorted(ents["entity"])
    assert len(tri) > 0 and len(ents) > 0


def test_extractor_backend_seam(ray_session):
    """A1 seam: a custom (toy model-style) backend drops into the same
    actor-pool stage through build_kg(mode=<callable>); the ensemble
    mode routes through the identical seam."""
    from sigraph_ray.pipelines import kg as K

    def toy_backend(cdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_url": cdf["url"], "chunk_id": cdf["chunk_id"],
            "ord": cdf["chunk_id"].astype("int64") * 1_000_000,
            "subj": "actor.exe", "subj_is_generic": False,
            "pred": "created", "obj": "x.txt",
            "subj_type": "Process", "obj_type": "File"})

    kg = K.build_kg(K.synth_pages(40, parallelism=2), concurrency=2,
                    mode=toy_backend)
    tr = kg["triples"].to_pandas()
    assert len(tr) > 0
    assert set(tr["pred"]) == {"created"}
    assert set(tr["subj"]) == {"actor.exe"}
    # one deduped triple per document
    assert tr["doc_url"].is_unique

    ens = K.build_kg(K.synth_pages(40, parallelism=2), concurrency=2,
                     mode="ensemble")["triples"].to_pandas()
    assert len(ens) > 0


def test_derive_link_vocab_df_filter_and_order(ray_session):
    """Self-derived A2 vocabulary: surfaces in ≥min_df distinct docs,
    ranked (df desc, surface asc), capped at max_terms."""
    import ray.data as rd

    from sigraph_ray.pipelines import kg as K

    tri = pd.DataFrame({
        "doc_url": ["d1", "d2", "d3", "d1", "d2", "d1", "d1"],
        "subj": ["acme", "acme", "acme", "beta", "beta", "solo", "acme"],
        "pred": ["used"] * 7,
        "obj": ["tool_x", "tool_x", "tool_y", "tool_x", "tool_y",
                "tool_y", "tool_x"],  # acme appears twice in d1
    })
    ds = rd.from_pandas(tri).repartition(3)
    vocab = K.derive_link_vocab(ds, min_df=2, max_terms=100)
    # distinct-doc dfs: acme 3 (d1,d2,d3), tool_y 3 (d1,d2,d3),
    # tool_x 2 (d1,d2 — the d1 repeat counts once), beta 2, solo 1
    # (dropped); ties break surface-asc
    assert vocab == ["acme", "tool_y", "beta", "tool_x"]
    assert K.derive_link_vocab(ds, min_df=2, max_terms=2) == [
        "acme", "tool_y"]


def test_build_kg_auto_link_adopts_variant(ray_session):
    """link_vocab='auto' end to end: a one-document typo variant of a
    high-df canonical surface adopts it, so the entity disappears from
    the canonical tables; exact surfaces self-link unchanged (P/R
    gate's property)."""
    import ray.data as rd

    from sigraph_ray.pipelines import kg as K

    base = K.synth_pages(60, parallelism=2)
    # a near-miss surface: one extra char vs a surface the synthetic
    # corpus mentions in many documents
    ref = K.build_kg(base, concurrency=2)
    ref_ents = set(ref["entities"].to_pandas()["entity"])
    canon = sorted(e for e in ref_ents if len(e) > 8)[0]
    variant = canon + "x"
    import pyarrow as pa

    extra = pa.table({
        "url": pa.array(["http://extra.example/1"], pa.string()),
        "warc_ts": pa.array([pd.Timestamp("2024-01-01")],
                            pa.timestamp("us")),
        "html": pa.array([b""], pa.binary()),
        "text": pa.array(
            [f"{variant} downloaded http://evil.example/p.exe."],
            pa.string()),
        "lang": pa.array(["en"], pa.string())})
    pages = base.union(rd.from_arrow(extra))
    out = K.build_kg(pages, concurrency=2, link_vocab="auto")
    ents = set(out["entities"].to_pandas()["entity"])
    assert variant not in ents, "near-miss surface should adopt canon"
    assert canon in ents


def test_adopt_links_doc_scope_equals_global(ray_session):
    """scope='doc' (zero-shuffle per-batch dedup, valid on
    doc-complete blocks) must equal the global sorted tier row-for-row
    on the fused linked path — including when adoption collapses two
    surfaces of one document."""
    import ray.data as rd

    from sigraph_ray.pipelines import kg as K
    from sigraph_ray.stages.entity_link import link_entities

    pages = K.synth_pages(80, parallelism=3)
    triples = K.extract_triples_pipeline(
        pages, concurrency=2).materialize()
    vocab = K.derive_link_vocab(triples, min_df=1)
    linked = link_entities(triples, vocab, concurrency=2,
                           batch_size=None).materialize()
    cols = ["doc_url", "chunk_id", "ord", "subj", "pred", "obj"]
    a = (K.adopt_links(linked, scope="doc").to_pandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    b = (K.adopt_links(linked, scope="global").to_pandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_link_task_tier_equals_dataset_tier(ray_session, monkeypatch):
    """The driver-resident mention fast path (chunked plain tasks) must
    produce the identical linked stream as the Dataset scoring path —
    same kernel, so any divergence is a chunking/broadcast bug."""
    from sigraph_ray.pipelines import kg as K
    from sigraph_ray.stages import entity_link as EL

    pages = K.synth_pages(80, parallelism=3)
    triples = K.extract_triples_pipeline(
        pages, concurrency=2).materialize()
    vocab, mset = K.derive_link_vocab(triples, min_df=1,
                                      with_mentions=True, doc_local=True)
    cols = ["doc_url", "chunk_id", "ord", "subj", "pred", "obj",
            "link_subj", "link_obj"]

    def run():
        out = EL.link_entities(triples, vocab, concurrency=2,
                               batch_size=None, mentions=mset).to_pandas()
        out["link_subj"] = out["subj_link"]
        out["link_obj"] = out["obj_link"]
        return out[cols].sort_values(cols).reset_index(drop=True)

    a = run()  # small materialized mset → task tier
    monkeypatch.setattr(EL, "_DRIVER_MENTION_BYTES", -1)
    b = run()  # gate forced shut → Dataset tier
    pd.testing.assert_frame_equal(a, b)


def test_build_mentions_doc_scope_equals_global(ray_session):
    """build_mentions(scope='doc') — the zero-shuffle tier over
    doc-complete blocks — must equal the sorted_distinct global tier
    row-for-row on the fused linked path (the bench/flagship layout)."""
    from sigraph_ray.pipelines import kg as K
    from sigraph_ray.stages.entity_link import link_entities

    pages = K.synth_pages(80, parallelism=3)
    triples = K.extract_triples_pipeline(
        pages, concurrency=2).materialize()
    vocab = K.derive_link_vocab(triples, min_df=1)
    adopted = K.adopt_links(
        link_entities(triples, vocab, concurrency=2, batch_size=None),
        scope="doc").materialize()
    cols = ["doc_url", "entity"]
    a = (K.build_mentions(adopted, scope="doc").to_pandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    b = (K.build_mentions(adopted, scope="global").to_pandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    assert len(a) == len(a.drop_duplicates()), "doc tier emitted dupes"
    pd.testing.assert_frame_equal(a, b)


def test_derive_link_vocab_doc_local_equals_pair_sort(ray_session):
    """doc_local=True (grouped sum of per-block partials — valid on
    doc-complete blocks where an (entity, doc) pair cannot straddle
    blocks) must yield the identical vocabulary AND distinct mention
    set as the pair-sort tier."""
    from sigraph_ray.pipelines import kg as K

    pages = K.synth_pages(80, parallelism=3)
    triples = K.extract_triples_pipeline(
        pages, concurrency=2).materialize()
    va, ma = K.derive_link_vocab(triples, min_df=2, with_mentions=True,
                                 doc_local=True)
    vb, mb = K.derive_link_vocab(triples, min_df=2, with_mentions=True,
                                 doc_local=False)
    assert va == vb
    assert (sorted(ma.to_pandas()["mention"])
            == sorted(mb.to_pandas()["mention"]))


def test_derive_link_vocab_driver_tier_equals_stitch(ray_session,
                                                     monkeypatch):
    """The size-gated driver tier (partials → one pandas pass) and the
    range-sort stitch tier must agree exactly — vocabulary, order (the
    (df DESC, surface ASC) top-N contract), and mention set."""
    from sigraph_ray.pipelines import kg as K

    pages = K.synth_pages(80, parallelism=3)
    triples = K.extract_triples_pipeline(
        pages, concurrency=2).materialize()
    # default gate: tiny partials take the driver tier
    va, ma = K.derive_link_vocab(triples, min_df=2, with_mentions=True,
                                 doc_local=True)
    # gate forced to 0: same call takes the stitch tier
    monkeypatch.setattr(K, "_VOCAB_DRIVER_BYTES", 0)
    vb, mb = K.derive_link_vocab(triples, min_df=2, with_mentions=True,
                                 doc_local=True)
    assert va == vb
    assert (sorted(ma.to_pandas()["mention"])
            == sorted(mb.to_pandas()["mention"]))
