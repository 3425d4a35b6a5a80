"""De-circularized KG extraction gate (VERDICT r02 #6): the extractor
against HAND-written, HAND-labeled adversarial pages that the synth
grammar never produced (fixture + label provenance in
``adversarial_fixture.py``). The generator-based P/R test proves
pipeline fidelity; this one pins the prompt-contract semantics
(src/ai/prompt.py:60-127) on wild-shaped text."""

from __future__ import annotations

import pandas as pd
import pytest

from tests import adversarial_fixture as ADV


def _triple_set(df: pd.DataFrame) -> set[tuple]:
    return set(map(tuple, df[["doc_url", "subj", "pred", "obj"]]
                   .drop_duplicates().values))


@pytest.mark.parametrize("fused", [True, False])
def test_adversarial_pr(ray_session, fused):
    import ray.data as rd

    from sigraph_ray.pipelines import kg as K

    pages = rd.from_pandas(ADV.pages_frame()).repartition(3)
    got = _triple_set(
        K.extract_triples_pipeline(pages, concurrency=2, fused=fused)
        .to_pandas())
    want = _triple_set(ADV.expected_frame())
    tp = len(got & want)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(want))
    assert precision >= 0.95, (precision, sorted(got - want))
    assert recall >= 0.95, (recall, sorted(want - got))


def test_adversarial_generic_only_doc_drops(ray_session):
    """adv://05 has only banned generic actors — the contract requires
    the whole document to yield nothing (prompt.py:60-67)."""
    import ray.data as rd

    from sigraph_ray.pipelines import kg as K

    pages = rd.from_pandas(ADV.pages_frame())
    out = K.extract_triples_pipeline(pages, concurrency=2).to_pandas()
    assert (out["doc_url"] == "adv://05").sum() == 0
