"""Multimodal plumbing: schema, actor-pool decode stage, wide-column
hygiene. The decode itself is a documented stub (no image/audio libs in
the container)."""

from __future__ import annotations

import numpy as np
import pytest

from sigraph_ray.stages import multimodal as MM


def test_synth_media_schema(ray_session):
    media = MM.synth_media(40, parallelism=2)
    t = media.take_batch(10, batch_format="pyarrow")
    assert set(MM.MEDIA_SCHEMA.names) <= set(t.schema.names)
    assert t.schema.field("payload").type == "binary"


def test_feature_extraction_drops_payload(ray_session):
    media = MM.synth_media(40, parallelism=2)
    feats = MM.extract_media_features(media, concurrency=2).to_pandas()
    assert "payload" not in feats.columns
    assert len(feats) == 40
    assert all(len(v) == 16 for v in feats["features"])
    assert (feats["payload_bytes"] > 0).all()


def test_feature_extraction_deterministic(ray_session):
    a = MM.extract_media_features(MM.synth_media(25, parallelism=2),
                                  concurrency=2).to_pandas()
    b = MM.extract_media_features(MM.synth_media(25, parallelism=3),
                                  concurrency=2).to_pandas()
    a = a.sort_values("media_id").reset_index(drop=True)
    b = b.sort_values("media_id").reset_index(drop=True)
    assert (a["media_id"] == b["media_id"]).all()
    for x, y in zip(a["features"], b["features"]):
        np.testing.assert_array_equal(x, y)


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        MM.MediaFeatureExtractor(decoder="real")
    with pytest.raises(ValueError):
        MM.MediaFeatureExtractor(decoder="bogus")
