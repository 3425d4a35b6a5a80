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


def test_resize_rewrites_images_only(ray_session):
    media = MM.synth_media(40, parallelism=2)
    src = media.to_pandas().set_index("media_id")
    out = (MM.resize_media(media, concurrency=2, target=64).to_pandas()
           .set_index("media_id"))
    assert sorted(out.index) == sorted(src.index)
    img = out[out["kind"] == "image"]
    assert (img["width"] <= 64).all() and (img["height"] <= 64).all()
    # non-image payloads pass through byte-identical
    other = out[out["kind"] != "image"]
    for mid, row in other.iterrows():
        assert row["payload"] == src.loc[mid, "payload"]
    # images got smaller or stayed (fake decode is size-proportional)
    for mid, row in img.iterrows():
        assert 0 < len(row["payload"]) <= len(src.loc[mid, "payload"])


def test_frame_sampling_expansion(ray_session):
    media = MM.synth_media(40, parallelism=2)
    n_videos = (media.to_pandas()["kind"] == "video").sum()
    frames = MM.sample_frames(media, concurrency=2,
                              n_frames=4).to_pandas()
    # exactly n_frames rows per video, none for image/audio
    assert len(frames) == 4 * n_videos
    per = frames.groupby("media_id")["frame_idx"].agg(["count", "min",
                                                       "max"])
    assert (per["count"] == 4).all()
    assert (per["min"] == 0).all() and (per["max"] == 3).all()
    assert (frames["ts_ms"] >= 0).all()
    assert frames["frame_payload"].str.len().gt(0).all()
    # source payload does not propagate into the expansion
    assert "payload" not in frames.columns


def test_resize_and_sampler_real_decoder_stubs():
    with pytest.raises(NotImplementedError):
        MM.MediaResizer(decoder="real")
    with pytest.raises(NotImplementedError):
        MM.FrameSampler(decoder="real")
