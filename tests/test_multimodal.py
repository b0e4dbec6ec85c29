"""Multimodal plumbing: Arrow-batched binary processing, decode stub
gating, frame-sample fan-out."""

from __future__ import annotations

import hashlib

import pytest

from mapreducego_spark.functions.multimodal import (
    FEATURE_SCHEMA,
    decode_image,
    documents_as_media,
    extract_features,
    frame_sample_plan,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_extract_features_schema_and_determinism(spark, sf_dir):
    media = documents_as_media(spark, sf_dir)
    feats = extract_features(media, fake=True)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == media.count()
    # deterministic fake decode: feature hash == md5 of payload
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    for r in rows[:20]:
        assert r.feature_hash == hashlib.md5(payloads[r.media_id]).hexdigest()
        assert 1 <= r.width <= 1920 and 1 <= r.height <= 1080


def test_frame_sample_fanout(spark, sf_dir):
    media = documents_as_media(spark, sf_dir)
    plan = frame_sample_plan(media, every_nth=10)
    rows = plan.collect()
    # only video rows fan out; every sampled index is a multiple of 10
    assert all(r.frame_idx % 10 == 0 for r in rows)
    vids = media.filter("mime = 'video/mp4'").count()
    assert plan.select("media_id").distinct().count() == vids


def test_media_mime_partition(spark, sf_dir):
    media = documents_as_media(spark, sf_dir)
    mimes = {r.mime for r in media.select("mime").distinct().collect()}
    assert mimes == {"image/png", "audio/wav", "video/mp4"}
