"""Multimodal-column plumbing: binary payload + metadata struct +
Arrow-batched fake decode (the codecs themselves are stubbed —
functions/multimodal.py module docstring)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.functions import multimodal


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(1, bytearray(b"payload-one")), (2, bytearray(b"payload-two-longer"))]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_attach_metadata(media_df):
    out = multimodal.attach_metadata(media_df, "payload", "image", "image/png").collect()
    meta = {r["media_id"]: r["media_meta"] for r in out}
    assert meta[1]["modality"] == "image"
    assert meta[1]["mime"] == "image/png"
    assert meta[1]["byte_size"] == len(b"payload-one")


def test_decode_image_features_fake_path(media_df):
    out = multimodal.decode_image_features(media_df, "media_id", "payload").collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["byte_size"] == len(b"payload-one")
    feats = by_id[1]["features"]
    assert len(feats) == multimodal.IMAGE_FEATURE_DIM
    assert all(0.0 <= f <= 1.0 for f in feats)
    # deterministic: same payload -> same features on a second run
    again = multimodal.decode_image_features(media_df, "media_id", "payload").collect()
    assert {r["media_id"]: r["features"] for r in again}[1] == feats


def test_real_decoder_stub_raises(media_df):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_features(media_df, "media_id", "payload", real_decoder="real")
    with pytest.raises(NotImplementedError):
        multimodal.frame_sample_stub(media_df, "media_id", "payload")
