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


def test_resize_image_fake_path(media_df):
    out = multimodal.resize_image(media_df, "media_id", "payload", target_bytes=8).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[2]["orig_bytes"] == len(b"payload-two-longer")
    assert by_id[2]["resized_bytes"] == 8
    assert by_id[1]["resized_bytes"] == 8
    # payloads already under the target pass through untouched
    big = multimodal.resize_image(media_df, "media_id", "payload", target_bytes=32).collect()
    assert {bytes(r["payload_resized"]) for r in big} == {b"payload-one", b"payload-two-longer"}
    # deterministic
    again = multimodal.resize_image(media_df, "media_id", "payload", target_bytes=8).collect()
    assert {r["media_id"]: bytes(r["payload_resized"]) for r in again} == {
        r["media_id"]: bytes(r["payload_resized"]) for r in out
    }


def test_audio_features_fake_path(media_df):
    out = multimodal.audio_features(media_df, "media_id", "payload", n_coeffs=4).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id[1]["coeffs"]) == 4
    assert all(0.0 <= c <= 1.0 for c in by_id[1]["coeffs"])
    # audio features differ from image features for the same payload
    img = multimodal.decode_image_features(media_df, "media_id", "payload").collect()
    img_feats = {r["media_id"]: r["features"] for r in img}
    assert by_id[1]["coeffs"] != img_feats[1][:4]


def test_frame_sample_rows_per_frame(spark):
    # 4 "frames" of 4 bytes; every_n=2 -> frames 0 and 2
    rows = [(7, bytearray(bytes(range(16))))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = multimodal.frame_sample(
        df, "media_id", "payload", every_n=2, frame_bytes=4
    ).collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 2]
    assert all(r["media_id"] == 7 for r in out)
    assert all(len(r["features"]) == multimodal.IMAGE_FEATURE_DIM for r in out)


def test_binary_file_ingestion_feeds_decode_pipeline(spark, tmp_path):
    """End-to-end multimodal ingestion edge: files on disk ->
    read_binary_files -> metadata attach -> mapInPandas feature
    extraction. The source's (path, content) shape is exactly what the
    decode operators consume."""
    from pubg_data_pipeline_spark.functions import multimodal as mm
    from pubg_data_pipeline_spark.sources import io as sio
    from pyspark.sql import functions as F

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG-payload-a" * 3)
    (d / "b.png").write_bytes(b"\x89PNG-payload-bb" * 3)
    (d / "huge.png").write_bytes(b"x" * 10_000)

    files = sio.read_binary_files(spark, str(d), glob="*.png", max_bytes=1000)
    docs = mm.attach_metadata(
        files.select(F.col("path").alias("img_id"), F.col("content").alias("payload")),
        "payload", "image", "image/png",
    )
    feats = mm.decode_image_features(docs, "img_id", "payload")
    rows = feats.collect()
    assert len(rows) == 2  # huge.png filtered at the source
    by_id = {r["img_id"].rsplit("/", 1)[-1]: r for r in rows}
    assert set(by_id) == {"a.png", "b.png"}
    # deterministic fake decode: same payload -> same features
    again = {r["img_id"].rsplit("/", 1)[-1]: r for r in feats.collect()}
    for k in by_id:
        assert list(by_id[k]["features"]) == list(again[k]["features"])


def test_perceptual_hash_locality_and_near_dup_join(spark):
    """The fake pHash must be locality-sensitive (a few flipped bytes ->
    small Hamming distance) so the Hamming chunk-join finds planted
    image near-dups, while unrelated payloads stay far."""
    from pubg_data_pipeline_spark.functions.multimodal import perceptual_hash
    from pubg_data_pipeline_spark.operators.dedup import hamming_near_dups

    base = bytes(range(200, 0, -1)) * 40  # structured 8000-byte "image"
    edited = bytearray(base)
    for i in range(0, 40):  # corrupt one small region
        edited[i] = 255
    other = bytes((i * 37 + 11) % 251 for i in range(8000))
    rows = [(1, base), (2, bytes(edited)), (3, other)]
    df = spark.createDataFrame(rows, "img_id long, payload binary")

    sigs = perceptual_hash(df, "img_id", "payload", bits=48)
    by_id = {r["img_id"]: r["phash"] for r in sigs.collect()}
    ham = lambda a, b: bin(by_id[a] ^ by_id[b]).count("1")
    assert ham(1, 2) <= 6, f"near-identical payloads too far: {ham(1, 2)}"
    assert ham(1, 3) > 6, f"unrelated payloads too close: {ham(1, 3)}"

    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_near_dups(sigs, "img_id", "phash", 48, max_hamming=6).collect()
    }
    assert pairs == {(1, 2)}


def test_perceptual_hash_edge_payloads(spark):
    from pubg_data_pipeline_spark.functions.multimodal import perceptual_hash

    df = spark.createDataFrame(
        [(1, b""), (2, b"\x05"), (3, b"\x00" * 100)], "img_id long, payload binary"
    )
    got = {r["img_id"]: r["phash"] for r in perceptual_hash(df, "img_id", "payload").collect()}
    assert got[1] == 0  # empty payload -> zero signature, no crash
    assert got[2] == 0  # single byte: block mean == doc mean, strict > fails
    assert got[3] == 0  # constant payload -> no block above the mean


def test_null_payload_rows_yield_nulls_not_crash(spark):
    from pubg_data_pipeline_spark.functions import multimodal as mm

    df = spark.createDataFrame(
        [(1, b"abcdefgh"), (2, None)], "media_id long, payload binary"
    )
    feats = {r["media_id"]: r for r in mm.decode_image_features(df, "media_id", "payload").collect()}
    assert feats[1]["features"] is not None
    assert feats[2]["features"] is None and feats[2]["byte_size"] is None

    rs = {r["media_id"]: r for r in mm.resize_image(df, "media_id", "payload").collect()}
    assert rs[2]["payload_resized"] is None

    au = {r["media_id"]: r for r in mm.audio_features(df, "media_id", "payload").collect()}
    assert au[2]["coeffs"] is None

    frames = mm.frame_sample(df, "media_id", "payload").collect()
    assert all(r["media_id"] == 1 for r in frames)  # null row skipped

    ph = {r["media_id"]: r for r in mm.perceptual_hash(df, "media_id", "payload").collect()}
    assert ph[2]["phash"] is None
