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


# ------------------------------- round 8: pure-Python BMP/WAV decoders


def _make_bmp(pixels):
    """Minimal 24-bit BI_RGB bottom-up BMP from a top-down [[(b,g,r)]]
    pixel grid — pure struct packing, mirrors what any image tool
    writes."""
    import struct

    h = len(pixels)
    w = len(pixels[0])
    stride = ((w * 3 + 3) // 4) * 4
    rows = b""
    for row in reversed(pixels):  # bottom-up storage
        line = b"".join(bytes(px) for px in row)
        rows += line + b"\x00" * (stride - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + dib + rows


def _make_wav(samples, bits=16, channels=1, rate=8000):
    """Minimal RIFF PCM WAV from float samples in [-1, 1]."""
    import struct

    if bits == 16:
        raw = b"".join(
            struct.pack("<h", int(max(-1.0, min(1.0, s)) * 32767)) for s in samples
        )
    else:
        raw = bytes(int((max(-1.0, min(1.0, s)) * 127) + 128) for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(raw))
        + raw
    )


def test_decode_bmp_real_pixels():
    # 2x4 gradient: left dark, right bright (BGR byte order)
    px = [
        [(0, 0, 0), (60, 60, 60), (180, 180, 180), (255, 255, 255)],
        [(0, 0, 0), (60, 60, 60), (180, 180, 180), (255, 255, 255)],
    ]
    gray = multimodal.decode_bmp(_make_bmp(px))
    assert gray.shape == (2, 4)
    assert list(gray[0]) == sorted(gray[0])  # monotone left->right
    assert abs(gray[0][0] - 0.0) < 1e-9 and abs(gray[0][3] - 255.0) < 1e-6
    with pytest.raises(ValueError, match="BMP"):
        multimodal.decode_bmp(b"not a bitmap")


def test_bmp_features_through_mapinpandas(spark):
    dark = _make_bmp([[(10, 10, 10)] * 8] * 4)
    bright = _make_bmp([[(250, 250, 250)] * 8] * 4)
    df = spark.createDataFrame(
        [(1, bytearray(dark)), (2, bytearray(bright)), (3, None)],
        "media_id long, payload binary",
    )
    out = {
        r["media_id"]: r["features"]
        for r in multimodal.decode_image_features(
            df, "media_id", "payload", real_decoder="bmp"
        ).collect()
    }
    assert all(abs(v - 10 / 255) < 1e-6 for v in out[1])
    assert all(abs(v - 250 / 255) < 1e-6 for v in out[2])
    assert out[3] is None  # null payload stays null


def test_bmp_blockhash_locality():
    base = [[(((x * 7 + y * 13) % 256),) * 3 for x in range(16)] for y in range(16)]
    a = _make_bmp(base)
    tweaked = [row[:] for row in base]
    tweaked[3][5] = (255, 255, 255)  # one-pixel edit
    b = _make_bmp(tweaked)
    inverted = _make_bmp([[(255 - px[0],) * 3 for px in row] for row in base])
    ha = multimodal.bmp_blockhash(a)
    hb = multimodal.bmp_blockhash(b)
    hi = multimodal.bmp_blockhash(inverted)
    near = bin(ha ^ hb).count("1")
    far = bin(ha ^ hi).count("1")
    assert near <= 2 < far  # near-identical images collide, inverse doesn't


def test_decode_wav_and_features(spark):
    import math

    quiet = [0.01 * math.sin(i / 5) for i in range(4000)]
    loud = [0.9 * math.sin(i / 5) for i in range(4000)]
    wav = _make_wav(quiet + loud)
    samples = multimodal.decode_wav(wav)
    assert len(samples) == 8000 and abs(max(samples) - 0.9) < 0.01
    feats = multimodal.wav_features(wav, n_coeffs=4)
    assert feats[0] < 0.02 and feats[1] < 0.02  # quiet half
    assert feats[2] > 0.5 and feats[3] > 0.5  # loud half
    # stereo averages to mono; 8-bit path decodes too
    stereo = _make_wav([0.5, -0.5] * 100, channels=2)
    assert abs(float(multimodal.decode_wav(stereo).mean())) < 1e-6
    eight = _make_wav(loud[:500], bits=8)
    assert abs(max(multimodal.decode_wav(eight)) - 0.9) < 0.05
    with pytest.raises(ValueError, match="RIFF"):
        multimodal.decode_wav(b"mp3junk")
    # through the Spark operator
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "media_id long, payload binary"
    )
    row = multimodal.audio_features(
        df, "media_id", "payload", n_coeffs=4, real_decoder="wav"
    ).collect()[0]
    assert row["coeffs"][3] > 0.5 > row["coeffs"][0]


def test_codec_requiring_formats_still_guarded():
    import pandas as pd  # noqa: F401 - environment sanity

    with pytest.raises(NotImplementedError, match="bmp"):
        multimodal.decode_image_features(None, "id", "p", real_decoder="real")
