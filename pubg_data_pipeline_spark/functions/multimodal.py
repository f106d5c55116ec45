"""Multimodal column conventions + stubbed decoders (SURVEY.md §7.2 M5).

Convention: a modality is an opaque ``binary`` payload column plus a
typed metadata struct (``modality``, ``mime``, ``byte_size``) — the
engine never interprets payload bytes in the JVM; decode/feature
extraction happens in Arrow-batched Pandas UDFs via mapInPandas so
100 TB of payloads stream through Python in columnar batches, never
row-at-a-time.

The actual codecs (PIL/librosa/av) are NOT available in this
environment, so the decode step is stubbed: ``decode_image_features``
uses the real Spark plumbing (schema contract, batch iteration,
partition spread) and substitutes a deterministic byte-level fake for
the pixel decode, clearly marked below. Swap ``_fake_decode`` for a
real decoder on a cluster with codecs installed.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_DIM = 8


def attach_metadata(df: DataFrame, payload_col: str, modality: str, mime: str) -> DataFrame:
    """Wrap a binary payload with the typed metadata struct."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.length(F.col(payload_col)).alias("byte_size"),
        ),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """DETERMINISTIC FAKE standing in for a pixel/sample decode: 8
    pseudo-features derived from the md5 digest. Replace with a real
    decoder (e.g. PIL.Image.open + downsample) where codecs exist."""
    digest = hashlib.md5(bytes(payload)).digest()
    return [b / 255.0 for b in digest[:IMAGE_FEATURE_DIM]]


def decode_image_features(
    df: DataFrame, id_col: str, payload_col: str, real_decoder=None
) -> DataFrame:
    """Image payload -> fixed-dim feature vector via mapInPandas.

    ``real_decoder(payload: bytes) -> list[float]`` plugs in an actual
    decode; by default the deterministic fake runs (see module
    docstring). Raises NotImplementedError if a real decoder is
    requested but unavailable."""
    import pandas as pd

    decoder = real_decoder
    if decoder is None:
        decoder = _fake_decode
    elif decoder == "real":
        raise NotImplementedError(
            "no image codec available in this environment; pass a callable "
            "decoder or use the deterministic fake (default)"
        )

    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)

    def extract(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "byte_size": pdf[payload_col].map(len),
                    "features": pdf[payload_col].map(lambda b: decoder(bytes(b))),
                }
            )

    out = spread.select(id_col, payload_col).mapInPandas(
        extract, "id long, byte_size long, features array<double>"
    )
    return out.withColumnRenamed("id", id_col)


def frame_sample_stub(df: DataFrame, id_col: str, payload_col: str, every_n: int = 30):
    """Video frame sampling — plumbing contract only; no video codec in
    this environment."""
    raise NotImplementedError(
        "video decode unavailable here; the contract is: binary payload -> "
        "mapInPandas -> one row per sampled frame (id, frame_idx, features)"
    )
