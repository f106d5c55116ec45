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


def _null_or(fn):
    """NULL-payload guard for the per-row decode callables: a corrupt
    upload or missing media row arrives as None in the Arrow batch —
    it must yield NULL features, not a bytes(None) TypeError that
    kills the whole decode job."""
    def wrapped(b):
        if b is None or (isinstance(b, float) and b != b):
            return None
        return fn(b)

    return wrapped


def _id_dtype(df: DataFrame, id_col: str) -> str:
    """The operators' output schemas carry the caller's id column
    unchanged — file-path ids are strings, synthetic ids are longs."""
    return df.schema[id_col].dataType.simpleString()


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
                    "byte_size": pdf[payload_col].map(_null_or(len)),
                    # object-dtype Series: a mixed list/None column
                    # must not collapse to a numpy array Arrow can't
                    # convert to list<double>
                    "features": pd.Series(
                        [_null_or(lambda b: decoder(bytes(b)))(v)
                         for v in pdf[payload_col]],
                        dtype=object, index=pdf.index,
                    ),
                }
            )

    out = spread.select(id_col, payload_col).mapInPandas(
        extract, f"id {_id_dtype(df, id_col)}, byte_size long, features array<double>"
    )
    return out.withColumnRenamed("id", id_col)


def resize_image(
    df: DataFrame, id_col: str, payload_col: str, target_bytes: int = 64, real_resizer=None
) -> DataFrame:
    """Image resize: payload in -> smaller payload out, via mapInPandas
    (binary-to-binary transforms stay columnar end to end).

    The pixel resample is STUBBED with a deterministic byte-level
    downsample (every k-th byte so the fake output is ``target_bytes``
    long) — the schema/partitioning/batch plumbing is real. Plug
    ``real_resizer(payload: bytes) -> bytes`` in where PIL exists."""
    import pandas as pd

    def _fake_resize(payload: bytes) -> bytes:
        b = bytes(payload)
        if len(b) <= target_bytes:
            return b
        step = len(b) / target_bytes
        return bytes(b[int(i * step)] for i in range(target_bytes))

    resizer = real_resizer or _fake_resize
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)

    def run(batches):
        for pdf in batches:
            resized = pdf[payload_col].map(_null_or(lambda b: resizer(bytes(b))))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "orig_bytes": pdf[payload_col].map(_null_or(len)),
                    "payload_resized": resized,
                    "resized_bytes": resized.map(_null_or(len)),
                }
            )

    out = spread.select(id_col, payload_col).mapInPandas(
        run, f"id {_id_dtype(df, id_col)}, orig_bytes long, payload_resized binary, resized_bytes long"
    )
    return out.withColumnRenamed("id", id_col)


def audio_features(
    df: DataFrame, id_col: str, payload_col: str, n_coeffs: int = 4, real_decoder=None
) -> DataFrame:
    """Audio payload -> fixed-dim coefficient vector (MFCC-shaped
    contract) via mapInPandas. The waveform decode is STUBBED with a
    deterministic digest-derived fake (librosa/soundfile absent here);
    plug ``real_decoder(payload: bytes) -> list[float]`` in where the
    codecs exist."""
    import pandas as pd

    def _fake_audio(payload: bytes) -> list[float]:
        digest = hashlib.md5(b"audio:" + bytes(payload)).digest()
        return [b / 255.0 for b in digest[:n_coeffs]]

    decoder = real_decoder or _fake_audio
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "byte_size": pdf[payload_col].map(_null_or(len)),
                    "coeffs": pd.Series(
                        [_null_or(lambda b: decoder(bytes(b)))(v)
                         for v in pdf[payload_col]],
                        dtype=object, index=pdf.index,
                    ),
                }
            )

    out = spread.select(id_col, payload_col).mapInPandas(
        run, f"id {_id_dtype(df, id_col)}, byte_size long, coeffs array<double>"
    )
    return out.withColumnRenamed("id", id_col)


def frame_sample(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    every_n: int = 30,
    frame_bytes: int = 256,
    real_extractor=None,
) -> DataFrame:
    """Video frame sampling: one OUTPUT ROW PER SAMPLED FRAME — the
    row-expanding mapInPandas shape (a generator UDF over binary
    payloads). The frame decode is STUBBED: the fake treats the payload
    as fixed-size ``frame_bytes`` chunks and emits every ``every_n``-th
    chunk's digest features; plug ``real_extractor(payload: bytes) ->
    list[(frame_idx, list[float])]`` in where a video codec exists."""
    import pandas as pd

    def _fake_frames(payload: bytes) -> list[tuple[int, list[float]]]:
        b = bytes(payload)
        n_frames = max(len(b) // frame_bytes, 1)
        out = []
        for idx in range(0, n_frames, every_n):
            chunk = b[idx * frame_bytes : (idx + 1) * frame_bytes]
            digest = hashlib.md5(chunk).digest()
            out.append((idx, [x / 255.0 for x in digest[:IMAGE_FEATURE_DIM]]))
        return out

    extractor = real_extractor or _fake_frames
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)

    def run(batches):
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue  # null media row: contributes no frames
                for frame_idx, fv in extractor(bytes(payload)):
                    ids.append(mid)
                    idxs.append(frame_idx)
                    feats.append(fv)
            if not ids:
                continue  # all-null batch: an EMPTY default-dtype frame
                # would reach Arrow as float64 columns it can't cast
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "features": feats})

    out = spread.select(id_col, payload_col).mapInPandas(
        run, f"id {_id_dtype(df, id_col)}, frame_idx int, features array<double>"
    )
    return out.withColumnRenamed("id", id_col)


def frame_sample_stub(df: DataFrame, id_col: str, payload_col: str, every_n: int = 30):
    """Legacy contract-only stub; frame_sample above carries the real
    plumbing with a fake extractor."""
    raise NotImplementedError(
        "video decode unavailable here; use frame_sample (real mapInPandas "
        "plumbing, deterministic fake extractor) or plug a codec in"
    )


PHASH_BITS = 48


def perceptual_hash(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    bits: int = PHASH_BITS,
    real_hasher=None,
) -> DataFrame:
    """Perceptual hash of a binary media payload -> ``bits``-bit integer
    signature whose Hamming distance tracks content similarity (the
    image analog of SimHash; pair with operators.dedup.hamming_near_dups
    for image near-dup mining at O(n x chunks) instead of O(n^2)).

    The real algorithm (decode -> grayscale -> DCT -> sign bits) needs
    an image codec, absent here, so the default is a DETERMINISTIC
    LOCALITY-SENSITIVE FAKE with the same shape: the payload is split
    into ``bits`` byte blocks (block of byte p = p*bits//L) and bit k
    is set iff block k's mean byte value exceeds the whole payload's
    mean — block means over sign-vs-global-mean is exactly the
    structure of blockhash/pHash, so small payload edits flip few
    bits. All arithmetic is exact-integer sums with one final float
    division, making the fake SQL-expressible for oracle parity.
    ``bits`` stays below 63 so signatures fit a signed long on every
    engine. Pass ``real_hasher(payload: bytes) -> int`` to plug in a
    real pHash; ``real_hasher="real"`` raises NotImplementedError like
    the decode stubs."""
    import numpy as np
    import pandas as pd

    if not 0 < bits < 63:
        raise ValueError(f"bits must be in (0, 63), got {bits}")
    if real_hasher == "real":
        raise NotImplementedError(
            "no image codec available in this environment; pass a callable "
            "hasher or use the deterministic locality-sensitive fake (default)"
        )

    def _fake_phash(payload: bytes) -> int:
        b = np.frombuffer(bytes(payload), dtype=np.uint8)
        length = len(b)
        if length == 0:
            return 0
        blk = (np.arange(length, dtype=np.int64) * bits) // length
        sums = np.bincount(blk, weights=b, minlength=bits)  # exact int sums
        counts = np.bincount(blk, minlength=bits)
        doc_mean = int(b.sum(dtype=np.int64)) / length
        sig = 0
        for k in range(bits):
            if counts[k] and (sums[k] / counts[k]) > doc_mean:
                sig |= 1 << k
        return sig

    hasher = real_hasher or _fake_phash
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "phash": pdf[payload_col].map(
                        _null_or(lambda p: hasher(bytes(p)))
                    ),
                }
            )

    out = spread.select(id_col, payload_col).mapInPandas(
        run, f"id {_id_dtype(df, id_col)}, phash long"
    )
    return out.withColumnRenamed("id", id_col)
