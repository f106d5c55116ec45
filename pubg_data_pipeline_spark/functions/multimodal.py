"""Multimodal column conventions + stubbed decoders (SURVEY.md §7.2 M5).

Convention: a modality is an opaque ``binary`` payload column plus a
typed metadata struct (``modality``, ``mime``, ``byte_size``) — the
engine never interprets payload bytes in the JVM; decode/feature
extraction happens in Arrow-batched Pandas UDFs via mapInPandas so
100 TB of payloads stream through Python in columnar batches, never
row-at-a-time.

The actual codecs (PIL/librosa/av) are NOT available in this
environment, so compressed formats stay stubbed: ``decode_image_
features`` uses the real Spark plumbing (schema contract, batch
iteration, partition spread) and substitutes a deterministic
byte-level fake for the pixel decode, clearly marked below. Swap
``_fake_decode`` for a real decoder on a cluster with codecs
installed.

Round 8: the UNCOMPRESSED container formats need no codec, so they
get real pure-Python decoders — ``decode_bmp`` (BI_RGB 24/32-bit BMP
-> grayscale pixel matrix) and ``decode_wav`` (RIFF PCM 8/16-bit ->
float samples) — wired in as ``real_decoder="bmp"`` /
``real_decoder="wav"`` / ``real_hasher="bmp"`` (a real blockhash
pHash over decoded pixels). ``"real"`` still raises for formats that
genuinely require codecs (JPEG/PNG/MP3/video).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_DIM = 8
PHASH_BITS = 48


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


def decode_bmp(payload: bytes):
    """Pure-Python (numpy-vectorized) BMP decode: uncompressed BI_RGB
    24/32-bit Windows bitmaps -> float64 grayscale matrix (height x
    width, luma weights, top-down row order). No codec dependency —
    the container is just a header + padded BGR rows. Anything else
    (compressed BMP, palette BMP, other formats) raises ValueError so
    the caller's guard stays honest."""
    import struct

    import numpy as np

    b = bytes(payload)
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    pixel_off = struct.unpack_from("<I", b, 10)[0]
    width, height = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"only uncompressed 24/32-bit BI_RGB BMP supported "
            f"(got bpp={bpp}, compression={compression})"
        )
    top_down = height < 0
    h, w = abs(height), width
    channels = bpp // 8
    stride = ((w * channels + 3) // 4) * 4
    need = pixel_off + stride * h
    if w <= 0 or h == 0 or len(b) < need:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=pixel_off)
    rows = rows.reshape(h, stride)[:, : w * channels].reshape(h, w, channels)
    # BGR(A) byte order -> luma grayscale
    gray = (
        0.114 * rows[:, :, 0] + 0.587 * rows[:, :, 1] + 0.299 * rows[:, :, 2]
    )
    return gray if top_down else gray[::-1]


def bmp_features(payload: bytes, dim: int = IMAGE_FEATURE_DIM) -> list[float]:
    """Real image features from a BMP payload: mean luma over ``dim``
    vertical bands (left-to-right), normalized to [0, 1] — the decoded
    counterpart of the digest fake, pluggable as
    ``decode_image_features(real_decoder='bmp')``."""
    import numpy as np

    gray = decode_bmp(payload)
    w = gray.shape[1]
    bands = np.arange(w) * dim // max(w, 1)
    return [
        float(gray[:, bands == k].mean()) / 255.0 if (bands == k).any() else 0.0
        for k in range(dim)
    ]


def bmp_blockhash(payload: bytes, bits: int = PHASH_BITS) -> int:
    """REAL perceptual hash (blockhash) over decoded BMP pixels: the
    grayscale image is cut into ``bits`` grid cells (8 columns x
    bits//8 rows, remainder cells folded into the last row) and bit k
    is set iff cell k's mean luma exceeds the global mean — the same
    mean-vs-global structure as the byte-level fake, now over actual
    pixels, so visually-near-identical bitmaps differ in few bits."""
    import numpy as np

    gray = decode_bmp(payload)
    h, w = gray.shape
    cols = 8
    rows_n = max(bits // cols, 1)
    r_idx = np.minimum(np.arange(h) * rows_n // max(h, 1), rows_n - 1)
    c_idx = np.minimum(np.arange(w) * cols // max(w, 1), cols - 1)
    cell = r_idx[:, None] * cols + c_idx[None, :]
    flat = cell.ravel()
    sums = np.bincount(flat, weights=gray.ravel(), minlength=rows_n * cols)
    counts = np.bincount(flat, minlength=rows_n * cols)
    mean = float(gray.mean())
    sig = 0
    for k in range(min(bits, rows_n * cols)):
        if counts[k] and (sums[k] / counts[k]) > mean:
            sig |= 1 << k
    return sig


def decode_wav(payload: bytes):
    """Pure-Python (numpy-vectorized) WAV decode: RIFF PCM 8/16-bit,
    any channel count (averaged to mono) -> float64 samples in
    [-1, 1]. Walks the chunk list properly (fmt / data may be preceded
    by LIST etc.). Non-PCM encodings raise ValueError — those need a
    codec."""
    import struct

    import numpy as np

    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, _rate, _brate, _align, bits = fmt
    if audio_format != 1 or bits not in (8, 16) or n_ch < 1:
        raise ValueError(
            f"only PCM 8/16-bit WAV supported (format={audio_format}, "
            f"bits={bits})"
        )
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
        samples = raw.astype(np.float64) / 32768.0
    else:
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    if n_ch > 1:
        usable = (len(samples) // n_ch) * n_ch
        samples = samples[:usable].reshape(-1, n_ch).mean(axis=1)
    return samples


def wav_features(payload: bytes, n_coeffs: int = 4) -> list[float]:
    """Real audio features from a WAV payload: RMS energy over
    ``n_coeffs`` equal time segments — pluggable as
    ``audio_features(real_decoder='wav')``."""
    import numpy as np

    samples = decode_wav(payload)
    n = len(samples)
    if n == 0:
        return [0.0] * n_coeffs
    seg = np.arange(n) * n_coeffs // n
    return [
        float(np.sqrt(np.mean(np.square(samples[seg == k]))))
        if (seg == k).any()
        else 0.0
        for k in range(n_coeffs)
    ]


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
    decode; ``real_decoder="bmp"`` uses the built-in pure-Python BMP
    decoder (:func:`bmp_features` — real pixels, no codec needed); by
    default the deterministic fake runs (see module docstring). Raises
    NotImplementedError if a codec-requiring decode is requested."""
    import pandas as pd

    decoder = real_decoder
    if decoder is None:
        decoder = _fake_decode
    elif decoder == "bmp":
        decoder = bmp_features
    elif decoder == "real":
        raise NotImplementedError(
            "no compressed-image codec available in this environment; use "
            "real_decoder='bmp' for uncompressed bitmaps, pass a callable, "
            "or use the deterministic fake (default)"
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
    contract) via mapInPandas. The COMPRESSED-format decode is stubbed
    with a deterministic digest-derived fake (librosa/soundfile absent
    here); ``real_decoder="wav"`` uses the built-in pure-Python RIFF
    PCM decoder (:func:`wav_features` — real samples, segment RMS);
    or plug ``real_decoder(payload: bytes) -> list[float]`` in."""
    import pandas as pd

    def _fake_audio(payload: bytes) -> list[float]:
        digest = hashlib.md5(b"audio:" + bytes(payload)).digest()
        return [b / 255.0 for b in digest[:n_coeffs]]

    if real_decoder == "wav":
        def real_decoder(p, _n=n_coeffs):  # noqa: F811 - resolved selector
            return wav_features(p, _n)
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
    real pHash; ``real_hasher="bmp"`` uses the built-in pure-Python
    blockhash over DECODED pixels (:func:`bmp_blockhash`);
    ``real_hasher="real"`` raises NotImplementedError for formats that
    need codecs."""
    import numpy as np
    import pandas as pd

    if not 0 < bits < 63:
        raise ValueError(f"bits must be in (0, 63), got {bits}")
    if real_hasher == "bmp":
        def real_hasher(p, _b=bits):  # noqa: F811 - resolved selector
            return bmp_blockhash(p, _b)
    elif real_hasher == "real":
        raise NotImplementedError(
            "no compressed-image codec available in this environment; use "
            "real_hasher='bmp' for uncompressed bitmaps, pass a callable, or "
            "use the deterministic locality-sensitive fake (default)"
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
