"""Multimodal (image/audio/video) column support (SURVEY.md §7.1 M6).

Design for 100 TB: media travels as an opaque ``binary`` payload column plus
a typed metadata struct; all per-item compute is Arrow-batched Python
(``mapInPandas`` / pandas UDFs) so payload bytes never round-trip through
row-at-a-time pickling, and nothing ever collects to the driver. Partition
sizing is the only knob that matters: payloads are large, so operators here
should run after ``repartition`` sized to keep a batch's payload bytes in
executor memory.

The container ships no image libraries, but PPM (P6) and uncompressed
24-bit BMP are stdlib-decodable (:mod:`operators.imagecodec`), so
:func:`decode_image` / :func:`resize_image` have a REAL executable branch
pinned against fixture bytes with known pixel values; other formats go
through the injection seam (``decoder=`` callable, defaulting to PIL when
importable, ``NotImplementedError`` at execution otherwise).
:func:`fake_decode_meta` / :func:`fake_resize` remain the deterministic
stand-ins for arbitrary (non-image) payload bytes so the full pipeline
(schema → batches → features → ANN) stays testable on the documents table.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import imagecodec

#: metadata struct carried alongside every payload
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META, False),
    ]
)

N_FEATURES = 16


def attach_media(documents: DataFrame, media_type: str = "image") -> DataFrame:
    """Derive an opaque media table from ``documents`` (payload = UTF-8
    bytes of the text — a deterministic stand-in for real image bytes; in
    production this column comes from the object store)."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def byte_stats(media: DataFrame) -> DataFrame:
    """Per-payload stats via mapInPandas (Arrow-batched; the payload column
    reaches Python as bytes objects inside a pandas batch)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "n_distinct_bytes": payloads.map(lambda b: len(set(b))),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(
        stats,
        schema="doc_id long, n_bytes int, n_distinct_bytes int, payload_md5 string",
    )


def media_features(media: DataFrame, n_features: int = N_FEATURES) -> DataFrame:
    """Feature extraction: normalized byte-histogram embedding (the
    deterministic stand-in for a real vision/audio encoder). Output plugs
    straight into operators.similarity / operators.dedup."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def featurize(payloads: pd.Series) -> pd.Series:
        def vec(b: bytes) -> list[float]:
            counts = [0] * n_features
            for byte in bytes(b):
                counts[byte % n_features] += 1
            total = float(len(b)) or 1.0
            return [c / total for c in counts]

        return payloads.map(vec)

    return media.select(
        F.col("doc_id").alias("vec_id"),
        featurize("payload").alias("embedding"),
        F.lit(0).alias("label"),
    )


def fake_decode_meta(media: DataFrame) -> DataFrame:
    """Deterministic fake decode: fills width/height from the payload hash
    (stands in for a real decoder so downstream schema contracts are
    exercised)."""
    h = F.conv(F.substring(F.md5("payload"), 1, 8), 16, 10).cast("long")
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.media_type"),
            F.col("meta.format"),
            (h % 1920 + 1).cast("int").alias("width"),
            (F.shiftright(h, 8) % 1080 + 1).cast("int").alias("height"),
            F.col("meta.sample_rate"),
            F.col("meta.duration_ms"),
        ),
    )


def default_decode(payload: bytes) -> tuple[str, int, int, bytes]:
    """The built-in decoder seam value: stdlib PPM/BMP first (always
    available — :mod:`operators.imagecodec`), PIL for anything else when
    importable, otherwise NotImplementedError naming both escape hatches.
    Returns ``(format, width, height, top-down RGB bytes)``."""
    raw = bytes(payload)
    if imagecodec.sniff(raw) is not None:
        return imagecodec.decode(raw)
    try:
        import PIL.Image as Image
    except ImportError as exc:
        raise NotImplementedError(
            f"payload (magic {raw[:2]!r}) is not one of the stdlib-decodable "
            f"formats {imagecodec.STDLIB_FORMATS} and PIL/pillow is not "
            "available in this environment; inject decoder= for other codecs"
        ) from exc
    import io  # pragma: no cover - environment-dependent

    img = Image.open(io.BytesIO(raw))  # pragma: no cover
    rgb = img.convert("RGB")  # pragma: no cover
    return (  # pragma: no cover
        (img.format or "unknown").lower(), rgb.width, rgb.height, rgb.tobytes()
    )


def decode_image(media: DataFrame, decoder=None) -> DataFrame:
    """REAL image decode (not the fake_decode_meta stand-in): every payload
    is decoded to top-down RGB bytes plus its true dimensions. PPM (P6) and
    uncompressed 24-bit BMP decode with zero dependencies
    (operators/imagecodec.py); other formats go through ``decoder`` —
    ``bytes -> (format, width, height, rgb)`` — which defaults to
    :func:`default_decode` (stdlib formats, then PIL when importable,
    else NotImplementedError at execution).

    Scale shape: zero-shuffle Arrow-batched map; payload bytes reach the
    numpy kernels once per batch and never leave the executor."""
    decoder = decoder or default_decode

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(decoder)
            out = pdf[["doc_id"]].copy()
            out["format"] = decoded.map(lambda d: d[0])
            out["width"] = decoded.map(lambda d: d[1])
            out["height"] = decoded.map(lambda d: d[2])
            out["rgb"] = decoded.map(lambda d: d[3])
            yield out

    return media.mapInPandas(
        decode,
        schema="doc_id long, format string, width int, height int, rgb binary",
    )


def fake_resize(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Deterministic resize stand-in completing the decode/feature/resize/
    frame-sample quartet: stride-samples each payload down to exactly
    ``width × height`` bytes (cycling when the payload is shorter — every
    output is full-size, as a real resampler's would be) and stamps the
    target dimensions into ``meta``. Same (doc_id, payload, meta) shape
    in and out, so resize composes with every other media operator; the
    real-codec path is :func:`resize_image` (stdlib PPM/BMP codec by
    default, other formats via the same ``decoder=`` injection seam as
    :func:`decode_image`).

    Scale shape: zero-shuffle Arrow-batched map; output payload size is
    CONSTANT per row (width·height), so a resize early in a media
    pipeline is also the data-volume clamp that makes downstream
    partition sizing predictable."""
    n_out = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def go(b: bytes) -> bytes:
                raw = bytes(b)
                if not raw:
                    return bytes(n_out)
                # stride-sample (or cycle) to exactly n_out bytes
                return bytes(raw[(i * len(raw)) // n_out] for i in range(n_out))

            out = pdf.copy()
            out["payload"] = out["payload"].map(go)
            out["meta"] = out["meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            yield out

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)


def resize_image(
    media: DataFrame, width: int = 32, height: int = 32, decoder=None
) -> DataFrame:
    """REAL image resize: decode (same seam as :func:`decode_image`) →
    nearest-neighbor resample (numpy, operators/imagecodec.py) → re-encode
    in the SAME container format for stdlib formats (PPM→PPM, BMP→BMP; a
    PIL-decoded format re-encodes via PIL — capture .format BEFORE
    resizing, PIL's resize() derivative has format None, ADVICE r7).
    Keeps the (doc_id, payload, meta) shape so it composes with every
    other media operator; :func:`fake_resize` remains the codec-free
    deterministic stand-in for arbitrary payload bytes."""
    decoder = decoder or default_decode

    def go(b: bytes) -> bytes:
        raw = bytes(b)
        fmt, w, h, rgb = decoder(raw)
        resized = imagecodec.resize_nearest(w, h, rgb, width, height)
        if fmt in imagecodec.STDLIB_FORMATS:
            return imagecodec.encode(fmt, width, height, resized)
        import io  # pragma: no cover - PIL-only leg

        import PIL.Image as Image  # pragma: no cover

        img = Image.frombytes("RGB", (width, height), resized)  # pragma: no cover
        buf = io.BytesIO()  # pragma: no cover
        img.save(buf, format=fmt.upper())  # pragma: no cover
        return buf.getvalue()  # pragma: no cover

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = out["payload"].map(go)
            out["meta"] = out["meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            yield out

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, frame_bytes: int = 64, every_n: int = 4) -> DataFrame:
    """Video-ish frame sampling: split each payload into fixed-size chunks
    ("frames") and keep every n-th — demonstrates the 1→N batch shape
    (mapInPandas emitting multiple rows per input row)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                frames = [
                    raw[i : i + frame_bytes]
                    for i in range(0, len(raw), frame_bytes)
                ]
                for idx in range(0, len(frames), every_n):
                    rows.append((doc_id, idx, frames[idx]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return media.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame binary"
    )
