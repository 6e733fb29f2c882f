"""Multimodal column convention + decode/feature-extract plumbing.

Convention (SURVEY.md §7 phase 3): a multimodal asset is an opaque
``binary`` payload column plus a typed metadata struct
(mime/byte length/uri). Decode / feature-extraction runs as an
Arrow-batched ``mapInPandas`` operator — the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested; the actual
image/audio decode is stubbed (those libraries are not in this
container) behind :func:`_decode_payload`, which any real codec can
replace without touching the plan.

Scale: mapInPandas streams Arrow batches — constant memory per task,
no driver involvement; payload columns stay binary end-to-end (never
stringified), and metadata-only queries never touch the payload
column thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the feature-extraction stage.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Wrap a source column as the canonical multimodal (payload, meta) pair.

    For real assets the payload would come from
    ``spark.read.format("binaryFile")``; here the documents table's
    text is encoded so the downstream plumbing is exercised with real
    bytes.
    """
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(F.col(text_col)).alias("byte_len"),
        ).alias("meta"),
    )


def _decode_ppm(payload: bytes) -> dict | None:
    """Pure-Python decode of binary PPM (P6) images — a REAL decode
    path needing no media library: header parse (magic, dims, maxval,
    whitespace/comment handling per the netpbm spec) + raster stats.
    Returns None when the payload is not a P6 image.

    This is the codec slot a production deployment fills with
    PIL/ffmpeg for richer formats; P6 proves the contract end-to-end
    with genuinely decoded pixels (dimensions + channel means), not a
    byte-level fake.
    """
    if not payload.startswith(b"P6"):
        return None
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":  # comment to end of line
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isdigit():
            end = pos
            while end < len(payload) and payload[end : end + 1].isdigit():
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
        else:
            return None  # malformed header
    if len(fields) < 3 or pos >= len(payload) or not payload[pos : pos + 1].isspace():
        return None
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = fields
    if maxval <= 0 or maxval > 255 or width <= 0 or height <= 0:
        return None
    raster = payload[pos : pos + width * height * 3]
    if len(raster) < width * height * 3:
        return None
    totals = [0, 0, 0]
    for i, b in enumerate(raster):
        totals[i % 3] += b
    n_px = width * height
    return {
        "decoded": "image/x-portable-pixmap",
        "width": width,
        "height": height,
        "mean_r": totals[0] / n_px,
        "mean_g": totals[1] / n_px,
        "mean_b": totals[2] / n_px,
    }


def _decode_payload(payload: bytes) -> dict:
    """Decode step: real PPM (P6) decode when the payload is one
    (_decode_ppm — no media library needed); deterministic byte-level
    features otherwise (the slot richer codecs — PIL, torchaudio —
    fill in production; those libraries are not in this container).
    The Spark-side contract is identical either way.
    """
    return {"byte_len": len(payload), "first_byte": payload[0] if payload else None,
            "image": _decode_ppm(payload)}


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_decode_payload)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "byte_len": feats.map(lambda f: f["byte_len"]),
                    "first_byte": feats.map(lambda f: f["first_byte"]),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("decoded", T.StringType(), True),  # NULL: not an image
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def decode_images(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decode over the payload column (PPM
    P6, pure Python — see _decode_ppm). Non-image payloads yield a
    NULL-decoded row rather than an error, so mixed-modality corpora
    flow through one operator; richer codecs slot into
    _decode_payload without touching this plan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf["payload"].map(lambda p: _decode_ppm(p) or {})
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "decoded": imgs.map(lambda i: i.get("decoded")),
                    "width": imgs.map(lambda i: i.get("width")),
                    "height": imgs.map(lambda i: i.get("height")),
                    "mean_r": imgs.map(lambda i: i.get("mean_r")),
                    "mean_g": imgs.map(lambda i: i.get("mean_g")),
                    "mean_b": imgs.map(lambda i: i.get("mean_b")),
                }
            )

    return df.mapInPandas(run, schema=IMAGE_SCHEMA)


#: Frame-sampling geometry (bytes): a "frame" is FRAME_LEN bytes, one
#: sampled every FRAME_STRIDE bytes from the payload start.
FRAME_LEN = 64
FRAME_STRIDE = 128

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame_len", T.IntegerType(), True),
        T.StructField("frame_first_byte", T.IntegerType(), True),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _sample_frames(payload: bytes) -> list[tuple[int, bytes]]:
    """STUB frame sampler — deterministic byte-slice "frames".

    A real implementation would seek keyframes with a video demuxer
    (PyAV, ffmpeg) at a target fps; the container has no media
    libraries, so frames are fixed-stride byte windows. The Spark
    contract — binary in, one row per sampled frame out — is the real
    one.
    """
    return [
        (i, payload[off : off + FRAME_LEN])
        for i, off in enumerate(range(0, len(payload), FRAME_STRIDE))
    ]


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling as a 1→N Arrow-batched operator.

    mapInPandas (not a UDF + explode) because the fan-out ratio is
    data-dependent and the frames should never materialize as one
    giant array value per row — each yielded batch streams straight
    into the child operator. Scale: narrow (no shuffle); payload
    partition sizing is the only knob, same as extract_features.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_no": [],
                "frame_len": [],
                "frame_first_byte": [],
                "frame": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, frame in _sample_frames(payload):
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame_len"].append(len(frame))
                    out["frame_first_byte"].append(frame[0] if frame else None)
                    out["frame"].append(frame)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def _resize_payload(payload: bytes, target: int) -> bytes:
    """STUB resize — deterministic downsample: every k-th byte so the
    output is ≤ target bytes (a real implementation decodes and
    resamples pixels; the contract — binary in, smaller binary out —
    is identical)."""
    if len(payload) <= target:
        return payload
    step = -(-len(payload) // target)  # ceil division
    return payload[::step]


def resize_assets(df: DataFrame, target_bytes: int = 128) -> DataFrame:
    """Resize/downsample each payload to ≤ target_bytes (stub codec),
    preserving the (payload, meta) convention so resized assets flow
    into the same downstream operators."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda p: _resize_payload(p, target_bytes))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "byte_len": resized.map(len),
                }
            )

    return df.mapInPandas(
        run,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), True),
                T.StructField("mime", T.StringType(), True),
                T.StructField("byte_len", T.LongType(), True),
            ]
        ),
    )
