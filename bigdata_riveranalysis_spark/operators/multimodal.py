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


def _decode_payload(payload: bytes) -> dict:
    """STUB decode step — deterministic fake features.

    A real implementation would decode the image/audio here (PIL,
    torchaudio, ...) and emit embeddings / dimensions / frames. The
    container has no media libraries, so this extracts deterministic
    byte-level features instead; the Spark-side contract is identical.
    """
    return {"byte_len": len(payload), "first_byte": payload[0] if payload else None}


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
