"""Streaming source builders.

Kafka for deployment (the reference's only source,
streaming/spark_processor.py:28-33), files and rate for tests — all
three return a streaming DataFrame with the same downstream contract,
so every pipeline in this package is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def kafka_stream(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> DataFrame:
    """Kafka source, as the reference configures it — with two fixes.

    Reference (streaming/spark_processor.py:28-33) subscribes to a
    topic its producer never writes (SURVEY.md §0 bug #1) with
    ``startingOffsets=latest`` and no checkpoint, so a restart drops
    data. The engine's contract: the caller names ONE topic used by
    both sides, offsets default to ``earliest`` (checkpoint state, not
    the offset option, governs resume position), and
    ``maxOffsetsPerTrigger`` bounds micro-batch size so a backlogged
    restart cannot produce an executor-OOM-sized first batch — the
    knob that matters at 100 TB/day ingest.

    ``fail_on_data_loss`` defaults TRUE — loud failure when
    checkpointed offsets have aged out of retention, consistent with
    this builder's no-silent-data-loss contract (a hardcoded false
    here silently skipped the gap, the exact failure mode the
    docstring claims to fix; review finding). Pass False only for
    deliberately lossy consumers (dashboards over a compacted topic).

    Requires the spark-sql-kafka connector on the classpath; not
    exercised in local tests (no broker in the container).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


#: Wire schema for JSON-lines test streams of `events`-shaped records.
EVENT_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def file_json_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENT_WIRE_SCHEMA,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """JSON-lines directory source — the test-harness stand-in for Kafka.

    Explicit schema (streaming file sources cannot infer;
    schema-on-write discipline matches SURVEY.md §1.3).
    ``maxFilesPerTrigger=1`` gives deterministic one-file-per-batch
    replay, which the watermark tests rely on to advance event time
    between batches.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 1) -> DataFrame:
    """Rate source: the engine-native form of the reference's 1 msg/sec
    replay producer loop (reference kafka/producer.py:43-47) — a
    synthetic (timestamp, value) stream for throughput/latency tests.
    """
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
