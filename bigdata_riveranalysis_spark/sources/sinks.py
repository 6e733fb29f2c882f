"""Batch sinks — the write side of the engine.

The reference's only batch sink is an index-less CSV
(reference kafka/sort_the_source.py:38). The engine's canonical sink
is partitioned parquet; CSV/JSON writers exist for interop with the
reference's formats. Kafka bulk publish replaces the reference's
row-at-a-time producer loop (reference kafka/producer.py:35-47).

Scale notes: `partition_by` columns become directory partitions —
the unit of partition pruning for every downstream reader, so choose
low-cardinality, always-filtered columns (date, region). A 100 TB
write must also bound files-per-partition: repartition on the
partition columns first so each partition directory is written by few
tasks (small-files problem), which is why `write_partitioned_parquet`
pre-shuffles by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] = (),
    mode: str = "error",
    coalesce_per_partition: bool = True,
) -> None:
    """Columnar sink with directory partitioning.

    ``coalesce_per_partition`` repartitions by the partition columns
    before the write so each partition directory gets a bounded file
    count instead of (tasks × partitions) shards.
    """
    out = df
    if partition_by and coalesce_per_partition:
        out = df.repartition(*[F.col(c) for c in partition_by])
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    *,
    bucket_by: tuple[str, ...],
    n_buckets: int,
    sort_by: tuple[str, ...] = (),
    mode: str = "error",
) -> None:
    """Bucketed (hash-clustered) parquet table — the co-located-join
    layout.

    Both sides of a recurring fact⋈fact join written with the same
    ``bucket_by`` / ``n_buckets`` join with ZERO exchanges: each
    bucket file pair joins independently (and with ``sort_by`` on the
    join key, with zero sorts too — pre-sorted sort-merge). At 100 TB
    this converts every repeated join/groupBy on the bucket key from
    a full shuffle into a scan; the write pays one shuffle, once.
    Pinned by tests/test_sinks_and_plans.py::test_bucketed_join_elides_shuffle.

    Bucketed layout requires a catalog entry (`saveAsTable`; bucket
    metadata lives in the table catalog, not the files), with the
    data at ``path`` — in-memory catalog locally, Hive/Glue/Unity on
    a cluster.
    """
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def write_csv(df: DataFrame, path: str, *, mode: str = "error") -> None:
    """Header'd CSV sink — the reference's output format
    (index-less to_csv ≡ Spark's header CSV)."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_json_lines(df: DataFrame, path: str, *, mode: str = "error") -> None:
    """JSON-lines sink — the reference's wire format, as files."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "error") -> None:
    """ORC sink — the other columnar interchange format (Hive-side
    ecosystems). Same pushdown/pruning properties as parquet on read;
    kept for interop, parquet remains the engine's canonical format.
    """
    df.write.mode(mode).orc(path)


def kafka_frames(df: DataFrame) -> DataFrame:
    """Wire frames for the Kafka producer path: one JSON object per
    row, keys in column order, as a single ``value`` string column.

    This is the reference producer's wire contract
    (kafka/producer.py:24,37-43: csv.DictReader row → json.dumps →
    utf-8): same keys in the same order, same values. The reference
    serializes with json.dumps' default ``", "``/``": "`` separators
    while to_json emits compact JSON — whitespace between tokens,
    which every JSON consumer (including the engine's own
    parse_readings) treats as identical. The broker-less contract
    test pins object-level equality and the typed round-trip.
    """
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def publish_kafka(
    df: DataFrame, *, bootstrap_servers: str, topic: str
) -> None:
    """Bulk Kafka publish: whole-row JSON values, batched async sends
    executor-side (vs the reference's 1 msg/sec Python loop). Requires
    the kafka connector on the classpath; the frame construction is
    contract-tested broker-less via :func:`kafka_frames`.
    """
    (
        kafka_frames(df)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
