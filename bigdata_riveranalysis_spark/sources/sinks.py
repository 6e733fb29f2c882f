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


#: Bits per dimension in the Morton (Z-order) key. 21 bits × 2 dims
#: fits a long with headroom; callers bucket wider domains first.
ZORDER_BITS = 21


def _spread_bits(col: F.Column) -> F.Column:
    """Interleave-ready bit spread: the low ZORDER_BITS bits of the
    input distributed to even bit positions (classic mask-shift
    cascade, 5 steps for 21 bits — pure JVM long arithmetic, no UDF).
    """
    x = col.cast("long").bitwiseAND(F.lit((1 << ZORDER_BITS) - 1))
    for shift, mask in (
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ):
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(c1: F.Column, c2: F.Column) -> F.Column:
    """Morton key of two non-negative integer columns: bits of c1 on
    even positions, c2 on odd — points close in BOTH dimensions get
    close keys, so sorting by it clusters a 2-D space onto a 1-D
    file layout."""
    return _spread_bits(c1).bitwiseOR(F.shiftleft(_spread_bits(c2), 1))


def write_zorder_table(
    df: DataFrame,
    path: str,
    *,
    zorder_by: tuple[str, str],
    n_files: int,
    mode: str = "error",
) -> None:
    """Z-order-clustered parquet — the multi-dimensional pruning
    layout (the technique behind Delta/Iceberg OPTIMIZE ZORDER,
    reimplemented on open Spark primitives).

    A plain sort by one column makes that column's per-file min/max
    ranges tight but leaves every OTHER filter column spread across
    all files — a reader filtering on the second dimension prunes
    nothing. Sorting by the Morton interleave instead gives every
    file a small bounding BOX in (c1, c2) space, so parquet
    row-group/file skipping works for range predicates on EITHER or
    BOTH dimensions — at 100 TB this is the difference between
    scanning ~√F of F files and scanning all of them for a 2-D
    selective query. Verified empirically by
    tests/test_r6_operators.py::test_zorder_layout_prunes_both_dimensions
    against footer statistics.

    Mechanics: range-partition on the key (so files tile the curve
    contiguously), sort within partitions, drop the key before
    writing — the parquet files carry only data columns, with their
    footer min/max statistics doing the pruning.
    """
    c1, c2 = zorder_by
    keyed = df.withColumn("_zkey", zorder_key(F.col(c1), F.col(c2)))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
