"""Batch table sources over the driver-generated parquet star schema.

The reference's only batch source is a pandas CSV scan
(reference kafka/sort_the_source.py:13). The engine's canonical batch
source is a parquet scan — columnar, predicate-pushdown- and
column-pruning-capable — of the tables documented in TESTDATA.md /
FIXTURES.md §4-5.

Nothing here caches or collects: loaders return lazy DataFrames so
Catalyst sees the whole plan (scan + downstream filter/project fuse
into one stage, and only referenced columns are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Every table the engine serves, in dependency-ish order.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should broadcast in joins at any scale.
DIM_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table from a scale-factor directory."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Engine queries format timestamps for output; pin the session to
    # UTC even when running under a caller-provided SparkSession so
    # results match the (UTC-naive) DuckDB oracle everywhere
    # (SURVEY.md §7 watch-list #5).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md §4), which
        # Spark's vectorized reader rejects outright. Read nanos as
        # long and truncate to micros with integer DIV — double
        # division would lose precision above 2^53 ns. Matches
        # DuckDB's own nanos→micros truncation.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread_small_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin a scan across cores ONLY when it under-splits.

    The local test corpus is one small parquet file → one input split
    → one task, which would serialize per-row-heavy work (hashing,
    regex). On a real cluster the scan already has thousands of
    splits, and an unconditional ``repartition`` would insert a full
    Exchange of the raw corpus before any work — at 100 TB that
    shuffle IS the query cost. Gate on the actual split count so the
    big-data plan stays Exchange-free (VERDICT r1 'What's wrong' #4).
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; defaults to all of them."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so queries can be written in pure SQL.

    Views are session-scoped and cheap (no data movement — just a
    named logical plan), mirroring how the DuckDB oracle pre-registers
    the same table names.
    """
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
