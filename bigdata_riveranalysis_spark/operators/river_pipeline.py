"""The reference's river-quality pipeline, rebuilt Spark-native.

Three stages (SURVEY.md §7 phase 1):

  * :func:`prep` — the batch data-prep job. Same semantics as the
    reference's pandas script (reference kafka/sort_the_source.py:13-38:
    month-name → month-number map, date construction from
    (year, month, 1), global time sort, 5-column projection,
    yyyy-MM-dd formatting) as one lazy DataFrame plan: Catalyst
    collapses it to scan → project → range-partitioned sort.
  * :func:`parse_readings` — the canonical ingest mapping. The
    reference's producer and consumer schemas never matched
    (SURVEY.md §0 bug #2): the wire format is all-string JSON
    (reference kafka/producer.py:24,37,43) while the consumer schema
    expects typed fields (reference streaming/spark_processor.py:18-24).
    The engine defines the contract: parse as all-string struct, then
    rename/cast — `WaterbodyName→sensor_id`, `FullDate→timestamp`,
    `pH→ph_value`, `Dissolved Oxygen→do_value`,
    `Conductivity @25°C→tds_value`, computing in DOUBLE
    (SURVEY.md §7 watch-list #2/#3).
  * :func:`wqi_classify` / :func:`flag_anomalies` — the analytics the
    reference README promises but never implemented
    (reference README.md:5-6): WQI banding and per-sensor z-score
    anomaly flags. Pure column expressions — no UDFs.

The same transformations run unchanged on a streaming DataFrame
(see bigdata_riveranalysis_spark.streaming.pipeline) — they are all
narrow, stateless column ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Month-name map from the reference prep job (kafka/sort_the_source.py:14-18).
#: The reference maps ABBREVIATED names ('Jan'..'Dec') — its raw EPA
#: extract carries three-letter months. Matching the reference exactly;
#: full English names are accepted as a tolerant superset (the raw file
#: is absent from the reference snapshot, so the engine accepts both
#: spellings rather than silently NULLing either).
MONTH_MAP = {
    "Jan": 1, "Feb": 2, "Mar": 3, "Apr": 4,
    "May": 5, "Jun": 6, "Jul": 7, "Aug": 8,
    "Sep": 9, "Oct": 10, "Nov": 11, "Dec": 12,
    "January": 1, "February": 2, "March": 3, "April": 4,
    "June": 6, "July": 7, "August": 8,
    "September": 9, "October": 10, "November": 11, "December": 12,
}

#: Raw wire schema — all strings, as csv.DictReader/json.dumps emits
#: them (reference kafka/producer.py:37-43; FIXTURES.md §2).
RAW_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("FullDate", T.StringType(), True),
        T.StructField("WaterbodyName", T.StringType(), True),
        T.StructField("pH", T.StringType(), True),
        T.StructField("Dissolved Oxygen", T.StringType(), True),
        T.StructField("Conductivity @25°C", T.StringType(), True),
    ]
)

#: Canonical typed reading schema (FIXTURES.md §3). The reference
#: declares FloatType (streaming/spark_processor.py:21-23); the engine
#: computes in DoubleType and casts at the edge if float output is
#: required.
READING_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("ph_value", T.DoubleType(), True),
        T.StructField("do_value", T.DoubleType(), True),
        T.StructField("tds_value", T.DoubleType(), True),
    ]
)


def prep(spark: SparkSession, raw_csv_path: str) -> DataFrame:
    """Batch prep: raw EPA-style CSV → sorted 5-column replay table.

    Mirrors reference kafka/sort_the_source.py semantics: month-name
    decode (dict map → CASE chain; abbreviated 'Jan'-style keys per
    reference kafka/sort_the_source.py:14-18), date construction
    (pd.to_datetime(year, month, day=1) → make_date), global
    ascending sort by FullDate, projection, yyyy-MM-dd formatting.

    Unlike the reference (whose unmapped months silently become NaN
    and then a NaT FullDate), an unmapped OR NULL SampleDate FAILS
    LOUDLY at execution time via raise_error — month-name drift or a
    missing month in the feed is a data defect, not a row to sort to
    the front as NULL (ADVICE r3: the earlier guard exempted NULLs,
    recreating the exact silent-NULL behavior it claimed to remove).

    Scale: the global sort is the only shuffle (range-partitioned
    total order); everything else is narrow and fuses into the scan.
    """
    raw = spark.read.csv(raw_csv_path, header=True)
    month_no = F.lit(None).cast("int")
    for name, num in MONTH_MAP.items():
        month_no = F.when(F.col("SampleDate") == name, num).otherwise(month_no)
    month_no = F.when(
        month_no.isNull(),
        F.raise_error(
            F.concat(
                F.lit("prep: unmapped SampleDate month name '"),
                F.coalesce(F.col("SampleDate"), F.lit("<NULL>")),
                F.lit("' (expected 'Jan'..'Dec')"),
            )
        ).cast("int"),
    ).otherwise(month_no)
    return (
        raw.withColumn("MonthNumber", month_no)
        .withColumn(
            "FullDate",
            F.make_date(F.col("Years").cast("int"), F.col("MonthNumber"), F.lit(1)),
        )
        .orderBy("FullDate")
        .select(
            F.date_format("FullDate", "yyyy-MM-dd").alias("FullDate"),
            "WaterbodyName",
            "pH",
            F.col("Dissolved Oxygen").alias("Dissolved Oxygen"),
            F.col("Conductivity @25°C").alias("Conductivity @25°C"),
        )
    )


def parse_readings(raw_json: DataFrame, value_col: str = "value") -> DataFrame:
    """Canonical ingest: JSON wire bytes/strings → typed readings.

    PERMISSIVE parse against the all-string wire schema (malformed
    rows → NULL struct, the from_json default the reference relied on,
    streaming/spark_processor.py:38), then explicit rename + cast.
    Works identically on batch and streaming DataFrames.

    The casts are try_* variants: under Spark 4's default ANSI mode a
    plain cast('double') on a well-formed-JSON row carrying a
    non-numeric field ('NA') — or to_timestamp on a non-yyyy-MM-dd
    date — throws and aborts the whole job, which violates this
    function's malformed→NULL contract for exactly the dirty-field
    case the all-string wire schema exists to survive (review finding,
    reproduced on 4.1.2; the earlier tests only fed non-JSON garbage,
    which from_json NULLs before any cast runs).
    """
    parsed = raw_json.select(
        F.from_json(F.col(value_col).cast("string"), RAW_WIRE_SCHEMA).alias("r")
    )
    return parsed.select(
        F.col("r.WaterbodyName").alias("sensor_id"),
        F.try_to_timestamp(F.col("r.FullDate"), F.lit("yyyy-MM-dd")).alias("timestamp"),
        F.col("r.pH").try_cast("double").alias("ph_value"),
        F.col("r.`Dissolved Oxygen`").try_cast("double").alias("do_value"),
        F.col("r.`Conductivity @25°C`").try_cast("double").alias("tds_value"),
    )


def wqi_classify(readings: DataFrame) -> DataFrame:
    """WQI banding from (ph, do, tds) — the README's classification goal.

    Canonical bands (engine-defined; the reference never specified
    them): pH in [6.5, 8.5], DO ≥ 80 %sat, conductivity ≤ 1000 µS/cm
    → 'good'; one violation → 'fair'; otherwise 'poor'.

    A reading with NO non-NULL measurement gets band NULL, not
    'good': NULL comparisons are not-true, so an all-NULL
    (malformed-wire) row would otherwise count zero violations and
    report garbage as good water quality (review finding). A
    partially-NULL reading is still banded on what it has — a NULL
    field simply can't add a violation.
    """
    violations = (
        F.when((F.col("ph_value") < 6.5) | (F.col("ph_value") > 8.5), 1).otherwise(0)
        + F.when(F.col("do_value") < 80.0, 1).otherwise(0)
        + F.when(F.col("tds_value") > 1000.0, 1).otherwise(0)
    )
    all_null = (
        F.col("ph_value").isNull()
        & F.col("do_value").isNull()
        & F.col("tds_value").isNull()
    )
    return readings.withColumn("n_violations", violations).withColumn(
        "wqi_band",
        F.when(all_null, F.lit(None).cast("string"))
        .when(F.col("n_violations") == 0, "good")
        .when(F.col("n_violations") == 1, "fair")
        .otherwise("poor"),
    )


def flag_anomalies(readings: DataFrame, z_threshold: float = 3.0) -> DataFrame:
    """Per-sensor z-score anomaly flags on each measurement column.

    Global per-sensor stats are a tiny aggregate (one row per sensor)
    broadcast back against the readings — one pass over the data,
    no per-row Python. The stats join is NULL-safe: a plain equi-join
    would silently DROP readings with NULL sensor_id (malformed wire
    rows) because NULL keys never match, breaking this function's
    adds-columns-only contract (review finding); with eqNullSafe they
    join their own NULL-sensor stats group like any other key.
    """
    stats = readings.groupBy("sensor_id").agg(
        *[
            f(c).alias(f"{c}_{n}")
            for c in ("ph_value", "do_value", "tds_value")
            for n, f in (("mu", F.avg), ("sigma", F.stddev_samp))
        ]
    )
    st = stats.withColumnRenamed("sensor_id", "_stats_sensor_id")
    out = readings.join(
        F.broadcast(st),
        readings["sensor_id"].eqNullSafe(st["_stats_sensor_id"]),
    ).drop("_stats_sensor_id")
    for c in ("ph_value", "do_value", "tds_value"):
        # try_divide: a zero-variance column (constant sensor) yields
        # NULL z, not a DIVIDE_BY_ZERO job failure under ANSI mode;
        # coalesce(False) makes "no spread" mean "not anomalous".
        z = F.try_divide(F.col(c) - F.col(f"{c}_mu"), F.col(f"{c}_sigma"))
        out = out.withColumn(
            f"{c}_anomaly", F.coalesce(F.abs(z) > z_threshold, F.lit(False))
        )
    return out.drop(
        *[f"{c}_{n}" for c in ("ph_value", "do_value", "tds_value") for n in ("mu", "sigma")]
    )
