"""Skew-resilient plan shapes, demonstrated as oracle-checked queries.

AQE's skew handling (enabled in session.py) splits oversized shuffle
partitions at runtime, but two shapes still need explicit treatment
at 100 TB and belong in the engine's repertoire as first-class
operators — each formulated so its *result* is identical to the naive
plan (which is exactly what the DuckDB oracle runs):

  * **salted two-phase aggregation** — a groupBy whose key space is
    tiny (here: 3 return flags over the whole lineitem table) hashes
    every row of a key to ONE reducer; no partition split can help
    because the skew is in the key itself, not the partitioning.
    Salting widens the key for a partial aggregate, then a second
    (tiny) aggregate merges the partials. All the engine's aggregates
    are algebraic (sum/count/min/max → avg), so the two-phase result
    is exact.

  * **salted replicate join** — a fact⋈dim equi-join on a hot key
    sends every hot-key row to one join task under sort-merge. The
    fix: deterministic salt on the fact side, dim side exploded ×S
    (dims are small — replication is cheap), join on (key, salt).
    When the dim broadcasts this is moot; the salted shape is for the
    regime where the "small" side is too big to broadcast but still
    ≪ fact (e.g. a 10 GB user dim against a 100 TB event log).

Both salts are md5-derived (functions.text.hash32) — deterministic,
reproducible across runs and cluster sizes, never rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_riveranalysis_spark.functions import exact as EX
from bigdata_riveranalysis_spark.functions import text as TX
from bigdata_riveranalysis_spark.plans.registry import query
from bigdata_riveranalysis_spark.sources.tables import load_table


def two_level_prefix(
    df: DataFrame,
    order: list[Column],
    sum_cols: tuple[str, ...] = (),
    npartitions: int | None = None,
) -> DataFrame:
    """Global total-order rank (and optional running sums) WITHOUT a
    single-reducer window — the banded two-level prefix-sum shape
    (VERDICT r5 #3): an unpartitioned ``row_number()/sum() OVER
    (ORDER BY …)`` funnels every row through one task, which at
    billions of rows is the classic 100× scale-killer even when the
    input is "only" a per-entity aggregate.

    Level 1: ``repartitionByRange`` on the order key places each row
    in a range band (partition ids are monotone in sort order —
    RangePartitioner assigns partition 0 the lowest range), then rank
    and prefix-sum run WITHIN each band (a partitioned window, ≈N/P
    rows per task). Level 2: per-band totals — ONE row per band — get
    their own exclusive prefix via a window over that P-row table
    (bounded by the partition count, never by data size), and a
    broadcast join adds the band offsets back.

    Correctness does not depend on where the sampled range boundaries
    land: with a total order (callers must include a unique tie-break
    column) every key tuple is distinct, so bands partition the order
    and offsets+local ranks reproduce the global window bit-for-bit.
    The explicit ``npartitions`` (default: the session's shuffle
    partitions) also pins AQE out of coalescing the range exchange.

    Adds ``_rk`` (1-based global row number), ``_totn`` (grand-total
    row count — computed on the P-row band table, so ntile-style
    callers don't need a separate count aggregate + broadcast of the
    whole input; r16, guide §2.4) and, per name in ``sum_cols``,
    ``_cum_<c>`` (inclusive running sum) and ``_tot_<c>`` (grand
    total) to ``df``'s columns.
    """
    p = int(
        npartitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # localCheckpoint is CORRECTNESS-critical, not an optimization:
    # the banded frame feeds two consumers (the per-band window and
    # the band-totals aggregate), and without materialization each
    # consumer re-executes repartitionByRange — whose boundaries come
    # from SAMPLING, so the two executions can band rows differently,
    # desynchronizing the offsets table from the local ranks (ranks
    # then collide/skip; surfaced as uneven ntile buckets and a
    # phantom 11th bucket on the 150k-row equi-depth input at sf0.1 —
    # tiny inputs sample deterministically and masked it). Pinned by
    # tests/test_r6_operators.py::test_two_level_prefix_ranks_are_a_permutation.
    ranged = (
        df.repartitionByRange(p, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    lw = W.partitionBy("_pid").orderBy(*order)
    run = lw.rowsBetween(W.unboundedPreceding, W.currentRow)
    local = ranged.withColumn("_lrk", F.row_number().over(lw))
    # DECIMAL(38,0) accumulation (ADVICE r6): callers feed long cent
    # sums, and a plain long cumulative sum hits Spark's ANSI overflow
    # (where DuckDB promotes to HUGEINT) at exactly the corpus sizes
    # this banded machinery exists for — the same cliff exact.wide_sum
    # closes for plain aggregates. _cum_/_tot_ therefore come back as
    # decimal(38,0); downstream arithmetic (ratio identities, integer
    # cross-multiplications, floor-division picks) is decimal-exact
    # and every REGISTERED output still emits double/long/boolean.
    wide = {c: F.col(c).cast("decimal(38,0)") for c in sum_cols}
    for c in sum_cols:
        local = local.withColumn(f"_lcum_{c}", F.sum(wide[c]).over(run))
    parts = local.groupBy("_pid").agg(
        F.count("*").alias("_n"),
        *[F.sum(wide[c]).alias(f"_s_{c}") for c in sum_cols],
    )
    ow = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, W.currentRow)
    gw = W.partitionBy()  # global agg over the P-row band table only
    off = parts.select(
        "_pid",
        (F.sum("_n").over(ow) - F.col("_n")).alias("_offn"),
        F.sum("_n").over(gw).alias("_totn"),
        *[
            (F.sum(f"_s_{c}").over(ow) - F.col(f"_s_{c}")).alias(f"_offs_{c}")
            for c in sum_cols
        ],
        *[F.sum(f"_s_{c}").over(gw).alias(f"_tot_{c}") for c in sum_cols],
    )
    out = (
        local.join(F.broadcast(off), "_pid")
        .withColumn("_rk", F.col("_offn") + F.col("_lrk"))
    )
    for c in sum_cols:
        out = out.withColumn(f"_cum_{c}", F.col(f"_offs_{c}") + F.col(f"_lcum_{c}"))
    drop = ["_pid", "_lrk", "_offn"] + [
        n for c in sum_cols for n in (f"_lcum_{c}", f"_offs_{c}")
    ]
    return out.drop(*drop)


def ntile_from_rank(rk: Column, n: Column, tiles: int) -> Column:
    """``ntile(tiles)`` reproduced arithmetically from a global rank:
    the first ``n % tiles`` buckets take ``n div tiles + 1`` rows, the
    rest ``n div tiles`` (SQL ntile's exact distribution), so a row's
    bucket — ceil(rank / bucket_size) within its regime — is pure
    arithmetic on (rank, n), computable from the scalable
    :func:`two_level_prefix` rank with no global sort. floor() of a
    float64 quotient is exact while operands stay below 2^53 ≈ 9e15 —
    comfortably past any per-entity cardinality. The small-n branch
    (q = 0: every row its own bucket) never reaches the ``/ q`` arm
    because big = n then covers every rank, and the guarded divisor
    keeps even speculative evaluation finite.
    """
    t = F.lit(tiles)
    q = F.floor(n / t).cast("long")  # n div tiles
    r = n % t
    big = r * (q + 1)
    ceil1 = F.floor((rk + q) / (q + 1)).cast("long")  # ceil(rk/(q+1))
    safe_q = F.greatest(q, F.lit(1))
    ceil2 = F.floor((rk - big + safe_q - 1) / safe_q).cast("long")
    return F.when(rk <= big, ceil1).otherwise(r + ceil2)

#: Salt fan-out. Locally modest; at 100 TB size it so that
#: rows-per-(key,salt) ≈ a healthy shuffle-partition target
#: (hot-key rows / S ≲ maxPartitionBytes worth of rows).
SALT_BUCKETS = 16

#: Per-event-type handling config — a literal dim table (like
#: traindata.MIX_WEIGHTS: configuration as data, joined not hardcoded).
EVENT_TYPE_DIM = {
    "click": ("engagement", 1.0),
    "view": ("engagement", 0.5),
    "purchase": ("revenue", 10.0),
    "signup": ("growth", 5.0),
    "error": ("ops", 0.0),
}


@query(
    "agg_salted_skew",
    oracle=f"""
    SELECT l_returnflag,
           count(*)                      AS n_rows,
           {EX.sum_round4_sql(EX.cents_sql('l_quantity'), 2)} AS sum_qty,
           {EX.avg_round4_sql(EX.cents_sql('l_extendedprice'), 2)} AS avg_price,
           round(max(l_discount), 4)     AS max_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 3-key groupBy.

    Phase 1 groups by (l_returnflag, salt) — SALT_BUCKETS× more
    reducers share each hot key's rows; phase 2 merges the ≤ keys×S
    partial rows (trivial). avg is carried as (sum, count) through
    phase 1 — the decomposition that makes it algebraic; the oracle
    is the plain one-phase GROUP BY, proving the rewrite exact.

    (Spark's own partial/final hash aggregation already gives this
    for a plain groupBy — the explicit salt matters for the cases
    partial agg can't save: high-cardinality-under-the-hot-key
    composites like groupBy(key).agg(collect_list/percentile/
    count_distinct), where the map-side combine buys little and all
    of a key's rows still meet at one reducer. The demo keys on the
    3-value flag to make the skew unmistakable.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    salt = TX.hash32(F.col("l_orderkey").cast("string")) % SALT_BUCKETS
    # The avg denominator is carried as the NON-null value count (cp),
    # separate from the count(*) row count — ANSI avg() divides by
    # count(expr), and a count(*) denominator would silently dilute
    # the average on a NULL-bearing corpus in BOTH the salted plan and
    # (identically) its oracle, so the differential gate could never
    # catch it (ADVICE r5 latent; pinned in tests/test_r6_operators.py).
    partial = (
        li.groupBy("l_returnflag", salt.alias("salt"))
        .agg(
            F.count("*").alias("c"),
            F.count("l_extendedprice").alias("cp"),
            EX.wide_sum(EX.cents("l_quantity")).alias("sq"),
            EX.wide_sum(EX.cents("l_extendedprice")).alias("sp"),
            F.max("l_discount").alias("md"),
        )
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("c").alias("n_rows"),
            ((F.sum("sq") * F.lit(100)).cast("double") / F.lit(10000.0)).alias("sum_qty"),
            EX.ratio_round4(F.sum("sp"), F.sum("cp"), 2).alias("avg_price"),
            F.round(F.max("md"), 4).alias("max_disc"),
        )
    )


@query(
    "join_salted_replicate",
    oracle=f"""
    WITH dim(event_type, category, w_pm) AS (
        VALUES {", ".join(f"('{k}', '{c}', {int(w * 1000)})" for k, (c, w) in EVENT_TYPE_DIM.items())}
    )
    SELECT d.category,
           count(*)                        AS n_events,
           {EX.sum_round4_sql(f"{EX.cents_sql('e.value')} * d.w_pm", 5)} AS weighted_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY d.category
    """,
)
def join_salted_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate join: events (5 hot keys, ~uniform but each
    key = 20% of the table) ⋈ an event-type config dim.

    Fact side gets salt = hash32(event_id) % S; dim side cross-joins
    a 0..S-1 spine so every (event_type, salt) pair exists once; the
    equi-join on (event_type, salt) then spreads each hot key over S
    tasks. Deterministic → reproducible plans AND results; the oracle
    is the unsalted join.

    Here the dim is 5 rows so production would broadcast (and Spark
    does — the salted demo disables that conversion for itself to
    exercise the shuffle path); the shape is sized for the
    too-big-to-broadcast middle dim.
    """
    events = load_table(spark, sf_dir, "events")
    # Weights carried as exact permille INTEGERS (all configured
    # weights are half-integers): cents(value) × w_pm is a scale-5
    # long, so the weighted sum is order-independent — the raw-double
    # sum(value·weight) this replaces drifts ~√n ulps and flips the
    # 4th decimal between engines at large group sizes (functions.
    # exact policy; flagged in review).
    dim = events.sparkSession.createDataFrame(
        [(k, c, int(w * 1000)) for k, (c, w) in EVENT_TYPE_DIM.items()],
        "event_type string, category string, w_pm long",
    )
    salt_spine = F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))).alias("salt")
    dim_rep = dim.select("*", salt_spine)
    fact = events.withColumn(
        "salt", (TX.hash32(F.col("event_id").cast("string")) % SALT_BUCKETS).cast("int")
    )
    joined = fact.hint("shuffle_hash").join(dim_rep, ["event_type", "salt"])
    return joined.groupBy("category").agg(
        F.count("*").alias("n_events"),
        EX.sum_round4(EX.cents("value") * F.col("w_pm"), 5).alias("weighted_value"),
    )
