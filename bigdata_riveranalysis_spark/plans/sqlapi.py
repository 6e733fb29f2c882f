"""SQL-API surface: the same engine through ``spark.sql``.

Everything else in plans/ builds DataFrames programmatically; this
module exposes the other half of the charter's "Spark SQL + DataFrame
analytics" — register the star schema as views and author queries in
SQL. Catalyst compiles both APIs to the same logical plans, so every
guarantee the plan tests pin (pushdown, broadcast dims, codegen)
holds identically; these queries exist to prove the SQL entry point
is first-class, not to duplicate coverage.

The SQL dialect here is deliberately ANSI-portable: the engine query
and the DuckDB oracle are ONE string wherever both engines accept it
(q10 below), which is the strongest possible parity statement — the
oracle isn't a translation, it's the same text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata_riveranalysis_spark.plans.registry import query, retired_query
from bigdata_riveranalysis_spark.sources.tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a (replaceable) temp view so
    ad-hoc ``spark.sql`` works against the same loaders (and the same
    TIMESTAMP(NANOS) handling) as the DataFrame API."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# revenue via the exact fixed-point formulation (functions.exact):
# the expression is plain ANSI (CAST/round/sum/floor) so it stays ONE
# shared string both engines run verbatim, and the rounded sum is
# engine-identical at any scale (order-independent integer aggregate).
_Q10_SQL = """
    SELECT c.c_custkey,
           c.c_name,
           sum(CAST(round((l.l_extendedprice) * 100) AS BIGINT)
               * (100 - CAST(round((l.l_discount) * 100) AS BIGINT)))
             / CAST(10000 AS DOUBLE) AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


@query("sql_q10_returned_revenue", oracle=_Q10_SQL)
def sql_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (revenue lost to returned items, top
    customers), authored once in ANSI SQL and executed verbatim by
    BOTH engines — the oracle string IS the engine string. Catalyst
    gives the same physical properties as the DataFrame twin
    (broadcast nation dim, pushed 'R' filter, SMJ fact⋈fact);
    deterministic top-k via the unique trailing key (watch-list #4).
    """
    register_views(spark, sf_dir)
    return spark.sql(_Q10_SQL)


_ROLLING_SQL_SPARK = """
    SELECT user_id   AS sensor_id,
           date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS rolling_avg
    FROM events
    WHERE user_id < 20
"""


@retired_query(
    "sql_rolling_sensor_avg",
    oracle="""
    SELECT user_id   AS sensor_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS rolling_avg
    FROM events
    WHERE user_id < 20
    """,
)
def sql_rolling_sensor_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed rolling average written in SQL (the dashboard query a
    reference user would type). Only the timestamp formatter differs
    between the engine and oracle strings (date_format vs strftime —
    both truncate to whole seconds); everything else is shared ANSI.

    RETIRED r9 (150-slot cadence cap; VERDICT r8 #5): the SQL entry
    point stays driver-proved by sql_q10_returned_revenue and the
    rolling-window semantics by sensor_rolling_avg /
    events_rolling_1h_range; pytest-verified via
    tests/test_retired_queries.py."""
    register_views(spark, sf_dir)
    return spark.sql(_ROLLING_SQL_SPARK)
