"""Round-6 pinning tests.

Covers the VERDICT r5 brief:
  * scale.two_level_prefix / scale.ntile_from_rank reproduce the
    single-reducer global windows bit-for-bit while keeping every
    fact-path window band-partitioned (#3);
  * the rewritten customer_rfm_segments / events_pareto_users plans
    contain NO global window over unbounded-cardinality input — the
    only unpartitioned windows left sit directly above the P-row
    band-totals aggregate (#3, "Done =" clause).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_riveranalysis_spark.plans import scale as SC
from bigdata_riveranalysis_spark.plans.registry import REGISTRY

from .conftest import SF_ORACLE

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SETTINGS
@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=40))
def test_two_level_prefix_matches_global_window(spark, vals):
    """Banded rank/cumsum/total == the literal unpartitioned window,
    including duplicate values resolved by the tie-break column.
    npartitions=4 forces real multi-band offsets even on tiny data."""
    df = spark.createDataFrame(list(enumerate(vals)), "id long, v long")
    order = [F.desc("v"), F.asc("id")]
    got = {
        r.id: r
        for r in SC.two_level_prefix(df, order, sum_cols=("v",), npartitions=4).collect()
    }
    w = W.orderBy(F.desc("v"), F.asc("id"))
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    exp = df.select(
        "id",
        F.row_number().over(w).alias("rk"),
        F.sum("v").over(run).alias("cum"),
    ).collect()
    tot = sum(vals)
    assert set(got) == {r.id for r in exp}
    for r in exp:
        assert got[r.id]._rk == r.rk, (r.id, vals)
        assert got[r.id]._cum_v == r.cum, (r.id, vals)
        assert got[r.id]._tot_v == tot


def test_ntile_from_rank_matches_window_ntile(spark):
    """The arithmetic quintile equals window ntile(5) for every rank at
    every tricky cardinality: n < tiles (each row its own bucket),
    n % tiles == 0, and every remainder class."""
    for n in (1, 2, 3, 4, 5, 6, 7, 9, 10, 23, 100):
        df = spark.range(1, n + 1).select(F.col("id").alias("rk"))
        got = {
            r.rk: r.t
            for r in df.select(
                "rk",
                SC.ntile_from_rank(F.col("rk"), F.lit(n).cast("long"), 5).alias("t"),
            ).collect()
        }
        exp = {
            r.rk: r.t
            for r in df.select(
                "rk", F.ntile(5).over(W.orderBy("rk")).alias("t")
            ).collect()
        }
        assert got == exp, f"n={n}"


def _window_lines(plan: str) -> list[tuple[int, str]]:
    return [
        (i, line)
        for i, line in enumerate(plan.splitlines())
        if re.search(r"\bWindow \[", line)
    ]


def test_rfm_and_pareto_have_no_unbounded_global_window(spark):
    """Every unpartitioned Window node in the two rewritten queries'
    optimized plans must sit above an Aggregate keyed by _pid (the
    band-totals table — at most `shuffle partitions` rows), and at
    least one _pid-PARTITIONED window must exist (the fact path).
    Reverting to the global-ntile/cumsum formulation fails this."""
    for name in ("customer_rfm_segments", "events_pareto_users"):
        df = REGISTRY[name].fn(spark, SF_ORACLE)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        lines = plan.splitlines()
        wins = _window_lines(plan)
        assert wins, f"{name}: no Window nodes found"
        banded = [ln for _, ln in wins if ln.count("], [") == 2 and "_pid" in ln]
        assert banded, f"{name}: no band-partitioned window in plan"
        for i, ln in wins:
            if ln.count("], [") >= 2:
                continue  # partitioned — fine at any cardinality
            # global window: the nearest Aggregate BELOW it must be the
            # per-band totals (keyed by _pid), i.e. bounded input.
            below = lines[i + 1 :]
            agg = next((l for l in below if re.search(r"\bAggregate \[", l)), None)
            assert agg is not None and "_pid" in agg, (
                f"{name}: global window over non-band input:\n{ln}\nagg={agg}"
            )


def test_rfm_scores_identical_to_literal_ntile(spark):
    """End-to-end guard on the arithmetic rewrite: scores from the
    banded plan equal literal ntile(5) windows run on the same
    per-customer base (sf0.01 — real ties in frequency/monetary)."""
    got = {
        r.c_custkey: (r.r_score, r.f_score, r.m_score)
        for r in REGISTRY["customer_rfm_segments"].fn(spark, SF_ORACLE).collect()
    }
    from bigdata_riveranalysis_spark.functions import exact as EX
    from bigdata_riveranalysis_spark.sources.tables import load_table

    orders = load_table(spark, SF_ORACLE, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("r"))
    base = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(EX.cents("o_totalprice")).alias("monetary_c"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "c_custkey",
            F.datediff("r", "last_order").alias("recency_days"),
            "frequency",
            "monetary_c",
        )
    )
    exp = {
        r.c_custkey: (r.r, r.f, r.m)
        for r in base.select(
            "c_custkey",
            F.ntile(5).over(W.orderBy(F.desc("recency_days"), "c_custkey")).alias("r"),
            F.ntile(5).over(W.orderBy(F.asc("frequency"), "c_custkey")).alias("f"),
            F.ntile(5).over(W.orderBy(F.asc("monetary_c"), "c_custkey")).alias("m"),
        ).collect()
    }
    assert got == exp
