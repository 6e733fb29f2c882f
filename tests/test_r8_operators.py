"""r8 pins: VERDICT r7 next-round items 1/3/4/6 and the ADVICE gates.

* stream_windowed_cms attributability — the streamed CMS must equal a
  batch formulation of the SAME sketch cell-by-cell, so a future red
  driver row distinguishes "hash family diverged" from "driver-side
  flake" (the r7 red was irreproducible: locally green, hash-stable
  ×3, batch siblings green).
* q21 drops the order-cardinality broadcast hint (scale OOM class).
* degree_oriented_edges joins carry no broadcast hint; parity under a
  forced-large (no-broadcast-allowed) configuration.
* pagerank_scores stays correct AND bounded-plan at 10 iterations.
* the f32 fused-Jaccard gate sits exactly at the 2^24/3 boundary.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------------------
# VERDICT r7 #1 — streamed CMS ≡ batch CMS, cell-level
# ---------------------------------------------------------------------------


def test_stream_windowed_cms_equals_batch_twin_cellwise(spark):
    """The streamed per-day Count-Min sketch must be bit-identical to
    the same sketch computed by a BATCH plan over the same events —
    same cms_bucket hash family, same windowing. Within-engine
    equality: if a driver round ever reds the stream query on hash
    while this test is green, the divergence is NOT in the hash
    family or window assignment (both run here), narrowing it to
    driver-side environment/staging."""
    from pyspark.sql import functions as F

    from bigdata_riveranalysis_spark.plans import mining as MN
    from bigdata_riveranalysis_spark.plans.streaming_queries import (
        stream_windowed_cms,
    )
    from bigdata_riveranalysis_spark.sources.tables import load_table

    streamed = stream_windowed_cms(spark, SF_SMOKE)

    seeds = F.array([F.lit(d) for d in range(MN.CMS_DEPTH)])
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .select(F.window("ts", "1 day").alias("win"), F.explode(seeds).alias("d"), "user_id")
        .select("win", "d", MN.cms_bucket(F.col("d"), F.col("user_id")).alias("b"))
        .groupBy("win", "d", "b")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd").alias("window_start"),
            "d",
            "b",
            "cnt",
        )
    )
    cols = ["window_start", "d", "b", "cnt"]
    s_rows = _rows(streamed, cols)
    b_rows = _rows(batch, cols)
    assert s_rows == b_rows
    assert len(s_rows) > 0


def test_cms_bucket_two_step_equals_naive_modular_hash(spark):
    """ADVICE r7 bisect: the r7 two-step Mersenne reduction must agree
    with the naive ((a·k + b) mod P) mod w — computed in unbounded
    Python ints — over the actual streamed key domain (small user_ids)
    AND wide keys. Green here rules the r7 hash rewrite OUT as the
    cause of the r7 driver red."""
    from pyspark.sql import functions as F

    from bigdata_riveranalysis_spark.plans import mining as MN
    from bigdata_riveranalysis_spark.sources.tables import load_table

    keys = [
        r[0]
        for r in load_table(spark, SF_SMOKE, "events")
        .select("user_id")
        .distinct()
        .collect()
    ]
    keys += [0, 1, (1 << 33) + 7, (1 << 62) + 11, (1 << 63) - 1]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        (r["k"], r["d"]): r["b"]
        for r in df.select(
            "k", F.explode(F.array([F.lit(d) for d in range(MN.CMS_DEPTH)])).alias("d")
        )
        .select("k", "d", MN.cms_bucket(F.col("d"), F.col("k")).alias("b"))
        .collect()
    }
    for k in keys:
        for d in range(MN.CMS_DEPTH):
            want = ((MN.CMS_A[d] * k + MN.CMS_B[d]) % MN.CMS_P) % MN.CMS_WIDTH
            assert got[(k, d)] == want, (k, d)


# ---------------------------------------------------------------------------
# VERDICT r7 #3 — q21 must not hint a broadcast of the qual order set
# ---------------------------------------------------------------------------


def test_q21_plan_hints_only_the_supplier_dim(spark):
    """The qualifying-orders set is order-cardinality — hinting it
    broadcast is the classic unbounded-broadcast OOM at 100 TB. The
    plan may contain exactly ONE broadcast hint: the supplier dim.
    (AQE may still CHOOSE a broadcast for qual at small SF from
    measured sizes — pinned here is the absence of the hardcoded
    hint, not the runtime choice.)"""
    from bigdata_riveranalysis_spark.plans.relational import q21_sole_late_supplier

    df = q21_sole_late_supplier(spark, SF_SMOKE)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1, analyzed


# ---------------------------------------------------------------------------
# VERDICT r7 #4 — degree joins survive a forced no-broadcast regime
# ---------------------------------------------------------------------------


@pytest.fixture()
def _no_broadcast(spark):
    """Force the large-graph path: no broadcast joins at all, static
    or AQE-converted — every join must run key-partitioned."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    prev = {}
    for k in keys:
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, "-1")
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_degree_orientation_parity_without_broadcast(spark, _no_broadcast):
    """Rows of triangle counting must be identical when every join is
    forced to the shuffle path — the billion-node regime where a
    degree-table broadcast would OOM. With no hint in the plan this
    is pure join-strategy variation; any row difference would mean
    the result depends on the physical strategy (it must not)."""
    from bigdata_riveranalysis_spark.plans.mining import triangles_per_node

    edges = [
        (1, 2), (2, 3), (1, 3),          # triangle
        (3, 4), (4, 5), (3, 5),          # triangle sharing node 3
        (5, 6),                           # pendant edge
        (6, 7), (7, 8), (6, 8), (8, 9),  # triangle + pendant
    ]
    e = spark.createDataFrame(edges, "part_a long, part_b long")
    got = _rows(triangles_per_node(e), ["node", "n_triangles"])
    assert got == [
        (1, 1), (2, 1), (3, 2), (4, 1), (5, 1), (6, 1), (7, 1), (8, 1)
    ]


def test_degree_orientation_plan_has_no_broadcast_hint(spark):
    from bigdata_riveranalysis_spark.plans.mining import degree_oriented_edges

    e = spark.createDataFrame([(1, 2), (2, 3)], "part_a long, part_b long")
    analyzed = degree_oriented_edges(e)._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed


# ---------------------------------------------------------------------------
# VERDICT r7 #6 — PageRank at 10 iterations: correct and bounded-plan
# ---------------------------------------------------------------------------


def _pagerank_reference(edges, iters):
    """Pure-Python fixed-point twin of pagerank_scores: integer floors
    only, so it must match Spark bit-for-bit."""
    from collections import defaultdict

    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    deg = {n: len(vs) for n, vs in adj.items()}
    s = {n: 1_000_000 for n in deg}
    for _ in range(iters):
        m = defaultdict(int)
        for u, vs in adj.items():
            share = s[u] // deg[u]
            for v in vs:
                m[v] += share
        s = {v: 150000 + (85 * t) // 100 for v, t in m.items()}
    return sorted((n, s[n], deg[n]) for n in s)


def test_pagerank_ten_iterations_bounded_plan(spark):
    """10 unrolled iterations must (a) match the pure-Python integer
    fixed point exactly and (b) keep the optimized plan bounded —
    localCheckpoint every 4 iterations truncates the lineage, so the
    final plan holds at most ceil-of-cadence iterations' joins, not
    all 10 (VERDICT r7 #6: recomputation risk and plan-tree growth)."""
    from bigdata_riveranalysis_spark.plans.mining import pagerank_scores

    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 1), (2, 5)]
    e = spark.createDataFrame(edges, "part_a long, part_b long")
    df = pagerank_scores(e, iters=10)
    got = _rows(df, ["node", "score_ppm", "degree"])
    assert got == _pagerank_reference(edges, 10)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # 10 unhygienic iterations would chain ≥10 join-aggregates; with
    # checkpointing every 4 the live lineage holds ≤2 iterations plus
    # the final degree join → a handful of Joins, not a tower.
    assert optimized.count("Join") <= 5, optimized.count("Join")


def test_pagerank_three_iterations_unchanged_by_cadence(spark):
    """The registered 3-iteration query must be unaffected by the
    checkpoint cadence (4 > 3 → no checkpoint fires)."""
    from bigdata_riveranalysis_spark.plans.mining import pagerank_scores

    edges = [(1, 2), (2, 3), (1, 3)]
    e = spark.createDataFrame(edges, "part_a long, part_b long")
    got = _rows(pagerank_scores(e, iters=3), ["node", "score_ppm", "degree"])
    assert got == _pagerank_reference(edges, 3)


# ---------------------------------------------------------------------------
# ADVICE r7 — the fused f32 Jaccard threshold gate boundary
# ---------------------------------------------------------------------------


def test_f32_jaccard_gate_constant_sits_at_the_half_integer_boundary():
    """With t = 0.5 the fused threshold compares 1.5·common (a HALF-
    integer for odd common) in f32. Halves are exactly representable
    only below 2^23, so common must stay ≤ 2^24/3 — the gate constant.
    Pin the numeric boundary itself: the largest admitted odd count is
    exact, the first odd count past the gate is not."""
    import numpy as np

    gate = (1 << 24) // 3  # 5_592_405, odd
    assert gate % 2 == 1
    exact = np.float32(1.5) * np.float32(gate)
    assert float(exact) == 1.5 * gate  # 8388607.5 < 2^23: representable
    past = gate + 2  # next odd value, beyond the gate
    rounded = np.float32(1.5) * np.float32(past)
    assert float(rounded) != 1.5 * past  # half is lost → flip risk

    # and the module gate carries exactly this constant, DERIVED from
    # the threshold rational (review r8: the tile coefficient was
    # previously hardcoded for t=1/2, silently decoupled from
    # JACCARD_THRESHOLD) — so is the containment twin's tighter cap.
    from bigdata_riveranalysis_spark.plans import llmdata

    assert llmdata.JACCARD_THRESHOLD == (
        llmdata.JACCARD_THRESHOLD_NUM / llmdata.JACCARD_THRESHOLD_DEN
    )
    assert llmdata._JACCARD_TILE_COEF == (
        llmdata.JACCARD_THRESHOLD_NUM + llmdata.JACCARD_THRESHOLD_DEN
    )
    assert llmdata._JACCARD_VOCAB_CAP == gate  # (1 << 24) // 3
    assert llmdata._CONT_P / llmdata._CONT_Q == (
        llmdata.CONTAINMENT_THRESHOLD_PCT / 100
    )
    assert llmdata._CONTAINMENT_VOCAB_CAP == (1 << 24) // llmdata._CONT_Q


# ---------------------------------------------------------------------------
# r8 new query shapes — tie-break and boundary semantics on planted data
# ---------------------------------------------------------------------------


def test_skyline_strict_domination_semantics(spark):
    """Planted frontier: duplicates collapse to one representative,
    equal-size points keep only the cheaper, equal-price points keep
    only the larger — and an undominated diagonal survives whole."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [
        # (brand, price_c, size)
        ("B", 100, 10), ("B", 100, 10),   # duplicate point
        ("B", 100, 5),                    # same price, smaller: dominated
        ("B", 200, 10),                   # same size, pricier: dominated
        ("B", 200, 20),                   # diagonal: survives
        ("B", 300, 30),                   # diagonal: survives
        ("B", 350, 25),                   # dominated by (300,30)
    ]
    pts = (
        spark.createDataFrame(rows, "p_brand string, price_c long, size long")
        .groupBy("p_brand", "price_c", "size")
        .agg(F.count("*").alias("n_parts"))
    )
    w = (
        W.partitionBy("p_brand")
        .orderBy(F.asc("price_c"), F.desc("size"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    sky = (
        pts.withColumn("mx", F.max("size").over(w))
        .filter(F.col("mx").isNull() | (F.col("mx") < F.col("size")))
    )
    got = sorted((r["price_c"], r["size"], r["n_parts"]) for r in sky.collect())
    assert got == [(100, 10, 2), (200, 20, 1), (300, 30, 1)]


def test_streak_islands_identity(spark):
    """Months {0,1,2, 5, 7,8} → islands of length 3/1/2: longest 3,
    active 6, streaks 3 — the mi − dense_rank identity."""
    from pyspark.sql import functions as F

    months = [(1, m) for m in (0, 1, 2, 5, 7, 8)]
    df = spark.createDataFrame(months, "o_custkey long, mi long")
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("mi")
    islands = df.withColumn("grp", F.col("mi") - F.dense_rank().over(w))
    streaks = islands.groupBy("o_custkey", "grp").agg(F.count("*").alias("len"))
    out = streaks.groupBy("o_custkey").agg(
        F.max("len").alias("longest"),
        F.sum("len").alias("active"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert (out["longest"], out["active"], out["n"]) == (3, 6, 3)


def test_mode_tie_break_is_lexicographic(spark):
    """Equal counts must resolve to the lexicographically smallest
    type in BOTH engines — the determinism contract a bare mode()
    aggregate cannot give."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [(1, "view"), (1, "click"), (2, "error"), (2, "click"), (2, "error")]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    cnt = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = W.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    got = {
        r["user_id"]: r["event_type"]
        for r in cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == {1: "click", 2: "error"}


def test_rolling_range_frame_is_time_not_rows(spark):
    """Five events 0/30/40/61/150 min apart: the 1-hour RANGE frame
    counts [1, 2, 3, 3, 1] — a profile NO fixed ROWS frame can
    reproduce (ROWS -1..0 reads [1,2,2,2,2]; ROWS -2..0 reads
    [1,2,3,3,3] — the isolated +150 min event pins the time
    exclusion, the +61 min event pins the expiry of the first). The
    original 3-event version read [1,2,2] — indistinguishable from a
    2-row ROWS frame, so the very semantics it claimed to pin were
    unpinned (review finding r8)."""
    import datetime as dt

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, 7, t0),
        (2, 7, t0 + dt.timedelta(minutes=30)),
        (3, 7, t0 + dt.timedelta(minutes=40)),
        (4, 7, t0 + dt.timedelta(minutes=61)),
        (5, 7, t0 + dt.timedelta(minutes=150)),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    got = {
        r["event_id"]: r["n"]
        for r in ev.select("event_id", F.count(F.lit(1)).over(w).alias("n")).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 3, 5: 1}


def test_complete_mode_agg_keeps_late_rows_across_batches(spark, tmp_path):
    """ADVICE r7 hypothesis test (driver file-batching): even when the
    file source is FORCED to split input across micro-batches
    (maxFilesPerTrigger=1) with the late file arriving AFTER the
    watermark advanced 10h past it, COMPLETE-mode aggregation keeps
    every row — complete mode retains all aggregate state and does
    not filter late input. This rules out multi-batch late-row drops
    as a mechanism for the r7 stream_windowed_cms driver red: with
    the hash-family bisect and batch-twin tests above, every
    in-engine divergence mechanism is now pinned green."""
    import datetime as dt
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("k", T.LongType())]
    )
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows_a = [(base + dt.timedelta(hours=10, minutes=m), 1) for m in range(3)]
    rows_b = [(base + dt.timedelta(minutes=m), 2) for m in range(3)]  # 10h late
    spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(
        str(tmp_path / "fa")
    )
    spark.createDataFrame(rows_b, schema).coalesce(1).write.parquet(
        str(tmp_path / "fb")
    )
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(glob.glob(str(tmp_path / "fa" / "*.parquet"))[0], src / "0000-a.parquet")
    shutil.copy(glob.glob(str(tmp_path / "fb" / "*.parquet"))[0], src / "0001-b.parquet")
    now = time.time()
    os.utime(src / "0000-a.parquet", (now - 100, now - 100))  # batch 1: new data
    os.utime(src / "0001-b.parquet", (now, now))  # batch 2: late data
    agg = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "k")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("mb_late_rows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert len(q.recentProgress) >= 2  # genuinely multi-batch
    res = sorted((r["k"], r["n"]) for r in spark.table("mb_late_rows").collect())
    assert res == [(1, 3), (2, 3)]  # the 10h-late rows survive intact


def test_data_cardinality_frames_carry_no_broadcast_hint(spark):
    """r8 broadcast audit: every hinted broadcast in the repo must be
    a bounded frame (dim table, 1-row aggregate, fixed sample/spine).
    The two data-cardinality offenders found — q18's qualifying-order
    set and the constraint report's customer key set — are pinned
    hint-free here (AQE still owns the small-SF runtime choice)."""
    from bigdata_riveranalysis_spark.plans.relational import (
        q18_large_volume_customers,
    )
    from bigdata_riveranalysis_spark.plans.traindata import dq_constraint_report

    q18 = q18_large_volume_customers(spark, SF_SMOKE)
    assert "ResolvedHint" not in q18._jdf.queryExecution().analyzed().toString()
    dq = dq_constraint_report(spark, SF_SMOKE)
    assert "ResolvedHint" not in dq._jdf.queryExecution().analyzed().toString()
