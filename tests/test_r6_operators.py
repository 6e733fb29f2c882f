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


def test_two_level_prefix_ranks_are_a_permutation(spark):
    """At a scale where repartitionByRange's boundary SAMPLING is no
    longer deterministic across executions (~200k rows), the global
    ranks must still be exactly the permutation 1..N and the running
    sum must end at the total — the invariant that breaks when the
    banded frame is recomputed per consumer with different sampled
    boundaries (the r6 equi-depth 11-bucket bug)."""
    n = 200_000
    df = spark.range(n).selectExpr("id", "(id * 48271) % 1000003 AS v")
    pre = SC.two_level_prefix(df, [F.asc("v"), F.asc("id")], sum_cols=("v",))
    agg = pre.agg(
        F.count("*").alias("c"),
        F.count_distinct("_rk").alias("d"),
        F.max("_rk").alias("m"),
        F.max("_cum_v").alias("cum_max"),
        F.any_value("_tot_v").alias("tot"),
    ).collect()[0]
    assert (agg.c, agg.d, agg.m) == (n, n, n), (agg.c, agg.d, agg.m)
    assert agg.cum_max == agg.tot


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
    Reverting to the global-ntile/cumsum formulation fails this.
    Classification shares tools.planaudit's line grammar."""
    from tools.planaudit import is_global_window_line

    for name in ("customer_rfm_segments", "events_pareto_users"):
        df = REGISTRY[name].fn(spark, SF_ORACLE)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        lines = plan.splitlines()
        wins = _window_lines(plan)
        assert wins, f"{name}: no Window nodes found"
        banded = [ln for _, ln in wins if ln.count("], [") == 2 and "_pid" in ln]
        assert banded, f"{name}: no band-partitioned window in plan"
        for i, ln in wins:
            if not is_global_window_line(ln):
                continue  # partitioned — fine at any cardinality
            # global window: the nearest Aggregate BELOW it must be the
            # per-band totals (keyed by _pid), i.e. bounded input.
            below = lines[i + 1 :]
            agg = next((l for l in below if re.search(r"\bAggregate \[", l)), None)
            assert agg is not None and "_pid" in agg, (
                f"{name}: global window over non-band input:\n{ln}\nagg={agg}"
            )


def test_salted_avg_divides_by_nonnull_count(spark, tmp_path):
    """ANSI avg() divides by count(expr); the salted two-phase
    decomposition must carry the NON-null value count through phase 1
    or a NULL-bearing corpus silently dilutes the average — and since
    the oracle twin uses count(expr) too, only a planted-NULL fixture
    can catch the drift (ADVICE r5 latent)."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 3],
            "l_returnflag": ["A", "A", "A"],
            "l_quantity": [1.0, 2.0, 3.0],
            "l_extendedprice": [10.0, 20.0, None],
            "l_discount": [0.0, 0.0, 0.0],
        }
    )
    df.to_parquet(tmp_path / "lineitem.parquet", index=False)
    row = REGISTRY["agg_salted_skew"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_rows == 3  # count(*) still counts the NULL row
    assert row.avg_price == 15.0  # (10+20)/2, not (10+20)/3


def test_wide_sum_survives_long_overflow(spark):
    """sum_round4 on values whose LONG sum exceeds 2^63 must return
    the exact decimal-summed answer instead of raising (Spark ANSI)
    or wrapping — the q1 scale-6 charge term does exactly this around
    sf30 (ADVICE r5 latent; functions.exact.wide_sum)."""
    from bigdata_riveranalysis_spark.functions import exact as EX

    v = 5_000_000_000_000_000_000  # 4 × 5e18 = 2e19 > 2^63-1 ≈ 9.22e18
    df = spark.createDataFrame([(v,)] * 4, "x long")
    got = df.agg(EX.sum_round4(F.col("x"), 6).alias("s")).collect()[0].s
    exact = (2 * 4 * v + 100) // 200 / 10000.0  # round_half_up(Σ/1e6, 4)
    assert got == exact


def test_ts_unit_sniff_cache_invalidated_on_rewrite(tmp_path):
    """Rewriting events.parquet IN PLACE with a different physical ts
    unit must flip the sniff — a bare-path cache would keep serving
    the stale unit decision after an in-process fixture regeneration
    (ADVICE r4/r5 latent; cache is keyed on the (file, mtime_ns,
    size) signature)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_riveranalysis_spark.sources.tables import events_ts_is_nanos

    p = str(tmp_path / "events.parquet")
    ts = pd.to_datetime(["2024-01-01 00:00:00", "2024-01-02 00:00:00"])
    micros = pa.table({"ts": pa.array(ts, type=pa.timestamp("us"))})
    pq.write_table(micros, p)
    assert events_ts_is_nanos(p) is False
    nanos = pa.table({"ts": pa.array(ts, type=pa.timestamp("ns"))})
    pq.write_table(nanos, p)
    # force a distinct mtime even on coarse-clock filesystems
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert events_ts_is_nanos(p) is True


# --- pattern mining / sequence analytics (r6 coverage growth) -----------


def test_basket_pairs_exact_counts_confidence_lift(spark, tmp_path):
    """Planted baskets → exact co-occurrence counts, confidence and
    lift. Baskets: {1,2}×3, {1,3}×1, {2}×1 over 5 orders; with
    min-support 3 only the (1,2) pair survives: conf = 3/4, lift =
    (3·5)/(4·4)."""
    import pandas as pd

    rows = []
    baskets = [[1, 2], [1, 2], [1, 2], [1, 3], [2]]
    for ok, parts in enumerate(baskets):
        for p in parts:
            rows.append((ok, p))
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    df["l_quantity"] = 1.0
    df.to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = REGISTRY["basket_part_pairs"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.n_ab, r.n_a, r.n_b) == (1, 2, 3, 4, 4)
    assert r.confidence == 0.75
    assert r.lift == round(15 / 16, 4)


def test_transition_matrix_tiebreak_and_shares(spark, tmp_path):
    """Same-timestamp events order by event_id (the pinned tie-break),
    and shares row-normalize per from_type."""
    import pandas as pd

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00"] * 2 + ["2024-01-01 00:01:00", "2024-01-01 00:02:00"]
    )
    df = pd.DataFrame(
        {
            "event_id": [2, 1, 3, 4],  # id 1 precedes id 2 at the tied ts
            "ts": ts,
            "user_id": [7, 7, 7, 7],
            "event_type": ["click", "view", "view", "purchase"],
            "value": [0.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    out = {
        (r.from_type, r.to_type): (r.n_transitions, r.share)
        for r in REGISTRY["events_transition_matrix"].fn(spark, str(tmp_path)).collect()
    }
    # sequence: view(id1) → click(id2) → view(id3) → purchase(id4)
    assert out == {
        ("view", "click"): (1, 0.5),
        ("click", "view"): (1, 1.0),
        ("view", "purchase"): (1, 0.5),
    }


def test_interarrival_exact_on_subsecond_gaps(spark, tmp_path):
    """Gaps are measured in exact integer microseconds — a 1.5 s and a
    0.25 s gap average to 0.875 s, which second-resolution arithmetic
    would destroy."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [base, base + pd.Timedelta("1.5s"), base + pd.Timedelta("1.75s")],
            "user_id": [9, 9, 9],
            "event_type": ["view"] * 3,
            "value": [0.0] * 3,
            "props": ["{}"] * 3,
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    r = REGISTRY["events_interarrival_user"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.user_id, r.n_gaps) == (9, 2)
    assert r.avg_gap_s == 0.875
    assert (r.min_gap_s, r.max_gap_s) == (0.25, 1.5)


def test_keywords_tf_rank_tiebreak(spark, tmp_path):
    """tf ties break by term ascending (total order), df counts docs
    not occurrences, and only the top KEYWORDS_PER_DOC survive."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["b b a a c d", "a x"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
        }
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = {
        (r.doc_id, r.rnk): (r.term, r.tf, r.df)
        for r in REGISTRY["docs_keyword_tf"].fn(spark, str(tmp_path)).collect()
    }
    assert out[(1, 1)] == ("a", 2, 2)  # tf tie with b → 'a' first
    assert out[(1, 2)] == ("b", 2, 1)
    assert out[(1, 3)] == ("c", 1, 1)
    assert (1, 4) not in out  # 'd' cut by top-3
    assert out[(2, 1)] == ("a", 1, 2)


@SETTINGS
@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 59), st.sampled_from("abc")),
        min_size=2,
        max_size=40,
        unique_by=lambda e: (e[0], e[1]),
    )
)
def test_transition_conservation_law(spark, events, tmp_path_factory):
    """Σ n_transitions == Σ_user (events_u − 1), and per-from_type
    shares sum to 1 — algebraic invariants of the transition matrix
    on arbitrary event logs."""
    import pandas as pd

    tmp = tmp_path_factory.mktemp("trans")
    df = pd.DataFrame(
        {
            "event_id": range(len(events)),
            "ts": [pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=m) for _, m, _ in events],
            "user_id": [u for u, _, _ in events],
            "event_type": [t for _, _, t in events],
            "value": [0.0] * len(events),
            "props": ["{}"] * len(events),
        }
    )
    df.to_parquet(tmp / "events.parquet", index=False)
    rows = REGISTRY["events_transition_matrix"].fn(spark, str(tmp)).collect()
    from collections import Counter

    per_user = Counter(u for u, _, _ in events)
    expected_total = sum(n - 1 for n in per_user.values())
    assert sum(r.n_transitions for r in rows) == expected_total
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r.share)
    for shares in by_from.values():
        # each share is round4'd, so the sum can drift by 5e-5/term
        # (e.g. three 1/3 shares print 0.3333 and sum to 0.9999)
        assert abs(sum(shares) - 1.0) <= 5e-5 * len(shares) + 1e-9


@SETTINGS
@given(
    baskets=st.lists(
        st.lists(st.integers(1, 6), min_size=1, max_size=5),
        min_size=1,
        max_size=12,
    )
)
def test_basket_pair_conservation(spark, baskets, tmp_path_factory):
    """Σ_pairs n_ab == Σ_baskets k·(k−1)/2 over DISTINCT basket items
    (min-support disabled by summing the raw pair counts helper)."""
    import pandas as pd

    from bigdata_riveranalysis_spark.plans.mining import (
        _baskets,
        _basket_pair_counts,
    )

    tmp = tmp_path_factory.mktemp("basket")
    rows = [(ok, p) for ok, parts in enumerate(baskets) for p in parts]
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    df["l_quantity"] = 1.0
    df.to_parquet(tmp / "lineitem.parquet", index=False)
    got = sum(
        r.n_ab
        for r in _basket_pair_counts(_baskets(spark, str(tmp))).collect()
    )
    expected = sum(
        len(set(parts)) * (len(set(parts)) - 1) // 2 for parts in baskets
    )
    assert got == expected


def test_cms_never_underestimates(spark):
    """The Count-Min invariant: the sketch estimate is ≥ the exact
    count for EVERY audited key (min over rows of bucket counts that
    all include the key), and overcount is their exact difference."""
    rows = REGISTRY["cms_heavy_hitters"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.est_n >= r.exact_n, (r.part, r.est_n, r.exact_n)
        assert r.overcount == r.est_n - r.exact_n


def test_triangles_on_planted_graph(spark, tmp_path):
    """Edges {1-2, 2-3, 1-3, 3-4} (each co-ordered twice to clear the
    support threshold) close exactly one triangle (1,2,3); node 4
    participates in none and must not appear."""
    import pandas as pd

    rows = []
    ok = 0
    for edge in ([1, 2], [2, 3], [1, 3], [3, 4]):
        for _ in range(2):
            for p in edge:
                rows.append((ok, p))
            ok += 1
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    df["l_quantity"] = 1.0
    df.to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = {
        r.node: r.n_triangles
        for r in REGISTRY["graph_triangle_count"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}


def test_weighted_sample_hits_every_whale(spark, tmp_path):
    """Systematic weighted sampling must select every customer whose
    weight exceeds one stride (tot/n) — whales cannot be missed — and
    never yields more than n rows or a duplicate pick slot."""
    import pandas as pd

    from bigdata_riveranalysis_spark.plans.mining import WSAMPLE_N

    custs = list(range(1, 11))
    prices = [10000.0 if c == 5 else 10.0 for c in custs]  # whale = cust 5
    df = pd.DataFrame(
        {
            "o_orderkey": custs,
            "o_custkey": custs,
            "o_totalprice": prices,
        }
    )
    df.to_parquet(tmp_path / "orders.parquet", index=False)
    out = REGISTRY["sample_weighted_systematic"].fn(spark, str(tmp_path)).collect()
    picked = {r.c_custkey for r in out}
    assert 5 in picked
    assert len(out) <= WSAMPLE_N
    picks = [r.pick_no for r in out]
    assert len(picks) == len(set(picks))
    whale = {r.c_custkey: r for r in out}[5]
    assert whale.weight == 10000.0


def test_bloom_audit_invariants(spark):
    """A Bloom filter NEVER yields a false negative (every member
    passes), every member is part of the pass count, and the measured
    false-positive rate obeys the witnessed 5% bound at this sizing."""
    r = REGISTRY["bloom_prefilter_audit"].fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.n_false_neg == 0
    assert r.n_pass >= r.n_members
    assert r.n_false_pos == r.n_pass - r.n_members
    assert r.fp_below_5pct is True


def test_scd2_collapses_runs_and_closes_intervals(spark, tmp_path):
    """States A,A,B,A for one user → three intervals: A[t0,t2),
    B[t2,t3), A[t3,∞) with only the last current; a same-timestamp
    state change resolves by event_id."""
    import pandas as pd

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00",
            "2024-01-01 00:10:00",
            "2024-01-01 00:20:00",
            "2024-01-01 00:30:00",
            "2024-01-01 00:30:00",  # tie: resolved by event_id
        ]
    )
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "ts": ts,
            "user_id": [7] * 5,
            "event_type": ["view", "view", "click", "view", "purchase"],
            "value": [0.0] * 5,
            "props": ["{}"] * 5,
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    rows = sorted(
        REGISTRY["events_user_state_history"].fn(spark, str(tmp_path)).collect(),
        # at a tied valid_from the closed (empty) interval precedes
        # the open one — the event_id order that produced them
        key=lambda r: (r.valid_from, r.valid_to is None),
    )
    assert [(r.state, r.valid_from, r.valid_to, r.is_current) for r in rows] == [
        ("view", "2024-01-01 00:00:00", "2024-01-01 00:20:00", False),
        ("click", "2024-01-01 00:20:00", "2024-01-01 00:30:00", False),
        ("view", "2024-01-01 00:30:00", "2024-01-01 00:30:00", False),
        ("purchase", "2024-01-01 00:30:00", None, True),
    ]


@SETTINGS
@given(
    pts=st.lists(
        st.tuples(st.integers(0, (1 << 21) - 1), st.integers(0, (1 << 21) - 1)),
        min_size=1,
        max_size=30,
    )
)
def test_morton_key_matches_reference_interleave(spark, pts):
    """zorder_key equals an independent pure-Python bit interleave for
    arbitrary 21-bit coordinates (the full supported domain)."""
    from pyspark.sql import functions as F

    from bigdata_riveranalysis_spark.sources.sinks import ZORDER_BITS, zorder_key

    def ref(x, y):
        z = 0
        for i in range(ZORDER_BITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pts, "x long, y long")
    got = [
        r.z
        for r in df.select(zorder_key(F.col("x"), F.col("y")).alias("z"))
        .orderBy("z")
        .collect()
    ]
    assert got == sorted(ref(x, y) for x, y in pts)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The Z-order sink must give every file a small bounding box in
    (x, y) space: for a 2-D box predicate, footer min/max statistics
    prune strictly more files than a linear sort by x — and a
    y-only predicate (which a linear-by-x layout cannot prune at all)
    skips most z-ordered files."""
    import glob

    import pyarrow.parquet as pq

    from bigdata_riveranalysis_spark.sources.sinks import (
        write_zorder_table,
    )

    n, domain, files = 40_000, 1024, 16
    df = spark.range(n).selectExpr(
        "id",
        f"(id * 48271) % {domain} AS x",
        f"(id * 69621) % {domain} AS y",
    )
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "l")
    write_zorder_table(df, zdir, zorder_by=("x", "y"), n_files=files)
    (
        df.repartitionByRange(files, "x")
        .sortWithinPartitions("x")
        .write.parquet(ldir)
    )

    def ranges(d):
        out = []
        for f in glob.glob(d + "/*.parquet"):
            md = pq.read_metadata(f)
            lo = {c: None for c in ("x", "y")}
            hi = {c: None for c in ("x", "y")}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        s = col.statistics
                        lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                        hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
            out.append((lo, hi))
        return out

    def overlapping(rngs, box):
        hits = 0
        for lo, hi in rngs:
            if all(hi[c] >= b0 and lo[c] <= b1 for c, (b0, b1) in box.items()):
                hits += 1
        return hits

    rz, rl = ranges(zdir), ranges(ldir)
    assert len(rz) == files and len(rl) == files
    # The z-order guarantee: EITHER single dimension prunes. A linear
    # sort by x also prunes x-boxes (often to fewer files — that's
    # its entire budget), but pays the full file count for any y
    # predicate; z-order splits the budget across both dimensions.
    # (Don't assert on 2-D boxes vs linear: x-pruning alone can tie
    # there, and range boundaries are sample-based so exact counts
    # wobble run to run — the review found that flake.)
    boxx, boxy = {"x": (100, 163)}, {"y": (600, 663)}
    zx, zy = overlapping(rz, boxx), overlapping(rz, boxy)
    assert zx <= files // 2 and zy <= files // 2, (zx, zy)
    assert overlapping(rl, boxy) == files  # linear-by-x cannot prune y
    # and across a workload touching both dimensions, z-order scans
    # fewer files than the linear layout in aggregate
    assert zx + zy < overlapping(rl, boxx) + files


# --- PNG codec (VERDICT r5 #5) ------------------------------------------

import struct
import zlib


def _png_encode(w, h, rgb, color=2, filters=None, palette=None):
    """Minimal test-side PNG encoder (stdlib only) with a per-row
    filter choice so the decoder's defilter paths are exercised
    against independently-constructed ground truth."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    stride = w * channels
    filters = filters or [0] * h
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        line = bytearray(rgb[y * stride : (y + 1) * stride])
        f = filters[y]
        enc = bytearray(line)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif f == 2:
                enc[i] = (line[i] - b) & 0xFF
            elif f == 3:
                enc[i] = (line[i] - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                from bigdata_riveranalysis_spark.operators.multimodal import _paeth

                enc[i] = (line[i] - _paeth(a, b, c)) & 0xFF
        raw += bytes([f]) + enc
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    if palette is not None:
        out += chunk(b"PLTE", palette)
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_png_decode_every_filter_and_color_type():
    """_png_raster reproduces the original pixels exactly for every
    scanline filter (None/Sub/Up/Average/Paeth) and for RGB, RGBA,
    gray, gray+alpha and palette color types — all against an
    independent encoder in this test."""
    from bigdata_riveranalysis_spark.operators.multimodal import _png_raster

    w, h = 5, 5
    rgb = bytes((x * 37 + y * 11 + c * 5) % 256 for y in range(h) for x in range(w) for c in range(3))
    # every filter type across the rows
    png = _png_encode(w, h, rgb, color=2, filters=[0, 1, 2, 3, 4])
    assert _png_raster(png) == (w, h, rgb)

    rgba = bytes(
        b for y in range(h) for x in range(w)
        for b in (rgb[(y * w + x) * 3 : (y * w + x) * 3 + 3] + b"\x80")
    )
    assert _png_raster(_png_encode(w, h, rgba, color=6, filters=[4, 3, 2, 1, 0])) == (w, h, rgb)

    gray = bytes((x * 7 + y * 3) % 256 for y in range(h) for x in range(w))
    expect_g = bytes(b for g in gray for b in (g, g, g))
    assert _png_raster(_png_encode(w, h, gray, color=0, filters=[2] * h)) == (w, h, expect_g)

    ga = bytes(b for g in gray for b in (g, 200))
    assert _png_raster(_png_encode(w, h, ga, color=4, filters=[4] * h)) == (w, h, expect_g)

    palette = bytes(range(16 * 3))
    idx = bytes((x + y) % 16 for y in range(h) for x in range(w))
    expect_p = b"".join(palette[i * 3 : i * 3 + 3] for i in idx)
    assert _png_raster(_png_encode(w, h, idx, color=3, filters=[1] * h, palette=palette)) == (
        w,
        h,
        expect_p,
    )


def test_png_decode_rejects_unsupported_and_garbage():
    from bigdata_riveranalysis_spark.operators.multimodal import _png_raster

    assert _png_raster(b"not a png") is None
    assert _png_raster(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) is None
    # interlaced (Adam7) flagged in IHDR → unsupported, None not crash
    png = bytearray(_png_encode(2, 2, bytes(12)))
    ihdr_at = png.find(b"IHDR")
    png[ihdr_at + 4 + 12] = 1  # interlace byte
    assert _png_raster(bytes(png)) is None


def test_checked_in_png_decodes_through_spark(spark):
    """The multimodal plan decodes a checked-in compressed PNG file
    end-to-end (golden generated once by tests/golden/make_png.py;
    VERDICT r5 #5 'Done' clause)."""
    import os

    from bigdata_riveranalysis_spark.operators.multimodal import decode_images

    p = os.path.join(os.path.dirname(__file__), "golden", "gradient_8x6.png")
    payload = open(p, "rb").read()
    df = spark.createDataFrame(
        [(1, payload), (2, b"plain bytes")], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in decode_images(df).collect()}
    img = rows[1]
    assert img.decoded == "image/png"
    assert (img.width, img.height) == (8, 6)
    # ground truth from the generator formula: px = (x*30, y*40, (x+y)*10)
    n = 8 * 6
    exp_r = sum(x * 30 for y in range(6) for x in range(8)) / n
    exp_g = sum(y * 40 for y in range(6) for x in range(8)) / n
    exp_b = sum((x + y) * 10 for y in range(6) for x in range(8)) / n
    assert (img.mean_r, img.mean_g, img.mean_b) == (exp_r, exp_g, exp_b)
    assert rows[2].decoded is None


def test_resize_resamples_real_rasters():
    """Image payloads are resized by pixel resampling (decode →
    nearest-neighbor → P6 re-encode), not byte slicing: the output
    re-decodes with the scaled dimensions and pixels drawn from the
    source raster; non-images keep the stride stub."""
    from bigdata_riveranalysis_spark.operators.multimodal import (
        _ppm_raster,
        _raster,
        _resize_payload,
    )

    w = h = 20
    rgb = bytes((x * 12) % 256 for y in range(h) for x in range(w) for _ in range(3))
    ppm = b"P6\n20 20\n255\n" + rgb
    out = _resize_payload(ppm, 128)
    assert len(out) <= 128
    decoded = _ppm_raster(out)
    assert decoded is not None
    nw, nh, nrgb = decoded
    assert 1 <= nw < 20 and 1 <= nh < 20
    # nearest-neighbor: output pixel (x,y) = source (x*20//nw, y*20//nh)
    for y in (0, nh - 1):
        for x in (0, nw - 1):
            src = ((y * h // nh) * w + (x * w // nw)) * 3
            assert nrgb[(y * nw + x) * 3 : (y * nw + x) * 3 + 3] == rgb[src : src + 3]
    # PNG inputs resize through the same raster path
    png = _png_encode(5, 5, bytes((x * 37 + y * 11 + c * 5) % 256
                                  for y in range(5) for x in range(5) for c in range(3)))
    rout = _resize_payload(png, 40)
    assert len(rout) <= 40 and _raster(rout) is not None
    # non-image: stride stub unchanged
    blob = bytes(range(200))
    sout = _resize_payload(blob, 100)
    assert sout == blob[::2]
    # image with a budget below any raster header: falls through to
    # the stride stub instead of crashing on a complex sqrt (review
    # finding: negative sqrt base → TypeError in int())
    tiny = _resize_payload(ppm, 10)
    assert len(tiny) <= 10 and isinstance(tiny, bytes)


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


def _make_wav(n_frames=800, rate=8000, channels=2, bits=16):
    """Minimal test-side WAV writer: channel 0 a square wave at
    amplitude 1000, channel 1 constant 250 — exact integer features."""
    import struct as _s

    frames = bytearray()
    for i in range(n_frames):
        for c in range(channels):
            v = (1000 if (i // 10) % 2 == 0 else -1000) if c == 0 else 250
            frames += _s.pack("<h", v)
    block = channels * bits // 8
    fmt = _s.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    data = bytes(frames)
    body = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt + b"data" + _s.pack("<I", len(data)) + data
    return b"RIFF" + _s.pack("<I", len(body)) + body


def test_wav_decode_is_real(spark):
    """decode_audio genuinely decodes PCM WAV: geometry, exact
    duration, per-sample peak and mean-absolute amplitude from the
    raster of samples; non-audio payloads pass through NULL-decoded."""
    from bigdata_riveranalysis_spark.operators.multimodal import decode_audio

    wav = _make_wav()
    df = spark.createDataFrame(
        [(1, wav), (2, b"not audio at all")], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in decode_audio(df).collect()}
    a = rows[1]
    assert a.decoded == "audio/wav"
    assert (a.sample_rate, a.n_channels, a.bits) == (8000, 2, 16)
    assert a.n_frames == 800
    assert a.duration_ms == 100  # 800 frames / 8000 Hz = 0.1 s exactly
    assert a.peak_amplitude == 1000
    assert a.mean_abs_amplitude == (1000 + 250) / 2  # both channels averaged
    assert rows[2].decoded is None and rows[2].sample_rate is None


def test_wav_decode_rejects_malformed():
    from bigdata_riveranalysis_spark.operators.multimodal import _wav_pcm

    wav = _make_wav()
    assert _wav_pcm(wav[:30]) is None  # truncated header
    assert _wav_pcm(b"RIFF" + wav[4:8] + b"AIFF" + wav[12:]) is None
    # compressed format code → None, not garbage stats
    bad = bytearray(wav)
    fmt_at = bad.find(b"fmt ") + 8
    bad[fmt_at : fmt_at + 2] = (85).to_bytes(2, "little")  # 85 = MP3
    assert _wav_pcm(bytes(bad)) is None
