"""Round-7 pinning tests (VERDICT r6 brief).

  * graph_triangle_count is now DEGREE-oriented (#4): the planted
    hub/star graph produces ZERO wedges (under the old id
    orientation a low-id hub is the apex of O(hub²) wedges), exact
    triangle counts survive on known graphs, and the physical plan
    contains the degree-aggregate broadcast join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_riveranalysis_spark.plans import mining as M


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "part_a long, part_b long")


def _wedges(de):
    w1 = de.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    w2 = de.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return w1.join(w2, "a").filter(F.col("b") != F.col("c"))


def test_star_graph_has_zero_wedges_under_degree_orientation(spark):
    """Hub node 0 (lowest id, degree 40) + 40 degree-1 leaves: id
    orientation makes the hub the apex of 40·39 = 1560 wedges;
    degree orientation points every edge leaf→hub, so NO node has
    out-degree > 1 and the wedge set is EMPTY — the arboricity bound
    the r6 docstring promised but didn't implement."""
    e = _edges(spark, [(0, i) for i in range(1, 41)])
    de = M.degree_oriented_edges(e)
    out = de.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert out == 1
    assert _wedges(de).count() == 0
    assert M.triangles_per_node(e).count() == 0


def test_triangle_counts_exact_on_planted_graphs(spark):
    """K4 (4 triangles, every node in 3) + a pendant edge + an open
    square (0 triangles) — each triangle emitted exactly once via its
    unique two-out-edge apex."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pendant = [(4, 9)]
    square = [(10, 11), (11, 12), (12, 13), (10, 13)]
    got = {
        r.node: r.n_triangles
        for r in M.triangles_per_node(
            _edges(spark, k4 + pendant + square)
        ).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_hub_with_one_closing_edge_still_counts(spark):
    """Star + one leaf-leaf edge = exactly 1 triangle; the apex must
    be a LEAF (degree order), never the hub, keeping wedge volume at
    the arboricity bound even when triangles exist."""
    e = _edges(spark, [(0, i) for i in range(1, 31)] + [(1, 2)])
    got = {r.node: r.n_triangles for r in M.triangles_per_node(e).collect()}
    assert got == {0: 1, 1: 1, 2: 1}
    de = M.degree_oriented_edges(e)
    # hub 0 has max degree → zero out-edges → zero hub-apex wedges
    assert de.filter(F.col("src") == 0).count() == 0


def test_triangle_plan_shows_degree_broadcast_join(spark):
    """The executed plan of the registered query must contain the
    degree-aggregate broadcast joins (the 100×-scale feature), not a
    bare id-oriented self-join."""
    df = M.graph_triangle_count(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
