"""Retired-tier queries stay oracle-verified (registry cap policy).

The registry is hard-capped at 150 (50-slot driver window × enforced
3-round cadence, tests/test_rotation.py). At the cap, new operators
displace redundant demos into registry.RETIRED — same Query record,
same DuckDB oracle, continuously verified HERE on every pytest run
instead of by the external driver. This test is the teeth of that
policy (VERDICT r8 #5): retiring a query must never silence its
differential check.
"""

from __future__ import annotations

from bigdata_riveranalysis_spark.plans.registry import REGISTRY, RETIRED
# THE shared canonicalizer, not a fork (review r9): two
# hand-maintained canons that must agree drift apart. The STRICT form
# — no integral-float collapse — so a retired query whose Spark side
# drifts to double against an int64 oracle fails here instead of
# hiding behind the lenient collapse (review r9 second pass; the
# collapse is what blinded diffcheck for two rounds). tools.canon is
# import-side-effect-free, unlike the CLI harness modules.
from tools.canon import canon_strict as _canon

from .conftest import SF_ORACLE


def _rows(cols, rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def test_retired_tier_is_the_agreed_headroom():
    """At the 150 cap exactly (the r16 slot plan, amended by the
    optimization round: the interrupted build funded VERDICT r15 #4's
    held slot BY DISPLACEMENT — stream_session_fold_ttl registered,
    events_sessionize retired — but the optimization-round driver
    contract forbids removing a declared query, so events_sessionize
    is re-registered and BOTH sessionizers are declared. 150/50 = 3
    keeps the staleness cadence exact with zero slack; the next new
    operator must displace a genuinely subsumed row AT ROUND START so
    the driver sees the swap in the same correctness pass that green-
    lights the replacement), and every retired query keeps an oracle
    (a rows-only retired query would be verified by nothing)."""
    assert len(REGISTRY) <= 150, (
        f"{len(REGISTRY)} registered queries breaks the 150-slot "
        f"cadence cap (r16 slot plan)"
    )
    assert len(RETIRED) >= 5
    assert not (set(RETIRED) & set(REGISTRY))
    missing = [n for n, q in RETIRED.items() if not q.oracle]
    assert not missing, f"retired queries without an oracle: {missing}"


def test_retired_queries_match_their_oracles(spark, duck):
    """Full differential check (row count + columns + canonical
    values) for every retired query at sf0.01 — identical rigor to
    the driver gate, minus only the per-round rotation slot."""
    for name, q in RETIRED.items():
        sdf = q.fn(spark, SF_ORACLE)
        scols = list(sdf.columns)
        srows = [tuple(r) for r in sdf.collect()]
        rel = duck.execute(q.oracle)
        dcols = [d[0] for d in rel.description]
        drows = rel.fetchall()
        assert sorted(scols) == sorted(dcols), name
        assert len(srows) == len(drows), name
        assert _rows(scols, srows) == _rows(dcols, drows), name
