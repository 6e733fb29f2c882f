"""r8 registry additions — independent recomputation pins.

Each of the six new queries is checked against an implementation that
shares NO code with the engine path: pure-Python/pandas brute force
(containment, attribution, OLS), an independent numpy Lloyd run
(k-means), the definitional single-reducer window (interleave), and
the already-verified clustering output (keep-best).
"""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------------------
# dedup_containment_ngram
# ---------------------------------------------------------------------------


def _brute_containment(spark):
    """Exact containment pairs via pure-Python sets (no numpy, no
    Spark expressions beyond the raw text scan)."""
    from bigdata_riveranalysis_spark.plans import llmdata as LD
    from bigdata_riveranalysis_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    cap = LD._jaccard_df_cap(len(docs))
    sets = {}
    for r in docs:
        t = [w for w in r.text.lower().split() if w]
        if len(t) < 2:
            continue
        sets[r.doc_id] = {f"{a} {b}" for a, b in zip(t, t[1:])}
    df = Counter(g for s in sets.values() for g in s)
    kept = {d: {g for g in s if df[g] <= cap} for d, s in sets.items()}
    out = {}
    ids = sorted(kept)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = len(kept[a] & kept[b])
            mn = min(len(kept[a]), len(kept[b]))
            if mn > 0 and 5 * c >= 4 * mn:
                out[(a, b)] = (c, (20000 * c + mn) // (2 * mn) / 1e4)
    return out


def test_containment_matches_pure_python_bruteforce(spark):
    from bigdata_riveranalysis_spark.plans.llmdata import dedup_containment_ngram

    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.containment)
        for r in dedup_containment_ngram(spark, SF_SMOKE).collect()
    }
    assert got == _brute_containment(spark)
    assert got, "threshold should yield non-empty pairs on the dup-planted corpus"


def test_containment_local_and_distributed_regimes_agree(spark, monkeypatch):
    """Force the inverted-index path (gate to zero) and require the
    identical pair set — the same parity discipline every other
    regime-split operator here carries."""
    from bigdata_riveranalysis_spark.plans import llmdata as LD

    local = _rows(
        LD.dedup_containment_ngram(spark, SF_SMOKE),
        ["doc_a", "doc_b", "n_common", "containment"],
    )
    monkeypatch.setattr(LD, "JACCARD_LOCAL_MAX_DOCS", 0)
    dist = _rows(
        LD.dedup_containment_ngram(spark, SF_SMOKE),
        ["doc_a", "doc_b", "n_common", "containment"],
    )
    assert local == dist


# ---------------------------------------------------------------------------
# dedup_keep_best
# ---------------------------------------------------------------------------


def test_keep_best_selects_longest_doc_per_cluster(spark):
    from bigdata_riveranalysis_spark.plans.llmdata import (
        dedup_cluster_components,
        dedup_keep_best,
    )
    from bigdata_riveranalysis_spark.sources.tables import load_table

    comp = dedup_cluster_components(spark, SF_SMOKE).collect()
    chars = {
        r.doc_id: r.n_chars
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    clusters = {}
    for r in comp:
        clusters.setdefault(r.canonical_id, []).append(r.doc_id)
    want = {}
    for cid, members in clusters.items():
        best = min(members, key=lambda d: (-chars[d], d))
        want[cid] = (best, chars[best], len(members), len(members) - 1)
    got = {
        r.cluster_id: (r.kept_doc_id, r.kept_n_chars, r.n_members, r.n_dropped)
        for r in dedup_keep_best(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert got, "the planted duplicates must produce clusters"


# ---------------------------------------------------------------------------
# kmeans_int8_lloyd2
# ---------------------------------------------------------------------------


def test_kmeans_matches_independent_numpy_lloyd(spark):
    """Re-run the exact integer Lloyd recurrence in numpy from the
    collected SQ8 codes: same init (8 smallest vec_ids), same
    floor-mean update, same (dist2, cid) tie-break."""
    import numpy as np

    from bigdata_riveranalysis_spark.plans.llmdata import (
        KMEANS_K,
        embedding_quantize_int8,
        kmeans_int8_lloyd2,
    )

    codes = embedding_quantize_int8(spark, SF_SMOKE).collect()
    ids = sorted({r.vec_id for r in codes})
    dmax = max(r.dim for r in codes) + 1
    X = np.zeros((len(ids), dmax), dtype=np.int64)
    idx = {v: i for i, v in enumerate(ids)}
    for r in codes:
        X[idx[r.vec_id], r.dim] = r.code

    # The engine's update is a groupBy: an empty cluster produces NO
    # centroid rows and vanishes from the next assignment. The
    # reference must mirror that (a zeros-row placeholder could win
    # argmin for low-magnitude codes and diverge spuriously — review
    # finding r8), so centroids live in a cid-keyed dict and empty
    # cids are dropped, not zeroed.
    cents = {c: X[idx[ids[c]]].copy() for c in range(KMEANS_K)}
    for it in range(2):
        cids = sorted(cents)  # ascending cid ⇒ argmin = lowest cid on ties
        C = np.stack([cents[c] for c in cids])
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        pos = d2.argmin(axis=1)
        assign = np.array([cids[p] for p in pos])
        best = d2[np.arange(len(ids)), pos]
        if it == 0:
            cents = {
                c: X[assign == c].sum(axis=0) // (assign == c).sum()
                for c in cids
                if (assign == c).any()
            }

    got = {r.vec_id: (r.cid, r.dist2) for r in kmeans_int8_lloyd2(spark, SF_SMOKE).collect()}
    want = {v: (int(assign[idx[v]]), int(best[idx[v]])) for v in ids}
    assert got == want


def test_kmeans_assigns_every_vector_exactly_once(spark):
    from bigdata_riveranalysis_spark.plans.llmdata import KMEANS_K, kmeans_int8_lloyd2
    from bigdata_riveranalysis_spark.sources.tables import load_table

    out = kmeans_int8_lloyd2(spark, SF_SMOKE).collect()
    n_vecs = load_table(spark, SF_SMOKE, "embeddings").count()
    assert len(out) == n_vecs
    assert len({r.vec_id for r in out}) == n_vecs
    assert all(0 <= r.cid < KMEANS_K and r.dist2 >= 0 for r in out)


# ---------------------------------------------------------------------------
# events_attribution_linear
# ---------------------------------------------------------------------------


def test_attribution_matches_pandas_bruteforce(spark):
    import pandas as pd

    from bigdata_riveranalysis_spark.plans.events import (
        ATTR_WINDOW_HOURS,
        events_attribution_linear,
    )
    from bigdata_riveranalysis_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").toPandas()
    p = ev[ev.event_type == "purchase"]
    t = ev[ev.event_type.isin(["click", "view"])]
    lo = pd.Timedelta(hours=ATTR_WINDOW_HOURS)
    want: dict[tuple[str, str], list[int]] = {}
    for _, pr in p.iterrows():
        tt = t[(t.user_id == pr.user_id) & (t.ts < pr.ts) & (t.ts >= pr.ts - lo)]
        k = len(tt)
        if not k:
            continue
        day = pr.ts.strftime("%Y-%m-%d")
        for _, tr in tt.iterrows():
            key = (day, tr.event_type)
            want.setdefault(key, [0, 0])
            want[key][0] += 1
            want[key][1] += 1_000_000 // k
    got = {
        (r.day, r.touch_type): [r.n_touches, int(r.credit_micro)]
        for r in events_attribution_linear(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert got, "the fixture must produce attributable purchases"


def test_attribution_touch_count_window_reuses_join_shuffle(spark):
    """At scale the touch↔purchase join is an SMJ on user_id; the
    per-purchase touch-count window partitions by (user_id, event_id)
    precisely so HashPartitioning(user_id) satisfies its distribution
    and NO second data-sized Exchange appears (partitionBy(event_id)
    alone would insert one — review finding r8). Pin under forced SMJ
    (broadcast disabled, the 100 TB shape): the only hash exchanges
    are the join's two inputs and the constant-size day×type rollup —
    none on event_id."""
    import re

    from bigdata_riveranalysis_spark.plans.events import events_attribution_linear

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        df = events_attribution_linear(spark, SF_SMOKE)
        # The STATIC physical plan (initial AdaptiveSparkPlan) is the
        # right artifact here: exchange insertion for a window's
        # required ClusteredDistribution is a static-planning
        # decision — AQE can coalesce/convert exchanges but never
        # adds one for the window — so pin the static shape without
        # running a throwaway job.
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    on_event = [e for e in exchanges if "event_id" in e]
    assert not on_event, f"window re-shuffled on event_id: {on_event}"
    # Upper bound, not exact equality (ADVICE r8): the pinned
    # invariant is "no exchange on event_id" above; the bound only
    # guards against a wholesale extra data-sized shuffle appearing,
    # without failing on unrelated planner/partial-agg changes.
    assert len(exchanges) <= 4, exchanges


# ---------------------------------------------------------------------------
# docs_interleave_schedule
# ---------------------------------------------------------------------------


def test_interleave_arithmetic_equals_definitional_window(spark):
    """The closed-form pos must equal the single-reducer definitional
    formulation (sort all rows by (round_no, domain) and enumerate) —
    computed here driver-side on the collected rows."""
    from bigdata_riveranalysis_spark.plans.traindata import docs_interleave_schedule

    rows = docs_interleave_schedule(spark, SF_SMOKE).collect()
    order = sorted(rows, key=lambda r: (r.round_no, r.domain))
    assert [r.pos for r in order] == list(range(1, len(rows) + 1))


def test_interleave_is_round_robin_with_unequal_domains(spark):
    from bigdata_riveranalysis_spark.plans.traindata import docs_interleave_schedule

    rows = docs_interleave_schedule(spark, SF_SMOKE).collect()
    sizes = Counter(r.domain for r in rows)
    assert len(sizes) > 1 and len(set(sizes.values())) > 1, (
        "fixture should exercise unequal domain sizes"
    )
    by_pos = sorted(rows, key=lambda r: r.pos)
    # first round: every domain once, in domain order
    k = len(sizes)
    head = by_pos[:k]
    assert [r.domain for r in head] == sorted(sizes)
    assert all(r.round_no == 1 for r in head)
    # within each domain, pos is strictly increasing with round_no
    for d in sizes:
        ps = [r.pos for r in sorted(rows, key=lambda r: r.round_no) if r.domain == d]
        assert ps == sorted(ps)


# ---------------------------------------------------------------------------
# sensor_trend_ols
# ---------------------------------------------------------------------------


def test_trend_ols_matches_arbitrary_precision_python(spark):
    """Recompute the moment sums with Python ints (unbounded
    precision) — any decimal-width or floor mistake in the engine
    path shows up as an exact mismatch."""
    from bigdata_riveranalysis_spark.plans.river import TREND_X_EPOCH, sensor_trend_ols
    from bigdata_riveranalysis_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "ts", "value").collect()
    acc: dict[int, list[int]] = {}
    for r in ev:
        x = int(r.ts.timestamp()) - TREND_X_EPOCH
        y = round(r.value * 100)
        a = acc.setdefault(r.user_id, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += x * y
        a[2] += x
        a[3] += y
        a[4] += x * x
    want = {}
    for sid, (n, sxy, sx, sy, sxx) in acc.items():
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if n >= 2 and den > 0:
            want[sid] = (n, num, den)
    got = {
        r.sensor_id: (r.n_readings, int(r.slope_num), int(r.slope_den))
        for r in sensor_trend_ols(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert got


def test_dense_gate_vocab_cap_returns_none_for_both_callers(spark, monkeypatch):
    """_dense_shingle_matrix must hand the problem BACK to the
    distributed plan when the caller's f32-exactness vocab cap is
    exceeded — for both callers, whose caps differ (review r8: the
    caps derive from each threshold's integer coefficients, so the
    shared helper must honor the caller's own bound, not a baked-in
    one)."""
    from bigdata_riveranalysis_spark.plans import llmdata as LD

    rows = [(1, ["a b", "b c"]), (2, ["b c", "c d"])]
    sh = spark.createDataFrame(rows, "doc_id long, s array<string>")
    # generous caps: local paths engage
    assert LD._containment_local(spark, sh, df_cap=10) is not None
    assert LD._jaccard_local(spark, sh, df_cap=10) is not None
    # cap below the 3-gram vocab: both decline and defer
    assert LD._dense_shingle_matrix(sh, 10, vocab_cap=2) is None
    monkeypatch.setattr(LD, "_CONTAINMENT_VOCAB_CAP", 2)
    monkeypatch.setattr(LD, "_JACCARD_VOCAB_CAP", 2)
    assert LD._containment_local(spark, sh, df_cap=10) is None
    assert LD._jaccard_local(spark, sh, df_cap=10) is None
