"""Property-based spot checks (SURVEY.md §5 item 4).

Hypothesis generates the data; Spark runs the operator; the property
is an algebraic invariant, not a golden value. Example counts are
kept small — each example is a Spark job.
"""

from __future__ import annotations

import json
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_riveranalysis_spark.functions import text as TX
from bigdata_riveranalysis_spark.operators.river_pipeline import parse_readings

# SPARK_GRAFT_HYP_EXAMPLES raises the example budget for release
# sweeps (each example is a Spark job, so the default stays small;
# the r7 release pass ran the suite at 60 examples/property).
import os as _os

SETTINGS = settings(
    max_examples=int(_os.environ.get("SPARK_GRAFT_HYP_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.text(alphabet="abcdefg", min_size=1, max_size=4)
docs = st.lists(words, min_size=3, max_size=12)


@SETTINGS
@given(doc=docs)
def test_minhash_is_token_order_invariant_under_set_equality(spark, doc):
    """Two docs with the same shingle *set* get the same signature —
    min over a set is order-free. Build the second doc by rotating the
    shingle array (array_distinct preserves set identity)."""
    text = " ".join(doc)
    df = spark.createDataFrame([(text,)], "text string")
    sh = F.array_distinct(TX.word_shingles(TX.tokens("text"), 2))
    sig = df.select(
        TX.minhash_value(TX.minhash_base(sh), 0).alias("a"),
        TX.minhash_value(TX.minhash_base(F.reverse(sh)), 0).alias("b"),
    ).collect()[0]
    assert sig.a == sig.b


@SETTINGS
@given(rows=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3)), min_size=1, max_size=30))
def test_dedup_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "k int, v int")
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # and the key set equals Python's set()
    assert {tuple(r) for r in once.collect()} == set(rows)


@SETTINGS
@given(garbage=st.text(max_size=40))
def test_parse_readings_never_throws_on_garbage(spark, garbage):
    """PERMISSIVE wire contract: arbitrary bytes parse to a (possibly
    all-NULL) typed row, never an exception (SURVEY.md §1.3)."""
    raw = spark.createDataFrame([(garbage,)], "value string")
    rows = parse_readings(raw).collect()
    assert len(rows) == 1  # one in, one out


@SETTINGS
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 3), st.floats(-100, 100, allow_nan=False)),
        min_size=1,
        max_size=25,
    )
)
def test_topk_with_tiebreak_is_deterministic(spark, vals):
    """SURVEY.md §7 watch-list #4: ranked queries carry a unique
    trailing tie-break, so two runs (different partitioning) agree."""
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(vals)], "uid long, k int, v double"
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("k").orderBy(F.desc("v"), F.asc("uid"))
    top = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    a = sorted(map(tuple, top.collect()))
    b = sorted(map(tuple, top.repartition(7).withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2).collect()))
    assert a == b


@SETTINGS
@given(doc=st.text(alphabet="ab cd", min_size=0, max_size=60))
def test_simhash_fits_bit_width(spark, doc):
    """Also differential: the codegen groupBy formulation
    (_simhash_frame, the hot path) must equal the scalar array-lambda
    reference (_simhash_col) on arbitrary text."""
    from bigdata_riveranalysis_spark.plans.llmdata import (
        SIMHASH_BITS,
        _simhash_col,
        _simhash_frame,
    )

    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    h = df.select(_simhash_col(TX.tokens("text")).alias("h")).collect()[0].h
    assert 0 <= h < (1 << SIMHASH_BITS)
    h2 = _simhash_frame(df).collect()[0].simhash
    assert h2 == h


@SETTINGS
@given(
    vals=st.lists(st.floats(0.1, 50, allow_nan=False), min_size=2, max_size=8),
)
def test_json_roundtrip_props(spark, vals):
    """to_json ∘ from_json is identity on the events props shape."""
    payload = [json.dumps({"k": int(v)}) for v in vals]
    df = spark.createDataFrame([(p,) for p in payload], "props string")
    rt = df.select(
        "props",
        F.to_json(F.from_json("props", "struct<k:int>")).alias("back"),
    ).collect()
    for r in rt:
        assert json.loads(r.props) == json.loads(r.back)


def test_jaccard_local_and_distributed_plans_agree(spark):
    """dedup_ngram_jaccard's cost-based strategy switch is physical
    only: forcing the distributed inverted-index plan must give the
    exact same pairs as the local dense path (sf0.001 corpus)."""
    from bigdata_riveranalysis_spark.plans import llmdata as L

    fn = L.dedup_ngram_jaccard
    sf = "/root/testdata/sf0.001"
    local = sorted(map(tuple, fn(spark, sf).collect()))
    saved = L.JACCARD_LOCAL_MAX_DOCS
    try:
        L.JACCARD_LOCAL_MAX_DOCS = 0
        dist = sorted(map(tuple, fn(spark, sf).collect()))
    finally:
        L.JACCARD_LOCAL_MAX_DOCS = saved
    assert local == dist
    assert local, "sf0.001 corpus should contain at least one near-dup pair"


def test_simhash_local_and_distributed_plans_agree(spark):
    """dedup_simhash's doc-count gate is physical only: forcing the
    exploded segment-join plan (first-matching-segment dedup rule)
    must give the exact same pairs as the local tiled scan."""
    from bigdata_riveranalysis_spark.plans import llmdata as L

    fn = L.dedup_simhash
    sf = "/root/testdata/sf0.001"
    local = sorted(map(tuple, fn(spark, sf).collect()))
    saved = L.SIMHASH_LOCAL_MAX_DOCS
    try:
        L.SIMHASH_LOCAL_MAX_DOCS = 0
        dist = sorted(map(tuple, fn(spark, sf).collect()))
    finally:
        L.SIMHASH_LOCAL_MAX_DOCS = saved
    assert local == dist
    assert local, "sf0.001 corpus should contain at least one simhash near-dup pair"


def test_simhash_local_segment_scan_and_tiled_fallback_agree(spark):
    """_simhash_pairs_local's candidate-budget switch is physical
    only: forcing the bounded tiled all-pairs fallback (budget = 0)
    must give the exact same pairs as the segment-run candidate
    scan."""
    from bigdata_riveranalysis_spark.plans import llmdata as L

    fn = L.dedup_simhash
    sf = "/root/testdata/sf0.001"
    fast = sorted(map(tuple, fn(spark, sf).collect()))
    saved = L.SIMHASH_LOCAL_CAND_ROWS
    try:
        L.SIMHASH_LOCAL_CAND_ROWS = 0  # any candidate run → tiled fallback
        tiled = sorted(map(tuple, fn(spark, sf).collect()))
    finally:
        L.SIMHASH_LOCAL_CAND_ROWS = saved
    assert fast == tiled
    assert fast, "sf0.001 corpus should contain at least one simhash near-dup pair"


def test_components_local_and_distributed_plans_agree(spark):
    """dedup_cluster_components' edge-count gate is physical only:
    forcing the distributed min-label-propagation loop must produce
    the identical (doc_id, canonical_id, component_size) labeling as
    the driver union-find."""
    from bigdata_riveranalysis_spark.plans import llmdata as L

    fn = L.dedup_cluster_components
    sf = "/root/testdata/sf0.001"
    local = sorted(map(tuple, fn(spark, sf).collect()))
    saved = L.COMPONENTS_LOCAL_MAX_EDGES
    ran_dist = []
    orig_dist = L._components_distributed
    try:
        # The labeling is memoized per corpus (r13): clear it so the
        # re-gated run actually rebuilds, and spy the distributed
        # entrypoint so this test can never pass vacuously off a
        # memoized (or mis-gated) result.
        L.clear_index_memo()
        L.COMPONENTS_LOCAL_MAX_EDGES = 0
        L._components_distributed = lambda pairs: (
            ran_dist.append(True),
            orig_dist(pairs),
        )[1]
        dist = sorted(map(tuple, fn(spark, sf).collect()))
    finally:
        L.COMPONENTS_LOCAL_MAX_EDGES = saved
        L._components_distributed = orig_dist
        L.clear_index_memo()  # drop the gate-0 labeling from the memo
    assert ran_dist, "the distributed min-label path must actually run"
    assert local == dist
    assert local, "sf0.001 corpus should contain at least one near-dup cluster"


def test_embedding_cosine_broadcast_and_blockgrid_agree(spark):
    """dedup_embedding_cosine's gate is physical only: forcing the
    block-grid (no-collect) path with tiny blocks must give the exact
    same pairs as the broadcast path (sf0.001 corpus)."""
    from bigdata_riveranalysis_spark.plans import llmdata as L

    fn = L.dedup_embedding_cosine
    sf = "/root/testdata/sf0.001"
    bcast = sorted(map(tuple, fn(spark, sf).collect()))
    saved = (L.EMBED_LOCAL_MAX_BYTES, L.EMBED_BLOCK_ROWS)
    try:
        L.EMBED_LOCAL_MAX_BYTES = 0
        L.EMBED_BLOCK_ROWS = 7  # force a multi-block grid w/ off-diagonal tiles
        grid = sorted(map(tuple, fn(spark, sf).collect()))
    finally:
        L.EMBED_LOCAL_MAX_BYTES, L.EMBED_BLOCK_ROWS = saved
    assert bcast == grid
    assert bcast, "sf0.001 embeddings should contain at least one near-dup pair"


def test_embedding_gate_prices_bytes_not_rows(spark, tmp_path):
    """The collect-gate is byte-denominated: a HIGH-DIM corpus with a
    tiny ROW count must still route to the distributed block-grid once
    its dense bytes exceed the budget (a row-count gate would collect
    it). 8 rows × dim 4096 float32 ≈ 131 KB column bytes → ~262 KB
    dense float64 estimate."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_riveranalysis_spark.plans import llmdata as L
    from bigdata_riveranalysis_spark.sources.tables import table_column_bytes

    rng = np.random.default_rng(7)
    n, dim = 8, 4096
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array(
                [rng.normal(size=dim).astype(np.float32) for _ in range(n)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(np.zeros(n, dtype=np.int32), type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    sf_dir = str(tmp_path)

    col_bytes = table_column_bytes(sf_dir, "embeddings", "embedding")
    assert col_bytes >= n * dim * 4  # uncompressed data + level overhead

    saved = L.EMBED_LOCAL_MAX_BYTES
    try:
        L.EMBED_LOCAL_MAX_BYTES = 200_000  # < 2×col_bytes, yet ≫ 8 "rows"
        plan = L.dedup_embedding_cosine(spark, sf_dir)._jdf.queryExecution().toString()
        assert "FlatMapGroupsInPandas" in plan  # block-grid tile path
        assert "MapInPandas" not in plan.replace("FlatMapGroupsInPandas", "")
        L.EMBED_LOCAL_MAX_BYTES = 10 * 1024 * 1024  # comfortably above
        plan = L.dedup_embedding_cosine(spark, sf_dir)._jdf.queryExecution().toString()
        assert "MapInPandas" in plan  # broadcast path
    finally:
        L.EMBED_LOCAL_MAX_BYTES = saved


@SETTINGS
@given(
    toks=st.lists(st.integers(1, 40), min_size=1, max_size=30),
)
def test_seq_pack_exclusive_cumsum_invariants(spark, toks):
    """Greedy packing on arbitrary doc sizes: bins contiguous from 0
    when no doc exceeds the budget gap, every doc lands in exactly one
    bin, and a non-final bin always holds ≥ budget − max_doc tokens."""
    from pyspark.sql import Window as W

    budget = 64
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(toks)], "doc_id long, source string, n_tok int"
    )
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    binned = df.select(
        "n_tok", F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / budget).alias("bin")
    )
    rows = binned.groupBy("bin").agg(
        F.count("*").alias("n"), F.sum("n_tok").alias("tok")
    ).collect()
    assert sum(r.n for r in rows) == len(toks)  # partition, no loss
    bins = sorted(r.bin for r in rows)
    assert bins == list(range(len(bins)))  # contiguous (max tok 40 < budget 64)
    last = max(bins)
    for r in rows:
        if r.bin != last:
            assert r.tok >= budget - max(toks)


@SETTINGS
@given(n=st.integers(1, 400))
def test_hash_split_partitions_and_is_stable(spark, n):
    """The hash split's Spark assignments must equal an independent
    Python re-derivation of md5-bucket membership for EVERY id — a
    real oracle, not just "counts sum to n" (which any when/otherwise
    chain satisfies; review finding flagged the old form vacuous)."""
    import hashlib as _hl

    from bigdata_riveranalysis_spark.plans import traindata as TD

    df = spark.range(0, n).select(F.col("id").cast("string").alias("k"))
    b = TX.hash32(F.col("k")) % 100
    split = (
        F.when(b < TD.SPLIT_TRAIN_END, "train")
        .when(b < TD.SPLIT_VAL_END, "val")
        .otherwise("test")
    )
    got = {r.k: r.s for r in df.select("k", split.alias("s")).collect()}

    def want(k: str) -> str:
        bucket = int(_hl.md5(k.encode()).hexdigest()[:8], 16) % 100
        if bucket < TD.SPLIT_TRAIN_END:
            return "train"
        return "val" if bucket < TD.SPLIT_VAL_END else "test"

    assert got == {str(i): want(str(i)) for i in range(n)}


@SETTINGS
@given(
    cents_vals=st.lists(st.integers(-(10**7), 10**7), min_size=1, max_size=40),
)
def test_exact_avg_and_sum_round4_match_rational_ground_truth(spark, cents_vals):
    """functions.exact's integer formulations must equal the
    mathematical definition — round-half-up(avg, 4) / round(sum, 4)
    computed with exact rational arithmetic — AND the DuckDB SQL twin
    must produce the identical double, on arbitrary 2-decimal data
    (positive and negative)."""
    import duckdb as _duck
    from fractions import Fraction

    from bigdata_riveranalysis_spark.functions import exact as EX

    vals = [c / 100 for c in cents_vals]
    n = len(cents_vals)

    # Ground truth via exact rationals.
    s = sum(cents_vals)
    want_sum = float(Fraction(s, 100))
    a = Fraction(s, 100 * n)  # true average
    want_avg = float((a * 10**4 + Fraction(1, 2)).__floor__()) / 10**4

    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = df.agg(
        EX.sum2to4_exact("value").alias("s"),
        EX.avg2to4_exact("value").alias("a"),
    ).collect()[0]
    assert got.s == want_sum
    assert got.a == want_avg

    rel = _duck.sql(
        f"""
        SELECT {EX.sum_round4_sql(EX.cents_sql('value'), 2)} AS s,
               {EX.avg_round4_sql(EX.cents_sql('value'), 2)} AS a
        FROM (SELECT unnest({vals!r}) AS value)
        """
    ).fetchall()[0]
    assert rel[0] == want_sum
    assert rel[1] == want_avg


@SETTINGS
@given(
    ints=st.lists(st.integers(-(10**13), 10**13), min_size=1, max_size=30),
)
def test_exact_round4_scale6_matches_rational_ground_truth(spark, ints):
    """The scale>4 branch (used by q1's sum_charge, a scale-6 integer
    product) must also equal rational round-half-up ground truth in
    both engines, including negative sums."""
    import duckdb as _duck
    from fractions import Fraction

    from bigdata_riveranalysis_spark.functions import exact as EX
    from pyspark.sql import functions as F

    n = len(ints)
    s = sum(ints)
    want_sum = float((Fraction(s, 10**6) * 10**4 + Fraction(1, 2)).__floor__()) / 10**4
    a = Fraction(s, n * 10**6)
    want_avg = float((a * 10**4 + Fraction(1, 2)).__floor__()) / 10**4

    df = spark.createDataFrame([(v,) for v in ints], "e long")
    got = df.agg(
        EX.sum_round4(F.col("e"), 6).alias("s"),
        EX.avg_round4(F.col("e"), 6).alias("a"),
    ).collect()[0]
    assert got.s == want_sum
    assert got.a == want_avg

    rel = _duck.sql(
        f"""
        SELECT {EX.sum_round4_sql('e', 6)} AS s,
               {EX.avg_round4_sql('e', 6)} AS a
        FROM (SELECT unnest({ints!r}) AS e)
        """
    ).fetchall()[0]
    assert rel[0] == want_sum
    assert rel[1] == want_avg


def test_short_doc_guards_match_oracle(spark, tmp_path):
    """The word-shingle guards (docs with < n tokens) are never
    exercised by the generated corpora — every fixture doc is long.
    Build a documents table of degenerate docs (empty, 1-2 tokens,
    repetitive loops) and pin Spark == DuckDB for the shingle-bearing
    doc queries, so a fixture regeneration with short docs can't
    surface a divergence (e.g. Spark sequence() auto-steps -1 on
    descending ranges where DuckDB range() is empty)."""
    import duckdb

    import pandas as pd

    from bigdata_riveranalysis_spark.plans.registry import REGISTRY

    from .test_oracle_diff import _canon_rows

    docs = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": [
                "",
                "one",
                "two words",
                "three word doc",
                "a a a a a a",
                "x y x y x y x y",
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog",
            ],
            "lang": ["en"] * 8,
            "source": ["src0", "src1"] * 4,
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    path = tmp_path / "documents.parquet"
    docs.to_parquet(path, index=False)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    for name in ("text_repetition_stats", "dedup_ngram_jaccard",
                 "minhash_signatures", "dedup_incremental_minhash",
                 "minhash_estimate_error", "ngram_topk_corpus",
                 "docs_quality_funnel", "docs_length_histogram"):
        # lookup, not REGISTRY[...]: minhash_signatures is retired
        # (r9 cap policy) but keeps this planted-corpus check too.
        from bigdata_riveranalysis_spark.plans.registry import lookup

        q = lookup(name)
        sdf = q.fn(spark, str(tmp_path))
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
        rel = con.execute(q.oracle)
        d_cols = [d[0] for d in rel.description]
        d_rows = rel.fetchall()
        assert sorted(s_cols) == sorted(d_cols), name
        assert _canon_rows(s_cols, s_rows) == _canon_rows(d_cols, d_rows), name


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12),
        min_size=1,
        max_size=10,
    ),
    cap=st.integers(1, 10),
)
def test_jaccard_local_matches_set_arithmetic(spark, docs, cap):
    """_jaccard_local's factorize + f32 blocked matmul + multiply-form
    threshold must equal plain Python set arithmetic (with the df-cap
    applied) on arbitrary tiny corpora — including empty sets, full
    duplicates, and caps that zero out every gram."""
    from bigdata_riveranalysis_spark.plans.llmdata import (
        JACCARD_THRESHOLD,
        _jaccard_local,
    )

    rows = [(i, sorted(set(d))) for i, d in enumerate(docs)]
    sh = spark.createDataFrame(rows, "doc_id long, s array<string>")
    out = _jaccard_local(spark, sh, cap)
    assert out is not None  # tiny inputs never exceed the dense gates
    got = {(r.doc_a, r.doc_b): r.jaccard for r in out.collect()}

    from collections import Counter

    dfc = Counter(g for _, s in rows for g in s)
    sets = {i: {g for g in s if dfc[g] <= cap} for i, s in rows}
    want = {}
    for i in sets:
        for j in sets:
            if i < j:
                union = sets[i] | sets[j]
                inter = sets[i] & sets[j]
                if union and len(inter) / len(union) >= JACCARD_THRESHOLD:
                    # Half-AWAY expectation (floor(x·10⁴ + 0.5)) to match
                    # the engine/oracle convention — Python round() is
                    # half-even and diverges on dyadic boundaries (17/32).
                    j_val = len(inter) / len(union)
                    want[(i, j)] = math.floor(j_val * 1e4 + 0.5) / 1e4
    assert got == want


@SETTINGS
@given(
    v=st.integers(0, 10**14),
    scale=st.sampled_from([0, 2, 4, 5, 6]),
)
def test_val_round4_matches_rational_ground_truth(spark, v, scale):
    """val_round4 (single-value scalar identity, r6) equals rational
    round-half-up(v/10^scale, 4) and its SQL twin produces the
    identical double — including the half-boundary 5th-decimal values
    where raw round(v/10^s, 4) diverges between engines."""
    import duckdb as _duck
    from fractions import Fraction

    from bigdata_riveranalysis_spark.functions import exact as EX

    want = float((Fraction(v, 10**scale) * 10**4 + Fraction(1, 2)).__floor__()) / 10**4
    df = spark.createDataFrame([(v,)], "x long")
    got = df.select(EX.val_round4(F.col("x"), scale).alias("r")).collect()[0].r
    assert got == want, (v, scale)
    rel = _duck.sql(f"SELECT {EX.val_round4_sql(str(v), scale)} AS r").fetchall()[0][0]
    assert rel == want, (v, scale)


@SETTINGS
@given(
    s=st.integers(0, 10**12),
    n=st.integers(1, 10**9),
)
def test_ratio_round4_matches_rational_ground_truth(spark, s, n):
    """ratio_round4 at scale 0 (the repo-wide integer-ratio policy)
    equals rational round-half-up(s/n, 4) on both engines — immune to
    the terminating-decimal tie class (denominators with factor 5)
    that flips raw double rounding."""
    import duckdb as _duck
    from fractions import Fraction

    from bigdata_riveranalysis_spark.functions import exact as EX

    want = float((Fraction(s, n) * 10**4 + Fraction(1, 2)).__floor__()) / 10**4
    df = spark.createDataFrame([(s, n)], "s long, n long")
    got = df.select(EX.ratio_round4(F.col("s"), F.col("n"), 0).alias("r")).collect()[0].r
    assert got == want, (s, n)
    rel = _duck.sql(
        f"SELECT {EX.ratio_round4_sql(str(s), str(n), 0)} AS r"
    ).fetchall()[0][0]
    assert rel == want, (s, n)


def test_ratio_round4_closes_the_tie_class(spark):
    """The concrete knife-edge family: quotients like 27/160 = 0.16875
    (terminating, 5th digit 5, NOT binary-representable) where
    round(double, 4) rounds DOWN on the binary value but true half-up
    goes UP — the exact class the r6 sf0.1 sweep caught in the wild."""
    from fractions import Fraction

    from bigdata_riveranalysis_spark.functions import exact as EX

    cases = [(27, 160), (7, 32000), (1653_21745, 100000), (3, 1600)]
    rows = spark.createDataFrame(cases, "s long, n long").select(
        "s", "n", EX.ratio_round4(F.col("s"), F.col("n"), 0).alias("r")
    ).collect()
    for r in rows:
        want = float((Fraction(r.s, r.n) * 10**4 + Fraction(1, 2)).__floor__()) / 10**4
        assert r.r == want, (r.s, r.n, r.r, want)


def test_round4_sql_twins_survive_wide_numerators(spark):
    """Regression for the r6 red: DuckDB evaluated 20000·S in S's own
    integer width, so ratio_round4_sql raised "Overflow in
    multiplication of INT32" at the hypothesis counterexample
    (s=107375, n=1) while the Spark twin widened to DECIMAL(38,0).
    All four SQL twins now CAST AS HUGEINT before the literal
    multiply; pin the concrete counterexample plus ≥10^12-scale
    numerators (where even an INT64 product 2·10^4·S would wrap) on
    BOTH engines against rational ground truth."""
    import duckdb as _duck
    from fractions import Fraction

    from bigdata_riveranalysis_spark.functions import exact as EX

    cases = [
        (107375, 1),            # the judge-reproduced INT32 counterexample
        (10**12, 1),            # top of the hypothesis strategy range
        (10**12 + 7, 3),
        (922_337_203_685_477, 5),  # 2e4·S overflows INT64, needs HUGEINT
        (10**14, 10**9),
    ]
    for s, n in cases:
        want = float((Fraction(s, n) * 10**4 + Fraction(1, 2)).__floor__()) / 10**4
        rel = _duck.sql(
            f"SELECT {EX.ratio_round4_sql(str(s), str(n), 0)} AS r"
        ).fetchall()[0][0]
        assert rel == want, ("ratio_sql", s, n, rel, want)
        df = spark.createDataFrame([(s, n)], "s long, n long")
        got = df.select(
            EX.ratio_round4(F.col("s"), F.col("n"), 0).alias("r")
        ).collect()[0].r
        assert got == want, ("ratio_spark", s, n, got, want)

    # val/sum/avg twins: same narrow-literal-multiply class.
    for v in (107375, 10**12, 922_337_203_685_477):
        want = float(v) / 1.0
        for scale in (0, 6):
            w = float(
                (Fraction(v, 10**scale) * 10**4 + Fraction(1, 2)).__floor__()
            ) / 10**4
            rel = _duck.sql(
                f"SELECT {EX.val_round4_sql(str(v), scale)} AS r"
            ).fetchall()[0][0]
            assert rel == w, ("val_sql", v, scale, rel, w)
            rel = _duck.sql(
                f"SELECT {EX.sum_round4_sql('x', scale)} AS r"
                f" FROM (SELECT CAST({v} AS BIGINT) AS x)"
            ).fetchall()[0][0]
            assert rel == w, ("sum_sql", v, scale, rel, w)
            rel = _duck.sql(
                f"SELECT {EX.avg_round4_sql('x', scale)} AS r"
                f" FROM (SELECT CAST({v} AS BIGINT) AS x)"
            ).fetchall()[0][0]
            assert rel == w, ("avg_sql", v, scale, rel, w)
            gotv = spark.createDataFrame([(v,)], "x long").select(
                EX.val_round4(F.col("x"), scale).alias("r")
            ).collect()[0].r
            assert gotv == w, ("val_spark", v, scale, gotv, w)


# ---------------------------------------------------------------------------
# r8 formulations: skyline and gaps-and-islands vs brute-force references
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=20
    )
)
def test_skyline_window_formulation_equals_bruteforce(spark, pts):
    """The sorted running-max skyline (part_frontier_by_brand's
    formulation) must equal the O(n²) dominance definition: keep p iff
    no q has price ≤ AND size ≥ with one strict — on arbitrary point
    sets including duplicates and full ties."""
    from pyspark.sql import Window as W

    distinct = sorted(set(pts))
    brute = {
        p
        for p in distinct
        if not any(
            q != p and q[0] <= p[0] and q[1] >= p[1] for q in distinct
        )
    }
    df = (
        spark.createDataFrame(pts, "price_c long, size long")
        .groupBy("price_c", "size")
        .agg(F.count("*").alias("n"))
    )
    w = (
        W.partitionBy(F.lit(1))
        .orderBy(F.asc("price_c"), F.desc("size"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    sky = df.withColumn("mx", F.max("size").over(w)).filter(
        F.col("mx").isNull() | (F.col("mx") < F.col("size"))
    )
    got = {(r["price_c"], r["size"]) for r in sky.collect()}
    assert got == brute


@SETTINGS
@given(mis=st.sets(st.integers(0, 30), min_size=1, max_size=15))
def test_streak_islands_equal_python_reference(spark, mis):
    """mi − dense_rank islands must reproduce the run-length structure
    of any month set: longest run, total actives, and run count."""
    from pyspark.sql import Window as W

    s = sorted(mis)
    runs, cur = [], 1
    for a, b in zip(s, s[1:]):
        if b == a + 1:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    df = spark.createDataFrame([(1, m) for m in s], "k long, mi long")
    w = W.partitionBy("k").orderBy("mi")
    out = (
        df.withColumn("grp", F.col("mi") - F.dense_rank().over(w))
        .groupBy("k", "grp")
        .agg(F.count("*").alias("len"))
        .groupBy("k")
        .agg(
            F.max("len").alias("longest"),
            F.sum("len").alias("active"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    assert out["longest"] == max(runs)
    assert out["active"] == len(s)
    assert out["n"] == len(runs)


@SETTINGS
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=7), min_size=1, max_size=5)
)
def test_interleave_closed_form_equals_definitional_enumeration(spark, sizes):
    """docs_interleave_schedule's arithmetic position — pos(d, r) =
    Σ_d' min(s(d'), r−1) + |{d' ≤ d : s(d') ≥ r}| — must equal the
    definitional round-robin enumeration for ARBITRARY unequal domain
    sizes, not just the fixture's. Random size vectors; the engine
    runs on a synthesized frame; the reference is a four-line Python
    deal loop."""
    rows = []
    for di, sz in enumerate(sizes):
        dom = f"d{di}"
        rows += [(dom, i) for i in range(sz)]
    df = spark.createDataFrame(rows, "domain string, doc_id long")

    from pyspark.sql import Window as W

    r = df.withColumn(
        "round_no", F.row_number().over(W.partitionBy("domain").orderBy("doc_id"))
    )
    sz_tbl = (
        df.groupBy("domain")
        .agg(F.count("*").alias("sz"))
        .agg(F.array_sort(F.collect_list(F.struct("domain", "sz"))).alias("ds"))
    )
    rn, dom = F.col("round_no"), F.col("domain")
    pos = F.aggregate(
        "ds",
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.least(s["sz"], rn.cast("long") - 1)
        + F.when((s["sz"] >= rn) & (s["domain"] <= dom), 1).otherwise(0),
    )
    got = {
        (r_.domain, r_.doc_id): r_.pos
        for r_ in r.join(F.broadcast(sz_tbl)).select("domain", "doc_id", pos.alias("pos")).collect()
    }

    # definitional deal loop
    remaining = {f"d{i}": s for i, s in enumerate(sizes)}
    want, p, rnd = {}, 0, 1
    while any(v >= rnd for v in remaining.values()):
        for d in sorted(remaining):
            if remaining[d] >= rnd:
                p += 1
                want[(d, rnd - 1)] = p
        rnd += 1
    assert got == want


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12),
        min_size=1,
        max_size=10,
    ),
    cap=st.integers(1, 10),
)
def test_containment_local_matches_set_arithmetic(spark, docs, cap):
    """_containment_local's shared dense setup + in-place OR-form
    threshold (q·c ≥ p·|A| OR q·c ≥ p·|B| ⟺ q·c ≥ p·min) must equal
    plain Python set arithmetic (with the df-cap applied) on
    arbitrary tiny corpora — including empty sets (the min > 0
    survivor guard), full duplicates, and caps that zero out every
    gram. The jaccard twin's property, for the r8 in-place rewrite."""
    from bigdata_riveranalysis_spark.plans.llmdata import (
        _CONT_P,
        _CONT_Q,
        _containment_local,
    )

    rows = [(i, sorted(set(d))) for i, d in enumerate(docs)]
    sh = spark.createDataFrame(rows, "doc_id long, s array<string>")
    out = _containment_local(spark, sh, cap)
    assert out is not None  # tiny inputs never exceed the dense gates
    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.containment) for r in out.collect()
    }

    from collections import Counter

    dfc = Counter(g for _, s in rows for g in s)
    sets = {i: {g for g in s if dfc[g] <= cap} for i, s in rows}
    want = {}
    for i in sets:
        for j in sets:
            if i < j:
                mn = min(len(sets[i]), len(sets[j]))
                c = len(sets[i] & sets[j])
                if mn > 0 and _CONT_Q * c >= _CONT_P * mn:
                    # the exact half-up floor identity at scale 0
                    want[(i, j)] = (c, (20000 * c + mn) // (2 * mn) / 1e4)
    assert got == want
