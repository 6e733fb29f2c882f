"""Pattern-mining and sequence analytics (round 6 coverage growth).

Four operator families the reference's analytics ambitions (README's
promised layer; SURVEY.md §0) imply but no earlier round covered:
market-basket association mining, Markov/sequence transition
analysis, inter-arrival (tempo) statistics, and per-document keyword
extraction. Every query is integer-exact or single-division rounded
(registry conventions) and carries its DuckDB oracle.

Scale postures, module-wide:
  * basket pairs are generated per-basket (equi-join on the basket
    key), so the quadratic term is bounded by basket size k (≈4-7
    items), never by catalog size — the distributed first pass of
    Apriori; min-support prunes before any join-back.
  * sequence windows partition by user — millions of parallel groups,
    no global window anywhere.
  * keyword ranking partitions by doc; document-frequency comes from
    one distinct-pairs aggregate, broadcast back only at dictionary
    (vocabulary) size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bigdata_riveranalysis_spark.functions import exact as EX
from bigdata_riveranalysis_spark.functions import text as TX
from bigdata_riveranalysis_spark.plans.registry import query
from bigdata_riveranalysis_spark.sources.tables import load_table

#: Minimum co-occurrence count for a part pair to be reported.
BASKET_MIN_SUPPORT = 3

#: Keywords reported per document.
KEYWORDS_PER_DOC = 3


@query(
    "basket_part_pairs",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM lineitem),
    cnt AS (SELECT l_partkey, count(*) AS c FROM items GROUP BY l_partkey),
    p AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
        FROM items a
        JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {BASKET_MIN_SUPPORT}
    )
    SELECT p.part_a, p.part_b, p.n_ab,
           ca.c AS n_a, cb.c AS n_b,
           round(p.n_ab / (1.0 * ca.c), 4) AS confidence,
           round((p.n_ab * nb.n_baskets) / (1.0 * ca.c * cb.c), 4) AS lift
    FROM p
    CROSS JOIN nb
    JOIN cnt ca ON ca.l_partkey = p.part_a
    JOIN cnt cb ON cb.l_partkey = p.part_b
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over lineitem: part pairs
    co-ordered in ≥ BASKET_MIN_SUPPORT orders, with confidence
    P(b|a) and lift P(a,b)/(P(a)P(b)) — the Apriori/FP-growth first
    pass every recommender bootstrap runs.

    Exactness: counts are integers; confidence and lift are each ONE
    division whose integer operands (n_ab·n_baskets stays far under
    2^53) are identical on both engines, so round4 cannot diverge.
    Pair orientation part_a < part_b is total, no tie ambiguity.

    Scale: pairs are generated PER BASKET from its sorted distinct
    item array (collect_set → array_sort → a higher-order-function
    pair expansion, all JVM-side) — k·(k−1)/2 pairs where k is the
    basket's OWN item count (≈4-7 here), so the blow-up is Σk²,
    linear in baskets for bounded baskets; a degenerate mega-basket
    is the skew case and gets capped/salted upstream. This shape is
    one shuffle (basket groupBy) + one pair aggregate — the
    self-join-on-basket-key formulation costs two extra exchanges for
    the same output (measured 2.4 s → see BENCH). Per-item counts and
    the 1-row basket total are dictionary-sized → broadcast joins;
    min-support prunes before the join-back. Never an all-pairs
    catalog product.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # One materialization feeds all three consumers (pair expansion,
    # item counts, basket total) — without it each aggregate re-runs
    # the fact scan + basket shuffle (same localCheckpoint discipline
    # as dedup_cluster_components; the basket table is one row per
    # order, far smaller than the fact input).
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .localCheckpoint()
    )
    nb = baskets.agg(F.count("*").alias("n_baskets"))
    cnt = baskets.select(F.explode("parts").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count("*").alias("c"))
    # pair expansion: for item i, pair it with every later item j>i of
    # the sorted array — orientation part_a < part_b falls out of the
    # sort, no post-filter needed.
    pair_expr = F.explode(
        F.flatten(
            F.transform(
                "parts",
                lambda x, i: F.transform(
                    F.slice("parts", i + 2, F.size("parts")),
                    lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
                ),
            )
        )
    )
    pairs = (
        baskets.select(pair_expr.alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= BASKET_MIN_SUPPORT)
    )
    ca = cnt.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("n_a"))
    cb = cnt.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(F.col("n_ab") / (F.lit(1.0) * F.col("n_a")), 4).alias("confidence"),
            F.round(
                (F.col("n_ab") * F.col("n_baskets"))
                / (F.lit(1.0) * F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    t AS (
        SELECT event_type AS from_type, next_type AS to_type,
               count(*) AS n_transitions
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           round(n_transitions
                 / (1.0 * sum(n_transitions) OVER (PARTITION BY from_type)),
                 4) AS share
    FROM t
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (from_type → to_type) edge, the transition
    count and its row-normalized share — the funnel/journey model
    behind next-action prediction and anomalous-flow detection.

    Order within a user is (ts, event_id) — the unique tie-break the
    registry requires, since simultaneous-timestamp events otherwise
    make lead() nondeterministic. Share is one division of exact
    integers (identical operands both engines) → round4 stable.

    Scale: the sequence window partitions by user_id — millions of
    independent groups, one shuffle; the transition aggregate reduces
    to |event_types|² rows with map-side partials; the normalizing
    window runs over that tiny matrix, partitioned by from_type.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n_transitions"))
    wrow = W.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / (F.lit(1.0) * F.sum("n_transitions").over(wrow)), 4
        ).alias("share"),
    )


@query(
    "events_interarrival_user",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT user_id,
           count(gap_us)       AS n_gaps,
           {EX.avg_round4_sql("gap_us", 6)} AS avg_gap_s,
           round(min(gap_us) / 1000000.0, 4) AS min_gap_s,
           round(max(gap_us) / 1000000.0, 4) AS max_gap_s
    FROM gaps
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def events_interarrival_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival tempo: count, mean, min and max gap (in
    seconds) between consecutive events — the activity-cadence
    feature behind bot detection and engagement scoring.

    Gaps are computed on EXACT integer microseconds (unix_micros /
    epoch_us — the fixtures carry sub-second components, so
    second-resolution arithmetic would alias), the mean via the
    integer-exact avg_round4 identity at scale 6, and min/max are
    element picks divided once — identical operands both engines.

    Scale: one per-user window (partitioned, no global anything) and
    one per-user aggregate that reuses the same hash partitioning —
    AQE collapses this to a single effective shuffle of the events
    scan.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        EX.avg_round4(F.col("gap_us"), 6).alias("avg_gap_s"),
        F.round(F.min("gap_us") / F.lit(1000000.0), 4).alias("min_gap_s"),
        F.round(F.max("gap_us") / F.lit(1000000.0), 4).alias("max_gap_s"),
    )


@query(
    "docs_keyword_tf",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({TX.TOKENS_SQL.format(c="text")}) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM tok WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tf) GROUP BY term),
    ranked AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               row_number() OVER (PARTITION BY tf.doc_id
                                  ORDER BY tf.tf DESC, tf.term) AS rnk
        FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, tf, df, rnk
    FROM ranked WHERE rnk <= {KEYWORDS_PER_DOC}
    """,
)
def docs_keyword_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the top-K terms by term
    frequency with their corpus document frequency attached — the
    integer-exact core of TF-IDF keywording. The idf WEIGHT itself
    (ln(N/df)) is deliberately not emitted: ln() is not guaranteed
    bit-identical across engines' libm, and for a per-doc top-K by
    tf with df reported, the ranking is already fully determined by
    exact integers (tf desc, term asc — a total order).

    Scale: tf is one (doc, term) aggregate; df one distinct+aggregate
    reduced to vocabulary size and broadcast back; the top-K window
    partitions by doc_id. All shuffles carry aggregate-sized rows,
    and the corpus scan happens once.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TX.tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("term"))
    return (
        tf.join(F.broadcast(df), "term")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KEYWORDS_PER_DOC)
        .select("doc_id", "term", "tf", "df", "rnk")
    )
