"""Text-analysis column expressions (tokens, shingles, hashes).

Everything is a built-in Spark SQL expression — tokenization via
split/regexp, hashing via md5 — so the hot path stays in whole-stage
codegen, and every primitive has an exact DuckDB twin (md5 and
1-based substr behave identically in both engines), which is what
makes the dedup/fingerprint oracles bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny deterministic stopword list (quality scoring / lang-id demo).
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), r"\s+")


TOKENS_SQL = "regexp_split_to_array(lower({c}), '\\s+')"


def hash32(col: Column | str) -> Column:
    """Deterministic 32-bit unsigned hash as BIGINT: first 8 hex chars
    of md5. Oracle twin: CAST('0x' || substr(md5(x),1,8) AS UBIGINT).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str) -> str:
    return f"CAST(CAST(concat('0x', substr(md5({expr}), 1, 8)) AS UBIGINT) AS BIGINT)"


def word_shingles(tok: Column, n: int) -> Column:
    """n-word shingles (space-joined) from a token array.

    Empty when the doc has fewer than n tokens (callers filter that
    case so Spark's `sequence` never sees a descending range).
    """
    idx = F.sequence(F.lit(0), F.size(tok) - n)
    parts = lambda i: [F.element_at(tok, i + j + 1) for j in range(n)]  # noqa: E731
    return F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))


def word_shingles_sql(tokens_expr: str, n: int) -> str:
    """DuckDB twin of :func:`word_shingles` (1-based list indexing)."""
    joined = " || ' ' || ".join(f"__t[i + {j}]" for j in range(n))
    return (
        f"list_transform(range(1, len({tokens_expr}) - {n - 2}), i -> {joined})".replace("__t", tokens_expr)
    )


def char_shingles(col: Column | str, k: int) -> Column:
    """All k-char substrings of a string column (document fingerprints)."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.length(c) - (k - 1))
    return F.transform(idx, lambda i: c.substr(i, F.lit(k)))


def char_shingles_sql(expr: str, k: int) -> str:
    return f"list_transform(range(1, length({expr}) - {k - 2}), i -> substr({expr}, i, {k}))"


#: Universal-hash MinHash family over a Mersenne-prime field:
#: mh_i = min over shingles of (a_i·h + b_i) mod P, where h is ONE
#: base hash32 per shingle. The classic Carter–Wegman construction —
#: one md5 per shingle instead of one per (shingle, seed), which at 8
#: signature components is 8× less hashing (md5 dominated the
#: signature pass; the affine transforms are three integer ops).
#: Bounds keep both engines exact in int64: h < 2^32, a < 2^30 ⇒
#: a·h + b < 2^62 + 2^31, no overflow in Spark longs or DuckDB
#: BIGINTs, and both engines' % on positives agree.
MINHASH_PRIME = (1 << 31) - 1
MINHASH_COEFFS = (  # fixed pseudorandom (a, b), seed 20260813
    (1064082031, 398802782),
    (298493742, 1147225393),
    (958392528, 1479347476),
    (486173717, 116450322),
    (145609951, 430979121),
    (117017238, 1406942087),
    (880590498, 1267685540),
    (462017659, 1172698795),
)


def minhash_base(shingles: Column) -> Column:
    """Base hash array for the MinHash family: hash32 of each shingle.

    Callers must bind this array to its own projection (referenced by
    every signature component, it is non-cheap, so CollapseProject
    leaves it materialized — the md5 pass runs once per row, not once
    per component).
    """
    return F.transform(shingles, hash32)


def minhash_base_sql(shingles_expr: str) -> str:
    return f"list_transform({shingles_expr}, s -> {hash32_sql('s')})"


def minhash_value(base_hashes: Column, seed: int) -> Column:
    """One MinHash signature component from the base-hash array:
    min over h of (a·h + b) mod P (Carter–Wegman universal hashing).
    """
    a, b = MINHASH_COEFFS[seed]
    return F.array_min(
        F.transform(base_hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME))
    )


def minhash_value_sql(base_hashes_expr: str, seed: int) -> str:
    a, b = MINHASH_COEFFS[seed]
    return f"list_min(list_transform({base_hashes_expr}, h -> ({a} * h + {b}) % {MINHASH_PRIME}))"
