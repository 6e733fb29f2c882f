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


def minhash_value(shingles: Column, seed: int) -> Column:
    """One MinHash signature component: min over shingles of
    hash32(shingle || '#seed'). Salting the input string with the
    seed gives an independent-ish hash family from a single md5 —
    the standard trick when a keyed hash isn't available.
    """
    salted = F.transform(shingles, lambda s: F.concat(s, F.lit(f"#{seed}")))
    hashed = F.transform(
        salted, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )
    return F.array_min(hashed)


def minhash_value_sql(shingles_expr: str, seed: int) -> str:
    h = hash32_sql(f"s || '#{seed}'")
    return f"list_min(list_transform({shingles_expr}, s -> {h}))"
