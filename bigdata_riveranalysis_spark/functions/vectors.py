"""Vector (embedding) column expressions.

Embeddings are plain ``array<float>`` columns (SURVEY.md §7
watch-list #6 — no VectorUDT dependency in core paths). All math is
built-in higher-order functions (zip_with / aggregate / transform),
i.e. JVM-side and codegen-friendly — no Python in the row path.

Products are accumulated in DOUBLE in strict left-to-right order so
the DuckDB oracle (same fold order) produces bit-identical results.

Bit-identity assumes SAME-LENGTH NON-EMPTY arrays: on an empty array
DuckDB's list_sum returns NULL where Spark's aggregate returns its
0.0 init, and on mismatched lengths DuckDB skips the NULL products
(partial sum) while Spark's zip_with NULL-pads and poisons the whole
fold (review finding). That corpus property — every embedding
non-empty and a single fixed dimension — is pinned per fixture SF by
tests/test_sinks_and_plans.py::test_embeddings_corpus_assumption_holds
so a generator change fails there with a clear message, not as an
opaque oracle divergence.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float-array columns, accumulated in double."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """L2 norm of a float-array column."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two float-array columns."""
    return dot(a, b) / (norm(a) * norm(b))


def sign_lsh_bucket(a: Column | str, dims: tuple[int, ...] = (0, 8, 16, 24, 32, 40, 48, 56)) -> Column:
    """Axis-aligned random-hyperplane LSH bucket code.

    The hyperplanes are the coordinate axes at the given dimensions:
    bit_i = (a[dims_i] > 0). For unit-ish random embeddings this is a
    valid sign-LSH family, and being deterministic/data-independent it
    is exactly reproducible in the SQL oracle. Returns an integer
    bucket in [0, 2^len(dims)).

    Scale: this is the shuffle key for bucketed ANN — vectors only
    compare within a bucket, cutting candidate pairs by ~2^len(dims).
    """
    a = F.col(a) if isinstance(a, str) else a
    code = F.lit(0)
    for i, d in enumerate(dims):
        # element_at is 1-based.
        code = code + F.when(F.element_at(a, d + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return code


def sign_lsh_bucket_sql(col: str, dims: tuple[int, ...] = (0, 8, 16, 24, 32, 40, 48, 56)) -> str:
    """DuckDB-SQL twin of :func:`sign_lsh_bucket` (1-based list index)."""
    terms = [f"(CASE WHEN {col}[{d + 1}] > 0 THEN {1 << i} ELSE 0 END)" for i, d in enumerate(dims)]
    return "(" + " + ".join(terms) + ")"


#: DuckDB-SQL dot product over FLOAT[] with double accumulation,
#: matching :func:`dot`'s fold order.
DOT_SQL = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def dot_sql(a: str, b: str) -> str:
    return DOT_SQL.format(a=a, b=b)


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"
