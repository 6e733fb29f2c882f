"""Engine-exact rounded aggregates over fixed-point data.

``round(avg(x), 4)`` / ``round(sum(x), 4)`` over a large unordered
aggregation is not engine-stable when ``x`` carries fixed decimal
precision (money, sensor readings, integer counts): the true
aggregate is a rational that systematically lands exactly on a
rounding half-boundary (e.g. 56.20875), and Spark's parallel partial
sums differ from DuckDB's sequential sum in the last double ulp,
flipping the rounded digit (observed at sf0.1 on the sensor
averages).

Fix: aggregate INTEGERS. ``round(x·100)`` is an exact long for
≤2-decimal data (corpus property pinned in tests), fixed-point
products stay integers at a known scale, and the rounded output is
produced with the same integer arithmetic in both engines:

  round4(S / 10^s)        = S·10^(4-s) / 10^4            (s ≤ 4, exact)
                          = floor((2·S + d) / (2·d)) / 10^4, d = 10^(s-4)
  round4(S / (n·10^s))    = floor((2·m·S + n·d) / (2·n·d)) / 10^4,
                            m = 10^max(0, 4-s), d = 10^max(0, s-4)

The integer aggregates are bit-identical across engines and
partitionings; the final double division/floor sees identical
operands in both engines, so IEEE determinism gives identical
results even where the quotient exceeds exact-double range. The
rounding convention is half-up (floor(x + 1/2)) on both sides by
construction — no dependence on either engine's round() internals.

Each helper has a Spark and a DuckDB-SQL twin so registered queries
and their oracles share one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """x·100 as an exact long — valid for ≤2-decimal data."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def cents_sql(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def sum_round4(int_col: Column, scale: int) -> Column:
    """round(sum(e)/10^scale, 4) for an exact integer column e."""
    s = F.sum(int_col)
    if scale <= 4:
        return (s * F.lit(10 ** (4 - scale))) / F.lit(10000.0)
    d = 10 ** (scale - 4)
    return F.floor((F.lit(2) * s + F.lit(d)) / F.lit(2 * d)) / F.lit(10000.0)


def sum_round4_sql(int_expr: str, scale: int) -> str:
    if scale <= 4:
        return f"(sum({int_expr}) * {10 ** (4 - scale)}) / 10000.0"
    d = 10 ** (scale - 4)
    return f"floor((2 * sum({int_expr}) + {d}) / {2 * d}) / 10000.0"


def ratio_round4(s: Column, n: Column, scale: int) -> Column:
    """round_half_up(S / (n·10^scale), 4) for exact integer S and n —
    the building block for averages, including two-phase (salted)
    decompositions where S and n arrive as partial sums."""
    m, d = 10 ** max(0, 4 - scale), 10 ** max(0, scale - 4)
    return F.floor((F.lit(2 * m) * s + n * F.lit(d)) / (F.lit(2 * d) * n)) / F.lit(10000.0)


def avg_round4(int_col: Column, scale: int) -> Column:
    """round_half_up(avg(e)/10^scale, 4) for an exact integer column e.

    Divides by count(e) — the NON-null count — matching ANSI avg()
    semantics, so a NULL-bearing expression (e.g. json_extract on
    malformed props) doesn't silently dilute the average the way a
    count(*) denominator would.
    """
    return ratio_round4(F.sum(int_col), F.count(int_col), scale)


def avg_round4_sql(int_expr: str, scale: int) -> str:
    m, d = 10 ** max(0, 4 - scale), 10 ** max(0, scale - 4)
    return (
        f"floor(({2 * m} * sum({int_expr}) + count({int_expr}) * {d})"
        f" / ({2 * d} * count({int_expr}))) / 10000.0"
    )


def avg2to4_exact(col: Column | str) -> Column:
    """round_half_up(avg(x), 4) for 2-decimal x."""
    return avg_round4(cents(col), 2)


def avg2to4_exact_sql(expr: str) -> str:
    return avg_round4_sql(cents_sql(expr), 2)


def sum2to4_exact(col: Column | str) -> Column:
    """round(sum(x), 4) for 2-decimal x — exact, order-independent."""
    return sum_round4(cents(col), 2)


def sum2to4_exact_sql(expr: str) -> str:
    return sum_round4_sql(cents_sql(expr), 2)
