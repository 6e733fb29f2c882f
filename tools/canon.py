"""Shared canonicalizers for the differential harnesses — import-safe.

This module has NO import-time side effects (no sys.path/env
mutation, no Spark/DuckDB imports) so tests can import it at
collection time. Both CLI harnesses use it:

* ``canon`` — the LENIENT form diffcheck has always used: integral
  floats collapse to int strings ('5.0' → '5'), floats round to 9
  decimals. Mirrors a fetchall()-path comparison where both engines
  deliver exact Python objects.
* ``canon_strict`` — NO integral-float collapse: float 5.0 stays
  '5.0'. Under this canon two results only match if every output
  column lands in the same dtype family on both sides — which is the
  repo rule (SURVEY §5 #6b), because the external driver compares
  through DataFrame conversion where DuckDB HUGEINT/DECIMAL becomes
  float64 and Spark DECIMAL becomes object Decimal (the r7/r8 reds).
* ``dtype_family`` / ``family_mismatches`` — the structural form of
  the same rule over pandas frames.
"""

from __future__ import annotations

import hashlib
import math


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_strict(v) -> str:
    """Canonicalize one cell WITHOUT the integral-float collapse: a
    dtype-family mismatch between the engines FAILS here even when
    the values are numerically equal — which is the point."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows: list[tuple], cols: list[str], strict: bool = False) -> tuple[str, int]:
    """Order-insensitive value hash: columns sorted by name, rows
    sorted by their canonical string form."""
    c = canon_strict if strict else canon
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(c(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(rows)


def dtype_family(series) -> str:
    """Coarse dtype family of a pandas column: two engines' results
    can only hash identically under EVERY sane canonicalizer if each
    output column lands in the same family on both sides. 'decimal'
    (Spark DECIMAL -> object of decimal.Decimal) is flagged even
    against int64 — values may str() equal today, but a repr()-style
    canon would render Decimal('5') differently, so decimals must be
    cast to long/double/string before the final SELECT."""
    import decimal

    k = series.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "timestamp"
    nonnull = series.dropna()
    if len(nonnull) == 0:
        return "empty"
    v = nonnull.iloc[0]
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, str):
        return "str"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return type(v).__name__


def family_mismatches(spdf, ddf) -> list[str]:
    out = []
    for c in spdf.columns:
        if c not in ddf.columns:
            continue
        sf_, df_ = dtype_family(spdf[c]), dtype_family(ddf[c])
        if "empty" in (sf_, df_):
            continue
        if sf_ != df_:
            out.append(f"{c}: spark={sf_} duckdb={df_}")
    return out
