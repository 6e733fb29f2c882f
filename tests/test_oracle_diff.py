"""Oracle-differential correctness gate (SURVEY.md §5 item 1).

Mirrors the driver's CORRECTNESS check: for every registered query,
run the Spark plan at sf0.01 AND the DuckDB oracle SQL over the same
parquet files; compare row count, column-name set, and an
order-insensitive canonical multiset of values.

Canonicalization rules (both sides):
  * columns sorted by name (the driver sorts by name before hashing);
  * floats rounded to 4 decimals (registry convention already rounds
    in-query; this absorbs residual last-bit drift);
  * timestamps/dates rendered as ISO strings;
  * rows sorted lexicographically — comparison is order-insensitive.

Queries with oracle=None (non-SQL-expressible) get a rows-run check
only, matching the driver's weaker gate.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pytest

from bigdata_riveranalysis_spark.plans.registry import REGISTRY

from .conftest import SF_ORACLE


def _canon_value(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 4)
        if r == int(r):
            return str(int(r))
        return f"{r:.4f}".rstrip("0").rstrip(".")
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("\x01".join(_canon_value(r[i]) for i in order) for r in rows)


ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, duck):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_ORACLE)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    if q.oracle is None:
        # rows-only gate: plan must execute; schema must be non-empty.
        assert s_cols, f"{name}: empty schema"
        return

    rel = duck.execute(q.oracle)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        pytest.fail(f"{name}: value mismatch, first diffs (spark vs duck): {diff}")
