"""Local differential harness — mimics the driver's t2 correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the
same parquet tables, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their string form). Usage:

    python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

# Anchor imports to the repo root so the tool runs from any cwd
# (previously only worked from the root; review finding). PYTHONPATH
# too — Python workers don't inherit driver sys.path, and Arrow-UDF
# queries need the package importable worker-side.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import duckdb

from bigdata_riveranalysis_spark.session import get_spark
from bigdata_riveranalysis_spark.sources.tables import TABLES

# Canonicalization lives in the side-effect-free tools.canon so tests
# can share THE definitions without importing this CLI module's
# path/env mutations (review r9 second pass).
from tools.canon import canon, table_hash  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    # A typo'd query name (or a slash-less sf_dir landing in `only`)
    # previously filtered out EVERY query and the gate exited 0 with
    # '0 failures' — a false green for a run that verified nothing
    # (review finding). Unknown names are a usage error: fail loudly.
    unknown = [n for n in only if n not in qs]
    if unknown:
        print(f"FAIL: unknown query name(s) {unknown}; registry has {len(qs)} queries")
        return 2
    spark = get_spark("diffcheck")
    con = duckdb.connect()
    for t in TABLES:
        # Directory tables (the multi-file re-materialized fixtures,
        # tools/remat_fixture.py) need a glob for DuckDB; Spark-side
        # load_table handles both forms already.
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sh, sn = table_hash(srows, scols)
        dh, dn = table_hash(drows, dcols)
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duckdb={sorted(dcols)}")
            failures.append(name)
        elif sn != dn:
            print(f"FAIL {name}: rowcount spark={sn} duckdb={dn}")
            failures.append(name)
        elif sh != dh:
            print(f"FAIL {name}: value hash mismatch ({sn} rows)")
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = {tuple(canon(r[i]) for i in order) for r in srows}
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            dset = {tuple(canon(r[i]) for i in dorder) for r in drows}
            for d in list(sset - dset)[:3]:
                print(f"   spark-only : {d}")
            for d in list(dset - sset)[:3]:
                print(f"   duckdb-only: {d}")
            failures.append(name)
        else:
            print(f"PASS {name}: {sn} rows, hash {sh} ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
