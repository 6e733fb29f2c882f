"""Re-materialize a fixture corpus as multi-file parquet tables.

VERDICT r16 #3: every sf0.1 fixture table is ONE parquet file with ONE
row group, so a Spark scan gets exactly one input split regardless of
``maxPartitionBytes`` — the driver's 8-vs-32-core scaling block is
structurally flat for scan-bound queries and §6-style I/O effects are
unprovable at bench SF. This tool rewrites a corpus into an EQUIVALENT
one — same rows, same values, same physical schema (nanos timestamps
stay nanos) — with each table split into N part files under a
``<table>.parquet/`` directory, which the engine's loaders and footer
metadata layer already handle (sources/tables.py::_table_files walks
directories recursively; spark.read.parquet and the streaming symlink
staging both accept a directory).

Evidence tool only: the driver benches against $SPARK_GRAFT_SF_DIR as
shipped; point the env var at the re-materialized dir to record a
scan-parallel scaling run (OPTIMIZATION_r17.md carries one). Because
rows are identical, every oracle hash is unchanged — verifiable with
tools/diffcheck.py against the new dir.

Usage:
    python tools/remat_fixture.py <src_sf_dir> <dst_sf_dir> [n_files]
    python tools/remat_fixture.py /root/testdata/sf0.1 /root/testdata-mrg/sf0.1 32
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def remat_table(src: str, dst_dir: str, n_files: int) -> tuple[int, int]:
    """Rewrite one parquet table (file or directory) into ``n_files``
    part files with identical rows and physical schema. Returns
    (rows, files_written)."""
    import pyarrow.parquet as pq

    table = pq.read_table(src)
    os.makedirs(dst_dir, exist_ok=True)
    n = table.num_rows
    n_files = max(1, min(n_files, n or 1))
    written = 0
    per = -(-n // n_files) if n else 0
    for i in range(n_files):
        lo = i * per
        if n and lo >= n:
            break
        part = table.slice(lo, per) if n else table
        pq.write_table(
            part,
            os.path.join(dst_dir, f"part-{i:05d}.parquet"),
            # one row group per part file; 2.6 keeps nanos timestamps
            # physically NANOS, matching the source generation
            version="2.6",
        )
        written += 1
    return n, written


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    src_dir, dst_dir = sys.argv[1], sys.argv[2]
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    from bigdata_riveranalysis_spark.sources.tables import TABLES

    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        if not os.path.exists(src):
            print(f"skip {t}: no {src}")
            continue
        rows, files = remat_table(src, os.path.join(dst_dir, f"{t}.parquet"), n_files)
        print(f"{t}: {rows} rows -> {files} files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
