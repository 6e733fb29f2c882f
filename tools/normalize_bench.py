"""Attach the full per-query map to an archived BENCH_r{N}.json.

The driver archives bench runs as BENCH_r{N}.json with a "parsed"
block re-parsed from the (2000-char-capped) stdout tail, so "parsed.
queries" holds only the headline subset bench.py prints. The full
map lives in the BENCH.json the same run wrote. r10-r12 backfilled
the archive BY HAND, which the r12 advice correctly flagged: the
hand-edit overwrote "parsed.queries" (so "parsed" stopped being a
faithful parse of "tail"), carried no provenance, and once
reformatted the whole file.

This tool is the audited replacement, for when an inline full map is
wanted in an archived artifact at all (since r13 the stdout payload
is self-describing and the archive is consistent as-parsed, so this
is optional):

  * "parsed" and "tail" are NEVER touched — "parsed" stays exactly
    the machine parse of "tail";
  * the full map is attached as a separate, labeled top-level
    "queries_full" with a "queries_full_source" note naming the
    source file and its sha256;
  * provenance is CHECKED, not trusted: the source BENCH.json must
    match the "bench_json_sha256_16" the run itself printed (when
    the payload carries one — runs from r13 on), every headline
    entry must match the full map exactly, and the full map must sum
    to the reported total;
  * the artifact's existing indentation and trailing newline are
    preserved.

Usage:
    python tools/normalize_bench.py BENCH_r13.json [BENCH.json]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys


def normalize(artifact_path: str, bench_path: str) -> str:
    with open(artifact_path, "rb") as f:
        raw = f.read()
    art = json.loads(raw)
    with open(bench_path, "rb") as f:
        bench_raw = f.read()
    bench = json.loads(bench_raw)

    parsed = art.get("parsed")
    if not isinstance(parsed, dict):
        raise SystemExit(f"{artifact_path}: no parsed block — nothing to do")
    if "queries_full" in art:
        raise SystemExit(f"{artifact_path}: queries_full already attached")

    sha = hashlib.sha256(bench_raw).hexdigest()
    pinned = parsed.get("bench_json_sha256_16")
    if pinned is not None and pinned != sha[:16]:
        raise SystemExit(
            f"provenance mismatch: artifact pins BENCH.json sha {pinned}, "
            f"{bench_path} hashes to {sha[:16]} — wrong source file"
        )

    full = bench.get("queries")
    if not isinstance(full, dict) or not full:
        raise SystemExit(f"{bench_path}: no queries map")
    # None == None must not slip past the equality gates below and
    # crash later with a bare KeyError (review r13): refuse missing
    # totals by name first.
    if not isinstance(parsed.get("value"), (int, float)):
        raise SystemExit(f"{artifact_path}: parsed block has no numeric 'value'")
    if not isinstance(bench.get("value"), (int, float)):
        raise SystemExit(f"{bench_path}: no numeric 'value'")
    if parsed.get("value") != bench.get("value"):
        raise SystemExit(
            f"total mismatch: parsed.value={parsed.get('value')} vs "
            f"{bench_path} value={bench.get('value')}"
        )
    if parsed.get("n_queries") != len(full):
        raise SystemExit(
            f"count mismatch: parsed.n_queries={parsed.get('n_queries')} vs "
            f"{len(full)} entries in {bench_path}"
        )
    headline = parsed.get("queries") or {}
    drift = {
        k: (v, full.get(k))
        for k, v in headline.items()
        if full.get(k) != v
    }
    if drift:
        raise SystemExit(f"headline entries disagree with full map: {drift}")
    if round(sum(full.values()), 3) != round(parsed["value"], 3):
        raise SystemExit(
            f"full map sums to {round(sum(full.values()), 3)}, "
            f"not the reported total {parsed['value']}"
        )

    art["queries_full"] = full
    art["queries_full_source"] = {
        "file": os.path.basename(bench_path),
        "sha256": sha,
        "note": (
            "attached by tools/normalize_bench.py; parsed/tail untouched — "
            "parsed.queries is the stdout headline subset by design"
        ),
    }

    # Preserve the artifact's own formatting: sniff the indent from
    # the first indented line, keep a trailing newline.
    indent = 2
    for line in raw.decode().splitlines():
        if line.startswith(" ") and line.strip():
            indent = len(line) - len(line.lstrip(" "))
            break
    out = json.dumps(art, indent=indent) + "\n"
    with open(artifact_path, "w") as f:
        f.write(out)
    return f"{artifact_path}: attached queries_full ({len(full)} entries) from {bench_path}"


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, "BENCH.json")
    print(normalize(sys.argv[1], bench))
