"""Snapshot a qualifying BENCH.json as the standing quiet-box band.

The band (QUIET_BAND.json, rendered into PLANS.md by planaudit) is
the per-query min-of-3 reference future rounds adjudicate load-vs-
regression against, so it may only be recorded from a bench run that
was actually quiet: every noise sample's 1-min loadavg under
--max-load (default 6 — the box's own 3 interleaved bench passes at
32 threads keep short load spikes of the run itself in frame; the
EXTERNAL-contention read is the dgemm probe) and every dgemm probe
under --max-probe seconds (default 0.1; idle ≈ 0.025, neighbor-load
stalls push it past 0.5). Refuses to record otherwise — a band taken
under contention would mislabel every future honest number as a
regression.

Usage:
    python tools/record_band.py [label] [--max-load L] [--max-probe P]
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    argv = sys.argv[1:]
    max_load = float(argv[argv.index("--max-load") + 1]) if "--max-load" in argv else 6.0
    max_probe = (
        float(argv[argv.index("--max-probe") + 1]) if "--max-probe" in argv else 0.1
    )
    label = next((a for a in argv if not a.startswith("--")), "r13")

    with open(os.path.join(_REPO, "BENCH.json")) as f:
        bench = json.load(f)
    noise = bench.get("noise", [])
    if not noise:
        print("BENCH.json has no noise samples — not recordable")
        return 1
    loads = [s["loadavg_1m"] for s in noise]
    probes = [s["probe_sec"] for s in noise]
    bad = []
    if max(loads) > max_load:
        bad.append(f"loadavg_1m peaked at {max(loads)} > {max_load}")
    if max(probes) > max_probe:
        bad.append(f"dgemm probe peaked at {max(probes)}s > {max_probe}s")
    if bench.get("errors"):
        bad.append(f"run had errors: {sorted(bench['errors'])}")
    if bad:
        print("NOT quiet — refusing to record the band: " + "; ".join(bad))
        return 1

    lam = bench.get("loadavg_at_min", {})
    band = {
        "label": label,
        "sf": bench.get("sf"),
        "total": bench.get("value"),
        "n_queries": len(bench["queries"]),
        "loadavg_min": min(loads),
        "loadavg_max": max(loads),
        "probe_min": min(probes),
        "probe_max": max(probes),
        "source": f"BENCH.json run recorded as BENCH_{label}; "
        f"qualification max_load={max_load}, max_probe={max_probe}",
        "queries": {
            n: {"min": t, "loadavg_at_min": lam.get(n)}
            for n, t in bench["queries"].items()
        },
    }
    out = os.path.join(_REPO, "QUIET_BAND.json")
    with open(out, "w") as f:
        f.write(json.dumps(band, indent=1, sort_keys=True) + "\n")
    print(
        f"recorded {out}: {len(band['queries'])} queries, total {band['total']}s, "
        f"loadavg {band['loadavg_min']}-{band['loadavg_max']}, "
        f"probe {band['probe_min']}-{band['probe_max']}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
