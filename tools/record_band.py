"""Snapshot a qualifying BENCH.json as the standing quiet-box band.

The band (QUIET_BAND.json, rendered into PLANS.md by planaudit) is
the per-query min-of-3 reference future rounds adjudicate load-vs-
regression against, so it may only be recorded from a bench run that
was actually quiet. QUIET means free of EXTERNAL contention: the
bench's own 32 worker threads legitimately push the 1-min loadavg
well past the ambient reading between passes, so loadavg alone can't
discriminate self-load from neighbors — the dgemm probe can (it
competes for the same cores the neighbors would hold, but runs while
the bench is between queries). Gates: the MEDIAN dgemm probe under --max-probe seconds (default
0.05; idle ≈ 0.025-0.035, sustained neighbor load holds it past 0.1
for most samples — median, not max, because isolated spikes are
self-inflicted and unavoidable: the first probe pays BLAS thread-pool
cold start ~0.17 s, and a probe landing in a JVM GC/cleanup window
reads the bench's own tail, both observed on a verified-idle box),
a hard cap on the max probe (--max-probe-peak, default 0.5 — a real
neighbor stall exceeds it; applied to pass ≥ 2 samples when the run
annotated its passes, because pass-1 probes race the JVM's C2
compilation storm — self-load the interleaved min-of-3 tolerates),
and a loose loadavg sanity cap
--max-load (default 12; self-load from 3 interleaved 32-thread
passes peaks ~6-10). Refuses to record otherwise — a band taken
under contention would mislabel every future honest number as a
regression.

--merge-min (r15): floors RATCHET DOWN across qualifying runs instead
of being replaced wholesale. A run can pass every probe gate and
still carry burst landfall on individual rows (the probes sample
between queries; a burst inside one query's three passes inflates its
min invisibly — observed r15: a gate-passing run whose
join_salted_replicate min was 3.4× the prior floor while its own
clean-probed isolated re-time sat BELOW that floor). With
--merge-min, each query's floor is min(this run, existing band), so
a floor only moves down — the band stays "best demonstrated quiet
performance" and a burst-hit row cannot loosen its regression
tripwire. New queries take this run's value. Run metadata (probe
stats, label, total) always reflects the current run.

Usage:
    python tools/record_band.py [label] [--max-load L] [--max-probe P] [--merge-min]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def disqualifiers(
    bench: dict,
    max_load: float = 12.0,
    max_probe: float = 0.05,
    max_probe_peak: float = 0.5,
) -> list[str]:
    """Why this BENCH.json run may NOT be recorded as the band — empty
    list means recordable. THE quiet-gate definition: main() applies
    it, and tools/benchhunt.py imports it so "the hunter declared
    band-quality" and "record_band accepts" cannot drift apart
    (review r16: the hunter previously re-implemented only the median
    gate, so a run with one steady neighbor-stall peak or a loadavg
    excursion could stop the hunt yet be refused here).

    Both probe gates apply to pass >= 2 ("steady") samples when the
    run annotated its passes (bench.py r14): EVERY pass-1 probe races
    the JVM's C2 compilation storm — the registered queries' first
    whole-stage-codegen executions — and reads 0.26-1.2 s on a
    provably idle box (replicated across four r14 runs; steady
    samples sat at 0.028-0.21 in the same runs). That is self-load
    the interleaved min-of-3 already tolerates, since a query's min
    needs only one quiet pass, and pass-1 runs are JIT-inflated
    regardless. Unannotated runs (older BENCH.json) keep the
    all-samples gates."""
    noise = bench.get("noise", [])
    if not noise:
        return ["no noise samples — not recordable"]
    loads = [s["loadavg_1m"] for s in noise]
    probes = [s["probe_sec"] for s in noise]
    steady = [s["probe_sec"] for s in noise if s.get("pass", 2) != 1]
    gate_probes = steady if steady else probes
    med_probe = statistics.median(gate_probes)
    bad = []
    if max(loads) > max_load:
        bad.append(f"loadavg_1m peaked at {max(loads)} > {max_load}")
    if med_probe > max_probe:
        bad.append(f"median dgemm probe {med_probe}s > {max_probe}s")
    if max(gate_probes) > max_probe_peak:
        bad.append(
            f"dgemm probe peaked at {max(gate_probes)}s > {max_probe_peak}s "
            f"(steady-state samples)"
        )
    if bench.get("errors"):
        bad.append(f"run had errors: {sorted(bench['errors'])}")
    return bad


def main() -> int:
    # argparse, not hand-rolled argv scanning: `record_band.py
    # --max-load 20` must not silently record label='20' (review r13).
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("label", nargs="?", default="r13")
    ap.add_argument("--max-load", type=float, default=12.0)
    ap.add_argument("--max-probe", type=float, default=0.05)
    ap.add_argument("--max-probe-peak", type=float, default=0.5)
    ap.add_argument("--merge-min", action="store_true")
    args = ap.parse_args()
    max_load = args.max_load
    max_probe = args.max_probe
    max_probe_peak = args.max_probe_peak
    label = args.label

    with open(os.path.join(_REPO, "BENCH.json")) as f:
        bench = json.load(f)
    noise = bench.get("noise", [])
    if not noise:
        print("BENCH.json has no noise samples — not recordable")
        return 1
    loads = [s["loadavg_1m"] for s in noise]
    probes = [s["probe_sec"] for s in noise]
    # Gate rationale (pass-1 C2-storm exclusion etc.) lives on
    # disqualifiers() — the shared definition benchhunt also uses.
    steady = [s["probe_sec"] for s in noise if s.get("pass", 2) != 1]
    gate_probes = steady if steady else probes
    med_probe = statistics.median(gate_probes)
    peak_probes = gate_probes
    bad = disqualifiers(bench, max_load, max_probe, max_probe_peak)
    if bad:
        print("NOT quiet — refusing to record the band: " + "; ".join(bad))
        return 1

    lam = bench.get("loadavg_at_min", {})
    prior: dict = {}
    if args.merge_min:
        try:
            with open(os.path.join(_REPO, "QUIET_BAND.json")) as f:
                prior = json.load(f).get("queries", {})
        except (OSError, ValueError):
            prior = {}

    def floor(name: str, t: float) -> dict:
        p = prior.get(name, {})
        # A floor <= 0 is DEGENERATE on either side (0.0 is the
        # sub-millisecond-rounding pathology retime's zero_floor_rows
        # machinery exists to surface). Prior side (ADVICE r15): a
        # degenerate prior is treated as absent, never as "tighter" —
        # `p["min"] < t` holds for 0.0 against every real timing, so
        # merge mode would otherwise preserve it forever, the one
        # case where a qualifying run SHOULD replace. Current side
        # (review r16): a degenerate CURRENT timing must not replace
        # a real positive prior either — floors only ratchet down to
        # real timings, never to the un-flaggable zero.
        if (
            args.merge_min
            and p.get("min") is not None
            and p["min"] > 0
            and (t <= 0 or p["min"] < t)
        ):
            # keep the tighter prior floor AND its loadavg context
            return {"min": p["min"], "loadavg_at_min": p.get("loadavg_at_min")}
        return {"min": t, "loadavg_at_min": lam.get(name)}

    band = {
        "label": label,
        "sf": bench.get("sf"),
        "total": bench.get("value"),
        "n_queries": len(bench["queries"]),
        "loadavg_min": min(loads),
        "loadavg_max": max(loads),
        "probe_min": min(probes),
        "probe_median": med_probe,  # gate basis: steady samples when annotated
        "probe_median_all": statistics.median(probes),
        "probe_max": max(probes),
        "probe_max_steady": max(peak_probes),
        "source": f"BENCH.json run recorded as BENCH_{label}; "
        f"qualification max_load={max_load}, median max_probe={max_probe}, "
        f"peak cap {max_probe_peak}"
        + ("; merged min-wise with the prior band" if args.merge_min else ""),
        "queries": {n: floor(n, t) for n, t in bench["queries"].items()},
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
