"""Hunt a quiet box window, run bench.py inside it, keep the best run.

The quiet-band discipline (QUIET_BAND.json, tools/record_band.py)
only accepts a bench run whose steady-state dgemm probes show the box
was free of EXTERNAL contention — and this box suffers multi-minute
hypervisor-steal windows that loadavg cannot see (warm probes read
0.2-1.4 s at loadavg 0.05; observed r15/r16). Hand-hunting those
windows burned sessions in both rounds; this tool mechanizes the
pattern that worked both times:

1. poll a WARM dgemm probe series every ``--poll`` seconds and launch
   bench.py only when the median is under ``--launch-probe`` (warm:
   the BLAS thread-pool cold start ~0.17 s would otherwise fail an
   idle box on its first sample);
2. after each run, read BENCH.json's own interleaved noise samples
   and score the run by its STEADY (pass >= 2) probe median; the
   early-stop "band-quality" bar is record_band.disqualifiers()
   ITSELF (the shared gate definition: median, steady peak, loadavg,
   errors), so "the hunter is happy" and "record_band will accept"
   agree by construction rather than by duplication;
3. snapshot every attempt to ``--snapshot-dir`` and restore the best
   (lowest steady median, then lowest total) into BENCH.json; stop
   early the moment an attempt meets ``--target-probe``, the
   band-recordable bar.

Launch-gate pass vs. run contamination are independent events on this
box (r16: attempt 1 launched at probe 0.036 and ran into a 0.12
steady median; attempt 6 launched at 0.037 and stayed at 0.035) —
which is exactly why every attempt is snapshotted and scored rather
than trusting the launch gate.

Usage: ``python tools/benchhunt.py [--attempts 6] [--hours 2.5]``
(defaults match the r15/r16 hunts; band-quality landed on attempt 6
of 6 in r16, so don't trim --attempts to "about how many it took").
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.record_band import disqualifiers as _disqualifiers  # noqa: E402


def warm_probe_median(samples: int = 5, pause: float = 1.0) -> float:
    """Median of ``samples`` dgemm probes taken AFTER a warm-up, so the
    BLAS pool cold start (~0.17 s, self-inflicted) never counts as
    contention. Matches the probe shape retime/record_band use."""
    import numpy as np

    a = np.ones((1024, 1024))
    for _ in range(2):  # warm the BLAS thread pool
        for _ in range(3):
            a = a @ a
            a /= a[0, 0]
    ps = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(3):
            a = a @ a
            a /= a[0, 0]
        ps.append(time.perf_counter() - t0)
        time.sleep(pause)
    return statistics.median(ps)


def steady_median(bench: dict) -> float | None:
    """The run's steady-state (pass >= 2) probe median — the exact
    gate basis of record_band (pass-1 probes race the JVM C2 storm
    and are self-load). None when the run carries no noise samples
    (not recordable at all)."""
    noise = bench.get("noise", [])
    steady = [s["probe_sec"] for s in noise if s.get("pass", 2) != 1]
    if not steady:
        steady = [s["probe_sec"] for s in noise]
    return statistics.median(steady) if steady else None


def score(bench: dict) -> tuple[int, float, float] | None:
    """(record_band penalty, steady probe median, total seconds) —
    lexicographic: a run record_band would ACCEPT (penalty 0, judged
    by the shared disqualifiers() gate: median, steady peak, loadavg,
    errors) beats any run it would refuse, then quieter beats faster —
    the band records per-query floors, not the headline total, so a
    fast-but-contaminated run is worth less than a slow-but-quiet
    one."""
    sm = steady_median(bench)
    if sm is None or bench.get("errors"):
        return None
    penalty = 1 if _disqualifiers(bench) else 0
    return (penalty, sm, bench["value"])


def hunt(
    attempts: int = 6,
    hours: float = 2.5,
    launch_probe: float = 0.05,
    target_probe: float = 0.05,
    poll: float = 120.0,
    cooldown: float = 180.0,
    snapshot_dir: str = "/tmp",
    run=None,
    probe=None,
    sleep=time.sleep,
    clock=time.time,
    bench_path: str | None = None,
) -> dict | None:
    """Drive the hunt; returns the best attempt's record or None.
    ``run``/``probe``/``sleep``/``clock``/``bench_path`` are
    injectable for tests."""
    def _run_bench() -> int:
        r = subprocess.run(
            ["python", "bench.py"], cwd=_REPO, capture_output=True, text=True
        )
        if r.returncode != 0:
            # The captured output is the ONLY diagnostic an unattended
            # 2.5-hour hunt leaves behind (review r16) — surface it.
            tail = (r.stderr or r.stdout or "").strip()[-2000:]
            print(
                f"[hunt] bench exit {r.returncode}; output tail:\n{tail}",
                flush=True,
            )
        return r.returncode

    run = run or _run_bench
    probe = probe or warm_probe_median
    bench_path = bench_path or os.path.join(_REPO, "BENCH.json")
    # A non-existent snapshot dir crashed the hunt AFTER a completed
    # ~10-minute bench attempt (r16: the default "/tmp" always exists,
    # so the first --snapshot-dir user hit it) — create it up front so
    # the failure can't eat an attempt.
    os.makedirs(snapshot_dir, exist_ok=True)
    deadline = clock() + hours * 3600
    attempt = 0
    best: dict | None = None
    while clock() < deadline and attempt < attempts:
        m = probe()
        print(f"[hunt] probe median {m:.4f}", flush=True)
        if m >= launch_probe:
            sleep(poll)
            continue
        attempt += 1
        print(f"[hunt] quiet window — bench attempt {attempt}", flush=True)
        if run() != 0:
            print("[hunt] bench failed; attempt not scored", flush=True)
            continue
        with open(bench_path) as fh:
            bench = json.load(fh)
        snap = os.path.join(snapshot_dir, f"BENCH_hunt_{attempt}.json")
        shutil.copy(bench_path, snap)
        sc = score(bench)
        print(f"[hunt] attempt {attempt}: score={sc} snapshot={snap}", flush=True)
        if sc is not None and (best is None or sc < best["score"]):
            best = {"score": sc, "attempt": attempt, "snapshot": snap}
        if sc is not None and sc[0] == 0 and sc[1] <= target_probe:
            # Early stop only on a run record_band would actually
            # accept — penalty 0 is the shared gate (median AND steady
            # peak AND loadavg AND errors), not just the median
            # (review r16: a run with one steady neighbor-stall peak
            # passed the old median-only check here, then record_band
            # refused it).
            print("[hunt] band-quality run achieved — stopping", flush=True)
            break
        if sc is not None and sc[0] != 0:
            print(
                "[hunt] not recordable: "
                + "; ".join(_disqualifiers(bench)),
                flush=True,
            )
        sleep(cooldown)
    if best:
        shutil.copy(best["snapshot"], bench_path)
        print(
            f"[hunt] BEST: attempt {best['attempt']} "
            f"recordable={best['score'][0] == 0} "
            f"steady={best['score'][1]:.4f} total={best['score'][2]} "
            f"restored into BENCH.json",
            flush=True,
        )
    else:
        print("[hunt] no scorable run; BENCH.json untouched by restore", flush=True)
    return best


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--attempts", type=int, default=6)
    ap.add_argument("--hours", type=float, default=2.5)
    ap.add_argument("--launch-probe", type=float, default=0.05)
    ap.add_argument("--target-probe", type=float, default=0.05)
    ap.add_argument("--poll", type=float, default=120.0)
    ap.add_argument("--cooldown", type=float, default=180.0)
    ap.add_argument("--snapshot-dir", default="/tmp")
    a = ap.parse_args()
    best = hunt(
        attempts=a.attempts,
        hours=a.hours,
        launch_probe=a.launch_probe,
        target_probe=a.target_probe,
        poll=a.poll,
        cooldown=a.cooldown,
        snapshot_dir=a.snapshot_dir,
    )
    return 0 if best else 1


if __name__ == "__main__":
    raise SystemExit(main())
