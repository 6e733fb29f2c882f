"""Isolated re-timing for bench rows that land over the quiet band.

VERDICT r13 #4: a bench row >1.35× its QUIET_BAND.json value was
adjudicable (load vs regression) only by proving the query's code
untouched — a judgement call. This module makes the call mechanical:
``flag_rows`` picks the over-band rows, ``requalify`` immediately
re-times each one in ISOLATION (min-of-``runs`` back-to-back, cache
cleared between runs, a dgemm probe + loadavg read recorded first so
the re-time itself is load-qualifiable), and bench.py writes the
records into BENCH.json next to the flagged rows. A verdict reading a
regressed row then sees, inline: the band floor, the in-bench min,
the inflation ratio, and an isolated re-time taken minutes later —
if the re-time sits back at the band, it was load; if it reproduces,
it's a regression.

Pure logic (flag_rows) is import-safe and test-pinned like
tools/normalize_bench (tests/test_r14_fixes.py).
"""

from __future__ import annotations

import os
import time


def flag_rows(
    timings: dict[str, float],
    band: dict[str, float],
    factor: float = 1.35,
    cap: int | None = None,
) -> dict[str, float]:
    """{name: inflation ratio} for rows whose min exceeds ``factor``×
    their band value. Rows without a band entry (new queries) can't be
    flagged — they have no floor to be over; rows whose floor is 0.0
    (a sub-millisecond query rounded away) can't either, but they are
    surfaced by ``zero_floor_rows`` instead of silently exempted
    (ADVICE r14: truthiness of band.get() made a 0.0 floor an
    invisible permanent exemption). ``cap`` keeps the WORST rows
    (highest ratio) so a systemically loaded run can't turn the
    requalification pass into a second full bench."""
    flagged = {
        name: round(t / band[name], 2)
        for name, t in timings.items()
        if band.get(name) is not None
        and band[name] > 0
        and t > factor * band[name]
    }
    if cap is not None and len(flagged) > cap:
        keep = sorted(flagged, key=flagged.get, reverse=True)[:cap]
        flagged = {n: flagged[n] for n in keep}
    return flagged


def zero_floor_rows(
    timings: dict[str, float], band: dict[str, float]
) -> list[str]:
    """Rows present in both the timings and the band whose band floor
    is 0 (or negative, defensively): these can never be ratio-flagged,
    so requalify records them explicitly rather than letting them drop
    out of the adjudication evidence without a trace."""
    return sorted(
        name
        for name in timings
        if band.get(name) is not None and band[name] <= 0
    )


def _idle_probe() -> float:
    """The bench's dgemm contention probe (idle ≈ 0.025-0.035 s on
    this box): a hot probe marks the re-time itself as contaminated."""
    import numpy as np

    a = np.ones((1024, 1024))
    t0 = time.perf_counter()
    for _ in range(3):
        a = a @ a
        a /= a[0, 0]
    return round(time.perf_counter() - t0, 4)


#: Single-shot probe threshold for a CLEAN re-time. More lenient than
#: record_band's 0.05 s MEDIAN gate because here each probe is one
#: sample, taken right after the bench when the JVM's ContextCleaner
#: can land a one-off ~0.05-0.07 s stall on an otherwise idle box
#: (idle floor ≈ 0.025-0.035 s). The r14 contaminated after-probes
#: were 0.21 s — 2.5× this threshold.
_PROBE_IDLE = 0.08


def _memo_state(spark, sf_dir: str) -> dict:
    """Staging-memo warmth at re-time (VERDICT r15 #3): staged-family
    consumers (the shingle/MinHash/IVF×PQ/BPE queries) read shared
    artifacts from plans/staging.py's memo, and their quiet-band
    floors were recorded mid-bench with the memo WARM — so a re-time
    against a cold memo legitimately pays the one-off staging build
    (observed: dedup_containment_ngram re-timing clean-probed at 1.6×
    its band while a warm-memo re-time of the same code sat below the
    floor). Recording the state per requalified row lets the band
    adjudication rule compare like with like instead of misreading a
    cold build as a plan regression."""
    try:
        from bigdata_riveranalysis_spark.plans.staging import memo_entries

        n = memo_entries(spark, sf_dir)
        return {"memo_entries": n, "memo_warm": n > 0}
    except Exception:  # noqa: BLE001 - introspection only, never abort
        return {}


def _attempt(spark, sf_dir: str, fn, runs: int) -> dict:
    """One isolated re-time attempt: probe + loadavg + staging-memo
    state before, warm-up, ``runs`` timed cache-cleared executions,
    probe after."""
    rec: dict = {
        "probe_sec": _idle_probe(),
        "loadavg_1m": round(os.getloadavg()[0], 2),
        **_memo_state(spark, sf_dir),
    }
    rts: list[float] = []
    try:
        spark.catalog.clearCache()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            rts.append(round(time.perf_counter() - t0, 3))
    except Exception as e:  # noqa: BLE001 - record, don't abort the pass
        rec["err"] = str(e)[:200]
    if rts:
        rec["retime_runs"] = rts
        rec["retime_min"] = min(rts)
    rec["probe_sec_after"] = _idle_probe()
    return rec


def requalify(
    spark,
    sf_dir: str,
    qs: dict,
    band: dict[str, float],
    timings: dict[str, float],
    runs: int = 3,
    factor: float = 1.35,
    cap: int | None = 12,
    attempts: int = 3,
    probe_idle: float = _PROBE_IDLE,
) -> dict[str, dict]:
    """Re-time every flagged row in isolation; return the requalified
    records keyed by query name. Never raises for a single query — a
    re-time that errors records the message, the rest proceed.

    Each flagged query gets one UNTIMED warm-up execution before its
    timed runs: requalification happens right after the bench's final
    pass, when the Arrow worker pool has been reaped and the JVM is
    mid-cleanup (ContextCleaner dropping ~150 queries' shuffle and
    broadcast state), and without the warm-up those one-time costs
    land in ALL of a query's timed runs — observed as
    multimodal_features re-timing at 3.29 s against a 0.66 s warm
    truth in the first r14 requalification pass. A probe is read
    before AND after the timed runs so a stall wandering in mid
    re-time is visible in the record, not silently priced in.

    Probe-honesty (VERDICT r14 nit #2): a re-time whose OWN probes are
    hot (either side > ``probe_idle``) proves nothing — r14 recorded
    two such contaminated re-times as adjudication evidence
    (dedup_containment_ngram, fuzzy_part_name_pairs; after-probes
    0.21 s vs an ~0.03 s idle floor). Now each flagged row retries up
    to ``attempts`` times until both probes are idle; if every attempt
    is contaminated, the record keeps the attempt with the LOWEST max
    probe and carries ``"inconclusive": true`` so a verdict reader
    sees "could not be isolated" rather than a number dressed as
    evidence. ``attempts_probe_hot`` counts the discarded tries.

    Zero-floor rows (ADVICE r14) are recorded as
    ``{"zero_floor": true, "bench_min": t}`` — visible in BENCH.json's
    requalified map instead of silently exempt from flagging."""
    out: dict[str, dict] = {}
    for name in zero_floor_rows(timings, band):
        out[name] = {
            "zero_floor": True,
            "band": band[name],
            "bench_min": timings[name],
        }
    for name, ratio in sorted(
        flag_rows(timings, band, factor=factor, cap=cap).items(),
        key=lambda kv: -kv[1],
    ):
        fn = qs.get(name)
        if fn is None:
            continue
        best: dict | None = None
        hot_tries = 0
        for _ in range(max(1, attempts)):
            att = _attempt(spark, sf_dir, fn, runs)
            att_max_probe = max(att["probe_sec"], att["probe_sec_after"])
            if best is None or att_max_probe < max(
                best["probe_sec"], best["probe_sec_after"]
            ):
                best = att
            if att_max_probe <= probe_idle:
                break
            hot_tries += 1
        assert best is not None
        rec = {
            "band": band[name],
            "bench_min": timings[name],
            "ratio": ratio,
            **best,
        }
        if max(rec["probe_sec"], rec["probe_sec_after"]) > probe_idle:
            rec["inconclusive"] = True
        if hot_tries:
            rec["attempts_probe_hot"] = hot_tries
        out[name] = rec
    # End-of-pass retry for rows that stayed inconclusive (VERDICT r15
    # #5): a contention burst that contaminated one row's whole attempt
    # budget mid-pass has usually moved on by the time every other
    # flagged row has been re-timed, so each inconclusive row gets ONE
    # more clean-or-nothing attempt at the end. A clean late attempt
    # REPLACES the contaminated record (marked ``late_retry`` so the
    # evidence shows when it was taken); a still-hot one only bumps the
    # hot-attempt counter — the inconclusive marker stays honest. The
    # replacement also requires the retry to carry a REAL timing
    # (review r16): an attempt whose fn() errored records only
    # probes + err — its probes read idle because nothing ran, so
    # without the retime_min guard it would replace the contaminated
    # record with one that has no measurement AND no inconclusive
    # flag: a "clean" requalification with zero timing evidence.
    for name in [n for n, r in out.items() if r.get("inconclusive")]:
        fn = qs.get(name)
        if fn is None:
            continue
        att = _attempt(spark, sf_dir, fn, runs)
        prior = out[name]
        clean = max(att["probe_sec"], att["probe_sec_after"]) <= probe_idle
        if "retime_min" in att and clean:
            out[name] = {
                "band": prior["band"],
                "bench_min": prior["bench_min"],
                "ratio": prior["ratio"],
                **att,
                "attempts_probe_hot": prior.get("attempts_probe_hot", 0),
                "late_retry": True,
            }
        elif not clean:
            prior["attempts_probe_hot"] = (
                prior.get("attempts_probe_hot", 0) + 1
            )
        else:
            # Clean probes but no timing — fn() errored, so nothing
            # ran and the idle probes prove nothing. Keep the prior
            # contaminated-but-measured record and note the failed
            # retry; its probes were clean only because no work ran.
            prior["late_retry_err"] = att.get("err", "no timing recorded")
    return out
