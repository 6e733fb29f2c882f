"""r15 regression pins.

  1. retime probe-honesty (VERDICT r14 nit #2 / next-round #3): a
     re-time whose own dgemm probes are hot retries up to the bounded
     attempt budget; if every attempt is contaminated the record says
     ``inconclusive`` instead of presenting a loaded number as
     adjudication evidence. r14 recorded two such contaminated
     re-times (dedup_containment_ngram, fuzzy_part_name_pairs with
     0.21 s after-probes against a ~0.03 s idle floor).
  2. Zero-floor visibility (ADVICE r14): a quiet-band floor recorded
     as 0.0 no longer makes the row silently unflaggable —
     ``flag_rows`` guards explicitly and ``requalify`` records the
     row as ``{"zero_floor": true}`` in the evidence map.
"""

from __future__ import annotations

from .conftest import SF_SMOKE


def _toy_query(s, d):
    return s.range(1000).selectExpr("sum(id) AS s")


# ---------------------------------------------------------------------------
# 1. probe-honest requalification
# ---------------------------------------------------------------------------


def _patch_probes(monkeypatch, values):
    """Feed a fixed sequence into tools.retime._idle_probe; repeats
    the last value once the scripted sequence is exhausted."""
    import tools.retime as R

    seq = list(values)

    def fake_probe():
        return seq.pop(0) if len(seq) > 1 else seq[0]

    monkeypatch.setattr(R, "_idle_probe", fake_probe)


def test_requalify_retries_until_probes_idle(spark, monkeypatch):
    """First attempt contaminated (hot after-probe) → a second attempt
    with idle probes replaces it; no inconclusive marker, one hot try
    counted."""
    from tools.retime import requalify

    # attempt 1: before 0.03 / after 0.25 (hot) — attempt 2: 0.03/0.03.
    _patch_probes(monkeypatch, [0.03, 0.25, 0.03, 0.03])
    rec = requalify(
        spark,
        SF_SMOKE,
        {"toy": _toy_query},
        {"toy": 2.5},
        {"toy": 4.0},
        runs=1,
        attempts=3,
    )["toy"]
    assert "inconclusive" not in rec
    assert rec["attempts_probe_hot"] == 1
    assert rec["probe_sec"] == 0.03 and rec["probe_sec_after"] == 0.03
    assert rec["retime_min"] > 0 and rec["ratio"] == 1.6


def test_requalify_marks_inconclusive_when_probes_stay_hot(spark, monkeypatch):
    """Every attempt contaminated → bounded attempts, then the least-
    contaminated attempt is kept and flagged inconclusive."""
    from tools.retime import requalify

    # Three attempts, all hot; the middle one is least hot (0.12) so
    # its probes must be the ones kept.
    _patch_probes(monkeypatch, [0.30, 0.25, 0.12, 0.10, 0.40, 0.40])
    rec = requalify(
        spark,
        SF_SMOKE,
        {"toy": _toy_query},
        {"toy": 2.5},
        {"toy": 4.0},
        runs=1,
        attempts=3,
    )["toy"]
    assert rec["inconclusive"] is True
    assert rec["attempts_probe_hot"] == 3
    assert rec["probe_sec"] == 0.12 and rec["probe_sec_after"] == 0.10
    assert "retime_min" in rec, "the least-bad re-time is still recorded"


def test_requalify_single_clean_attempt_unchanged(spark, monkeypatch):
    """Idle probes on the first attempt → exactly the r14 record shape
    (no inconclusive, no attempts_probe_hot keys)."""
    from tools.retime import requalify

    _patch_probes(monkeypatch, [0.03, 0.03])
    rec = requalify(
        spark,
        SF_SMOKE,
        {"toy": _toy_query},
        {"toy": 2.5},
        {"toy": 4.0},
        runs=2,
    )["toy"]
    assert "inconclusive" not in rec and "attempts_probe_hot" not in rec
    assert rec["band"] == 2.5 and rec["bench_min"] == 4.0
    assert len(rec["retime_runs"]) == 2


# ---------------------------------------------------------------------------
# 2. zero-floor rows are visible, not exempt
# ---------------------------------------------------------------------------


def test_flag_rows_zero_floor_guard():
    from tools.retime import flag_rows, zero_floor_rows

    band = {"a": 1.0, "z": 0.0}
    timings = {"a": 2.0, "z": 9.9}
    flagged = flag_rows(timings, band, factor=1.35)
    assert flagged == {"a": 2.0}, "zero-floor row must not divide-by-zero or flag"
    assert zero_floor_rows(timings, band) == ["z"]


def test_requalify_records_zero_floor_rows(spark, monkeypatch):
    from tools.retime import requalify

    _patch_probes(monkeypatch, [0.03, 0.03])
    out = requalify(
        spark,
        SF_SMOKE,
        {"z": _toy_query},
        {"z": 0.0},
        {"z": 9.9},
        runs=1,
    )
    assert out["z"] == {"zero_floor": True, "band": 0.0, "bench_min": 9.9}
