"""tools/benchhunt.py — the mechanized quiet-window bench hunt.

Pure-python tests (no Spark): the probe/run/clock seams are injected
so each scenario scripts the box's contention behavior exactly. The
scenarios mirror what r15/r16 actually saw on this box: launch-gate
pass followed by mid-run contamination, steal windows that outlast
several polls, and a late attempt finally landing band-quality.
"""

import json

import pytest

from tools.benchhunt import hunt, score, steady_median


def _bench(total, probes, *, annotated=True, errors=None):
    noise = []
    for i, p in enumerate(probes):
        s = {"probe_sec": p, "loadavg_1m": 1.0}
        if annotated:
            s["pass"] = 1 if i == 0 else 2
        noise.append(s)
    return {"value": total, "noise": noise, "errors": errors or {}}


def test_steady_median_excludes_pass1_when_annotated():
    # pass-1 probe races the C2 storm (0.9 s on an idle box, observed
    # every r14-r16 run) — it must not poison the gate basis.
    b = _bench(100.0, [0.9, 0.03, 0.05, 0.04])
    assert steady_median(b) == 0.04


def test_steady_median_falls_back_for_unannotated_runs():
    b = _bench(100.0, [0.9, 0.03, 0.05], annotated=False)
    assert steady_median(b) == 0.05


def test_steady_median_none_without_noise_samples():
    assert steady_median({"value": 1.0, "noise": []}) is None


def test_score_prefers_quiet_over_fast():
    # The band records per-query floors, not the headline — a quieter
    # run must beat a faster-but-contaminated one lexicographically.
    quiet_slow = score(_bench(120.0, [0.9, 0.03, 0.04, 0.03]))
    fast_noisy = score(_bench(110.0, [0.9, 0.12, 0.11, 0.13]))
    assert quiet_slow < fast_noisy
    assert quiet_slow[0] == 0 and fast_noisy[0] == 1, (
        "penalty element is record_band's shared gate verdict"
    )


def test_score_penalizes_steady_peak_and_loadavg_excursions():
    # record_band's OTHER gates, not just the median (review r16): a
    # quiet-median run with one steady neighbor-stall peak (>0.5) or
    # a loadavg excursion (>12) must rank below a fully recordable
    # run, even one with a slower total.
    peaky = _bench(110.0, [0.9, 0.03, 0.03, 0.6])
    clean = _bench(125.0, [0.9, 0.04, 0.04, 0.04])
    assert score(peaky)[0] == 1 and score(clean)[0] == 0
    assert score(clean) < score(peaky)
    loaded = _bench(110.0, [0.9, 0.03, 0.03, 0.03])
    for s in loaded["noise"]:
        s["loadavg_1m"] = 20.0
    assert score(loaded)[0] == 1


def test_score_rejects_runs_with_errors():
    assert score(_bench(100.0, [0.9, 0.03], errors={"q1": "boom"})) is None


class _Box:
    """Scripted box: a probe series, a bench-result series, and a fake
    clock that only advances when the hunter sleeps."""

    def __init__(self, tmp_path, probes, runs):
        self.probes = list(probes)
        self.runs = list(runs)
        self.now = 0.0
        self.bench_path = str(tmp_path / "BENCH.json")
        self.snap_dir = str(tmp_path / "snaps")
        import os

        os.makedirs(self.snap_dir)

    def probe(self):
        return self.probes.pop(0)

    def run(self):
        total, probes = self.runs.pop(0)
        with open(self.bench_path, "w") as fh:
            json.dump(_bench(total, probes), fh)
        return 0

    def sleep(self, s):
        self.now += s

    def clock(self):
        return self.now

    def hunt(self, **kw):
        return hunt(
            run=self.run,
            probe=self.probe,
            sleep=self.sleep,
            clock=self.clock,
            bench_path=self.bench_path,
            snapshot_dir=self.snap_dir,
            **kw,
        )


def test_hunt_waits_out_steal_window_then_stops_at_target(tmp_path):
    # Three hot polls (the r16 00:10 steal window shape), then a quiet
    # launch whose run IS band-quality — stop early, one attempt only.
    box = _Box(
        tmp_path,
        probes=[0.25, 0.45, 0.11, 0.036],
        runs=[(117.0, [0.9, 0.034, 0.035, 0.034])],
    )
    best = box.hunt(attempts=6, hours=2.5)
    assert best["attempt"] == 1
    assert best["score"][0] == 0, "early stop requires a recordable run"
    assert best["score"][1] == pytest.approx(0.034)
    assert not box.runs, "stopped after the band-quality attempt"


def test_hunt_no_early_stop_on_quiet_median_with_steady_peak(tmp_path):
    # A run whose steady MEDIAN meets the target but whose steady peak
    # record_band would refuse (0.6 > 0.5) must NOT stop the hunt
    # (review r16) — the next, fully recordable attempt stops it and
    # wins the restore.
    box = _Box(
        tmp_path,
        probes=[0.03, 0.03],
        runs=[
            (110.0, [0.9, 0.03, 0.03, 0.6]),
            (120.0, [0.9, 0.04, 0.04, 0.04]),
        ],
    )
    best = box.hunt(attempts=6, hours=2.5)
    assert best["attempt"] == 2, "peaky attempt must not early-stop or win"
    with open(box.bench_path) as fh:
        assert json.load(fh)["value"] == 120.0


def test_hunt_restores_best_attempt_not_last(tmp_path):
    # r16 shape: attempt 1 launches quiet but runs contaminated;
    # attempt 2 is quieter though slower. Best (attempt 2) must be
    # restored into BENCH.json even though attempt 1 had the lower
    # total — and with attempts exhausted, no early stop happened.
    box = _Box(
        tmp_path,
        probes=[0.03, 0.03],
        runs=[
            (110.0, [0.9, 0.12, 0.11, 0.13]),
            (118.0, [0.9, 0.06, 0.07, 0.06]),
        ],
    )
    best = box.hunt(attempts=2, hours=2.5, target_probe=0.05)
    assert best["attempt"] == 2
    with open(box.bench_path) as fh:
        restored = json.load(fh)
    assert restored["value"] == 118.0


def test_hunt_gives_up_at_deadline_without_quiet_window(tmp_path):
    # Probes never drop below the launch gate: the deadline must end
    # the hunt with nothing run and nothing restored.
    box = _Box(tmp_path, probes=[0.2] * 1000, runs=[])
    best = box.hunt(attempts=6, hours=0.05, poll=30.0)
    assert best is None
    assert len(box.probes) < 1000 and box.runs == []


def test_hunt_skips_failed_bench_runs(tmp_path):
    calls = {"n": 0}

    def run():
        calls["n"] += 1
        if calls["n"] == 1:
            return 1  # bench crashed — must not be scored or snapshotted
        with open(box.bench_path, "w") as fh:
            json.dump(_bench(117.0, [0.9, 0.03, 0.03, 0.03]), fh)
        return 0

    box = _Box(tmp_path, probes=[0.03, 0.03], runs=[])
    best = hunt(
        run=run,
        probe=box.probe,
        sleep=box.sleep,
        clock=box.clock,
        bench_path=box.bench_path,
        snapshot_dir=box.snap_dir,
        attempts=2,
    )
    assert best["attempt"] == 2 and calls["n"] == 2


def test_hunt_creates_missing_snapshot_dir(tmp_path, monkeypatch):
    """A fresh --snapshot-dir must be created up front: r16's first
    real use crashed on the snapshot copy AFTER a completed 10-minute
    bench attempt because only the default /tmp ever existed."""
    import json as _json

    from tools import benchhunt as H

    bench = tmp_path / "BENCH.json"
    bench.write_text(_json.dumps({
        "value": 100.0, "n_queries": 2, "errors": {},
        "noise": [
            {"pass": 1, "loadavg_1m": 0.1, "probe_sec": 0.03},
            {"pass": 2, "loadavg_1m": 0.1, "probe_sec": 0.03},
            {"pass": 3, "loadavg_1m": 0.1, "probe_sec": 0.03},
        ],
    }))
    snapdir = tmp_path / "does" / "not" / "exist"
    best = H.hunt(
        attempts=1,
        hours=1.0,
        launch_probe=0.05,
        target_probe=0.05,
        poll=0.0,
        cooldown=0.0,
        snapshot_dir=str(snapdir),
        run=lambda: 0,
        probe=lambda: 0.03,
        sleep=lambda s: None,
        clock=__import__("itertools").count(0, 60).__next__,
        bench_path=str(bench),
    )
    assert best is not None and best["attempt"] == 1
    assert (snapdir / "BENCH_hunt_1.json").exists()
