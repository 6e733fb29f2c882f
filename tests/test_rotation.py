"""Driver-window rotation cadence (VERDICT r6 #2/#3).

The external driver verifies only the FIRST 50 entries of
``__spark_entry__.queries()`` per round. With >100 registered
queries the binding policy (SURVEY §5) is a 3-round cadence:
never-checked queries lead the window, then changed-this-round,
then oldest-driver-green first — so no query's latest driver row is
ever more than 3 rounds old, and a new query can never ship without
a driver row in its first round. These tests enforce both
invariants against the actual CORRECTNESS_r*.json history.
"""

from __future__ import annotations

import __spark_entry__ as E


def test_rotation_covers_registry_exactly_once():
    from bigdata_riveranalysis_spark.plans import query_catalog

    names = E._rotation(list(query_catalog()))
    assert sorted(names) == sorted(query_catalog())
    assert len(names) == len(set(names))


def test_never_checked_queries_lead_the_window():
    from bigdata_riveranalysis_spark.plans import query_catalog

    last, green, _ = E._driver_history()
    names = E._rotation(list(query_catalog()))
    never = [n for n in names if n not in last]
    red = sorted(
        n for n in names if n in last and not green.get(n, True)
    )
    # Never-checked names occupy the first slots AFTER the (capped)
    # red tier (red-first is pinned by its own test), as a SET —
    # within-tier order is _rotation's business. The red tier is
    # capped at _WINDOW - len(never) - len(changed) so BOTH
    # guaranteed tiers always fit (ADVICE r7: an uncapped red wave
    # would push new queries outside the window and the old hard
    # assertion then deadlocked the driver out of the round that
    # clears the reds; review r8 extended the guarantee to
    # changed-this-round queries).
    changed_red = [n for n in E._CHANGED_THIS_ROUND if n in red]
    changed = [
        n for n in E._CHANGED_THIS_ROUND if n not in never and n not in red
    ]
    cap = E._WINDOW - len(never) - len(changed) - len(changed_red)
    n_head = len(changed_red) + min(len(red) - len(changed_red), cap)
    assert sorted(names[n_head : n_head + len(never)]) == sorted(never)
    assert all(names.index(n) < E._WINDOW for n in never)


def test_three_round_cadence_holds_after_this_window():
    """Assuming the driver checks the first 50 names this round
    (round = latest recorded + 1), every registered query's latest
    driver row is ≤ 3 rounds old. This is the arithmetic bound for a
    112-query registry over a 50-slot window — the honest replacement
    for r5's impossible 'none older than two rounds' claim."""
    from bigdata_riveranalysis_spark.plans import query_catalog

    last, _green, latest = E._driver_history()
    this_round = latest + 1
    names = E._rotation(list(query_catalog()))
    simulated = dict(last)
    for n in names[: E._WINDOW]:
        simulated[n] = this_round
    stale = {
        n: simulated.get(n, 0)
        for n in names
        if this_round - simulated.get(n, 0) > 3
    }
    assert not stale, f"queries whose driver row would exceed 3 rounds: {stale}"


def test_changed_list_names_are_registered():
    from bigdata_riveranalysis_spark.plans import query_catalog

    missing = [n for n in E._CHANGED_THIS_ROUND if n not in query_catalog()]
    assert not missing, missing


def test_red_rows_lead_the_window(tmp_path, monkeypatch):
    """A query whose LATEST driver row is red must take slot 1 of the
    next window — ahead of never-checked and changed queries (r7
    review: the history scan previously treated any row as green)."""
    import json

    import __spark_entry__ as E

    fake = {
        "alpha": {"rows_match": True, "schema_match": True,
                  "hash_match": False, "err": None},
        "beta": {"rows_match": True, "schema_match": True,
                 "hash_match": True, "err": None},
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(fake))
    monkeypatch.setattr(
        "os.path.dirname", lambda p_: str(tmp_path), raising=True
    )
    last, green, latest = E._driver_history()
    assert latest == 1 and last == {"alpha": 1, "beta": 1}
    assert green == {"alpha": False, "beta": True}
    monkeypatch.setattr(E, "_CHANGED_THIS_ROUND", [])
    order = E._rotation(["beta", "gamma", "alpha"])
    assert order[0] == "alpha"      # red first
    assert order[1] == "gamma"      # never-checked second

    # and a typo'd changed-list name fails LOUDLY at build time
    monkeypatch.setattr(E, "_CHANGED_THIS_ROUND", ["no_such_query"])
    import pytest

    with pytest.raises(KeyError):
        E._rotation(["beta", "gamma", "alpha"])


def test_red_wave_spills_instead_of_deadlocking(tmp_path, monkeypatch):
    """ADVICE r7: a systemic red wave (> _WINDOW - |never| red rows)
    must NOT raise at registry build — excess reds spill behind the
    never tier so new queries keep their guaranteed first-round slot
    and the driver still runs the round that clears the reds."""
    import json

    import __spark_entry__ as E

    n_red = E._WINDOW + 10
    fake = {
        f"red{i:03d}": {"rows_match": True, "schema_match": True,
                        "hash_match": False, "err": None}
        for i in range(n_red)
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(fake))
    monkeypatch.setattr(
        "os.path.dirname", lambda p_: str(tmp_path), raising=True
    )
    monkeypatch.setattr(E, "_CHANGED_THIS_ROUND", [])
    names = sorted(fake) + ["new_a", "new_b"]
    order = E._rotation(names)
    assert sorted(order) == sorted(names)
    # both never-checked queries land inside the window
    assert order.index("new_a") < E._WINDOW
    assert order.index("new_b") < E._WINDOW
    # the window head is reds up to the cap, then the never tier
    cap = E._WINDOW - 2
    assert order[:cap] == sorted(fake)[:cap]
    assert sorted(order[cap : cap + 2]) == ["new_a", "new_b"]
    # spilled reds follow immediately (ahead of any green row)
    assert order[cap + 2 : cap + 2 + (n_red - cap)] == sorted(fake)[cap:]


def test_red_wave_cannot_push_changed_queries_out(tmp_path, monkeypatch):
    """Review r8: a systemic red wave must not silently push
    plan-CHANGED queries outside the window either — a changed plan
    shipping on a stale green row is the same staleness mode the
    never tier guards against, and _CHANGED_THIS_ROUND is rewritten
    next round so a missed row would be forgotten entirely. A changed
    query that is ALSO red keeps both properties: it leads the window
    ahead of the capped red tier (second-pass review: filtering it
    into the capped tier let the wave spill it silently). Plain
    changed queries rank behind never but AHEAD of spilled reds."""
    import json

    import __spark_entry__ as E

    n_red = E._WINDOW + 10
    fake = {
        f"red{i:03d}": {"rows_match": True, "schema_match": True,
                        "hash_match": False, "err": None}
        for i in range(n_red)
    }
    # one GREEN previously-checked query whose plan changed this round,
    # and one changed query caught in the red wave itself ("zz_" so an
    # alphabetical red tier would spill it without the guarantee)
    fake["tuned"] = {"rows_match": True, "schema_match": True,
                     "hash_match": True, "err": None}
    fake["zz_tuned_red"] = {"rows_match": True, "schema_match": True,
                            "hash_match": False, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(fake))
    monkeypatch.setattr(
        "os.path.dirname", lambda p_: str(tmp_path), raising=True
    )
    monkeypatch.setattr(E, "_CHANGED_THIS_ROUND", ["tuned", "zz_tuned_red"])
    names = sorted(fake) + ["new_a"]
    order = E._rotation(names)
    assert sorted(order) == sorted(names)
    assert order.index("new_a") < E._WINDOW
    assert order.index("tuned") < E._WINDOW
    assert order.index("zz_tuned_red") < E._WINDOW
    # tier shape: changed∩red first, capped reds, never, changed,
    # spilled reds
    assert order[0] == "zz_tuned_red"
    cap = E._WINDOW - 3
    reds = sorted(n for n in fake if n not in ("tuned", "zz_tuned_red"))
    assert order[1 : 1 + cap] == reds[:cap]
    assert order[1 + cap : 3 + cap] == ["new_a", "tuned"]
    assert order[3 + cap : 3 + cap + (n_red - cap)] == reds[cap:]


def test_registry_size_keeps_three_round_cadence_arithmetic():
    """VERDICT r7 #7: the 3-round cadence bound (every query's driver
    row ≤ 3 rounds old) requires ceil(n / _WINDOW) ≤ 3. This guard
    fails the build at 151+ queries, forcing an explicit policy
    decision (prune, merge, or widen the documented bound in SURVEY
    §5) instead of silent staleness."""
    from math import ceil

    from bigdata_riveranalysis_spark.plans import query_catalog

    n = len(query_catalog())
    assert ceil(n / E._WINDOW) <= 3, (
        f"{n} registered queries over a {E._WINDOW}-slot window breaks the "
        f"3-round cadence (ceil({n}/{E._WINDOW}) = {ceil(n / E._WINDOW)}); "
        "prune/merge queries or renegotiate the SURVEY §5 cadence claim"
    )
