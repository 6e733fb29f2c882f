"""Round-11 fixes: the five ADVICE-r9 lows, pinned.

Each had survived two judge rounds as a known one-liner; these tests
make regressions loud rather than trusting the diff review:
  1. tools/canon.canon on ±inf (used to raise OverflowError at
     ``int(v)``) — lenient canon must render infinities, not crash.
  2. sources/tables.load_table conf ordering: a REJECTED load (nanos
     column in a non-events table) must leave a caller-provided
     session's timeZone conf untouched — the tz set used to run
     before the footer sniff, contradicting its own comment.
  3. fixturefuzz hygiene: _plant_events is deterministic and takes no
     rng; pyarrow.compute is no longer imported.
"""

from __future__ import annotations

import inspect
import os

import pytest

from .conftest import SF_SMOKE


def test_canon_handles_infinities():
    from tools.canon import canon, canon_strict

    assert canon(float("inf")) == "Infinity"
    assert canon(float("-inf")) == "-Infinity"
    # strict canon already had its own repr path; keep both total.
    assert canon_strict(float("inf")) != canon_strict(float("-inf"))
    # the integral-collapse path still works around the guard
    assert canon(5.0) == "5"
    assert canon(float("nan")) == "NaN"


def _nanos_customer_fixture(tmp_path) -> str:
    """sf-dir whose customer table carries a TIMESTAMP(NANOS) column —
    the shape load_table must reject loudly (only events has a nanos
    truncation path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "sfbadnanos")
    os.makedirs(d)
    tbl = pq.read_table(f"{SF_SMOKE}/customer.parquet")
    ts = pa.array([0] * len(tbl), type=pa.int64()).cast(pa.timestamp("ns"))
    tbl = tbl.append_column(pa.field("c_seen", pa.timestamp("ns")), ts)
    pq.write_table(tbl, f"{d}/customer.parquet")
    return d


def test_rejected_load_leaves_caller_timezone_untouched(spark, tmp_path):
    """ADVICE r9 #2: load_table used to set session.timeZone=UTC
    BEFORE the nanos footer sniff, so a rejected load still mutated a
    caller-provided session. Now no conf flip precedes a reject."""
    from bigdata_riveranalysis_spark.sources.tables import load_table

    d = _nanos_customer_fixture(tmp_path)
    caller = spark.newSession()  # isolated conf, shared JVM
    caller.conf.set("spark.sql.session.timeZone", "America/New_York")
    with pytest.raises(ValueError, match="TIMESTAMP\\(NANOS\\)"):
        load_table(caller, d, "customer")
    assert caller.conf.get("spark.sql.session.timeZone") == "America/New_York"
    # and an ACCEPTED load still pins UTC (the oracle-parity contract)
    load_table(caller, SF_SMOKE, "customer")
    assert caller.conf.get("spark.sql.session.timeZone") == "UTC"


def test_fixturefuzz_plant_is_rng_free():
    import tools.fixturefuzz as fz

    assert list(inspect.signature(fz._plant_events).parameters) == ["tbl"]
    assert not hasattr(fz, "pc")


# ---------------------------------------------------------------------------
# Multi-merge BPE (VERDICT r9/r10 task #3): planted-corpus parity with
# an INDEPENDENT in-test BPE trainer, including the two semantics a
# differential hash can't name on real text: greedy-left rewrites and
# overlap-counted pairs.
# ---------------------------------------------------------------------------


def _ref_bpe(texts, k):
    """Classic word-frequency BPE, written from the textbook
    definition (no shared code with the operator): overlap-counted
    weighted pair stats, (count DESC, pair ASC) winner on the
    space-joined pair string, greedy-left non-overlapping rewrite."""
    from collections import Counter

    wf = Counter()
    for x in texts:
        for t in x.lower().split():
            if len(t) >= 2:
                wf[t] += 1
    words = {t: list(t) for t in wf}
    merges = []
    for r in range(1, k + 1):
        pc = Counter()
        for t, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[t]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))[0]
        merges.append((r, best[0], best[1], pc[best]))
        for t, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[t] = out
    return merges


def _bpe_fixture(tmp_path, texts) -> str:
    import pandas as pd

    d = str(tmp_path / "sfbpe")
    os.makedirs(d)
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["plant"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(f"{d}/documents.parquet", index=False)
    return d


def test_bpe_multi_merge_matches_reference_trainer(spark, tmp_path):
    from bigdata_riveranalysis_spark.plans.llmdata import BPE_MERGES
    from bigdata_riveranalysis_spark.plans.registry import REGISTRY

    texts = [
        # 'aaaa' pins overlap counting (3 (a,a) pairs, merges to 'aa aa');
        # 'aaa' pins greedy-left ('aa a', never 'a aa')
        "aaaa aaa abab abab Banana bandana",
        "the theme there then an and band bandana",
        "ababab ab ab cccc cc ccc",
    ]
    d = _bpe_fixture(tmp_path, texts)
    got = sorted(
        map(tuple, REGISTRY["bpe_pair_merges"].fn(spark, d).collect())
    )
    want = _ref_bpe(texts, BPE_MERGES)
    assert got == want, (got, want)
    assert len(got) == BPE_MERGES >= 3  # the multi-merge contract


def test_bpe_rewrite_never_merges_across_symbol_boundaries(spark, tmp_path):
    """The r11 self-review's adversarial corpus: after round 1 merges
    (a, n), 'banana' is symbols [b, an, an, a]; a later (n, a) winner
    must merge NOTHING there — a raw string replace of 'n a' would
    match the trailing n of one 'an' plus the leading a of the next
    and fabricate a non-BPE merge (verified divergence pre-fix)."""
    from bigdata_riveranalysis_spark.plans.llmdata import BPE_MERGES
    from bigdata_riveranalysis_spark.plans.registry import REGISTRY

    texts = ["banana", "an an an an an", "na na na na"]
    d = _bpe_fixture(tmp_path, texts)
    got = sorted(
        map(tuple, REGISTRY["bpe_pair_merges"].fn(spark, d).collect())
    )
    want = _ref_bpe(texts, BPE_MERGES)
    assert got == want, (got, want)
    assert len(got) == BPE_MERGES >= 3  # the multi-merge contract


def test_bpe_merge_rounds_change_the_vocabulary(spark, tmp_path):
    """Round r's winning pair must be impossible under round r-1's
    vocabulary or differ from its winner — i.e. re-tokenization
    actually happened (a stuck corpus would emit the same pair with
    the same count every round)."""
    from bigdata_riveranalysis_spark.plans.registry import REGISTRY

    texts = ["xy xy xy xy xyz xyz zz", "xyxy xy zzz"]
    d = _bpe_fixture(tmp_path, texts)
    rows = sorted(
        map(tuple, REGISTRY["bpe_pair_merges"].fn(spark, d).collect())
    )
    pairs = [(r[1], r[2]) for r in rows]
    assert len(set(pairs)) == len(pairs), pairs  # no repeated merge
    # round 1 must merge the dominant ('x','y'); later rounds build on it
    assert pairs[0] == ("x", "y")
    assert any("xy" in a or "xy" in b for a, b in pairs[1:])


def _ref_bpe_encode(texts, k):
    """Token counts per word under the reference trainer's merged
    vocabulary (1-char words = 1 token)."""
    from collections import Counter

    wf = Counter()
    for x in texts:
        for t in x.lower().split():
            if len(t) >= 2:
                wf[t] += 1
    words = {t: list(t) for t in wf}
    for r in range(k):
        pc = Counter()
        for t, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[t]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))[0]
        for t, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[t] = out
    return {t: len(syms) for t, syms in words.items()}


def test_bpe_encode_stats_matches_reference_encoder(spark, tmp_path):
    """Per-source totals under the trained vocabulary equal the
    reference trainer's encoding, including 1-char words (1 token)
    and the exact chars/token ratio."""
    from bigdata_riveranalysis_spark.plans.llmdata import BPE_MERGES
    from bigdata_riveranalysis_spark.plans.registry import REGISTRY

    texts = ["banana a b an and band", "an an an na na bandana x"]
    d = _bpe_fixture(tmp_path, texts)
    rows = {r.source: r for r in REGISTRY["bpe_encode_stats"].fn(spark, d).collect()}
    ntok = _ref_bpe_encode(texts, BPE_MERGES)
    all_words = [t for x in texts for t in x.lower().split()]
    want_tokens = sum(ntok.get(t, 1) for t in all_words)
    want_chars = sum(len(t) for t in all_words)
    r = rows["plant"]
    assert r.n_words == len(all_words)
    assert r.n_tokens == want_tokens, (r.n_tokens, want_tokens)
    assert r.n_chars == want_chars
    assert r.n_tokens < want_chars  # merges actually compressed something
