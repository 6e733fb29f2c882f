"""Fixture-generation fuzz — parity under data the driver COULD generate.

The driver regenerates the testdata parquet between rounds with fresh
seeds (FIXTURES.md). The committed fixtures exercise ONE sample of the
generator's distribution; a query whose Spark plan and DuckDB oracle
disagree only on knife-edge values (interval-join boundaries, midnight
window edges, rounding half-boundaries, ties) can be green for rounds
and red the round a fresh generation lands on the edge. This tool
manufactures such generations deterministically:

  * keeps every table's KEY columns intact (the generator produces
    unique keys and referential integrity — breaking those would fuzz
    outside its domain and produce false alarms);
  * jitters/resamples non-key attributes (values, prices, discounts,
    event types, timestamps at µs granularity);
  * PLANTS adversarial events rows: touch exactly 24 h before a
    purchase (the attribution boundary), ±1 µs around it, events at
    exact midnight (day-window edges), pairs exactly 3600 s apart
    (the rolling-1h RANGE frame boundary, both-ends-inclusive), and
    exact half-cent values (cents-rounding boundary);
  * permutes row order (order-insensitivity of every hash).

Usage:
    python tools/fixturefuzz.py [--seeds N] [--src SF_DIR] [--keep] [--nanos]

--nanos additionally writes events.ts as TIMESTAMP(NANOS) with zero
sub-µs remainder — the legacy-generation shape sources/tables.py's
nanosAsLong path exists for — so the FULL registry is differentially
checked against DuckDB reading the ns-unit parquet natively (the r9
pytest goldens cover two queries; this covers all of them).

For each seed: write the fuzzed tables to a temp dir, run the full
diffcheck (fetchall-path) AND strictcheck (pandas-path) registries
against it, report per-seed failures. Exit 1 on any failure. ~2-4 min
per seed at sf0.001.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: Non-key attribute columns eligible for jitter, per table. Keys,
#: foreign keys, and categorical join columns stay fixed. Jitter
#: respects each column's GENERATOR GRAIN (review r9: sub-grain
#: jitter — 23:30 order dates, quantity 21.36 — manufactures data no
#: driver generation can produce, so a divergence found there would
#: be a false alarm, exactly what this tool's key-preservation rule
#: exists to avoid).
_JITTER_DOUBLES = {  # money columns: cent grain
    "events": ["value"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_extendedprice", "l_discount", "l_tax"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
}
_JITTER_WHOLE = {  # whole-unit columns
    "lineitem": ["l_quantity"],
}
_RESAMPLE_CATEGORICALS = {
    "events": ["event_type"],
    "orders": ["o_orderpriority", "o_orderstatus"],
    "lineitem": ["l_returnflag", "l_linestatus"],
}
_JITTER_TS_US = {  # µs-grain event times
    "events": ["ts"],
}
_JITTER_TS_DAYS = {  # day-grain (midnight-aligned) business dates
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

#: Day used for planted boundary rows (inside every fixture's range).
_PLANT_DAY_US = 1_705_363_200_000_000  # 2024-01-16 00:00:00 UTC in µs


def _fuzz_table(name: str, tbl: pa.Table, rng: np.random.RandomState) -> pa.Table:
    n = len(tbl)
    if n == 0:
        return tbl
    cols = {f.name: tbl.column(f.name) for f in tbl.schema}
    out = tbl
    for c in _JITTER_DOUBLES.get(name, []):
        if c not in cols:
            continue
        v = cols[c].to_numpy(zero_copy_only=False).astype(np.float64)
        mask = ~np.isnan(v)
        # multiplicative jitter ±10% at cent granularity, keeping the
        # generator's 2-decimal money convention so cents-rounding
        # identities stay in-domain
        jit = np.round(v * rng.uniform(0.9, 1.1, size=n) * 100) / 100
        v = np.where(mask, jit, v)
        if name == "events" and c == "value":
            # ~1% NULL readings: the schema is nullable and a fresh
            # generation may exercise it (found the ewma NULL-vs-NaN
            # output-boundary divergence, r9). Other tables' money
            # columns stay non-null — TPC-H-ish generators never
            # null them. PHYSICAL NaN (a non-null NaN double) is
            # deliberately NOT planted corpus-wide: DuckDB raises on
            # CAST(NaN AS BIGINT), so every cents-based oracle would
            # crash on data no generator produces; the engine/oracle
            # NaN parity for the one consumer with per-reading
            # semantics (stream_ewma_spikes) is pinned by a targeted
            # test instead (tests/test_r9_fixes.py).
            v = np.where(rng.uniform(size=n) < 0.01, np.nan, v)
        idx = out.schema.get_field_index(c)
        out = out.set_column(idx, pa.field(c, pa.float64()), pa.array(v, from_pandas=True))
    for c in _JITTER_WHOLE.get(name, []):
        if c not in cols:
            continue
        v = cols[c].to_numpy(zero_copy_only=False).astype(np.float64)
        mask = ~np.isnan(v)
        jit = np.maximum(1.0, np.round(v * rng.uniform(0.9, 1.1, size=n)))
        v = np.where(mask, jit, v)
        idx = out.schema.get_field_index(c)
        out = out.set_column(idx, pa.field(c, pa.float64()), pa.array(v, from_pandas=True))
    for c in _RESAMPLE_CATEGORICALS.get(name, []):
        if c not in cols:
            continue
        vals = cols[c].to_pylist()
        pool = sorted({x for x in vals if x is not None})
        if not pool:
            continue
        pick = rng.randint(0, len(pool), size=n)
        new = [vals[i] if vals[i] is None else pool[pick[i]] for i in range(n)]
        idx = out.schema.get_field_index(c)
        out = out.set_column(idx, pa.field(c, pa.string()), pa.array(new))
    for c in _JITTER_TS_US.get(name, []):
        if c not in cols:
            continue
        col = out.column(c)
        unit = getattr(col.type, "unit", "us")
        raw = col.cast(pa.int64()).to_numpy(zero_copy_only=False).copy()
        # ticks per µs for this column's unit (sub-µs units jitter at
        # µs grain; coarser units jitter at their own grain)
        per_us = {"s": None, "ms": None, "us": 1, "ns": 1_000}[unit]
        if per_us is None:  # s/ms-unit generation: whole-ms jitter
            hour = 3_600 if unit == "s" else 3_600_000
            raw += rng.randint(-hour, hour + 1, size=n)
        else:
            # jitter ±1 hour at µs granularity (the generator's grain)
            raw += rng.randint(-3_600_000_000, 3_600_000_001, size=n) * per_us
        idx = out.schema.get_field_index(c)
        out = out.set_column(
            idx, pa.field(c, pa.timestamp(unit)),
            pa.array(raw, type=pa.int64()).cast(pa.timestamp(unit)),
        )
    for c in _JITTER_TS_DAYS.get(name, []):
        if c not in cols:
            continue
        col = out.column(c)
        unit = getattr(col.type, "unit", "us")
        raw = col.cast(pa.int64()).to_numpy(zero_copy_only=False).copy()
        # day length in the column's own ticks — FIXTURES.md documents
        # ms-unit generations for business dates, and a us-assuming
        # constant would turn ±15 days into ±15,000 (review r9)
        day = {
            "s": 86_400,
            "ms": 86_400_000,
            "us": 86_400_000_000,
            "ns": 86_400_000_000_000,
        }[unit]
        # whole-day jitter ±15 days: business dates stay
        # midnight-aligned, the generator's grain
        raw += rng.randint(-15, 16, size=n) * day
        idx = out.schema.get_field_index(c)
        out = out.set_column(
            idx, pa.field(c, pa.timestamp(unit)),
            pa.array(raw, type=pa.int64()).cast(pa.timestamp(unit)),
        )
    # permute row order: every comparison must be order-insensitive
    perm = rng.permutation(n)
    return out.take(pa.array(perm, type=pa.int64()))


def _plant_events(tbl: pa.Table) -> pa.Table:
    """Append knife-edge rows with fresh unique ids/users."""
    ids = tbl.column("event_id").to_numpy(zero_copy_only=False)
    users = tbl.column("user_id").to_numpy(zero_copy_only=False)
    next_id = int(ids.max()) + 1
    next_user = int(users.max()) + 1
    unit = getattr(tbl.column("ts").type, "unit", "us")
    # planted timestamps are authored in µs; convert to the column's
    # own unit (multiply for finer, integer-divide for coarser — all
    # planted instants are whole seconds ± whole µs, so ms-grain
    # division is only lossy for the deliberate ±1 µs knife-edge rows,
    # which a coarser-grain generation genuinely cannot represent)
    to_unit = {
        "s": lambda us: us // 1_000_000,
        "ms": lambda us: us // 1_000,
        "us": lambda us: us,
        "ns": lambda us: us * 1_000,
    }[unit]
    day = _PLANT_DAY_US
    rows = []  # (event_id, ts_us, user_id, event_type, value, props)

    def add(ts_us, user, etype, value):
        nonlocal next_id
        rows.append((next_id, ts_us, user, etype, value, "{}"))
        next_id += 1

    h24 = 24 * 3_600_000_000
    for k, dlt in enumerate((-1, 0, 1)):  # touch at purchase-24h ±1µs
        u = next_user + k
        t_purchase = day + 5 * 3_600_000_000
        add(t_purchase, u, "purchase", 10.0)
        add(t_purchase - h24 + dlt, u, "click", 1.0)
        add(t_purchase - 1, u, "view", 1.0)  # just-inside touch
    next_user += 3
    # exact midnight + last-µs-of-day (day-window edges)
    add(day, next_user, "click", 2.0)
    add(day - 1, next_user, "click", 2.0)
    add(day + 86_400_000_000 - 1, next_user, "view", 2.0)
    next_user += 1
    # rolling-1h RANGE frame: events exactly 3600 s apart (inclusive
    # both ends) and 3600 s + 1 µs apart (exclusive)
    base = day + 12 * 3_600_000_000
    for k, gap in enumerate((3_600_000_000, 3_600_000_001)):
        u = next_user + k
        add(base, u, "click", 3.0)
        add(base + gap, u, "click", 3.0)
    next_user += 2
    # half-cent rounding boundary values (x.005) and a NULL reading
    add(day + 1_000_000, next_user, "purchase", 1.005)
    add(day + 2_000_000, next_user, "purchase", 2.675)  # classic fp half-case
    add(day + 3_000_000, next_user, "view", None)
    next_user += 1
    # sessionization gap EXACTLY at the 30-min threshold (gap >
    # SESSION_GAP_US starts a new session, so == must NOT) and one µs
    # past it (must)
    gap = 30 * 60 * 1_000_000
    for k, g in enumerate((gap, gap + 1)):
        u = next_user + k
        add(day + 6 * 3_600_000_000, u, "click", 4.0)
        add(day + 6 * 3_600_000_000 + g, u, "click", 4.0)
    next_user += 2
    # as-of join tie: click at EXACTLY the purchase instant (strict
    # tts < ts excludes it in both engines) and 1 µs before (included)
    t_p = day + 7 * 3_600_000_000
    add(t_p, next_user, "purchase", 5.0)
    add(t_p, next_user, "click", 5.0)
    add(t_p - 1, next_user, "click", 5.0)
    next_user += 1
    # sliding-window edge: event at an exact 30-min slide-grid line
    # (belongs to exactly two 1h/30min windows, no more)
    add(day + 8 * 3_600_000_000 + 30 * 60 * 1_000_000, next_user, "view", 6.0)
    next_user += 1
    # ~1% NULL event_types (VERDICT r14 #5): the wire schema declares
    # event_type nullable; the map-state bundle folds NULLs under an
    # internal non-null map key while every oracle PARTITION BY /
    # GROUP BY groups NULLs natively — the exact
    # both-sides-agree-by-construction seam the r9 NULL-vs-NaN
    # divergence hid in. Interleave NULL and typed events on three
    # fresh users so per-user occurrence chains, distinct-type
    # counts, global NULL groups, and mode/pivot consumers all see
    # the seam (mode ties included: a driver generation with
    # resampled categoricals can produce them, so tie-break parity
    # must hold).
    n_nulls = max(4, len(ids) // 100)
    t_null = day + 9 * 3_600_000_000
    for k in range(n_nulls):
        add(t_null + k * 60_000_000, next_user + (k % 3), None, 7.0 + (k % 5))
    for k, et in enumerate(("view", "click", "view", "click", "view", "click")):
        add(t_null + k * 60_000_000 + 30_000_000, next_user + (k % 3), et, 8.0)
    next_user += 3

    arr = {
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([to_unit(r[1]) for r in rows], pa.int64()).cast(
            pa.timestamp(unit)
        ),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    }
    planted = pa.table({f.name: arr[f.name] for f in tbl.schema})
    return pa.concat_tables([tbl, planted.cast(tbl.schema)])


def _plant_embeddings(tbl: pa.Table) -> pa.Table:
    """Append the ANN tie cohort: 8 clones of the smallest-vec_id
    QUERY vector under fresh ids — identical embeddings share cells,
    buckets, and PQ codes, so cosine and ADC scores tie EXACTLY at
    and past every top-k boundary and both engines must resolve the
    K-th slot purely by the (score, neighbor_id) tie-break (VERDICT
    r9 #4: the K-th-smallest-vec_id tie class no sweep had
    planted)."""
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    i = int(ids.argmin())
    base = int(ids.max()) + 1
    one = tbl.slice(i, 1)
    emb = one.column("embedding").to_pylist()[0]
    lab = one.column("label").to_pylist()[0]
    n_clones = 8  # > PQ_TOPK(5): ties both fill and overflow top-k
    arr = {
        "vec_id": pa.array(
            [base + k for k in range(n_clones)], tbl.schema.field("vec_id").type
        ),
        "embedding": pa.array(
            [emb] * n_clones, tbl.schema.field("embedding").type
        ),
        "label": pa.array([lab] * n_clones, tbl.schema.field("label").type),
    }
    planted = pa.table({f.name: arr[f.name] for f in tbl.schema})
    return pa.concat_tables([tbl, planted.cast(tbl.schema)])


def _plant_documents(tbl: pa.Table) -> pa.Table:
    """Append the containment knife-edge (VERDICT r9 #4): two doc
    pairs with corpus-unique tokens and distinct-bigram sets of size
    5 sharing exactly 4 (C = 4/5 = the inclusive 0.8 threshold —
    5·common ≥ 4·min holds with equality) and exactly 3 (C = 0.6,
    the nearest excludable step below at this set size)."""
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    base = int(ids.max()) + 1
    texts = [
        "cqza cqzb cqzc cqzd cqze cqzf",
        "cqza cqzb cqzc cqzd cqze zzqx",
        "dqza dqzb dqzc dqzd dqze dqzf",
        "dqza dqzb dqzc dqzd xxqy yyqz",
    ]
    arr = {
        "doc_id": pa.array(
            [base + k for k in range(len(texts))], tbl.schema.field("doc_id").type
        ),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["plant"] * len(texts), pa.string()),
        "n_chars": pa.array(
            [len(t) for t in texts], tbl.schema.field("n_chars").type
        ),
    }
    planted = pa.table({f.name: arr[f.name] for f in tbl.schema})
    return pa.concat_tables([tbl, planted.cast(tbl.schema)])


def _plant_bpe_ties(tbl: pa.Table) -> pa.Table:
    """Append the BPE tie cohort (VERDICT r12 #6): four docs, each one
    two-letter word repeated _BPE_TIE_REPS times — 'vk', 'vq', 'zk',
    'zq'. Word-internal pair counts for (v,k), (v,q), (z,k), (z,q)
    then tie at _BPE_TIE_REPS each, far above any natural English
    pair at test SF, so EVERY one of the BPE_MERGES=4 training
    rounds' winners is decided purely by the (count DESC, pair ASC)
    tie-break: round 1 merges 'v k', which removes that pair and
    leaves the remaining three still tied for round 2, and so on —
    a cascade of pure tie-break decisions under whatever jitter the
    seed applied to the rest of the corpus. Both engines must walk
    the identical v k → v q → z k → z q merge order or the
    bpe_pair_merges / bpe_encode_stats differentials go red.

    The repetitions are corpus-ADAPTIVE and EQUALIZED so the plant
    binds at any SF: natural word-internal pair counts are computed
    here with the engines' own tokenization grain (lowercased
    whitespace tokens — TX.tokens; occurrence counting ≡ the
    trainer's word-frequency weighting), the tie target is set 1000
    above the corpus max, and each planted word contributes exactly
    (target − its pair's natural count) occurrences — so the four
    TOTALS tie exactly even when the rest of the corpus (including
    the containment plant's 'zzqx') already contains a planted pair."""
    import collections

    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    base = int(ids.max()) + 1
    words: collections.Counter = collections.Counter()
    for t in tbl.column("text").to_pylist():
        if t:
            words.update(t.lower().split())
    pairs: collections.Counter = collections.Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += c
    target = (max(pairs.values()) if pairs else 0) + 1000
    texts = [
        " ".join([w] * (target - pairs[(w[0], w[1])]))
        for w in ("vk", "vq", "zk", "zq")
    ]
    arr = {
        "doc_id": pa.array(
            [base + k for k in range(len(texts))], tbl.schema.field("doc_id").type
        ),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["plant"] * len(texts), pa.string()),
        "n_chars": pa.array(
            [len(t) for t in texts], tbl.schema.field("n_chars").type
        ),
    }
    planted = pa.table({f.name: arr[f.name] for f in tbl.schema})
    return pa.concat_tables([tbl, planted.cast(tbl.schema)])


def fuzz_dir(src: str, dst: str, seed: int, nanos: bool = False) -> None:
    rng = np.random.RandomState(seed)
    os.makedirs(dst, exist_ok=True)
    from bigdata_riveranalysis_spark.sources.tables import TABLES

    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        tbl = _fuzz_table(t, tbl, rng)
        if t == "documents":
            tbl = _plant_documents(tbl)
            tbl = _plant_bpe_ties(tbl)
        if t == "embeddings":
            tbl = _plant_embeddings(tbl)
        if t == "events":
            tbl = _plant_events(tbl)
            if nanos:
                # zero-remainder ns generation: same instants, the
                # physical unit the nanosAsLong read path exists for
                idx = tbl.schema.get_field_index("ts")
                tbl = tbl.set_column(
                    idx, pa.field("ts", pa.timestamp("ns")),
                    tbl.column("ts").cast(pa.timestamp("ns")),
                )
        pq.write_table(tbl, f"{dst}/{t}.parquet")


def main() -> int:
    argv = sys.argv[1:]
    seeds = int(argv[argv.index("--seeds") + 1]) if "--seeds" in argv else 3
    src = argv[argv.index("--src") + 1] if "--src" in argv else "/root/testdata/sf0.001"
    keep = "--keep" in argv
    nanos = "--nanos" in argv
    failures = []
    for seed in range(1, seeds + 1):
        dst = tempfile.mkdtemp(prefix=f"fixturefuzz_s{seed}_")
        print(f"=== seed {seed}: fuzzing {src} -> {dst}"
              + (" [events.ts -> NANOS]" if nanos else ""))
        fuzz_dir(src, dst, seed, nanos=nanos)
        for harness in ("diffcheck", "strictcheck"):
            r = subprocess.run(
                [sys.executable, os.path.join(_REPO, "tools", f"{harness}.py"), dst],
                capture_output=True, text=True, cwd=_REPO,
            )
            tail = [ln for ln in r.stdout.splitlines() if ln.startswith(("FAIL", "ok?")) or "failures" in ln]
            ok = r.returncode == 0
            print(f"  seed {seed} {harness}: {'OK' if ok else 'FAIL'} | " + " | ".join(tail[-3:]))
            if not ok:
                if not tail:
                    # harness died before printing (import error, JVM
                    # launch failure): surface the traceback instead
                    # of an undiagnosable empty FAIL (review r9)
                    for ln in r.stderr.splitlines()[-8:]:
                        print(f"    stderr: {ln}")
                failures.append((seed, harness, tail))
        if not keep:
            shutil.rmtree(dst, ignore_errors=True)
        else:
            print(f"  kept {dst}")
    print(f"\n{len(failures)} failing (seed, harness) combos"
          + (f": {[(s, h) for s, h, _ in failures]}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
