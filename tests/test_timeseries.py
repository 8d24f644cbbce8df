"""Pure-Python cross-checks of the time-series operators (LOCF resample,
exact rolling anomaly, transition counts) — the oracle-independence
layer: DuckDB proves cross-engine agreement, these prove the shared
semantics are the INTENDED ones on crafted edges (gap runs, in-bucket
ties, single-observation keys, zero-variance frames)."""

from __future__ import annotations

import datetime as dt

import pytest
from decimal import Decimal

from mysql_ch_replicator_spark.operators.timeseries import (
    HOUR_US, resample_locf, rolling_anomaly, transition_counts)


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def _events(spark, rows):
    # (event_id, ts, user_id, value)
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")


def test_resample_locf_gap_run_and_ties(spark):
    """A 3-hour gap emits carried rows with filled=1; two observations in
    one bucket resolve to the latest (ts, event_id); the last bucket
    never extends past the final observation."""
    rows = [
        (1, _ts(0, 10), 7, 1.0),
        (2, _ts(0, 50), 7, 2.0),   # same hour-bucket, later → wins
        (3, _ts(4, 0), 7, 9.0),    # hours 1..3 are gaps carrying 2.0
    ]
    out = {(r.bucket - rows[0][1].replace(minute=0).timestamp()
            * 1_000_000 // HOUR_US): (r.v, r.filled)
           for r in resample_locf(_events(spark, rows)).collect()}
    vals = sorted(out.items())
    assert [(int(k), (float(v), f)) for k, (v, f) in vals] == [
        (0, (2.0, 0)), (1, (2.0, 1)), (2, (2.0, 1)), (3, (2.0, 1)),
        (4, (9.0, 0))]


def test_resample_locf_in_bucket_tiebreak_on_event_id(spark):
    """Identical timestamps inside one bucket: the higher event_id wins
    (deterministic under ties)."""
    rows = [(1, _ts(5), 1, 10.0), (2, _ts(5), 1, 20.0)]
    out = resample_locf(_events(spark, rows)).collect()
    assert len(out) == 1 and float(out[0].v) == 20.0


def test_resample_locf_single_observation_key(spark):
    """A key with one event yields exactly its own bucket, unfilled."""
    rows = [(1, _ts(3), 42, 5.5)]
    out = resample_locf(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].user_id == 42 and out[0].filled == 0
    assert float(out[0].v) == 5.5


def test_rolling_anomaly_matches_python_model(spark):
    """Spark flags == a literal python run of the cross-multiplied test
    against the 6 PRECEDING rows, over a spike-in-noisy-series fixture.
    The spike is flagged; the rows after it (whose frames contain the
    spike) follow whatever the model says; cold-start partial frames
    never flag."""
    vals = [10.0, 10.5, 9.5, 10.0, 10.25, 9.75, 10.0,
            50.0, 10.0, 10.5, 9.5, 10.0, 10.25, 9.75, 10.0]
    rows = [(i, _ts(i % 24), 1, v) for i, v in enumerate(vals)]
    got = {r.event_id for r in
           rolling_anomaly(_events(spark, rows), frame=6,
                           k_sigma=3).collect()}

    flagged = set()
    cents = [int(Decimal(str(v)).quantize(Decimal("0.01")) * 100)
             for v in vals]
    for i in range(len(cents)):
        fr = cents[max(0, i - 6):i]
        n, s, ss = len(fr), sum(fr), sum(c * c for c in fr)
        if n == 6 and (n * cents[i] - s) ** 2 > 9 * (n * ss - s * s):
            flagged.add(i)
    assert 7 in flagged            # the spike is caught
    assert got == flagged


def test_rolling_anomaly_zero_variance_history_flags_departure(spark):
    """A perfectly flat history gives bound = 0 — ANY departure flags
    (infinite z), continuation does not."""
    vals = [5.0] * 8 + [5.01] + [5.0] * 3
    rows = [(i, _ts(i % 24), 1, v) for i, v in enumerate(vals)]
    got = {r.event_id for r in
           rolling_anomaly(_events(spark, rows)).collect()}
    assert got == {8}


def test_rolling_anomaly_flat_series_never_flags(spark):
    rows = [(i, _ts(i % 24), 1, 3.0) for i in range(20)]
    assert rolling_anomaly(_events(spark, rows)).count() == 0


def test_transition_counts_shares_and_terminals(spark):
    """Counts follow per-key (ts, order) adjacency; terminal events emit
    no pair; ppm shares are exact integer division per source state."""
    rows = [
        # user 1: a -> b -> a   |  user 2: a -> b
        (1, _ts(1), 1, "a"), (2, _ts(2), 1, "b"), (3, _ts(3), 1, "a"),
        (4, _ts(1), 2, "a"), (5, _ts(2), 2, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    got = {(r.from_state, r.to_state): (r.n, r.share_ppm)
           for r in transition_counts(ev).collect()}
    assert got == {("a", "b"): (2, 1_000_000),
                   ("b", "a"): (1, 1_000_000)}


# --- hypothesis sweep: resample_locf vs a literal python model ----------

from hypothesis import HealthCheck, given, settings as hyp_settings
from hypothesis import strategies as st

_EVENTS = st.lists(
    st.tuples(st.integers(0, 2),            # user
              st.integers(0, 60),           # hour offset
              st.integers(0, 59),           # minute
              st.integers(0, 30000)),       # centi-value
    min_size=1, max_size=25)


@hyp_settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_EVENTS)
@pytest.mark.heavy
def test_resample_locf_matches_python_model(spark, evs):
    """For random event sets (duplicate (user, hour, minute) tuples
    allowed — event_id breaks the tie), the Spark grid equals a literal
    python LOCF: per user, hourly buckets from first to last observed,
    value = latest observation at or before the bucket."""
    rows = [(i, _ts(0) + dt.timedelta(hours=h, minutes=m), u, cv / 100.0)
            for i, (u, h, m, cv) in enumerate(evs)]
    got = {(r.user_id, int(r.bucket)): (float(r.v), r.filled)
           for r in resample_locf(_events(spark, rows)).collect()}

    base = int(_ts(0).replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    model = {}
    by_user = {}
    for i, (u, h, m, cv) in enumerate(evs):
        by_user.setdefault(u, []).append((h, m, i, cv))
    for u, obs in by_user.items():
        # latest (ts, event_id) per hour bucket
        per_bucket = {}
        for h, m, i, cv in obs:
            cur = per_bucket.get(h)
            if cur is None or (m, i) > cur[0]:
                per_bucket[h] = ((m, i), cv)
        hours = sorted(per_bucket)
        last = None
        for h in range(hours[0], hours[-1] + 1):
            if h in per_bucket:
                last = per_bucket[h][1]
                model[(u, base + h)] = (last / 100.0, 0)
            else:
                model[(u, base + h)] = (last / 100.0, 1)
    assert got == model


def test_streaming_anomaly_matches_batch(spark, tmp_path):
    """The stateful streaming detector flags EXACTLY the rows the batch
    operator flags when the stream arrives in order — the trailing
    frame survives micro-batch boundaries in the state store (the
    fixture splits mid-frame on purpose)."""
    import json as _json

    from mysql_ch_replicator_spark.streaming.stateful import (
        streaming_rolling_anomaly)

    vals = [10.0, 10.5, 9.5, 10.0, 10.25, 9.75, 10.0,
            50.0, 10.0, 10.5, 9.5, 10.0, 48.0, 9.75, 10.0]
    rows = [(i, _ts(i % 24), 1 + (i % 2) * 41, v)
            for i, v in enumerate(vals)]
    batch_flags = {(r.user_id, r.event_id) for r in
                   rolling_anomaly(_events(spark, rows)).collect()}

    src = tmp_path / "src"
    src.mkdir()

    def _write(fname, chunk):
        with open(src / fname, "w") as fh:
            for eid, ts, uid, v in chunk:
                fh.write(_json.dumps({
                    "event_id": eid, "ts": ts.isoformat(),
                    "user_id": uid, "value": v}) + "\n")

    # the second file lands only after trigger 1 commits — two same-mtime
    # files can list in either order, which would break the in-order
    # arrival contract the operator documents
    _write("a.jsonl", rows[:9])
    stream = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "value double")
              .option("maxFilesPerTrigger", 1)
              .json(str(src)))
    out = streaming_rolling_anomaly(stream)
    q = (out.writeStream.format("memory").queryName("anom_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        _write("b.jsonl", rows[9:])
        q.processAllAvailable()
        stream_flags = {(r.key, r.oid)
                        for r in spark.table("anom_out").collect()}
    finally:
        q.stop()
    assert stream_flags == batch_flags and batch_flags


def test_streaming_anomaly_multichunk_group_order():
    """applyInPandasWithState hands a key's micro-batch to the update
    function as MULTIPLE Arrow chunks whose order does not follow
    (ts, oid) — the shuffle that groups the key preserves nothing.  The
    update must buffer the whole group and sort ONCE; sorting each chunk
    independently feeds the state buffer out of order across chunk
    boundaries and diverges from the batch operator.  This drives the
    update function directly with adversarially-split, shuffled chunks
    (the streaming harness can't force chunking below ~10k rows)."""
    import pandas as pd

    from mysql_ch_replicator_spark.streaming.stateful import (
        _make_anomaly_update)

    class _FakeState:
        exists = False

        def update(self, value):
            self.exists = True
            self.get = value

    vals = [10.0, 10.5, 9.5, 10.0, 10.25, 9.75, 10.0,
            50.0, 10.0, 10.5, 9.5, 10.0, 48.0, 9.75, 10.0]
    rows = [(i, pd.Timestamp(2024, 1, 1, i % 24), int(v * 100))
            for i, v in enumerate(vals)]

    def _run(chunking):
        upd = _make_anomaly_update(frame=6, k_sigma=3)
        state = _FakeState()
        chunks = [pd.DataFrame(chunk, columns=["oid", "ts", "v100"])
                  for chunk in chunking]
        flags = set()
        for out in upd((7,), iter(chunks), state):
            flags |= {(int(o), int(v)) for o, v in
                      zip(out["oid"], out["v100"])}
        return flags, list(state.get[0])

    in_order_flags, in_order_buf = _run([rows])
    assert in_order_flags  # the fixture must actually flag something
    # chunks delivered out of order AND each chunk internally shuffled —
    # only a whole-group sort recovers (ts, oid) order
    scrambled = [rows[9:12][::-1], [rows[14], rows[12], rows[13]],
                 rows[4:9][::-1], rows[0:4][::-1]]
    got_flags, got_buf = _run(scrambled)
    assert got_flags == in_order_flags
    assert got_buf == in_order_buf


# ---------------------------------------------------------------------------
# OHLC bars
# ---------------------------------------------------------------------------

def test_ohlc_bars_open_close_by_time_then_id(spark):
    """Open is the earliest (ts, event_id) value, close the latest; high/
    low/n/sum are over the whole bar; centi-unit arithmetic is exact."""
    from mysql_ch_replicator_spark.operators.timeseries import ohlc_bars
    rows = [
        (1, _ts(0, 5), 7, 3.25),    # open
        (2, _ts(0, 20), 7, 9.50),   # high
        (3, _ts(0, 40), 7, 1.75),   # low
        (4, _ts(0, 55), 7, 4.00),   # close
        (5, _ts(2, 0), 7, 8.00),    # separate bar
    ]
    out = {r.bucket: r for r in
           ohlc_bars(_events(spark, rows), key="user_id").collect()}
    b0 = min(out)
    bar = out[b0]
    assert (bar.open100, bar.high100, bar.low100, bar.close100) == \
        (325, 950, 175, 400)
    assert bar.n == 4 and bar.vol100 == "1850"
    lone = out[b0 + 2]
    assert (lone.open100, lone.close100, lone.n) == (800, 800, 1)


def test_ohlc_bars_tie_timestamps_break_on_event_id(spark):
    """Two observations at the identical timestamp: the lower event_id is
    the open, the higher the close — deterministic under ties."""
    from mysql_ch_replicator_spark.operators.timeseries import ohlc_bars
    rows = [(2, _ts(1), 1, 20.0), (1, _ts(1), 1, 10.0)]
    out = ohlc_bars(_events(spark, rows), key="user_id").collect()
    assert len(out) == 1
    assert out[0].open100 == 1000 and out[0].close100 == 2000


# ---------------------------------------------------------------------------
# Activity streaks (gaps-and-islands)
# ---------------------------------------------------------------------------

def _day_events(spark, user_days):
    rows = [(i, dt.datetime(2024, 1, 1 + d, 12), u, 1.0)
            for i, (u, d) in enumerate(user_days)]
    return _events(spark, rows)


def test_activity_streaks_islands_and_longest(spark):
    """Days {0,1,2, 5,6, 10} → 6 active days in 3 streaks, longest 3
    starting at day 0; multiple events on one day collapse."""
    from mysql_ch_replicator_spark.operators.timeseries import (
        activity_streaks)
    days = [(7, 0), (7, 0), (7, 1), (7, 2), (7, 5), (7, 6), (7, 10)]
    out = activity_streaks(_day_events(spark, days)).collect()
    assert len(out) == 1
    r = out[0]
    base = r.longest_start  # epoch day of 2024-01-01
    assert (r.n_active_days, r.n_streaks, r.max_streak) == (6, 3, 3)
    # longest streak starts on the FIRST day (2024-01-01)
    assert base == dt.date(2024, 1, 1).toordinal() - \
        dt.date(1970, 1, 1).toordinal()


def test_activity_streaks_equal_length_tie_earliest_start(spark):
    """Two streaks of equal maximal length: the EARLIER start is
    reported — the tie-break is total, so the result is deterministic."""
    from mysql_ch_replicator_spark.operators.timeseries import (
        activity_streaks)
    days = [(1, 3), (1, 4), (1, 8), (1, 9)]
    r = activity_streaks(_day_events(spark, days)).collect()[0]
    assert r.max_streak == 2 and r.n_streaks == 2
    epoch0 = dt.date(1970, 1, 1).toordinal()
    assert r.longest_start == dt.date(2024, 1, 4).toordinal() - epoch0


# ---------------------------------------------------------------------------
# windowFunnel
# ---------------------------------------------------------------------------

def test_window_funnel_exact_not_first_occurrence(spark):
    """The level is the max over ALL candidate starts: a user whose
    FIRST view leads nowhere but whose second view completes the chain
    must reach level 3 — exactly what the first-occurrence heuristic
    (q_event_funnel_firstpass) gets wrong. Window cutoff and same-timestamp
    (event_id-ordered) chains are exercised too."""
    from mysql_ch_replicator_spark.operators.timeseries import (
        window_funnel)
    W = 10_000_000  # 10 s
    rows = []

    def ev(eid, sec, user, et):
        rows.append((eid, dt.datetime(2024, 1, 1, 0, 0, sec), user, et))

    # user 1: view@0 click@2 purchase@50 → purchase outside 10 s → lvl 2
    ev(1, 0, 1, "view"); ev(2, 2, 1, "click"); ev(3, 50, 1, "purchase")
    # user 2: first view@0 fails, view@40 click@42 purchase@44 → lvl 3
    ev(4, 0, 2, "view"); ev(5, 40, 2, "view")
    ev(6, 42, 2, "click"); ev(7, 44, 2, "purchase")
    # user 3: no view at all → lvl 0
    ev(8, 5, 3, "click"); ev(9, 6, 3, "purchase")
    # user 4: view only → lvl 1
    ev(10, 0, 4, "view")
    # user 5: all three at the SAME timestamp, ordered by event_id → lvl 3
    ev(11, 7, 5, "view"); ev(12, 7, 5, "click"); ev(13, 7, 5, "purchase")

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, et string")
    out = {r.level: r.n_users
           for r in window_funnel(df, ["view", "click", "purchase"], W,
                                  state_col="et").collect()}
    assert out == {0: 1, 1: 1, 2: 1, 3: 2}


def test_window_funnel_strictly_ordered_never_reuses_event(spark):
    """A single event can't satisfy two steps, and steps must move
    strictly forward in (ts, event_id): click BEFORE the view does not
    count."""
    from mysql_ch_replicator_spark.operators.timeseries import (
        window_funnel)
    rows = [
        (2, dt.datetime(2024, 1, 1, 0, 0, 1), 1, "click"),
        (3, dt.datetime(2024, 1, 1, 0, 0, 2), 1, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, et string")
    out = {r.level: r.n_users
           for r in window_funnel(df, ["view", "click"], 10_000_000,
                                  state_col="et").collect()}
    assert out == {0: 0, 1: 1, 2: 0}


# ---------------------------------------------------------------------------
# TWAP
# ---------------------------------------------------------------------------

def test_twap_duration_weighting_beats_plain_avg(spark):
    """Value 10 held for 9 s then value 100 held for 1 s: TWAP is 19,
    not the plain average 55. The final observation (no successor)
    contributes nothing."""
    from mysql_ch_replicator_spark.operators.timeseries import twap
    rows = [
        (1, _ts(0, 0, 0), 7, 10.0),   # holds 9 s
        (2, _ts(0, 0, 9), 7, 100.0),  # holds 1 s
        (3, _ts(0, 0, 10), 7, 999.0), # last: no duration, no weight
    ]
    out = twap(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_intervals == 2 and r.dur_us == 10_000_000
    # (1000*9e6 + 10000*1e6) div 10e6 = 1900 centi-units = 19.00
    assert r.twap100 == 1900


def test_twap_zero_duration_and_single_event(spark):
    """Equal timestamps weigh zero; a key with one event (no interval)
    emits nothing; an all-zero-duration bucket is filtered, not a
    divide-by-zero."""
    from mysql_ch_replicator_spark.operators.timeseries import twap
    rows = [
        (1, _ts(1), 1, 5.0), (2, _ts(1), 1, 7.0),   # zero-length only
        (3, _ts(2), 2, 3.0),                        # single event
    ]
    out = twap(_events(spark, rows)).collect()
    assert out == []


# ---------------------------------------------------------------------------
# Linear attribution
# ---------------------------------------------------------------------------

def _attr_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def test_attribution_conserves_mass_and_window(spark):
    """Credits per conversion sum EXACTLY to v100 (remainder goes to the
    most recent touches); touches outside the window or after the
    conversion get nothing."""
    from mysql_ch_replicator_spark.operators.timeseries import (
        linear_attribution)
    W = 10_000_000  # 10 s
    rows = [
        (1, _ts(0, 0, 0), 7, "view", 0.0),    # in window
        (2, _ts(0, 0, 5), 7, "click", 0.0),   # in window (most recent)
        (3, _ts(0, 0, 8), 7, "purchase", 1.01),  # v100 = 101
        (4, _ts(0, 1, 0), 7, "click", 0.0),   # AFTER conversion: ignored
        (5, _ts(2, 0, 0), 8, "view", 0.0),    # stale for user 8's conv
        (6, _ts(3, 0, 0), 8, "purchase", 5.0),  # no touch in window
    ]
    out = linear_attribution(_attr_events(spark, rows),
                             ["view", "click"], "purchase", W).collect()
    by_touch = {r.touch_id: r for r in out}
    assert set(by_touch) == {1, 2}
    # 101 div 2 = 50 each, remainder 1 -> most recent touch (id 2)
    assert by_touch[1].credit100 == 50
    assert by_touch[2].credit100 == 51
    assert all(r.n_touches == 2 and r.conv_id == 3 for r in out)
    assert sum(r.credit100 for r in out) == 101


def test_attribution_same_timestamp_strictly_before(spark):
    """A touch at the conversion's exact timestamp counts only when its
    event_id is lower (strictly-before in the (ts, id) total order)."""
    from mysql_ch_replicator_spark.operators.timeseries import (
        linear_attribution)
    rows = [
        (1, _ts(1), 1, "click", 0.0),
        (2, _ts(1), 1, "purchase", 2.0),
        (3, _ts(1), 1, "click", 0.0),   # higher id: NOT before
    ]
    out = linear_attribution(_attr_events(spark, rows),
                             ["view", "click"], "purchase",
                             10_000_000).collect()
    assert [r.touch_id for r in out] == [1]
    assert out[0].credit100 == 200


def test_attribution_conserves_mass_for_refunds(spark):
    """NEGATIVE conversions (refunds): floor semantics keep the
    conservation law n·floor(v/n) + pmod(v, n) == v — credits still sum
    exactly to v100 (the truncating form loses a centi-unit and
    diverges from the flooring oracle)."""
    from mysql_ch_replicator_spark.operators.timeseries import (
        linear_attribution)
    rows = [
        (1, _ts(0, 0, 0), 7, "view", 0.0),
        (2, _ts(0, 0, 5), 7, "click", 0.0),
        (3, _ts(0, 0, 8), 7, "purchase", -1.01),   # v100 = -101
    ]
    out = linear_attribution(_attr_events(spark, rows),
                             ["view", "click"], "purchase",
                             10_000_000).collect()
    assert sum(r.credit100 for r in out) == -101
    # floor(-101/2) = -51 each, pmod(-101, 2) = 1 -> most recent +1
    by_touch = {r.touch_id: r.credit100 for r in out}
    assert by_touch == {1: -51, 2: -50}


def test_twap_floors_negative_weighted_sums(spark):
    """Negative values: TWAP floors (both engines' plain integer
    division truncates toward zero, so both sides subtract the
    positive modulus first)."""
    from mysql_ch_replicator_spark.operators.timeseries import twap
    rows = [
        (1, _ts(0, 0, 0), 7, -0.09),   # -9 centi-units for 1 s
        (2, _ts(0, 0, 1), 7, -0.10),   # -10 for 1 s
        (3, _ts(0, 0, 2), 7, 0.0),
    ]
    out = twap(_events(spark, rows)).collect()
    assert len(out) == 1
    # sum_vdt = (-9 - 10) * 1e6, sum_dt = 2e6 -> floor(-9.5) = -10
    assert out[0].twap100 == -10


def test_funnel_latency_fastest_start_wins(spark):
    """Two completed chains for one user: the reported duration is the
    FASTEST (min over candidate starts), not the first; users who never
    complete contribute nothing."""
    from mysql_ch_replicator_spark.operators.timeseries import (
        funnel_latency)
    rows = []

    def ev(eid, sec, user, et):
        rows.append((eid, dt.datetime(2024, 1, 1, 0, 0, sec), user, et))

    # user 1: slow chain from view@0 (dur 8 s), fast from view@20 (2 s)
    ev(1, 0, 1, "view"); ev(2, 4, 1, "click"); ev(3, 8, 1, "purchase")
    ev(4, 20, 1, "view"); ev(5, 21, 1, "click"); ev(6, 22, 1, "purchase")
    # user 2: never completes
    ev(7, 0, 2, "view"); ev(8, 1, 2, "click")
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, et string")
    out = funnel_latency(df, ["view", "click", "purchase"],
                         window_us=10_000_000, bucket_us=1_000_000,
                         state_col="et").collect()
    assert {(r.dur_bucket, r.n_users) for r in out} == {(2, 1)}


# ---------------------------------------------------------------------------
# Trend slope
# ---------------------------------------------------------------------------

def test_trend_slope_matches_hand_ols(spark):
    """Exact OLS numerator/denominator on a crafted series, including a
    NEGATIVE trend whose slope_milli must floor (not truncate)."""
    from mysql_ch_replicator_spark.operators.timeseries import trend_slope
    # user 7: y100 = [300, 200, 100] at x = hours h, h+1, h+2 (falling)
    rows = [
        (1, _ts(0, 30), 7, 3.0),
        (2, _ts(1, 30), 7, 2.0),
        (3, _ts(2, 30), 7, 1.0),
        (4, _ts(0, 0), 8, 5.0),   # single-hour user: den = 0, excluded
        (5, _ts(0, 59), 8, 9.0),
    ]
    out = {r.user_id: r for r in trend_slope(_events(spark, rows))
           .collect()}
    assert set(out) == {7}
    r = out[7]
    # shifted x is irrelevant to the slope: num/den = -100 per hour
    assert int(r.slope_num) / int(r.slope_den) == -100.0
    assert r.slope_milli == -100_000
    assert r.n == 3


def test_trend_slope_floor_on_non_exact_negative(spark):
    """Two points three hours apart, value falling one centi-unit:
    slope = −1/3 centi-units per hour → slope_milli = floor(−1000/3) =
    −334; a truncating quotient would report −333."""
    from mysql_ch_replicator_spark.operators.timeseries import trend_slope
    rows = [
        (1, _ts(0, 0), 1, 0.0),
        (2, _ts(3, 0), 1, -0.01),
    ]
    r = trend_slope(_events(spark, rows)).collect()[0]
    assert r.slope_milli == -334


def test_volume_correlation_perfect_and_degenerate(spark):
    """Perfectly correlated daily volumes → r² = 1e6 ppm with sign +1;
    perfectly anti-correlated → sign −1; a zero-variance side yields no
    row (not 0/0)."""
    from mysql_ch_replicator_spark.operators.timeseries import (
        volume_correlation)

    def mk(day_counts):
        rows, eid = [], 0
        for day, (a, b) in enumerate(day_counts):
            for _ in range(a):
                eid += 1
                rows.append((eid, dt.datetime(2024, 1, 1 + day, 1),
                             1, "click", 0.0))
            for _ in range(b):
                eid += 1
                rows.append((eid, dt.datetime(2024, 1, 1 + day, 2),
                             1, "purchase", 0.0))
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double")

    # y = 2x exactly → r² = 1, positive
    r = volume_correlation(mk([(1, 2), (2, 4), (3, 6)]),
                           "click", "purchase").collect()[0]
    assert (r.sign, r.r2_ppm) == (1, 1_000_000)
    # anti-correlated
    r = volume_correlation(mk([(1, 3), (2, 2), (3, 1)]),
                           "click", "purchase").collect()[0]
    assert (r.sign, r.r2_ppm) == (-1, 1_000_000)
    # constant clicks: zero variance → empty
    assert volume_correlation(mk([(2, 1), (2, 5), (2, 3)]),
                              "click", "purchase").count() == 0


def test_seasonal_anomaly_loo_baseline_fires(spark):
    """A spike at a phase whose OTHER observations are constant must
    flag (LOO: zero-variance history → any departure fires); the same
    value tested against a self-INCLUSIVE baseline would dampen. Rows
    at phases with under min_history other observations never flag."""
    from mysql_ch_replicator_spark.operators.timeseries import (
        seasonal_anomaly)
    rows = []
    # user 1, hour-3 history: 10.0 on six days, then one 50.0 spike
    for d in range(6):
        rows.append((d, dt.datetime(2024, 1, 1 + d, 3), 1, 10.0))
    rows.append((99, dt.datetime(2024, 1, 7, 3), 1, 50.0))
    # user 2: only 3 observations at its phase -> below min_history
    for d in range(3):
        rows.append((200 + d, dt.datetime(2024, 1, 1 + d, 5), 2, 9999.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    out = seasonal_anomaly(df).collect()
    assert [(r.user_id, r.event_id, r.phase) for r in out] == [(1, 99, 3)]


def test_seasonal_anomaly_constant_history_never_flags_itself(spark):
    """All-identical values at a phase: zero deviation for every row —
    nothing flags (dev2 = 0 is not > bound = 0)."""
    from mysql_ch_replicator_spark.operators.timeseries import (
        seasonal_anomaly)
    rows = [(d, dt.datetime(2024, 1, 1 + d, 4), 1, 7.0)
            for d in range(8)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    assert seasonal_anomaly(df).count() == 0


# --- hypothesis sweep: window_funnel vs exhaustive chain search ----------

_FUNNEL_EVS = st.lists(
    st.tuples(st.integers(0, 2),     # user
              st.integers(0, 120),   # second offset
              st.integers(0, 2)),    # step index: 0=view 1=click 2=buy
    min_size=1, max_size=14)


def _brute_funnel_level(evs_for_user, window_s, steps=3):
    """Exhaustive max funnel level: try every strictly-(ts, id)-
    increasing chain matching the step prefix within window_s of its
    first element — no greedy assumption anywhere."""
    # events as (sec, idx, step), ordered arbitrarily; chains ordered by
    # (sec, idx) strictly increasing
    best = 0

    def extend(chain_last, next_step, t1):
        nonlocal best
        best = max(best, next_step)   # reached next_step steps so far
        if next_step == steps:
            return
        for e in evs_for_user:
            if e[2] != next_step:
                continue
            if not (e[:2] > chain_last):
                continue
            if e[0] > t1 + window_s:
                continue
            extend(e[:2], next_step + 1, t1)

    for e in evs_for_user:
        if e[2] == 0:
            extend(e[:2], 1, e[0])
    return best


@pytest.mark.heavy
@hyp_settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_FUNNEL_EVS, st.integers(5, 90))
def test_window_funnel_matches_exhaustive_search(spark, evs, window_s):
    """The operator's greedy-per-start level equals an EXHAUSTIVE
    search over all valid chains — the optimality argument checked
    empirically on random event sets, including same-timestamp ties."""
    from mysql_ch_replicator_spark.operators.timeseries import (
        window_funnel)
    names = ["view", "click", "purchase"]
    rows = [(i, _ts(0) + dt.timedelta(seconds=sec), u, names[stp])
            for i, (u, sec, stp) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    got = {r.level: r.n_users
           for r in window_funnel(df, names, window_s * 1_000_000,
                                  state_col="event_type").collect()}

    by_user = {}
    for i, (u, sec, stp) in enumerate(evs):
        by_user.setdefault(u, []).append((sec, i, stp))
    want = {lvl: 0 for lvl in range(4)}
    for u, es in by_user.items():
        want[_brute_funnel_level(es, window_s)] += 1
    assert {k: v for k, v in got.items()} == want
