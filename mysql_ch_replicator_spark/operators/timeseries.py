"""Time-series operators: gap-filling resample (last-observation-carried-
forward), exact rolling-window anomaly detection, and event-sequence
transition mining.

The reference engine's users run its replica tables through downstream
OLAP dashboards (reference test queries aggregate `events`-shaped CDC
output by time bucket); these operators cover the canonical time-series
follow-ons a training-data / metrics pipeline needs on top of that:

- ``resample_locf``: regularize an irregular event stream onto a dense
  per-key time grid, carrying the last observation forward into gap
  buckets. The 100 TB shape matters: we never build the dense grid as a
  table-to-table join. Each key's observed buckets are range-expanded
  *from the observation rows themselves* (`lead` gives the gap run
  length, `sequence` emits the carried buckets), so the plan is one
  combining aggregate on (key, bucket) + one window on key + one
  explode — no grid materialization, no second join, and the explode
  fan-out equals exactly the number of emitted grid rows.
- ``rolling_anomaly``: per-key rolling z-score over a bounded ROWS
  frame, computed in exact integer arithmetic (the cross-multiplied
  form ``(n·v − s)² > K²·(n·ss − s²)`` avoids float mean/stddev whose
  summation order diverges between engines). One shuffle on the key,
  shared by the frame window.
- ``transition_counts``: per-key ordered (state → next state) pair
  counts with exact ppm shares — the Markov-chain mining primitive for
  session analysis. One window on the key + one combining aggregate on
  the (from, to) pair.

All arithmetic is engine-portable: DECIMAL(18,2) value ingestion (the
same convention as q_running_totals), integer microsecond bucketing,
and integer `div` ratios — every output hashes bit-identically against
the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Microseconds per hour / day — integer bucket arithmetic everywhere.
HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def _bucket(ts_col: str, bucket_us: int) -> Column:
    """Epoch-aligned integer bucket index: unix_micros(ts) div bucket.
    Positive timestamps, so the truncating integer divisions (both
    Spark `div` and DuckDB `//` truncate toward zero) equal floor."""
    return F.expr(f"unix_micros({ts_col}) div {bucket_us}")


def resample_locf(events: DataFrame, key: str = "user_id",
                  ts_col: str = "ts", value_col: str = "value",
                  order_col: str = "event_id",
                  bucket_us: int = HOUR_US) -> DataFrame:
    """Dense per-key time grid with last-observation-carried-forward.

    Returns (key, bucket, v, filled): one row per bucket in the key's
    observed range [first bucket, last bucket]; ``v`` is the value of
    the latest observation at or before the bucket (latest by (ts,
    order_col) — deterministic under ties); ``filled`` is 1 for gap
    buckets whose value was carried, 0 for observed buckets.

    Plan shape (the part that matters at 100 TB): the per-bucket "last
    observation" is ONE combining aggregate (max_by over a struct key —
    map-side partials absorb per-bucket multiplicity before the
    shuffle); the gap run length comes from a single `lead` window on
    the key; the carried rows are emitted by exploding
    ``sequence(b, next_b − 1)`` — the dense grid never exists as a
    join input, so there is no (key, bucket)-keyed second shuffle and
    no key×span grid materialization ahead of the filter. The sequence
    array is staged through a projection boundary before the explode
    (Generate re-evaluates its child per emitted element under
    codegen — the round-7 cap-audit lesson)."""
    from ..cache import transient_persist

    v = F.col(value_col).cast("decimal(18,2)")
    obs = events.select(
        F.col(key).alias("k"),
        _bucket(ts_col, bucket_us).alias("b"),
        v.alias("v"),
        F.struct(F.col(ts_col), F.col(order_col)).alias("ord"))
    last = (obs.groupBy("k", "b")
            .agg(F.max_by("v", "ord").alias("v")))
    w = Window.partitionBy("k").orderBy("b")
    ranged = last.withColumn("nb", F.lead("b").over(w))
    # stage the sequence array behind a persist so the Generate child is
    # a cheap attribute reference, not a re-evaluated array constructor
    staged = transient_persist(ranged.select(
        "k", "b", "v",
        F.sequence(F.col("b"),
                   F.coalesce(F.col("nb") - 1, F.col("b"))).alias("bs")))
    out = staged.select(
        "k", "b", "v", F.explode("bs").alias("gb"))
    return out.select(
        F.col("k").alias(key),
        F.col("gb").alias("bucket"),
        F.col("v"),
        (F.col("gb") > F.col("b")).cast("int").alias("filled"))


def rolling_anomaly(events: DataFrame, key: str = "user_id",
                    ts_col: str = "ts", value_col: str = "value",
                    order_col: str = "event_id",
                    frame: int = 6, k_sigma: int = 3) -> DataFrame:
    """Per-key rolling z-score outliers over a ROWS frame, exact.

    A row is anomalous when its value deviates from the rolling mean of
    the ``frame`` PRECEDING observations by more than ``k_sigma``
    population standard deviations. The frame deliberately EXCLUDES the
    current row: a self-inclusive frame caps the achievable z at
    sqrt(n-1) (a lone spike inflates its own sigma), so k=3 over a
    7-row self-inclusive frame could never fire at all. Against the
    preceding frame the spike's deviation is unbounded and a
    zero-variance history flags ANY departure — the behavior an alert
    actually wants. The test is the cross-multiplied integer form

        (n·v − s)² > k²·(n·ss − s²)

    over centi-units (``CAST(value AS DECIMAL(18,2)) · 100`` — exact in
    both engines), so no float mean/variance ever exists and the verdict
    is bit-stable at any scale. Sums take decimal(38,0) INPUT (a sum
    over long wraps silently in Spark's non-ANSI mode while DuckDB
    promotes to HUGEINT — the round-7 overflow lesson), though the
    bounded frame keeps magnitudes tiny here.

    Only rows with a FULL preceding frame (n = frame) are eligible — a
    cold start would flag the first points of every key. Returns the
    flagged rows only: (key, order_col, v100, dev2, bound) with the two
    sides of the inequality as decimal strings for audit.

    One shuffle on the key, shared by the single window; the aggregate
    state is 3 numbers per frame position — O(frame) memory per row,
    independent of data volume."""
    dec = "decimal(38,0)"
    v100 = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    w = (Window.partitionBy("k")
         .orderBy(F.col(ts_col), F.col("oid"))
         .rowsBetween(-frame, -1))
    staged = events.select(
        F.col(key).alias("k"),
        F.col(order_col).alias("oid"),
        F.col(ts_col),
        v100.alias("v"))
    framed = staged.select(
        "k", "oid", "v",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(F.col("v").cast(dec)).over(w).alias("s"),
        # square AFTER the decimal cast — long·long wraps silently first
        F.sum(F.col("v").cast(dec) * F.col("v").cast(dec))
         .over(w).cast(dec).alias("ss"))
    n = F.col("n").cast(dec)
    dev = n * F.col("v").cast(dec) - F.col("s")
    dev2 = (dev * dev).cast(dec)
    bound = (F.lit(k_sigma * k_sigma).cast(dec)
             * (n * F.col("ss") - F.col("s") * F.col("s"))).cast(dec)
    return (framed
            .where(F.col("n") == frame)
            .where(dev2 > bound)
            .select(F.col("k").alias(key), F.col("oid").alias(order_col),
                    F.col("v").alias("v100"),
                    dev2.cast("string").alias("dev2"),
                    bound.cast("string").alias("bound")))


def transition_counts(events: DataFrame, key: str = "user_id",
                      state_col: str = "event_type",
                      ts_col: str = "ts",
                      order_col: str = "event_id") -> DataFrame:
    """Markov transition matrix over per-key ordered state sequences.

    For each key's events ordered by (ts, order_col), count the
    (state → next state) adjacent pairs, then report each pair's count
    and its exact parts-per-million share of all transitions leaving
    the source state (integer ``div`` — floor on positives in both
    engines, no float ratio). Terminal events (no successor within the
    key) contribute no pair.

    One window on the key for `lead`, one combining aggregate on the
    (from, to) pair — state alphabets are tiny relative to data, so the
    pair aggregate's map-side partials collapse virtually all rows
    before the shuffle. The per-source total rides a second window over
    the AGGREGATED pairs (|states|² rows), not the raw events."""
    w = Window.partitionBy("k").orderBy(F.col(ts_col), F.col(order_col))
    seq = events.select(
        F.col(key).alias("k"),
        F.col(state_col).alias("from_state"),
        F.col(ts_col), F.col(order_col))
    pairs = (seq
             .withColumn("to_state", F.lead("from_state").over(w))
             .where(F.col("to_state").isNotNull())
             .groupBy("from_state", "to_state")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    per_src = Window.partitionBy("from_state")
    tot = F.sum("n").over(per_src)
    return pairs.select(
        "from_state", "to_state", "n",
        F.expr("1000000 * n").alias("_num"),
        tot.alias("_tot")).select(
        "from_state", "to_state", "n",
        F.expr("_num div _tot").cast("long").alias("share_ppm"))


def ohlc_bars(events: DataFrame, key: str = "event_type",
              ts_col: str = "ts", value_col: str = "value",
              order_col: str = "event_id",
              bucket_us: int = HOUR_US) -> DataFrame:
    """Open/high/low/close downsampling bars — the canonical time-series
    compaction (financial bars, metrics rollups; ClickHouse users get it
    from argMin/argMax over a replica table like the ones this engine
    maintains, reference clickhouse_api.py's versioned tables are
    exactly the argMax pattern).

    Per (key, bucket): the first value (by ts, order_col), running max,
    running min, last value, row count, and the exact value sum. Values
    ride in centi-units (``CAST(value AS DECIMAL(18,2)) * 100`` → long,
    the rolling_anomaly convention — exact in both engines); the sum
    takes decimal(38,0) INPUT so Spark's non-ANSI long sum can never
    wrap at corpus scale.

    Plan shape: ONE combining aggregate on (key, bucket) — min_by /
    max_by over a (ts, order) struct have map-side partials, so per-bar
    multiplicity collapses before the single shuffle. No window, no
    self-join; at 100 TB the exchange carries one row per bar, not per
    event."""
    dec = "decimal(38,0)"
    v100 = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    obs = events.select(
        F.col(key).alias("k"),
        _bucket(ts_col, bucket_us).alias("bucket"),
        v100.alias("v"),
        F.struct(F.col(ts_col), F.col(order_col)).alias("ord"))
    return (obs.groupBy("k", "bucket")
            .agg(F.min_by("v", "ord").cast("long").alias("open100"),
                 F.max("v").cast("long").alias("high100"),
                 F.min("v").cast("long").alias("low100"),
                 F.max_by("v", "ord").cast("long").alias("close100"),
                 F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(F.col("v").cast(dec)).cast(dec)
                  .cast("string").alias("vol100"))
            .withColumnRenamed("k", key))


def activity_streaks(events: DataFrame, key: str = "user_id",
                     ts_col: str = "ts",
                     bucket_us: int = DAY_US) -> DataFrame:
    """Gaps-and-islands consecutive-activity streaks per key.

    A streak is a maximal run of consecutive active buckets (default:
    days with >= 1 event). Returns one row per key: total active days,
    number of distinct streaks, the longest streak's length, and the
    start day of the longest streak (earliest start wins ties — fully
    deterministic). The classic island id is ``day − row_number()``
    over each key's distinct active days: constant within a
    consecutive run, strictly decreasing across gaps.

    Plan shape: the event stream collapses to distinct (key, day) in
    ONE combining aggregate (map-side partials absorb per-day event
    multiplicity — at 100 TB the exchange carries active-days, not
    events); the island window, streak aggregate and per-key rollup all
    reuse the same key partitioning, so no further full-width shuffle
    is introduced."""
    days = (events
            .select(F.col(key).alias("k"),
                    _bucket(ts_col, bucket_us).alias("day"))
            .distinct())
    w = Window.partitionBy("k").orderBy("day")
    islands = days.withColumn(
        "grp", F.col("day") - F.row_number().over(w))
    streaks = (islands.groupBy("k", "grp")
               .agg(F.count(F.lit(1)).cast("long").alias("len"),
                    F.min("day").cast("long").alias("start")))
    # longest streak, earliest start on ties: max over (len, -start)
    best = F.max_by("start", F.struct(F.col("len"), -F.col("start")))
    return (streaks.groupBy("k")
            .agg(F.sum("len").cast("long").alias("n_active_days"),
                 F.count(F.lit(1)).cast("long").alias("n_streaks"),
                 F.max("len").cast("long").alias("max_streak"),
                 best.cast("long").alias("longest_start"))
            .withColumnRenamed("k", key))


def _funnel_pointer_table(events: DataFrame, steps: list[str],
                          key: str, state_col: str, ts_col: str,
                          order_col: str) -> DataFrame:
    """Shared funnel machinery: (k, et, us, oid, rn, nxt2..nxtS) — a
    per-key row_number linearizes (ts, order) so "earliest next step-j
    event" is a MIN over the FOLLOWING rows frame, all pointers from
    ONE window pass; persisted because every chain hop joins it."""
    from ..cache import transient_persist

    base = events.select(
        F.col(key).alias("k"),
        F.col(state_col).alias("et"),
        F.expr(f"unix_micros({ts_col})").alias("us"),
        F.col(order_col).alias("oid"))
    w_rn = Window.partitionBy("k").orderBy("us", "oid")
    base = base.withColumn("rn", F.row_number().over(w_rn))
    w_follow = (Window.partitionBy("k").orderBy("rn")
                .rowsBetween(1, Window.unboundedFollowing))
    for j, s in enumerate(steps[1:], start=2):
        base = base.withColumn(
            f"nxt{j}",
            F.min(F.when(F.col("et") == s, F.col("rn"))).over(w_follow))
    return transient_persist(base)


def funnel_latency(events: DataFrame, steps: list[str], window_us: int,
                   bucket_us: int = 60_000_000,
                   key: str = "user_id", state_col: str = "event_type",
                   ts_col: str = "ts",
                   order_col: str = "event_id") -> DataFrame:
    """Time-to-convert distribution for COMPLETED funnels: per key the
    FASTEST full chain (min over candidate starts of last-step time −
    first-step time, same greedy chains as ``window_funnel`` — greedy
    minimizes each chain's completion for its start, so the per-key min
    over starts is the true fastest conversion), bucketed to
    ``bucket_us`` (default minutes): (dur_bucket, n_users).

    Same plan family as window_funnel: one pointer-table window pass,
    (key, rn) equality hops carrying (t1, last_us), then one per-key MIN
    and a bucket histogram over the per-key aggregate — every exchange
    key-scoped until the final |buckets|-wide count."""
    n_steps = len(steps)
    if n_steps < 2:
        raise ValueError(
            "funnel_latency needs >= 2 steps (a single-step funnel has "
            "no duration); got %r" % (steps,))
    aug = _funnel_pointer_table(events, steps, key, state_col,
                                ts_col, order_col)
    cur = (aug.where(F.col("et") == steps[0])
           .select("k", F.col("us").alias("t1"),
                   F.col("nxt2").alias("p")))
    for j in range(2, n_steps + 1):
        nxt = f"nxt{j + 1}" if j < n_steps else None
        right = aug.select(F.col("k").alias("rk"), "rn", "us",
                           *([F.col(nxt).alias("np")] if nxt else []))
        cur = (cur.join(right, (F.col("k") == F.col("rk"))
                        & (F.col("p") == F.col("rn")))
               .where(F.col("us") <= F.col("t1") + F.lit(window_us))
               .select("k", "t1",
                       (F.col("np") if nxt else F.col("us")).alias(
                           "p" if nxt else "last_us")))
    best = (cur.groupBy("k")
            .agg(F.min(F.col("last_us") - F.col("t1")).alias("best_us")))
    return (best
            .groupBy(F.expr(f"best_us div {bucket_us}")
                     .alias("dur_bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_users")))


def window_funnel(events: DataFrame, steps: list[str], window_us: int,
                  key: str = "user_id", state_col: str = "event_type",
                  ts_col: str = "ts",
                  order_col: str = "event_id") -> DataFrame:
    """ClickHouse ``windowFunnel`` parity: per key, the MAXIMUM funnel
    level reachable by a chain of the given step types occurring in
    strictly increasing (ts, order_col) order with every step inside
    ``window_us`` of the chain's FIRST step; returns the level
    histogram (level, n_users), level 0 = keys with events but no
    step-1 occurrence.

    Exactness without enumeration: every step-1 event is a candidate
    chain start, and for a FIXED start the greedy chain — always take
    the EARLIEST next-step event after the current position — reaches
    the maximum depth (exchange argument: any feasible chain can be
    rewritten step-by-step onto the greedy one without shortening it).
    So the per-key level is exact, not a first-occurrence heuristic
    (compare q_event_funnel_firstpass, the cheap approximation).

    Plan shape, all in ONE partitioning family: a per-key row_number
    linearizes (ts, order) so "earliest next step-k event" becomes a
    MIN over the FOLLOWING rows frame — one window pass computes every
    next-pointer; each chain hop is then an equality join on (key, rn)
    against the persisted pointer table. hashpartitioning(key) satisfies
    every window and every join here (join keys (key, rn) ⊇ partition
    key), so the key-width exchange happens once; hop frames only ever
    shrink. Because rn order equals ts order, a greedy hop whose target
    misses the window proves NO target is inside it — each hop needs
    one comparison, no per-key scan-back."""
    n_steps = len(steps)
    aug = _funnel_pointer_table(events, steps, key, state_col,
                                ts_col, order_col)

    # chain hops: cur carries (k, t1, p = rn of the next step's target)
    cur = (aug.where(F.col("et") == steps[0])
           .select("k", F.col("us").alias("t1"),
                   F.col("nxt2").alias("p")
                   if n_steps >= 2 else F.lit(None).alias("p")))
    reached = [cur.select("k").distinct()
               .agg(F.count(F.lit(1)).cast("long").alias("n"))]
    for j in range(2, n_steps + 1):
        nxt = f"nxt{j + 1}" if j < n_steps else None
        right = aug.select(F.col("k").alias("rk"), "rn", "us",
                           *( [F.col(nxt).alias("np")] if nxt else [] ))
        cur = (cur.join(right, (F.col("k") == F.col("rk"))
                        & (F.col("p") == F.col("rn")))
               .where(F.col("us") <= F.col("t1") + F.lit(window_us))
               .select("k", "t1",
                       (F.col("np") if nxt else F.lit(None)).alias("p")))
        reached.append(cur.select("k").distinct()
                       .agg(F.count(F.lit(1)).cast("long").alias("n")))
    total = (events.select(F.col(key).alias("k")).distinct()
             .agg(F.count(F.lit(1)).cast("long").alias("n")))

    # histogram rows: level j has reached[j-1] - reached[j] users
    parts = [total.crossJoin(F.broadcast(
        reached[0].withColumnRenamed("n", "n1")))
        .select(F.lit(0).cast("long").alias("level"),
                (F.col("n") - F.col("n1")).cast("long").alias("n_users"))]
    for j in range(1, n_steps + 1):
        cur_n = reached[j - 1]
        if j < n_steps:
            parts.append(
                cur_n.crossJoin(F.broadcast(
                    reached[j].withColumnRenamed("n", "n2")))
                .select(F.lit(j).cast("long").alias("level"),
                        (F.col("n") - F.col("n2")).cast("long")
                        .alias("n_users")))
        else:
            parts.append(cur_n.select(
                F.lit(j).cast("long").alias("level"),
                F.col("n").cast("long").alias("n_users")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def twap(events: DataFrame, key: str = "user_id", ts_col: str = "ts",
         value_col: str = "value", order_col: str = "event_id",
         bucket_us: int = DAY_US) -> DataFrame:
    """Time-weighted average value per (key, bucket) — the TWAP/OHLC
    sibling that a plain AVG gets wrong: a value HOLDS from its event
    until the key's next event (the LOCF reading), so each observation
    weighs by its holding duration, not by 1. The last observation of a
    key has no known duration and contributes nothing; zero-length
    intervals (equal timestamps) contribute zero weight — both edges
    deterministic.

    Buckets group by the interval's START time. All-integer: centi-unit
    values, microsecond durations, v·Δt summed over decimal(38,0)
    (an interval product reaches ~10^15; a day of them times 10^12 keys
    is far past int64), and the final TWAP is an exact integer div.

    One lead window on the key + one combining (key, bucket) aggregate —
    the exchange is shared with every other per-key window op."""
    dec = "decimal(38,0)"
    v100 = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    w = Window.partitionBy("k").orderBy("us", "oid")
    staged = events.select(
        F.col(key).alias("k"),
        F.expr(f"unix_micros({ts_col})").alias("us"),
        v100.alias("v"),
        F.col(order_col).alias("oid"))
    iv = (staged
          .withColumn("nus", F.lead("us").over(w))
          .where(F.col("nus").isNotNull())
          .select("k", F.expr(f"us div {bucket_us}").alias("bucket"),
                  "v", (F.col("nus") - F.col("us")).alias("dt")))
    agg = (iv.groupBy("k", "bucket")
           .agg(F.count(F.lit(1)).cast("long").alias("n_intervals"),
                F.sum(F.col("dt").cast(dec)).cast(dec).alias("sum_dt"),
                F.sum(F.col("v").cast(dec) * F.col("dt").cast(dec))
                 .cast(dec).alias("sum_vdt")))
    # filter BEFORE the division: a bucket whose every interval is
    # zero-length would otherwise hit an ANSI divide-by-zero inside the
    # aggregate projection
    return (agg.where(F.col("sum_dt") > 0)
            .select(F.col("k").alias(key), "bucket", "n_intervals",
                    F.col("sum_dt").cast("long").alias("dur_us"),
                    # floor, not truncate, for negative weighted
                    # sums; the oracle floors the same way (both
                    # engines' `//`/`div` truncate toward zero)
                    F.expr("((sum_vdt - pmod(sum_vdt, sum_dt))"
                           " div sum_dt)").cast("long")
                     .alias("twap100")))


def linear_attribution(events: DataFrame, touch_types: list[str],
                       conversion_type: str, window_us: int,
                       key: str = "user_id", state_col: str = "event_type",
                       ts_col: str = "ts", value_col: str = "value",
                       order_col: str = "event_id") -> DataFrame:
    """Multi-touch linear attribution, mass-conserving in exact integers:
    each conversion's centi-unit value splits across ALL its preceding
    touch events within ``window_us``, strictly earlier by (ts, order).
    Floor division leaves a remainder r = v100 mod n — the r most
    RECENT touches get one extra centi-unit, so per-conversion credits
    sum to v100 EXACTLY (testable conservation law; ppm-share schemes
    leak mass by rounding).

    Returns one row per (conversion, touch): conversion id, touch id,
    touch type, n_touches, credit100. Conversions with no touch in
    window emit nothing (the unattributed remainder is the caller's
    count-diff).

    Plan shape: one equality join on the key with the time window as a
    join filter — fan-out bounded by touches-per-window, never
    all-pairs; the per-conversion count and recency rank ride one
    window over the (key-partitioned) joined frame."""
    v100 = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    conv = (events.where(F.col(state_col) == conversion_type)
            .select(F.col(key).alias("k"),
                    F.col(order_col).alias("conv_id"),
                    F.expr(f"unix_micros({ts_col})").alias("cus"),
                    v100.alias("v100")))
    touch = (events.where(F.col(state_col).isin(touch_types))
             .select(F.col(key).alias("tk"),
                     F.col(order_col).alias("touch_id"),
                     F.col(state_col).alias("touch_type"),
                     F.expr(f"unix_micros({ts_col})").alias("tus")))
    j = conv.join(
        touch,
        (F.col("k") == F.col("tk"))
        & ((F.col("tus") < F.col("cus"))
           | ((F.col("tus") == F.col("cus"))
              & (F.col("touch_id") < F.col("conv_id"))))
        & (F.col("tus") >= F.col("cus") - F.lit(window_us)))
    w = Window.partitionBy("k", "conv_id")
    # recency rank: 1 = most recent touch before the conversion
    wr = (Window.partitionBy("k", "conv_id")
          .orderBy(F.col("tus").desc(), F.col("touch_id").desc()))
    ranked = (j.withColumn("n_touches",
                           F.count(F.lit(1)).over(w).cast("long"))
              .withColumn("rk", F.row_number().over(wr).cast("long")))
    # FLOOR semantics throughout so conservation holds for NEGATIVE
    # conversions (refunds) too: n·floor(v/n) + pmod(v, n) == v for any
    # sign. Spark `div` truncates toward zero, so floor-divide by
    # subtracting the positive modulus first (the difference is an exact
    # multiple, where trunc == floor); DuckDB's `//` ALSO truncates and
    # its `%` follows the dividend sign, so the oracle floors the same
    # way: (v − ((v%n)+n)%n) // n with the ((v%n)+n)%n remainder.
    credit = (F.expr("(v100 - pmod(v100, n_touches)) div n_touches")
              + F.when(F.col("rk") <= F.pmod(F.col("v100"),
                                             F.col("n_touches")),
                       F.lit(1)).otherwise(F.lit(0))).cast("long")
    return ranked.select(
        F.col("k").alias(key), "conv_id", "touch_id", "touch_type",
        "n_touches", credit.alias("credit100"))


def trend_slope(events: DataFrame, key: str = "user_id",
                ts_col: str = "ts", value_col: str = "value",
                x_unit_us: int = HOUR_US) -> DataFrame:
    """Per-key least-squares trend in EXACT integer arithmetic: the OLS
    slope is the rational

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    with x = hours-since-epoch (integer) and y = centi-unit values, so
    both numerator and denominator are exact decimal(38,0) integers —
    no float regression exists and the oracle replays it bit-for-bit.
    Reported as (n, slope_num, slope_den decimal-strings, slope_milli =
    floor(1000·num/den) — centi-units per hour, milli-scaled,
    FLOOR-consistent cross-engine for either sign). Keys with a
    degenerate x spread (all events in one hour → den = 0) are
    excluded BEFORE the division.

    ONE combining aggregate over the events — the five sums are
    map-side partials; magnitudes: x ~ 5·10^5 hours, y ~ 10^4, so
    Σxy ~ n·5·10^9 and n·Σx² ~ n²·2.5·10^11 — past int64 at modest n,
    hence every sum takes decimal(38,0) input."""
    dec = "decimal(38,0)"
    x = F.expr(f"unix_micros({ts_col}) div {x_unit_us}").cast(dec)
    y = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long") \
        .cast(dec)
    staged = events.select(F.col(key).alias("k"), x.alias("x"),
                           y.alias("y"))
    agg = (staged.groupBy("k")
           .agg(F.count(F.lit(1)).cast(dec).alias("n"),
                F.sum("x").cast(dec).alias("sx"),
                F.sum("y").cast(dec).alias("sy"),
                F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx")))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast(dec)
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) \
        .cast(dec)
    sized = agg.select(F.col("k").alias(key),
                       F.col("n").cast("long").alias("n"),
                       num.alias("num"), den.alias("den"))
    return (sized.where(F.col("den") > 0)
            .select(key, "n",
                    F.col("num").cast("string").alias("slope_num"),
                    F.col("den").cast("string").alias("slope_den"),
                    F.expr("((1000 * num) - pmod(1000 * num, den)) "
                           "div den").cast("long").alias("slope_milli")))


def volume_correlation(events: DataFrame, type_a: str, type_b: str,
                       state_col: str = "event_type", ts_col: str = "ts",
                       bucket_us: int = DAY_US) -> DataFrame:
    """Exact Pearson correlation between two event types' per-bucket
    volumes, in pure integers: with x/y = the types' daily counts over
    the shared bucket domain,

        r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    — numerator and denominator are exact decimal(38,0) (r itself needs
    a square root, which is float and engine-divergent; r² plus the
    covariance SIGN carries the same decision information). Returns one
    row: (n_buckets, sign, r2_ppm = floor(10⁶·num²/den), plus the raw
    num/den decimal strings for audit). Degenerate series (zero
    variance on either side) yield no row rather than a 0/0.

    Plan: one combining (bucket, type) count over the events, a pivot
    to (x, y) per bucket (missing type in a bucket counts 0 — the
    CORRECT reading of "no events"), then a single 1-row aggregate.
    Nothing wider than |buckets| ever shuffles."""
    dec = "decimal(38,0)"
    counts = (events
              .where(F.col(state_col).isin([type_a, type_b]))
              .groupBy(_bucket(ts_col, bucket_us).alias("b"))
              .agg(F.sum(F.when(F.col(state_col) == type_a, 1)
                         .otherwise(0)).cast(dec).alias("x"),
                   F.sum(F.when(F.col(state_col) == type_b, 1)
                         .otherwise(0)).cast(dec).alias("y")))
    agg = counts.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(dec).alias("syy"))
    num = (F.col("n") * F.col("sxy")
           - F.col("sx") * F.col("sy")).cast(dec)
    den = ((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
           * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))) \
        .cast(dec)
    staged = agg.select(
        F.col("n").cast("long").alias("n_buckets"),
        num.alias("num"), den.alias("den"))
    # num² and den are non-negative, so plain truncating div IS floor
    # here. Range: 10⁶·num² needs |num| < 10^16; num ≈ n²·c² for n
    # buckets of per-type volume c, so the safe envelope is n·c < 10^8
    # (e.g. 10³ daily buckets at 10^5 events/type/day). Beyond it,
    # Spark's non-ANSI decimal multiply NULLs while DuckDB's HUGEINT
    # errors — callers at that scale pre-divide the bucket counts by a
    # constant (correlation is scale-invariant up to the integer
    # truncation of the scaled counts).
    return (staged.where(F.col("den") > 0)
            .select("n_buckets",
                    F.signum(F.col("num")).cast("long").alias("sign"),
                    F.expr("(1000000 * num * num) div den")
                     .cast("long").alias("r2_ppm"),
                    F.col("num").cast("string").alias("cov_num"),
                    F.col("den").cast("string").alias("var_den")))


def seasonal_anomaly(events: DataFrame, key: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value",
                     order_col: str = "event_id", period: int = 24,
                     bucket_us: int = HOUR_US, min_history: int = 5,
                     k_sigma: int = 3) -> DataFrame:
    """Periodicity-based outliers — ``rolling_anomaly``'s seasonal
    sibling: a value is anomalous against the key's OWN history at the
    same phase (hour-of-day by default), not against its recent past —
    the detector that catches "this 3 a.m. value looks like 3 p.m.",
    which a recency window normalizes away.

    The baseline is LEAVE-ONE-OUT: per (key, phase) the group sums
    (n, Σv, Σv²) are computed once, and each row tests against
    (n−1, Σv−v, Σv²−v²) — self-inclusion dampens the detector exactly
    like the self-inclusive rolling frame did (the round-7 lesson: it
    shipped a vacuous detector). Test is the cross-multiplied integer
    form (n'·v − s')² > k²·(n'·ss' − s'²) over centi-units — no float
    statistic, bit-stable against the oracle. Rows need at least
    ``min_history`` OTHER observations at their phase.

    Plan: one combining (key, phase) aggregate (|keys|·period rows),
    joined back to the events on the same keys — the join reuses the
    aggregate's partitioning; sums ride decimal(38,0)."""
    dec = "decimal(38,0)"
    v100 = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    phase = (F.expr(f"unix_micros({ts_col}) div {bucket_us}")
             % period).alias("phase")
    e = events.select(F.col(key).alias("k"), phase,
                      F.col(order_col).alias("oid"), v100.alias("v"))
    g = (e.groupBy("k", "phase")
         .agg(F.count(F.lit(1)).cast(dec).alias("n"),
              F.sum(F.col("v").cast(dec)).cast(dec).alias("s"),
              F.sum(F.col("v").cast(dec) * F.col("v").cast(dec))
               .cast(dec).alias("ss")))
    j = e.join(g, ["k", "phase"])
    n1 = (F.col("n") - 1).cast(dec)
    s1 = (F.col("s") - F.col("v").cast(dec)).cast(dec)
    ss1 = (F.col("ss")
           - F.col("v").cast(dec) * F.col("v").cast(dec)).cast(dec)
    dev = (n1 * F.col("v").cast(dec) - s1).cast(dec)
    dev2 = (dev * dev).cast(dec)
    bound = (F.lit(k_sigma * k_sigma).cast(dec)
             * (n1 * ss1 - s1 * s1)).cast(dec)
    return (j.where(n1 >= min_history)
            .where(dev2 > bound)
            .select(F.col("k").alias(key), F.col("oid").alias(order_col),
                    F.col("phase").cast("long").alias("phase"),
                    F.col("v").alias("v100"),
                    dev2.cast("string").alias("dev2"),
                    bound.cast("string").alias("bound")))
