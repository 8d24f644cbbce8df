"""as_of_join semantics: inclusive match, tolerance nulling, and the
plan-shape guarantee that makes it scale (one exchange, zero join nodes)."""

import datetime as dt

from pyspark.sql import functions as F

from mysql_ch_replicator_spark.operators.asof import as_of_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:00:05")),
         (2, 10, _ts("2024-01-01 00:01:00")),
         (3, 20, _ts("2024-01-01 00:00:01"))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:00:05"), 100),   # exactly at left #1 → match
         (10, _ts("2024-01-01 00:00:30"), 101),
         (20, _ts("2024-01-01 00:00:02"), 200)],  # after left #3 → no match
        "user_id long, ts timestamp, reading long")
    return left, right


def test_asof_inclusive_and_unmatched(spark):
    left, right = _frames(spark)
    got = {r.event_id: (r.reading, r.ts_matched)
           for r in as_of_join(left, right, ["user_id"], "ts", "ts").collect()}
    assert got[1][0] == 100                       # ties are inclusive (<=)
    assert got[2][0] == 101                       # latest preceding wins
    assert got[3] == (None, None)                 # nothing precedes → nulls
    assert len(got) == 3                          # left rows always survive


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    got = {r.event_id: r.reading
           for r in as_of_join(left, right, ["user_id"], "ts", "ts",
                               tolerance_seconds=10).collect()}
    assert got[1] == 100    # 0 s gap, within tolerance
    assert got[2] is None   # match exists (30 s back) but exceeds tolerance
    assert got[3] is None   # no match at all — still present, still null


def test_asof_plan_single_shuffle_no_join(spark):
    left, right = _frames(spark)
    plan = as_of_join(left, right, ["user_id"], "ts", "ts") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "as-of must not materialize a join"
    assert plan.count("Exchange hashpartitioning") == 1, \
        "as-of must shuffle exactly once (on the keys)"


def test_band_join_exact_and_plan(spark):
    """band_join: inclusive endpoints, exact micro-second boundaries, and
    the plan guarantee — a shuffled equi-join, never a nested-loop."""
    import datetime as dt
    from mysql_ch_replicator_spark.operators.rangejoin import band_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    us = dt.timedelta(microseconds=1)
    left = spark.createDataFrame([(1, 10, t0)],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, t0 - dt.timedelta(seconds=30)),   # inside [-60, -1us]
         (10, t0 - dt.timedelta(seconds=60)),   # exactly lower bound: in
         (10, t0 - dt.timedelta(seconds=61)),   # just below lower: out
         (10, t0 - us),                         # exactly upper bound: in
         (10, t0),                              # left instant itself: out
         (20, t0 - dt.timedelta(seconds=30))],  # other key: out
        "user_id long, ts timestamp")
    got = band_join(left, right, ["user_id"], "ts", "ts",
                    lower_seconds=-60.0, upper_seconds=-1e-6)
    assert got.count() == 3

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, \
        "band join must bucketize into an equi-join"


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check: as_of_join == pandas.merge_asof (backward,
    inclusive) on 500 left x 300 right rows over 20 keys, fixed seed."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    left_pd = pd.DataFrame({
        "event_id": np.arange(500),
        "k": rng.integers(0, 20, 500),
        "ts": pd.to_datetime(rng.integers(0, 10_000, 500), unit="s"),
    })
    right_pd = pd.DataFrame({
        "k": rng.integers(0, 20, 300),
        "ts": pd.to_datetime(rng.integers(0, 10_000, 300), unit="s"),
        "val": np.arange(300),
    })
    # merge_asof needs unique (k, ts) on the right for a well-defined match
    right_pd = right_pd.sort_values("val").groupby(["k", "ts"], as_index=False).last()

    exp = pd.merge_asof(
        left_pd.sort_values("ts"), right_pd.sort_values("ts"),
        on="ts", by="k", direction="backward", allow_exact_matches=True)
    expected = {int(r.event_id): (None if pd.isna(r.val) else int(r.val))
                for r in exp.itertuples()}

    got_df = as_of_join(spark.createDataFrame(left_pd),
                        spark.createDataFrame(right_pd),
                        ["k"], "ts", "ts")
    got = {r.event_id: r.val for r in got_df.collect()}
    assert got == expected


def test_band_join_matches_naive(spark):
    """Randomized cross-check: bucketized band join == naive inequality
    join on the same data (the naive form is the semantics definition;
    the bucketized form is the plan we actually run)."""
    import numpy as np
    from mysql_ch_replicator_spark.operators.rangejoin import band_join

    rng = np.random.default_rng(11)
    left = spark.createDataFrame(
        [(int(i), int(rng.integers(0, 10)),
          int(rng.integers(0, 5_000_000)))
         for i in range(300)],
        "lid long, k long, us long").select(
        "lid", "k", F.timestamp_micros(F.col("us")).alias("ts"))
    right = spark.createDataFrame(
        [(int(i), int(rng.integers(0, 10)),
          int(rng.integers(0, 5_000_000)))
         for i in range(300)],
        "rid long, k long, us long").select(
        "rid", "k", F.timestamp_micros(F.col("us")).alias("ts"))

    lo, hi = -90.0, 30.0
    got = {(r.lid, r.rid) for r in
           band_join(left, right, ["k"], "ts", "ts", lo, hi).collect()}
    l, r = left.alias("l"), right.alias("r")
    lus, rus = F.unix_micros(F.col("l.ts")), F.unix_micros(F.col("r.ts"))
    naive = {(row.lid, row.rid) for row in
             l.join(r, (F.col("l.k") == F.col("r.k"))
                    & (rus >= lus + int(lo * 1e6))
                    & (rus <= lus + int(hi * 1e6))).select("lid", "rid")
              .collect()}
    assert got == naive and len(got) > 100
