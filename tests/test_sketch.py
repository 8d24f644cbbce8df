"""Count-Min sketch: overestimate bound, exactness without collisions,
and the mergeability law (sketch of a union == cell-wise sum of partial
sketches) that makes it a streaming/partition-parallel summary."""

import pytest

from pyspark.sql import functions as F

from mysql_ch_replicator_spark.operators.sketch import cm_build, cm_estimate


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "w string")


def _est(spark, keys, depth, width):
    df = _df(spark, keys)
    truth = df.groupBy("w").agg(F.count(F.lit(1)).cast("long")
                                .alias("true_count"))
    sk = cm_build(df, "w", depth=depth, width=width)
    return {r.w: (r.true_count, r.est_count)
            for r in cm_estimate(sk, truth, "w",
                                 depth=depth, width=width).collect()}


def test_overestimate_bound_tiny_width(spark):
    # width 2 forces collisions: estimates may exceed truth, never go
    # below it, and never exceed the total stream length
    keys = [w for w in "abcdefg" for _ in range(ord(w) - 96)]
    out = _est(spark, keys, depth=3, width=2)
    assert set(out) == set("abcdefg")
    for w, (true, est) in out.items():
        assert true <= est <= len(keys)


def test_exact_when_no_collisions(spark):
    # width >> distinct keys: depth rows almost surely isolate every key
    keys = ["x"] * 5 + ["y"] * 3 + ["z"]
    out = _est(spark, keys, depth=4, width=4096)
    assert out == {"x": (5, 5), "y": (3, 3), "z": (1, 1)}


def test_merge_is_cellwise_sum(spark):
    half1, half2 = ["a", "b", "a", "c"], ["a", "c", "d"]
    full = cm_build(_df(spark, half1 + half2), "w", depth=3, width=8)
    parts = (cm_build(_df(spark, half1), "w", depth=3, width=8)
             .unionByName(cm_build(_df(spark, half2), "w",
                                   depth=3, width=8))
             .groupBy("k", "bucket").agg(F.sum("cnt").cast("long")
                                         .alias("cnt")))
    a = {(r.k, r.bucket): r.cnt for r in full.collect()}
    b = {(r.k, r.bucket): r.cnt for r in parts.collect()}
    assert a == b


def test_sketch_size_is_bounded(spark):
    keys = [f"k{i}" for i in range(500)]
    sk = cm_build(_df(spark, keys), "w", depth=4, width=16)
    assert sk.count() <= 4 * 16


def test_hll_accuracy_and_bounds(spark):
    from mysql_ch_replicator_spark.operators.sketch import (
        HLL_M, hll_estimate, hll_registers,
    )
    n = 20000
    df = spark.range(n).select(F.col("id").cast("string").alias("w"))
    regs = hll_registers(df, "w")
    assert regs.count() <= HLL_M
    est = hll_estimate(regs).collect()[0].est_distinct
    # m=64 -> ~1.04/sqrt(64) = 13% standard error; 3 sigma = 39%
    assert abs(est - n) / n < 0.39


def test_hll_merge_is_register_min(spark):
    from mysql_ch_replicator_spark.operators.sketch import (
        hll_estimate, hll_registers,
    )
    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("w"))
    b = spark.range(2000, 5000).select(F.col("id").cast("string").alias("w"))
    full = hll_registers(a.unionByName(b), "w")
    merged = (hll_registers(a, "w").unionByName(hll_registers(b, "w"))
              .groupBy("bucket").agg(F.min("t").cast("long").alias("t")))
    fa = {(r.bucket): r.t for r in full.collect()}
    fb = {(r.bucket): r.t for r in merged.collect()}
    assert fa == fb
    ea = hll_estimate(full).collect()[0].est_distinct
    eb = hll_estimate(merged).collect()[0].est_distinct
    assert ea == eb


def test_hll_insertion_order_invariant(spark):
    from mysql_ch_replicator_spark.operators.sketch import (
        hll_estimate, hll_registers,
    )
    fwd = spark.range(1000).select(F.col("id").cast("string").alias("w"))
    rev = (spark.range(1000).select((999 - F.col("id")).cast("string")
                                    .alias("w")))
    dup = fwd.unionByName(fwd)  # duplicates must not change the sketch
    es = [hll_estimate(hll_registers(d, "w")).collect()[0].est_distinct
          for d in (fwd, rev, dup)]
    assert es[0] == es[1] == es[2]


def test_bloom_no_false_negatives_and_merge(spark):
    from mysql_ch_replicator_spark.operators.sketch import (
        bloom_build, bloom_contains,
    )
    a = spark.range(0, 300).select(F.col("id").cast("string").alias("w"))
    b = spark.range(300, 600).select(F.col("id").cast("string").alias("w"))
    full = bloom_build(a.unionByName(b), "w", n_bits=1024, k=3)
    # merge law: union+distinct of partial filters == filter of the union
    merged = (bloom_build(a, "w", n_bits=1024, k=3)
              .unionByName(bloom_build(b, "w", n_bits=1024, k=3))
              .distinct())
    assert ({r.bit for r in full.collect()}
            == {r.bit for r in merged.collect()})
    assert full.count() <= 1024
    # every member MUST test positive
    out = bloom_contains(full, a.unionByName(b), "w", n_bits=1024, k=3)
    assert out.where(~F.col("bloom_positive")).count() == 0


def test_bloom_wider_filter_fewer_false_positives(spark):
    from mysql_ch_replicator_spark.operators.sketch import (
        bloom_build, bloom_contains,
    )
    members = spark.range(0, 500).select(F.col("id").cast("string")
                                         .alias("w"))
    outsiders = spark.range(10_000, 11_000).select(
        F.col("id").cast("string").alias("w"))

    def fp(n_bits):
        bl = bloom_build(members, "w", n_bits=n_bits, k=3)
        return (bloom_contains(bl, outsiders, "w", n_bits=n_bits, k=3)
                .where(F.col("bloom_positive")).count())

    small, big = fp(512), fp(16384)
    assert big <= small
    assert big < 50  # ~0.1% expected at this fill; 5% gives headroom


def test_heavy_hitters_superset_guarantee(spark):
    # one-sided error: every key truly above threshold MUST appear in
    # the candidate set, even with a tiny (collision-heavy) sketch
    from mysql_ch_replicator_spark.operators.sketch import (
        cm_build, cm_estimate,
    )
    keys = (["hot"] * 40 + ["warm"] * 25 + ["cool"] * 10
            + [f"x{i}" for i in range(200)])
    df = _df(spark, keys)
    truth = df.groupBy("w").agg(F.count(F.lit(1)).cast("long")
                                .alias("true_count"))
    sk = cm_build(df, "w", depth=3, width=8)
    est = cm_estimate(sk, truth, "w", depth=3, width=8)
    rows = {r.w: (r.true_count, r.est_count)
            for r in est.where(F.col("est_count") >= 20).collect()}
    assert {"hot", "warm"} <= set(rows)    # never missed
    for true, e in rows.values():          # one-sided error everywhere
        assert e >= true


def test_probe_columns_named_k_bucket_bit_do_not_collide(spark):
    """ADVICE r4: a probe frame already containing k/bucket/pos/bit must
    probe cleanly — the internal explode uses reserved-prefix aliases."""
    from mysql_ch_replicator_spark.operators.sketch import (
        bloom_build, bloom_contains, cm_build, cm_estimate,
    )

    data = spark.createDataFrame(
        [(f"key{i % 7}",) for i in range(70)], "name string")
    cm = cm_build(data, "name")
    bl = bloom_build(data, "name")

    probes = spark.createDataFrame(
        [("key1", 1, 2, 3, 4, 5), ("nope", 5, 6, 7, 8, 9)],
        "name string, k int, bucket int, pos int, bit int, cnt int")
    est = {r.name: r.est_count
           for r in cm_estimate(cm, probes, "name").collect()}
    assert est["key1"] == 10
    member = {r.name: r.bloom_positive
              for r in bloom_contains(bl, probes, "name").collect()}
    assert member["key1"] is True


def _hdr_bucket_py(v: int, sub_bits: int = 4) -> int:
    v = max(int(v), 0)
    if v < (1 << sub_bits):
        return v
    msb = v.bit_length() - 1
    return (msb - sub_bits) * (1 << sub_bits) + (v >> (msb - sub_bits))


def _hdr_lb_py(bucket: int, sub_bits: int = 4) -> int:
    if bucket < 2 * (1 << sub_bits):
        return bucket
    q, r = divmod(bucket, 1 << sub_bits)
    return ((1 << sub_bits) + r) << (q - 1)


def test_hdr_sketch_merge_law_and_python_model(spark):
    """hdr_build == the literal python bucketing; sketch of a union ==
    cell-wise merge of per-part sketches; bucket count stays bounded."""
    import random

    from mysql_ch_replicator_spark.operators.sketch import (
        hdr_build, hdr_merge)

    random.seed(11)
    vals = ([random.randint(0, 10**6) for _ in range(3000)]
            + [0, 1, 15, 16, 17, 31, 32, 2**40, -5])
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.bucket: r.cnt for r in hdr_build(df, "v").collect()}
    want: dict[int, int] = {}
    for v in vals:
        b = _hdr_bucket_py(v)
        want[b] = want.get(b, 0) + 1
    assert got == want
    assert len(got) <= 16 * 60 + 32          # constant-wire bound

    a = df.where("v % 3 = 0")
    b = df.where("v % 3 <> 0")
    merged = {r.bucket: r.cnt
              for r in hdr_merge(hdr_build(a, "v"),
                                 hdr_build(b, "v")).collect()}
    assert merged == want


def test_hdr_quantiles_error_bound(spark):
    """Every estimate is the lower bound of the bucket holding the true
    rank statistic: estimate <= true < estimate * (1 + 1/16) + 1 — the
    documented HDR error contract, checked against exact order
    statistics."""
    import math
    import random

    from mysql_ch_replicator_spark.operators.sketch import (
        hdr_build, hdr_quantiles)

    random.seed(23)
    vals = [random.randint(1, 200_000) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.permille: (r.estimate, r.bucket, r.n)
           for r in hdr_quantiles(hdr_build(df, "v"),
                                  [100, 500, 900, 999]).collect()}
    vs = sorted(vals)
    for p, (est, bucket, n) in got.items():
        assert n == len(vals)
        true = vs[max(1, math.ceil(len(vs) * p / 1000)) - 1]
        assert _hdr_bucket_py(true) == bucket     # right bucket exactly
        assert est == _hdr_lb_py(bucket)
        assert est <= true <= est * 17 // 16 + 1  # ≤ 1/16 relative error


@pytest.mark.heavy
def test_hdr_grouped_matches_per_group_global(spark):
    """Grouped sketch == running the global sketch on each group's slice;
    grouped quantiles == per-slice hdr_quantiles."""
    import random

    from mysql_ch_replicator_spark.operators.sketch import (
        hdr_build, hdr_build_grouped, hdr_quantiles,
        hdr_quantiles_grouped)

    random.seed(5)
    rows = [(random.choice(["en", "de", "fr"]),
             random.randint(0, 50_000)) for _ in range(2000)]
    df = spark.createDataFrame(rows, "lang string, v long")
    grouped = hdr_build_grouped(df, "v", ["lang"])
    for lang in ("en", "de", "fr"):
        part = {r.bucket: r.cnt
                for r in hdr_build(df.where(F.col("lang") == lang),
                                   "v").collect()}
        got = {r.bucket: r.cnt
               for r in grouped.where(F.col("lang") == lang)
               .select("bucket", "cnt").collect()}
        assert got == part
        want_q = {(r.permille): (r.bucket, r.estimate, r.n)
                  for r in hdr_quantiles(
                      hdr_build(df.where(F.col("lang") == lang), "v"),
                      [500, 900]).collect()}
        got_q = {(r.permille): (r.bucket, r.estimate, r.n)
                 for r in hdr_quantiles_grouped(grouped, ["lang"],
                                                [500, 900])
                 .where(F.col("lang") == lang).collect()}
        assert got_q == want_q


def test_decayed_counts_power_of_two_model(spark):
    """decayed == the literal python model: fresh events full weight,
    each half-life halves (integer shift), >=63 half-lives contributes
    zero, future timestamps clamp to full weight, explicit as_of
    honored."""
    import datetime as dt

    from mysql_ch_replicator_spark.operators.sketch import (
        DECAY_SCALE, decayed_counts)

    base = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
    hl_us = 3_600_000_000        # 1 hour
    rows = [
        ("a", base),                                  # age 0   -> scale
        ("a", base - dt.timedelta(hours=1)),          # age 1   -> scale>>1
        ("a", base - dt.timedelta(hours=2, minutes=30)),  # 2.5 -> scale>>2
        ("a", base + dt.timedelta(minutes=5)),        # future -> clamp 0
        ("b", base - dt.timedelta(hours=100)),        # >>100 -> 0
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    as_of = int(base.timestamp() * 1_000_000)
    got = {r.k: (int(r.decayed), r.n_events)
           for r in decayed_counts(df, "k", "ts", hl_us,
                                   as_of_us=as_of).collect()}
    want_a = DECAY_SCALE + (DECAY_SCALE >> 1) + (DECAY_SCALE >> 2) \
        + DECAY_SCALE
    assert got["a"] == (want_a, 4)
    assert got["b"] == (0, 1)

    # default as_of = max ts (the future event), ages shift by 5 min
    got2 = {r.k: int(r.decayed)
            for r in decayed_counts(df, "k", "ts", hl_us).collect()}
    assert got2["a"] == DECAY_SCALE * 2 + (DECAY_SCALE >> 1) \
        + (DECAY_SCALE >> 2)   # the two near-base events still age < 1 hl


@pytest.mark.heavy
def test_hll_grouped_matches_per_group_global(spark):
    """Grouped registers == running the global sketch on each group's
    slice; grouped estimates == per-slice hll_estimate; registers of a
    split corpus MIN-merge to the full-group registers."""
    from mysql_ch_replicator_spark.operators.sketch import (
        hll_estimate, hll_estimate_grouped, hll_registers,
        hll_registers_grouped)

    rows = [(f"g{i % 3}", i % 97) for i in range(1500)]
    df = spark.createDataFrame(rows, "g string, k long")
    grouped = hll_registers_grouped(df, "k", ["g"])
    for g in ("g0", "g1", "g2"):
        part = {r.bucket: r.t
                for r in hll_registers(df.where(F.col("g") == g),
                                       "k").collect()}
        got = {r.bucket: r.t
               for r in grouped.where(F.col("g") == g)
               .select("bucket", "t").collect()}
        assert got == part
        want_est = hll_estimate(
            hll_registers(df.where(F.col("g") == g), "k")) \
            .first().est_distinct
        got_est = hll_estimate_grouped(grouped, ["g"]) \
            .where(F.col("g") == g).first().est_distinct
        assert got_est == want_est

    # merge law: per-half grouped registers MIN-merge to the full table
    a = hll_registers_grouped(df.where("k % 2 = 0"), "k", ["g"])
    b = hll_registers_grouped(df.where("k % 2 = 1"), "k", ["g"])
    merged = (a.unionByName(b).groupBy("g", "bucket")
              .agg(F.min("t").alias("t")))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, grouped.collect()))


def test_decayed_counts_sum_exceeds_int64(spark):
    """The decayed sum aggregates IN decimal(38,0): with a scale near
    2^62, four full-weight events exceed int64 — the fixed sum returns
    the exact value where an int64 aggregation would overflow (ANSI) or
    wrap (legacy)."""
    import datetime as dt

    from mysql_ch_replicator_spark.operators.sketch import decayed_counts

    base = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
    scale = 1 << 62
    df = spark.createDataFrame([("k", base)] * 4, "k string, ts timestamp")
    as_of = int(base.timestamp() * 1_000_000)
    r = decayed_counts(df, "k", "ts", 3_600_000_000, as_of_us=as_of,
                       scale=scale).first()
    assert int(r.decayed) == 4 * scale        # 2^64 — past int64
    assert r.n_events == 4


def test_cm_join_size_estimate_bounds(spark):
    """AMS/CM inner-product estimator: always >= the true join size,
    EXACT when the sketch is wide enough that no two keys collide in
    any depth row, and python-model-checkable on crafted frequencies."""
    from mysql_ch_replicator_spark.operators.sketch import (
        cm_build, cm_join_size_estimate)

    a = spark.createDataFrame(
        [("x",)] * 5 + [("y",)] * 3 + [("only_a",)], "key string")
    b = spark.createDataFrame(
        [("x",)] * 2 + [("y",)] * 7 + [("only_b",)] * 4, "key string")
    true_size = 5 * 2 + 3 * 7                     # 31

    est_wide = int(cm_join_size_estimate(
        cm_build(a, "key", depth=4, width=4096),
        cm_build(b, "key", depth=4, width=4096)).first().est_join_size)
    assert est_wide == true_size                  # no collisions: exact

    est_narrow = int(cm_join_size_estimate(
        cm_build(a, "key", depth=4, width=4),
        cm_build(b, "key", depth=4, width=4)).first().est_join_size)
    assert est_narrow >= true_size                # collisions only inflate

    # disjoint key sets with a wide sketch estimate (near) zero overlap
    c = spark.createDataFrame([("zzz",)] * 9, "key string")
    est_disjoint = int(cm_join_size_estimate(
        cm_build(a, "key", depth=4, width=4096),
        cm_build(c, "key", depth=4, width=4096)).first().est_join_size)
    assert est_disjoint == 0


def test_bloom_scan_filter_no_false_negatives_and_prunes(spark):
    """Every true member survives the scan filter; non-members are
    overwhelmingly pruned (FP rate at 64 Kib / 500 keys / k=3 is far
    below 1%); an empty build side prunes everything."""
    from pyspark.sql import functions as F

    from mysql_ch_replicator_spark.operators.sketch import (
        bloom_bitmap_words, bloom_scan_filter)

    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    fact = spark.range(0, 20000).select(F.col("id").alias("fk"))
    words = bloom_bitmap_words(keys, "k")
    surv = bloom_scan_filter(fact, "fk", words)
    assert surv.where(F.col("fk") < 500).count() == 500  # no FNs
    assert surv.count() < 500 + 200                      # real pruning

    empty = bloom_bitmap_words(keys.where(F.lit(False)), "k")
    assert bloom_scan_filter(fact, "fk", empty).count() == 0


def test_hll_set_ops_union_law_and_intersection(spark):
    """The pairwise union estimate must EQUAL hll_estimate over the
    physically unioned sets (the merge law, end to end through
    hll_set_ops), and the inclusion–exclusion intersection must land
    within HLL error of the true overlap."""
    from mysql_ch_replicator_spark.operators.sketch import (
        hll_estimate, hll_registers, hll_registers_grouped, hll_set_ops,
    )
    a = spark.range(0, 3000).select(
        F.lit("A").alias("g"), F.col("id").cast("string").alias("w"))
    b = spark.range(2000, 5000).select(
        F.lit("B").alias("g"), F.col("id").cast("string").alias("w"))
    df = a.unionByName(b)
    out = hll_set_ops(
        hll_registers_grouped(df, "w", ["g"]), "g").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.g1, r.g2) == ("A", "B")
    # merge law: pairwise union estimate == estimate of the raw union
    direct = hll_estimate(
        hll_registers(df.select("w"), "w")).collect()[0].est_distinct
    assert r.est_union == direct
    # true union 5000, true intersection 1000; m=64 → 3σ ≈ 39% each,
    # inclusion–exclusion compounds — allow a loose band, the DuckDB
    # oracle pins the exact value
    assert abs(r.est_union - 5000) / 5000 < 0.39
    assert 0 <= r.est_intersection < 3000
    assert r.jaccard_ppm == (1_000_000 * r.est_intersection
                             ) // r.est_union


def test_hll_set_ops_disjoint_groups_clamp(spark):
    """Disjoint sets: inclusion–exclusion may go negative on raw
    estimates — the result must clamp to 0, never return a negative
    intersection."""
    from mysql_ch_replicator_spark.operators.sketch import (
        hll_registers_grouped, hll_set_ops,
    )
    a = spark.range(0, 2000).select(
        F.lit("A").alias("g"), F.col("id").cast("string").alias("w"))
    b = spark.range(50000, 52000).select(
        F.lit("B").alias("g"), F.col("id").cast("string").alias("w"))
    r = hll_set_ops(
        hll_registers_grouped(a.unionByName(b), "w", ["g"]),
        "g").collect()[0]
    assert r.est_intersection >= 0 and r.jaccard_ppm >= 0
    # disjoint: the (clamped) overlap stays small relative to the union
    assert r.est_intersection <= 0.3 * r.est_union


@pytest.mark.heavy
def test_hll_sliding_merge_equals_window_union(spark):
    """The sliding MIN-merge of per-day registers must equal the sketch
    built directly from the window's union of keys — the mergeability
    contract that lets the sliding pass never re-touch an event."""
    from mysql_ch_replicator_spark.operators.sketch import (
        hll_estimate, hll_registers, hll_registers_grouped,
        hll_sliding_estimate,
    )
    rows = [(d, f"u{(d * 7 + i) % 23}") for d in range(10)
            for i in range(d + 1)]
    df = spark.createDataFrame(rows, "day long, user_id string")
    regs = hll_registers_grouped(df, "user_id", ["day"])
    got = {r.day: r.est_distinct
           for r in hll_sliding_estimate(regs, "day", 3).collect()}
    assert set(got) == set(range(10))
    for d in range(10):
        window = df.where((F.col("day") > d - 3) & (F.col("day") <= d))
        direct = hll_estimate(
            hll_registers(window, "user_id")).collect()[0].est_distinct
        assert got[d] == direct, d
