"""Count-Min sketch: overestimate bound, exactness without collisions,
and the mergeability law (sketch of a union == cell-wise sum of partial
sketches) that makes it a streaming/partition-parallel summary."""

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
