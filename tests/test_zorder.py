"""Z-order clustering (functions/zorder.py): the Morton interleave must
be bit-exact against a pure-Python reference, and clustering by it must
actually deliver multi-column locality — per-file value ranges tight on
EVERY clustered column, which is the whole point vs lexicographic sort."""

import os

from pyspark.sql import functions as F

from mysql_ch_replicator_spark.functions.zorder import (
    ZBITS, morton_key, scale_expr, zorder_cluster,
)


def _py_morton(vals, nbits=ZBITS):
    out = 0
    step = len(vals)
    for bit in range(nbits):
        for j, v in enumerate(vals):
            out |= ((v >> bit) & 1) << (bit * step + j)
    return out


def test_morton_key_matches_python_reference_2d(spark):
    rows = [(a, b) for a in [0, 1, 5, 1234, 2**21 - 1]
            for b in [0, 3, 77, 99999, 2**21 - 1]]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {(r.a, r.b): r.z for r in df.select(
        "a", "b", morton_key([F.col("a"), F.col("b")]).alias("z")).collect()}
    for a, b in rows:
        assert got[(a, b)] == _py_morton([a, b]), (a, b)


def test_morton_key_matches_python_reference_3d(spark):
    rows = [(a, b, c) for a in [0, 9, 2**21 - 1]
            for b in [1, 4321] for c in [7, 2**20]]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = {(r.a, r.b, r.c): r.z for r in df.select(
        "a", "b", "c",
        morton_key([F.col("a"), F.col("b"), F.col("c")]).alias("z"))
        .collect()}
    for key in rows:
        assert got[key] == _py_morton(list(key)), key


def test_morton_preserves_grid_locality(spark):
    """Neighbors on the 2-D grid stay close on the curve: the key of
    (x, y) and (x+1, y) differ by a bounded amount on average — pinned
    indirectly by the range test below; here just monotonicity on the
    diagonal (z(k,k) is strictly increasing)."""
    df = spark.createDataFrame([(k, k) for k in range(256)], "a long, b long")
    zs = [r.z for r in df.select(
        morton_key([F.col("a"), F.col("b")]).alias("z"))
        .orderBy("z").collect()]
    assert zs == sorted(set(zs)) and len(zs) == 256


def test_zorder_cluster_tightens_both_dimensions(spark):
    """Cluster 10k points uniform on a 100x100 grid into 16 partitions:
    with Z-order, each partition's bounding box must be tight on BOTH
    columns (< 60% of the global range on average); a lexicographic sort
    on (a, b) would leave b's per-partition range at ~100%."""
    n = 10_000
    df = spark.range(n).select(
        (F.col("id") % 100).alias("a"),
        ((F.col("id") * 37) % 100).alias("b"))
    z = zorder_cluster(df, ["a", "b"], target_partitions=16)
    assert z is not None

    def avg_span(frame, col):
        import pyspark.sql.functions as sf
        spans = (frame.withColumn("p", sf.spark_partition_id())
                 .groupBy("p").agg((sf.max(col) - sf.min(col)).alias("s"))
                 .collect())
        return sum(r.s for r in spans) / len(spans)

    assert avg_span(z, "a") < 60
    assert avg_span(z, "b") < 60
    # lexicographic baseline: the second column's per-partition range
    # stays near-global — Z-order must at least halve it
    lex = df.repartitionByRange(16, "a", "b").sortWithinPartitions("a", "b")
    assert avg_span(z, "b") < 0.5 * avg_span(lex, "b")
    # and it is a re-clustering, not a filter
    assert z.count() == n


def test_zorder_cluster_falls_back_on_strings(spark):
    df = spark.createDataFrame([(1, "x")], "a long, s string")
    assert zorder_cluster(df, ["a", "s"]) is None
    assert zorder_cluster(df, ["a"]) is None          # needs 2-3 cols


def test_scale_expr_handles_degenerate_range(spark):
    df = spark.createDataFrame([(5,), (5,)], "a long")
    got = df.select(scale_expr(F.col("a"), 5, 5).alias("s")).collect()
    assert all(r.s == 0 for r in got)


def test_optimize_zorders_two_numeric_order_bys(spark, tmp_path):
    """engine.optimize with a 2-column numeric order_bys override must
    Z-order-cluster the rewrite (round-trips exactly, no leftover helper
    column) and still collapse superseded versions."""
    from mysql_ch_replicator_spark.config import Settings
    from mysql_ch_replicator_spark.engine import ReplicaEngine
    from mysql_ch_replicator_spark.sources.event_log import (
        EventLogWriter, read_event_log,
    )

    settings = Settings.load({"order_bys": {"points": ["x", "y"]}})
    engine = ReplicaEngine(spark, str(tmp_path / "r"), settings=settings)
    engine.create_table("db", """CREATE TABLE points (
      id int NOT NULL, x int, y int, PRIMARY KEY (id))""")
    log = EventLogWriter(str(tmp_path / "log"))
    rows = [(i, i % 50, (i * 13) % 50) for i in range(2000)]
    log.add("db", "points", rows)
    log.add("db", "points", [(7, 999, 999)])   # supersedes id=7
    engine.apply_batch(read_event_log(spark, str(tmp_path / "log")))

    engine.optimize("db", "points")
    got = {(r.id, r.x, r.y) for r in
           engine.read_final("db", "points").drop("_version").collect()}
    want = {(i, i % 50, (i * 13) % 50) for i in range(2000) if i != 7}
    want.add((7, 999, 999))
    assert got == want
    assert "__zkey" not in engine.read_raw("db", "points").columns
    # compaction collapsed history: one row per key remains
    assert engine.read_raw("db", "points").count() == 2000
    data = engine._data_dir("db", "points")
    assert os.path.isdir(data)
