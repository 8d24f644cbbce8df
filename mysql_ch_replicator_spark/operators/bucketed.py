"""Bucketed (pre-shuffled) table layout — co-located joins with NO exchange.

At 100 TB the dominant cost of a fact-to-fact join is shuffling both sides
on the key. Spark's bucketing writes each table pre-partitioned by
``hash(key) % num_buckets`` (and optionally pre-sorted within buckets), so
a join between two tables bucketed the same way reads co-located buckets
and plans a SortMergeJoin with ZERO Exchange nodes — the shuffle was paid
once at write time and amortized over every subsequent join/aggregate on
that key. This is the lake equivalent of the reference's ClickHouse
ORDER BY key locality (clickhouse_api.py:25–27, order_bys config) applied
to JOIN co-location, which ClickHouse itself cannot do across tables.

Bucketed outputs go through ``saveAsTable`` (bucket metadata lives in the
session catalog; plain ``.parquet(path)`` cannot record it). Readers use
``spark.table(name)``.

Rules for the no-shuffle plan to hold (pinned in test_plan_shapes.py):
- both sides bucketed by the SAME columns into the SAME bucket count,
- join keys == bucket keys (superset keys keep the exchange),
- ``spark.sql.sources.bucketing.enabled`` (default true),
- broadcast must not pre-empt SMJ for the demo (small test tables would
  broadcast; production fact-fact joins exceed the threshold naturally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                   num_buckets: int, sort: bool = True) -> None:
    """Persist ``df`` as a bucketed parquet table (overwrite). Sorting
    within buckets lets SortMergeJoin skip its sort step too."""
    w = (df.write.format("parquet").mode("overwrite")
         .bucketBy(num_buckets, *bucket_cols))
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table_name)


def co_located_join(spark: SparkSession, left_table: str, right_table: str,
                    on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys — plans
    with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
