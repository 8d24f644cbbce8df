#!/usr/bin/env python3
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing includes full execution (count-style action that materializes every
row) but not session startup. A warmup pass primes the JVM + parquet footer
cache so numbers reflect steady-state execution, not first-run JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql_ch_replicator_spark.plans.session import get_spark  # noqa: E402
from mysql_ch_replicator_spark.queries import spark_queries  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("mysql_ch_replicator_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = spark_queries()
    # warmup: materialize one tiny query to JIT the session, and run one
    # trivial pandas UDF across the cluster to pre-fork the Python worker
    # pool (first Arrow batch otherwise pays ~5 s of worker startup)
    next(iter(qs.values()))(spark, sf_dir).count()
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    def _warm(s):
        # preload the engine package in each forked worker so UDF queries
        # measure compute, not per-worker module import
        import mysql_ch_replicator_spark.functions.wkb  # noqa: F401
        import mysql_ch_replicator_spark.operators.multimodal  # noqa: F401
        return s

    ident = pandas_udf(_warm, "long")
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).select(ident(F.col("id"))).count()

    timings: dict[str, float] = {}
    for name, builder in sorted(qs.items()):
        t0 = time.perf_counter()
        df = builder(spark, sf_dir)
        # force full materialization of every row/column, not just count
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        # drop caches a query persisted for its own self-joins so later
        # queries are measured against a clean executor heap
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "total_query_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
