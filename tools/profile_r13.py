#!/usr/bin/env python3
"""Round-13 optimization profiler: per-query wall time, Spark JOB count,
and .explain("formatted") capture for named registry queries.

Usage: python tools/profile_r13.py [query ...]   (default: top-cost set)

Writes plans to plans/r13/<query>_<label>.txt when SPARK_GRAFT_PLAN_LABEL
is set (before/after), and prints one JSON line per query:
{"query": name, "wall_s": float, "jobs": int}

Job counting uses the monotonically increasing job id taken from a probe
job run before and after the query — in local mode with a single driver
thread this bounds exactly the jobs the query issued (minus the 2 probes).
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from mysql_ch_replicator_spark.plans.session import get_spark  # noqa: E402
from mysql_ch_replicator_spark.queries import spark_queries  # noqa: E402

DEFAULT = [
    "lexical_index_compact", "index_coalesced_maintenance",
    "ann_ivf_index_filtered", "bm25_indexed", "lexical_index_upsert",
    "ann_ivf_retrain", "incremental_image_dedup_maintenance",
    "lexical_shard_merge",
]


def _last_job_id(spark) -> int:
    # run a trivial job and read its id — the next query's first job is
    # this id + 1
    spark.sparkContext.setJobDescription("profile-probe")
    spark.range(1).count()
    spark.sparkContext.setJobDescription(None)
    tracker = spark.sparkContext.statusTracker()
    ids = tracker.getJobIdsForGroup(None) or []
    return max(ids) if ids else -1


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    label = os.environ.get("SPARK_GRAFT_PLAN_LABEL", "")
    plan_dir = os.path.join(HERE, "plans", "r13")
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark("profile-r13")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()

    # same warmup as bench.py so first-touch costs don't pollute
    next(iter(qs.values()))(spark, sf_dir).count()
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    def _warm(s):
        import mysql_ch_replicator_spark.functions.wkb  # noqa: F401
        import mysql_ch_replicator_spark.operators.multimodal  # noqa: F401
        return s

    ident = pandas_udf(_warm, "long")
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).select(ident(F.col("id"))).count()

    def _warm_map(it):
        for pdf in it:
            yield pdf

    spark.range(par * 4, numPartitions=par) \
        .mapInPandas(_warm_map, "id long").count()

    from mysql_ch_replicator_spark.cache import release_transient_caches

    out = {}
    for name in names:
        if name not in qs:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        j0 = _last_job_id(spark)
        spark.sparkContext.setJobDescription(f"q:{name}")
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        if label:
            with open(os.path.join(plan_dir, f"{name}_{label}.txt"), "w",
                      encoding="utf-8") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        j1 = _last_job_id(spark)
        rec = {"query": name, "wall_s": round(wall, 3),
               "jobs": j1 - j0 - 1}
        out[name] = rec
        print(json.dumps(rec), flush=True)
        release_transient_caches()
        spark.catalog.clearCache()
    print(json.dumps({"total_wall_s":
                      round(sum(r["wall_s"] for r in out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
