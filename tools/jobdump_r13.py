#!/usr/bin/env python3
"""Per-job drill-down for one registry query: run it, then dump every
Spark job (id, description, duration ms, stages, tasks) it issued."""
from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from mysql_ch_replicator_spark.plans.session import get_spark  # noqa: E402
from mysql_ch_replicator_spark.queries import spark_queries  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("jobdump-r13")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()

    # warmup (same shape as bench.py)
    next(iter(qs.values()))(spark, sf_dir).count()
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    def _warm(s):
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

    store = spark.sparkContext._jsc.sc().statusStore()
    before = store.jobsList(None).size()
    t0 = time.perf_counter()
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    jobs = store.jobsList(None)
    n = jobs.size()
    print(f"query={name} wall={wall:.2f}s new_jobs={n - before}")
    rows = []
    for i in range(n):
        j = jobs.apply(i)
        jid = j.jobId()
        dur = None
        try:
            st = j.submissionTime().get().getTime()
            ct = j.completionTime().get().getTime()
            dur = ct - st
        except Exception:
            pass
        desc = ""
        try:
            desc = j.description().get()
        except Exception:
            desc = j.name()
        rows.append((jid, dur, j.numTasks(), str(desc)[:130]))
    rows.sort()
    tot = 0
    for jid, dur, ntasks, desc in rows:
        if jid < 0:
            continue
        tot += dur or 0
        print(f"  job {jid:4d}  {dur if dur is not None else '?':>6} ms "
              f"{ntasks:4d} tasks  {desc}")
    print(f"sum_job_ms={tot}")
    spark.stop()


if __name__ == "__main__":
    main()
