#!/usr/bin/env python3
"""Capture .explain("formatted") for named registry queries WITHOUT
executing the final action (e2e builders still run their pipelines).

Usage: SPARK_GRAFT_PLAN_LABEL=before python tools/plancap_r13.py q1 q2 ...
Writes plans/r13/<query>_<label>.txt under the repo this file lives in.
"""
from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from mysql_ch_replicator_spark.plans.session import get_spark  # noqa: E402
from mysql_ch_replicator_spark.queries import spark_queries  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    label = os.environ.get("SPARK_GRAFT_PLAN_LABEL", "plan")
    out_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR",
                             os.path.join(HERE, "plans", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plancap-r13")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    from mysql_ch_replicator_spark.cache import release_transient_caches
    for name in names:
        if name not in qs:
            print(f"SKIP unknown {name}")
            continue
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        with open(os.path.join(out_dir, f"{name}_{label}.txt"), "w",
                  encoding="utf-8") as fh:
            fh.write(txt)
        print(f"wrote {name}_{label}.txt ({len(txt)} bytes)")
        release_transient_caches()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
