"""As-of join — for each left row, the single most recent right row with
``right_ts <= left_ts`` within the same key group (the time-series "point
lookup into history" operator; Spark has no built-in).

The reference engine has no as-of operator (it's a replicator); this is part
of the analytics surface a user of the replica needs over event streams
(sessionization, attribution, latest-reading-before lookups).

Spark-first design — **union + window, not a join**:

    tag left rows 1, right rows 0
    union both sides aligned on (keys…, ts, tag, payload)
    last(payload IGNORE NULLS) OVER (PARTITION BY keys ORDER BY ts, tag
                                     ROWS UNBOUNDED PRECEDING)
    keep tag=1 rows

Why not ``left JOIN right ON keys AND r.ts <= l.ts`` + rank? That join
produces |matches| intermediate rows — quadratic in dense groups — before
the rank throws all but one away. The union form is ONE shuffle on the keys
(same as any keyed join), a per-partition sort, and a linear window scan:
no intermediate blow-up, no second shuffle. At 100 TB this is the difference
between a plan that finishes and one that doesn't; skewed keys degrade to a
big sort partition, which AQE can split, rather than a cross-product.

Tie semantics: right rows sort before left rows at the same timestamp
(tag 0 < 1), so a right row at exactly ``left_ts`` matches — inclusive
``<=``, matching DuckDB's ``ASOF JOIN … ON r.ts <= l.ts`` (the oracle for
the registered query). Callers should de-duplicate the right side on
(keys…, ts) if several right rows can share a timestamp — "which of two
simultaneous readings wins" is not well-defined in any as-of engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(left: DataFrame, right: DataFrame, keys: list[str],
               left_ts: str, right_ts: str,
               tolerance_seconds: float | None = None) -> DataFrame:
    """Backward as-of join. Output = every left row + the payload columns of
    the matched right row (null if no right row precedes it), where payload
    = all right columns except keys and ``right_ts``, plus the match
    timestamp as ``<right_ts>_matched``.

    ``tolerance_seconds``: matches older than this are nulled out (the row
    is kept — left-join semantics), like pandas ``merge_asof(tolerance=…)``.
    """
    matched_ts = f"{right_ts}_matched"
    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    payload = F.struct(F.col(right_ts).alias(matched_ts), *payload_cols)

    rp = right.select(
        *keys, F.col(right_ts).alias("__ts"), F.lit(0).alias("__tag"),
        payload.alias("__payload"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__row"))
    lp = left.select(
        *keys, F.col(left_ts).alias("__ts"), F.lit(1).alias("__tag"),
        F.lit(None).cast(
            right.select(payload.alias("s")).schema["s"].dataType
        ).alias("__payload"),
        F.struct(*left.columns).alias("__row"))

    w = (Window.partitionBy(*keys).orderBy("__ts", "__tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    joined = (rp.unionByName(lp)
              .withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
              .where(F.col("__tag") == 1))

    if tolerance_seconds is not None:
        in_tol = (F.col("__ts").cast("double")
                  - F.col("__m")[matched_ts].cast("double")) <= tolerance_seconds
        joined = joined.withColumn(
            "__m", F.when(in_tol, F.col("__m")))

    return joined.select(
        "__row.*",
        *[F.col("__m")[c].alias(c) for c in (matched_ts, *payload_cols)])
