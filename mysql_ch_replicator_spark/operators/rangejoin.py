"""Range (band) join — match left rows to right rows whose timestamp falls
in a fixed band relative to the left timestamp:

    left_ts + lower  <=  right_ts  <=  left_ts + upper

Spark executes a raw inequality join as BroadcastNestedLoopJoin (or a
cartesian product when neither side fits in memory) — quadratic work that
dies long before 100 TB. The scale-correct plan is **bucketization**: hash
time into buckets of the band's width, so every band [l+lower, l+upper]
overlaps at most TWO buckets; explode the left side over those two bucket
ids, equi-join on (keys…, bucket) — a plain shuffled hash/sort-merge join
Catalyst knows how to plan — then apply the exact band predicate as a
post-join filter. Work is O(matches + collisions-within-bucket), not
O(|L|×|R| per key).

A right row lives in exactly one bucket and each left row visits a bucket
at most once, so (left, right) candidate pairs are already unique — no
dedup pass. The operator is inner-join only: an outer variant over the
exploded left would double-count unmatched rows (each left row appears
once per visited bucket); preserve unmatched lefts by joining the
aggregated result back, as q_range_clicks_before_error does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(left: DataFrame, right: DataFrame, keys: list[str],
              left_ts: str, right_ts: str,
              lower_seconds: float, upper_seconds: float,
              right_suffix: str = "_r") -> DataFrame:
    """Inner band join. Right's non-key columns that clash with left's are
    suffixed with ``right_suffix``. Band endpoints are inclusive; use an
    epsilon-shifted bound for open intervals (timestamps have microsecond
    resolution, so ``upper=-1e-6`` excludes the left instant itself)."""
    if upper_seconds <= lower_seconds:
        raise ValueError("empty band: upper must exceed lower")
    # all arithmetic in int64 microseconds — bit-exact band membership;
    # float seconds at epoch magnitude round near the boundary and would
    # disagree with a SQL engine's interval arithmetic on exact ties
    lower_us = int(round(lower_seconds * 1_000_000))
    upper_us = int(round(upper_seconds * 1_000_000))
    width = upper_us - lower_us

    renames = {c: c + right_suffix for c in right.columns
               if c not in keys and c in left.columns}
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    rts = renames.get(right_ts, right_ts)

    def _bucket(us_col):
        # floor division (negative-safe, though epochs here are positive)
        return F.floor(us_col / F.lit(width)).cast("long")

    r = r.withColumn("__bucket", _bucket(F.unix_micros(F.col(rts))))
    le = F.unix_micros(F.col(left_ts))
    l_ = left.withColumn(
        "__bucket",
        F.explode(F.sequence(_bucket(le + F.lit(lower_us)),
                             _bucket(le + F.lit(upper_us)))))

    re_ = F.unix_micros(F.col(rts))
    banded = (l_.join(r, [*keys, "__bucket"])
              .where((re_ >= le + F.lit(lower_us))
                     & (re_ <= le + F.lit(upper_us)))
              .drop("__bucket"))
    return banded
