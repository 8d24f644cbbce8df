"""Count-Min sketch: a mergeable frequency summary (Cormode & Muthukrishnan
2005) built and queried as DataFrame algebra.

The sketch is a depth x width counter grid: row k counts occurrences under
hash_k(key) % width; a key's estimate is the MIN over its depth cells —
always >= the true count, with collision error bounded by corpus_size/width
per row. Hashes are md5-derived (``functions/hashing.h60``), so the sketch
is bit-identical in Spark and DuckDB — the oracle check is exact, not
statistical.

Scale shape (100 TB): the sketch IS a (k, bucket, cnt) table of at most
depth*width rows produced by ONE map-side-combining aggregate over the
corpus — the shuffle carries depth*width partial counters per partition no
matter how large the input, which is the whole point of a sketch: partial
sketches from any partitioning/stream merge by cell-wise addition (the same
groupBy), so it composes with incremental maintenance for free. Point
queries join the probe set (small, broadcast) against the sketch table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60


def _cells(key_col, depth: int, width: int, salt: str):
    """Array of the key's depth cell coordinates: element k is
    h60('<salt><k>|' || key) % width."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda k: h60(F.concat(F.lit(salt), k.cast("string"), F.lit("|"),
                               key_col)) % width)


def cm_build(df: DataFrame, key_col: str, depth: int = 4,
             width: int = 512, salt: str = "cm") -> DataFrame:
    """Build the sketch table (k, bucket, cnt) — one aggregate, at most
    depth*width result rows regardless of input size."""
    return (df.select(F.posexplode(
                _cells(F.col(key_col), depth, width, salt))
                .alias("k", "bucket"))
            .groupBy("k", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def cm_estimate(sketch: DataFrame, probes: DataFrame, key_col: str,
                depth: int = 4, width: int = 512,
                salt: str = "cm") -> DataFrame:
    """Point-query the sketch for every probe key: min over the key's
    depth cells, absent cells counting 0. Probe side is expected small
    (broadcast); the sketch is depth*width rows at most."""
    pb = probes.select(
        "*", F.posexplode(_cells(F.col(key_col), depth, width, salt))
        .alias("k", "bucket"))
    others = [c for c in probes.columns]
    return (pb.join(sketch, ["k", "bucket"], "left")
            .groupBy(*others)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("long").alias("est_count")))
