"""Z-order (Morton) clustering keys — multi-column data locality.

The reference's ``order_bys`` config maps to ClickHouse ``ORDER BY``
(clickhouse_api.py:260–273), which clusters lexicographically: great
min/max selectivity on the FIRST key, none on the rest. At 100 TB a scan
filtered on the second column reads every file. Z-ordering interleaves
the bits of all keys so every file's min/max range is tight on EVERY
dimension — Delta/Iceberg ``OPTIMIZE ZORDER BY`` semantics, built here
from plain integer column expressions (shift/and/or — whole-stage
codegen, no UDF, and bit-for-bit reproducible in any SQL engine).

Pipeline: per-column linear scale to ``bits``-bit integers (min/max come
from one tiny aggregate), then the classic magic-number bit spread, then
OR the spread words together. 2 columns → 21 bits each (42-bit key);
3 columns → 21 bits each interleaved every 3rd position (63-bit key) —
both fit a signed BIGINT everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 21
_MAX = (1 << ZBITS) - 1

# (shift, mask) chains producing the bit-spread words. Masks are the
# standard Morton magic numbers, truncated to 21 input bits.
_SPREAD_2D = [(16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
              (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
              (1, 0x5555555555555555)]
_SPREAD_3D = [(32, 0x001F00000000FFFF), (16, 0x001F0000FF0000FF),
              (8, 0x100F00F00F00F00F), (4, 0x10C30C30C30C30C3),
              (2, 0x1249249249249249)]


def _spread(x: Column, chain) -> Column:
    for shift, mask in chain:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _spread_sql(x: str, chain) -> str:
    for shift, mask in chain:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def scale_expr(col: Column, lo, hi) -> Column:
    """Linear scale to [0, 2^21): floor((x-lo) * MAX / (hi-lo)). Integer
    inputs with an exact-integer range keep this exact float64 arithmetic
    (every intermediate < 2^53 when hi-lo < 2^31), so engines agree."""
    if hi == lo:
        return F.lit(0).cast("long")
    return F.floor((col.cast("double") - F.lit(float(lo)))
                   * F.lit(float(_MAX)) / F.lit(float(hi) - float(lo))) \
        .cast("long")


def scale_sql(col: str, lo, hi) -> str:
    if hi == lo:
        return "CAST(0 AS BIGINT)"
    return (f"CAST(floor((CAST({col} AS DOUBLE) - ({float(lo)!r})) * "
            f"{float(_MAX)!r} / ({float(hi) - float(lo)!r})) AS BIGINT)")


def morton_key(scaled: list[Column]) -> Column:
    """Interleave 2 or 3 pre-scaled 21-bit integer columns into one
    Z-order key."""
    if len(scaled) == 2:
        a, b = (_spread(c.bitwiseAND(F.lit(_MAX)), _SPREAD_2D)
                for c in scaled)
        return a.bitwiseOR(F.shiftleft(b, 1))
    if len(scaled) == 3:
        a, b, c = (_spread(x.bitwiseAND(F.lit(_MAX)), _SPREAD_3D)
                   for x in scaled)
        return a.bitwiseOR(F.shiftleft(b, 1)).bitwiseOR(F.shiftleft(c, 2))
    raise ValueError("morton_key interleaves 2 or 3 columns")


def morton_sql(scaled: list[str]) -> str:
    """The identical interleave as a SQL string (DuckDB oracle twin)."""
    if len(scaled) == 2:
        a, b = (_spread_sql(f"({c} & {_MAX})", _SPREAD_2D) for c in scaled)
        return f"({a} | ({b} << 1))"
    if len(scaled) == 3:
        a, b, c = (_spread_sql(f"({x} & {_MAX})", _SPREAD_3D)
                   for x in scaled)
        return f"({a} | ({b} << 1) | ({c} << 2))"
    raise ValueError("morton_sql interleaves 2 or 3 columns")


_ZORDERABLE = ("int", "bigint", "smallint", "tinyint", "double", "float",
               "date", "timestamp")


def zorder_cluster(df: DataFrame, cols: list[str],
                   target_partitions: int | None = None) -> DataFrame | None:
    """Re-cluster ``df`` along the Z-curve of ``cols`` (2–3 numeric/date
    columns): range-partition on the Morton key, sort within partitions,
    drop the key. Returns None when the columns aren't Z-orderable
    (caller falls back to lexicographic sort).

    Scale shape: ONE tiny min/max aggregate (driver-side scalars), one
    range shuffle — the same cost as any OPTIMIZE rewrite; every file
    afterwards covers a compact hyper-rectangle, so parquet min/max
    row-group stats prune scans on ANY of the clustered columns, not just
    the leading one."""
    if not 2 <= len(cols) <= 3:
        return None
    types = dict(df.dtypes)
    if not all(types.get(c, "").startswith(_ZORDERABLE) for c in cols):
        return None
    nums = [F.col(c).cast("double") if not types[c].startswith(
                ("date", "timestamp"))
            else F.unix_micros(F.col(c).cast("timestamp")).cast("double")
            for c in cols]
    bounds = df.agg(*[f(n).alias(f"{tag}{i}")
                      for i, n in enumerate(nums)
                      for tag, f in (("lo", F.min), ("hi", F.max))]) \
        .collect()[0]
    if any(bounds[f"lo{i}"] is None for i in range(len(cols))):
        return None
    scaled = [scale_expr(n, bounds[f"lo{i}"], bounds[f"hi{i}"])
              for i, n in enumerate(nums)]
    keyed = df.withColumn("__zkey", morton_key(scaled))
    if target_partitions:
        keyed = keyed.repartitionByRange(target_partitions, "__zkey")
    else:
        keyed = keyed.repartitionByRange("__zkey")
    return keyed.sortWithinPartitions("__zkey").drop("__zkey")
