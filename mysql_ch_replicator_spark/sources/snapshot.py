"""Snapshot sources (S1 of SURVEY.md §2.1).

The reference snapshots MySQL with keyset-paginated SELECTs in PK order,
optionally sharded across N worker processes by ``CRC32(CONCAT_WS('|', pk…))
% N`` (reference mysql_api.py:110–157, db_replicator_initial.py:386–448).

Spark-first mapping:

- Parquet snapshot (the driver's testdata, or any lake landing zone):
  ``spark.read.parquet`` — already partitioned, already columnar, predicate
  pushdown + column pruning free via Catalyst. Keyset pagination is
  unnecessary: Spark schedules one task per file split.
- JDBC snapshot (live MySQL): ``spark.read.jdbc`` with
  partitionColumn/lowerBound/upperBound/numPartitions — Spark issues N
  range-bounded SELECTs in parallel, replacing the reference's worker
  processes.
- Worker sharding is still exposed (``sharded_snapshot``) for co-located
  incremental snapshot resume: it reproduces the reference's CRC32 sharding
  with Spark's built-in ``crc32``/``concat_ws`` — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


# Columns written as parquet TIMESTAMP(NANOS) — Spark has no nanos type, so
# they are read as raw int64 (legacy conf) and truncated to microseconds,
# matching what DuckDB/Arrow do when they down-convert nanos.
_NANO_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one snapshot table from a parquet directory.

    Pins the two session confs the engine's semantics depend on, so results
    are identical no matter what SparkSession the caller hands us:

    - ``session.timeZone=UTC`` — the engine's analog of the reference's
      ``mysql_timezone`` config (converter.py:350–374): timestamps are
      interpreted/rendered in one declared zone, never the host's.
    - ``nanosAsLong`` — parquet TIMESTAMP(NANOS) columns arrive as int64
      (Spark has no nanos type) and are truncated to micros below.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ→LTZ cast below binds the session zone at ANALYSIS time, so
    # forcing UTC here fixes the interpretation for the returned DataFrame
    # even if the caller changes the session zone afterwards. Assert the
    # pin actually took (a session that rejects the conf would otherwise
    # silently shift every instant by the host zone offset).
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        raise RuntimeError(
            "load_table requires spark.sql.session.timeZone=UTC; the "
            "session refused the conf pin")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Parquet TIMESTAMP without isAdjustedToUTC infers as TIMESTAMP_NTZ on
    # sessions we don't control (driver default). Normalize to TIMESTAMP_LTZ:
    # with the session zone pinned UTC above, the cast reinterprets the same
    # wall-clock as a UTC instant — values identical, and one timestamp type
    # flows through every operator (unix_micros, window(), watermarks).
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(field.name,
                               F.col(field.name).cast("timestamp"))
    return df


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least cluster-parallelism partitions before heavy per-row
    compute (hashing, shingling, UDF batches).

    A small table often arrives as ONE file split → one task, serializing
    expensive projections on a single core while the rest of the cluster
    idles. Repartition only in that case — a table already wider than the
    cluster (the 100 TB path) passes through untouched, so no shuffle is
    added where the scan is already parallel."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TPCH_TABLES) -> dict[str, DataFrame]:
    """Read several snapshot tables; also registers each as a temp view so
    the same queries can be written in either DataFrame or SQL form."""
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def sharded_snapshot(df: DataFrame, pk_cols: list[str],
                     worker_id: int, total_workers: int) -> DataFrame:
    """Reference-parity worker sharding: keep the rows whose
    ``CRC32(CONCAT_WS('|', pk…)) % total_workers == worker_id``
    (reference mysql_api.py:124–133).

    Built-in columnar expressions only — the filter is pushed into the scan
    where the source supports it. At cluster scale each worker reads a
    disjoint slice, so a resumable snapshot can restart one shard without
    touching the others.
    """
    if total_workers <= 1:
        return df
    key = F.crc32(F.concat_ws("|", *[F.col(c).cast("string") for c in pk_cols]))
    return df.where(key % total_workers == worker_id)


def snapshot_watermark(df: DataFrame, pk_cols: list[str]):
    """A2 — running max-PK bookkeeping: the resume watermark a snapshot
    records periodically (reference db_replicator_initial.py:239–246 tracks
    ``max(primary_key_tuple)`` the same way). Returns a Row with the PK
    values of the maximum tuple, or None on an empty frame."""
    row = df.agg(F.max(F.struct(*[F.col(c) for c in pk_cols]))
                 .alias("mx")).collect()[0]
    return row.mx


def resumable_snapshot(df: DataFrame, pk_cols: list[str],
                       resume_after=None) -> DataFrame:
    """A2/S1 — keyset-resume: keep only rows whose PK tuple is strictly
    greater than the recorded watermark (reference keyset pagination,
    mysql_api.py:117–122; resume state db_replicator_initial.py:183–192).

    Tuple comparison is Spark's struct ordering — lexicographic over the PK
    columns, identical to MySQL's ``(pk1, pk2) > (v1, v2)`` row comparison.
    The predicate is a plain comparison, so it pushes into the source scan
    (JDBC WHERE / parquet row-group pruning)."""
    if resume_after is None:
        return df
    watermark = F.struct(*[
        F.lit(v).cast(df.schema[c].dataType).alias(c)
        for c, v in zip(pk_cols, list(resume_after))])
    return df.where(F.struct(*[F.col(c) for c in pk_cols]) > watermark)


def jdbc_snapshot(spark: SparkSession, url: str, table: str,
                  partition_column: str | None = None,
                  lower_bound=None, upper_bound=None,
                  num_partitions: int = 8,
                  properties: dict | None = None) -> DataFrame:
    """Parallel JDBC snapshot of a live MySQL table — the production S1 path.

    Replaces the reference's keyset pagination + worker processes
    (mysql_api.py:110–157) with Spark's range-partitioned JDBC read: N
    concurrent SELECTs, one per partition, predicates pushed into MySQL.
    """
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", table)
              .option("numPartitions", num_partitions))
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
