"""Local stand-in for the driver's Spark-vs-DuckDB correctness check:
run the Spark query and the oracle SQL on the same parquet tables, sort
columns by name, and compare the (order-insensitive) value multisets."""

from __future__ import annotations

import decimal
import math

import duckdb

from mysql_ch_replicator_spark.sources.snapshot import TPCH_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    # NOTE: deliberately strict for decimals — str() keeps the scale
    # (trailing zeros), mirroring the driver's representation-sensitive
    # hash. Registered queries avoid raw DECIMAL outputs entirely
    # (rendered as strings, see queries.py docstring); this check is the
    # local tripwire for any that slip through.
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", f"{v:.10g}")
    if isinstance(v, bytes):
        return ("b", v.hex())
    return (type(v).__name__[:1], str(v))


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    con = duck_connection(sf_dir)
    rel = con.sql(oracle_sql)
    # Fetch through Arrow, NOT fetchall(): the driver's hash goes through
    # Arrow, where DuckDB HUGEINT (e.g. an uncast SUM over integers)
    # surfaces as decimal128 and mismatches Spark's BIGINT.  fetchall()
    # would quietly collapse both to Python int and hide that bug class
    # (bitten in round 3: doc_length_histogram).
    tbl = rel.fetch_arrow_table()
    duck_cols = list(tbl.column_names)
    duck_rows = [tuple(d[c] for c in duck_cols) for d in tbl.to_pylist()]
    con.close()

    if sorted(spark_cols) != sorted(c for c in duck_cols):
        return False, f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    s = _rowset([tuple(r) for r in spark_rows], spark_cols)
    d = _rowset(duck_rows, duck_cols)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(spark_rows)} rows)"
