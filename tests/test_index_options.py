"""Per-table index overrides (S8) — the reference attaches a
bloom_filter skip index on a single PK by default plus any configured
``indexes`` (clickhouse_api.py:253–261); the parquet analog is
per-column bloom filters via writer options. Verified functionally:
same rows, same layout → the bloom-filtered file is strictly larger
(the filter bytes), and reads are unaffected."""

import os

from mysql_ch_replicator_spark.config import Settings
from mysql_ch_replicator_spark.engine import ReplicaEngine
from mysql_ch_replicator_spark.sources.event_log import (
    EventLogWriter, read_event_log,
)

DDL = """CREATE TABLE users (
  id int NOT NULL, name varchar(255), PRIMARY KEY (id))"""

COMPOSITE_DDL = """CREATE TABLE pairs (
  a int NOT NULL, b int NOT NULL, name varchar(255),
  PRIMARY KEY (a, b))"""


def test_index_option_mapping(spark, tmp_path):
    settings = Settings.load({"indexes": {"users": ["name"]}})
    engine = ReplicaEngine(spark, str(tmp_path / "r"), settings=settings)
    st = engine.create_table("db", DDL)
    opts = engine._index_options("users", st, ["id", "name", "_version"])
    # single PK → bloom on id by default (reference idx_id), plus override
    assert opts == {"parquet.bloom.filter.enabled#id": "true",
                    "parquet.bloom.filter.enabled#name": "true"}
    # columns absent from the frame are dropped (e.g. mid-rename rewrite)
    assert engine._index_options("users", st, ["name"]) == \
        {"parquet.bloom.filter.enabled#name": "true"}


def test_composite_pk_gets_no_default_bloom(spark, tmp_path):
    engine = ReplicaEngine(spark, str(tmp_path / "r"))
    st = engine.create_table("db", COMPOSITE_DDL)
    assert engine._index_options("pairs", st, ["a", "b", "name"]) == {}


def _dir_bytes(d):
    return sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(d) for f in fs
               if f.endswith(".parquet"))


def test_bloom_filter_actually_written(spark, tmp_path):
    """Same data through two engines — with and without the PK bloom —
    must produce byte-different files (the filter is real, not a no-op
    option), and the indexed replica still reads exactly."""
    rows = [(i, f"name{i}") for i in range(5000)]

    def build(root, ddl_table_name):
        engine = ReplicaEngine(spark, root)
        engine.create_table("db", DDL)
        log = EventLogWriter(root + "_log")
        log.add("db", "users", rows)
        engine.apply_batch(read_event_log(spark, root + "_log"))
        return engine

    engine = build(str(tmp_path / "with"), "users")
    with_bloom = _dir_bytes(engine._data_dir("db", "users"))

    engine2 = ReplicaEngine(spark, str(tmp_path / "without"))
    engine2._index_options = lambda *a, **k: {}
    engine2.create_table("db", DDL)
    log = EventLogWriter(str(tmp_path / "without_log"))
    log.add("db", "users", rows)
    engine2.apply_batch(read_event_log(spark, str(tmp_path / "without_log")))
    without_bloom = _dir_bytes(engine2._data_dir("db", "users"))

    assert with_bloom > without_bloom
    assert engine.read_final("db", "users").count() == 5000
