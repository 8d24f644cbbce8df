"""Multiple source servers → ONE replica root (reference
tests/test_multi_mysql_single_ch.py): two sources each have a database
named ``app``; per-source ``target_databases`` renaming keeps them apart
in the shared replica, end-to-end through DDL-event table creation and
CDC apply — including the collision case the renaming exists to solve."""

import os

from mysql_ch_replicator_spark.config import Settings
from mysql_ch_replicator_spark.engine import ReplicaEngine
from mysql_ch_replicator_spark.sources.event_log import (
    EventLogWriter, read_event_log,
)

DDL = """CREATE TABLE users (
  id int NOT NULL, name varchar(64), PRIMARY KEY (id))"""


def _source(spark, root, tmp_path, tag):
    settings = Settings.load(
        {"target_databases": {"app": f"{tag}_app"}})
    engine = ReplicaEngine(spark, root, settings=settings)
    log = EventLogWriter(str(tmp_path / f"log_{tag}"))
    log.ddl("app", DDL)
    return engine, log


def test_two_sources_one_replica_via_target_renaming(spark, tmp_path):
    root = str(tmp_path / "replica")
    e1, log1 = _source(spark, root, tmp_path, "src1")
    e2, log2 = _source(spark, root, tmp_path, "src2")

    log1.add("app", "users", [(1, "from-src1"), (2, "also-src1")])
    log2.add("app", "users", [(1, "from-src2")])   # same PK, other source
    e1.apply_batch(read_event_log(spark, str(tmp_path / "log_src1")))
    e2.apply_batch(read_event_log(spark, str(tmp_path / "log_src2")))

    # both landed, independently, under their renamed databases
    assert sorted(d for d in os.listdir(root) if not d.startswith("_")) \
        == ["src1_app", "src2_app"]
    got1 = {(r.id, r.name) for r in
            e1.read_final("src1_app", "users").drop("_version").collect()}
    got2 = {(r.id, r.name) for r in
            e2.read_final("src2_app", "users").drop("_version").collect()}
    assert got1 == {(1, "from-src1"), (2, "also-src1")}
    assert got2 == {(1, "from-src2")}

    # deletes stay per-source too
    log2.remove("app", "users", [(1,)])
    e2.apply_batch(read_event_log(spark, str(tmp_path / "log_src2")))
    assert e2.read_final("src2_app", "users").count() == 0
    assert e1.read_final("src1_app", "users").count() == 2
