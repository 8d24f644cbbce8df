"""Config parity: the REFERENCE's YAML surface must load end-to-end —
``Settings.from_reference_yaml`` accepts every key the reference's
``Settings.load`` accepts (reference config.py:172–238), including the
shipped example_config.yaml, and maps the list-form per-table overrides
(Index/PartitionBy/OrderBy, config.py:38–56) onto the Spark-first dict
form with glob resolution at lookup time."""

import os

import pytest

from mysql_ch_replicator_spark.config import Settings

REFERENCE_EXAMPLE = "/root/reference/example_config.yaml"

# the reference surface, every key present (reference config.py:140–238)
FULL_REFERENCE_CONFIG = {
    "mysql": {"host": "mysql-host", "port": 8306, "user": "root",
              "password": "secret", "charset": "utf8mb4"},
    "clickhouse": {"host": "ch-host", "port": 8323, "user": "default",
                   "password": "default", "cluster": "main",
                   "connection_timeout": 30, "send_receive_timeout": 120,
                   "erase_batch_size": 50_000},
    "binlog_replicator": {"data_dir": "/tmp/binlog/",
                          "records_per_file": 12_345,
                          "binlog_retention_period": 7200},
    "databases": "prod_*",
    "tables": "*",
    "exclude_databases": ["information_schema", "mysql"],
    "exclude_tables": ["*_tmp"],
    "log_level": "info",
    "debug_log_level": True,
    "optimize_interval": 3600,
    "enable_optimize_final": False,
    "check_db_updated_interval": 45,
    "auto_restart_interval": 1800,
    "types_mapping": {"char(36)": "UUID"},
    "http_host": "0.0.0.0",
    "http_port": 9128,
    "target_databases": {"prod_main": "analytics"},
    "target_tables": {"users": "users_replica"},
    "initial_replication_threads": 4,
    "ignore_deletes": True,
    "mysql_timezone": "Europe/Berlin",
    "initial_replication_batch_size": 20_000,
    "skip_initial_replication": False,
    "version_initial_value": 1000,
    "indexes": [{"databases": "*", "tables": ["users"],
                 "index": "address"}],
    "partition_bys": [{"databases": "*", "tables": "events_*",
                       "partition_by": "event_day"}],
    "order_bys": [{"databases": "*", "tables": ["orders"],
                   "order_by": "o_orderdate, o_orderkey"}],
    "post_initial_replication_commands": [
        {"databases": "prod_main",
         "commands": ["SELECT 1", "SELECT 2"]}],
}


def test_reference_example_config_loads():
    if not os.path.exists(REFERENCE_EXAMPLE):
        pytest.skip("reference checkout not present")
    s = Settings.from_reference_yaml(REFERENCE_EXAMPLE)
    assert s.source.url == "jdbc:mysql://localhost:8306"
    assert s.source.user == "root"
    assert s.event_log_dir == "/home/user/binlog/"
    assert s.records_per_file == 100_000
    assert s.databases == "database_name_pattern_*"
    assert s.is_database_matches("database_name_pattern_x")
    assert not s.is_database_matches("other")


def test_full_reference_surface_maps():
    s = Settings.from_reference_yaml(FULL_REFERENCE_CONFIG)
    assert s.source.url == "jdbc:mysql://mysql-host:8306"
    assert s.source.password == "secret"
    assert s.replica.erase_batch_size == 50_000
    assert s.cluster_mode is True              # clickhouse.cluster set
    assert s.event_log_dir == "/tmp/binlog/"
    assert s.records_per_file == 12_345
    assert s.binlog_retention_period == 7200.0
    assert s.log_level == "debug"              # debug_log_level folds in
    assert s.check_db_updated_interval == 45
    assert s.auto_restart_interval == 1800     # accepted, inert by design
    assert s.types_mapping == {"char(36)": "UUID"}
    assert s.target_database("prod_main") == "analytics"
    assert s.target_table("users") == "users_replica"
    assert s.initial_replication_threads == 4
    assert s.ignore_deletes is True
    assert s.mysql_timezone == "Europe/Berlin"
    assert s.version_initial_value == 1000
    assert s.post_initial_replication_commands == ["SELECT 1", "SELECT 2"]
    # list-form overrides → per-table lookup, glob-aware
    assert s.indexes_for("users") == ["address"]
    assert s.indexes_for("other") == []
    assert s.partition_by_for("events_2024") == ["event_day"]  # via glob
    assert s.partition_by_for("users") == []
    assert s.order_by_for("orders") == ["o_orderdate", "o_orderkey"]


def test_exact_table_key_beats_glob():
    s = Settings.load({"partition_bys": {"events_*": ["a"],
                                         "events_hot": ["b"]}})
    assert s.partition_by_for("events_hot") == ["b"]
    assert s.partition_by_for("events_cold") == ["a"]


def test_unknown_reference_key_raises():
    with pytest.raises(ValueError, match="unsupported reference config"):
        Settings.from_reference_yaml({"databases": "*",
                                      "no_such_knob": 1})


def test_supervisor_db_rescan_cadence(spark, tmp_path):
    """check_db_updated_interval wired: with a long interval the
    supervisor does NOT re-list the event root on subsequent polls (a db
    created after the first scan stays undiscovered); with the degenerate
    interval it is discovered immediately — the reference's 1 s
    process-check vs 120 s database-rescan split (runner.py:131–149)."""
    from mysql_ch_replicator_spark.engine import ReplicaEngine
    from mysql_ch_replicator_spark.runner import ReplicationSupervisor

    event_root = str(tmp_path / "events")
    os.makedirs(os.path.join(event_root, "db1"))
    engine = ReplicaEngine(spark, str(tmp_path / "replica"),
                           settings=Settings.load(
                               {"check_db_updated_interval": 3600}))
    sup = ReplicationSupervisor(engine, event_root, str(tmp_path / "ckpt"))
    assert sup.db_rescan_seconds == 3600          # taken from settings
    try:
        assert "db1" in sup.poll()["active"]
        os.makedirs(os.path.join(event_root, "db2"))
        assert "db2" not in sup.poll()["active"]  # within the interval
        sup.db_rescan_seconds = 0                 # force rescan
        assert "db2" in sup.poll()["active"]
    finally:
        sup.stop_all()
