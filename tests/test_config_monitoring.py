"""Config surface (F1 pattern filters, env overrides — reference
tests/test_config_env_vars.py style) + monitoring (A4/A5) + engine recovery
(A1) / drift verification (D15) / target renaming."""

from __future__ import annotations

import json

import pytest

from mysql_ch_replicator_spark.config import Settings
from mysql_ch_replicator_spark.engine import ReplicaEngine
from mysql_ch_replicator_spark.monitoring import ApplyStats, event_log_lag
from mysql_ch_replicator_spark.sources.event_log import (
    EventLogWriter, read_event_log,
)


# -- Settings / F1 ----------------------------------------------------------

def test_pattern_filters_exclude_wins():
    s = Settings.load({"databases": "db_*", "tables": ["users", "orders_*"],
                       "exclude_databases": "db_secret",
                       "exclude_tables": ["orders_tmp"]})
    assert s.is_database_matches("db_main")
    assert not s.is_database_matches("other")
    assert not s.is_database_matches("db_secret")      # exclude wins
    assert s.is_table_matches("users")
    assert s.is_table_matches("orders_2024")
    assert not s.is_table_matches("orders_tmp")        # exclude wins
    assert not s.is_table_matches("misc")


def test_star_and_empty_patterns_match_everything():
    s = Settings.load({})
    assert s.is_database_matches("anything")
    assert s.is_table_matches("anything")


def test_env_overrides(monkeypatch, tmp_path):
    monkeypatch.setenv("REPLICA_ROOT", "/data/replica")
    monkeypatch.setenv("SOURCE_JDBC_URL", "jdbc:mysql://h:3306/db")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(json.dumps({
        "replica": {"root": "/ignored"},
        "source": {"url": "jdbc:ignored"},
    }))  # JSON is valid YAML
    s = Settings.load(str(cfg))
    assert s.replica.root == "/data/replica"
    assert s.source.url == "jdbc:mysql://h:3306/db"


@pytest.mark.parametrize("env,value,attr,expect", [
    ("SOURCE_JDBC_URL", "jdbc:mysql://h:3306/db",
     lambda s: s.source.url, "jdbc:mysql://h:3306/db"),
    ("SOURCE_USER", "repl", lambda s: s.source.user, "repl"),
    ("SOURCE_PASSWORD", "s3cret", lambda s: s.source.password, "s3cret"),
    ("SOURCE_CHARSET", "latin1", lambda s: s.source.charset, "latin1"),
    ("REPLICA_ROOT", "/data/replica", lambda s: s.replica.root,
     "/data/replica"),
    ("REPLICA_ERASE_BATCH_SIZE", "5000",
     lambda s: s.replica.erase_batch_size, 5000),
    ("MYSQL_TIMEZONE", "Europe/Berlin",
     lambda s: s.mysql_timezone, "Europe/Berlin"),
    ("LOG_LEVEL", "DEBUG", lambda s: s.log_level, "debug"),
    ("OPTIMIZE_INTERVAL", "3600", lambda s: s.optimize_interval, 3600.0),
    ("BINLOG_RETENTION_PERIOD", "7200",
     lambda s: s.binlog_retention_period, 7200.0),
])
def test_env_override_matrix(monkeypatch, env, value, attr, expect):
    """Parameterized env-var matrix — the reference's
    tests/test_config_env_vars.py shape over _apply_env_overrides
    (config.py:240–259)."""
    monkeypatch.setenv(env, value)
    s = Settings.load({})
    assert attr(s) == expect


def test_validation_rejects_bad_values():
    with pytest.raises(ValueError):
        Settings.load({"log_level": "noisy"})
    with pytest.raises(ValueError):
        Settings.load({"mysql_timezone": "Not/AZone"})
    with pytest.raises(ValueError):
        Settings.load({"no_such_setting": 1})
    with pytest.raises(ValueError):
        Settings.load({"initial_replication_threads": 0})


def test_target_renaming():
    s = Settings.load({"target_databases": {"src": "dst"},
                       "target_tables": {"t1": "t1_replica"}})
    assert s.target_database("src") == "dst"
    assert s.target_database("other") == "other"
    assert s.target_table("t1") == "t1_replica"


# -- engine + settings integration ------------------------------------------

_DDL = """CREATE TABLE users (
  id int NOT NULL, name varchar(64), PRIMARY KEY (id))"""


def _mk_events(spark, tmp_path, db="src", table="users"):
    w = EventLogWriter(str(tmp_path / "log"))
    w.ddl(db, _DDL)
    w.add(db, table, [(1, "alice"), (2, "bob")])
    w.add(db, "ignored_tbl", [(9, "x")])
    return read_event_log(spark, str(tmp_path / "log"))


def test_engine_pattern_filter_and_target_rename(spark, tmp_path):
    s = Settings.load({"databases": "src", "tables": ["users"],
                       "target_databases": {"src": "dst"},
                       "target_tables": {"users": "users_replica"}})
    eng = ReplicaEngine(spark, str(tmp_path / "replica"), settings=s)
    eng.apply_batch(_mk_events(spark, tmp_path))
    # renamed on storage; excluded table never created
    assert eng.tables("dst") == ["users_replica"]
    got = {r.id: r.name for r in eng.read_final("dst", "users_replica").collect()}
    assert got == {1: "alice", 2: "bob"}


def test_engine_excluded_database_is_skipped(spark, tmp_path):
    s = Settings.load({"databases": "prod_*"})
    eng = ReplicaEngine(spark, str(tmp_path / "replica"), settings=s)
    eng.apply_batch(_mk_events(spark, tmp_path))
    assert eng.tables("src") == []


# -- A1 recover_version ------------------------------------------------------

def test_recover_version_from_data(spark, tmp_path):
    eng = ReplicaEngine(spark, str(tmp_path / "replica"))
    eng.create_table("db", _DDL)
    eng.apply_batch(_mk_events(spark, tmp_path, db="db"))
    w = EventLogWriter(str(tmp_path / "log2"))
    w._seq = 100
    w.add("db", "users", [(1, "alice2")])
    eng.apply_batch(read_event_log(spark, str(tmp_path / "log2")))
    meta = eng.load_meta("db", "users")
    assert meta["last_version"] == 2  # one version per applied batch
    # simulate lost/stale metadata (crash before save, parallel writer)
    meta["last_version"] = 0
    eng.save_meta("db", "users", meta)
    assert eng.recover_version("db", "users") == 2
    assert eng.load_meta("db", "users")["last_version"] == 2


# -- D15 drift verification ---------------------------------------------------

def test_verify_structure_drift(spark, tmp_path):
    eng = ReplicaEngine(spark, str(tmp_path / "replica"))
    eng.create_table("db", _DDL)
    eng.verify_structure("db", "users", _DDL)  # no drift
    drifted = _DDL.replace("varchar(64)", "varchar(255)")
    with pytest.raises(RuntimeError, match="drift"):
        eng.verify_structure("db", "users", drifted)


# -- A4/A5 monitoring ---------------------------------------------------------

def test_apply_stats_counters(spark, tmp_path):
    eng = ReplicaEngine(spark, str(tmp_path / "replica"))
    eng.apply_batch(_mk_events(spark, tmp_path, db="db"))
    d = eng.stats.as_dict()
    assert d["batches_count"] == 1
    assert d["ddl_count"] == 1
    # ignored_tbl was never CREATEd → its ADD is skipped; only users counts
    assert d["insert_records_count"] == 2
    assert d["records_per_second"] > 0


def test_event_log_lag(tmp_path):
    w = EventLogWriter(str(tmp_path / "log"), records_per_file=2)
    for i in range(5):
        w.add("db", "t", [(i,)])
    lag = event_log_lag(str(tmp_path / "log"), last_processed_seq=1,
                        records_per_file=2)
    assert lag["files_lag"] == 1
    assert lag["approx_events_lag"] == 3
    lag_done = event_log_lag(str(tmp_path / "log"), last_processed_seq=4,
                             records_per_file=2)
    assert lag_done["approx_events_lag"] == 0


def test_apply_stats_rps():
    st = ApplyStats()
    st.record_batch(100, 20, 1, 0.5)
    assert st.events_count == 121
    assert st.insert_records_count == 100
    assert st.erase_records_count == 20


def test_version_initial_value_offsets_version_space(spark, tmp_path):
    """version_initial_value starts every new table's version counter at
    the configured base (reference clickhouse_api.py:205): snapshot rows
    stamp base+1 and CDC batches keep counting monotonically above it —
    a rebuilt replica can slot ABOVE an old replica's version space."""
    from mysql_ch_replicator_spark.sources.event_log import (
        EventLogWriter, read_event_log,
    )

    settings = Settings.load({"version_initial_value": 1000})
    engine = ReplicaEngine(spark, str(tmp_path / "replica"),
                           settings=settings)
    engine.create_table("db1", """CREATE TABLE users (
      id int NOT NULL, name varchar(32), PRIMARY KEY (id))""")
    assert engine.load_meta("db1", "users")["last_version"] == 1000

    engine.snapshot_table("db1", "users", spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, name string"))
    assert engine.load_meta("db1", "users")["last_version"] == 1001
    vs = {r._version for r in engine.read_raw("db1", "users").collect()}
    assert vs == {1001}

    log = EventLogWriter(str(tmp_path / "log"))
    log.add("db1", "users", [(3, "c")])
    engine.apply_batch(read_event_log(spark, str(tmp_path / "log")))
    assert engine.load_meta("db1", "users")["last_version"] == 1002
    assert engine.recover_version("db1", "users") == 1002


def test_http_host_port_settings_wire_control_plane(spark, tmp_path):
    """http_host/http_port settings feed serve_control's bind address
    (reference config.py:197–198)."""
    import json as _json
    import urllib.request

    from mysql_ch_replicator_spark.runner import ReplicationSupervisor

    settings = Settings.load({"http_host": "127.0.0.1", "http_port": 0})
    engine = ReplicaEngine(spark, str(tmp_path / "replica"),
                           settings=settings)
    sup = ReplicationSupervisor(engine, str(tmp_path / "events"),
                                str(tmp_path / "ckpt"))
    server = sup.serve_control()   # host/port from settings
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/status") as r:
            assert _json.loads(r.read())["active"] == []
    finally:
        server.shutdown()
