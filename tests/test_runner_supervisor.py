"""Supervisor tests — the reference runner's contract
(runner.py:75–95 restart_dead_processes, :131–149
check_databases_updated): dead streams restart and converge, new
databases are picked up within one poll, removed ones are stopped."""

import os

from mysql_ch_replicator_spark.engine import ReplicaEngine
from mysql_ch_replicator_spark.runner import ReplicationSupervisor
from mysql_ch_replicator_spark.sources.event_log import EventLogWriter

DDL = """CREATE TABLE users (
  id int NOT NULL, name varchar(255), PRIMARY KEY (id))"""


def _write_events(event_root, db, rows, start_seq=0):
    log = EventLogWriter(os.path.join(event_root, db))
    log._seq = start_seq
    log.add(db, "users", rows)
    log.rotate()


def _final(engine, db):
    return {tuple(r) for r in
            engine.read_final(db, "users").drop("_version").collect()}


def test_supervisor_lifecycle(spark, tmp_path):
    event_root = str(tmp_path / "events")
    ckpt_root = str(tmp_path / "ckpt")
    engine = ReplicaEngine(spark, str(tmp_path / "replica"))
    for db in ("db1", "db2"):
        engine.create_table(db, DDL)
        _write_events(event_root, db, [(1, f"{db}-a"), (2, f"{db}-b")])

    sup = ReplicationSupervisor(engine, event_root, ckpt_root,
                                trigger_seconds=0.2)
    try:
        r = sup.poll()
        assert r["started"] == ["db1", "db2"]
        sup.process_all_available()
        assert _final(engine, "db1") == {(1, "db1-a"), (2, "db1-b")}
        assert _final(engine, "db2") == {(1, "db2-a"), (2, "db2-b")}

        # --- kill db1's query; supervisor restarts it and it converges
        sup.queries["db1"].stop()
        assert not sup.queries["db1"].isActive
        _write_events(event_root, "db1", [(3, "db1-late")], start_seq=100)
        r = sup.poll()
        assert r["restarted"] == ["db1"]
        sup.process_all_available()
        assert _final(engine, "db1") == {(1, "db1-a"), (2, "db1-b"),
                                         (3, "db1-late")}
        assert sup.restarts["db1"] == 1

        # --- a new database dir appears: picked up within one poll
        engine.create_table("db3", DDL)
        _write_events(event_root, "db3", [(7, "new")])
        r = sup.poll()
        assert r["started"] == ["db3"]
        sup.process_all_available()
        assert _final(engine, "db3") == {(7, "new")}
        assert r["active"] == ["db1", "db2", "db3"]
    finally:
        sup.stop_all()
    assert sup.queries == {}


def test_supervisor_stops_removed_database(spark, tmp_path):
    import shutil
    event_root = str(tmp_path / "events")
    engine = ReplicaEngine(spark, str(tmp_path / "replica"))
    engine.create_table("db1", DDL)
    _write_events(event_root, "db1", [(1, "a")])
    sup = ReplicationSupervisor(engine, event_root, str(tmp_path / "ckpt"),
                                trigger_seconds=0.2)
    try:
        sup.poll()
        sup.process_all_available()
        shutil.rmtree(os.path.join(event_root, "db1"))
        r = sup.poll()
        assert r["stopped"] == ["db1"]
        assert sup.queries == {}
    finally:
        sup.stop_all()


def test_http_control_restart_replication(spark, tmp_path):
    """GET /restart_replication schedules a full restart: queries stop,
    checkpoints clear, the next poll restarts streams which replay the
    retained log and converge (reference runner.py:88–95, 113–129)."""
    import json as _json
    import urllib.request

    event_root = str(tmp_path / "events")
    engine = ReplicaEngine(spark, str(tmp_path / "replica"))
    engine.create_table("db1", DDL)
    _write_events(event_root, "db1", [(1, "a"), (2, "b")])
    sup = ReplicationSupervisor(engine, event_root, str(tmp_path / "ckpt"),
                                trigger_seconds=0.2)
    server = sup.serve_control(port=0)
    port = server.server_address[1]
    try:
        sup.poll()
        sup.process_all_available()
        first_query = sup.queries["db1"]

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/status") as r:
            st = _json.loads(r.read())
        assert st["active"] == ["db1"]

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/restart_replication") as r:
            assert _json.loads(r.read()) == {"restart_scheduled": True}

        sup.poll()                       # performs the restart
        sup.process_all_available()      # full replay from the log
        assert sup.queries["db1"] is not first_query
        assert _final(engine, "db1") == {(1, "a"), (2, "b")}
        meta = engine.load_meta("db1", "users")
        assert meta["last_version"] >= 1
    finally:
        server.shutdown()
        sup.stop_all()


def test_supervisor_gc_expired_logs_and_stream_restarts(spark, tmp_path):
    """VERDICT r2 #7: the supervisor poll runs event-log retention GC.
    Already-processed expired files are removed (newest preserved), and a
    killed stream still restarts from its checkpoint and converges — the
    file-source checkpoint tracks processed files by path, so GC of
    processed files never breaks resumption."""
    event_root = str(tmp_path / "events")
    engine = ReplicaEngine(spark, str(tmp_path / "replica"))
    engine.create_table("db1", DDL)
    log = EventLogWriter(os.path.join(event_root, "db1"))
    for i in range(8):   # 8 published files, one row each
        log.add("db1", "users", [(i, f"u{i}")])
        log.rotate()

    sup = ReplicationSupervisor(
        engine, event_root, str(tmp_path / "ckpt"), trigger_seconds=0.2,
        log_retention_seconds=3600.0, gc_interval_seconds=0.0)
    try:
        sup.poll()
        sup.process_all_available()
        assert len(_final(engine, "db1")) == 8

        # age every published file beyond retention; next poll GCs all but
        # the newest preserve_files=5
        for fn in os.listdir(os.path.join(event_root, "db1")):
            p = os.path.join(event_root, "db1", fn)
            os.utime(p, (os.path.getmtime(p) - 7200, )*2)
        r = sup.poll()
        assert len(r["gc_removed"]) == 3          # 8 files - 5 preserved
        live = sorted(f for f in os.listdir(os.path.join(event_root, "db1"))
                      if f.endswith(".jsonl"))
        assert len(live) == 5

        # kill the stream; restart must resume from checkpoint over the
        # GC'd directory and stay converged + accept new events
        sup.queries["db1"].stop()
        log2 = EventLogWriter(os.path.join(event_root, "db1"))
        log2._seq = 1000
        log2.add("db1", "users", [(100, "after-gc")])
        log2.rotate()
        r = sup.poll()
        assert r["restarted"] == ["db1"]
        sup.process_all_available()
        final = _final(engine, "db1")
        assert (100, "after-gc") in final
        assert len(final) == 9
    finally:
        sup.stop_all()


def test_supervisor_db_pattern_filter(spark, tmp_path):
    from mysql_ch_replicator_spark.config import Settings
    event_root = str(tmp_path / "events")
    settings = Settings.load({"databases": "prod_*"})
    engine = ReplicaEngine(spark, str(tmp_path / "replica"),
                           settings=settings)
    os.makedirs(os.path.join(event_root, "prod_a"))
    os.makedirs(os.path.join(event_root, "staging_b"))
    sup = ReplicationSupervisor(engine, event_root, str(tmp_path / "ckpt"))
    assert sup.discover_databases() == ["prod_a"]
