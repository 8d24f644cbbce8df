"""CLI parity (reference main.py:151–210): the same mode surface drives
the Spark engine — run_all supervises, db_replicator replicates one
database, db_optimizer compacts, monitoring reports lag, and
binlog_replicator converts a Debezium envelope stream into the native
event log. Tests drive each mode one bounded iteration."""

import io
import json
import os

import pytest

from mysql_ch_replicator_spark.config import Settings
from mysql_ch_replicator_spark.engine import ReplicaEngine
from mysql_ch_replicator_spark.main import (
    build_parser, run_all, run_binlog_replicator, run_db_optimizer,
    run_db_replicator, run_monitoring,
)
from mysql_ch_replicator_spark.sources.event_log import EventLogWriter

DDL = """CREATE TABLE users (
  id int NOT NULL, name varchar(64), PRIMARY KEY (id))"""


def _config(tmp_path) -> Settings:
    return Settings.load({
        "replica": {"root": str(tmp_path / "replica")},
        "event_log_dir": str(tmp_path / "binlog"),
    })


def _write_events(tmp_path, db="db1", rows=((1, "a"), (2, "b"))):
    log = EventLogWriter(os.path.join(str(tmp_path / "binlog"), db))
    log.add(db, "users", list(rows))


def test_parser_accepts_reference_flags():
    p = build_parser()
    a = p.parse_args(["db_replicator", "--db", "mydb", "--target_db", "t",
                      "--worker_id", "0", "--total_workers", "4",
                      "--table", "users", "--skip_initial_replication"])
    assert (a.mode, a.db, a.target_db) == ("db_replicator", "mydb", "t")
    assert a.total_workers == 4 and a.skip_initial_replication
    assert build_parser().parse_args([]).mode is None


def test_run_all_replicates_and_stops(spark, tmp_path):
    cfg = _config(tmp_path)
    engine = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    engine.create_table("db1", DDL)
    _write_events(tmp_path)
    sup = run_all(None, cfg, spark=spark, max_polls=1)
    # poll started the stream; drain it through a fresh supervisor handle
    assert sup.queries == {}   # stop_all ran on exit
    e2 = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    # events may or may not have drained in one 1s trigger — apply rest
    from mysql_ch_replicator_spark.sources.event_log import read_event_log
    e2.apply_batch(read_event_log(
        spark, os.path.join(cfg.event_log_dir, "db1")))
    got = {(r.id, r.name) for r in
           e2.read_final("db1", "users").drop("_version").collect()}
    assert got == {(1, "a"), (2, "b")}


def test_db_replicator_realtime_only(spark, tmp_path):
    cfg = _config(tmp_path)
    engine = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    engine.create_table("db1", DDL)
    _write_events(tmp_path)
    args = build_parser().parse_args(
        ["db_replicator", "--db", "db1", "--skip_initial_replication"])
    sup = run_db_replicator(args, cfg, spark=spark, max_polls=1)
    assert sup is not None and sup.queries == {}


def test_db_replicator_requires_db(spark, tmp_path):
    args = build_parser().parse_args(["db_replicator"])
    with pytest.raises(SystemExit):
        run_db_replicator(args, _config(tmp_path), spark=spark, max_polls=1)


def test_monitoring_reports_lag(spark, tmp_path):
    cfg = _config(tmp_path)
    engine = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    engine.create_table("db1", DDL)
    _write_events(tmp_path)
    args = build_parser().parse_args(["monitoring"])
    buf = io.StringIO()
    run_monitoring(args, cfg, spark=spark, max_iterations=1, out=buf)
    report = json.loads(buf.getvalue())
    assert report["databases"]["db1"]["newest_log_file"] == 0
    assert report["databases"]["db1"]["table_last_seq"]["users"] == -1
    assert report["dead_letters"] == 0  # healthy pipeline: visible zero

    # quarantined envelopes surface in the next report
    dl = tmp_path / "binlog" / "_dead_letter" / "batch=0"
    dl.mkdir(parents=True)
    (dl / "part-0000.json").write_text(
        json.dumps({"raw_value": "{{{", "reason": "malformed-json"})
        + "\n")
    buf2 = io.StringIO()
    run_monitoring(args, cfg, spark=spark, max_iterations=1, out=buf2)
    assert json.loads(buf2.getvalue())["dead_letters"] == 1


def test_db_optimizer_runs_sweep(spark, tmp_path):
    cfg = _config(tmp_path)
    engine = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    engine.create_table("db1", DDL)
    from mysql_ch_replicator_spark.sources.event_log import read_event_log
    _write_events(tmp_path)
    engine.apply_batch(read_event_log(
        spark, os.path.join(cfg.event_log_dir, "db1")))
    run_db_optimizer(None, cfg, spark=spark, max_iterations=1)
    e2 = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    assert e2.read_final("db1", "users").count() == 2


def test_binlog_replicator_converts_envelopes(spark, tmp_path):
    """Envelope JSONL in → native event log out → engine apply: the full
    no-decoder ingest path under CLI wiring."""
    cfg = _config(tmp_path)
    engine = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    engine.create_table("shop", DDL)

    env_dir = tmp_path / "envelopes"
    env_dir.mkdir()
    events = [
        {"op": "c", "after": {"id": 1, "name": "Ivan"}, "before": None,
         "ts_ms": 1, "source": {"db": "shop", "table": "users",
                                "file": "binlog.1", "pos": 10}},
        {"op": "u", "after": {"id": 1, "name": "Ivan2"}, "before": None,
         "ts_ms": 2, "source": {"db": "shop", "table": "users",
                                "file": "binlog.1", "pos": 20}},
        {"op": "d", "after": None, "before": {"id": 2, "name": "x"},
         "ts_ms": 3, "source": {"db": "shop", "table": "users",
                                "file": "binlog.1", "pos": 30}},
    ]
    with open(env_dir / "dump.jsonl", "w", encoding="utf-8") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")

    args = build_parser().parse_args(
        ["binlog_replicator", "--envelope_dir", str(env_dir)])
    q = run_binlog_replicator(args, cfg, spark=spark,
                              await_termination=False)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    from mysql_ch_replicator_spark.sources.event_log import EVENT_SCHEMA
    log = spark.read.schema(EVENT_SCHEMA).json(
        os.path.join(cfg.event_log_dir, "shop"))
    assert log.count() == 3
    engine.apply_batch(log)
    got = {(r.id, r.name) for r in
           engine.read_final("shop", "users").drop("_version").collect()}
    assert got == {(1, "Ivan2")}


def test_binlog_replicator_starts_with_zero_tables(spark, tmp_path):
    """ADVICE r6: a replicator started before ANY table exists must run
    in DDL-only mode — the mid-stream bootstrap path depends on a routed
    CREATE TABLE flowing through for an empty replica, so refusing to
    start with zero registered tables would deadlock first deployment."""
    cfg = _config(tmp_path)
    env_dir = tmp_path / "envelopes"
    env_dir.mkdir()
    with open(env_dir / "b1.jsonl", "w", encoding="utf-8") as fh:
        fh.write(json.dumps(
            {"source": {"db": "shop", "table": None,
                        "file": "binlog.1", "pos": 5},
             "ts_ms": 1, "databaseName": "shop",
             "ddl": "CREATE TABLE users (id int NOT NULL, name varchar(8),"
                    " PRIMARY KEY (id))",
             "tableChanges": []}) + "\n")
    args = build_parser().parse_args(
        ["binlog_replicator", "--envelope_dir", str(env_dir)])
    q = run_binlog_replicator(args, cfg, spark=spark,
                              await_termination=False)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from mysql_ch_replicator_spark.sources.event_log import EVENT_SCHEMA
    log = spark.read.schema(EVENT_SCHEMA).json(
        os.path.join(cfg.event_log_dir, "shop"))
    assert log.count() == 1
    engine = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    engine.apply_batch(log)
    assert "users" in engine.tables("shop")


def test_binlog_replicator_one_write_job_per_db(spark, tmp_path,
                                                monkeypatch):
    """r6 verdict #2: the ingest micro-batch issues O(#dbs present) write
    jobs, not O(#registered tables) — per-table frames union into ONE
    append per db, and structure() is read only for tables that actually
    appear in the batch (ADVICE r6), so idle tables cost nothing at
    streaming cadence."""
    from pyspark.sql.readwriter import DataFrameWriter

    from mysql_ch_replicator_spark.engine import ReplicaEngine as RE

    cfg = _config(tmp_path)
    engine = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    engine.create_table("shop", DDL)
    for extra in ("a", "b", "c"):
        engine.create_table("shop", DDL.replace("users", f"t_{extra}"))

    env_dir = tmp_path / "envelopes"
    env_dir.mkdir()
    with open(env_dir / "dump.jsonl", "w", encoding="utf-8") as fh:
        for i, table in enumerate(["users", "t_a", "users"], start=1):
            fh.write(json.dumps(
                {"op": "c", "after": {"id": i, "name": f"u{i}"},
                 "before": None, "ts_ms": i,
                 "source": {"db": "shop", "table": table,
                            "file": "binlog.1", "pos": i * 10}}) + "\n")

    writes: list[str] = []
    orig_json = DataFrameWriter.json
    monkeypatch.setattr(
        DataFrameWriter, "json",
        lambda self, path, **kw: (writes.append(path),
                                  orig_json(self, path, **kw))[1])
    structures: list[tuple[str, str]] = []
    orig_structure = RE.structure
    monkeypatch.setattr(
        RE, "structure",
        lambda self, db, table: (structures.append((db, table)),
                                 orig_structure(self, db, table))[1])

    args = build_parser().parse_args(
        ["binlog_replicator", "--envelope_dir", str(env_dir)])
    q = run_binlog_replicator(args, cfg, spark=spark,
                              await_termination=False)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch_writes = [p for p in writes if cfg.event_log_dir in p]
    assert len(batch_writes) == 1, batch_writes   # 4 tables, ONE db write
    # only the two tables present in the batch had their structure read
    assert set(structures) == {("shop", "users"), ("shop", "t_a")}

    from mysql_ch_replicator_spark.sources.event_log import EVENT_SCHEMA
    log = spark.read.schema(EVENT_SCHEMA).json(
        os.path.join(cfg.event_log_dir, "shop"))
    assert log.count() == 3


def test_graceful_killer_stops_supervisor_loop(spark, tmp_path):
    """A SIGTERM-set flag ends run_forever at the next poll boundary
    (reference GracefulKiller, utils.py:13-21)."""
    from mysql_ch_replicator_spark.main import GracefulKiller
    from mysql_ch_replicator_spark.runner import ReplicationSupervisor

    cfg = _config(tmp_path)
    engine = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    sup = ReplicationSupervisor(engine, cfg.event_log_dir,
                                str(tmp_path / "ckpt"))
    killer = GracefulKiller(install=False)
    killer._exit()
    sup.run_forever(poll_seconds=0.0, max_polls=None, should_stop=killer)
    assert sup.queries == {}   # loop exited without a single poll


def test_ingest_and_apply_streams_compose_e2e(spark, tmp_path):
    """The full two-stage production topology, both stages live at once:
    binlog_replicator's envelope->event-log stream feeding a supervisor
    apply stream — Debezium dump in, queryable replica out, no manual
    apply anywhere."""
    from mysql_ch_replicator_spark.runner import ReplicationSupervisor

    cfg = _config(tmp_path)
    engine = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    engine.create_table("shop", DDL)

    env_dir = tmp_path / "envelopes"
    env_dir.mkdir()
    with open(env_dir / "dump.jsonl", "w", encoding="utf-8") as fh:
        for i in range(1, 26):
            fh.write(json.dumps(
                {"op": "c", "after": {"id": i, "name": f"u{i}"},
                 "before": None, "ts_ms": i,
                 "source": {"db": "shop", "table": "users",
                            "file": "binlog.1", "pos": i * 10}}) + "\n")

    args = build_parser().parse_args(
        ["binlog_replicator", "--envelope_dir", str(env_dir)])
    ingest = run_binlog_replicator(args, cfg, spark=spark,
                                   await_termination=False)
    sup = ReplicationSupervisor(engine, cfg.event_log_dir,
                                str(tmp_path / "ckpt"),
                                trigger_seconds=0.2)
    try:
        ingest.processAllAvailable()   # envelopes -> event log
        sup.poll()                     # discovers db "shop"
        sup.process_all_available()    # event log -> replica
    finally:
        ingest.stop()
        sup.stop_all()

    got = {(r.id, r.name) for r in
           engine.read_final("shop", "users").drop("_version").collect()}
    assert got == {(i, f"u{i}") for i in range(1, 26)}


def test_binlog_replicator_ingests_table_created_mid_stream(spark, tmp_path):
    """ADVICE r5: DDL routes by the envelope's own databaseName (not the
    stream-start branch set) and branches refresh per micro-batch — a
    CREATE TABLE for a brand-new database flows to its per-db log, the
    apply tier bootstraps the table, and the NEXT batch's row envelopes
    for it are ingested with no replicator restart."""
    cfg = _config(tmp_path)
    engine = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    engine.create_table("shop", DDL)   # pre-existing db so the stream starts

    env_dir = tmp_path / "envelopes"
    env_dir.mkdir()
    # batch 1: CREATE TABLE in a database the replicator has never seen
    with open(env_dir / "b1.jsonl", "w", encoding="utf-8") as fh:
        fh.write(json.dumps(
            {"source": {"db": "newdb", "table": None,
                        "file": "binlog.9", "pos": 5},
             "ts_ms": 1, "databaseName": "newdb",
             "ddl": "CREATE TABLE items (id int NOT NULL, sku varchar(32),"
                    " PRIMARY KEY (id))",
             "tableChanges": []}) + "\n")

    args = build_parser().parse_args(
        ["binlog_replicator", "--envelope_dir", str(env_dir)])
    q = run_binlog_replicator(args, cfg, spark=spark,
                              await_termination=False)
    from mysql_ch_replicator_spark.sources.event_log import EVENT_SCHEMA
    try:
        q.processAllAvailable()
        # the DDL barrier reached newdb's log despite newdb ∉ branches
        log1 = spark.read.schema(EVENT_SCHEMA).json(
            os.path.join(cfg.event_log_dir, "newdb"))
        assert log1.count() == 1
        engine.apply_batch(log1)          # apply tier registers the table
        assert "items" in engine.tables("newdb")

        # batch 2: row envelopes for the mid-stream table now ingest
        with open(env_dir / "b2.jsonl", "w", encoding="utf-8") as fh:
            fh.write(json.dumps(
                {"op": "c", "after": {"id": 7, "sku": "ab-7"},
                 "before": None, "ts_ms": 2,
                 "source": {"db": "newdb", "table": "items",
                            "file": "binlog.9", "pos": 15}}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()

    log2 = spark.read.schema(EVENT_SCHEMA).json(
        os.path.join(cfg.event_log_dir, "newdb"))
    engine.apply_batch(log2)
    got = {(r.id, r.sku) for r in
           engine.read_final("newdb", "items").drop("_version").collect()}
    assert got == {(7, "ab-7")}


def test_binlog_replicator_routes_schema_change_envelopes(spark, tmp_path):
    """A schema-change envelope (non-null ddl) in the same stream becomes
    a QUERY barrier in the per-db log: rows before it apply to the old
    structure, the ALTER evolves the table, rows after it carry the new
    column — the CLI twin of the native DDL pathway."""
    cfg = _config(tmp_path)
    engine = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    engine.create_table("shop", DDL)

    env_dir = tmp_path / "envelopes"
    env_dir.mkdir()
    events = [
        {"op": "c", "after": {"id": 1, "name": "Ivan"}, "before": None,
         "ts_ms": 1, "source": {"db": "shop", "table": "users",
                                "file": "binlog.1", "pos": 10}},
        {"source": {"db": "shop", "table": None,
                    "file": "binlog.1", "pos": 20},
         "ts_ms": 2, "databaseName": "shop",
         "ddl": "ALTER TABLE users ADD COLUMN city varchar(64)",
         "tableChanges": []},
    ]
    with open(env_dir / "dump.jsonl", "w", encoding="utf-8") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")

    args = build_parser().parse_args(
        ["binlog_replicator", "--envelope_dir", str(env_dir)])
    q = run_binlog_replicator(args, cfg, spark=spark,
                              await_termination=False)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    from mysql_ch_replicator_spark.sources.event_log import (
        EVENT_SCHEMA, EVENT_TYPE_QUERY,
    )
    log = spark.read.schema(EVENT_SCHEMA).json(
        os.path.join(cfg.event_log_dir, "shop"))
    assert log.where(f"event_type = {EVENT_TYPE_QUERY}").count() == 1
    engine.apply_batch(log)
    st = engine.structure("shop", "users")
    assert [f.name for f in st.fields] == ["id", "name", "city"]
    got = {tuple(r) for r in
           engine.read_final("shop", "users").drop("_version").collect()}
    assert got == {(1, "Ivan", None)}


def test_binlog_replicator_quarantines_dead_letters(spark, tmp_path):
    """Envelopes matching neither contract (corrupt JSON, alien JSON)
    land in a counted _dead_letter quarantine with a reason, while the
    valid rows in the SAME batch still convert and apply — the "no
    silent drops" ingest rule. Tombstones and schema-topic control
    messages stay legitimately dropped, not quarantined."""
    cfg = _config(tmp_path)
    engine = ReplicaEngine(spark, cfg.replica.root, settings=cfg)
    engine.create_table("shop", DDL)

    env_dir = tmp_path / "envelopes"
    env_dir.mkdir()
    lines = [
        json.dumps({"op": "c", "after": {"id": 1, "name": "Ivan"},
                    "before": None, "ts_ms": 1,
                    "source": {"db": "shop", "table": "users",
                               "file": "binlog.1", "pos": 10}}),
        "{{{corrupt bytes",                       # malformed-json
        json.dumps({"foo": 42}),                  # unrecognized-envelope
        json.dumps({"databaseName": "shop", "ddl": ""}),  # control: drop
    ]
    with open(env_dir / "dump.jsonl", "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")

    args = build_parser().parse_args(
        ["binlog_replicator", "--envelope_dir", str(env_dir)])
    q = run_binlog_replicator(args, cfg, spark=spark,
                              await_termination=False)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    from mysql_ch_replicator_spark.sources.event_log import EVENT_SCHEMA
    log = spark.read.schema(EVENT_SCHEMA).json(
        os.path.join(cfg.event_log_dir, "shop"))
    assert log.count() == 1          # the valid row converted
    dead = spark.read.json(
        os.path.join(cfg.event_log_dir, "_dead_letter"))
    got = {(r.reason, r.raw_value[:3]) for r in dead.collect()}
    assert got == {("malformed-json", "{{{"),
                   ("unrecognized-envelope", '{"f')}


def test_dead_letter_classifier_contract(spark):
    """Unit contract: tombstones and control messages are NOT dead;
    corrupt bytes and alien JSON are, with distinct reasons."""
    from mysql_ch_replicator_spark.sources.debezium import (
        debezium_dead_letters)
    rows = [
        (json.dumps({"op": "c", "after": {},
                     "source": {"db": "d", "table": "t",
                                "file": "f", "pos": 1}}),),
        (None,),                                     # tombstone
        (json.dumps({"databaseName": "d", "ddl": ""}),),   # control
        (json.dumps({"ddl": "CREATE TABLE x (a int)",
                     "databaseName": "d",
                     "source": {"file": "f", "pos": 2}}),),
        ("{{{not json",),
        (json.dumps({"foo": 42}),),
        # row envelope with a truncated source: no branch could route it
        (json.dumps({"op": "c", "after": {"id": 9}}),),
        # DDL with nothing to route by: no per-db log could receive it
        (json.dumps({"ddl": "ALTER TABLE x ADD b int"}),),
    ]
    df = spark.createDataFrame(rows, "value string")
    got = sorted(r.reason for r in debezium_dead_letters(df).collect())
    assert got == ["malformed-json", "unrecognized-envelope",
                   "unroutable-ddl", "unroutable-row"]
    # the shared predicate and the classifier agree row for row
    from mysql_ch_replicator_spark.sources.debezium import (
        debezium_dead_predicate)
    assert df.where(debezium_dead_predicate("value")).count() == \
        debezium_dead_letters(df).count() == 4
