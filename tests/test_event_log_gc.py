"""Event-log retention GC (reference binlog_replicator.py:288–298):
old published files are pruned by age with a preserve-count floor, and a
streaming consumer restarting from its checkpoint still replays
correctly from the retained tail."""

import os

from mysql_ch_replicator_spark.engine import ReplicaEngine
from mysql_ch_replicator_spark.sources.event_log import (
    EventLogWriter, gc_event_log,
)

DB = "testdb"
DDL = """CREATE TABLE users (
  id int NOT NULL, name varchar(255), PRIMARY KEY (id))"""


def _aged(path, seconds_ago, now):
    os.utime(path, (now - seconds_ago, now - seconds_ago))


def test_gc_prunes_old_preserves_recent_and_floor(tmp_path):
    log_dir = str(tmp_path / "log")
    log = EventLogWriter(log_dir, records_per_file=1)
    for i in range(10):                      # 10 published files
        log.add(DB, "users", [(i, "x")])
    files = sorted(os.listdir(log_dir))
    assert len(files) == 10
    now = 1_000_000.0
    for f in files[:7]:                      # first 7 are "old"
        _aged(os.path.join(log_dir, f), 9_999, now)

    removed = gc_event_log(log_dir, retention_seconds=3_600,
                           preserve_files=5, clock=lambda: now)
    # candidates = all but newest 5 → files 0..4; of those, all aged → gone
    assert [os.path.basename(p) for p in removed] == \
        [f"{i:06d}.jsonl" for i in range(5)]
    assert sorted(os.listdir(log_dir)) == \
        [f"{i:06d}.jsonl" for i in range(5, 10)]

    # second pass: 5 and 6 are old but inside the preserve floor — kept
    assert gc_event_log(log_dir, retention_seconds=3_600,
                        preserve_files=5, clock=lambda: now) == []


def test_gc_ignores_unpublished_live_buffer(tmp_path):
    log_dir = str(tmp_path / "log")
    log = EventLogWriter(log_dir, live=True)
    log.add(DB, "users", [(1, "x")])         # buffered, nothing on disk
    assert gc_event_log(log_dir, retention_seconds=0,
                        preserve_files=0) == []
    log.rotate()
    assert len(os.listdir(log_dir)) == 1


def test_restart_from_checkpoint_after_gc(spark, tmp_path):
    """Processed files GC'd away must not break checkpoint resumption:
    the restarted stream continues from the retained tail."""
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    engine = ReplicaEngine(spark, str(tmp_path / "replica"))
    engine.create_table(DB, DDL)

    log = EventLogWriter(log_dir)
    log.add(DB, "users", [(1, "a"), (2, "b")])
    log.rotate()

    q = engine.start_streaming(log_dir, str(tmp_path / "ckpt"),
                               trigger_seconds=0.5)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # GC everything processed (no preserve floor, zero retention)
    removed = gc_event_log(log_dir, retention_seconds=0, preserve_files=0)
    assert removed  # file 0 pruned

    # producer continues into new files while consumer is down
    log.add(DB, "users", [(3, "c")])
    log.rotate()

    q2 = engine.start_streaming(log_dir, str(tmp_path / "ckpt"),
                                trigger_seconds=0.5)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {tuple(r) for r in
           engine.read_final(DB, "users").drop("_version").collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
