"""Multi-stream supervisor — the reference's ``runner.py`` process
orchestrator (runner.py:131–232) restated for Structured Streaming.

The reference runs one ``DbReplicatorRunner`` *process* per database,
restarts dead processes every second (``restart_dead_processes``,
runner.py:75–95), and rescans MySQL every ``check_db_updated_interval``
for created/removed databases (``check_databases_updated``,
runner.py:131–149). Here each database is one **streaming query** over
its own event-log subdirectory (``event_root/<db>/``) with its own
checkpoint — the per-db isolation the reference gets from processes:
one database's failure never stalls the others, and a restart resumes
exactly from that database's checkpoint.

``poll()`` is one supervisor iteration (start new, restart dead, stop
removed, kick the compaction scheduler); ``run_forever`` drives it on a
cadence. Tests drive ``poll()`` directly — same contract, no sleeps.

Scale note: queries share the SparkSession's scheduler pool; at real
scale each database's micro-batches are jobs distributed over the
cluster, so "one query per db" bounds *driver* bookkeeping, not
parallelism. Hundreds of databases → group dirs per query via glob
(Spark file sources accept globs) — the dial is queries-per-driver.
"""

from __future__ import annotations

import os
import shutil
import time

from .engine import ReplicaEngine
from .optimizer import ReplicaOptimizer


class ReplicationSupervisor:
    def __init__(self, engine: ReplicaEngine, event_root: str,
                 checkpoint_root: str,
                 trigger_seconds: float = 1.0,
                 max_files_per_trigger: int | None = None,
                 optimizer: ReplicaOptimizer | None = None,
                 log_retention_seconds: float | None = None,
                 gc_interval_seconds: float = 60.0,
                 db_rescan_seconds: float | None = None):
        self.engine = engine
        self.event_root = event_root
        self.checkpoint_root = checkpoint_root
        self.trigger_seconds = trigger_seconds
        self.max_files_per_trigger = max_files_per_trigger
        self.optimizer = optimizer
        # database-discovery cadence — the reference's
        # check_db_updated_interval (config.py:136/:190; runner.py:131–149
        # rescans MySQL for new/removed databases every 120 s while the
        # dead-process check runs every second). None → take it from the
        # engine's settings; engines without settings rescan every poll
        # (the test-friendly degenerate cadence).
        if db_rescan_seconds is None and engine.settings is not None:
            db_rescan_seconds = engine.settings.check_db_updated_interval
        self.db_rescan_seconds = db_rescan_seconds
        self._last_rescan: float | None = None   # None → never scanned
        self._known_dbs: list[str] = []
        # event-log retention GC cadence (reference runs remove_old_files
        # inside the binlog writer loop, binlog_replicator.py:288–298;
        # here the supervisor owns it — one sweep across every db's log
        # dir at most every gc_interval_seconds). None → GC disabled.
        self.log_retention_seconds = log_retention_seconds
        self.gc_interval_seconds = gc_interval_seconds
        self._last_gc = 0.0
        self.queries: dict[str, object] = {}   # db -> StreamingQuery
        self.restarts: dict[str, int] = {}     # db -> restart count (A4-ish)
        self._need_restart = False             # /restart_replication flag

    # -- discovery ----------------------------------------------------------

    def discover_databases(self) -> list[str]:
        """Databases = subdirectories of the event root, filtered through
        the same db patterns as replication (reference
        check_databases_updated, runner.py:131–137)."""
        if not os.path.isdir(self.event_root):
            return []
        # "_"/"." prefixes are infrastructure, not databases (Spark's own
        # hidden-file convention): checkpoint dirs, _spark_metadata, etc.
        dbs = sorted(d for d in os.listdir(self.event_root)
                     if os.path.isdir(os.path.join(self.event_root, d))
                     and not d.startswith(("_", ".")))
        s = self.engine.settings
        if s is not None:
            dbs = [d for d in dbs if s.is_database_matches(d)]
        return dbs

    # -- lifecycle ----------------------------------------------------------

    def _start(self, db: str):
        q = self.engine.start_streaming(
            os.path.join(self.event_root, db),
            os.path.join(self.checkpoint_root, db),
            trigger_seconds=self.trigger_seconds,
            max_files_per_trigger=self.max_files_per_trigger)
        self.queries[db] = q
        return q

    def poll(self) -> dict:
        """One supervisor iteration:

        1. start a query for every newly discovered database
           (runner.py:137–142),
        2. restart any dead query from its checkpoint
           (restart_dead_processes, runner.py:75–95) — the seq replay
           guard makes the at-least-once resume harmless,
        3. stop + drop queries whose database directory disappeared
           (runner.py:144–149),
        4. run the compaction scheduler if attached (the reference runs
           DbOptimizerRunner alongside, runner.py:166–168),
        5. GC expired event-log files across every db's log dir if
           retention is configured (reference remove_old_files,
           binlog_replicator.py:288–298) — checkpointed streams are
           unaffected: the file-source checkpoint tracks processed files
           by path, and the newest files are always preserved.

        Returns a summary dict for monitoring."""
        started, restarted, stopped = [], [], []
        if self._need_restart:
            self._restart_replication()
        now = time.time()
        if (self._last_rescan is None or not self.db_rescan_seconds
                or now - self._last_rescan >= self.db_rescan_seconds):
            self._known_dbs = self.discover_databases()
            self._last_rescan = now
        dbs = self._known_dbs

        for db in dbs:
            if db not in self.queries:
                self._start(db)
                started.append(db)

        for db, q in list(self.queries.items()):
            if db not in dbs:
                q.stop()
                del self.queries[db]
                stopped.append(db)
                continue
            if not q.isActive:
                self._start(db)                 # same checkpoint → resume
                self.restarts[db] = self.restarts.get(db, 0) + 1
                restarted.append(db)

        # index maintenance BEFORE compaction: compaction collapses
        # tombstones, so applying first keeps the maintainers on the
        # cheap version-delta delete path (after a compaction they still
        # converge via the generation-aware reconcile, at ids-anti-join
        # cost — see indexmaint)
        indexes = (self.optimizer.maybe_maintain_indexes()
                   if self.optimizer else [])
        optimized = self.optimizer.maybe_optimize() if self.optimizer else []
        vacuumed = self.optimizer.maybe_vacuum() if self.optimizer else []
        gc_removed = self._maybe_gc(dbs)
        return {"started": started, "restarted": restarted,
                "stopped": stopped, "optimized": optimized,
                "vacuumed": vacuumed, "indexes": indexes,
                "gc_removed": gc_removed,
                "active": sorted(self.queries)}

    def _maybe_gc(self, dbs: list[str]) -> list[str]:
        """Event-log retention sweep, rate-limited to one pass per
        ``gc_interval_seconds`` so a 1 s poll cadence doesn't stat every
        log file every second."""
        if self.log_retention_seconds is None:
            return []
        now = time.time()
        if now - self._last_gc < self.gc_interval_seconds:
            return []
        self._last_gc = now
        from .sources.event_log import gc_event_log
        removed = []
        for db in dbs:
            removed.extend(gc_event_log(
                os.path.join(self.event_root, db),
                retention_seconds=self.log_retention_seconds))
        return removed

    def run_forever(self, poll_seconds: float = 1.0,
                    max_polls: int | None = None,
                    should_stop=None) -> None:
        """Drive poll() on a cadence (reference main loop runner.py:205–213).
        ``max_polls`` bounds the loop for tooling/tests; ``should_stop`` is
        polled each iteration (the CLI wires a SIGTERM/SIGINT flag to it —
        the reference's GracefulKiller, utils.py:13–21)."""
        polls = 0
        while max_polls is None or polls < max_polls:
            if should_stop is not None and should_stop():
                break
            self.poll()
            polls += 1
            time.sleep(poll_seconds)

    def process_all_available(self) -> None:
        """Barrier for tests/backfills: drain every active stream."""
        for q in self.queries.values():
            q.processAllAvailable()

    def stop_all(self) -> None:
        for db, q in list(self.queries.items()):
            q.stop()
            del self.queries[db]

    # -- control plane ------------------------------------------------------

    def request_restart(self) -> None:
        """Schedule a full replication restart; the next poll() performs
        it (the reference's need_restart_replication flag consumed by
        restart_replication_if_required, runner.py:88–95, 113–129)."""
        self._need_restart = True

    def _restart_replication(self) -> None:
        """Stop every query and clear its checkpoint so streams replay
        the retained event log from the start — the analog of the
        reference deleting state.pckl per db (runner.py:118–123). The
        per-table seq replay guard makes the replay convergent, not
        duplicating."""
        self.stop_all()
        shutil.rmtree(self.checkpoint_root, ignore_errors=True)
        self._need_restart = False

    def serve_control(self, host: str | None = None, port: int | None = None):
        """Minimal HTTP control plane (the reference's FastAPI server,
        runner.py:74–95, on stdlib http.server — no web framework in this
        environment): GET /status reports active queries and restart
        counts; GET /restart_replication schedules a full restart, picked
        up by the next poll. Runs on a daemon thread; returns the server
        (``server.server_address[1]`` is the bound port, ``shutdown()``
        stops it)."""
        import http.server
        import json as _json
        import threading

        s = self.engine.settings
        if host is None:
            host = (s.http_host if s is not None else "") or "127.0.0.1"
        if port is None:
            port = s.http_port if s is not None else 0

        sup = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *args):   # quiet
                pass

            def _send(self, code: int, obj) -> None:
                body = _json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/status":
                    # per-index staleness beside the active queries — the
                    # reference's monitoring surface prints per-DB lag
                    # (reference monitoring.py:27–56); ours adds the
                    # maintained indexes' bounded-staleness contract as
                    # numbers (r10 verdict #6). Metadata reads only; an
                    # unbuilt or broken index reports its error instead
                    # of taking /status down.
                    idx = []
                    if sup.optimizer is not None:
                        for ix in sup.optimizer.indexes:
                            try:
                                idx.append(ix.status())
                            except Exception as e:  # noqa: BLE001
                                idx.append({"index_path": ix.index_path,
                                            "error": str(e)})
                    self._send(200, {"active": sorted(sup.queries),
                                     "restarts": sup.restarts,
                                     "indexes": idx})
                elif self.path == "/restart_replication":
                    sup.request_restart()
                    self._send(200, {"restart_scheduled": True})
                else:
                    self._send(404, {"error": "not found"})

        server = http.server.ThreadingHTTPServer((host, port), Handler)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server
