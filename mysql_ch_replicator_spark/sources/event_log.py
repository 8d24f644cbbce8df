"""CDC event-log source (S2/S3/S4 of SURVEY.md §2.1).

The reference buffers binlog events as length-prefixed pickled records in
numbered per-database files (binlog_replicator.py:47–66, 247–286). The
Spark-native equivalent is a **JSON-lines event log** readable both as a
batch DataFrame and as a Structured-Streaming file source — offset tracking,
rotation, and seek-to-transaction come free from Spark's file-source
checkpointing (the reference's ``DataReader.set_position`` machinery,
binlog_replicator.py:117–244, collapses into checkpoint restore).

Event schema mirrors the reference's ``LogEvent`` (binlog_replicator.py:31–44
and FIXTURES.md F14):

- ``tx_file``/``tx_pos`` — binlog position (the transaction id)
- ``seq`` — global monotone sequence; with the intra-event record index it
  gives the total order the reference got implicitly from file order
- ``event_type`` — 1=ADD (insert+update after-image), 2=REMOVE, 3=QUERY/DDL
- ``payload`` — array of positional records, every value serialized to
  string (NULL stays null); REMOVE events may carry PK columns only
- ``query`` — DDL text for QUERY events
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_TYPE_ADD = 1
EVENT_TYPE_REMOVE = 2
EVENT_TYPE_QUERY = 3

EVENT_SCHEMA = T.StructType([
    T.StructField("tx_file", T.StringType()),
    T.StructField("tx_pos", T.LongType()),
    T.StructField("seq", T.LongType()),
    T.StructField("db", T.StringType()),
    T.StructField("table", T.StringType()),
    T.StructField("event_type", T.IntegerType()),
    T.StructField("payload", T.ArrayType(T.ArrayType(T.StringType()))),
    T.StructField("query", T.StringType()),
])


class EventLogWriter:
    """Test/tooling-side writer producing the engine's input format —
    the stand-in for the reference's binlog_replicator process. Rotates
    files every ``records_per_file`` events (reference config.py:113).

    Publication is always **atomic** (content staged to a dot-prefixed
    temp file, then ``os.replace`` — Spark readers ignore dot-files, so a
    partially written file is never visible). Two modes:

    - default (``live=False``): each emit atomically rewrites the current
      numbered file with its full line set — events are visible to batch
      readers immediately, and ``records_per_file`` packing is preserved
      (the lag math in monitoring.event_log_lag depends on it). NOT safe
      under a concurrent *streaming* consumer: Spark's file source treats
      a filename as immutable once processed, so lines added to an
      already-seen file are silently skipped.
    - ``live=True``: events buffer in memory and a file becomes visible
      only once complete (at ``records_per_file`` or an explicit
      ``rotate()``), never growing afterwards — the required mode when a
      streaming query watches the directory while the producer runs
      (the reference's buffered flush+rotate, binlog_replicator.py:247–286).
    """

    def __init__(self, log_dir: str, records_per_file: int = 100_000,
                 live: bool = False):
        self.log_dir = log_dir
        self.records_per_file = records_per_file
        self.live = live
        self._seq = 0
        self._file_no = 0
        self._lines: list[str] = []   # current (unpublished or live) file
        os.makedirs(log_dir, exist_ok=True)
        self._resume()

    def _resume(self) -> None:
        """A writer on an existing log continues after it — never renames
        over a published file (a streaming consumer has already recorded
        it as processed; rewriting it would silently lose the new events).
        File numbering resumes at max existing + 1 (the reference's
        ``get_next_file_name``, binlog_replicator.py:276–286) and ``seq``
        continues from the newest file's last event."""
        import re
        numbered = sorted(f for f in os.listdir(self.log_dir)
                          if re.fullmatch(r"\d{6}\.jsonl", f))
        if not numbered:
            return
        self._file_no = int(numbered[-1].split(".")[0]) + 1
        last_line = None
        with open(os.path.join(self.log_dir, numbered[-1]),
                  encoding="utf-8") as fh:
            for last_line in fh:
                pass
        if last_line:
            self._seq = int(json.loads(last_line)["seq"]) + 1

    def _path(self) -> str:
        return os.path.join(self.log_dir, f"{self._file_no:06d}.jsonl")

    def _publish(self) -> None:
        """Atomically write the current line set to the numbered file."""
        tmp = os.path.join(self.log_dir, f".{self._file_no:06d}.jsonl.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("".join(self._lines))
        os.replace(tmp, self._path())

    def _emit(self, rec: dict) -> None:
        rec.setdefault("tx_file", "binlog.000001")
        rec.setdefault("tx_pos", self._seq)
        rec["seq"] = self._seq
        self._seq += 1
        self._lines.append(json.dumps(rec, ensure_ascii=False) + "\n")
        if not self.live:
            self._publish()
        if len(self._lines) >= self.records_per_file:
            self.rotate()

    def rotate(self) -> None:
        """Complete the current file; the next event starts a new one.
        In live mode this is the publish point — buffered events become
        visible as one complete, never-growing file."""
        if self._lines:
            if self.live:
                self._publish()
            self._file_no += 1
            self._lines = []

    flush = rotate  # alias: live-mode producers flush on a cadence

    @staticmethod
    def _serialize(values) -> list:
        out = []
        for v in values:
            if v is None:
                out.append(None)
            elif isinstance(v, bool):
                out.append("1" if v else "0")
            elif isinstance(v, (bytes, bytearray)):
                out.append(bytes(v).hex())
            else:
                out.append(str(v))
        return out

    def add(self, db: str, table: str, records: list) -> None:
        """ADD event — insert or update (after-image only, reference
        binlog_replicator.py:507–510)."""
        self._emit({"db": db, "table": table, "event_type": EVENT_TYPE_ADD,
                    "payload": [self._serialize(r) for r in records],
                    "query": None})

    def remove(self, db: str, table: str, pk_records: list) -> None:
        """REMOVE event. Each record carries **primary-key values only,
        in the table's ``primary_keys`` declaration order** (dense, 1..k)
        — NOT at the columns' structural ordinals. The engine converts
        these PK-relative (functions/conversions.py convert_payload
        ``remove_op_col``), matching the reference's by-name delete
        conversion (converter.py:581–583)."""
        self._emit({"db": db, "table": table, "event_type": EVENT_TYPE_REMOVE,
                    "payload": [self._serialize(r) for r in pk_records],
                    "query": None})

    def ddl(self, db: str, query: str) -> None:
        self._emit({"db": db, "table": None, "event_type": EVENT_TYPE_QUERY,
                    "payload": None, "query": query})


def gc_event_log(log_dir: str, retention_seconds: float = 43_200.0,
                 preserve_files: int = 5, clock=None) -> list[str]:
    """S3 retention GC — prune published event-log files older than the
    retention period (reference ``remove_old_files``,
    binlog_replicator.py:288–298: 12 h default via
    ``binlog_retention_period`` config.py:114, always preserving the
    newest ``PRESERVE_FILES_COUNT = 5`` files regardless of age).

    Only numbered published files are candidates — dot-prefixed staging
    temp files and the live writer's unpublished buffer are untouched. A
    consumer restarting from its checkpoint replays from the retained
    tail: Spark's file-source checkpoint tracks processed files by path,
    so deleting already-processed files never affects resumption, and the
    age + preserve-count guards keep not-yet-processed recent files safe
    (a consumer further behind than the retention period has lost data —
    the same contract as the reference's binlog buffer).

    Returns the removed paths."""
    import re
    import time as _time

    now = (clock or _time.time)()
    numbered = sorted(
        f for f in os.listdir(log_dir)
        if re.fullmatch(r"\d{6}\.jsonl", f))
    candidates = numbered[:-preserve_files] if preserve_files > 0 \
        else numbered
    removed = []
    cutoff = now - retention_seconds
    for name in candidates:
        path = os.path.join(log_dir, name)
        if os.path.getmtime(path) <= cutoff:
            os.remove(path)
            removed.append(path)
    return removed


def read_event_log(spark: SparkSession, log_dir: str,
                   pattern: str = "*.jsonl") -> DataFrame:
    """Batch read of the whole event log (used for replay/backfill).
    ``pattern`` selects the file naming scheme: ``*.jsonl`` for
    EventLogWriter logs, ``part-*`` for logs written by Spark itself."""
    return spark.read.schema(EVENT_SCHEMA).json(f"{log_dir}/{pattern}")


def stream_event_log(spark: SparkSession, log_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming read — Spark file source tracks processed files in the
    checkpoint (exactly-once, the reference's state.json position tracking)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(log_dir)


def explode_row_events(events: DataFrame) -> DataFrame:
    """Flatten multi-record events into one row per record with a total
    order ``(seq, idx)`` — the explicit form of the ordering the reference
    gets from dict insertion (SURVEY.md §7 'hard parts')."""
    rows = events.where(F.col("event_type") != EVENT_TYPE_QUERY)
    return rows.select(
        "tx_file", "tx_pos", "seq", "db", "table", "event_type",
        F.posexplode("payload").alias("idx", "record"),
    )
