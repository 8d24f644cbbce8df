"""Periodic compaction scheduler — the reference's ``db_optimizer``
(db_optimizer.py:15–37 State, :56–98 select/optimize loop, config.py:135
``optimize_interval`` default 86400 s) restated for the parquet replica.

The reference runs OPTIMIZE TABLE ... FINAL against ClickHouse on a daily
cadence per database, persisting last-run times in ``db_optimizer.bin``.
Here ``engine.optimize`` materializes the latest-wins collapse (drops
superseded versions + tombstones); without a cadence the append-only
replica's read amplification grows unboundedly under sustained CDC. The
scheduler tracks ``last_optimize_ts`` per table inside the table's own
``_meta.json`` (atomic save via engine.save_meta) and compacts any table
whose interval has elapsed.

Scale note: each compaction is one table rewrite (read_final → staged
overwrite) — the scheduler only decides WHEN; cost scales with live rows
per table, and tables are processed independently so a supervisor can
spread them across triggers.
"""

from __future__ import annotations

import time

from .engine import ReplicaEngine


class ReplicaOptimizer:
    def __init__(self, engine: ReplicaEngine,
                 interval: float | None = None,
                 clock=time.time,
                 indexes: list | None = None):
        """``interval`` defaults to the engine settings'
        ``optimize_interval`` (reference config.py:135: 86400 s).
        ``clock`` is injectable for tests. ``indexes`` are
        ``indexmaint.MaintainedIndex`` bindings the scheduler also
        services (coalesced upserts + IVF load-factor splits)."""
        self.engine = engine
        if interval is None:
            interval = (engine.settings.optimize_interval
                        if engine.settings is not None else 86_400.0)
        self.interval = float(interval)
        self.clock = clock
        self.indexes = list(indexes) if indexes else []

    def _matches(self, db: str, table: str) -> bool:
        s = self.engine.settings
        if s is None:
            return True
        return s.is_database_matches(db) and s.is_table_matches(table)

    def due_tables(self) -> list[tuple[str, str]]:
        """(db, table) pairs whose last compaction is older than the
        interval (never-compacted tables are always due) — the
        ``select_db_to_optimize`` scan, reference db_optimizer.py:56–68.
        ``enable_optimize_final: false`` disables the sweep entirely (the
        reference drops the FINAL keyword, db_optimizer.py:75; with
        parquet the collapse IS the operation, so disabled = skip)."""
        s = self.engine.settings
        if s is not None and not s.enable_optimize_final:
            return []
        now = self.clock()
        due = []
        for db in self.engine.databases():
            for table in self.engine.tables(db):
                if not self._matches(db, table):
                    continue
                meta = self.engine.load_meta(db, table)
                last = float(meta.get("last_optimize_ts", 0.0))
                if now - last >= self.interval:
                    due.append((db, table))
        return due

    def maybe_optimize(self) -> list[tuple[str, str]]:
        """Compact every due table once and stamp its last-run time;
        returns the tables compacted. Idempotent within the interval: a
        second call before the interval elapses does nothing (reference
        db_optimizer.py:96–98 stamps after optimize_database)."""
        done = []
        for db, table in self.due_tables():
            self.engine.optimize(db, table)
            meta = self.engine.load_meta(db, table)
            meta["last_optimize_ts"] = self.clock()
            self.engine.save_meta(db, table, meta)
            done.append((db, table))
        return done

    def vacuum_due_tables(self) -> list[tuple[str, str]]:
        """Tables with at least one retired generation past the engine's
        retention window. Without a cadence hook, retired generations are
        reclaimed only by the NEXT rewrite — a long-lived supervisor whose
        tables stop churning accumulates them forever (r5 verdict #5).
        The check is one manifest read per table (same cost class as the
        ``due_tables`` meta read) and self-clears: once ``vacuum``
        reclaims the expired entries the table stops being due."""
        from .engine import _retired_entries, load_gen_manifest

        now = self.clock()
        due = []
        for db in self.engine.databases():
            for table in self.engine.tables(db):
                if not self._matches(db, table):
                    continue
                g = load_gen_manifest(self.engine._table_dir(db, table))
                if any(now - r["ts"] >= self.engine.generation_retention_s
                       for r in _retired_entries(g)):
                    due.append((db, table))
        return due

    def maybe_maintain_indexes(self) -> list[tuple[str, str]]:
        """Service every registered MaintainedIndex once: coalesce the
        CDC window since its watermark into one upsert if it is due
        (staleness contract in indexmaint), then give an armed IVF index
        its one split-per-poll load-factor check. Runs index maintenance
        BEFORE this scheduler's own ``maybe_optimize`` would compact
        (compaction collapses tombstones; applying first keeps the fast
        version-delta delete path — after a compaction the maintainer
        still converges via its generation-aware reconcile, just at
        ids-anti-join cost). Returns (index_path, action) pairs.

        One index's failure (a missing descriptor, a wedged rebuild
        error) is recorded as an ``error:...`` action and does NOT abort
        maintenance for the remaining indexes — or the supervisor's own
        optimize/vacuum/GC duties in the same poll (ADVICE r10): a
        single broken index must not starve every other index's
        staleness contract until an operator intervenes.

        All index work runs in the `maintenance` scheduler pool
        (fairscheduler.xml): a coalesced upsert is a multi-second job,
        and under the default FIFO scheduler it would stall every
        streaming apply micro-batch submitted behind it — FAIR pools
        keep the replica's 1 s flush cadence while maintenance soaks up
        the remaining task slots."""
        done = []
        sc = self.engine.spark.sparkContext
        prev_pool = sc.getLocalProperty("spark.scheduler.pool")
        sc.setLocalProperty("spark.scheduler.pool", "maintenance")
        try:
            for ix in self.indexes:
                try:
                    r = ix.maybe_apply()
                    if r.get("applied"):
                        done.append((ix.index_path,
                                     "reconcile" if r.get("reconciled")
                                     else "apply"))
                    s = ix.maybe_rebalance()
                    if s is not None:
                        done.append((ix.index_path, s))
                except Exception as e:  # noqa: BLE001 — isolation boundary
                    done.append((ix.index_path,
                                 f"error:{type(e).__name__}: {e}"))
        finally:
            sc.setLocalProperty("spark.scheduler.pool", prev_pool)
        return done

    def maybe_vacuum(self) -> list[tuple[str, str]]:
        """Reclaim expired retired generations on the scheduler cadence —
        the VACUUM half of the reference's db_optimizer loop (reference
        db_optimizer.py:71–80 runs OPTIMIZE on a timer; parquet needs the
        file-reclaim sweep on one too). In-flight readers are unaffected:
        only generations already past the retention grace are deleted."""
        done = []
        for db, table in self.vacuum_due_tables():
            self.engine.vacuum(db, table, now=self.clock())
            done.append((db, table))
        return done


def plan_compaction(files, part_cols: list[str], target_bytes: int,
                    file_col: str = "file_id", bytes_col: str = "bytes"):
    """Small-file compaction plan: assign each file to a merge bin so every
    bin's cumulative size lands near ``target_bytes`` — the planner half of
    the lakehouse small-file problem (Delta OPTIMIZE's binPacking,
    Iceberg's BinPackStrategy). The scheduler above decides WHEN to
    compact; this decides WHAT to merge together.

    Next-fit by file ordinal: within each table partition, files are
    walked in ``file_col`` order and ``bin = (running_total - bytes) div
    target`` — pure prefix-sum arithmetic, deterministic, and (unlike
    first-fit-decreasing) expressible as ONE per-partition window with no
    iterative state. Keeping merge groups doc-id-contiguous also preserves
    any clustering/z-order the files already have, which FFD would
    destroy.

    Scale: the window partitions by the table-partition key and orders by
    file id — input is the FILE LISTING (metadata-cardinality, millions of
    rows at 100 TB, never data rows), so a per-partition sort is cheap;
    partitions plan independently and in parallel. Returns one row per
    merge bin: (part_cols..., bin, n_files, total_bytes, first/last file).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (Window.partitionBy(*part_cols).orderBy(file_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_before = F.sum(bytes_col).over(w) - F.col(bytes_col)
    planned = (files.withColumn("_cb", cum_before.cast("long"))
               .withColumn("bin",
                           F.expr(f"_cb div {target_bytes}").cast("long"))
               .drop("_cb"))
    return (planned.groupBy(*part_cols, "bin")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum(bytes_col).cast("long").alias("total_bytes"),
                 F.min(file_col).alias("first_file"),
                 F.max(file_col).alias("last_file")))
