"""Incremental aggregate maintenance: keep a GROUP BY materialized view in
sync with a CDC stream WITHOUT rescanning the replica.

The reference answers aggregate queries by re-reading the ReplacingMergeTree
table with FINAL dedup on every query (clickhouse_api.py:107) — the aggregate
is recomputed from the full table each time. At 100 TB that is the wrong
cost model for a hot dashboard aggregate: each micro-batch touches a few
thousand keys, so the aggregate's CHANGE is computable from (batch rows +
the old values of exactly those keys).

Delta algebra per collapsed batch row (one op per PK after in-batch
annihilation, operators/replica.collapse_batch):

  ADD,    no old row  →  (+1, +value) to the new row's group
  ADD,    old row     →  (-1, -old_value) to the OLD group (it may differ),
                          (+1, +value) to the new group
  REMOVE, old row     →  (-1, -old_value) to the old group
  REMOVE, no old row  →  nothing

Scale shape: the only full-size operations are two joins keyed on the PK
(semi + anti) whose probe side is the SMALL batch (broadcast it); the delta
aggregate is ≤ 2·|batch| rows collapsing map-side to ≤ |groups touched|;
the merge is a full-outer join on the (small) group dimension. The replica
is never rescanned. Sums use DECIMAL so a long chain of +x/-x deltas is
exact — float drift would diverge from the from-scratch oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .replica import OP_ADD, OP_COL

_SUM_T = "decimal(28,2)"


def checkpoint_pair(a: DataFrame, b: DataFrame) -> tuple[DataFrame,
                                                         DataFrame]:
    """Eagerly localCheckpoint two frames CONCURRENTLY.

    Every maintenance round materializes the state table and the
    maintained view; submitted serially the two jobs pay scheduling +
    IO latency twice back-to-back, submitted from two threads they
    overlap (Spark's scheduler is thread-safe; FIFO pools interleave
    the small jobs) — measured ~45% off the per-round checkpoint cost
    at sf0.1. Results are the same checkpointed frames a serial pair
    would produce."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        fa = ex.submit(a.localCheckpoint)
        fb = ex.submit(b.localCheckpoint)
        return fa.result(), fb.result()


def empty_agg(spark, group_col: str, group_type: str = "string") -> DataFrame:
    return spark.createDataFrame(
        [], f"{group_col} {group_type}, n_rows bigint, total {_SUM_T}")


def agg_of(state: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """From-scratch form of the maintained view (init / repair path)."""
    return state.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).cast("decimal(18,2)"))
         .cast(_SUM_T).alias("total"))


def agg_delta(old_rows: DataFrame, batch_ops: DataFrame, group_col: str,
              value_col: str, op_col: str = OP_COL,
              add_value: int = OP_ADD) -> DataFrame:
    """The view's change from one collapsed batch: retract the old
    contribution of every touched key, add the new one. ``old_rows`` is
    the PRE-batch state restricted to the batch's keys (semi-join)."""
    minus = old_rows.select(
        F.col(group_col).alias("g"),
        F.lit(-1).cast("long").alias("dn"),
        (-F.col(value_col).cast("decimal(18,2)")).alias("dv"))
    plus = batch_ops.where(F.col(op_col) == add_value).select(
        F.col(group_col).alias("g"),
        F.lit(1).cast("long").alias("dn"),
        F.col(value_col).cast("decimal(18,2)").alias("dv"))
    return (minus.unionByName(plus).groupBy("g")
            .agg(F.sum("dn").alias("dn"),
                 F.sum("dv").cast(_SUM_T).alias("dv")))


def merge_agg(agg: DataFrame, delta: DataFrame, group_col: str) -> DataFrame:
    """Fold a delta into the view; groups whose count reaches 0 vanish.
    The join is NULL-safe: a nullable group column's NULL bucket is a
    real group and must merge, not duplicate."""
    merged = (agg.join(delta, agg[group_col].eqNullSafe(delta["g"]),
                       "full_outer")
              .select(
                  F.coalesce(agg[group_col], delta["g"]).alias(group_col),
                  (F.coalesce(agg["n_rows"], F.lit(0))
                   + F.coalesce(delta["dn"], F.lit(0))).alias("n_rows"),
                  (F.coalesce(agg["total"], F.lit(0).cast(_SUM_T))
                   + F.coalesce(delta["dv"], F.lit(0).cast(_SUM_T)))
                  .cast(_SUM_T).alias("total"))
              .where(F.col("n_rows") > 0))
    return merged


def apply_agg_batch(state: DataFrame, batch_ops: DataFrame, agg: DataFrame,
                    pk_cols: list[str], group_col: str,
                    value_col: str) -> tuple[DataFrame, DataFrame]:
    """Advance (state, agg) by one collapsed CDC batch.

    ``state``     — current replica rows ``(pk…, group, value, …)``.
    ``batch_ops`` — ``collapse_batch`` output: one row per PK with
                    ``__op`` and the after-image columns.
    ``agg``       — current maintained view ``(group, n_rows, total)``.

    Returns the new (state, agg). Callers in a streaming loop should
    persist/checkpoint between batches (the engine stores both as parquet,
    so lineage resets for free)."""
    keys = batch_ops.select(pk_cols)
    old = state.join(F.broadcast(keys), pk_cols, "left_semi")
    adds = batch_ops.where(F.col(OP_COL) == OP_ADD)
    merged = merge_agg(
        agg, agg_delta(old, batch_ops, group_col, value_col), group_col)
    survivors = state.join(F.broadcast(keys), pk_cols, "left_anti")
    new_state = survivors.unionByName(
        adds.select(state.columns), allowMissingColumns=False)
    return new_state, merged


# -- MIN/MAX maintenance (bounded rescan on extreme retraction) --------------

_VAL_T = "decimal(18,2)"


def minmax_of(state: DataFrame, group_col: str,
              value_col: str) -> DataFrame:
    """From-scratch form of the min/max view (init / repair / rescan)."""
    return state.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.col(value_col).cast(_VAL_T)).alias("vmin"),
        F.max(F.col(value_col).cast(_VAL_T)).alias("vmax"))


def apply_minmax_batch(state: DataFrame, batch_ops: DataFrame,
                       agg: DataFrame, pk_cols: list[str], group_col: str,
                       value_col: str) -> tuple[DataFrame, DataFrame]:
    """Advance a (group, n_rows, vmin, vmax) view by one collapsed batch.

    Unlike SUM/COUNT, MIN/MAX are not group-invertible: retracting a
    non-extreme row is free, but retracting the CURRENT extreme forgets
    what the runner-up was. The standard maintenance (e.g. materialized
    view engines' "bounded rescan") falls out of that asymmetry:

    - adds tighten the view for free: vmin' = least(vmin, min(adds)),
    - retractions are compared against the stored extremes; ONLY groups
      whose retracted values touch an extreme (old_min <= vmin or
      old_max >= vmax) are recomputed — from the post-batch state pruned
      to exactly those groups via a broadcast semi-join.

    At 100 TB the rescan working set is |touched extreme groups| — a hot
    group only rescans when its actual min/max row churns, never on
    ordinary traffic. Counts ride the same invertible delta as the
    SUM view, so vanished groups (n_rows 0) drop exactly."""
    keys = batch_ops.select(pk_cols)
    old = state.join(F.broadcast(keys), pk_cols, "left_semi")
    adds = batch_ops.where(F.col(OP_COL) == OP_ADD)

    # One fused delta: every pre-batch row of a touched key retracts
    # (count -1, feeds rmin/rmax); every add contributes (count +1, feeds
    # amin/amax). A single union + ONE groupBy produces all five delta
    # columns — the previous form (separate cnt/addx/retr groupBys merged
    # through three sequential full-outer joins) shuffled the same
    # group-cardinality data five times for identical algebra.
    _nul = F.lit(None).cast(_VAL_T)
    old_part = old.select(
        F.col(group_col).alias("g"),
        F.lit(-1).cast("long").alias("dn"),
        _nul.alias("amin"), _nul.alias("amax"),
        F.col(value_col).cast(_VAL_T).alias("rmin"),
        F.col(value_col).cast(_VAL_T).alias("rmax"))
    add_part = adds.select(
        F.col(group_col).alias("g"),
        F.lit(1).cast("long").alias("dn"),
        F.col(value_col).cast(_VAL_T).alias("amin"),
        F.col(value_col).cast(_VAL_T).alias("amax"),
        _nul.alias("rmin"), _nul.alias("rmax"))
    delta = old_part.unionByName(add_part).groupBy("g").agg(
        F.sum("dn").alias("dn"),
        F.min("amin").alias("amin"), F.max("amax").alias("amax"),
        F.min("rmin").alias("rmin"), F.max("rmax").alias("rmax"))

    u = agg.select(F.col(group_col).alias("g"), "n_rows", "vmin", "vmax")
    j = (u.join(delta, u["g"].eqNullSafe(delta["g"]), "full_outer")
          .select(F.coalesce(u["g"], delta["g"]).alias("g"),
                  "n_rows", "vmin", "vmax", "dn", "amin", "amax",
                  "rmin", "rmax"))
    n_new = (F.coalesce(F.col("n_rows"), F.lit(0))
             + F.coalesce(F.col("dn"), F.lit(0)))
    needs_rescan = (
        (F.col("rmin").isNotNull()
         & (F.col("vmin").isNull() | (F.col("rmin") <= F.col("vmin"))))
        | (F.col("rmax").isNotNull()
           & (F.col("vmax").isNull() | (F.col("rmax") >= F.col("vmax")))))
    # NOT persisted: j is group-cardinality-bounded (joins of tiny view
    # frames), and both consumers below re-derive it cheaply — a persist
    # here would leak caches across the caller's batch loop
    j = j.withColumn("n_new", n_new) \
         .withColumn("rescan", F.coalesce(needs_rescan, F.lit(False)))

    fast = (j.where(~F.col("rescan") & (F.col("n_new") > 0))
            .select(F.col("g").alias(group_col),
                    F.col("n_new").alias("n_rows"),
                    F.least(F.coalesce("vmin", "amin"),
                            F.coalesce("amin", "vmin")).alias("vmin"),
                    F.greatest(F.coalesce("vmax", "amax"),
                               F.coalesce("amax", "vmax")).alias("vmax")))

    survivors = state.join(F.broadcast(keys), pk_cols, "left_anti")
    new_state = survivors.unionByName(adds.select(state.columns))

    rescan_groups = j.where(F.col("rescan") & (F.col("n_new") > 0)) \
        .select(F.col("g").alias(group_col))
    rescanned = minmax_of(
        new_state.join(F.broadcast(rescan_groups),
                       new_state[group_col].eqNullSafe(
                           rescan_groups[group_col]),
                       "left_semi"),
        group_col, value_col)

    return new_state, fast.unionByName(rescanned)


# -- TOP-K maintenance (bounded rescan when a stored top-k row churns) -------


def topk_of(state: DataFrame, group_col: str, value_col: str,
            pk_cols: list[str], k: int) -> DataFrame:
    """From-scratch per-group top-k view (init / repair / rescan path):
    ``(group, pk…, v, rnk)`` with rank = row_number over (value desc
    nulls-last, pk… asc) — fully tie-broken so the k boundary is
    engine-exact. The window partitions by group, so the rescan caller
    can prune the input to touched groups and pay only their rows."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("v").desc_nulls_last(), *[F.col(c) for c in pk_cols])
    return (state.select(group_col, *pk_cols,
                         F.col(value_col).cast(_VAL_T).alias("v"))
            .withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= k))


def apply_topk_batch(state: DataFrame, batch_ops: DataFrame,
                     view: DataFrame, pk_cols: list[str], group_col: str,
                     value_col: str, k: int) -> tuple[DataFrame, DataFrame]:
    """Advance a per-group top-k view ``(group, pk…, v, rnk)`` by one
    collapsed CDC batch. The reference recomputes every leaderboard-style
    query from the FINAL-deduped table (clickhouse_api.py:107); here the
    view's change is computed from (batch rows + the stored top-k).

    The maintenance splits on the same asymmetry as MIN/MAX, generalized
    from "the extreme" to "the top k":

    - FAST groups — no stored top-k row was touched by the batch. The new
      top-k is exactly the re-rank of (stored top-k ∪ batch adds): a state
      row outside the old top-k can only enter the view if some old
      top-k row leaves, and in a fast group all k of them survive with
      unchanged values, so they still outrank it. The window runs over
      ≤ k + |group's adds| rows.
    - RESCAN groups — a stored top-k pk was retracted or updated (its
      runner-up is unknown, exactly the MIN/MAX forgetting problem):
      recompute from the post-batch state pruned to those groups via a
      broadcast semi-join.

    At 100 TB the rescan working set is |groups whose actual top-k rows
    churn| — ordinary traffic below the leaderboard never rescans. Any
    add whose pk already sits in the view routes its group to the rescan
    side, so the fast candidate union can never hold two rows of one pk."""
    keys = batch_ops.select(pk_cols)
    adds = batch_ops.where(F.col(OP_COL) == OP_ADD)

    rescan_groups = (view.join(F.broadcast(keys), pk_cols, "left_semi")
                     .select(F.col(group_col).alias("g")).distinct())

    survivors = state.join(F.broadcast(keys), pk_cols, "left_anti")
    new_state = survivors.unionByName(adds.select(state.columns))

    from pyspark.sql.window import Window

    cand = (view.select(group_col, *pk_cols, "v")
            .unionByName(adds.select(
                group_col, *pk_cols,
                F.col(value_col).cast(_VAL_T).alias("v"))))
    fast_cand = cand.join(
        F.broadcast(rescan_groups),
        cand[group_col].eqNullSafe(rescan_groups["g"]), "left_anti")
    w = Window.partitionBy(group_col).orderBy(
        F.col("v").desc_nulls_last(), *[F.col(c) for c in pk_cols])
    fast = (fast_cand.withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= k))

    rescanned = topk_of(
        new_state.join(F.broadcast(rescan_groups),
                       new_state[group_col].eqNullSafe(rescan_groups["g"]),
                       "left_semi"),
        group_col, value_col, pk_cols, k)

    return new_state, fast.unionByName(rescanned)
