"""Windowed aggregation over event streams — §2.7 of SURVEY.md.

The reference has NO windowed operators (processing is strict log order;
late data is impossible by construction, SURVEY.md §2.7). A Spark-native
engine gets event-time windows for free, and a training-data/analytics
pipeline over the replica wants them, so they are first-class here:

- ``tumbling_window_agg`` — fixed windows via the built-in ``window()``
  expression. On a STREAMING frame add ``watermark`` to bound state and
  admit late data up to the threshold; on a batch frame the same builder
  produces the identical plan minus the state bookkeeping (one hash
  aggregate, map-side partial agg — scales like any groupBy).
- ``sliding_window_agg`` — overlapping windows (each row lands in
  ``window/slide`` windows — the explode happens inside the native
  ``window()`` expression, JVM-side).
- ``session_window_agg`` — gap-based sessions via ``session_window()``
  (Spark's native session support; state merges windows as events arrive).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str,
                    watermark: str | None) -> DataFrame:
    if watermark is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(df: DataFrame, ts_col: str, window: str,
                        aggs: dict[str, Column], keys: list[str] = (),
                        watermark: str | None = None) -> DataFrame:
    """Fixed non-overlapping event-time windows.

    Returns one row per (window_start, *keys) with ``window_start``/
    ``window_end`` timestamp columns plus the given aggregates."""
    df = _with_watermark(df, ts_col, watermark)
    grouped = df.groupBy(F.window(F.col(ts_col), window), *keys)
    out = grouped.agg(*[c.alias(name) for name, c in aggs.items()])
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys, *aggs.keys())


def sliding_window_agg(df: DataFrame, ts_col: str, window: str, slide: str,
                       aggs: dict[str, Column], keys: list[str] = (),
                       watermark: str | None = None) -> DataFrame:
    """Overlapping windows of length ``window`` every ``slide``."""
    df = _with_watermark(df, ts_col, watermark)
    grouped = df.groupBy(F.window(F.col(ts_col), window, slide), *keys)
    out = grouped.agg(*[c.alias(name) for name, c in aggs.items()])
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys, *aggs.keys())


def session_window_agg(df: DataFrame, ts_col: str, gap: str,
                       aggs: dict[str, Column], keys: list[str] = (),
                       watermark: str | None = None) -> DataFrame:
    """Gap-based session windows: a session extends while events arrive
    within ``gap`` of the previous one."""
    df = _with_watermark(df, ts_col, watermark)
    grouped = df.groupBy(F.session_window(F.col(ts_col), gap), *keys)
    out = grouped.agg(*[c.alias(name) for name, c in aggs.items()])
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *keys, *aggs.keys())


def stream_dedup(df: DataFrame, keys: list[str], ts_col: str,
                 watermark: str) -> DataFrame:
    """Exactly-once projection of an at-least-once stream: drop re-deliveries
    of the same key seen within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — state is GC'd as the watermark
    advances, so memory is bounded by the horizon × key cardinality, not by
    stream length; plain ``dropDuplicates`` on a stream retains ALL keys
    forever and OOMs a long-running job).

    This is the stream-side analog of the engine's seq replay guard
    (engine.py apply_batch): the guard dedups at the APPLY boundary using
    durable per-table state; this operator dedups IN-FLIGHT, upstream of any
    stateful aggregation that must not double-count. On a batch frame it
    degrades to plain dropDuplicates (same semantics, no state)."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark(keys)


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key: str, left_ts: str, right_ts: str,
                         lower: str, upper: str,
                         left_watermark: str, right_watermark: str,
                         how: str = "inner") -> DataFrame:
    """Watermarked stream-stream interval join — the event-time
    attribution primitive (e.g. click -> purchase within an hour) the
    reference cannot express (strict log order, single stream).

    Join condition: equal ``key`` and
    ``left_ts + lower <= right_ts <= left_ts + upper`` (pass negative
    intervals in ``lower`` to look back). Both inputs MUST carry
    watermarks on streams: Spark derives the state-retention bound from
    watermark + interval width, so each side buffers only the horizon,
    not the whole stream — the property that makes the join runnable
    forever. Outer variants additionally need both watermarks to know
    when an unmatched row can be emitted.

    On batch frames the same builder degrades to a plain range join
    (identical semantics, no state) — mirroring the module's
    batch/stream duality. Columns are disambiguated with ``l_``/``r_``
    prefixes except the shared key.

    Scale note: the equi-key keeps this a hash-partitioned join (one
    shuffle per side on ``key``); the time interval is evaluated
    post-match per key group. A missing equi-key would make it a
    stream-stream cross join — unbounded state, never do that.
    """
    lw = left if not left.isStreaming \
        else left.withWatermark(left_ts, left_watermark)
    rw = right if not right.isStreaming \
        else right.withWatermark(right_ts, right_watermark)

    lsel = lw.select(F.col(key),
                     *[F.col(c).alias(f"l_{c}") for c in lw.columns
                       if c != key])
    rsel = rw.select(F.col(key).alias("__rkey"),
                     *[F.col(c).alias(f"r_{c}") for c in rw.columns
                       if c != key])
    cond = ((F.col(key) == F.col("__rkey"))
            & (F.col(f"r_{right_ts}")
               >= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {lower}"))
            & (F.col(f"r_{right_ts}")
               <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {upper}")))
    return lsel.join(rsel, cond, how).drop("__rkey")


def stream_enrich(stream: DataFrame, dim: DataFrame, keys: list[str],
                  how: str = "left",
                  broadcast_dim: bool = True) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes (user
    profile, table metadata, source registry) to a CDC/event stream.

    The static side's file listing is CAPTURED when the streaming query
    starts — a path-backed dimension is fixed for the life of the query
    (rewriting it under a running stream fails the query with
    FILE_NOT_EXIST; measured, not theoretical). For slowly-changing
    dimensions, re-read the dim inside ``foreachBatch`` (one
    ``spark.read`` per micro-batch — the engine's own apply path is
    already a foreachBatch, so CDC pipelines get the refresh point for
    free) or restart the query after the atomic dim swap.

    Scale: the dimension is broadcast by default — the stream side never
    shuffles, which is the property that keeps micro-batch latency flat
    as the stream widens. Set ``broadcast_dim=False`` only for dimensions
    too large for executor memory (falls back to a shuffled join of the
    BATCH, still bounded by trigger size)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, keys, how)
