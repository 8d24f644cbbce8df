"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the escape hatch for semantics the built-in windowed aggregates can't
express (SURVEY.md §2.7; the reference keeps all state in the replica
table itself, db_replicator_realtime.py:30–31, so it never needs this —
a training-data pipeline does).

``running_key_stats`` maintains per-key running counters across
micro-batches: event count, value sum, last-seen sequence. The state store
is Spark's (checkpointed, fault-tolerant); the per-group update is an
Arrow-batched pandas function. The same operator shape fits streaming
dedup-by-key, rate limiting, or incremental feature accumulation.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("value_sum", T.DoubleType()),
    T.StructField("last_seq", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("value_sum", T.DoubleType()),
    T.StructField("last_seq", T.LongType()),
])


def _update_running_stats(key: tuple, pdfs: Iterable[pd.DataFrame],
                          state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-group update: fold this batch's rows into the stored counters."""
    n, vsum, last = state.get if state.exists else (0, 0.0, -1)
    for pdf in pdfs:
        n += len(pdf)
        vsum += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            last = max(last, int(pdf["seq"].max()))
    state.update((n, vsum, last))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n],
                        "value_sum": [vsum], "last_seq": [last]})


def running_key_stats(events: DataFrame, key_col: str = "key",
                      value_col: str = "value",
                      seq_col: str = "seq") -> DataFrame:
    """Running per-key stats across micro-batches.

    Input (streaming or batch test harness): ``key, value, seq`` columns.
    Output: one row per key per trigger with the accumulated counters —
    the Update output mode shape."""
    src = events.selectExpr(f"{key_col} AS key",
                            f"CAST({value_col} AS DOUBLE) AS value",
                            f"CAST({seq_col} AS BIGINT) AS seq")
    return (src.groupBy("key")
            .applyInPandasWithState(
                _update_running_stats,
                outputStructType=RUNNING_STATS_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


ANOMALY_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("oid", T.LongType()),
    T.StructField("v100", T.LongType()),
    T.StructField("dev2", T.StringType()),
    T.StructField("bound", T.StringType()),
])

_ANOM_STATE_SCHEMA = T.StructType([
    T.StructField("frame_vals", T.ArrayType(T.LongType())),
])


def _make_anomaly_update(frame: int, k_sigma: int):
    k2 = k_sigma * k_sigma

    def _update(key: tuple, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        buf = list(state.get[0]) if state.exists else []
        out: list[tuple] = []
        # A key's micro-batch arrives as MULTIPLE Arrow chunks (~10k rows
        # each) after the groupBy shuffle, and chunk order does not follow
        # (ts, oid): sorting each chunk independently would feed the state
        # buffer out of order across chunk boundaries.  Buffer the whole
        # group, sort ONCE, then run the update loop — state is O(frame)
        # either way; the group buffer is one micro-batch of one key.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   if len(chunks) > 1 else chunks[0])
            pdf = pdf.sort_values(["ts", "oid"])
            for oid, v in zip(pdf["oid"], pdf["v100"]):
                v = int(v)
                if len(buf) == frame:
                    # python ints: the same exact arithmetic as the
                    # batch operator's decimal(38,0) — never wraps
                    n, s = frame, sum(buf)
                    ss = sum(c * c for c in buf)
                    dev2 = (n * v - s) ** 2
                    bound = k2 * (n * ss - s * s)
                    if dev2 > bound:
                        out.append((key[0], int(oid), v,
                                    str(dev2), str(bound)))
                buf.append(v)
                if len(buf) > frame:
                    buf.pop(0)
        state.update((buf,))
        if out:
            yield pd.DataFrame(out, columns=["key", "oid", "v100",
                                             "dev2", "bound"])

    return _update


def streaming_rolling_anomaly(events: DataFrame, key_col: str = "user_id",
                              ts_col: str = "ts",
                              value_col: str = "value",
                              order_col: str = "event_id",
                              frame: int = 6,
                              k_sigma: int = 3) -> DataFrame:
    """The streaming twin of ``operators.timeseries.rolling_anomaly``:
    per-key rolling z-score outliers across micro-batches, the trailing
    ``frame`` observations carried in Spark's checkpointed state store
    (an array of ``frame`` longs per key — constant state whatever the
    stream length). The update is the SAME exact integer test as the
    batch operator ((n·v−s)² > k²·(n·ss−s²) over centi-units, python
    ints — arbitrary precision, never wraps), so an in-order stream
    flags exactly the rows the batch operator flags (pinned by the
    parity test). Ordering contract: rows must arrive in (ts, order)
    order per key ACROSS batches — the CDC event-log reader's seq
    ordering guarantees this on the engine's own streams; out-of-order
    sources need a watermark+sort stage first (windows.stream_dedup
    territory)."""
    v100 = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    src = events.select(F.col(key_col).alias("key"),
                        F.col(ts_col).alias("ts"),
                        F.col(order_col).alias("oid"),
                        v100.alias("v100"))
    return (src.groupBy("key")
            .applyInPandasWithState(
                _make_anomaly_update(frame, k_sigma),
                outputStructType=ANOMALY_SCHEMA,
                stateStructType=_ANOM_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
