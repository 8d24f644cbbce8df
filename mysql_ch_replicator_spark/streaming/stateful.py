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
