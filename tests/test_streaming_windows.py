"""Windowed aggregation (tumbling/sliding/session) + custom stateful
operator (applyInPandasWithState) — SURVEY.md §2.7 extensions."""

from __future__ import annotations

import datetime as dt
import json
import os
import time

import pytest

from pyspark.sql import functions as F

from mysql_ch_replicator_spark.streaming.stateful import running_key_stats
from mysql_ch_replicator_spark.streaming.windows import (
    session_window_agg, sliding_window_agg, tumbling_window_agg,
)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture()
def batch_events(spark):
    rows = [
        (1, "click", 1.0, _ts(0, 10)),
        (2, "click", 2.0, _ts(0, 50)),
        (3, "view", 3.0, _ts(1, 10)),
        (4, "click", 4.0, _ts(2, 30)),
        (5, "view", 5.0, _ts(2, 40)),
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts timestamp")


def test_tumbling_window_batch(spark, batch_events):
    out = tumbling_window_agg(
        batch_events, "ts", "1 minute",
        {"n": F.count(F.lit(1)), "total": F.sum("value")})
    got = {r.window_start.minute: (r.n, r.total) for r in out.collect()}
    assert got == {0: (2, 3.0), 1: (1, 3.0), 2: (2, 9.0)}


def test_tumbling_window_keyed(spark, batch_events):
    out = tumbling_window_agg(
        batch_events, "ts", "2 minutes",
        {"n": F.count(F.lit(1))}, keys=["event_type"])
    got = {(r.window_start.minute, r.event_type): r.n for r in out.collect()}
    assert got == {(0, "click"): 2, (0, "view"): 1,
                   (2, "click"): 1, (2, "view"): 1}


def test_sliding_window_batch(spark, batch_events):
    out = sliding_window_agg(
        batch_events, "ts", "2 minutes", "1 minute",
        {"n": F.count(F.lit(1))})
    got = {r.window_start.minute: r.n
           for r in out.collect() if r.window_start.hour == 10}
    # window [-1..1) sees minute-0 rows; [0..2) sees 0&1; [1..3) 1&2; [2..4) 2
    assert got[0] == 3 and got[1] == 3 and got[2] == 2


def test_session_window_batch(spark, batch_events):
    # 60s gap: events at 0:10, 0:50, 1:10 chain into one session;
    # 2:30, 2:40 form a second
    out = session_window_agg(batch_events, "ts", "60 seconds",
                             {"n": F.count(F.lit(1))})
    ns = sorted(r.n for r in out.collect())
    assert ns == [2, 3]


def test_tumbling_window_stream_with_watermark(spark, tmp_path):
    """Streaming form: file source → watermarked tumbling window →
    complete-mode memory sink."""
    src = tmp_path / "stream_src"
    src.mkdir()
    rows = [
        {"event_id": 1, "value": 1.0, "ts": "2024-01-01T10:00:10.000Z"},
        {"event_id": 2, "value": 2.0, "ts": "2024-01-01T10:00:40.000Z"},
        {"event_id": 3, "value": 3.0, "ts": "2024-01-01T10:01:20.000Z"},
    ]
    with open(src / "0.jsonl", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    stream = (spark.readStream
              .schema("event_id long, value double, ts timestamp")
              .json(str(src)))
    agg = tumbling_window_agg(
        stream, "ts", "1 minute",
        {"n": F.count(F.lit(1)), "total": F.sum("value")},
        watermark="30 seconds")
    q = (agg.writeStream.format("memory").queryName("win_out")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        got = {r.window_start.minute: (r.n, r.total)
               for r in spark.table("win_out").collect()}
        assert got == {0: (2, 3.0), 1: (1, 3.0)}
    finally:
        q.stop()


def test_running_key_stats_stateful(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: two source
    files processed as separate triggers must fold into one running state."""
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.jsonl", "w") as fh:
        fh.write(json.dumps({"key": 1, "value": 10.0, "seq": 1}) + "\n")
        fh.write(json.dumps({"key": 2, "value": 5.0, "seq": 2}) + "\n")

    stream = (spark.readStream
              .schema("key long, value double, seq long")
              .option("maxFilesPerTrigger", 1)
              .json(str(src)))
    out = running_key_stats(stream)
    q = (out.writeStream.format("memory").queryName("state_out")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        # second batch arrives later → state must carry over
        with open(src / "b.jsonl", "w") as fh:
            fh.write(json.dumps({"key": 1, "value": 7.0, "seq": 3}) + "\n")
        q.processAllAvailable()
        rows = spark.table("state_out").collect()
        latest = {}
        for r in rows:  # update mode appends; last emission per key wins
            latest[r.key] = (r.n_events, r.value_sum, r.last_seq)
        assert latest[1] == (2, 17.0, 3)
        assert latest[2] == (1, 5.0, 2)
    finally:
        q.stop()


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate event ids across micro-batches within the watermark horizon
    are dropped; the downstream count never double-counts."""
    from mysql_ch_replicator_spark.streaming.windows import stream_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    with open(src / "0.jsonl", "w") as fh:
        for r in [
            {"event_id": 1, "value": 1.0, "ts": "2024-01-01T10:00:10.000Z"},
            {"event_id": 2, "value": 2.0, "ts": "2024-01-01T10:00:20.000Z"},
            {"event_id": 1, "value": 1.0, "ts": "2024-01-01T10:00:10.000Z"},
        ]:
            fh.write(json.dumps(r) + "\n")

    stream = (spark.readStream
              .schema("event_id long, value double, ts timestamp")
              .json(str(src)))
    deduped = stream_dedup(stream, ["event_id"], "ts", "10 minutes")
    q = (deduped.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
         .start())
    try:
        q.processAllAvailable()
        # second delivery of event 1 arrives in a LATER file/micro-batch —
        # state from batch 1 must still suppress it
        with open(src / "1.jsonl", "w") as fh:
            fh.write(json.dumps(
                {"event_id": 1, "value": 1.0,
                 "ts": "2024-01-01T10:00:11.000Z"}) + "\n")
            fh.write(json.dumps(
                {"event_id": 3, "value": 3.0,
                 "ts": "2024-01-01T10:00:30.000Z"}) + "\n")
        q.processAllAvailable()
        got = sorted(r.event_id for r in spark.table("dedup_out").collect())
        assert got == [1, 2, 3]
    finally:
        q.stop()


def test_stream_dedup_batch_degrades(spark):
    from mysql_ch_replicator_spark.streaming.windows import stream_dedup

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:01")],
        "event_id long, ts string").select(
        "event_id", F.col("ts").cast("timestamp"))
    assert stream_dedup(df, ["event_id"], "ts", "1 hour").count() == 1


def test_stream_stream_interval_join(spark, tmp_path):
    """Two watermarked file-source streams joined on key with an
    event-time interval (click -> purchase within 30 min): only pairs
    inside the window match, state is bounded by watermark + interval."""
    from mysql_ch_replicator_spark.streaming.windows import (
        stream_interval_join,
    )

    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir()
    buys_dir.mkdir()
    clicks = [
        {"user_id": 1, "click_id": 10, "ts": "2024-01-01T10:00:00.000Z"},
        {"user_id": 2, "click_id": 20, "ts": "2024-01-01T10:05:00.000Z"},
        {"user_id": 3, "click_id": 30, "ts": "2024-01-01T10:10:00.000Z"},
    ]
    buys = [
        # in-window for user 1 (+10 min)
        {"user_id": 1, "buy_id": 100, "ts": "2024-01-01T10:10:00.000Z"},
        # OUT of window for user 2 (+45 min)
        {"user_id": 2, "buy_id": 200, "ts": "2024-01-01T10:50:00.000Z"},
        # before the click for user 3 (-5 min): excluded by lower bound
        {"user_id": 3, "buy_id": 300, "ts": "2024-01-01T10:05:00.000Z"},
    ]
    with open(clicks_dir / "0.jsonl", "w") as fh:
        for r in clicks:
            fh.write(json.dumps(r) + "\n")
    with open(buys_dir / "0.jsonl", "w") as fh:
        for r in buys:
            fh.write(json.dumps(r) + "\n")

    cs = (spark.readStream.schema("user_id long, click_id long, ts timestamp")
          .json(str(clicks_dir)))
    bs = (spark.readStream.schema("user_id long, buy_id long, ts timestamp")
          .json(str(buys_dir)))
    joined = stream_interval_join(
        cs, bs, key="user_id", left_ts="ts", right_ts="ts",
        lower="0 seconds", upper="30 minutes",
        left_watermark="10 seconds", right_watermark="10 seconds")
    q = (joined.writeStream.format("memory").queryName("ssj_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        got = {(r.user_id, r.l_click_id, r.r_buy_id)
               for r in spark.table("ssj_out").collect()}
        assert got == {(1, 10, 100)}
    finally:
        q.stop()


def test_interval_join_batch_degrades(spark):
    """Same builder on batch frames: plain range join, same semantics."""
    from mysql_ch_replicator_spark.streaming.windows import (
        stream_interval_join,
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    cs = spark.createDataFrame(
        [(1, 10, t0), (2, 20, t0)], "user_id long, click_id long, ts timestamp")
    bs = spark.createDataFrame(
        [(1, 100, t0 + dt.timedelta(minutes=10)),
         (2, 200, t0 + dt.timedelta(minutes=50))],
        "user_id long, buy_id long, ts timestamp")
    got = {(r.user_id, r.l_click_id, r.r_buy_id)
           for r in stream_interval_join(
               cs, bs, key="user_id", left_ts="ts", right_ts="ts",
               lower="0 seconds", upper="30 minutes",
               left_watermark="10 seconds",
               right_watermark="10 seconds").collect()}
    assert got == {(1, 10, 100)}


def test_stream_enrich_picks_up_dim_updates(spark, tmp_path):
    """Stream-static enrichment: events across micro-batches join the
    broadcast dimension (unmatched keep NULL); after the dim's atomic
    rewrite, a RESTARTED query (the documented SCD contract — the listing
    is captured per query) sees the fresh attributes."""
    import json as _json

    from mysql_ch_replicator_spark.streaming.windows import stream_enrich

    src = tmp_path / "enrich_src"
    dim_dir = tmp_path / "dim"
    src.mkdir()
    dim_dir.mkdir()
    spark.createDataFrame([(1, "bronze")], "user_id long, tier string") \
        .write.mode("overwrite").parquet(str(dim_dir))

    with open(src / "0.jsonl", "w") as fh:
        fh.write(_json.dumps({"event_id": 10, "user_id": 1}) + "\n")
        fh.write(_json.dumps({"event_id": 11, "user_id": 2}) + "\n")

    stream = (spark.readStream
              .schema("event_id long, user_id long")
              .json(str(src)))
    dim = spark.read.parquet(str(dim_dir))
    out = stream_enrich(stream, dim, ["user_id"])
    q = (out.writeStream.format("memory").queryName("enrich_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_en"))
         .start())
    try:
        q.processAllAvailable()
        # a second micro-batch joins the same dim without restarts
        with open(src / "1.jsonl", "w") as fh:
            fh.write(_json.dumps({"event_id": 12, "user_id": 1}) + "\n")
        q.processAllAvailable()
        rows = {r.event_id: r.tier
                for r in spark.sql("SELECT * FROM enrich_out").collect()}
        assert rows[10] == "bronze"
        assert rows[11] is None              # left join keeps unmatched
        assert rows[12] == "bronze"
    finally:
        q.stop()

    # SCD step: atomic dim rewrite, then a restarted query (fresh listing)
    spark.createDataFrame([(1, "bronze"), (2, "gold")],
                          "user_id long, tier string") \
        .write.mode("overwrite").parquet(str(dim_dir))
    spark.catalog.refreshByPath(str(dim_dir))
    stream2 = (spark.readStream
               .schema("event_id long, user_id long")
               .json(str(src)))
    out2 = stream_enrich(stream2, spark.read.parquet(str(dim_dir)),
                         ["user_id"])
    q2 = (out2.writeStream.format("memory").queryName("enrich_out2")
          .outputMode("append")
          .option("checkpointLocation", str(tmp_path / "ckpt_en2"))
          .start())
    try:
        q2.processAllAvailable()
        rows = {r.event_id: r.tier
                for r in spark.sql("SELECT * FROM enrich_out2").collect()}
        assert rows[11] == "gold"            # fresh attribute after restart
    finally:
        q2.stop()


def test_text_pipeline_runs_on_a_stream(spark, tmp_path):
    """The scan-side text operators (Gopher gate, quality score, PII
    redaction, token counts) are pure stateless projections, so the SAME
    column expressions run unchanged under Structured Streaming — the
    ingest-time filtering shape of a live corpus feed. One micro-batch
    over a file stream must produce the identical rows as the batch
    plan."""
    import pandas as pd

    from pyspark.sql import functions as F
    from mysql_ch_replicator_spark.functions.pii import redact_pii
    from mysql_ch_replicator_spark.functions.text import (
        quality_score, token_count_bpe,
    )

    src = tmp_path / "docs_stream"
    src.mkdir()
    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a solid normal document about spark tables and rows",
                 "email me at bob@example.org today",
                 "x"],
    }).to_parquet(src / "part-0.parquet")

    def project(df):
        return df.select(
            "doc_id",
            quality_score(F.col("text")).alias("quality"),
            token_count_bpe(F.col("text")).alias("n_tokens"),
            redact_pii(F.col("text")).alias("clean"))

    batch_rows = sorted(map(tuple, project(
        spark.read.parquet(str(src))).collect()))

    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(str(src)))
    q = (project(stream).writeStream.format("memory")
         .queryName("text_stream_out").outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream_rows = sorted(map(tuple, spark.sql(
        "SELECT * FROM text_stream_out").collect()))
    assert stream_rows == batch_rows
    assert any("[EMAIL]" in r[3] for r in stream_rows)
