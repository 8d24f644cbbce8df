"""Debezium envelope → EVENT_SCHEMA contract (VERDICT r1 'missing' #1):
a Debezium-shaped JSON change event maps losslessly onto the engine's
event schema — insert/update after-images at structural ordinals,
delete before-images as dense PK-ordered payloads (the convert_payload
REMOVE contract), binlog file/pos preserved — and the engine replays a
Debezium stream to the same final state as the native log."""

import json

from mysql_ch_replicator_spark.engine import ReplicaEngine
from mysql_ch_replicator_spark.schema.ddl_parser import parse_create_table
from mysql_ch_replicator_spark.sources.debezium import debezium_events
from mysql_ch_replicator_spark.sources.event_log import (
    EVENT_SCHEMA, EVENT_TYPE_ADD, EVENT_TYPE_REMOVE,
)

# PK mid-structure on purpose: exercises the dense PK-ordered delete path
DDL = """CREATE TABLE users (
  name varchar(255), id int NOT NULL, age int,
  PRIMARY KEY (id))"""


def _dbz(op, pos, before=None, after=None):
    return json.dumps({
        "before": before, "after": after, "op": op, "ts_ms": 1700000000000,
        "source": {"db": "shop", "table": "users",
                   "file": "mysql-bin.000003", "pos": pos},
    })


EVENTS = [
    _dbz("c", 100, after={"name": "Ivan", "id": 1, "age": 42}),
    _dbz("c", 110, after={"name": "Petr", "id": 2, "age": 33}),
    _dbz("u", 120, before={"name": "Ivan", "id": 1, "age": 42},
         after={"name": "Ivan2", "id": 1, "age": 43}),
    _dbz("d", 130, before={"name": "Petr", "id": 2, "age": 33}),
    None,  # Kafka log-compaction tombstone: dropped, not a CDC event
]


def test_envelope_maps_losslessly(spark):
    st = parse_create_table(DDL)
    df = spark.createDataFrame([(v,) for v in EVENTS], "value string")
    out = debezium_events(df, st)
    # same names and types (the adapter's columns are non-nullable where
    # the generic schema allows null — stricter, still compatible)
    assert [(f.name, f.dataType) for f in out.schema] == \
        [(f.name, f.dataType) for f in EVENT_SCHEMA]
    # interop proof: a Debezium batch unions cleanly with a native-log batch
    native = spark.createDataFrame([], EVENT_SCHEMA)
    assert native.unionByName(out).count() == 4
    rows = sorted(out.collect(), key=lambda r: r.seq)
    assert len(rows) == 4                       # tombstone dropped
    assert [r.seq for r in rows] == [100, 110, 120, 130]
    assert rows[0].tx_file == "mysql-bin.000003" and rows[0].tx_pos == 100
    assert rows[0].db == "shop" and rows[0].table == "users"
    # insert: after-image at structural ordinals (name, id, age), numbers
    # rendered as strings — the event-log serialization convention
    assert rows[0].event_type == EVENT_TYPE_ADD
    assert rows[0].payload == [["Ivan", "1", "42"]]
    assert rows[2].payload == [["Ivan2", "1", "43"]]
    # delete: PK values only, dense, in primary_keys order
    assert rows[3].event_type == EVENT_TYPE_REMOVE
    assert rows[3].payload == [["2"]]
    assert rows[3].query is None


def test_debezium_stream_replays_through_engine(spark, tmp_path):
    engine = ReplicaEngine(spark, str(tmp_path / "replica"))
    st = engine.create_table("shop", DDL)
    df = spark.createDataFrame([(v,) for v in EVENTS], "value string")
    engine.apply_batch(debezium_events(df, st))
    got = {tuple(r) for r in
           engine.read_final("shop", "users").drop("_version").collect()}
    assert got == {("Ivan2", 1, 43)}
