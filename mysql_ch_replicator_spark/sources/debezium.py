"""Debezium/Kafka CDC ingress adapter (S2 alternative source).

The reference's production ingress is its own binlog wire-protocol
decoder (binlog_replicator.py:364–372, 445–527 + vendored
pymysqlreplication); this environment has no MySQL server, so the
engine's native ingress is the file event log. For a real deployment the
standard no-decoder path is **Debezium → Kafka → Spark**: Debezium emits
one JSON change event per row with the public envelope
``{before, after, op, ts_ms, source{db, table, file, pos}}``
(Debezium MySQL connector docs; op c/r=create-snapshot, u=update,
d=delete). This module maps that envelope LOSSLESSLY onto
``EVENT_SCHEMA`` so ``ReplicaEngine.apply_batch`` consumes a Debezium
topic exactly like the native log:

- ADD events (op c/r/u) carry the **after** image at the table's
  structural ordinals — the positional payload convention
  (event_log.py module docstring),
- REMOVE events (op d) carry the **before** image's primary-key values,
  packed densely in ``primary_keys`` order — the writer contract
  ``EventLogWriter.remove`` documents and ``convert_payload`` expects,
- ``seq`` derives from the binlog position ``(file, pos)``: Debezium
  guarantees pos is monotone within a file; callers replicating across
  file rollovers should map (file, pos) → a dense global seq upstream
  or rely on file ordering (tx_file is preserved for exactly that).

Everything is built from ``from_json`` + column expressions — the
whole adaptation runs in whole-stage codegen; with a Kafka source this
is ``spark.readStream.format("kafka")`` → ``debezium_events(df, st)``
→ ``engine.apply_batch`` in foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema.table_structure import TableStructure
from .event_log import EVENT_TYPE_ADD, EVENT_TYPE_QUERY, EVENT_TYPE_REMOVE


def debezium_envelope_schema(structure: TableStructure) -> T.StructType:
    """Envelope schema with before/after typed as all-string structs in
    the table's column order — Spark's JSON parser renders numeric and
    boolean JSON values to their literal text for StringType fields,
    which is exactly the event log's serialize-to-string convention."""
    row = T.StructType([T.StructField(f.name, T.StringType())
                        for f in structure.fields])
    return T.StructType([
        T.StructField("before", row),
        T.StructField("after", row),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("source", T.StructType([
            T.StructField("db", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("file", T.StringType()),
            T.StructField("pos", T.LongType()),
        ])),
    ])


def _payload_expr(env: Column, structure: TableStructure) -> Column:
    """One positional record per event: after-image at structural
    ordinals for ADDs, dense PK-ordered before-image for deletes."""
    add_rec = F.array(*[env["after"][f.name] for f in structure.fields])
    del_rec = F.array(*[env["before"][pk] for pk in structure.primary_keys])
    rec = F.when(env["op"] == "d", del_rec).otherwise(add_rec)
    return F.array(rec)


def debezium_schema_change_schema() -> T.StructType:
    """Public envelope of Debezium's *schema change topic* (the per-server
    topic carrying DDL, distinct from the internal schema history topic):
    ``{source{db, table, file, pos}, ts_ms, databaseName, schemaName,
    ddl, tableChanges[...]}`` — Debezium MySQL connector docs, 'schema
    change topic'. Only the routing fields and the raw DDL string are
    projected; ``tableChanges`` (Debezium's own parsed form) is ignored
    because the engine re-parses the DDL with its MySQL-dialect parser,
    the same way the reference consumes raw QUERY binlog events
    (reference binlog_replicator.py:472–487)."""
    return T.StructType([
        T.StructField("source", T.StructType([
            T.StructField("db", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("file", T.StringType()),
            T.StructField("pos", T.LongType()),
        ])),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("databaseName", T.StringType()),
        T.StructField("ddl", T.StringType()),
    ])


def debezium_schema_events(df: DataFrame,
                           value_col: str = "value") -> DataFrame:
    """Map a Debezium schema-change topic (JSON strings in ``value_col``)
    onto ``EVENT_SCHEMA`` QUERY events, the twin of ``debezium_events``
    for DDL: ``apply_batch`` then treats each as a barrier — rows before
    it flush first, then the DDL executes via ``execute_ddl`` — exactly
    like native-log ``EventLogWriter.ddl`` entries. Without this pathway
    a Debezium-fed deployment silently loses schema evolution (r4
    verdict #6).

    Events with a null/empty ``ddl`` (Debezium emits snapshot markers
    and SET statements too — consumers filter) are dropped. ``seq``
    derives from binlog (file, pos) like the row adapter, so unioning
    the row topic and the schema topic yields one correctly-ordered
    event stream."""
    env = F.from_json(F.col(value_col).cast("string"),
                      debezium_schema_change_schema())
    return (df.where(F.col(value_col).isNotNull())
            .where(env["ddl"].isNotNull() & (F.trim(env["ddl"]) != ""))
            .select(
                env["source"]["file"].alias("tx_file"),
                env["source"]["pos"].alias("tx_pos"),
                env["source"]["pos"].cast("long").alias("seq"),
                F.coalesce(env["databaseName"],
                           env["source"]["db"]).alias("db"),
                F.lit(None).cast("string").alias("table"),
                F.lit(EVENT_TYPE_QUERY).alias("event_type"),
                F.lit(None).cast("array<array<string>>").alias("payload"),
                env["ddl"].alias("query"),
            ))


def debezium_events(df: DataFrame, structure: TableStructure,
                    value_col: str = "value",
                    filter_nonevents: bool = True) -> DataFrame:
    """Map a DataFrame of Debezium JSON strings (``value_col``, e.g. the
    Kafka ``value``) onto ``EVENT_SCHEMA``. Tombstone messages (null
    value — Kafka log-compaction markers, not CDC events) are dropped,
    like the reference skips non-row binlog events.

    ``filter_nonevents=False`` skips the tombstone + phantom-DDL guards
    for callers that GUARANTEE every record is a non-null row envelope
    (e.g. a synthetic rendered stream). The guards are deterministic
    filters over the parsed value, so on a computed ``value_col`` the
    optimizer pushes them below any upstream exchange and re-evaluates
    the whole render there — measured as a duplicate single-task JSON
    render of the entire batch before the spread exchange (guide §4.4's
    duplicated-evaluation hazard, expression-flavored). On a real Kafka
    source the pushdown is exactly what you want; keep the default."""
    env = F.from_json(F.col(value_col).cast("string"),
                      debezium_envelope_schema(structure))
    # op.isNotNull(): a schema-change envelope on a combined stream carries
    # a populated source.table but NO op — without this guard it would
    # also parse here as a phantom all-NULL ADD row (review r5)
    guarded = df
    if filter_nonevents:
        guarded = df.where(F.col(value_col).isNotNull()) \
                    .where(env["op"].isNotNull())
    out = (guarded
           .select(
               env["source"]["file"].alias("tx_file"),
               env["source"]["pos"].alias("tx_pos"),
               env["source"]["pos"].cast("long").alias("seq"),
               env["source"]["db"].alias("db"),
               env["source"]["table"].alias("table"),
               F.when(env["op"] == "d", F.lit(EVENT_TYPE_REMOVE))
                .otherwise(F.lit(EVENT_TYPE_ADD)).alias("event_type"),
               _payload_expr(env, structure)
                .cast("array<array<string>>").alias("payload"),
               F.lit(None).cast("string").alias("query"),
           ))
    return out


#: probe schema shared by the ingest discovery pass and the dead-letter
#: classifier — the minimal field set that identifies BOTH contracts.
PROBE_SCHEMA = ("op string, ddl string, databaseName string, "
                "source struct<db: string, table: string>")


def debezium_dead_predicate(value_col: str = "value"):
    """Boolean Column: this record would be SILENTLY DROPPED by every
    adapter — the single shared definition of "dead" (the ingest
    discovery gate and the quarantine classifier must never diverge).

    Dead shapes:
    - bytes that are not JSON at all;
    - valid JSON matching neither contract (no ``op``, no usable
      ``ddl``, nothing to route by);
    - a ROW envelope (op present) whose ``source.db``/``source.table``
      is missing — no per-table branch could ever select it;
    - a DDL envelope (usable ddl) with neither ``databaseName`` nor
      ``source.db`` — no per-db log could receive it.

    NOT dead: tombstones (null value — Kafka compaction markers) and
    schema-topic control messages (null/empty ddl but a populated
    databaseName/source), whose dropping is the documented contract."""
    env = F.from_json(F.col(value_col).cast("string"), PROBE_SCHEMA)
    has_op = env["op"].isNotNull()
    has_ddl = env["ddl"].isNotNull() & (F.trim(env["ddl"]) != "")
    no_db_route = (env["databaseName"].isNull()
                   & env["source"]["db"].isNull())
    alien = ~has_op & ~has_ddl & no_db_route
    unroutable_row = has_op & (env["source"]["db"].isNull()
                               | env["source"]["table"].isNull())
    unroutable_ddl = has_ddl & no_db_route
    return (F.col(value_col).isNotNull()
            & (env.isNull() | alien | unroutable_row | unroutable_ddl))


def debezium_dead_letters(df: DataFrame,
                          value_col: str = "value") -> DataFrame:
    """Quarantine stream: the envelopes the adapters would otherwise
    DROP SILENTLY (see ``debezium_dead_predicate`` for the shared
    classification). Returns (raw_value, reason) for the caller to
    write to a quarantine sink — the "no silent drops" rule applied to
    ingest: at 100 TB a misbehaving producer must surface as a counted,
    inspectable quarantine stream, not as rows that never arrive.

    Reasons: ``malformed-json`` (bytes are not JSON — detected via
    try_parse_json, since PERMISSIVE from_json yields an all-null
    struct, not null), ``unroutable-row`` (op present, source
    db/table missing), ``unroutable-ddl`` (usable ddl, nothing to
    route by), else ``unrecognized-envelope``."""
    env = F.from_json(F.col(value_col).cast("string"), PROBE_SCHEMA)
    has_op = env["op"].isNotNull()
    has_ddl = env["ddl"].isNotNull() & (F.trim(env["ddl"]) != "")
    parses = F.try_parse_json(F.col(value_col).cast("string"))
    reason = (F.when(parses.isNull(), F.lit("malformed-json"))
              .when(has_op, F.lit("unroutable-row"))
              .when(has_ddl, F.lit("unroutable-ddl"))
              .otherwise(F.lit("unrecognized-envelope")))
    return (df.where(debezium_dead_predicate(value_col))
            .select(F.col(value_col).cast("string").alias("raw_value"),
                    reason.alias("reason")))
