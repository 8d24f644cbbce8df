"""PySpark-native analytics/replication engine with the capabilities of
bakwc/mysql_ch_replicator, re-expressed Spark-first.

The reference (see /root/reference, SURVEY.md) is a MySQL→ClickHouse CDC
pipeline: snapshot + binlog tail + versioned latest-wins replica. This
package rebuilds that data model on Spark:

- ``schema``     — MySQL DDL parser + type system → Spark StructType
- ``functions``  — scalar conversion expressions (C1–C14), text/hash/vector fns
- ``sources``    — snapshot scan + CDC event-log source (S1–S4)
- ``operators``  — versioned replica (upsert/delete/dedup-final), dedup suite,
                   similarity search, multimodal plumbing
- ``streaming``  — Structured Streaming apply loop + DDL evolution (K/D series)
- ``plans``      — SparkSession builders tuned for the target scale
"""

__version__ = "0.1.0"
