"""Real-JDBC integration for the S1 production snapshot path
(VERDICT r1 #8): jdbc_snapshot's option plumbing — partitionColumn
bounds, N concurrent partition reads — against an actual JDBC database
(DuckDB over its JDBC driver; no MySQL exists in this environment, but
the Spark JDBC reader codepath is identical)."""

import duckdb
import pytest

from mysql_ch_replicator_spark.engine import ReplicaEngine
from mysql_ch_replicator_spark.sources.snapshot import jdbc_snapshot
from tests.conftest import duckdb_jdbc_jar

pytestmark = pytest.mark.skipif(duckdb_jdbc_jar() is None,
                                reason="no DuckDB JDBC driver jar on host")

N = 1000


@pytest.fixture(scope="module")
def duck_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("jdbc") / "src.duckdb")
    con = duckdb.connect(path)
    con.sql(f"CREATE TABLE users AS "
            f"SELECT range AS id, 'name' || range AS name, "
            f"(range % 97)::INT AS age FROM range({N})")
    con.close()
    return path


def _props():
    return {"driver": "org.duckdb.DuckDBDriver",
            "duckdb.read_only": "true"}


def test_partitioned_jdbc_read(spark, duck_file):
    df = jdbc_snapshot(spark, f"jdbc:duckdb:{duck_file}", "users",
                       partition_column="id", lower_bound=0,
                       upper_bound=N, num_partitions=4,
                       properties=_props())
    # the read really is split into 4 concurrent range scans
    assert df.rdd.getNumPartitions() == 4
    rows = {(r.id, r.name, r.age) for r in df.collect()}
    assert len(rows) == N                       # disjoint and complete
    assert (0, "name0", 0) in rows
    assert (N - 1, f"name{N-1}", (N - 1) % 97) in rows


def test_jdbc_snapshot_through_engine(spark, duck_file, tmp_path):
    """The full S1 path: partitioned JDBC read → typed snapshot publish →
    FINAL read returns exactly the source table."""
    engine = ReplicaEngine(spark, str(tmp_path / "replica"))
    engine.create_table("src", """CREATE TABLE users (
      id bigint NOT NULL, name varchar(255), age int,
      PRIMARY KEY (id))""")
    df = jdbc_snapshot(spark, f"jdbc:duckdb:{duck_file}", "users",
                       partition_column="id", lower_bound=0,
                       upper_bound=N, num_partitions=4,
                       properties=_props())
    engine.snapshot_table("src", "users", df)
    final = engine.read_final("src", "users")
    assert final.count() == N
    got = {(r.id, r.name, r.age) for r in final.collect()}
    assert (500, "name500", 500 % 97) in got
