import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_ch_replicator_spark.plans.session import get_spark  # noqa: E402


def duckdb_jdbc_jar() -> str | None:
    """DuckDB JDBC driver jar if present in the local maven/coursier cache
    — enables the real-JDBC integration test (skipped otherwise)."""
    import glob
    hits = glob.glob(os.path.expanduser(
        "~/.cache/coursier/**/duckdb_jdbc*.jar"), recursive=True)
    return hits[0] if hits else None


@pytest.fixture(scope="session")
def spark():
    jar = duckdb_jdbc_jar()
    extra = {"spark.jars": jar} if jar else {}
    spark = get_spark("mysql_ch_replicator_spark-tests", extra_conf=extra)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
